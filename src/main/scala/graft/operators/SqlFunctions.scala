package graft.operators

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `CREATE FUNCTION ... LANGUAGE SQL` (reference `src/pl/` + pg_proc
  * `LANGUAGE SQL` functions, `src/backend/optimizer/util/clauses.c`
  * inline_function): simple SQL functions are expression macros that
  * PG's planner inlines into the call site — exactly what this layer
  * does, so the expanded query stays one declarative plan for Catalyst
  * (no per-row re-entry, no UDF boundary).
  *
  * Supported shape: a single-expression body (`AS 'SELECT <expr>'`,
  * quoted with '...' or $$...$$), named parameters and positional
  * `$1..$n`, nested calls between registered functions (expanded to
  * fixpoint; recursion is detected and rejected, as PG SQL functions
  * cannot recurse either).
  */
object SqlFunctions {

  final case class SqlFn(name: String, params: Seq[String], body: String)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, SqlFn]()

  private val fnRe =
    ("(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?FUNCTION\\s+([\\w.]+)\\s*" +
      "\\(([^)]*)\\)\\s*RETURNS\\s+[\\w ]+(?:\\([\\d, ]*\\))?\\s+AS\\s+" +
      "(?:'(.*?)'|\\$\\$(.*?)\\$\\$)\\s+LANGUAGE\\s+SQL\\s*;?\\s*$").r

  /** Parse + register a CREATE FUNCTION ... LANGUAGE SQL statement. */
  def create(ddl: String): SqlFn = {
    val m = fnRe.findFirstMatchIn(ddl).getOrElse(
      throw new IllegalArgumentException(
        s"not a CREATE FUNCTION ... LANGUAGE SQL statement: $ddl"))
    val name = m.group(1).toLowerCase
    val params = GreengageDdl.splitTop(m.group(2))
      .map(_.trim.split("\\s+")(0).toLowerCase)
    val raw = Option(m.group(3)).getOrElse(m.group(4)).trim.stripSuffix(";").trim
    require(raw.toLowerCase.startsWith("select"),
      s"SQL function body must be 'SELECT <expression>': $raw")
    val body = raw.substring("select".length).trim
    val fn = SqlFn(name, params, body)
    registry.put(name, fn)
    fn
  }

  def drop(name: String): Unit = registry.remove(name.toLowerCase)

  /** Inline every registered SQL-function call site, to fixpoint
    * (functions may call other functions; recursion throws). */
  def expand(sql: String): String = {
    var cur = sql
    var rounds = 0
    var changed = true
    while (changed) {
      require(rounds < 256,
        "SQL function expansion did not converge (recursive function?)")
      val next = expandOnce(cur)
      changed = next != cur
      cur = next
      rounds += 1
    }
    cur
  }

  /** Parse + run a SQL text that may call registered SQL functions. */
  def sql(spark: SparkSession, text: String): DataFrame =
    spark.sql(expand(text))

  /** Replace the first call site found (the fixpoint loop does the rest). */
  private def expandOnce(sql: String): String = {
    import scala.jdk.CollectionConverters._
    for (fn <- registry.values().asScala) {
      val re = ("(?i)\\b" + Pattern.quote(fn.name) + "\\s*\\(").r
      for (m <- re.findFirstMatchIn(sql)) {
        // don't rewrite inside single-quoted string literals
        if (sql.substring(0, m.start).count(_ == '\'') % 2 == 0) {
          val (argText, after) = GreengageDdl.balanced(sql, m.end - 1)
          val args = GreengageDdl.splitTop(argText).map(a => s"(${a.trim})")
          require(args.length == fn.params.length,
            s"${fn.name} expects ${fn.params.length} args, got ${args.length}: $argText")
          // simultaneous named substitution (one alternation pass, so an
          // argument's text can never be re-matched as a parameter name),
          // then positional $1..$n
          val byName = fn.params.zip(args).toMap
          var body =
            if (fn.params.isEmpty) fn.body
            else ("(?i)\\b(" + fn.params.map(Pattern.quote).mkString("|") + ")\\b").r
              .replaceAllIn(fn.body,
                mm => Matcher.quoteReplacement(byName(mm.group(1).toLowerCase)))
          for ((a, i) <- args.zipWithIndex)
            body = body.replace("$" + (i + 1), a)
          return sql.substring(0, m.start) + "(" + body + ")" + sql.substring(after)
        }
      }
    }
    sql
  }
}
