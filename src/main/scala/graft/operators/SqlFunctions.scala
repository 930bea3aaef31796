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

  /** Spans [start, end) of single-quoted string literals in `text`,
    * honoring `''` escapes (reference `src/pl/plpgsql/src/pl_comp.c`
    * parameter resolution never fires inside literals either). */
  private def literalSpans(text: String): Seq[(Int, Int)] = {
    val spans = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < text.length) {
      if (text.charAt(i) == '\'') {
        val start = i
        var j = i + 1
        var closed = false
        while (j < text.length && !closed) {
          if (text.charAt(j) == '\'') {
            if (j + 1 < text.length && text.charAt(j + 1) == '\'') j += 2
            else { closed = true; j += 1 }
          } else j += 1
        }
        spans += ((start, j))
        i = j
      } else i += 1
    }
    spans.result()
  }

  /** Apply `f` to the code segments of `text`, leaving every string
    * literal byte-identical. */
  private def mapOutsideLiterals(text: String)(f: String => String): String = {
    val out = new StringBuilder
    var pos = 0
    for ((s, e) <- literalSpans(text)) {
      out.append(f(text.substring(pos, s))).append(text.substring(s, e))
      pos = e
    }
    out.append(f(text.substring(pos))).toString
  }

  /** ONE literal-aware alternation pass for named AND positional
    * parameters: `\$(\d+)\b` matches the whole number, so `$1` can never
    * fire inside `$10`; replacements are never re-scanned, so an
    * argument's text can't be re-matched as a parameter name; and
    * literals (incl. `''`-escaped) are never rewritten. */
  private[operators] def substitute(body: String, params: Seq[String],
                                    args: Seq[String]): String = {
    val byName = params.map(_.toLowerCase).zip(args).toMap
    val re = (if (params.isEmpty) "\\$(\\d+)\\b"
              else "(?i)\\$(\\d+)\\b|\\b(" +
                params.map(Pattern.quote).mkString("|") + ")\\b").r
    mapOutsideLiterals(body) { seg =>
      re.replaceAllIn(seg, mm => Matcher.quoteReplacement {
        if (mm.group(1) != null) {
          val n = mm.group(1).toInt
          require(n >= 1 && n <= args.length,
            s"there is no parameter $$$n (${args.length} args)")
          args(n - 1)
        } else byName(mm.group(2).toLowerCase)
      })
    }
  }

  /** Replace the first call site found (the fixpoint loop does the rest). */
  private def expandOnce(sql: String): String = {
    import scala.jdk.CollectionConverters._
    val spans = literalSpans(sql)
    def insideLiteral(pos: Int) = spans.exists { case (s, e) => pos >= s && pos < e }
    for (fn <- registry.values().asScala) {
      val re = ("(?i)\\b" + Pattern.quote(fn.name) + "\\s*\\(").r
      // don't rewrite call sites inside single-quoted string literals
      for (m <- re.findAllMatchIn(sql).find(mm => !insideLiteral(mm.start))) {
        val (argText, after) = GreengageDdl.balanced(sql, m.end - 1)
        val args = GreengageDdl.splitTop(argText).map(a => s"(${a.trim})")
        require(args.length == fn.params.length,
          s"${fn.name} expects ${fn.params.length} args, got ${args.length}: $argText")
        val body = substitute(fn.body, fn.params, args)
        return sql.substring(0, m.start) + "(" + body + ")" + sql.substring(after)
      }
    }
    sql
  }
}
