package graft.operators

/** PG-dialect surface rewrites for query text (the small set of
  * lexical PG-isms Spark's parser rejects — reference grammar
  * `src/backend/parser/gram.y`; operator catalog `pg_operator.h` for
  * `~~`/`~`): PG type aliases after `::` or in CAST, and the
  * LIKE/regex operator spellings. Spark 4 already parses `::` itself.
  *
  * Rewrites apply ONLY outside single-quoted literals ('' escapes
  * honored), so a tilde or type name inside a string survives. This
  * is a LEXICAL assist, not a SQL translator — constructs Spark's
  * parser genuinely lacks (DISTINCT ON is already a catalog operator,
  * etc.) are out of scope and fail loudly in Spark's parser.
  */
object PgSql {

  private val typeAlias = Seq(
    "int2" -> "SMALLINT", "int4" -> "INT", "int8" -> "BIGINT",
    "float4" -> "FLOAT", "float8" -> "DOUBLE",
    "double\\s+precision" -> "DOUBLE",
    "bool" -> "BOOLEAN", "bytea" -> "BINARY", "text" -> "STRING",
    "timestamptz" -> "TIMESTAMP", "name" -> "STRING",
    // object-identifier pseudo-types (pg_type.h regclass/regtype/oid):
    // catalog references degrade to their textual form here
    "regclass" -> "STRING", "regtype" -> "STRING", "regproc" -> "STRING",
    "oid" -> "BIGINT")

  /** Rewrite one non-literal segment. The case-insensitive `~*`/`!~*`
    * spellings are NOT touched here (their regexes exclude a trailing
    * `*`) — they need the following pattern literal and are folded
    * during assembly in [[rewrite]]. */
  private def rewriteSegment(s: String): String = {
    var out = s
    // regex-operator spellings, most specific first (pg_operator.h:
    // ~~ LIKE, ~~* ILIKE, !~~ NOT LIKE, !~~* NOT ILIKE, ~ regex)
    out = out.replaceAll("!~~\\*", " NOT ILIKE ")
    out = out.replaceAll("~~\\*", " ILIKE ")
    out = out.replaceAll("!~~", " NOT LIKE ")
    out = out.replaceAll("~~", " LIKE ")
    out = out.replaceAll("!~(?![*~])", " NOT RLIKE ")
    out = out.replaceAll("(?<![!<>=~])~(?![*~])", " RLIKE ")
    // PG 12 CTE materialization hints (gram.y opt_materialized):
    // Catalyst decides reuse itself — the hint drops
    out = out.replaceAll("(?i)\\bAS\\s+(NOT\\s+)?MATERIALIZED\\s*\\(", "AS (")
    // BETWEEN SYMMETRIC swaps its bounds when reversed (gram.y b_expr;
    // Spark has no spelling). Lexical assist for simple token bounds —
    // column refs / numbers; a bound that is a string literal or a
    // parenthesized expression sits outside this segment and fails
    // loudly in Spark's parser, per this file's contract
    out = out.replaceAll(
      "(?i)\\bBETWEEN\\s+SYMMETRIC\\s+([\\w.$]+)\\s+AND\\s+([\\w.$]+)",
      "BETWEEN least($1, $2) AND greatest($1, $2)")
    // PG TABLESAMPLE methods (gram.y tablesample_clause): both map to
    // Spark's row-level percent sampling — BERNOULLI is exactly that;
    // SYSTEM is PG's page-level variant, same statistical contract at
    // our block sizes. REPEATABLE (seed) passes through unchanged.
    out = out.replaceAll(
      "(?i)\\bTABLESAMPLE\\s+(SYSTEM|BERNOULLI)\\s*\\(\\s*([\\d.]+)\\s*\\)",
      "TABLESAMPLE ($2 PERCENT)")
    // PG type aliases after :: or "AS <alias>" inside CAST
    for ((pg, spark) <- typeAlias) {
      out = out.replaceAll(s"(?i)(::\\s*)$pg\\b", "$1" + spark)
      out = out.replaceAll(s"(?i)(\\bAS\\s+)$pg\\b(\\s*\\))", "$1" + spark + "$2")
    }
    // any ~* left here has a non-literal pattern (the literal-pattern
    // form was consumed in rewrite's assembly): no Spark spelling, so
    // fail loudly rather than let it silently match case-sensitively
    if (out.contains("~*")) throw new IllegalArgumentException(
      s"~* / !~* requires a string-literal pattern: $s")
    out
  }

  // trailing ~* / !~* before a literal; the lookbehind keeps it off the
  // tail of the ILIKE spellings ~~* / !~~* (those rewrite in-segment)
  private val ciTail = "(!?)\\s*(?<!~)~\\*\\s*$".r

  /** PG `ARRAY[...]` constructors → `ARRAY(...)` (Spark parses that as
    * the array() function). One literal-aware pass that flips ONLY the
    * bracket pair belonging to an ARRAY keyword — subscripts like
    * `x[1]` and brackets inside string literals stay untouched; nested
    * constructors each classify their own pair. */
  private def arrayBrackets(sql: String): String = {
    val chars = sql.toCharArray
    val open = scala.collection.mutable.Stack[Boolean]() // isArray per '['
    var inLit = false
    var i = 0
    while (i < chars.length) {
      val c = chars(i)
      if (inLit) {
        if (c == '\'') {
          if (i + 1 < chars.length && chars(i + 1) == '\'') i += 1
          else inLit = false
        }
      } else c match {
        case '\'' => inLit = true
        case '[' =>
          var j = i - 1
          while (j >= 0 && chars(j).isWhitespace) j -= 1
          val isArr = j >= 4 &&
            sql.regionMatches(true, j - 4, "ARRAY", 0, 5) &&
            (j - 5 < 0 || (!Character.isLetterOrDigit(chars(j - 5)) &&
              chars(j - 5) != '_'))
          open.push(isArr)
          if (isArr) chars(i) = '('
        case ']' if open.nonEmpty =>
          if (open.pop()) chars(i) = ')'
        case _ =>
      }
      i += 1
    }
    new String(chars)
  }

  /** Split into alternating non-literal / literal parts and rewrite
    * only the non-literal ones — literals stay byte-identical, with one
    * documented exception: a `~*`/`!~*` whose pattern is the literal
    * that immediately follows becomes ` RLIKE ` with `(?i)` folded into
    * that pattern (PG's case-insensitive regex op has no Spark
    * spelling). A `~*` with a non-literal pattern fails loudly rather
    * than silently matching case-sensitively. */
  def rewrite(sqlIn: String): String = {
    val sql = arrayBrackets(sqlIn)
    // alternating parts: (isLiteral, text), literals include their quotes
    val parts = Vector.newBuilder[(Boolean, String)]
    var i = 0
    var segStart = 0
    while (i < sql.length) {
      if (sql.charAt(i) == '\'') {
        parts += ((false, sql.substring(segStart, i)))
        val litStart = i
        i += 1
        var done = false
        while (i < sql.length && !done) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 1
            else done = true
          }
          i += 1
        }
        parts += ((true, sql.substring(litStart, i)))
        segStart = i
      } else i += 1
    }
    parts += ((false, sql.substring(segStart)))
    val ps = parts.result()
    val sb = new StringBuilder
    var k = 0
    while (k < ps.length) {
      val (isLit, text) = ps(k)
      if (isLit) sb ++= text
      else ciTail.findFirstMatchIn(text) match {
        case Some(m) if k + 1 < ps.length && ps(k + 1)._1 =>
          // fold (?i) into the following pattern literal
          val op = if (m.group(1) == "!") " NOT RLIKE " else " RLIKE "
          sb ++= rewriteSegment(text.substring(0, m.start)) ++= op
          sb ++= "'(?i)" ++= ps(k + 1)._2.substring(1)
          k += 1 // literal consumed
        case Some(_) =>
          throw new IllegalArgumentException(
            s"~* / !~* requires a string-literal pattern: $sql")
        case None => sb ++= rewriteSegment(text)
      }
      k += 1
    }
    sb.toString
  }
}
