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
    "timestamptz" -> "TIMESTAMP", "name" -> "STRING")

  /** Rewrite one non-literal segment. */
  private def rewriteSegment(s: String): String = {
    var out = s
    // regex-operator spellings, most specific first; pattern-literal
    // forms for the case-insensitive variants live in [[rewrite]]
    out = out.replaceAll("!~~", " NOT LIKE ")
    out = out.replaceAll("~~", " LIKE ")
    out = out.replaceAll("!~(?![*~])", " NOT RLIKE ")
    out = out.replaceAll("(?<![!<>=~])~(?![*~])", " RLIKE ")
    // PG type aliases after :: or "AS <alias>" inside CAST
    for ((pg, spark) <- typeAlias) {
      out = out.replaceAll(s"(?i)(::\\s*)$pg\\b", "$1" + spark)
      out = out.replaceAll(s"(?i)(\\bAS\\s+)$pg\\b(\\s*\\))", "$1" + spark + "$2")
    }
    out
  }

  /** Split into alternating non-literal / literal parts and rewrite
    * only the non-literal ones. */
  def rewrite(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    var segStart = 0
    while (i < sql.length) {
      if (sql.charAt(i) == '\'') {
        sb ++= rewriteSegment(sql.substring(segStart, i))
        val lit = new StringBuilder("'")
        i += 1
        var done = false
        while (i < sql.length && !done) {
          val c = sql.charAt(i)
          lit += c
          if (c == '\'') {
            if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
              lit += '\''; i += 1
            } else done = true
          }
          i += 1
        }
        sb ++= lit.toString
        segStart = i
      } else i += 1
    }
    sb ++= rewriteSegment(sql.substring(segStart))
    // case-insensitive regex match with a literal pattern: PG `~*` has
    // no Spark operator — fold the flag into the pattern. Runs after
    // literal splitting because the replacement touches the literal.
    sb.toString
      .replaceAll("~\\*\\s*'", " RLIKE '(?i)")
      .replaceAll("!\\s*RLIKE '\\(\\?i\\)", " NOT RLIKE '(?i)") // !~* form
  }
}
