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

  /** standard_conforming_strings (scan.l / guc.c): ON lexes '...'
    * bodies verbatim (backslash is an ordinary char); OFF applies
    * C-style escapes — which is what Spark's lexer does natively, so
    * OFF is the engine default and ON doubles backslashes at rewrite.
    * Set per statement by Graft.execute from the session GUC; a
    * plain var because statements execute serially per session. */
  @volatile var stdStrings: Boolean = false

  private val typeAlias = Seq(
    "int2" -> "SMALLINT", "int4" -> "INT", "int8" -> "BIGINT",
    "float4" -> "FLOAT", "float8" -> "DOUBLE",
    // PG `float` with no precision IS float8 (gram.y opt_float);
    // Spark's bare FLOAT is the 4-byte type — alias to DOUBLE
    "float" -> "DOUBLE",
    "double\\s+precision" -> "DOUBLE",
    "bool" -> "BOOLEAN", "bytea" -> "BINARY", "text" -> "STRING",
    "timestamptz" -> "TIMESTAMP", "name" -> "STRING",
    // bare varchar/bpchar (no length) are unlimited text in PG
    "varchar" -> "STRING", "bpchar" -> "STRING",
    // object-identifier pseudo-types (pg_type.h regclass/regtype/oid):
    // catalog references degrade to their textual form here
    "regclass" -> "STRING", "regtype" -> "STRING", "regproc" -> "STRING",
    // network/geometric/time-of-day types store their canonical text
    // form (same mapping as GreengageDdl.mapType)
    "inet" -> "STRING", "cidr" -> "STRING", "macaddr" -> "STRING",
    "lseg" -> "STRING", "box" -> "STRING", "point" -> "STRING",
    "timetz" -> "STRING", "money" -> "STRING",
    // bare numeric/decimal are UNCONSTRAINED in PG; Spark's bare
    // spelling is DECIMAL(10,0) — a silent fraction-truncation
    "numeric" -> "DECIMAL(38,18)", "decimal" -> "DECIMAL(38,18)",
    "oid" -> "BIGINT")

  private def mapType(pg: String): String =
    typeAlias.collectFirst {
      case (p, s) if pg.matches("(?i)" + p) => s
    }.getOrElse(pg.toUpperCase)

  /** Tokenize a `{...}` array-literal body per array_in's rules
    * (arrayfuncs.c ReadArrayStr): elements split on commas OUTSIDE
    * double quotes; a double-quoted element may contain commas and
    * preserves its whitespace; a backslash escapes the next character
    * both inside and outside quotes. Returns (text, wasQuoted) — the
    * quoted flag distinguishes the NULL keyword (unquoted → SQL NULL)
    * from the literal string "NULL". */
  private[operators] def arrayElems(raw: String): Seq[(String, Boolean)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    val cur = new StringBuilder
    var sawQuote = false
    var inQ = false
    var i = 0
    def flush(): Unit = {
      val s = if (sawQuote) cur.toString else cur.toString.trim
      if (s.nonEmpty || sawQuote) out += ((s, sawQuote))
      cur.clear(); sawQuote = false
    }
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < raw.length) { cur.append(raw.charAt(i + 1)); i += 2 }
      else if (c == '"') { inQ = !inQ; sawQuote = true; i += 1 }
      else if (c == ',' && !inQ) { flush(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    flush()
    out.toSeq
  }

  /** Render one array_in element as a SQL literal: unquoted NULL is
    * SQL NULL, unquoted numbers stay numeric, everything else becomes
    * a single-quoted string (internal quotes doubled). */
  private def arrayElemLit(e: String, wasQuoted: Boolean): String =
    if (!wasQuoted && (e.matches("-?\\d+(\\.\\d+)?") || e.equalsIgnoreCase("null"))) e
    else "'" + e.replace("'", "''") + "'"

  /** PG `'{...}'::type[]` array-literal casts (arrayfuncs.c array_in):
    * the braces literal becomes an array() constructor with each
    * element cast to the mapped Spark type; `'{}'` casts an empty
    * array. Runs on the raw text (the literal is the subject). */
  private def arrayLiteralBody(raw: String, pgType: String): String = {
    val t = mapType(pgType)
    if (raw.contains("{")) {
      // nested literal: PG array VALUES carry their own dims
      // regardless of the declared `type[]` — parse at the literal's
      // depth through the runtime array_in (pg_array_in), then cast
      val depth = 1 + raw.trim.takeWhile(_ == '{').length
      val target = (1 to depth).foldLeft(t)((acc, _) => s"ARRAY<$acc>")
      val lit0 = ("{" + raw + "}").replace("'", "''")
      return s"CAST(pg_array_in('$lit0', $depth) AS $target)"
    }
    val elems = arrayElems(raw)
    if (elems.isEmpty) s"CAST(array() AS ARRAY<$t>)"
    else elems.map { case (e, q) => s"CAST(${arrayElemLit(e, q)} AS $t)" }
      .mkString("array(", ", ", ")")
  }

  private def arrayLiteralCasts(sql: String): String = {
    // explicit-bounds literals '[2:4]={5,6,7}'::int[] (array_in
    // bounds prefix — the bounds drop, Spark arrays are 1-based)
    val boundsForm =
      "'(\\[[^'{]*\\])=\\{([^']*)\\}'\\s*::\\s*_?([a-zA-Z0-9]+)\\s*(?:\\[\\s*\\])?".r
        .replaceAllIn(sql, m => {
          val t = mapType(m.group(3))
          val depth = 1 + m.group(2).trim.takeWhile(_ == '{').length
          val target = (1 to depth).foldLeft(t)((acc, _) => s"ARRAY<$acc>")
          val lit0 = ("{" + m.group(2) + "}").replace("'", "''")
          java.util.regex.Matcher.quoteReplacement(
            s"CAST(pg_array_in('$lit0', $depth) AS $target)")
        })
    // PG internal array-type names: '_int2' ≡ int2[] (pg_type.h)
    val underscoreForm =
      "'\\s*\\{([^']*)\\}\\s*'\\s*::\\s*_([a-zA-Z0-9]+)\\b".r
        .replaceAllIn(boundsForm, m =>
          java.util.regex.Matcher.quoteReplacement(
            arrayLiteralBody(m.group(1), m.group(2))))
    val colonForm =
      "'\\s*\\{([^']*)\\}\\s*'\\s*::\\s*([a-zA-Z0-9_]+)\\s*\\[\\s*\\]".r
        .replaceAllIn(underscoreForm, m => java.util.regex.Matcher.quoteReplacement(
          arrayLiteralBody(m.group(1), m.group(2))))
    "(?i)CAST\\s*\\(\\s*'\\{([^']*)\\}'\\s+AS\\s+([a-zA-Z0-9_]+)\\s*\\[\\s*\\]\\s*\\)".r
      .replaceAllIn(colonForm, m => java.util.regex.Matcher.quoteReplacement(
        arrayLiteralBody(m.group(1), m.group(2))))
  }

  /** Rewrite one non-literal segment. The case-insensitive `~*`/`!~*`
    * spellings are NOT touched here (their regexes exclude a trailing
    * `*`) — they need the following pattern literal and are folded
    * during assembly in [[rewrite]]. */
  private def rewriteSegment(s: String): String = {
    var out = s
    // expr::type[] → ::ARRAY<type> with the element type mapped
    // through the PG alias table (gram.y Typename opt_array_bounds)
    out = "(::\\s*)([a-zA-Z0-9_]+)\\s*\\[\\s*\\]".r.replaceAllIn(out, m =>
      java.util.regex.Matcher.quoteReplacement(
        m.group(1) + "ARRAY<" + mapType(m.group(2)) + ">"))
    out = "(?i)(\\bAS\\s+)([a-zA-Z0-9_]+)\\s*\\[\\s*\\](\\s*\\))".r
      .replaceAllIn(out, m => java.util.regex.Matcher.quoteReplacement(
        m.group(1) + "ARRAY<" + mapType(m.group(2)) + ">" + m.group(3)))
    // multi-word PG type names in casts (gram.y SimpleTypename):
    // `character varying[(n)]` / `bit varying` / `double precision`
    out = out.replaceAll(
      "(?i)\\bcharacter\\s+varying(\\s*\\(\\s*\\d+\\s*\\))?", "STRING")
    out = out.replaceAll("(?i)\\bbit\\s+varying(\\s*\\(\\s*\\d+\\s*\\))?", "STRING")
    out = out.replaceAll("(?i)\\bdouble\\s+precision\\b", "DOUBLE")
    // gp_segment_id pseudo-column (cdbvars.h): single-instance Spark
    // is one "segment" — the constant 0, CAST so a GROUP BY position
    // can't read it as an ordinal
    out = out.replaceAll("(?i)\\bgp_segment_id\\b", "CAST(0 AS INT)")
    // pg_catalog schema qualifier: functions live in the session
    // registry and the compat views are unqualified temp views —
    // the explicit qualifier drops (namespace.c search_path)
    out = out.replaceAll("(?i)\\bpg_catalog\\.", "")
    // PG-semantics string functions live under pg_ names (the builtin
    // names are resolved BY NAME by the DataFrame API too, so
    // overriding them would flip internal call sites): regexp_replace
    // gets PG's replace-FIRST default + flags, ltrim/rtrim PG's
    // (string, chars) argument order
    out = out.replaceAll("(?i)\\bregexp_replace\\s*\\(", "pg_regexp_replace(")
    out = out.replaceAll("(?i)\\bltrim\\s*\\(", "pg_ltrim(")
    out = out.replaceAll("(?i)\\brtrim\\s*\\(", "pg_rtrim(")
    // PG typed-literal spellings Spark's parser rejects: timestamptz
    // 'v' / timestamp with[out] time zone 'v' → TIMESTAMP 'v' (the
    // session zone carries tz semantics, datatype.c); segment ends at
    // the literal so a trailing match is the typed-literal position
    out = out.replaceAll(
      "(?i)\\btimestamp\\s+with(?:out)?\\s+time\\s+zone\\b", "TIMESTAMP")
    out = out.replaceAll("(?i)\\btimestamptz\\b", "TIMESTAMP")
    // information_schema: the standard views resolve to PgCatalog's
    // snapshot temp views (temp views can't be schema-qualified); the
    // infschema column DOMAINS degrade to their base types
    out = out.replaceAll(
      "(?i)\\binformation_schema\\.(tables|columns|views|schemata|table_constraints)\\b",
      "__is_$1")
    out = out.replaceAll(
      "(?i)\\binformation_schema\\.cardinal_number\\b", "INT")
    out = out.replaceAll(
      "(?i)\\binformation_schema\\.(sql_identifier|character_data|yes_or_no)\\b",
      "STRING")
    // percentile_cont/disc(NULL) WITHIN GROUP: PG returns NULL
    // (ordered-set agg with NULL fraction, orderedsetaggs.c); Spark
    // rejects a NULL percentage outright — the whole call folds to a
    // typed NULL (still one row per group: it's a constant, not an agg)
    out = out.replaceAll(
      "(?i)\\bpercentile_(?:cont|disc)\\s*\\(\\s*null\\s*\\)\\s*within\\s+group\\s*\\([^)]*\\)",
      "max(CAST(NULL AS DOUBLE))") // stays an aggregate: one row per group
    // COLLATE "C" / COLLATE locale (gram.y a_expr COLLATE any_name):
    // Spark's binary UTF8 comparison IS the "C" collation; named
    // locales degrade to it — the clause drops
    // (quotedIdents may have backticked a quoted collation name first)
    out = out.replaceAll("(?i)\\bCOLLATE\\s+(\"[^\"]+\"|`[^`]+`|[\\w.]+)", "")
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
    // SQL-standard limit spellings (gram.y limit_clause): FETCH
    // {FIRST|NEXT} [n] {ROW|ROWS} ONLY → LIMIT n (default 1); the
    // standard's OFFSET n ROWS keeps its count; LIMIT ALL drops.
    // FETCH ... WITH TIES stays untouched (fails loudly; rank-based
    // ties need a window, out of lexical scope). Cursor FETCH verbs
    // (FETCH 10 FROM c) are routed before this rewrite ever runs.
    // the standard's OFFSET-before-FETCH order flips to Spark's
    // LIMIT-before-OFFSET
    out = out.replaceAll(
      "(?i)\\bOFFSET\\s+(\\d+)\\s+(?:ROWS?\\s+)?" +
        "FETCH\\s+(?:FIRST|NEXT)\\s+(\\d+)\\s+ROWS?\\s+ONLY",
      "LIMIT $2 OFFSET $1")
    out = out.replaceAll(
      "(?i)\\bOFFSET\\s+(\\d+)\\s+(?:ROWS?\\s+)?" +
        "FETCH\\s+(?:FIRST|NEXT)\\s+ROWS?\\s+ONLY",
      "LIMIT 1 OFFSET $1")
    out = out.replaceAll(
      "(?i)\\bFETCH\\s+(?:FIRST|NEXT)\\s+(\\d+)\\s+ROWS?\\s+ONLY", "LIMIT $1")
    out = out.replaceAll(
      "(?i)\\bFETCH\\s+(?:FIRST|NEXT)\\s+ROWS?\\s+ONLY", "LIMIT 1")
    out = out.replaceAll("(?i)\\bOFFSET\\s+(\\d+)\\s+ROWS?\\b", "OFFSET $1")
    // PG accepts OFFSET before LIMIT (gram.y select_limit lists both
    // orders); Spark only parses LIMIT-then-OFFSET
    out = out.replaceAll("(?i)\\bOFFSET\\s+(\\d+)\\s+LIMIT\\s+(\\d+)\\b",
      "LIMIT $2 OFFSET $1")
    out = out.replaceAll("(?i)\\bLIMIT\\s+ALL\\b", "")
    // ORDER BY x USING < / > (gram.y sortby USING qual_all_Op): the
    // default btree operators spell ASC / DESC; other operator classes
    // have no Spark analog and fail loudly in the parser
    out = out.replaceAll("(?i)\\bUSING\\s*<(?![=<>])", "ASC")
    out = out.replaceAll("(?i)\\bUSING\\s*>(?![=<>])", "DESC")
    // Inheritance spellings (gram.y relation_expr): `tbl*` includes
    // children, `ONLY tbl` excludes them. This engine has no table
    // inheritance — fixtures flatten children into the parent, so both
    // spellings resolve to the plain table (documented divergence:
    // ONLY on a flattened fixture still sees child rows).
    out = out.replaceAll("(?i)\\b(FROM|JOIN)\\s+([a-z_][\\w.]*)\\s*\\*", "$1 $2")
    // the standard regress inheritance family keeps parent-only
    // fixtures under <name>__only; other tables have no children here,
    // so their ONLY is the table itself
    out = out.replaceAll(
      "(?i)\\b(FROM|JOIN)\\s+ONLY\\s+(person|emp|student|stud_emp)\\b",
      "$1 $2__only")
    out = out.replaceAll("(?i)\\b(FROM|JOIN)\\s+ONLY\\s+(?=[a-z_\"])", "$1 ")
    // PG numeric/array operator spellings (pg_operator.h): ^ is POWER
    // — Spark's ^ is XOR, a silent wrong answer — # is XOR, @ is abs,
    // |/ sqrt, ||/ cbrt; @> / <@ array containment, && array overlap.
    // Simple-token and one-call operands rewrite in place; a leftover
    // ^ outside comments fails loudly rather than XOR silently.
    val operand = "((?:[\\w.$]+\\([^()]*\\))|[\\w.$]+)"
    out = out.replaceAll(s"$operand\\s*@>\\s*$operand",
      "forall($2, __v -> array_contains($1, __v))")
    out = out.replaceAll(s"$operand\\s*<@\\s*$operand",
      "forall($1, __v -> array_contains($2, __v))")
    out = out.replaceAll(s"$operand\\s*&&\\s*$operand",
      "arrays_overlap($1, $2)")
    // nested-call operands (`array(element_at(a, i)) && b`) exceed the
    // one-paren-level regex: paren-balanced fallback
    out = overlapBalanced(out)
    // user-defined operators (CREATE OPERATOR) → their functions
    out = customOpRewrites(out)
    // PG precedence: + / - bind TIGHTER than || (gram.y %left '+' is
    // above Op); Spark parses || at the same level left-assoc, so
    // 'x' || 1 + 1 || 'y' would concat-then-add — parenthesize the
    // arithmetic between concatenations
    out = out.replaceAll(
      "\\|\\|\\s*([\\w.$]+)\\s*([+-])\\s*([\\w.$]+)\\s*\\|\\|",
      "|| ($1 $2 $3) ||")
    out = out.replaceAll("\\|\\|/\\s*" + operand, "cbrt($1)")
    out = out.replaceAll("(?<!\\|)\\|/\\s*" + operand, "sqrt($1)")
    out = out.replaceAll("(?<![\\w.$<])@(?![>@])\\s*(-?[\\w.$]+)", "abs($1)")
    var prevPow: String = null
    while (prevPow != out) {
      prevPow = out
      out = out.replaceAll(s"$operand\\s*\\^\\s*$operand", "power($1, $2)")
    }
    locally { // a ^ we could not rewrite would silently XOR — reject
      val checkable = out.replaceAll("--[^\n]*", "")
        .replaceAll("(?s)/\\*.*?\\*/", "")
      if (checkable.contains("^"))
        throw new IllegalArgumentException(
          "PG ^ is power(); operand too complex for the lexical assist" +
            " — spell power(a, b) explicitly")
    }
    // PG # is bitwise XOR — which is exactly Spark's ^ (emitted only
    // after the leftover-^ check above)
    prevPow = null
    while (prevPow != out) {
      prevPow = out
      out = out.replaceAll(s"$operand\\s*#(?![>#])\\s*$operand", "($1 ^ $2)")
    }
    // GP accepts zero-argument count() (parse_func.c special-case);
    // Spark demands the star
    out = out.replaceAll("(?i)\\bcount\\s*\\(\\s*\\)", "count(*)")
    // pg_temp schema = the session's temp namespace — this engine has
    // exactly one session namespace, so the qualifier drops
    out = out.replaceAll("(?i)\\bpg_temp\\.", "")
    // GPDB GROUP BY () empty-set spellings (gram.y group_elem): a lone
    // () is the grand total (GROUPING SETS (())); a () item inside a
    // plain grouping list is a no-op and drops. GROUPING SETS bodies
    // keep their ()s — the empty set is meaningful there.
    if (!"(?i)GROUPING\\s+SETS".r.findFirstIn(out).isDefined) {
      out = out.replaceAll("(?i)\\bGROUP\\s+BY\\s+\\(\\)\\s*(?![,(])",
        "GROUP BY GROUPING SETS (()) ")
      out = out.replaceAll("(?i)(\\bGROUP\\s+BY\\s+)\\(\\)\\s*,", "$1")
      var prev: String = null
      while (prev != out) {
        prev = out
        out = out.replaceAll("(?i)(\\bGROUP\\s+BY\\s+[^;()]*?),\\s*\\(\\)", "$1")
      }
    }
    // Row-locking clauses (gram.y for_locking_clause): FOR [NO KEY]
    // UPDATE / FOR [KEY] SHARE [OF tables] [NOWAIT | SKIP LOCKED].
    // The single-writer staged-swap model needs no row locks — drop.
    out = out.replaceAll(
      "(?i)\\bFOR\\s+((NO\\s+KEY\\s+)?UPDATE|(KEY\\s+)?SHARE)" +
        "(\\s+OF\\s+[\\w.\"]+(\\s*,\\s*[\\w.\"]+)*)?" +
        "(\\s+NOWAIT|\\s+SKIP\\s+LOCKED)?", "")
    // PG TABLESAMPLE methods (gram.y tablesample_clause): both map to
    // Spark's row-level percent sampling — BERNOULLI is exactly that;
    // SYSTEM is PG's page-level variant, same statistical contract at
    // our block sizes. REPEATABLE (seed) passes through unchanged.
    out = out.replaceAll(
      "(?i)\\bTABLESAMPLE\\s+(SYSTEM|BERNOULLI)\\s*\\(\\s*([\\d.]+)\\s*\\)",
      "TABLESAMPLE ($2 PERCENT)")
    // PG type aliases after :: or "AS <alias>" inside CAST; the
    // lookahead keeps length-parameterized spellings (varchar(32) —
    // Spark parses those natively) from mapping to a bare STRING(32)
    for ((pg, spark) <- typeAlias) {
      out = out.replaceAll(s"(?i)(::\\s*)$pg\\b(?!\\s*\\()", "$1" + spark)
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
    val out = new StringBuilder(sql.length + 16)
    val open = scala.collection.mutable.Stack[Boolean]() // isArray per '['
    var inLit = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inLit) {
        out += c
        if (c == '\'') {
          if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
            out += '\''; i += 1
          } else inLit = false
        }
      } else c match {
        case '\'' => out += c; inLit = true
        case '[' =>
          var j = i - 1
          while (j >= 0 && sql.charAt(j).isWhitespace) j -= 1
          def prevOut: Char = {
            var k = out.length - 1
            while (k >= 0 && out.charAt(k).isWhitespace) k -= 1
            if (k >= 0) out.charAt(k) else ' '
          }
          val afterKeyword = j >= 4 &&
            sql.regionMatches(true, j - 4, "ARRAY", 0, 5) &&
            (j - 5 < 0 || (!Character.isLetterOrDigit(sql.charAt(j - 5)) &&
              sql.charAt(j - 5) != '_'))
          // a nested row of a multi-dim constructor —
          // ARRAY[[1,2],[3,4]] (gram.y a_expr ARRAY array_expr): the
          // '[' directly follows the constructor's opening or a ','
          // inside it; it becomes its own array(...) level
          val nestedRow = !afterKeyword && open.nonEmpty && open.top && {
            val p = prevOut
            p == '(' || p == ','
          }
          open.push(afterKeyword || nestedRow)
          if (afterKeyword) out += '('
          else if (nestedRow) out ++= "array("
          else out += '['
        case ']' if open.nonEmpty =>
          if (open.pop()) out += ')' else out += ']'
        case ']' => out += ']'
        case other => out += other
      }
      i += 1
    }
    out.toString
  }

  /** PG `FROM ... unnest(expr) [WITH ORDINALITY] [AS] alias[(cols)]`
    * (gram.y func_table / opt_ordinality) → Spark's lateral TVF forms.
    * PG's SRF-in-FROM is implicitly LATERAL; Spark wants the keyword,
    * so an unnest after a comma becomes `LATERAL (SELECT ... FROM
    * posexplode(...))` and one directly after FROM (no left-hand item
    * to correlate with) becomes a plain subquery. ORDINALITY is
    * 1-based BIGINT per PG; posexplode's pos is 0-based, hence the
    * +1 cast. Literal-aware balanced-paren scan; multi-array unnest
    * and alias-less forms are left untouched (fail loudly in Spark's
    * parser, per this file's contract). */
  private val clauseWords = Seq("select", "from", "where", "group",
    "order", "having", "limit", "window")

  private def unnestFrom(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    var inLit = false
    // current clause keyword per paren depth: a comma only introduces a
    // FROM item (implicit-LATERAL position) when the enclosing clause
    // at this depth is FROM — a SELECT-list or GROUP BY unnest stays
    // untouched
    val clause = scala.collection.mutable.Stack[String]("")
    def word(at: Int, w: String): Boolean =
      sql.regionMatches(true, at, w, 0, w.length) &&
        (at == 0 || (!Character.isLetterOrDigit(sql.charAt(at - 1)) &&
          sql.charAt(at - 1) != '_' && sql.charAt(at - 1) != '.')) &&
        (at + w.length >= sql.length ||
          (!Character.isLetterOrDigit(sql.charAt(at + w.length)) &&
            sql.charAt(at + w.length) != '_'))
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inLit) {
        out += c
        if (c == '\'') {
          if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
            out += '\''; i += 1
          } else inLit = false
        }
        i += 1
      } else if (c == '\'') { out += c; inLit = true; i += 1 }
      else if (c == '(') { clause.push(""); out += c; i += 1 }
      else if (c == ')') { if (clause.size > 1) clause.pop(); out += c; i += 1 }
      else if (clauseWords.exists(word(i, _))) {
        val w = clauseWords.find(word(i, _)).get
        clause.pop(); clause.push(w)
        out ++= sql.substring(i, i + w.length); i += w.length
      }
      else if (word(i, "unnest") || word(i, "regexp_split_to_table") ||
        word(i, "string_to_table") || word(i, "generate_subscripts")) {
        val fname = Seq("unnest", "regexp_split_to_table",
          "string_to_table", "generate_subscripts").find(word(i, _)).get
        // preceding non-space token decides the form
        var p = i - 1
        while (p >= 0 && sql.charAt(p).isWhitespace) p -= 1
        val afterComma = p >= 0 && sql.charAt(p) == ',' &&
          clause.top == "from"
        val afterFrom = p >= 3 &&
          sql.regionMatches(true, p - 3, "FROM", 0, 4) &&
          (p - 4 < 0 || !Character.isLetterOrDigit(sql.charAt(p - 4)))
        // JOIN unnest(outer_col) — PG treats SRFs in FROM as
        // implicitly LATERAL; Spark needs the keyword spelled
        val afterJoin = p >= 3 &&
          sql.regionMatches(true, p - 3, "JOIN", 0, 4) &&
          (p - 4 < 0 || !Character.isLetterOrDigit(sql.charAt(p - 4)))
        var j = i + fname.length
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (!(afterComma || afterFrom || afterJoin) || j >= sql.length ||
          sql.charAt(j) != '(') { out += c; i += 1 }
        else {
          // balanced scan of the argument; top-level comma = multi-arg
          var depth = 0; var lit = false; var multi = false
          var k = j
          var end = -1
          while (k < sql.length && end < 0) {
            val ch = sql.charAt(k)
            if (lit) { if (ch == '\'') lit = false }
            else ch match {
              case '\'' => lit = true
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) end = k
              case ',' if depth == 1 => multi = true
              case _ =>
            }
            k += 1
          }
          val tail = if (end < 0) "" else sql.substring(end + 1)
          val m = ("(?is)^\\s*(WITH\\s+ORDINALITY\\s+)?(?:AS\\s+)?" +
            "([A-Za-z_][A-Za-z_0-9]*)\\s*(?:\\(\\s*([A-Za-z_][A-Za-z_0-9]*)" +
            "\\s*(?:,\\s*([A-Za-z_][A-Za-z_0-9]*)\\s*)?\\))?").r
            .findPrefixMatchOf(tail)
          val keywordAlias = m.exists(mm => Set("where", "group", "order",
            "limit", "join", "on", "inner", "left", "right", "full",
            "cross", "union", "having", "with", "offset", "fetch",
            "except", "intersect", "lateral").contains(mm.group(2).toLowerCase))
          // alias-less SRF in FROM (PG names the column after the
          // function): synthesize the function name as the alias
          val aliasless = m.isEmpty || keywordAlias
          // a 2-column alias list without ORDINALITY is invalid PG for
          // a single-array unnest — leave it for Spark to reject
          val badCols = !aliasless && m.exists(mm =>
            mm.group(1) == null && mm.group(4) != null)
          if (end < 0 || (multi && fname == "unnest") || badCols) {
            out += c; i += 1
          } else if (aliasless) {
            val arg = sql.substring(j + 1, end)
            val arrExpr0 = fname match {
              case "unnest" => arg
              case "regexp_split_to_table" => s"regexp_split_to_array($arg)"
              case "string_to_table" => s"string_to_array($arg)"
              case "generate_subscripts" =>
                s"sequence(1, array_length($arg))"
            }
            val an = fname
            out ++= (if (afterComma || afterJoin) "LATERAL " else "") ++=
              s"(SELECT col AS $an FROM explode($arrExpr0)) AS $an"
            i = end + 1
          } else {
            val mm = m.get
            val arg = sql.substring(j + 1, end)
            val ord = mm.group(1) != null
            val alias = mm.group(2)
            val c1 = Option(mm.group(3))
            val c2 = Option(mm.group(4))
            // split SRFs wrap their args into the PG-semantics array
            // function; unnest's arg IS the array
            val arrExpr = fname match {
              case "unnest" => arg
              case "regexp_split_to_table" => s"regexp_split_to_array($arg)"
              case "string_to_table" => s"string_to_array($arg)"
              case "generate_subscripts" =>
                s"sequence(1, array_length($arg))"
            }
            val sel =
              if (ord)
                s"(SELECT col AS ${c1.getOrElse("unnest")}, " +
                  s"CAST(pos + 1 AS BIGINT) AS ${c2.getOrElse("ordinality")} " +
                  s"FROM posexplode($arrExpr))"
              else
                s"(SELECT col AS ${c1.getOrElse(alias)} FROM explode($arrExpr))"
            // trailing space: the alias regex's \s* swallows the
            // whitespace separating the alias from the next clause, so
            // re-emit one separator or 'AS t WHERE' would glue to 'tWHERE'
            out ++= (if (afterComma || afterJoin) "LATERAL " else "") ++=
              sel ++= s" AS $alias "
            i = end + 1 + mm.end
          }
        }
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** PG 1-based array subscripts (arrayfuncs.c array_get_element):
    * `expr[i]` → `try_element_at(expr, i)`. Spark's own `x[i]` is
    * 0-based and ANSI-errors out of range — a silent off-by-one for
    * EVERY migrated PG query — while try_element_at is 1-based and
    * NULL out-of-bounds, exactly PG's subscript contract (map
    * subscripts keep identical semantics through the same call).
    * Untouched: empty `[]` (type names, rewritten later), slices
    * `[a:b]` (array_get_slice — PgArrays API), brackets in literals.
    * Chained `x[1][2]` resolves over the fixpoint iterations. */
  private def subscripts(sqlIn: String): String = {
    var cur = sqlIn
    var guard = 0
    while (guard < 256) {
      val next = subscriptOnce(cur)
      if (next == cur) return cur
      cur = next; guard += 1
    }
    cur
  }

  private def subscriptOnce(sql: String): String = {
    val masked = maskLiterals(sql)
    var i = 0
    while (i < masked.length) {
      if (masked.charAt(i) == '[') {
        // matching close bracket (masked scan: literals can't fool it)
        var depth = 0; var j = i; var close = -1
        while (j < masked.length && close < 0) {
          masked.charAt(j) match {
            case '[' => depth += 1
            case ']' => depth -= 1; if (depth == 0) close = j
            case _ =>
          }
          j += 1
        }
        if (close < 0) return sql
        val content = sql.substring(i + 1, close)
        val mContent = masked.substring(i + 1, close)
        // top-level ':' → slice; empty → type decl
        var d2 = 0; var topColon = false
        mContent.foreach {
          case '(' | '[' => d2 += 1
          case ')' | ']' => d2 -= 1
          case ':' if d2 == 0 => topColon = true
          case _ =>
        }
        if (content.trim.nonEmpty && !topColon) {
          // backward scan for the subscripted base expression
          var b = i - 1
          while (b >= 0 && masked.charAt(b).isWhitespace) b -= 1
          var start = -1
          var more = b >= 0
          while (more) {
            more = false
            val c = if (b >= 0) masked.charAt(b) else ' '
            if (c == ')' || c == ']') {
              val openCh = if (c == ')') '(' else '['
              var d3 = 0; var k = b; var op = -1
              while (k >= 0 && op < 0) {
                val ch = masked.charAt(k)
                if (ch == c) d3 += 1
                else if (ch == openCh) { d3 -= 1; if (d3 == 0) op = k }
                k -= 1
              }
              if (op >= 0) { start = op; b = op - 1; more = true }
              else start = -1
            } else if (c == '`') {
              var k = b - 1
              while (k >= 0 && masked.charAt(k) != '`') k -= 1
              if (k >= 0) { start = k; b = k - 1; more = true }
              else start = -1
            } else if (c == '\'') {
              // a string literal base ('...'[1] is legal after a cast
              // rewrite); find its opening quote in the masked copy
              var k = b - 1
              while (k >= 0 && masked.charAt(k) != '\'') k -= 1
              if (k >= 0) { start = k; b = k - 1; more = false }
              else start = -1
            } else if (Character.isLetterOrDigit(c) || c == '_' || c == '$') {
              var k = b
              while (k >= 0 && (Character.isLetterOrDigit(masked.charAt(k)) ||
                masked.charAt(k) == '_' || masked.charAt(k) == '$')) k -= 1
              start = k + 1; b = k; more = true
            } else if (c == '.' && start >= 0) {
              b -= 1; more = true
            }
            // after consuming a component, a '.' continues the chain
            if (!more && start >= 0 && b >= 0 && masked.charAt(b) == '.') {
              b -= 1; more = true
            }
          }
          if (start >= 0) {
            val base = sql.substring(start, i).trim
            // a bare word base could be a TYPE name mid-declaration
            // (e.g. `int[3]` has no PG meaning; leave) — only rewrite
            // when the base is not immediately preceded by a type
            // context like '::'; '::' bases are array-typed casts whose
            // brackets the cast rewrites own
            val before = masked.substring(0, start).reverse.dropWhile(_.isWhitespace)
            if (!before.startsWith("::")) {
              // PG: a subscript below the array's lower bound yields
              // NULL (arrayfuncs.c array_ref); try_element_at(-1) would
              // return the LAST element. Guard indexes that cast to a
              // number < 1; map keys try_cast to NULL and take the
              // plain call through the ELSE arm.
              // element_at demands an INT index; PG subscripts are
              // int8-friendly (generate_series yields bigint) — cast
              // non-string-literal indexes down. A quoted literal is
              // a MAP key and passes through untouched.
              val idx =
                if (content.trim.startsWith("'")) content
                else s"CAST(($content) AS INT)"
              return sql.substring(0, start) +
                s"(CASE WHEN try_cast(($content) AS BIGINT) < 1 THEN NULL " +
                s"ELSE try_element_at($base, $idx) END)" +
                sql.substring(close + 1)
            }
          }
        }
        i = close + 1
      } else i += 1
    }
    sql
  }

  /** The `||` operator's ARRAY forms (pg_operator.h array_cat /
    * array_append / array_prepend): fires only when one operand is a
    * syntactic ARRAY(...) constructor (or an already-built
    * pg_array_cat chain) — string `||` stays Spark's concat. Runs
    * AFTER arrayBrackets (constructors are ARRAY(...) by then). */
  private def arrayConcatOps(sqlIn: String): String = {
    if ("(?i)\\barray\\s*\\(".r.findFirstIn(sqlIn).isEmpty) return sqlIn
    var sql = sqlIn
    var changed = true
    while (changed) {
      changed = false
      val masked = maskLiterals(sql)
      "\\|\\|".r.findAllMatchIn(masked).find { m =>
        // RHS operand extent
        var r0 = m.end
        while (r0 < masked.length && masked.charAt(r0).isWhitespace) r0 += 1
        var r1 = r0
        if (r1 < masked.length && masked.charAt(r1) == '\'') {
          r1 += 1
          while (r1 < masked.length && masked.charAt(r1) != '\'') r1 += 1
          r1 += 1
        } else {
          while (r1 < masked.length && (masked.charAt(r1).isLetterOrDigit ||
            masked.charAt(r1) == '_' || masked.charAt(r1) == '.' ||
            masked.charAt(r1) == '$')) r1 += 1
          if (r1 < masked.length && masked.charAt(r1) == '(')
            r1 = matchingParen(masked, r1) + 1
        }
        // LHS operand extent
        var l1 = m.start - 1
        while (l1 >= 0 && masked.charAt(l1).isWhitespace) l1 -= 1
        var l0 = l1
        if (l0 >= 0 && masked.charAt(l0) == ')') {
          var d = 0
          var k = l0
          var open = -1
          while (k >= 0 && open < 0) {
            masked.charAt(k) match {
              case ')' => d += 1
              case '(' => d -= 1; if (d == 0) open = k
              case _ =>
            }
            k -= 1
          }
          l0 = open
          var t = l0 - 1
          while (t >= 0 && (masked.charAt(t).isLetterOrDigit ||
            masked.charAt(t) == '_' || masked.charAt(t) == '.')) t -= 1
          l0 = t + 1
        } else if (l0 >= 0 && masked.charAt(l0) == '\'') {
          var k = l0 - 1
          while (k >= 0 && masked.charAt(k) != '\'') k -= 1
          l0 = k
        } else {
          while (l0 >= 0 && (masked.charAt(l0).isLetterOrDigit ||
            masked.charAt(l0) == '_' || masked.charAt(l0) == '.' ||
            masked.charAt(l0) == '$')) l0 -= 1
          l0 += 1
        }
        val lhs = sql.substring(l0, l1 + 1)
        val rhs = sql.substring(r0, r1)
        val arrayish = "(?is)^(array|pg_array_cat)\\s*\\(".r
        if (l0 > l1 || r0 >= r1 ||
          (arrayish.findFirstIn(lhs).isEmpty &&
            arrayish.findFirstIn(rhs).isEmpty)) false
        else {
          sql = sql.substring(0, l0) + s"pg_array_cat($lhs, $rhs)" +
            sql.substring(r1)
          changed = true
          true
        }
      }
    }
    sql
  }

  /** PG array slices `a[1:3]`, incl. multi-dim chains
    * `b[1:1][1:2][1:2]` (arrayfuncs.c array_get_slice): level 1 is a
    * 1-based `slice(...)`; deeper levels apply through nested
    * `transform`s. In slice mode a bare index is the UPPER bound with
    * lower 1 (PG's array_ref slice rules). Slice ASSIGNMENT targets
    * (`SET a[1:2] = …`) are left alone. */
  private def arraySlices(sqlIn: String): String = {
    var sql = sqlIn
    var changed = true
    while (changed) {
      changed = false
      val masked = maskLiterals(sql)
      "([A-Za-z_][\\w.]*)\\s*\\[".r.findAllMatchIn(masked).find { m =>
        val base = sql.substring(m.start(1), m.end(1))
        if (base.equalsIgnoreCase("array")) false
        else {
          // collect the chain of bracket groups
          var groups = List.empty[(Int, Int)]
          var p = m.end - 1
          var ok = true
          while (ok && p < masked.length && masked.charAt(p) == '[') {
            var d = 0
            var q = p
            var close = -1
            while (q < masked.length && close < 0) {
              masked.charAt(q) match {
                case '[' => d += 1
                case ']' => d -= 1; if (d == 0) close = q
                case _ =>
              }
              q += 1
            }
            if (close < 0) ok = false
            else {
              groups = groups :+ ((p, close))
              p = close + 1
            }
          }
          def topColon(o: Int, c: Int): Boolean = {
            var d = 0
            var col = false
            masked.substring(o + 1, c).foreach {
              case '[' | '(' => d += 1
              case ']' | ')' => d -= 1
              case ':' if d == 0 => col = true
              case _ =>
            }
            col
          }
          val sliceMode = ok && groups.nonEmpty &&
            groups.exists { case (o, c) => topColon(o, c) } &&
            groups.head._2 - groups.head._1 > 1 // non-empty first group
          val before = masked.substring(0, m.start(1)).reverse
            .dropWhile(_.isWhitespace)
          // an assignment target (UPDATE SET a[1:2] = …) stays
          var after = groups.lastOption.map(_._2 + 1).getOrElse(0)
          while (after < masked.length && masked.charAt(after).isWhitespace)
            after += 1
          val isAssign = after < masked.length &&
            masked.charAt(after) == '=' &&
            (after + 1 >= masked.length || masked.charAt(after + 1) != '=')
          if (!sliceMode || before.startsWith("::") || isAssign) false
          else {
            def bounds(o: Int, c: Int): (String, String) = {
              val body = sql.substring(o + 1, c)
              val mbody = masked.substring(o + 1, c)
              var d = 0
              var colonAt = -1
              var k = 0
              while (k < mbody.length) {
                mbody.charAt(k) match {
                  case '[' | '(' => d += 1
                  case ']' | ')' => d -= 1
                  case ':' if d == 0 && colonAt < 0 => colonAt = k
                  case _ =>
                }
                k += 1
              }
              if (colonAt < 0) ("1", body.trim)
              else (body.substring(0, colonAt).trim,
                body.substring(colonAt + 1).trim)
            }
            var expr = base
            var level = 0
            groups.foreach { case (o, c) =>
              val (lo, hi) = bounds(o, c)
              def core(v: String) = s"slice($v, ($lo), ($hi) - ($lo) + 1)"
              def wrap(l: Int, v: String): String =
                if (l == 0) core(v)
                else s"transform($v, __sl$l -> ${wrap(l - 1, s"__sl$l")})"
              expr = wrap(level, expr)
              level += 1
            }
            sql = sql.substring(0, m.start(1)) + s"($expr)" +
              sql.substring(groups.last._2 + 1)
            changed = true
            true
          }
        }
      }
    }
    sql
  }

  /** COMPLEX spellings (complex_type.c): the typed literal
    * `COMPLEX '5+3i'` and the `'...'::complex` / `n::complex` casts
    * become the complex_in expression / constructor; the no-op unary
    * `+(COMPLEX...)` drops and unary `-(COMPLEX...)` → complex_neg;
    * `abs(COMPLEX...)` dispatches to complex_abs (Spark's abs can't
    * take a struct). Runs on raw text — literals are the subject. */
  private def complexRewrites(sql: String): String = {
    var out = sql
    out = "(?i)\\bCOMPLEX\\s*'([^']*+(?:''[^']*+)*+)'".r.replaceAllIn(out, m =>
      java.util.regex.Matcher.quoteReplacement(
        PgComplex.inExprSql("'" + m.group(1) + "'")))
    out = "(?i)'([^']*+(?:''[^']*+)*+)'\\s*::\\s*complex\\b".r.replaceAllIn(out, m =>
      java.util.regex.Matcher.quoteReplacement(
        PgComplex.inExprSql("'" + m.group(1) + "'")))
    out = "(?i)\\b(\\d+(?:\\.\\d+)?)\\s*::\\s*complex\\b".r
      .replaceAllIn(out, m => java.util.regex.Matcher.quoteReplacement(
        s"named_struct('re', CAST(${m.group(1)} AS DOUBLE), " +
          "'im', CAST(0 AS DOUBLE))"))
    out = "(?i)([,(]\\s*|\\bSELECT\\s+)\\+\\s*\\((?=\\s*COMPLEX\\b)".r
      .replaceAllIn(out, "$1(")
    out = "(?i)([,(]\\s*|\\bSELECT\\s+)-\\s*\\((?=\\s*COMPLEX\\b)".r
      .replaceAllIn(out, "$1complex_neg(")
    out = "(?i)\\babs\\s*\\(\\s*(?=COMPLEX\\b)".r
      .replaceAllIn(out, "complex_abs(")
    // FLOAT8/FLOAT4 typed literals (Spark's parser lacks them), with
    // PG float8in's case-insensitive nan/infinity spellings
    out = "(?i)\\bFLOAT[48]\\s*'([^']*+(?:''[^']*+)*+)'".r.replaceAllIn(out, m =>
      java.util.regex.Matcher.quoteReplacement(
        PgComplex.pgFloatSql("'" + m.group(1) + "'")))
    // BOOL 'spelling' typed literals (bool.c parse_bool_with_len:
    // any unique prefix of true/false/yes/no/on/off plus 1/0,
    // case-insensitive, trimmed) — resolved here at rewrite time
    out = "(?i)\\bBOOL(?:EAN)?\\s*'([^']*+(?:''[^']*+)*+)'".r.replaceAllIn(out, m => {
      val b = m.group(1).trim.toLowerCase
      val v =
        if (b.nonEmpty && ("true".startsWith(b) || "yes".startsWith(b) ||
          b == "on" || b == "1" || b == "t" || b == "y")) Some("TRUE")
        else if (b.nonEmpty && ("false".startsWith(b) || "no".startsWith(b) ||
          ("off".startsWith(b) && b.length >= 2) || b == "0")) Some("FALSE")
        else None
      java.util.regex.Matcher.quoteReplacement(v.getOrElse(
        s"CAST('${m.group(1)}' AS BOOLEAN)")) // malformed → loud
    })
    out
  }

  /** `gp_dist_random('t')` (cdbutil.c) reads a table's segment-local
    * slices without the final gather — on Spark the scan IS already
    * motion-free, so the call degrades to the table itself (keeping
    * its name as the from-item alias, which is how GP resolves columns
    * under it). */
  private def gpDistRandom(sql: String): String =
    "(?i)\\bgp_dist_random\\s*\\(\\s*'([\\w.\"]+)'\\s*\\)".r
      .replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
        m.group(1).replace("\"", "")))

  /** `generate_series` through the SQL front door (int.c / timestamp.c
    * generate_series SRFs). Two positions PG allows:
    *  - FROM item `FROM generate_series(a,b[,s]) [AS] g [(c)]` →
    *    `(SELECT explode(<seq>) AS col) AS alias`; PG names the single
    *    output column after the ALIAS when one is given (function name
    *    otherwise), and a comma-position item becomes LATERAL.
    *  - select-list item `SELECT k, generate_series(a,b)` →
    *    `explode(<seq>) AS generate_series` — Spark's generator-in-
    *    projection IS the targetlist-SRF expansion for a single SRF
    *    (multiple SRFs fail loudly; Srf.projectSet* is the API path
    *    for the reference's LCM protocol).
    * <seq>: plain `sequence(...)` — except that PG yields ZERO rows
    * when the direction contradicts the step (generate_series(5,1)
    * is empty; Spark's 2-arg sequence would count DOWN), so numeric
    * forms get a direction guard. Interval steps pass through
    * (sequence enforces the same sign rule PG does there). */
  private def generateSeriesRewrite(sql: String): String = {
    val masked = maskLiterals(sql)
    val out = new StringBuilder
    var i = 0
    val clause = scala.collection.mutable.Stack[String]("")
    def word(at: Int, w: String): Boolean =
      masked.regionMatches(true, at, w, 0, w.length) &&
        (at == 0 || (!Character.isLetterOrDigit(masked.charAt(at - 1)) &&
          masked.charAt(at - 1) != '_' && masked.charAt(at - 1) != '.')) &&
        (at + w.length >= masked.length ||
          (!Character.isLetterOrDigit(masked.charAt(at + w.length)) &&
            masked.charAt(at + w.length) != '_'))
    while (i < sql.length) {
      val c = masked.charAt(i)
      if (c == '(') { clause.push(""); out += sql.charAt(i); i += 1 }
      else if (c == ')') {
        if (clause.size > 1) clause.pop(); out += sql.charAt(i); i += 1
      } else if (clauseWords.exists(word(i, _))) {
        val w = clauseWords.find(word(i, _)).get
        clause.pop(); clause.push(w)
        out ++= sql.substring(i, i + w.length); i += w.length
      } else if (word(i, "generate_series")) {
        var p = i - 1
        while (p >= 0 && masked.charAt(p).isWhitespace) p -= 1
        val prevComma = p >= 0 && masked.charAt(p) == ','
        // `, lateral generate_series(a, corr)` — explicit LATERAL with
        // correlated bounds; the subquery form below supports it as-is
        val prevLateral = p >= 6 && word(p - 6, "lateral")
        val fromPos = (clause.top == "from" && (prevComma || prevLateral ||
          word(p - 3, "from") || word(p - 3, "join"))) ||
          (clause.top == "" && word(p - 3, "join"))
        val selPos = clause.top == "select" &&
          (prevComma || word(p - 5, "select") || word(p - 7, "distinct"))
        var j = i + "generate_series".length
        while (j < masked.length && masked.charAt(j).isWhitespace) j += 1
        if ((!fromPos && !selPos) || j >= masked.length ||
            masked.charAt(j) != '(') {
          out += sql.charAt(i); i += 1
        } else {
          // balanced argument scan on the masked copy
          var depth = 0; var k = j; var end = -1
          val commas = Seq.newBuilder[Int]
          while (k < masked.length && end < 0) {
            masked.charAt(k) match {
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) end = k
              case ',' if depth == 1 => commas += k
              case _ =>
            }
            k += 1
          }
          if (end < 0) { out += sql.charAt(i); i += 1 }
          else {
            val cuts = j +: commas.result() :+ end
            val args = cuts.sliding(2).map(w2 =>
              sql.substring(w2.head + 1, w2.last).trim).toSeq
            val seq = seqExpr(args)
            if (fromPos) {
              val tail = sql.substring(end + 1)
              val m = ("(?is)^\\s*(?:AS\\s+)?([A-Za-z_][A-Za-z_0-9]*)" +
                "\\s*(?:\\(\\s*([A-Za-z_][A-Za-z_0-9]*)\\s*\\))?").r
                .findPrefixMatchOf(tail)
              val kw = Set("where", "group", "order", "limit", "join",
                "on", "inner", "left", "right", "full", "cross", "union",
                "having", "with", "offset", "fetch", "except",
                "intersect", "lateral", "using")
              val (alias, colName, consumed) = m match {
                case Some(mm) if !kw.contains(mm.group(1).toLowerCase) =>
                  (mm.group(1),
                    Option(mm.group(2)).getOrElse(mm.group(1)), mm.end)
                case _ => ("generate_series", "generate_series", 0)
              }
              out ++= (if (prevComma) "LATERAL " else "") ++=
                s"(SELECT explode($seq) AS $colName) AS $alias "
              i = end + 1 + consumed
            } else {
              // select-list: only a bare item (next token ends it —
              // incl. a subquery's closing paren and clause keywords,
              // the shapes SETOF function inlining produces)
              val tail = masked.substring(end + 1)
              val bare = tail.matches("(?is)^\\s*(,|;|\\)|\\bfrom\\b|" +
                "\\bas\\b|\\border\\b|\\bunion\\b|\\blimit\\b|" +
                "\\bwhere\\b|\\bgroup\\b|$).*")
              if (!bare) { out += sql.charAt(i); i += 1 }
              else {
                val hasAs = tail.matches("(?is)^\\s*as\\b.*")
                out ++= s"explode($seq)" ++=
                  (if (hasAs) "" else " AS generate_series")
                i = end + 1
              }
            }
          }
        }
      } else { out += sql.charAt(i); i += 1 }
    }
    out.toString
  }

  /** PG `LATERAL (VALUES (e1, e2)) v(c1, c2)` with correlated
    * expressions: Spark refuses outer references inside an inline
    * table, but a lateral SELECT projects them fine — the single-row
    * form rewrites to `LATERAL (SELECT e1 AS c1, e2 AS c2) AS v`
    * (multi-row correlated VALUES has no lexical equivalent and fails
    * loudly in the parser as before). */
  /** Single-row `VALUES (exprs)` as a QUERY BODY — a CTE definition
    * (`with cte(foo) as ( values(i) )`) or the query after a WITH
    * list (`with ... ) values((select ...))`) — becomes `SELECT
    * exprs`: same rows (PG treats a one-row VALUES as a select), and
    * Spark can then host OUTER references in it (a correlated inline
    * table cannot be evaluated; a correlated scalar select can).
    * INSERT ... VALUES never matches: its VALUES follows a table name
    * or a column-list paren preceded by the name, never `AS (`. */
  private def cteSingleRowValues(sqlIn: String): String = {
    if ("(?i)\\bVALUES\\s*\\(".r.findFirstIn(sqlIn).isEmpty) return sqlIn
    var sql = sqlIn
    var changed = true
    while (changed) {
      changed = false
      val masked = maskLiterals(sql)
      "(?i)\\bVALUES\\s*\\(".r.findAllMatchIn(masked).find { m =>
        val open = masked.indexOf('(', m.start)
        val close = matchingParen(masked, open)
        if (close < 0) false
        else {
          // single row: next non-ws after the row is NOT a comma
          var k = close + 1
          while (k < masked.length && masked.charAt(k).isWhitespace) k += 1
          val singleRow = k >= masked.length || masked.charAt(k) != ','
          // context: preceding non-ws is '(' (a subquery/CTE body
          // start), or the ')' closing a `AS ( ... )` CTE definition
          var p = m.start - 1
          while (p >= 0 && masked.charAt(p).isWhitespace) p -= 1
          val bodyStart = p >= 0 && masked.charAt(p) == '('
          val afterCte = p >= 0 && masked.charAt(p) == ')' && {
            // walk back over the balanced group; the token before it
            // must be AS (a CTE definition just closed)
            var d = 0
            var q = p
            var openAt = -1
            while (q >= 0 && openAt < 0) {
              masked.charAt(q) match {
                case ')' => d += 1
                case '(' => d -= 1; if (d == 0) openAt = q
                case _ =>
              }
              q -= 1
            }
            openAt > 0 && "(?is)\\bAS\\s*$".r
              .findFirstIn(masked.substring(0, openAt)).isDefined
          }
          if (singleRow && (bodyStart || afterCte)) {
            val row = sql.substring(open + 1, close)
            sql = sql.substring(0, m.start) + "SELECT " + row +
              sql.substring(close + 1)
            changed = true
            true
          } else false
        }
      }
    }
    sql
  }

  private def lateralValues(sqlIn: String): String = {
    var sql = sqlIn
    var changed = true
    while (changed) {
      changed = false
      val masked = maskLiterals(sql)
      val m = "(?i)\\blateral\\s*\\(\\s*values\\s*\\(".r
        .findFirstMatchIn(masked)
      m.foreach { mm =>
        val open0 = masked.indexOf('(', mm.start)
        val vOpen = mm.end - 1
        val rowClose = matchingParen(masked, vOpen)
        var k = rowClose + 1
        while (k < masked.length && masked.charAt(k).isWhitespace) k += 1
        if (k < masked.length && masked.charAt(k) == ')') {
          val latClose = k
          val tail = masked.substring(latClose + 1)
          val am = "(?is)^\\s*(?:AS\\s+)?([A-Za-z_]\\w*)\\s*\\(([^)]*)\\)".r
            .findPrefixMatchOf(tail)
          am.foreach { a =>
            val exprs = topLevelSplit(sql.substring(vOpen + 1, rowClose),
              masked.substring(vOpen + 1, rowClose))
            val cols = a.group(2).split(",").map(_.trim).toSeq
            if (cols.length == exprs.length) {
              val sel = exprs.zip(cols).map { case (e, c2) => s"$e AS $c2" }
                .mkString(", ")
              sql = sql.substring(0, open0) +
                s"(SELECT $sel) AS ${a.group(1)}" +
                sql.substring(latClose + 1 + a.end)
              changed = true
            }
          }
        }
      }
    }
    sql
  }

  /** SRF inside `INSERT .. VALUES` rows (PG transformInsertStmt turns
    * a VALUES list with set-returning expressions into a per-row set
    * product; since PG 10 multiple SRFs in one row advance in LOCKSTEP
    * and the shorter pads NULL — ExecProjectSet): rewrite the VALUES
    * list into a UNION ALL of SELECTs, expanding each SRF row through
    * `explode(arrays_zip(sequence(..), ..))` whose zip-pad semantics
    * are exactly PG's. `INSERT INTO t VALUES (generate_series(1,10),
    * generate_series(1,100), 'x')` inserts 100 rows, the first column
    * NULL past 10. */
  private def srfInsertValues(sqlIn: String): String = {
    if ("(?i)\\bvalues\\b".r.findFirstIn(sqlIn).isEmpty ||
        "(?i)generate_series".r.findFirstIn(sqlIn).isEmpty) return sqlIn
    val masked = maskLiterals(sqlIn)
    // full INSERT form, or the bare VALUES body the assignment-cast
    // INSERT path evaluates on its own
    val head = ("(?is)^((?:\\s*INSERT\\s+INTO\\s+[\\w.\"]+\\s*" +
      "(?:\\([^)]*\\))?)?\\s*)VALUES\\s*\\(").r.findFirstMatchIn(masked)
      .getOrElse(return sqlIn)
    // parse the row list by paren matching on the masked text
    var i = masked.indexOf('(', head.end - 1)
    val rows = Seq.newBuilder[(Int, Int)] // (open, close) per row
    var ok = true
    var done = false
    while (!done && ok) {
      val close = matchingParen(masked, i)
      if (close < 0) ok = false
      else {
        rows += ((i, close))
        var k = close + 1
        while (k < masked.length && masked.charAt(k).isWhitespace) k += 1
        if (k < masked.length && masked.charAt(k) == ',') {
          var j = k + 1
          while (j < masked.length && masked.charAt(j).isWhitespace) j += 1
          if (j < masked.length && masked.charAt(j) == '(') i = j
          else ok = false
        } else if (k >= masked.length || masked.charAt(k) == ';' ||
                   masked.substring(k).trim.isEmpty) done = true
        else ok = false // VALUES .. RETURNING etc: leave to other paths
      }
    }
    val rowSpans = rows.result()
    if (!ok || rowSpans.isEmpty) return sqlIn
    val srfRe = "(?i)\\bgenerate_series\\s*\\(".r
    if (!rowSpans.exists { case (o, c) =>
        srfRe.findFirstIn(masked.substring(o, c)).isDefined })
      return sqlIn
    val selects = rowSpans.zipWithIndex.map { case ((o, c), ri) =>
      val body = sqlIn.substring(o + 1, c)
      val mbody = masked.substring(o + 1, c)
      // distinct SRF call texts in this row (whitespace-normalized)
      val calls = srfRe.findAllMatchIn(mbody).toSeq.map { m2 =>
        val open = mbody.indexOf('(', m2.start)
        val close = matchingParen(mbody, open)
        (m2.start, close + 1, body.substring(m2.start, close + 1)
          .replaceAll("\\s+", " "))
      }
      val distinct = calls.map(_._3).distinct
      val exprs = topLevelSplit(body, mbody)
      if (distinct.isEmpty)
        "SELECT " + exprs.zipWithIndex.map { case (e, k) =>
          s"$e AS __vc$k" }.mkString(", ")
      else {
        // route each call's arguments through seqExpr so the
        // direction/empty-set guard and integral casts apply here too:
        // VALUES (generate_series(5,1)) inserts ZERO rows in PG, and
        // mixed-width bounds need seqExpr's same-type casts for Spark
        val arrays = distinct.map { ct =>
          val open = ct.indexOf('(')
          val inner = ct.substring(open + 1, ct.length - 1)
          seqExpr(topLevelSplit(inner, maskLiterals(inner)).map(_.trim))
        }
        val (fromSql, ref) =
          if (distinct.size == 1)
            (s"(SELECT explode(${arrays.head}) AS __z$ri)",
             (_: Int) => s"__z$ri")
          else
            (s"(SELECT explode(arrays_zip(${arrays.mkString(", ")})) AS __z$ri)",
             (k: Int) => s"__z$ri.`$k`")
        val rewritten = exprs.zipWithIndex.map { case (e, k) =>
          var e2 = e
          distinct.zipWithIndex.foreach { case (ct, di) =>
            // replace each occurrence of this call text (normalized)
            val pat = java.util.regex.Pattern.quote(ct)
              .replace(" ", "\\E\\s*\\Q")
            e2 = e2.replaceAll("(?i)" + pat,
              java.util.regex.Matcher.quoteReplacement(ref(di)))
          }
          s"$e2 AS __vc$k"
        }
        s"SELECT ${rewritten.mkString(", ")} FROM $fromSql"
      }
    }
    sqlIn.substring(0, head.start) + head.group(1) +
      selects.mkString(" UNION ALL ") +
      sqlIn.substring(rowSpans.last._2 + 1)
  }

  /** SRF arithmetic / repetition in a SELECT list (ExecProjectSet):
    * `SELECT gs(1,100), gs(1,100)*3, gs(1,100)%6` — every call with
    * IDENTICAL arguments is ONE row source in PG's LCM protocol, so
    * the calls hoist to a single LATERAL item and the select items
    * become expressions over its column. (Distinct-argument SRF zips
    * stay loud — Srf.projectSet is the API for the full protocol.)
    * Triggered only when a plain bare-item rewrite can't apply:
    * several calls, or a call nested in arithmetic. */
  private def srfSelectHoist(sqlIn: String): String = {
    if ("(?i)generate_series|unnest".r.findFirstIn(sqlIn).isEmpty) return sqlIn
    var sql = sqlIn
    var hoists = 0
    var changed = true
    while (changed && hoists < 8) {
      changed = false
      val masked = maskLiterals(sql)
      val depth = new Array[Int](masked.length + 1)
      var d = 0
      var i = 0
      while (i < masked.length) {
        depth(i) = d
        masked.charAt(i) match {
          case '(' => d += 1
          case ')' => d -= 1
          case _ =>
        }
        i += 1
      }
      depth(masked.length) = d
      def word(at: Int, w: String): Boolean =
        masked.regionMatches(true, at, w, 0, w.length) &&
          (at == 0 || (!Character.isLetterOrDigit(masked.charAt(at - 1)) &&
            masked.charAt(at - 1) != '_' && masked.charAt(at - 1) != '.')) &&
          (at + w.length >= masked.length ||
            (!Character.isLetterOrDigit(masked.charAt(at + w.length)) &&
              masked.charAt(at + w.length) != '_'))
      // select-position calls: nearest preceding depth-equal SELECT
      // with no intervening FROM
      val calls = "(?i)\\b(?:generate_series|unnest)\\s*\\(".r.findAllMatchIn(masked)
        .toSeq.filter { m =>
          val myd = depth(m.start)
          var k = m.start - 1
          var verdict = false
          var scanning = true
          while (k >= 0 && scanning) {
            if (depth(k) == myd) {
              if (word(k, "select")) { verdict = true; scanning = false }
              else if (word(k, "from") || word(k, "where") ||
                word(k, "group") || word(k, "order") || word(k, "having") ||
                word(k, "values") || word(k, "on")) scanning = false
            } else if (depth(k) < myd - 1) scanning = false
            k -= 1
          }
          verdict
        }
      if (calls.size >= 2 || (calls.size == 1 && {
        val open = masked.indexOf('(', calls.head.start)
        val close = matchingParen(masked, open)
        !masked.substring(close + 1).matches("(?is)^\\s*(,|;|\\)|" +
          "\\bfrom\\b|\\bas\\b|\\border\\b|\\bunion\\b|\\blimit\\b|" +
          "\\bwhere\\b|\\bgroup\\b|$).*")
      })) {
        // same enclosing depth required; identical calls hoist to ONE
        // shared lateral; DISTINCT calls zip to the LCM of their
        // result lengths with cycling (GP's pre-PG10 ExecTargetList
        // multi-SRF semantics — NOT a cross product)
        val texts = calls.map { m =>
          val open = masked.indexOf('(', m.start)
          val close = matchingParen(masked, open)
          (m.start, close + 1,
            sql.substring(m.start, close + 1).replaceAll("\\s+", " "))
        }
        val sameDepth = calls.map(m => depth(m.start)).distinct.size == 1
        var fromItems = Seq.empty[String]
        if (sameDepth && texts.map(_._3).distinct.size == 1) {
          hoists += 1
          val v = s"__gs_h$hoists"
          val callText = sql.substring(texts.head._1, texts.head._2)
          // replace right-to-left
          texts.sortBy(-_._1).foreach { case (s0, e0, _) =>
            sql = sql.substring(0, s0) + v + sql.substring(e0)
          }
          fromItems = Seq(s"LATERAL (SELECT $callText AS $v) AS __gs_t$hoists")
        } else if (sameDepth && calls.size >= 2) {
          hoists += 1
          val h = hoists
          val distinctCalls = texts.map(_._3).distinct
          def arrayExprOf(ct: String): String = {
            val inner = ct.substring(ct.indexOf('(') + 1, ct.length - 1)
            if (ct.toLowerCase.startsWith("unnest")) inner
            else seqExpr(topLevelSplit(inner, maskLiterals(inner)).map(_.trim))
          }
          val names = distinctCalls.zipWithIndex.map { case (ct, k) =>
            ct -> s"__gsz_${h}_$k" }.toMap
          texts.sortBy(-_._1).foreach { case (s0, e0, ct) =>
            val v = names(ct)
            sql = sql.substring(0, s0) +
              s"element_at($v, CAST((__gszi_$h - 1) % size($v) AS INT) + 1)" +
              sql.substring(e0)
          }
          val arrSelect = distinctCalls.map(ct =>
            s"${arrayExprOf(ct)} AS ${names(ct)}").mkString(", ")
          val sizes = distinctCalls.map(ct =>
            s"size(${names(ct)})").mkString(", ")
          fromItems = Seq(
            s"LATERAL (SELECT $arrSelect) AS __gszt_$h",
            s"LATERAL (SELECT explode(CASE WHEN pg_lcm(array($sizes)) < 1 " +
              s"THEN array() ELSE sequence(1, pg_lcm(array($sizes))) END) " +
              s"AS __gszi_$h) AS __gszit_$h")
        }
        if (fromItems.nonEmpty) {
          // insertion point: end of the FROM item list (or no FROM)
          val masked2 = maskLiterals(sql)
          val d2 = new Array[Int](masked2.length + 1)
          var dd = 0
          var j = 0
          while (j < masked2.length) {
            d2(j) = dd
            masked2.charAt(j) match {
              case '(' => dd += 1
              case ')' => dd -= 1
              case _ =>
            }
            j += 1
          }
          d2(masked2.length) = dd
          // texts.head._1 is the LEFTMOST call start; replacements ran
          // right-to-left so the prefix [0, texts.head._1) is unchanged
          // and the offset is valid in the rewritten string — read the
          // depth from d2 (the rewritten string's table), not `depth`
          val myd = d2(texts.head._1)
          def word2(at: Int, w: String): Boolean =
            masked2.regionMatches(true, at, w, 0, w.length) &&
              (at == 0 || (!Character.isLetterOrDigit(masked2.charAt(at - 1)) &&
                masked2.charAt(at - 1) != '_')) &&
              (at + w.length >= masked2.length ||
                (!Character.isLetterOrDigit(masked2.charAt(at + w.length)) &&
                  masked2.charAt(at + w.length) != '_'))
          var k = texts.head._1
          var fromAt = -1
          while (k < masked2.length && fromAt < 0 && d2(k) >= myd) {
            if (d2(k) == myd && word2(k, "from")) fromAt = k
            k += 1
          }
          val enders = Seq("where", "group", "having", "order", "limit",
            "union", "intersect", "except", "window", "fetch", "offset",
            "returning")
          var end = masked2.length
          var scan2 = true
          var p = if (fromAt >= 0) fromAt + 4 else texts.head._1
          // scan through p == masked2.length: d2(length) carries the
          // depth AFTER the last char, so a subselect whose closing
          // ')' is the statement's final character still registers
          // the drop and the hoisted item lands INSIDE it
          while (p <= masked2.length && scan2) {
            // d2(p) is the depth BEFORE char p: a drop below the
            // call's depth means char p-1 closed the enclosing
            // subselect — the hoisted item must land INSIDE it
            if (d2(p) < myd) { end = p - 1; scan2 = false }
            else if (p < masked2.length && d2(p) == myd &&
              (masked2.charAt(p) == ';' ||
                enders.exists(word2(p, _)))) { end = p; scan2 = false }
            else p += 1
          }
          sql =
            if (fromAt >= 0)
              sql.substring(0, end) + ", " + fromItems.mkString(", ") + " " +
                sql.substring(end)
            else {
              // the FIRST from-item cannot be LATERAL (nothing
              // precedes it to reference)
              val items = fromItems.head.stripPrefix("LATERAL ") +:
                fromItems.tail
              sql.substring(0, end) + " FROM " +
                items.mkString(", ") + " " + sql.substring(end)
            }
          changed = true
        }
      }
    }
    sql
  }

  /** sequence(...) with PG's empty-set direction guard for numeric
    * steps; interval steps (quoted or INTERVAL-typed) pass through. */
  private def intLit(x: String): Boolean =
    x.trim.matches("-?\\s*\\d{1,9}")

  private def seqExpr(args: Seq[String]): String = args match {
    // numeric endpoints cast to ONE integral type: Spark's sequence
    // demands identical start/stop/step types, while PG coerces (a
    // BIGINT bound from int8 division against an INT literal is fine
    // there); BIGINT covers every PG integral width
    case Seq(a, b) =>
      // int-literal bounds keep PG's int4 result type (generate_series
      // is overloaded; date - series_value needs INT in Spark)
      val ty = if (intLit(a) && intLit(b)) "INT" else "BIGINT"
      s"(CASE WHEN ($a) <= ($b) THEN sequence(CAST(($a) AS $ty), " +
        s"CAST(($b) AS $ty)) ELSE array() END)"
    case Seq(a, b, s) if s.matches("-?\\s*\\d+") =>
      val ty = if (intLit(a) && intLit(b) && intLit(s)) "INT" else "BIGINT"
      s"(CASE WHEN (($s) > 0 AND ($a) <= ($b)) OR (($s) < 0 AND ($a) >= ($b))" +
        s" THEN sequence(CAST(($a) AS $ty), CAST(($b) AS $ty), " +
        s"CAST(($s) AS $ty)) ELSE array() END)"
    case Seq(a, b, s) if "(?i)\\binterval\\b".r.findFirstIn(s).isDefined =>
      // timestamp series (generate_series_timestamp): string-literal
      // bounds need the explicit cast — Spark's sequence() does not
      // coerce STRING endpoints against an interval step
      def ts(x: String): String =
        if (x.trim.startsWith("'")) s"CAST($x AS TIMESTAMP)" else x
      s"sequence(${ts(a)}, ${ts(b)}, $s)"
    case Seq(a, b, s) => s"sequence($a, $b, $s)"
    case other => throw new IllegalArgumentException(
      s"generate_series takes 2 or 3 arguments, got ${other.length}")
  }

  /** Correlated scalar subqueries inside INNER JOIN ... ON conditions:
    * Spark's analyzer only supports them in Filter/Project/Aggregate,
    * so `a JOIN b ON (x = (SELECT ...))` fails analysis. For a FROM
    * clause of pure inner joins the ON conditions are
    * filter-equivalent — the join list flattens to comma items and
    * every ON condition moves into WHERE, where Catalyst both allows
    * the subquery and still re-derives the equi-join for the plain
    * conjuncts. Applied ONLY when an ON condition contains a
    * subquery (normal queries keep their explicit join tree). */
  private def joinOnSubqueryToFilter(sqlIn: String): String = {
    // the trailing semicolon would otherwise ride into the last ON
    // condition when it gets moved into WHERE
    val sql = sqlIn.trim.stripSuffix(";")
    val masked = maskLiterals(sql)
    if (!"(?i)\\bJOIN\\b".r.findFirstIn(masked).isDefined ||
        !"(?i)\\(\\s*SELECT\\b".r.findFirstIn(masked).isDefined) return sqlIn
    def wordAt(at: Int, w: String): Boolean =
      masked.regionMatches(true, at, w, 0, w.length) &&
        (at == 0 || !Character.isLetterOrDigit(masked.charAt(at - 1)) &&
          masked.charAt(at - 1) != '_') &&
        (at + w.length >= masked.length ||
          (!Character.isLetterOrDigit(masked.charAt(at + w.length)) &&
            masked.charAt(at + w.length) != '_'))
    // top-level FROM
    var depth = 0; var i = 0; var fromAt = -1
    while (i < masked.length && fromAt < 0) {
      masked.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => if (depth == 0 && wordAt(i, "from")) fromAt = i
      }
      i += 1
    }
    if (fromAt < 0) return sql
    // end of the FROM span = next depth-0 clause keyword
    val enders = Seq("where", "group", "order", "having", "limit",
      "window", "union", "intersect", "except", "offset", "fetch",
      "returning")
    depth = 0; i = fromAt + 4; var endAt = masked.length
    var scanning = true
    while (i < masked.length && scanning) {
      masked.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && enders.exists(wordAt(i, _))) {
            endAt = i; scanning = false
          }
      }
      i += 1
    }
    val span = masked.substring(fromAt + 4, endAt)
    // only pure inner joins are filter-equivalent
    if ("(?i)\\b(LEFT|RIGHT|FULL|NATURAL|OUTER|USING)\\b".r
        .findFirstIn(span).isDefined) return sql
    // collect depth-0 JOIN/ON positions inside the span
    case class Tok(kind: String, at: Int)
    val toks = Seq.newBuilder[Tok]
    depth = 0; i = 0
    while (i < span.length) {
      span.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 =>
          def w(s2: String) = wordAt(fromAt + 4 + i, s2)
          if (w("join")) toks += Tok("join", i)
          else if (w("on")) toks += Tok("on", i)
          else if (w("cross")) toks += Tok("cross", i)
          else if (w("inner")) toks += Tok("inner", i)
        case _ =>
      }
      i += 1
    }
    val ts = toks.result()
    if (!ts.exists(_.kind == "on")) return sql
    // segments: item boundaries at each join/cross/inner start; each
    // ON condition runs to the next join-ish token or span end
    val rawSpan = sql.substring(fromAt + 4, endAt)
    val items = Seq.newBuilder[String]
    val conds = Seq.newBuilder[String]
    var cursor = 0
    var idx = 0
    while (idx < ts.length) {
      val t0 = ts(idx)
      if (t0.kind == "join" || t0.kind == "cross" || t0.kind == "inner") {
        if (cursor < t0.at) {
          val piece = rawSpan.substring(cursor, t0.at).trim
          if (piece.nonEmpty) items += piece.stripSuffix(",").trim
        }
        // the joined item spans from after JOIN to the ON (or next tok)
        if (t0.kind == "join") {
          val next = ts.drop(idx + 1).headOption
          next match {
            case Some(Tok("on", onAt)) =>
              items += rawSpan.substring(t0.at + 4, onAt).trim
              // condition: to the next join-ish token after the ON —
              // or a depth-0 comma (a following comma-join item, e.g.
              // `, lateral (...)`, is NOT part of the condition)
              val afterTok = ts.drop(idx + 2)
                .find(t2 => t2.kind != "on").map(_.at)
                .getOrElse(rawSpan.length)
              val maskedSpan = masked.substring(fromAt + 4, endAt)
              var cj = onAt + 2; var dj = 0; var commaAt = -1
              while (cj < afterTok && commaAt < 0) {
                maskedSpan.charAt(cj) match {
                  case '(' => dj += 1
                  case ')' => dj -= 1
                  case ',' if dj == 0 => commaAt = cj
                  case _ =>
                }
                cj += 1
              }
              val after = if (commaAt >= 0) commaAt else afterTok
              conds += rawSpan.substring(onAt + 2, after).trim
              cursor = after
              idx += 2
            case _ =>
              // JOIN without ON at depth 0 → cross-ish; next boundary
              val after = next.map(_.at).getOrElse(rawSpan.length)
              items += rawSpan.substring(t0.at + 4, after).trim
              cursor = after
              idx += 1
          }
        } else { // cross/inner prefix: skip the keyword itself
          cursor = t0.at + t0.kind.length
          idx += 1
        }
      } else idx += 1
    }
    if (cursor < rawSpan.length) {
      val piece = rawSpan.substring(cursor).trim
      if (piece.nonEmpty) items += piece.stripSuffix(",").trim
    }
    val cs = conds.result()
    if (!cs.exists(c => "(?i)\\(\\s*SELECT\\b".r.findFirstIn(
      maskLiterals(c)).isDefined)) return sql
    val itemSql = items.result().filter(_.nonEmpty)
      .map(_.stripPrefix(",").trim).mkString(", ")
    val rest = sql.substring(endAt)
    val mRest = masked.substring(endAt)
    val condSql = cs.map(c => s"($c)").mkString(" AND ")
    val newRest =
      if (mRest.matches("(?is)^\\s*WHERE\\b.*")) {
        val wIdx = mRest.toLowerCase.indexOf("where")
        // splice into the existing WHERE: its predicate runs to the
        // next depth-0 clause keyword
        var d4 = 0; var k = wIdx + 5; var wEnd = mRest.length
        var on2 = true
        while (k < mRest.length && on2) {
          mRest.charAt(k) match {
            case '(' => d4 += 1
            case ')' => d4 -= 1
            case _ => if (d4 == 0 && enders.exists(e =>
              mRest.regionMatches(true, k, e, 0, e.length) &&
                !Character.isLetterOrDigit(mRest.charAt(k - 1)) &&
                (k + e.length >= mRest.length ||
                  !Character.isLetterOrDigit(mRest.charAt(k + e.length))))) {
              wEnd = k; on2 = false
            }
          }
          k += 1
        }
        " WHERE " + condSql + " AND (" +
          rest.substring(wIdx + 5, wEnd).trim + ") " + rest.substring(wEnd)
      } else " WHERE " + condSql + rest
    sql.substring(0, fromAt) + "FROM " + itemSql + newRest
  }

  /** PG to_date/to_timestamp format templates (formatting.c DCH
    * keywords: YYYY/DD/HH24/MI/SS/Mon) → Spark's DateTimeFormatter
    * letters, when the 2nd argument is a plain literal containing a PG
    * token. Spark-style formats pass through untouched. */
  /** Slash datestyle in TYPED date/timestamp literals
    * (`timestamp '2016/11/11'` — datetime.c DecodeDate accepts
    * y/m/d): normalize to the dash form Spark's literal parser
    * takes. Only typed literals rewrite — a plain string is not
    * provably a date. */
  /** PG `DD-MON-YY[YY]` date input (datetime.c: a month NAME
    * disambiguates regardless of DateStyle; 2-digit years map <70 →
    * 20YY else 19YY): normalized to ISO in typed literals, `::`
    * casts, and INSERT ... VALUES rows (implicit coercion to a
    * date/timestamp column — Spark's cast rejects the form). */
  private val monNames = Map(
    "JAN" -> "01", "FEB" -> "02", "MAR" -> "03", "APR" -> "04",
    "MAY" -> "05", "JUN" -> "06", "JUL" -> "07", "AUG" -> "08",
    "SEP" -> "09", "OCT" -> "10", "NOV" -> "11", "DEC" -> "12")

  private def monDateLiterals(sqlIn: String): String = {
    val litRe = ("(?i)'(\\d{1,2})-(JAN|FEB|MAR|APR|MAY|JUN|JUL|AUG|SEP|" +
      "OCT|NOV|DEC)-(\\d{2}|\\d{4})( [^']*)?'").r
    if (litRe.findFirstIn(sqlIn).isEmpty) return sqlIn
    def iso(m: scala.util.matching.Regex.Match): String = {
      val y0 = m.group(3)
      val y = if (y0.length == 4) y0
        else if (y0.toInt < 70) s"20$y0" else s"19$y0"
      val d = if (m.group(1).length == 1) "0" + m.group(1) else m.group(1)
      s"'$y-${monNames(m.group(2).toUpperCase)}-$d${Option(m.group(4)).getOrElse("")}'"
    }
    var out = sqlIn
    // typed-literal and ::-cast spellings, any statement
    out = ("(?i)\\b(date|timestamptz|timestamp)(\\s*)" + litRe.regex).r
      .replaceAllIn(out, m => java.util.regex.Matcher.quoteReplacement(
        m.group(1) + m.group(2) + iso(litRe.findFirstMatchIn(
          m.matched.substring(m.group(1).length + m.group(2).length)).get)))
    out = (litRe.regex + "(\\s*::\\s*)(?i)(date|timestamptz|timestamp)\\b").r
      .replaceAllIn(out, m => java.util.regex.Matcher.quoteReplacement(
        iso(litRe.findFirstMatchIn(m.matched).get) +
          m.group(5) + m.group(6)))
    // INSERT rows: every full-literal match coerces by column type
    if ("(?is)^\\s*INSERT\\b".r.findFirstIn(out).isDefined)
      out = litRe.replaceAllIn(out,
        m => java.util.regex.Matcher.quoteReplacement(iso(m)))
    out
  }

  private def slashDateLiterals(sqlIn: String): String = {
    val typed = ("(?i)\\b(date|timestamptz|timestamp)(\\s*)'(\\d{4})/(\\d{1,2})/" +
      "(\\d{1,2})([^']*)'").r.replaceAllIn(sqlIn, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"${m.group(1)}${m.group(2)}'${m.group(3)}-${m.group(4)}-" +
          s"${m.group(5)}${m.group(6)}'"))
    // the ::-cast spelling of the same slash datestyle input
    ("'(\\d{4})/(\\d{1,2})/(\\d{1,2})([^']*)'(\\s*::\\s*)" +
      "(?i)(date|timestamptz|timestamp)\\b").r.replaceAllIn(typed, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"'${m.group(1)}-${m.group(2)}-${m.group(3)}${m.group(4)}'" +
          s"${m.group(5)}${m.group(6)}"))
  }

  /** PG compact datetime input (datetime.c DecodeDateTime accepts
    * `20110521`, `20081225130000` and `20081225 130000`) in TYPED
    * literals and `::`-casts — normalized to the dashed forms Spark's
    * parser takes. Only provably-datetime contexts rewrite. */
  private def compactDateLiterals(sqlIn: String): String = {
    if ("(?i)(::\\s*(timestamp|date)|\\b(timestamp|date)\\s*'|AS\\s+(timestamp|date)\\b)".r
        .findFirstIn(sqlIn).isEmpty) return sqlIn
    def norm(v: String): String = {
      val digits = v.replace(" ", "")
      if (digits.length == 8)
        s"${digits.substring(0, 4)}-${digits.substring(4, 6)}-${digits.substring(6)}"
      else
        s"${digits.substring(0, 4)}-${digits.substring(4, 6)}-${digits.substring(6, 8)} " +
          s"${digits.substring(8, 10)}:${digits.substring(10, 12)}:${digits.substring(12)}"
    }
    val lit = "(\\d{8}(?: ?\\d{6})?)"
    var out = ("(?i)\\b(date|timestamptz|timestamp)(\\s*)'" + lit + "'").r
      .replaceAllIn(sqlIn, m => java.util.regex.Matcher.quoteReplacement(
        s"${m.group(1)}${m.group(2)}'${norm(m.group(3))}'"))
    // optional closing paren between literal and cast — an inlined
    // function argument arrives parenthesized: ('20080102')::date
    out = ("'" + lit + "'(\\s*\\)?\\s*::\\s*)(timestamptz|timestamp|date)\\b").r
      .replaceAllIn(out, m => java.util.regex.Matcher.quoteReplacement(
        s"'${norm(m.group(1))}'${m.group(2)}${m.group(3)}"))
    // the CAST(...) spelling (an inlined plpgsql RETURN coercion
    // compiles to CAST('20080101' AS DATE)); optional inner parens
    out = ("(?i)\\bCAST\\s*\\(\\s*(\\(?)\\s*'" + lit +
      "'\\s*(\\)?)\\s*AS\\s+(timestamptz|timestamp|date)\\b").r
      .replaceAllIn(out, m => java.util.regex.Matcher.quoteReplacement(
        s"CAST(${m.group(1)}'${norm(m.group(2))}'${m.group(3)} " +
          s"AS ${m.group(4)}"))
    out
  }

  private def pgDateTemplates(sqlIn: String): String = {
    if ("(?i)to_(date|timestamp)".r.findFirstIn(sqlIn).isEmpty) return sqlIn
    val ms = "(?i)\\bto_(date|timestamp)\\s*\\(".r
      .findAllMatchIn(maskLiterals(sqlIn)).toSeq.reverse
    var sql = sqlIn
    ms.foreach { m =>
      val masked = maskLiterals(sql)
      val open = masked.indexOf('(', m.start)
      val close = matchingParen(masked, open)
      val args = topLevelSplit(sql.substring(open + 1, close),
        masked.substring(open + 1, close))
      if (args.length == 2 && args(1).trim.matches("'[^']*'")) {
        val fmt = args(1).trim.stripPrefix("'").stripSuffix("'")
        if ("YYYY|\\bDD\\b|HH24|HH12|\\bMI\\b|\\bSS\\b|\\bMon\\b".r
          .findFirstIn(fmt).isDefined) {
          // route to the native DCH parser (functions.DchParseFmt) —
          // it carries PG's whole template surface: leading-blank
          // skipping, greedy year before a separator ('YYYY-MMDD' on
          // '20000-1130' → year 20000), absent trailing fields as 0
          sql = sql.substring(0, m.start) +
            s"to_${m.group(1).toLowerCase}_pg(${args(0)}, ${args(1).trim})" +
            sql.substring(close + 1)
        }
      }
    }
    sql
  }

  /** PG interval literals glue quantity and unit (`'5year'`,
    * `'1h30min'` — datetime.c DecodeInterval tokenizes on type
    * change); Spark's parser requires the space. Inserted inside
    * INTERVAL-prefixed literals only. */
  private def intervalSpacing(sql0: String): String = {
    // `interval '1 day' day` (gram.y opt_interval — a PRECISION
    // restriction, not a second value): the trailing unit drops when
    // the quoted text already spells its units, which Spark's
    // units-list form would reject
    val sql = ("(?is)\\b(interval\\s*'[^']*[A-Za-z][^']*')\\s+" +
      "(?:year|month|day|hour|minute|second)s?\\b(?!\\s+to\\b)").r
      .replaceAllIn(sql0, m =>
        java.util.regex.Matcher.quoteReplacement(m.group(1)))
    "(?is)\\binterval\\s*'([^']*)'".r.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        "interval '" + m.group(1).replaceAll(
          "(?<=\\d)(?=[A-Za-z])|(?<=[A-Za-z])(?=[-+]?\\d)", " ")
          // PG unit abbreviations (datetime.c deltas[]) Spark lacks
          .replaceAll("(?i)\\bmins?\\b", "minute")
          .replaceAll("(?i)\\bsecs?\\b", "second")
          .replaceAll("(?i)\\bhrs?\\b", "hour")
          .replaceAll("(?i)\\bmons?\\b", "month")
          .replaceAll("(?i)\\byrs?\\b", "year") + "'"))
  }

  /** Spark requires ORDER BY for ranking window functions; PG runs
    * them over arbitrary order when none is given (nodeWindowAgg.c —
    * the ordering is simply unspecified). A constant key expresses
    * exactly that: every row is a peer, the order is arbitrary, and
    * (unlike top-level sorts) window keys never resolve ordinals, so
    * `ORDER BY 1` is the constant. Only OVER clauses attached to a
    * ranking/offset function get the injection — aggregates are legal
    * unordered and adding a key would cost a needless sort. */
  private val needsOrder = Set("row_number", "rank", "dense_rank",
    "percent_rank", "cume_dist", "ntile", "lag", "lead")

  private def windowOrder(sql: String): String = {
    val masked = maskLiterals(sql)
    val out = new StringBuilder
    var i = 0
    var last = 0
    val overRe = "(?i)\\bover\\s*\\(".r
    overRe.findAllMatchIn(masked).foreach { m =>
      val open = m.end - 1
      val close = try matchingParen(masked, open) catch { case _: Exception => -1 }
      if (close > open) {
        val content = masked.substring(open + 1, close)
        val hasOrder = "(?i)\\border\\s+by\\b".r.findFirstIn(content).isDefined ||
          // a named-window reference `OVER (w ...)` inherits the base
          // window's ordering — never inject into it
          "(?i)^\\s*(?!partition\\b|order\\b|rows\\b|range\\b|groups\\b)[a-z_][\\w]*".r
            .findFirstIn(content).isDefined
        // function name: identifier before the () call preceding OVER
        var p = m.start - 1
        while (p >= 0 && masked.charAt(p).isWhitespace) p -= 1
        val fn = if (p >= 0 && masked.charAt(p) == ')') {
          var d = 0; var k = p; var op2 = -1
          while (k >= 0 && op2 < 0) {
            masked.charAt(k) match {
              case ')' => d += 1
              case '(' => d -= 1; if (d == 0) op2 = k
              case _ =>
            }
            k -= 1
          }
          if (op2 > 0) {
            var s2 = op2 - 1
            while (s2 >= 0 && (masked.charAt(s2).isLetterOrDigit ||
              masked.charAt(s2) == '_')) s2 -= 1
            masked.substring(s2 + 1, op2).toLowerCase
          } else ""
        } else ""
        if (!hasOrder && needsOrder.contains(fn) && last <= close) {
          out ++= sql.substring(last, close) ++= " ORDER BY 1"
          last = close
        }
      }
      i = m.end
    }
    out ++= sql.substring(last)
    out.toString
  }

  /** Split into alternating non-literal / literal parts and rewrite
    * only the non-literal ones — literals stay byte-identical, with one
    * documented exception: a `~*`/`!~*` whose pattern is the literal
    * that immediately follows becomes ` RLIKE ` with `(?i)` folded into
    * that pattern (PG's case-insensitive regex op has no Spark
    * spelling). A `~*` with a non-literal pattern fails loudly rather
    * than silently matching case-sensitively. */
  // `RANGE/ROWS/GROUPS ... -3 PRECEDING` — PG raises "frame starting
  // offset must not be negative" (GPDB: "RANGE parameter cannot be
  // negative"); Spark silently accepts the negative literal and flips
  // the frame direction, returning WRONG rows, so the engine rejects it
  // before Spark sees the text (checked on non-literal segments only).
  private val negFrameRe =
    "(?is)\\b(RANGE|ROWS|GROUPS)\\b[^()']{0,160}?-\\s*\\d+(?:\\.\\d+)?\\s+(PRECEDING|FOLLOWING)".r

  /** Literal-masked copy (quotes kept, contents replaced; `--` and
    * nested `/* */` comment bodies masked too) so regex / paren scans
    * can't be fooled by text inside strings or comments. */
  private[graft] def maskLiterals(sql: String): String = {
    val a = sql.toCharArray
    var i = 0
    while (i < a.length) {
      if (a(i) == '\'') {
        i += 1
        var done = false
        while (i < a.length && !done) {
          if (a(i) == '\'') {
            if (i + 1 < a.length && a(i + 1) == '\'') { a(i) = 'x'; a(i + 1) = 'x'; i += 1 }
            else done = true
          } else a(i) = 'x'
          i += 1
        }
      } else if (a(i) == '-' && i + 1 < a.length && a(i + 1) == '-') {
        while (i < a.length && a(i) != '\n') { a(i) = ' '; i += 1 }
      } else if (a(i) == '/' && i + 1 < a.length && a(i + 1) == '*') {
        var depth = 0
        while (i < a.length && (depth > 0 || (i + 1 < a.length &&
          a(i) == '/' && a(i + 1) == '*'))) {
          if (a(i) == '/' && i + 1 < a.length && a(i + 1) == '*') {
            depth += 1; a(i) = ' '; a(i + 1) = ' '; i += 2
          } else if (a(i) == '*' && i + 1 < a.length && a(i + 1) == '/') {
            depth -= 1; a(i) = ' '; a(i + 1) = ' '; i += 2
          } else { a(i) = ' '; i += 1 }
        }
      } else i += 1
    }
    new String(a)
  }

  /** replaceAll that matches on the literal-masked copy and splices
    * the replacements back into the ORIGINAL text, so an alias/column
    * token occurring inside a string literal or comment is never
    * rewritten (maskLiterals is length-preserving, so match offsets
    * line up; group refs `$n` in `repl` expand per Matcher rules —
    * safe because a match outside literals reads identical text in
    * both copies). */
  private[graft] def replaceAllOutsideLiterals(
      text: String, regex: String, repl: String): String = {
    val masked = maskLiterals(text)
    val m = java.util.regex.Pattern.compile(regex).matcher(masked)
    // java.lang.StringBuilder: the scala one lacks the 3-arg
    // append(CharSequence, start, end) and would auto-tuple
    val sb = new java.lang.StringBuilder
    var prevEnd = 0
    while (m.find()) {
      sb.append(text, prevEnd, m.start)
      val tmp = new StringBuffer
      m.appendReplacement(tmp, repl)
      sb.append(tmp.substring(m.start - prevEnd))
      prevEnd = m.end
    }
    sb.append(text.substring(prevEnd))
    sb.toString
  }

  /** User-defined operators (CREATE OPERATOR, pg_operator.h): operator
    * spelling → the implementing function's name. Overloads across
    * argument widths share the spelling — one representative function
    * serves them (the regress operators are abs()-comparisons whose
    * semantics are width-independent). */
  private val customOps =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def registerOperator(ddl: String): Unit = {
    val m = ("(?is)^\\s*CREATE\\s+OPERATOR\\s+([^\\s(]+)\\s*\\(" +
      "[\\s\\S]*?(?:procedure|function)\\s*=\\s*([\\w.\"]+)").r
      .findFirstMatchIn(ddl).getOrElse(throw new IllegalArgumentException(
        s"cannot parse CREATE OPERATOR: $ddl"))
    customOps.put(m.group(1), m.group(2).replace("\"", "").toLowerCase)
    ()
  }

  def dropOperator(ddl: String): Unit = {
    "(?is)^\\s*DROP\\s+OPERATOR\\s+(?:IF\\s+EXISTS\\s+)?([^\\s(]+)".r
      .findFirstMatchIn(ddl).foreach(m => customOps.remove(m.group(1)))
    ()
  }

  /** Custom-operator expansion over a whole statement — called BEFORE
    * SqlFunctions.expand so the operator's implementing function (a
    * registered macro) still inlines at the call site. */
  def expandCustomOperators(sql: String): String = {
    if (customOps.isEmpty) return sql
    val out = new java.lang.StringBuilder(sql.length + 16)
    var i = 0
    var segStart = 0
    while (i < sql.length) {
      if (sql.charAt(i) == '\'') {
        out.append(customOpRewrites(sql.substring(segStart, i)))
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
        out.append(sql, litStart, i)
        segStart = i
      } else i += 1
    }
    out.append(customOpRewrites(sql.substring(segStart)))
    out.toString
  }

  /** Rewrite registered custom-operator uses in a literal-free
    * segment, longest spelling first (`|>=|` before `|>|`). */
  private def customOpRewrites(seg: String): String = {
    if (customOps.isEmpty) return seg
    import scala.jdk.CollectionConverters._
    customOps.asScala.toSeq.sortBy(-_._1.length)
      .foldLeft(seg) { case (s, (op, fn)) =>
        binaryOpBalanced(s, op, fn)
      }
  }

  /** `a && b` (array overlap) with paren-balanced operand extraction —
    * the regex fast path handles simple tokens; this takes the rest
    * (nested calls, subscripted arrays). Operates on literal-free
    * segment text. */
  private def overlapBalanced(seg: String): String =
    binaryOpBalanced(seg, "&&", "arrays_overlap")

  /** Rewrite infix `a <op> b` to `fn(a, b)` with paren-balanced
    * operand extraction. Operates on literal-free segment text. */
  private def binaryOpBalanced(seg: String, op: String,
                               fn: String): String = {
    var sql = seg
    var guard = 0
    while (sql.contains(op) && guard < 64) {
      guard += 1
      val p = sql.indexOf(op)
      // left operand: walk back over one balanced ()/[] group plus a
      // leading callee name, or a plain token
      var le = p - 1
      while (le >= 0 && sql.charAt(le).isWhitespace) le -= 1
      if (le < 0) return sql
      val lEnd = le + 1
      var ls = {
        val c = sql.charAt(le)
        if (c == ')' || c == ']') {
          val (op, cl) = if (c == ')') ('(', ')') else ('[', ']')
          var depth = 0; var k = le; var stop = -1
          while (k >= 0 && stop < 0) {
            val ch = sql.charAt(k)
            if (ch == cl) depth += 1
            else if (ch == op) { depth -= 1; if (depth == 0) stop = k }
            k -= 1
          }
          if (stop < 0) return sql
          var t = stop - 1
          while (t >= 0 && (sql.charAt(t).isLetterOrDigit ||
            sql.charAt(t) == '_' || sql.charAt(t) == '.' ||
            sql.charAt(t) == '$')) t -= 1
          t + 1
        } else {
          var k = le
          while (k >= 0 && (sql.charAt(k).isLetterOrDigit ||
            sql.charAt(k) == '_' || sql.charAt(k) == '.' ||
            sql.charAt(k) == '$')) k -= 1
          k + 1
        }
      }
      // right operand: token, optionally followed by a balanced group
      var rs = p + op.length
      while (rs < sql.length && sql.charAt(rs).isWhitespace) rs += 1
      if (rs >= sql.length) return sql
      var re0 = rs
      while (re0 < sql.length && (sql.charAt(re0).isLetterOrDigit ||
        sql.charAt(re0) == '_' || sql.charAt(re0) == '.' ||
        sql.charAt(re0) == '$')) re0 += 1
      if (re0 < sql.length &&
          (sql.charAt(re0) == '(' || sql.charAt(re0) == '[')) {
        val (op, cl) =
          if (sql.charAt(re0) == '(') ('(', ')') else ('[', ']')
        var depth = 0; var k = re0; var stop = -1
        while (k < sql.length && stop < 0) {
          val ch = sql.charAt(k)
          if (ch == op) depth += 1
          else if (ch == cl) { depth -= 1; if (depth == 0) stop = k }
          k += 1
        }
        if (stop < 0) return sql
        re0 = stop + 1
      }
      if (ls >= lEnd || rs >= re0) return sql
      sql = sql.substring(0, ls) +
        s"$fn(${sql.substring(ls, lEnd)}, ${sql.substring(rs, re0)})" +
        sql.substring(re0)
    }
    sql
  }

  private[graft] def matchingParen(masked: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < masked.length) {
      masked.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException("unbalanced parentheses in quantified comparison")
  }

  // lhs restricted to identifier chains / numbers — a parenthesized or
  // function-call lhs is out of this lexical assist's scope and fails
  // loudly in Spark's parser, per this file's contract
  // word-operator alternatives need a separator lookbehind so a
  // trailing identifier char can't backtrack into them (xLIKE is a
  // name, not x LIKE)
  // LHS shapes: a call (one paren level), a dotted identifier, or a
  // literal — each optionally cast — chained by arithmetic operators
  // (PG: + - * / % bind tighter than comparison); or a parenthesized
  // ROW constructor ((A.i, A.j) = ALL (...), gram.y row syntax)
  private val quantKw =
    "(?:where|and|or|on|when|then|else|having|select|from|not|in|is|" +
      "case|group|order|by|join|union|exists|between|all|any|some|" +
      "values|intersect|except|end)"
  private val quantAtom =
    s"(?:(?!$quantKw\\s*\\()[\\w$$]+(?:\\.[\\w$$]+)*\\s*\\([^()]*\\)|" +
      s"(?!$quantKw\\b)[\\w$$]+(?:\\.[\\w$$]+)*|" +
      "'[^']*')(?:\\s*::\\s*\\w+)?"
  private val quantRe =
    (s"(?is)(?<![\\w$$.])($quantAtom(?:\\s*[-+*/%]\\s*$quantAtom)*|" +
      "\\((?:[^()]|\\([^()]*\\))*\\))\\s*" +
      "(=|<>|!=|<=|>=|<|>|(?<=[\\s)'])(?:NOT\\s+)?I?LIKE\\b)\\s*" +
      "(ANY|SOME|ALL)\\s*\\(").r

  /** Wrap a subquery's top-level select list into one struct column
    * (row-valued sublink: PG compares the whole row). */
  private def structifySelect(inner: String): String = {
    val m = maskLiterals(inner)
    val selM = "(?is)^\\s*select\\s+".r.findFirstMatchIn(m)
      .getOrElse(return inner)
    var d = 0
    var i = selM.end
    var fromAt = -1
    while (i < m.length && fromAt < 0) {
      m.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1
        case c if d == 0 && (c == 'f' || c == 'F') &&
            m.regionMatches(true, i, "from", 0, 4) &&
            (i + 4 >= m.length || !Character.isLetterOrDigit(m.charAt(i + 4))) &&
            !Character.isLetterOrDigit(m.charAt(i - 1)) &&
            m.charAt(i - 1) != '_' =>
          fromAt = i
        case _ =>
      }
      i += 1
    }
    val items = if (fromAt < 0) inner.substring(selM.end).trim
      else inner.substring(selM.end, fromAt).trim
    val tailTxt = if (fromAt < 0) "" else " " + inner.substring(fromAt)
    inner.substring(0, selM.end) + s"struct($items)" + tailTxt
  }

  /** PG quantified comparisons `lhs op ANY|SOME|ALL (rhs)` (gram.y
    * a_expr sub_type; parse_expr.c ANY_SUBLINK/ALL_SUBLINK). Spark has
    * only IN/EXISTS, so:
    *  - `= ANY (subquery)` → IN, `<> ALL (subquery)` → NOT IN (the
    *    null-aware native forms);
    *  - other subquery ops → a null-correct CASE over scalar
    *    aggregates of the subquery: empty set decides (FALSE for ANY,
    *    TRUE for ALL), a NULL lhs is NULL, a definite witness decides
    *    (`x < max` proves `< ANY`; `x ≥ min` refutes `< ALL`), and
    *    remaining NULL elements make the result NULL — the three-
    *    valued quantifier semantics;
    *  - array rhs (not starting with SELECT/WITH/VALUES/TABLE) →
    *    `exists()` / `forall()` higher-order functions, whose lambda
    *    comparison already carries three-valued logic. */
  // cheap pre-gate: quantRe's lhs alternation walks parenthesized blobs
  // with per-char regex recursion — on a statement with a huge paren
  // body (e.g. an expanded GROUPING SETS list) that overflows the
  // default thread stack. No ANY/SOME/ALL( ⇒ nothing to rewrite.
  private val quantGate = "(?is)\\b(any|some|all)\\s*\\(".r

  private def quantified(sql: String): String = {
    if (quantGate.findFirstIn(sql).isEmpty) return sql
    val masked = maskLiterals(sql)
    quantRe.findFirstMatchIn(masked) match {
      case None => sql
      case Some(m) =>
        val lhs = sql.substring(m.start(1), m.end(1))
        // UNION ALL ( / keyword collisions can't match: an operator is
        // required between lhs and the quantifier
        val op0 = m.group(2)
        val quant = m.group(3).toUpperCase
        val open = m.end - 1
        val close = matchingParen(masked, open)
        val inner = quantified(sql.substring(open + 1, close))
        val head = sql.substring(0, m.start)
        val tail = quantified(sql.substring(close + 1))
        head + buildQuantified(lhs, op0, quant, inner) + tail
    }
  }

  private def buildQuantified(lhs0: String, op0: String, quant: String,
                              inner0: String): String = {
    val op = op0.toUpperCase.replaceAll("\\s+", " ") match {
      case "!=" => "<>"
      case o => o
    }
    // ROW-valued quantifier ((A.i, A.j) = ALL (select x, y ...)):
    // both sides become one struct (rowtypes record_eq compares
    // field-by-field; struct comparison does the same)
    val isTuple = lhs0.trim.startsWith("(") && {
      val t = lhs0.trim
      val mt = maskLiterals(t)
      matchingParen(mt, 0) == t.length - 1 && {
        var d = 0
        var comma = false
        mt.substring(1, t.length - 1).foreach {
          case '(' => d += 1
          case ')' => d -= 1
          case ',' if d == 0 => comma = true
          case _ =>
        }
        comma
      }
    }
    val lhs = if (isTuple)
      s"struct${lhs0.trim}" else lhs0
    val inner = if (isTuple) structifySelect(inner0) else inner0
    // `= ANY (ARRAY(subquery))` collapses to the subquery itself
    // (parse_expr.c treats ARRAY_SUBLINK + ANY as the sublink) — vital
    // here because the HOF path can't host a subquery inside a lambda
    val arrSub = "(?is)^\\s*ARRAY\\s*\\(\\s*((?:SELECT|WITH)\\b.*)\\)\\s*$".r
      .findFirstMatchIn(inner).map(_.group(1))
    val innerEff = arrSub.getOrElse(inner)
    val isSub = innerEff.trim.toUpperCase
      .matches("(?s)^(SELECT|WITH|TABLE|VALUES)\\b.*")
    val any = quant != "ALL"
    if (!isSub) {
      // PG '{...}' array literals (arrayfuncs.c array_in) become an
      // array() constructor; other expressions pass through as-is
      val arrLit = "(?s)^\\s*'\\{(.*)\\}'\\s*(?:::\\s*\\w+(?:\\[\\])?)?\\s*$".r
      val rhs = inner match {
        case arrLit(body) =>
          val elems = arrayElems(body).map { case (e, q) => arrayElemLit(e, q) }
          s"array(${elems.mkString(", ")})"
        case other => s"($other)"
      }
      val lam = s"__v -> ($lhs) $op __v"
      if (any) s"exists($rhs, $lam)" else s"forall($rhs, $lam)"
    } else if (any && op == "=")
      // tuple LHS uses Spark's NATIVE multi-column IN — a struct LHS
      // would be unpacked against the subquery's column count
      s"((${if (isTuple) lhs0.trim else lhs}) IN " +
        s"(${if (isTuple) inner0 else innerEff}))"
    else if (!any && op == "<>")
      s"((${if (isTuple) lhs0.trim else lhs}) NOT IN " +
        s"(${if (isTuple) inner0 else innerEff}))"
    else {
      // Two EXISTS legs carrying the three-valued quantifier: a
      // decisive witness (some v satisfying the comparison proves ANY;
      // some v refuting it disproves ALL) beats NULLs, then a
      // nullability leg (a NULL element, or a NULL lhs beside a
      // nonempty set) yields NULL, else the vacuous answer. Outer
      // references sit in the subquery WHERE clauses (the one place
      // Spark allows them), so a correlated quantifier decorrelates
      // into two semi joins — no aggregation legs, no per-aggregate
      // scan fan-out.
      val negated = Map("<" -> ">=", "<=" -> ">", ">" -> "<=",
        ">=" -> "<", "=" -> "<>", "<>" -> "=",
        "LIKE" -> "NOT LIKE", "NOT LIKE" -> "LIKE",
        "ILIKE" -> "NOT ILIKE", "NOT ILIKE" -> "ILIKE")
      val cmp = if (any) op else negated(op)
      val decisive =
        s"EXISTS (SELECT 1 FROM ($innerEff) __q(__v) WHERE ($lhs) $cmp __v)"
      val nullish =
        s"EXISTS (SELECT 1 FROM ($innerEff) __q(__v) " +
          s"WHERE __v IS NULL OR ($lhs) IS NULL)"
      val (decided, vacuous) = if (any) ("TRUE", "FALSE") else ("FALSE", "TRUE")
      s"(CASE WHEN $decisive THEN $decided " +
        s"WHEN $nullish THEN CAST(NULL AS BOOLEAN) ELSE $vacuous END)"
    }
  }

  /** Split a paren-group body on top-level commas (masked scan). */
  private def topLevelSplit(body: String, maskedBody: String): Seq[String] = {
    val parts = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < maskedBody.length) {
      maskedBody.charAt(i) match {
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 =>
          parts += body.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    parts += body.substring(start)
    parts.result().map(_.trim)
  }

  /** PG's joined_table grammar is right-recursive (gram.y): an ON may
    * be DEFERRED past nested joins — `a left join b join c on bc on
    * ab` groups as `a left join (b join c on bc) on ab`. Spark's
    * parser demands each ON directly after its join, so deferred
    * shapes rewrite into the explicit parenthesized tree. Applied to
    * every FROM span at any depth; items without deferral pass
    * through verbatim. */
  private def nestedJoinOns(sqlIn: String): String = {
    val masked = maskLiterals(sqlIn)
    val fromRe = "(?i)\\bfrom\\b".r
    val enders = Seq("where", "group", "order", "having", "limit",
      "window", "union", "intersect", "except", "offset", "fetch",
      "returning", "on", "when")
    // process the LAST from first so earlier offsets stay valid
    val froms = fromRe.findAllMatchIn(masked).map(_.start).toSeq.reverse
    var sql = sqlIn
    var msk = masked
    froms.foreach { f =>
      // span: from after FROM to the first same-depth ender keyword /
      // depth-underflow / end
      var i = f + 4
      var d = 0
      var end = msk.length
      var scanning = true
      def wordAt(m: String, at: Int, w: String): Boolean =
        m.regionMatches(true, at, w, 0, w.length) &&
          (at == 0 || (!Character.isLetterOrDigit(m.charAt(at - 1)) &&
            m.charAt(at - 1) != '_')) &&
          (at + w.length >= m.length ||
            (!Character.isLetterOrDigit(m.charAt(at + w.length)) &&
              m.charAt(at + w.length) != '_'))
      while (i < msk.length && scanning) {
        msk.charAt(i) match {
          case '(' => d += 1
          case ')' =>
            d -= 1
            if (d < 0) { end = i; scanning = false }
          case ';' if d == 0 => end = i; scanning = false
          case _ =>
            if (d == 0 && enders.exists(wordAt(msk, i, _)) &&
              // ON belongs to the join tree itself, never ends a span;
              // it is in the list only for the WHEN of MERGE routing
              !wordAt(msk, i, "on")) { end = i; scanning = false }
        }
        i += 1
      }
      val span = sql.substring(f + 4, end)
      val mspan = msk.substring(f + 4, end)
      val rewritten = nestedJoinItem(span, mspan)
      if (rewritten != span) {
        sql = sql.substring(0, f + 4) + " " + rewritten + " " +
          sql.substring(end)
        msk = maskLiterals(sql)
      }
    }
    sql
  }

  /** One FROM span: parse the join/ON token stream per comma item and
    * re-emit parenthesized trees for any item whose ONs were deferred. */
  private def nestedJoinItem(span: String, mspan: String): String = {
    def wordAt(at: Int, w: String): Boolean =
      mspan.regionMatches(true, at, w, 0, w.length) &&
        (at == 0 || (!Character.isLetterOrDigit(mspan.charAt(at - 1)) &&
          mspan.charAt(at - 1) != '_')) &&
        (at + w.length >= mspan.length ||
          (!Character.isLetterOrDigit(mspan.charAt(at + w.length)) &&
            mspan.charAt(at + w.length) != '_'))
    val opRe = ("(?i)\\b(?:natural\\s+)?(?:(?:left|right|full)" +
      "(?:\\s+outer)?\\s+|inner\\s+|cross\\s+)?join\\b").r
    val toks = Seq.newBuilder[JTok]
    var d = 0
    var i = 0
    while (i < mspan.length) {
      mspan.charAt(i) match {
        case '(' => d += 1; i += 1
        case ')' => d -= 1; i += 1
        case ',' if d == 0 => toks += JTok(",", i, i + 1); i += 1
        case _ if d == 0 =>
          val m = opRe.findPrefixMatchOf(mspan.subSequence(i, mspan.length))
          if (m.isDefined && wordAt(i, mspan.substring(i, i + m.get.end)
            .split("\\s+")(0))) {
            toks += JTok("op", i, i + m.get.end); i += m.get.end
          } else if (wordAt(i, "on")) {
            toks += JTok("on", i, i + 2); i += 2
          } else if (wordAt(i, "using") && {
            var j = i + 5
            while (j < mspan.length && mspan.charAt(j).isWhitespace) j += 1
            j < mspan.length && mspan.charAt(j) == '('
          }) {
            var j = i + 5
            while (mspan.charAt(j) != '(') j += 1
            val close = matchingParen(mspan, j)
            toks += JTok("using", i, close + 1); i = close + 1
          } else i += 1
        case _ => i += 1
      }
    }
    val ts = toks.result()
    if (!ts.exists(_.kind == "on")) return span
    // split into comma items; rebuild each
    val itemBounds = {
      val commas = ts.filter(_.kind == ",").map(_.start)
      (Seq(-1) ++ commas).zip(commas.map(_ + 1) ++ Seq(span.length + 1))
        .map { case (a, b) => (a + 1, b - 1) }
    }
    val rebuilt = itemBounds.map { case (s0, e0) =>
      val itemToks = ts.filter(t => t.kind != "," && t.start >= s0 && t.end <= e0)
      rebuildJoinTree(span, s0, e0, itemToks)
    }
    val out = rebuilt.mkString(", ")
    if (out.replaceAll("\\s+", " ").trim ==
      span.replaceAll("\\s+", " ").trim) span
    else out
  }

  /** Depth-0 token in a FROM span: kind ∈ op | on | using | ",". */
  private case class JTok(kind: String, start: Int, end: Int)

  private def rebuildJoinTree(span: String, s0: Int, e0: Int,
                              tt: Seq[JTok]): String = {
    if (tt.isEmpty) return span.substring(s0, e0).trim
    val item = span.substring(s0, e0)
    // nodes/ops stacks; prims are the gaps between tokens
    val nodes = scala.collection.mutable.Stack[String]()
    val ops = scala.collection.mutable.Stack[String]()
    var deferred = false
    var cursor = s0
    def pushPrim(upTo: Int): Unit = {
      val p = span.substring(cursor, upTo).trim
      if (p.nonEmpty) nodes.push(p)
      cursor = upTo
    }
    var k = 0
    while (k < tt.length) {
      val t = tt(k)
      t.kind match {
        case "op" =>
          pushPrim(t.start)
          ops.push(span.substring(t.start, t.end))
          cursor = t.end
          // natural / cross joins take no ON: combine as soon as the
          // right operand lands (next token or item end marks it)
          val opLow = span.substring(t.start, t.end).toLowerCase
          val nextAt = tt.drop(k + 1).headOption.map(_.start).getOrElse(e0)
          if (opLow.contains("natural") || opLow.contains("cross")) {
            val right = span.substring(t.end, nextAt).trim
            cursor = nextAt
            val op = ops.pop()
            val left = nodes.pop()
            nodes.push(s"$left $op $right")
          }
        case "on" =>
          pushPrim(t.start)
          // condition runs to the next token start or item end
          val condEnd = tt.drop(k + 1).headOption.map(_.start).getOrElse(e0)
          val cond = span.substring(t.end, condEnd).trim
          cursor = condEnd
          if (ops.size >= 2) deferred = true
          val op = ops.pop()
          val right = nodes.pop()
          val left = nodes.pop()
          nodes.push(s"($left $op $right ON $cond)")
        case "using" =>
          pushPrim(t.start)
          val u = span.substring(t.start, t.end)
          val op = ops.pop()
          val right = nodes.pop()
          val left = nodes.pop()
          nodes.push(s"($left $op $right $u)")
        case _ =>
      }
      k += 1
    }
    pushPrim(e0)
    if (!deferred || ops.nonEmpty || nodes.size != 1)
      item.trim
    else nodes.top
  }

  /** PG's default NULL sort position is NULLS LAST for ASC and NULLS
    * FIRST for DESC (gram.y sortby: nulls_ordering defaults,
    * nodeSort); Spark's defaults are the OPPOSITE (NULLS FIRST asc).
    * Every ORDER BY item without an explicit NULLS spec gets PG's
    * default spelled out — top-level sorts, subqueries, and window
    * ORDER BYs alike. WITHIN GROUP order clauses are skipped (Spark's
    * ordered-set aggregates own their ordering and reject the
    * modifier). */
  private def orderByNulls(sqlIn: String): String = {
    val masked0 = maskLiterals(sqlIn)
    val obs = "(?i)\\border\\s+by\\b".r.findAllMatchIn(masked0)
      .map(m => (m.start, m.end)).toSeq.reverse
    var sql = sqlIn
    obs.foreach { case (obStart, obEnd) =>
      val masked = maskLiterals(sql)
      // WITHIN GROUP (ORDER BY ...)? look back past '(' for the words
      var p = obStart - 1
      while (p >= 0 && masked.charAt(p).isWhitespace) p -= 1
      val inWithinGroup = p >= 0 && masked.charAt(p) == '(' && {
        val before = masked.substring(0, p).trim.toLowerCase
        before.endsWith("group") &&
          before.dropRight(5).trim.endsWith("within")
      }
      if (!inWithinGroup) {
        // span: to depth-underflow ')', a depth-0 clause keyword, or ';'
        val enders = Seq("limit", "offset", "fetch", "for", "union",
          "intersect", "except", "returning", "window", "having",
          "rows", "range", "groups")
        var d = 0
        var i = obEnd
        var end = masked.length
        var scanning = true
        def wordAt(at: Int, w: String): Boolean =
          masked.regionMatches(true, at, w, 0, w.length) &&
            (at == 0 || (!Character.isLetterOrDigit(masked.charAt(at - 1)) &&
              masked.charAt(at - 1) != '_')) &&
            (at + w.length >= masked.length ||
              (!Character.isLetterOrDigit(masked.charAt(at + w.length)) &&
                masked.charAt(at + w.length) != '_'))
        while (i < masked.length && scanning) {
          masked.charAt(i) match {
            case '(' | '[' => d += 1
            case ')' | ']' =>
              d -= 1
              if (d < 0) { end = i; scanning = false }
            case ';' if d == 0 => end = i; scanning = false
            case _ =>
              if (d == 0 && enders.exists(wordAt(i, _))) {
                end = i; scanning = false
              }
          }
          i += 1
        }
        val body = sql.substring(obEnd, end)
        val items = topLevelSplit(body, masked.substring(obEnd, end))
        val rebuilt = items.map { it =>
          val t2 = it.trim
          if (t2.isEmpty ||
            "(?is)\\bNULLS\\s+(FIRST|LAST)\\s*$".r.findFirstIn(t2).isDefined)
            t2
          else if ("(?is)(\\bDESC|\\bUSING\\s*>)\\s*$".r
            .findFirstIn(t2).isDefined) s"$t2 NULLS FIRST"
          else s"$t2 NULLS LAST"
        }
        if (rebuilt != items.map(_.trim))
          sql = sql.substring(0, obEnd) + " " + rebuilt.mkString(", ") +
            (if (end < sql.length && !sql.charAt(end).isWhitespace) " "
             else "") + sql.substring(end)
      }
    }
    sql
  }

  /** SQL `WINDOW name AS (spec)` clause (gram.y window_clause): Spark
    * parses it but does not resolve references from every clause
    * position (ORDER BY rank() OVER w) nor the frame-refinement form
    * `OVER (w RANGE ...)`. Expand every reference to the inline spec
    * and drop the clause — semantics identical (window_clause is pure
    * naming). */
  private def windowClauseExpand(sqlIn: String): String = {
    var sql = sqlIn
    var guard = 0
    var changed = true
    while (changed && guard < 16) {
      changed = false
      guard += 1
      val masked = maskLiterals(sql)
      val m = "(?i)\\bWINDOW\\s+(\\w+)\\s+AS\\s*\\(".r.findFirstMatchIn(masked)
      m.foreach { mm =>
        // defs: name AS (spec) [, name AS (spec)]*
        val defs = scala.collection.mutable.LinkedHashMap[String, String]()
        var at = mm.start + "WINDOW".length
        var more = true
        var end = mm.start
        while (more) {
          val dm = "(?is)^\\s*(\\w+)\\s+AS\\s*\\(".r
            .findPrefixMatchOf(masked.substring(at))
          dm match {
            case Some(d) =>
              val open = at + d.end - 1
              val close = matchingParen(masked, open)
              defs += d.group(1).toLowerCase -> sql.substring(open + 1, close)
              end = close + 1
              val cont = "(?s)^\\s*,".r
                .findPrefixMatchOf(masked.substring(close + 1))
              cont match {
                case Some(c2) => at = close + 1 + c2.end
                case None => more = false
              }
            case None => more = false
          }
        }
        if (defs.nonEmpty) {
          // a def may itself reference an earlier window (`wx AS (w)`,
          // gram.y window_definition existing_window_name) — resolve
          // to fixpoint before substituting call sites
          var settled = false
          while (!settled) {
            settled = true
            for ((n, spec) <- defs) {
              val rm = "(?is)^\\s*(\\w+)\\b(.*)$".r.findFirstMatchIn(spec)
              rm.filter(r => defs.contains(r.group(1).toLowerCase) &&
                r.group(1).toLowerCase != n).foreach { r =>
                defs(n) = defs(r.group(1).toLowerCase) + r.group(2)
                settled = false
              }
            }
          }
          var out = sql.substring(0, mm.start) + " " + sql.substring(end)
          for ((name, spec) <- defs) {
            out = out.replaceAll(
              "(?i)\\bOVER\\s*\\(\\s*" + name + "\\b",
              java.util.regex.Matcher.quoteReplacement(s"OVER ($spec "))
            out = out.replaceAll("(?i)\\bOVER\\s+" + name + "\\b",
              java.util.regex.Matcher.quoteReplacement(s"OVER ($spec)"))
          }
          sql = out
          changed = true
        }
      }
    }
    sql
  }

  /** Hypothetical-set aggregates with DIRECT arguments (orderedsetaggs.c
    * hypothetical_rank_common): `rank(v) WITHIN GROUP (ORDER BY x)` asks
    * where v would rank among the x values. Spark has no spelling; each
    * form compiles to its defining count over the group:
    * rank = 1+|{x < v}|, dense_rank counts distinct, percent_rank =
    * (rank-1)/N, cume_dist = (1+|{x <= v}|)/(N+1). DESC flips the
    * comparison. Single order key only (the multi-key forms in the
    * reference suites are all over excluded custom aggregates). */
  private def hypotheticalSetAgg(sqlIn: String): String = {
    var sql = sqlIn
    var guard = 0
    while (guard < 32) {
      guard += 1
      val masked = maskLiterals(sql)
      val m = ("(?i)\\b(rank|dense_rank|percent_rank|cume_dist)\\s*\\(").r
        .findAllMatchIn(masked).find { mm =>
        val close = matchingParen(masked, mm.end - 1)
        masked.substring(mm.end, close).trim.nonEmpty &&
          "(?is)^\\s*within\\s+group\\s*\\(".r
            .findPrefixMatchOf(masked.substring(close + 1)).isDefined
      }
      m match {
        case None => return sql
        case Some(mm) =>
          val fn = mm.group(1).toLowerCase
          val close = matchingParen(masked, mm.end - 1)
          val v = sql.substring(mm.end, close).trim
          val wg = "(?is)^\\s*within\\s+group\\s*\\(".r
            .findPrefixMatchOf(masked.substring(close + 1)).get
          val wgOpen = close + 1 + wg.end - 1
          val wgClose = matchingParen(masked, wgOpen)
          val ob = sql.substring(wgOpen + 1, wgClose).trim
          val om = "(?is)^ORDER\\s+BY\\s+(.*?)(\\s+ASC|\\s+DESC)?\\s*$".r
            .findFirstMatchIn(ob).getOrElse(
              throw new IllegalArgumentException(
                s"WITHIN GROUP needs ORDER BY: $ob"))
          val x = om.group(1).trim
          val desc = Option(om.group(2)).exists(_.trim.equalsIgnoreCase("DESC"))
          val lt = if (desc) ">" else "<"
          val le = if (desc) ">=" else "<="
          val repl = fn match {
            case "rank" =>
              s"(1 + count(CASE WHEN ($x) $lt ($v) THEN 1 END))"
            case "dense_rank" =>
              s"(1 + count(DISTINCT CASE WHEN ($x) $lt ($v) THEN ($x) END))"
            case "percent_rank" =>
              s"(CASE WHEN count(*) = 0 THEN CAST(0 AS DOUBLE) ELSE " +
                s"CAST(count(CASE WHEN ($x) $lt ($v) THEN 1 END) AS DOUBLE)" +
                s" / count(*) END)"
            case "cume_dist" =>
              s"(CAST(1 + count(CASE WHEN ($x) $le ($v) THEN 1 END) AS " +
                s"DOUBLE) / (count(*) + 1))"
          }
          sql = sql.substring(0, mm.start) + repl + sql.substring(wgClose + 1)
      }
    }
    sql
  }

  /** Multi-fraction ordered-set aggregates (orderedsetaggs.c
    * percentile_cont/disc over a fraction ARRAY): expand the literal
    * fraction array into one native scalar call per element, wrapped
    * in array(...) — `percentile_disc(array[a,b]) WITHIN GROUP (o)` →
    * `array(percentile_disc(a) WITHIN GROUP (o), ...)`. */
  private def percentileArray(sqlIn: String): String = {
    var sql = sqlIn
    var guard = 0
    while (guard < 32) {
      guard += 1
      val masked = maskLiterals(sql)
      val m = "(?i)\\bpercentile_(cont|disc)\\s*\\(\\s*array\\s*\\[".r
        .findAllMatchIn(masked).find { mm =>
        val close = matchingParen(masked, masked.indexOf('(', mm.start))
        "(?is)^\\s*within\\s+group\\s*\\(".r
          .findPrefixMatchOf(masked.substring(close + 1)).isDefined
      }
      m match {
        case None => return sql
        case Some(mm) =>
          val fn = mm.group(1).toLowerCase
          val open = masked.indexOf('(', mm.start)
          val close = matchingParen(masked, open)
          val brOpen = masked.indexOf('[', mm.start)
          // matching ']' via a bracket scan
          var d2 = 0; var k = brOpen; var brClose = -1
          while (k < masked.length && brClose < 0) {
            masked.charAt(k) match {
              case '[' => d2 += 1
              case ']' => d2 -= 1; if (d2 == 0) brClose = k
              case _ =>
            }
            k += 1
          }
          // nested array[[..]] (2-D) is out of scope — leave untouched
          val inner = sql.substring(brOpen + 1, brClose)
          if (inner.contains("[")) return sql
          val fracs = topLevelSplit(inner, masked.substring(brOpen + 1, brClose))
          val wg = "(?is)^\\s*within\\s+group\\s*\\(".r
            .findPrefixMatchOf(masked.substring(close + 1)).get
          val wgOpen = close + 1 + wg.end - 1
          val wgClose = matchingParen(masked, wgOpen)
          val obText = sql.substring(close + 1, wgClose + 1)
          val calls =
            if (fn == "cont") fracs.map(f => s"percentile_cont($f) $obText")
            else {
              // percentile_disc works on ANY orderable type in PG
              // (strings included); Spark's builtin is numeric-only, so
              // disc compiles to its definition — the first sorted
              // value at cumulative fraction >= p (index ceil(p*n),
              // floor 1 for p=0)
              val ob = sql.substring(wgOpen + 1, wgClose).trim
              val om = "(?is)^ORDER\\s+BY\\s+(.*?)(\\s+ASC|\\s+DESC)?\\s*$".r
                .findFirstMatchIn(ob).getOrElse(
                  throw new IllegalArgumentException(
                    s"WITHIN GROUP needs ORDER BY: $ob"))
              val x = om.group(1).trim
              val desc = Option(om.group(2))
                .exists(_.trim.equalsIgnoreCase("DESC"))
              val arr =
                if (desc) s"reverse(array_sort(collect_list(($x))))"
                else s"array_sort(collect_list(($x)))"
              fracs.map(f => s"element_at($arr, greatest(1, " +
                s"CAST(ceil(($f) * count(($x))) AS INT)))")
            }
          sql = sql.substring(0, mm.start) +
            calls.mkString("array(", ", ", ")") + sql.substring(wgClose + 1)
      }
    }
    sql
  }

  /** Aggregate-internal ORDER BY (gram.y func_arg_list with
    * agg_order): `array_agg(v ORDER BY k [DESC] [NULLS ...])` /
    * `string_agg(v, d ORDER BY k)`. Spark's parser has no spelling, so
    * the ordered collection compiles to an explicit
    * collect→sort→project chain: structs carry (key, value) so NULL
    * values survive collect_list, a comparator lambda encodes
    * direction and null placement (PG defaults: NULLS LAST for ASC,
    * FIRST for DESC), DISTINCT dedups the struct pairs. Single order
    * key (the reference's multi-key forms ride excluded custom
    * aggregates). */
  private def orderedAgg(sqlIn: String): String = {
    var sql = sqlIn
    var guard = 0
    while (guard < 32) {
      guard += 1
      val masked = maskLiterals(sql)
      val hit = "(?i)\\b(array_agg|string_agg)\\s*\\(".r
        .findAllMatchIn(masked).flatMap { mm =>
        val open = masked.indexOf('(', mm.start)
        val close = matchingParen(masked, open)
        val argsMasked = masked.substring(open + 1, close)
        // top-level ORDER BY inside the call?
        var d2 = 0; var obAt = -1; var j = 0
        while (j < argsMasked.length && obAt < 0) {
          argsMasked.charAt(j) match {
            case '(' | '[' => d2 += 1
            case ')' | ']' => d2 -= 1
            case _ =>
              if (d2 == 0 &&
                argsMasked.regionMatches(true, j, "order", 0, 5) &&
                (j == 0 || !Character.isLetterOrDigit(argsMasked.charAt(j - 1))) &&
                "(?is)^order\\s+by\\b".r
                  .findPrefixMatchOf(argsMasked.substring(j)).isDefined)
                obAt = j
          }
          j += 1
        }
        // DISTINCT array_agg without ORDER BY also rewrites: Spark's
        // native collect drops NULL elements, PG's array_agg keeps them
        val bareDistinct = obAt < 0 &&
          mm.group(1).equalsIgnoreCase("array_agg") &&
          "(?is)^\\s*DISTINCT\\b".r.findFirstIn(argsMasked).isDefined
        if (obAt < 0 && !bareDistinct) None
        else Some((mm, open, close, obAt))
      }.toSeq.headOption
      hit match {
        case None => return sql
        case Some((mm, open, close, obAt)) if obAt < 0 =>
          // array_agg(DISTINCT x): struct-wrap so NULLs survive collect
          val x = sql.substring(open + 1, close)
            .replaceAll("(?is)^\\s*DISTINCT\\b", "").trim
          sql = sql.substring(0, mm.start) +
            s"transform(array_distinct(collect_list(struct(($x) AS v)))" +
            s", s -> s.v)" + sql.substring(close + 1)
        case Some((mm, open, close, obAt)) =>
          val fn = mm.group(1).toLowerCase
          val rawArgs = sql.substring(open + 1, close)
          val pre = rawArgs.substring(0, obAt).trim
          val obBody = "(?is)^order\\s+by\\s+(.*)$".r
            .findFirstMatchIn(rawArgs.substring(obAt)).get.group(1).trim
          val km = ("(?is)^(.*?)(\\s+ASC|\\s+DESC)?" +
            "(\\s+NULLS\\s+(?:FIRST|LAST))?\\s*$").r
            .findFirstMatchIn(obBody).get
          if (km.group(1).contains(",")) return sql // multi-key: leave
          val key = km.group(1).trim
          val desc = Option(km.group(2)).exists(_.trim.equalsIgnoreCase("DESC"))
          val nullsFirst = Option(km.group(3)) match {
            case Some(nf) => nf.trim.toUpperCase.endsWith("FIRST")
            case None => desc // PG default: NULLS LAST asc, FIRST desc
          }
          val distinct = "(?is)^\\s*DISTINCT\\b".r.findFirstIn(pre).isDefined
          val pre2 = pre.replaceAll("(?is)^\\s*DISTINCT\\b", "").trim
          val items = topLevelSplit(pre2, maskLiterals(pre2))
          val (v, delim) = fn match {
            case "string_agg" =>
              require(items.length == 2,
                s"string_agg takes (value, delimiter): $rawArgs")
              (items(0), Some(items(1)))
            case _ =>
              require(items.length == 1,
                s"array_agg takes one argument: $rawArgs")
              (items(0), None)
          }
          val nf = if (nullsFirst) "-1" else "1"
          val (ltR, gtR) = if (desc) ("1", "-1") else ("-1", "1")
          val cmp = s"(l, r) -> CASE " +
            s"WHEN l.k IS NULL AND r.k IS NULL THEN 0 " +
            s"WHEN l.k IS NULL THEN $nf WHEN r.k IS NULL THEN ${if (nullsFirst) "1" else "-1"} " +
            s"WHEN l.k < r.k THEN $ltR WHEN l.k > r.k THEN $gtR ELSE 0 END"
          val collected0 = s"collect_list(struct(($key) AS k, ($v) AS v))"
          val collected =
            if (distinct) s"array_distinct($collected0)" else collected0
          val sorted = s"array_sort($collected, $cmp)"
          val repl = delim match {
            case Some(d) =>
              s"array_join(transform($sorted, s -> s.v), $d)"
            // PG array_agg over ZERO rows is NULL, not the empty array
            case None =>
              s"if(size($sorted) = 0, null, transform($sorted, s -> s.v))"
          }
          sql = sql.substring(0, mm.start) + repl + sql.substring(close + 1)
      }
    }
    sql
  }

  /** PG resolves an ORDER BY item textually identical to a SELECT-list
    * expression as that output column (parse_clause.c
    * transformSortClause resolves against the targetlist first). Spark
    * re-resolves the expression against the aggregate's child, which
    * fails when HAVING lifts the Sort above the Aggregate (`ORDER BY
    * lower(c)` after `GROUP BY lower(c) HAVING ...` → unresolved `c`).
    * Rewriting the item to its output ordinal is semantics-preserving
    * in both engines. Applied only when a top-level HAVING is present —
    * the one shape Spark cannot resolve natively. */
  private def orderByOrdinal(sqlIn: String): String = {
    val masked = maskLiterals(sqlIn)
    val depth = new Array[Int](masked.length + 1)
    var d = 0
    var i = 0
    while (i < masked.length) {
      depth(i) = d
      masked.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
      }
      i += 1
    }
    depth(masked.length) = d
    def topAll(re: String): Seq[scala.util.matching.Regex.Match] =
      re.r.findAllMatchIn(masked).filter(m => depth(m.start) == 0).toSeq
    val selM = "(?is)^\\s*SELECT(\\s+DISTINCT)?\\b".r.findFirstMatchIn(masked)
    val havingAt = topAll("(?i)\\bHAVING\\b").headOption
    val obM = topAll("(?i)\\bORDER\\s+BY\\b").lastOption
    val fromAt = topAll("(?i)\\bFROM\\b").headOption
    val anyWindowItem = obM.exists(ob =>
      "(?i)\\bover\\b".r.findFirstIn(masked.substring(ob.end)).isDefined)
    if (selM.isEmpty || obM.isEmpty || fromAt.isEmpty ||
      (havingAt.isEmpty && !anyWindowItem))
      sqlIn
    else {
      val ob = obM.get
      val selEnd = selM.get.end
      val items = topLevelSplit(
        sqlIn.substring(selEnd, fromAt.get.start),
        masked.substring(selEnd, fromAt.get.start))
      def normE(s: String) = s.toLowerCase.replaceAll("\\s+", "")
      def exprOf(item: String): String =
        "(?is)^(.*?)\\s+AS\\s+[\\w\"]+\\s*$".r.findFirstMatchIn(item)
          .map(_.group(1)).getOrElse(item)
      val selNorm = items.map(it => normE(exprOf(it)))
      val obEnd = topAll("(?i)\\b(LIMIT|OFFSET|FETCH)\\b")
        .map(_.start).filter(_ > ob.end).sorted.headOption
        .getOrElse(sqlIn.length)
      val bodyRaw = sqlIn.substring(ob.end, obEnd)
      val semi = bodyRaw.reverse.takeWhile(c => c == ';' || c.isWhitespace)
        .reverse
      val body = bodyRaw.stripSuffix(semi)
      val obItems = topLevelSplit(body, masked.substring(ob.end, obEnd)
        .stripSuffix(semi))
      val itemRe =
        "(?is)^(.*?)(\\s+(?:ASC|DESC))?(\\s+NULLS\\s+(?:FIRST|LAST))?\\s*$".r
      val rewritten = obItems.map { it =>
        itemRe.findFirstMatchIn(it) match {
          case Some(m) =>
            val core = normE(m.group(1))
            val k = selNorm.indexOf(core)
            // rewrite under HAVING (the unresolvable-Sort shape) and
            // for window-function items (Spark refuses a window call
            // in ORDER BY; PG binds it to the identical output column)
            if (k >= 0 && (havingAt.isDefined || core.contains("over")))
              (k + 1).toString + Option(m.group(2)).getOrElse("") +
                Option(m.group(3)).getOrElse("")
            else it
          case None => it
        }
      }
      if (rewritten == obItems) sqlIn
      else sqlIn.substring(0, ob.end) + " " + rewritten.mkString(", ") +
        semi + sqlIn.substring(obEnd)
    }
  }

  /** PG row-constructor comparisons `(a, b) op (c, d)` / `ROW(...)`
    * (gram.y row; rowcomparison semantics in execExpr ROWCOMPARE):
    * Spark parses the syntax but compares structs by SORT order, so a
    * NULL field decides instead of yielding unknown — (1, NULL) <
    * (1, 3) is TRUE in Spark, NULL in PG. Expand to the SQL-standard
    * lexicographic form, which carries three-valued logic natively:
    * `(a < c) OR (a = c AND b < d)`, pairwise AND for `=`, pairwise
    * OR for `<>`. Groups must both have ≥2 top-level elements, and a
    * group preceded by an identifier other than ROW is a call's
    * argument list, left untouched. */
  private def rowCompare(sqlIn: String): String = {
    var sql = sqlIn
    var changed = true
    while (changed) {
      changed = false
      val masked = maskLiterals(sql)
      val opRe = "\\)\\s*(<=|>=|<>|!=|=|<|>)\\s*(ROW\\s*)?\\(".r
      val hit = opRe.findAllMatchIn(masked).find { m =>
        // lhs group: scan back to its '('
        val lhsClose = m.start
        var depth = 0
        var j = lhsClose
        var lhsOpen = -1
        while (j >= 0 && lhsOpen < 0) {
          masked.charAt(j) match {
            case ')' => depth += 1
            case '(' => depth -= 1; if (depth == 0) lhsOpen = j
            case _ =>
          }
          j -= 1
        }
        lhsOpen >= 0 && {
          // an identifier ADJACENT to lhs '(' is a call's argument
          // list (blocks the rewrite) unless it is ROW; an identifier
          // separated by whitespace is just keyword context (SELECT,
          // WHERE, AND, ...) — only ROW matters there
          var k = lhsOpen - 1
          val adjacentId = k >= 0 && (masked.charAt(k).isLetterOrDigit ||
            masked.charAt(k) == '_')
          while (k >= 0 && masked.charAt(k).isWhitespace) k -= 1
          val idEnd = k
          while (k >= 0 && (masked.charAt(k).isLetterOrDigit ||
            masked.charAt(k) == '_')) k -= 1
          val precededBy = masked.substring(k + 1, idEnd + 1)
          val rowKw = precededBy.equalsIgnoreCase("row")
          (rowKw || !adjacentId) && {
            val rhsOpen = m.end - 1
            val rhsClose = matchingParen(masked, rhsOpen)
            // a subquery side is NOT a row constructor — its select-
            // list commas must not be split ((a,b) = (SELECT x, y...)
            // is PG's row-valued scalar subquery, left untouched)
            val lhsInner = sql.substring(lhsOpen + 1, lhsClose)
            val rhsInner = sql.substring(rhsOpen + 1, rhsClose)
            def isSub(s: String) = s.trim.toUpperCase
              .matches("(?s)^(SELECT|WITH|VALUES|TABLE)\\b.*")
            val lhsParts0 = topLevelSplit(lhsInner,
              masked.substring(lhsOpen + 1, lhsClose))
            if (!isSub(lhsInner) && isSub(rhsInner) &&
                lhsParts0.length >= 2 &&
                (m.group(1) == "=" || m.group(1) == "<>" ||
                  m.group(1) == "!=")) {
              // ROW-valued scalar subquery ((a,b) = (SELECT x, y …)):
              // both sides become one struct (rowtypes record_eq)
              val op = if (m.group(1) == "!=") "<>" else m.group(1)
              val start = if (rowKw) k + 1 else lhsOpen
              sql = sql.substring(0, start) +
                s"struct($lhsInner) $op (${structifySelect(rhsInner)})" +
                sql.substring(rhsClose + 1)
              changed = true
              true
            } else
            !isSub(lhsInner) && !isSub(rhsInner) && {
            val lhsParts = lhsParts0
            val rhsParts = topLevelSplit(rhsInner,
              masked.substring(rhsOpen + 1, rhsClose))
            lhsParts.length >= 2 && lhsParts.length == rhsParts.length && {
              val op = m.group(1) match {
                case "!=" => "<>"
                case o => o
              }
              val expanded = expandRowCompare(lhsParts, rhsParts, op)
              val start = if (rowKw) k + 1 else lhsOpen
              sql = sql.substring(0, start) + expanded +
                sql.substring(rhsClose + 1)
              changed = true
              true
            }
            }
          }
        }
      }
      val _ = hit
    }
    sql
  }

  private def expandRowCompare(ls: Seq[String], rs: Seq[String],
                               op: String): String = op match {
    case "=" =>
      ls.zip(rs).map { case (l, r) => s"($l) = ($r)" }
        .mkString("(", " AND ", ")")
    case "<>" =>
      ls.zip(rs).map { case (l, r) => s"($l) <> ($r)" }
        .mkString("(", " OR ", ")")
    case _ =>
      val strict = op.take(1) // "<" for <,<= ; ">" for >,>=
      def lex(i: Int): String = {
        val (l, r) = (ls(i), rs(i))
        if (i == ls.length - 1) s"($l) $op ($r)"
        else s"($l) $strict ($r) OR (($l) = ($r) AND (${lex(i + 1)}))"
      }
      s"(${lex(0)})"
  }

  /** PG string-literal syntaxes Spark's lexer rejects (gram.y / scan.l):
    *  - `E'...'` escape strings: the prefix drops — Spark's default
    *    string lexer applies the same C-style backslash escapes;
    *  - `B'...'` bit strings: degrade to their textual form;
    *  - `$$...$$` / `$tag$...$tag$` dollar quoting: becomes a standard
    *    literal with internal quotes doubled. `$1`-style parameters
    *    never match (a tag is `$[A-Za-z_]\w*$` or `$$`). */
  private def pgStringSyntax(sql: String): String = {
    val out = new StringBuilder
    val tagRe = "^\\$([A-Za-z_][A-Za-z0-9_]*)?\\$".r
    // decode a U& body's unicode escapes (scan.l xus/xui): \XXXX,
    // \+XXXXXX, doubled escape = the escape char itself
    def decodeUescape(body: String, esc: Char): String = {
      val sb = new StringBuilder
      var j = 0
      while (j < body.length) {
        val ch = body.charAt(j)
        if (ch == esc) {
          if (j + 1 < body.length && body.charAt(j + 1) == esc) {
            sb += esc; j += 2
          } else if (j + 6 < body.length && body.charAt(j + 1) == '+') {
            sb.appendAll(Character.toChars(
              Integer.parseInt(body.substring(j + 2, j + 8), 16)))
            j += 8
          } else if (j + 4 < body.length) {
            sb.appendAll(Character.toChars(
              Integer.parseInt(body.substring(j + 1, j + 5), 16)))
            j += 5
          } else throw new IllegalArgumentException(
            s"invalid Unicode escape in: $body")
        } else { sb += ch; j += 1 }
      }
      sb.toString
    }
    // a trailing `UESCAPE 'c'` clause after a U& literal/identifier
    def uescapeAt(at: Int): Option[(Char, Int)] = {
      val m = "^\\s*(?i:UESCAPE)\\s*'(.)'".r
        .findPrefixMatchOf(sql.substring(at))
      m.map(mm => (mm.group(1).charAt(0), at + mm.end))
    }
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if ((c == 'U' || c == 'u') && i + 2 < sql.length &&
        sql.charAt(i + 1) == '&' &&
        (sql.charAt(i + 2) == '\'' || sql.charAt(i + 2) == '"') &&
        (i == 0 || { val p = sql.charAt(i - 1)
          !p.isLetterOrDigit && p != '_' })) {
        // U&'...' unicode literal / U&"..." unicode identifier
        val q = sql.charAt(i + 2)
        var j = i + 3
        var done = false
        while (j < sql.length && !done) {
          if (sql.charAt(j) == q) {
            if (j + 1 < sql.length && sql.charAt(j + 1) == q) j += 1
            else done = true
          }
          j += 1
        }
        val rawBody = sql.substring(i + 3, j - 1)
          .replace(s"$q$q", s"$q")
        val (esc, next) = uescapeAt(j) match {
          case Some((e, n)) => (e, n)
          case None => ('\\', j)
        }
        val decoded = decodeUescape(rawBody, esc)
        if (q == '\'')
          out += '\'' ++= decoded.replace("\\", "\\\\")
            .replace("'", "''") += '\''
        else
          out += '"' ++= decoded.replace("\"", "\"\"") += '"'
        i = next
      } else if (c == '\'') {
        // standard literal. With standard_conforming_strings ON
        // (scan.l xq), the body is VERBATIM — Spark's lexer applies
        // C-style escapes, so backslashes must double. The engine
        // default (OFF) keeps Spark's escaping, PG's legacy mode.
        val start = i
        i += 1
        var done = false
        while (i < sql.length && !done) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 1
            else done = true
          }
          i += 1
        }
        if (stdStrings)
          out ++= sql.substring(start, i).replace("\\", "\\\\")
        else out ++= sql.substring(start, i)
      } else if ((c == 'E' || c == 'e' || c == 'B' || c == 'b') &&
        i + 1 < sql.length && sql.charAt(i + 1) == '\'' &&
        (i == 0 || { val p = sql.charAt(i - 1)
          !p.isLetterOrDigit && p != '_' && p != '\'' })) {
        i += 1 // drop the prefix; the literal itself copies next round
      } else if (c == '$') {
        tagRe.findFirstMatchIn(sql.substring(i)) match {
          case Some(m) =>
            val tag = m.matched
            val bodyStart = i + tag.length
            val end = sql.indexOf(tag, bodyStart)
            require(end >= 0, s"unterminated dollar-quoted string: $tag")
            // dollar-quoted bodies are VERBATIM in PG; Spark's lexer
            // applies C-style escapes, so backslashes must double or
            // $re$\s+$re$ silently becomes the regex "s+"
            out += '\'' ++= sql.substring(bodyStart, end)
              .replace("\\", "\\\\").replace("'", "''") += '\''
            i = end + tag.length
          case None =>
            out += c; i += 1
        }
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** PG double-quoted identifiers (scan.l xd) → Spark backticks, for
    * the simple-word subset. In PG, "..." is ALWAYS an identifier; in
    * Spark's default mode it's a string literal — so a PG statement
    * like `r(a, b, "sum")` would silently become a string. Only
    * `"word"` forms rewrite; quoted identifiers with spaces or
    * punctuation stay (fail loudly rather than guess). */
  private def quotedIdents(sql: String): String = {
    val masked = maskLiterals(sql)
    val sb = new StringBuilder
    var last = 0
    // any non-empty quoted identifier ("" escapes a quote; PG allows
    // spaces, punctuation, keywords — `AS "Simple WHEN"`); backticks
    // inside double so Spark's quoting stays closed
    for (m <- "\"((?:[^\"]|\"\")+)\"".r.findAllMatchIn(masked)) {
      val body = sql.substring(m.start + 1, m.end - 1)
        .replace("\"\"", "\"").replace("`", "``")
      sb ++= sql.substring(last, m.start) += '`' ++= body += '`'
      last = m.end
    }
    sb ++= sql.substring(last)
    sb.toString
  }

  /** PG EXTRACT / date_part fields Spark lacks or counts differently
    * (timestamp.c date_part): EPOCH (seconds-with-microseconds since
    * 1970), DOW (0=Sunday — Spark's is 1-based), ISODOW (1=Monday),
    * CENTURY / DECADE / MILLENNIUM. Other fields pass through to
    * Spark's native EXTRACT. */
  private def extractFields(sqlIn: String): String = {
    var sql = sqlIn
    var changed = true
    while (changed) {
      changed = false
      val masked = maskLiterals(sql)
      "(?i)\\b(EXTRACT|DATE_PART)\\s*\\(".r.findAllMatchIn(masked).find { m =>
        val open = m.end - 1
        val close = matchingParen(masked, open)
        val inner = sql.substring(open + 1, close)
        val parsed =
          if (m.group(1).equalsIgnoreCase("EXTRACT"))
            "(?is)^\\s*(\\w+)\\s+FROM\\s+(.*)$".r.findFirstMatchIn(inner)
              .map(mm => (mm.group(1), mm.group(2)))
          else
            "(?is)^\\s*'(\\w+)'\\s*,\\s*(.*)$".r.findFirstMatchIn(inner)
              .map(mm => (mm.group(1), mm.group(2)))
        parsed.exists { case (field0, expr) =>
          val repl = field0.toLowerCase match {
            case "epoch" =>
              Some(s"(CAST(unix_micros(CAST(($expr) AS TIMESTAMP)) " +
                "AS DOUBLE) / 1000000.0)")
            case "dow" => Some(s"(dayofweek($expr) - 1)")
            case "isodow" => Some(s"(weekday($expr) + 1)")
            case "century" =>
              Some(s"CAST(ceil(year($expr) / 100.0) AS BIGINT)")
            case "decade" =>
              Some(s"CAST(floor(year($expr) / 10.0) AS BIGINT)")
            case "millennium" =>
              Some(s"CAST(ceil(year($expr) / 1000.0) AS BIGINT)")
            case _ => None
          }
          repl.exists { r =>
            sql = sql.substring(0, m.start) + r + sql.substring(close + 1)
            changed = true
            true
          }
        }
      }
    }
    sql
  }

  /** PG regex substring(string FROM 'pattern') (varlena.c
    * textregexsubstr): first match, or capture group 1 when the
    * pattern declares one, NULL when nothing matches. The positional
    * substring(s FROM n [FOR m]) form is native Spark and passes
    * through (the rewrite fires only when the FROM operand is a
    * string literal with no FOR clause). */
  private def regexSubstring(sqlIn: String): String = {
    var sql = sqlIn
    var changed = true
    while (changed) {
      changed = false
      val masked = maskLiterals(sql)
      "(?i)\\bSUBSTRING\\s*\\(".r.findAllMatchIn(masked).find { m =>
        val open = m.end - 1
        val close = matchingParen(masked, open)
        val innerMasked = masked.substring(open + 1, close)
        def at(s0: Int, e0: Int): String =
          sql.substring(open + 1 + s0, open + 1 + e0)
        // three-operand escape forms first (FROM..FOR / two trailing
        // literals): SQL:1999 SIMILAR substring with #" markers
        val threeFrom = "(?is)^(.*\\S)\\s+FROM\\s+('x*')\\s+FOR\\s+('x*')\\s*$".r
          .findFirstMatchIn(innerMasked)
        val threeComma = "(?is)^(.*\\S)\\s*,\\s*('x*')\\s*,\\s*('x*')\\s*$".r
          .findFirstMatchIn(innerMasked)
        val twoFrom = "(?is)^(.*\\S)\\s+FROM\\s+('x*')\\s*$".r
          .findFirstMatchIn(innerMasked)
        val twoComma = "(?is)^(.*\\S)\\s*,\\s*('x*')\\s*$".r
          .findFirstMatchIn(innerMasked)
        val repl = (threeFrom.orElse(threeComma) match {
          case Some(im) => Some(
            s"pg_similar_substr((${at(im.start(1), im.end(1))}), " +
              s"${at(im.start(2), im.end(2))}, ${at(im.start(3), im.end(3))})")
          case None => twoFrom.orElse(twoComma).map { im =>
            s"pg_regexp_substr((${at(im.start(1), im.end(1))}), " +
              s"${at(im.start(2), im.end(2))})"
          }
        })
        repl.exists { r =>
          sql = sql.substring(0, m.start) + r + sql.substring(close + 1)
          changed = true
          true
        }
      }
    }
    sql
  }

  /** PG `GROUP BY (a, b)` composite items (gram.y group_by_item): a
    * parenthesized expression list groups by EACH member — Spark would
    * group by one struct. Flatten parens whose item contains a
    * top-level comma and isn't a ROLLUP/CUBE/GROUPING SETS body; runs
    * per GROUP BY list on the masked text. */
  /** ORDER BY items inside a SUBQUERY that reference an OUTER table
    * (`b in (select b from s order by r.c)`): PG decorrelates these —
    * the ordering is irrelevant to IN/EXISTS membership — while Spark
    * rejects outer references outside WHERE/HAVING. Drop exactly the
    * outer-referencing items (qualifier not among the subquery's own
    * FROM aliases); an emptied ORDER BY drops entirely. */
  private def stripCorrelatedOrderBy(sqlIn: String): String = {
    if ("(?i)\\border\\s+by\\b".r.findFirstIn(sqlIn).isEmpty) return sqlIn
    var sql = sqlIn
    var guard = 0
    var changed = true
    while (changed && guard < 16) {
      changed = false
      guard += 1
      val masked = maskLiterals(sql)
      val depth = new Array[Int](masked.length + 1)
      var d0 = 0
      for (i <- masked.indices) {
        depth(i) = d0
        masked.charAt(i) match {
          case '(' => d0 += 1
          case ')' => d0 -= 1
          case _ =>
        }
      }
      depth(masked.length) = d0
      "(?i)\\bORDER\\s+BY\\s+".r.findAllMatchIn(masked)
        .filter(m => depth(m.start) > 0).toSeq.reverse.foreach { m =>
          if (!changed) {
            val d = depth(m.start)
            // the subquery's own FROM aliases: scan back to its SELECT
            val selAt = "(?i)\\bSELECT\\b".r.findAllMatchIn(masked)
              .filter(s0 => s0.start < m.start && depth(s0.start) == d)
              .toSeq.lastOption
            val fromAt = selAt.flatMap(s0 =>
              "(?i)\\bFROM\\b".r.findAllMatchIn(masked)
                .find(f => f.start > s0.end && f.start < m.start &&
                  depth(f.start) == d))
            val aliases: Set[String] = fromAt.map { f =>
              val fEnd = ("(?i)\\b(WHERE|GROUP|HAVING|ORDER|LIMIT)\\b").r
                .findAllMatchIn(masked)
                .find(k => k.start > f.end && depth(k.start) == d)
                .map(_.start).getOrElse(m.start)
              topLevelSplit(sql.substring(f.end, fEnd),
                masked.substring(f.end, fEnd)).flatMap { it =>
                it.trim.split("(?i)\\s+(?:AS\\s+)?").toSeq.map(
                  _.trim.replace("\"", "").split("\\.").last.toLowerCase)
              }.toSet
            }.getOrElse(Set.empty)
            if (aliases.nonEmpty) {
              val end = (m.end until masked.length)
                .find(p => depth(p) < d || (depth(p) == d &&
                  ("(?i)\\b(LIMIT|OFFSET|FETCH)\\b".r
                    .findPrefixMatchOf(masked.substring(p)).isDefined ||
                    masked.charAt(p) == ';')))
                .map(p => if (depth(p) < d) p - 1 else p)
                .getOrElse(masked.length)
              val items = topLevelSplit(sql.substring(m.end, end),
                masked.substring(m.end, end)).map(_.trim)
              // drop ONLY items whose references are exclusively
              // outer-qualified (constant per outer row, so ordering
              // is irrelevant); an item MIXING inner and outer refs
              // (`s.x - r.c` under LIMIT 1) changes which row a
              // LIMITed subquery returns — keep it and let Spark
              // report the unsupported correlation loudly
              val kept = items.filterNot { it =>
                val mIt = maskLiterals(it)
                val quals = "([A-Za-z_]\\w*)\\s*\\.\\s*[A-Za-z_]".r
                  .findAllMatchIn(mIt).map(_.group(1).toLowerCase).toSeq
                val hasOuter = quals.exists(q => !aliases.contains(q))
                val hasInner = quals.exists(aliases.contains)
                // bare identifiers (potential inner columns) other
                // than sort keywords / function names
                val sortKw = Set("asc", "desc", "nulls", "first",
                  "last", "using", "collate")
                val hasBare = "\\b([A-Za-z_]\\w*)\\b".r
                  .findAllMatchIn(mIt).exists { b =>
                    val before = mIt.lastIndexWhere(
                      !_.isWhitespace, b.start - 1)
                    val afterIdx = mIt.indexWhere(
                      !_.isWhitespace, b.end)
                    val isQualified = (before >= 0 &&
                      mIt.charAt(before) == '.') ||
                      (afterIdx >= 0 && mIt.charAt(afterIdx) == '.')
                    val isFn = afterIdx >= 0 && mIt.charAt(afterIdx) == '('
                    !isQualified && !isFn &&
                      !sortKw.contains(b.group(1).toLowerCase)
                  }
                hasOuter && !hasInner && !hasBare
              }
              if (kept.length != items.length) {
                sql = sql.substring(0, m.start) +
                  (if (kept.isEmpty) " "
                   else s" ORDER BY ${kept.mkString(", ")} ") +
                  sql.substring(end)
                changed = true
              }
            }
          }
        }
    }
    sql
  }

  /** `SELECT DISTINCT ON (keys) list FROM ... [ORDER BY o]` at ANY
    * subquery depth (parse_clause.c transformDistinctOnClause): first
    * row per key group under the ORDER BY — rewritten to a
    * row_number window over the keys, outer-filtered to 1. The outer
    * ORDER BY keeps items that are select-list members (as ordinals);
    * a window with no ORDER BY falls back to the keys themselves. */
  private def distinctOn(sqlIn: String): String = {
    if ("(?i)\\bdistinct\\s+on\\b".r.findFirstIn(sqlIn).isEmpty) return sqlIn
    var sql = sqlIn
    var guard = 0
    var changed = true
    while (changed && guard < 16) {
      changed = false
      guard += 1
      val masked = maskLiterals(sql)
      val depth = new Array[Int](masked.length + 1)
      var d0 = 0
      for (i <- masked.indices) {
        depth(i) = d0
        masked.charAt(i) match {
          case '(' => d0 += 1
          case ')' => d0 -= 1
          case _ =>
        }
      }
      depth(masked.length) = d0
      "(?i)\\bSELECT\\s+DISTINCT\\s+ON\\s*\\(".r.findFirstMatchIn(masked)
        .foreach { m =>
          val d = depth(m.start)
          val open = masked.indexOf('(', m.end - 1)
          val close = matchingParen(masked, open)
          val keys = sql.substring(open + 1, close)
          def at(re: String, from: Int): Option[Int] =
            re.r.findAllMatchIn(masked).map(_.start)
              .find(p => p >= from && depth(p) == d)
          val fromAt = at("(?i)\\bFROM\\b", close + 1).getOrElse(return sql)
          val obAt = at("(?i)\\bORDER\\s+BY\\b", fromAt)
          // depth(p) is the depth BEFORE char p: a drop below d means
          // char p-1 is the subquery's closing paren — keep it
          val end = (close + 1 until masked.length)
            .find(p => depth(p) < d ||
              (depth(p) == d && masked.charAt(p) == ';'))
            .map(p => if (depth(p) < d) p - 1 else p)
            .getOrElse(masked.length)
          val limAt = at("(?i)\\b(LIMIT|OFFSET|FETCH)\\b", fromAt)
            .filter(_ < end)
          val bodyEnd = Seq(obAt, limAt, Some(end)).flatten.min
          val items = topLevelSplit(sql.substring(close + 1, fromAt),
            masked.substring(close + 1, fromAt)).map(_.trim)
          val parsed = items.zipWithIndex.map { case (si, i) =>
            val am = "(?is)^(.*\\S)\\s+AS\\s+(\\w+)\\s*$".r
              .findFirstMatchIn(si)
            val (e, alias) = am match {
              case Some(a) => (a.group(1), Some(a.group(2)))
              case None => (si,
                if (si.matches("[A-Za-z_][\\w.]*"))
                  Some(si.split("\\.").last)
                else None)
            }
            (e, alias, s"__dn$i")
          }
          val obTxt = obAt.map(o => sql.substring(
            o + "ORDER BY".length + 1, Seq(limAt, Some(end)).flatten.min))
          // no ORDER BY: PG picks the physically-first row — emulate
          // with the remaining select items as a deterministic
          // tiebreak after the keys (insertion order in practice)
          val fallbackOrder = (keys +: parsed.map(_._1)).distinct
            .mkString(", ")
          val inner = "SELECT " + parsed.map { case (e, _, n) =>
            s"($e) AS $n" }.mkString(", ") +
            s", row_number() OVER (PARTITION BY $keys ORDER BY " +
            obTxt.getOrElse(fallbackOrder) + ") AS __don " +
            sql.substring(fromAt, bodyEnd)
          def norm0(s0: String) = s0.toLowerCase.replaceAll("\\s+", "")
          val outerOb = obTxt.map { ot =>
            val obItems = topLevelSplit(ot, maskLiterals(ot)).map(_.trim)
            val mapped = obItems.flatMap { it =>
              val dm = "(?is)^(.*?)(\\s+(?:ASC|DESC)\\b.*|\\s+NULLS\\b.*)?$".r
                .findFirstMatchIn(it).get
              val e = dm.group(1).trim
              val sfx = Option(dm.group(2)).getOrElse("")
              parsed.indexWhere { case (pe, al, _) =>
                norm0(pe) == norm0(e) || al.exists(_.equalsIgnoreCase(e))
              } match {
                case -1 => None // not an output column: tie order only
                case i => Some(s"${i + 1}$sfx")
              }
            }
            if (mapped.nonEmpty) s" ORDER BY ${mapped.mkString(", ")} " else " "
          }.getOrElse(" ")
          val tail = // LIMIT/OFFSET survive outside
            (limAt.map(l => sql.substring(l, end)).getOrElse("")) +
              sql.substring(end)
          sql = sql.substring(0, m.start) +
            "SELECT " + parsed.map { case (_, al, n) =>
              al.map(a => s"$n AS $a").getOrElse(n) }.mkString(", ") +
            s" FROM ($inner) __dot${guard} WHERE __don = 1" + outerOb + tail
          changed = true
        }
    }
    sql
  }

  /** PG grouping-sets composition (parse_agg.c expand_grouping_sets):
    * a GROUP BY list mixing ROLLUP/CUBE/GROUPING SETS with plain items
    * is the CROSS PRODUCT of each item's set list, each final set the
    * per-set UNION of its parts — `GROUP BY ROLLUP((q),(q,c)), q`
    * means every set includes q, so q is never nulled. Spark instead
    * keeps the analytics item and the plain item as SEPARATE grouping
    * columns (the select list then binds to the nulled instance), so
    * this pass expands the PG product to explicit GROUPING SETS with
    * select-list aliases resolved to their expressions. Duplicate sets
    * survive (PG keeps them; so does Spark's Expand) and GROUP_ID()
    * becomes a per-duplicate row_number window — 0 for unique sets,
    * 0..n-1 across copies, PG's numbering up to copy permutation. */
  private def pgGroupingSets(sqlIn: String): String = {
    if ("(?i)\\b(rollup|cube|grouping)\\b".r.findFirstIn(sqlIn).isEmpty)
      return sqlIn
    // every GROUP BY (subqueries included), processed right-to-left so
    // earlier indices stay valid after a rewrite
    val masked0 = maskLiterals(sqlIn)
    val gbs = "(?i)\\bGROUP\\s+BY\\s+".r.findAllMatchIn(masked0)
      .map(_.start).toSeq.reverse
    var out = sqlIn
    gbs.foreach { at => out = rewriteOneGroupBy(out, at) }
    out
  }

  private def rewriteOneGroupBy(sqlIn: String, gbAt: Int): String = {
    val masked = maskLiterals(sqlIn)
    val depth = new Array[Int](masked.length + 1)
    var d0 = 0
    for (i <- masked.indices) {
      depth(i) = d0
      masked.charAt(i) match {
        case '(' => d0 += 1
        case ')' => d0 -= 1
        case _ =>
      }
    }
    depth(masked.length) = d0
    val gb = "(?i)\\bGROUP\\s+BY\\s+".r
      .findPrefixMatchOf(masked.substring(gbAt))
      .map(m => (gbAt, gbAt + m.end)).getOrElse(return sqlIn)
    val dgb = depth(gb._1)
    // clause end: next clause keyword at the SAME depth, the paren
    // closing this subselect, or ';'/end
    val endRe = ("(?i)\\b(HAVING|WINDOW|ORDER\\s+BY|LIMIT|OFFSET|FETCH|" +
      "UNION|INTERSECT|EXCEPT|RETURNING)\\b").r
    val kwEnd = endRe.findAllMatchIn(masked).map(_.start)
      .find(p => p > gb._2 && depth(p) == dgb)
    val parenEnd = (gb._2 until masked.length).find(p => depth(p) < dgb)
      .map(_ - 1)
    val semiEnd = (gb._2 until masked.length)
      .find(p => masked.charAt(p) == ';' && depth(p) == dgb)
    val end = Seq(kwEnd, parenEnd, semiEnd).flatten
      .reduceOption(_ min _).getOrElse(masked.length)
    val items = topLevelSplit(sqlIn.substring(gb._2, end),
      masked.substring(gb._2, end)).map(_.trim)
    def isAnalytic(it: String) =
      "(?is)^(rollup|cube|grouping\\s+sets)\\s*\\(".r.findFirstIn(it).isDefined
    if (!items.exists(isAnalytic)) return sqlIn
    // this GROUP BY's own SELECT: nearest preceding at the same depth
    val selStart = "(?i)\\bSELECT\\b".r.findAllMatchIn(masked)
      .filter(m => m.start < gb._1 && depth(m.start) == dgb)
      .toSeq.lastOption.map(_.end).getOrElse(return sqlIn)
    val fromAt = "(?i)\\bFROM\\b".r.findAllMatchIn(masked)
      .find(m => m.start > selStart && depth(m.start) == dgb)
      .map(_.start).getOrElse(return sqlIn)
    // SELECT DISTINCT/ALL: the quantifier is NOT part of the first
    // select item; re-emitted on the rebuilt outer SELECT
    val distinctKw = "(?is)^\\s*(DISTINCT|ALL)\\b"
      .r.findFirstMatchIn(masked.substring(selStart, fromAt))
      .map(_.group(1).toUpperCase)
    val selBodyStart = distinctKw.map(k =>
      selStart + masked.substring(selStart, fromAt)
        .toUpperCase.indexOf(k) + k.length).getOrElse(selStart)
    val selKw = "SELECT " + distinctKw.map(_ + " ").getOrElse("")
    val selItems = topLevelSplit(sqlIn.substring(selBodyStart, fromAt),
      masked.substring(selBodyStart, fromAt))
    val aliasMap: Map[String, String] = selItems.flatMap { si =>
      "(?is)^(.*\\S)\\s+AS\\s+(\\w+)\\s*$".r.findFirstMatchIn(si.trim)
        .map(m2 => m2.group(2).toLowerCase -> s"(${m2.group(1)})")
    }.toMap
    def unwrap(e0: String): String = {
      var e = e0.trim
      var go = true
      while (go && e.startsWith("(") &&
          matchingParen(maskLiterals(e), 0) == e.length - 1) {
        val inner = e.substring(1, e.length - 1).trim
        // never unwrap a composite (top-level comma) — not that sets
        // contain composites after atoms(), but stay safe
        val im = maskLiterals(inner)
        var dd = 0
        var comma = false
        im.foreach {
          case '(' => dd += 1
          case ')' => dd -= 1
          case ',' if dd == 0 => comma = true
          case _ =>
        }
        if (comma) go = false else e = inner
      }
      e
    }
    def subst(e: String): String = {
      var out = e
      aliasMap.foreach { case (a, ex) =>
        out = ("(?i)(?<![\\w.])" + java.util.regex.Pattern.quote(a) +
          "(?![\\w(])").r.replaceAllIn(out,
          java.util.regex.Matcher.quoteReplacement(ex))
      }
      unwrap(out)
    }
    def norm(e: String) = unwrap(e).toLowerCase.replaceAll("\\s+", "")
    // expand one item to its list of sets (each set = ordered exprs)
    def splitArgs(body: String): Seq[String] =
      topLevelSplit(body, maskLiterals(body)).map(_.trim)
    def atoms(part: String): Seq[String] = {
      val p = part.trim
      if (p.isEmpty) Seq.empty
      else if (p.startsWith("(") &&
          matchingParen(maskLiterals(p), 0) == p.length - 1)
        splitArgs(p.substring(1, p.length - 1)).filter(_.nonEmpty)
      else Seq(p)
    }
    def expand(it: String): Seq[Seq[String]] = {
      val m = "(?is)^(rollup|cube|grouping\\s+sets)\\s*\\(".r
        .findFirstMatchIn(it)
      m match {
        case Some(mm) =>
          val open = it.indexOf('(', mm.end - 1)
          val close = matchingParen(maskLiterals(it), open)
          val parts = splitArgs(it.substring(open + 1, close))
          mm.group(1).toLowerCase.replaceAll("\\s+", " ") match {
            case "rollup" =>
              (0 to parts.length).map(k =>
                parts.take(k).flatMap(atoms))
            case "cube" =>
              parts.indices.foldLeft(Seq(Seq.empty[String])) { (acc, i) =>
                acc ++ acc.map(_ ++ atoms(parts(i)))
              }
            case _ => // grouping sets: nested ROLLUP/CUBE/SETS inside
              // contribute their whole set LIST (parse_agg.c
              // transformGroupingSet unions nested lists)
              parts.flatMap { p =>
                if ("(?is)^(rollup|cube|grouping\\s+sets)\\s*\\(".r
                    .findFirstIn(p.trim).isDefined) expand(p.trim)
                else Seq(atoms(p))
              }
          }
        case None => Seq(atoms(it))
      }
    }
    // GP numbers group_id duplicates on the final set of TARGETLIST
    // REFERENCES (parse_clause.c findTargetlistEntrySQL92 +
    // transformGroupClause sortgroupref): a bare expression matches
    // the FIRST targetlist entry with an equal expression, an alias
    // names its own entry — so `newalias3` (tle 3) and `sale.cn`
    // (matched tle 1, both sale.cn) are DISTINCT refs even though the
    // grouping value is identical. Verified against the reference's
    // pinned qp_olap_mdqa output (both the rollup 33/12 and the cube
    // 85×4 group_id histograms).
    val selExprNorm: Seq[(String, String)] = selItems.zipWithIndex.map {
      case (si, i) =>
        val m2 = "(?is)^(.*\\S)\\s+AS\\s+(\\w+)\\s*$".r
          .findFirstMatchIn(si.trim)
        m2 match {
          case Some(mm) => (norm(mm.group(1)), s"tle$i")
          case None => (norm(si), s"tle$i")
        }
    }
    val aliasToTle: Map[String, String] = selItems.zipWithIndex.flatMap {
      case (si, i) =>
        "(?is)\\s+AS\\s+(\\w+)\\s*$".r.findFirstMatchIn(si.trim)
          .map(mm => mm.group(1).toLowerCase -> s"tle$i")
    }.toMap
    // tle indices referenced from the GROUP BY (by alias or by a bare
    // expression matching a select item — parse_clause.c
    // findTargetlistEntrySQL92 assigns the sortgroupref)
    val refTles = scala.collection.mutable.Set[Int]()
    def tleOf(atom: String): Option[Int] = {
      val a = atom.trim
      if (a.matches("(?i)[a-z_]\\w*") && aliasToTle.contains(a.toLowerCase))
        Some(aliasToTle(a.toLowerCase).stripPrefix("tle").toInt)
      else selExprNorm.zipWithIndex.find(_._1._1 == norm(a)).map(_._2)
    }
    def refKey(atom: String): String =
      tleOf(atom) match {
        case Some(i) => refTles += i; s"tle$i"
        case None => "e:" + norm(subst(atom))
      }
    val expanded = items.map(expand)
    val productKeyed = expanded
      .foldLeft(Seq((Seq.empty[String], Set.empty[String]))) {
        (acc, sets) => acc.flatMap { case (exprs, refs) =>
          sets.map(s => (exprs ++ s, refs ++ s.map(refKey)))
        }
      }
    // select items, alias stripped (the tle expression text)
    val tleExpr = selItems.map(si =>
      "(?is)^(.*\\S)\\s+AS\\s+\\w+\\s*$".r.findFirstMatchIn(si.trim)
        .map(_.group(1)).getOrElse(si.trim))
    def isSimpleCol(e: String) = e.trim.matches("[A-Za-z_][\\w.]*")
    // a group-REFERENCED complex tle renders as a uniquely-TAGGED
    // no-op CASE: PG matches select items to grouping entries by
    // sortgroupref, so two textually identical expressions in
    // different tles are DIFFERENT grouping entries — one grouped,
    // the other NULL — which Spark's expression-equality matching
    // cannot see without the tag (folded away post-analysis)
    def tagged(i: Int) = s"(CASE WHEN $i = $i THEN (${tleExpr(i)}) END)"
    def render(atom: String): String = tleOf(atom) match {
      case Some(i) if !isSimpleCol(tleExpr(i)) => tagged(i)
      case Some(i) => tleExpr(i)
      case None => subst(atom)
    }
    val product = productKeyed.map { case (set, _) =>
      val seen = scala.collection.mutable.LinkedHashMap[String, String]()
      set.map(render).foreach(e => seen.getOrElseUpdate(norm(e), e))
      seen.values.toSeq
    }
    // per-set group_id: count of earlier sets with the same final refs
    val gids = {
      val seen = scala.collection.mutable.Map[Set[String], Int]()
      productKeyed.map { case (_, key) =>
        val n = seen.getOrElse(key, 0)
        seen(key) = n + 1
        n
      }
    }
    def setsSqlOf(ss: Seq[Seq[String]]): String = ss.map(s =>
      if (s.isEmpty) "()" else s"(${s.mkString(", ")})").mkString(", ")
    // HAVING over GROUPING(): Spark's UnresolvedHaving cannot bind
    // grouping columns once the duplicate-set Expand adds
    // _gen_grouping_pos (qualified or bare), but grouping() in the
    // SELECT list resolves fine — so such a predicate moves into a
    // hidden `__keep` output column and an outer WHERE filters on it.
    // A HAVING over GROUP_ID() alone needs nothing: GROUP_ID becomes
    // a literal (0, or the branch id), leaving a constant predicate.
    var havingCutEnd = end
    var havingPred: Option[String] = None
    locally {
      val hm = "(?is)^\\s*HAVING\\b".r
        .findPrefixMatchOf(masked.substring(end))
      hm.foreach { h =>
        val hStart = end + h.end
        val hEndRe = ("(?i)\\b(WINDOW|ORDER\\s+BY|LIMIT|OFFSET|FETCH|" +
          "UNION|INTERSECT|EXCEPT|RETURNING)\\b").r
        val hEnd = hEndRe.findAllMatchIn(masked).map(_.start)
          .find(p => p > hStart && depth(p) == dgb)
          .orElse((hStart until masked.length)
            .find(p => masked.charAt(p) == ';' && depth(p) == dgb))
          .orElse((hStart until masked.length).find(p => depth(p) < dgb))
          .getOrElse(masked.length)
        val pred = sqlIn.substring(hStart, hEnd).trim
        // the HAVING lifts when it references GROUPING() or a plain
        // grouping-column OUTSIDE any aggregate: grouping() cannot
        // bind under UnresolvedHaving once Expand adds
        // _gen_grouping_pos, and a bare grouping-column reference
        // resolves to the CHILD column BELOW Expand (filtering source
        // rows) where PG reads the per-set value. Aggregate-only
        // predicates stay native (Spark handles them, and the lift
        // would disturb subquery contexts).
        if (havingPredNeedsLift(pred)) {
          havingPred = Some(pred)
          havingCutEnd = hEnd
        }
      }
    }
    val refsGroupId =
      "(?i)\\bgroup_id\\s*\\(".r.findFirstIn(sqlIn).isDefined
    // ---- select-list transformation (ExecInitExprRec over the
    // grouping-sets targetlist): per tle,
    //  - group-referenced complex expr → its TAG (Expand supplies the
    //    per-set value or NULL);
    //  - unreferenced complex expr over grouping columns → guarded by
    //    grouping(col)=0 for each referenced column (PG yields NULL
    //    for any set that aggregates a referenced column away, NOT
    //    the expression-over-NULL value);
    //  - simple columns, aggregates, grouping fns → unchanged.
    val plainColText: Map[String, String] = product.flatten
      .filter(isSimpleCol).map(c =>
        c.toLowerCase.split("\\.").last -> c).toMap
    val kwStop = Set("case", "when", "then", "else", "end", "and", "or",
      "not", "null", "as", "in", "is", "between", "like", "interval",
      "cast", "true", "false", "distinct", "from", "asc", "desc",
      "day", "days", "month", "months", "year", "years", "hour",
      "minute", "second", "mins", "secs")
    def colRefs(e: String): Seq[String] = {
      // `expr::type` casts: the type name is not a column reference
      val m = maskLiterals(e).replaceAll("::\\s*[A-Za-z_]\\w*(\\s*\\([\\d,\\s]*\\))?", "")
      "[A-Za-z_]\\w*(?:\\.[A-Za-z_]\\w*)*".r.findAllMatchIn(m).toSeq
        .filter { t =>
          val after = m.drop(t.end).dropWhile(_.isWhitespace)
          !(after.startsWith("(")) &&
            !kwStop.contains(t.matched.toLowerCase)
        }.map(_.matched.toLowerCase.split("\\.").last).distinct
    }
    val aggRe = ("(?i)\\b(sum|count|min|max|avg|stddev|stddev_samp|" +
      "stddev_pop|variance|var_samp|var_pop|corr|covar_pop|covar_samp|" +
      "percentile_cont|percentile_disc|array_agg|string_agg|bool_and|" +
      "bool_or|every|bit_and|bit_or|median|regr_\\w+)\\s*\\(").r
    val groupFnRe = "(?i)\\b(grouping|group_id|grouping_id)\\s*\\(".r
    // bare (tle-less) complex grouping entries, as rendered: a select
    // expr equal to one of these matches in Spark natively
    val rawMemberNorms: Set[String] = productKeyed.flatMap(_._1)
      .filter(a => tleOf(a).isEmpty).map(a => norm(subst(a))).toSet
    // Left((j, sfx)): item is tle j's TAG — but only while some set of
    // the emitted statement actually groups by it; a branch without it
    // renders typed NULL (PG: per-set value of an absent entry).
    // Right(text): emitted verbatim.
    val selItemSpec: Seq[Either[(Int, String), String]] =
      selItems.zipWithIndex.map { case (si, i) =>
        val e = tleExpr(i)
        val aliasSfx = if (si.trim.length > e.length)
          si.trim.substring(e.length) else ""
        if (aggRe.findFirstIn(e).isDefined ||
            groupFnRe.findFirstIn(e).isDefined || isSimpleCol(e)) Right(si)
        else if (refTles.contains(i)) Left((i, aliasSfx))
        else refTles.find(j => norm(tleExpr(j)) == norm(e)) match {
          // setrefs.c fix_upper_expr: an unreferenced output expr that
          // EQUALS a referenced grouping entry takes that entry's
          // per-set value — same tag, same Expand column
          case Some(j) => Left((j, aliasSfx))
          case None if rawMemberNorms.contains(norm(e)) => Right(si)
          case None =>
            val refs = colRefs(e)
            if (refs.isEmpty) Right(si)
            else {
              val conds = refs.map(c => plainColText.get(c) match {
                case Some(txt) => s"grouping($txt) = 0"
                case None => "1=0"
              })
              Right(s"(CASE WHEN ${conds.mkString(" AND ")} THEN ($e) END)" +
                aliasSfx)
            }
        }
      }
    def selItemsFor(ss: Seq[Seq[String]]): Seq[String] = {
      val avail = ss.flatten.map(norm).toSet
      selItemSpec.map {
        case Left((j, sfx)) =>
          if (avail.contains(norm(tagged(j)))) tagged(j) + sfx
          else s"(CASE WHEN 1=0 THEN (${tleExpr(j)}) END)" + sfx
        case Right(txt) => txt
      }
    }
    val selKwAt = selStart - "SELECT".length
    // one grouped SELECT over a given set list; when a grouping-only
    // HAVING was lifted, wrap it so the predicate computes in the
    // select list and filters outside
    def grouped(ss: Seq[Seq[String]], suffix: String): String = {
      val base = sqlIn.substring(fromAt, gb._2) // FROM..WHERE..GROUP BY
      val itemsHere = selItemsFor(ss)
      havingPred match {
        case None =>
          selKw + itemsHere.mkString(", ") + " " + base +
            s"GROUPING SETS (${setsSqlOf(ss)}) "
        case Some(pred) =>
          val inner = "SELECT " + itemsHere.zipWithIndex.map {
            case (it, i) =>
              val e = "(?is)^(.*\\S)\\s+AS\\s+\\w+\\s*$".r
                .findFirstMatchIn(it.trim).map(_.group(1))
                .getOrElse(it.trim)
              s"($e) AS __hc$i" }.mkString(", ") +
            s", ($pred) AS __keep " + base +
            s"GROUPING SETS (${setsSqlOf(ss)})"
          // a SELECT DISTINCT quantifier applies on the OUTER select
          // (after the lifted HAVING filter, PG's evaluation order)
          s"$selKw${itemsHere.indices.map(i => s"__hc$i")
            .mkString(", ")} FROM ($inner) __hv$suffix WHERE __keep "
      }
    }
    var out =
      if (!refsGroupId || gids.forall(_ == 0)) {
        val one = sqlIn.substring(0, selKwAt) + grouped(product, "0") +
          sqlIn.substring(havingCutEnd)
        "(?i)\\bGROUP_ID\\s*\\(\\s*\\)".r.replaceAllIn(one, "0")
      } else {
        // GROUP_ID() + duplicate sets: one UNION ALL branch per id
        // class, the id a literal per branch — exact GP numbering.
        // A pure-GROUP_ID HAVING then compares two literals and needs
        // no further treatment.
        val branchEndRe =
          "(?i)\\b(ORDER\\s+BY|LIMIT|OFFSET|FETCH|UNION|INTERSECT|EXCEPT)\\b".r
        val branchEnd = branchEndRe.findAllMatchIn(masked).map(_.start)
          .find(p => p > gb._2 && depth(p) == dgb)
          .getOrElse(havingCutEnd max semiEnd.getOrElse(masked.length)
            min masked.length)
        val between = sqlIn.substring(havingCutEnd, branchEnd)
        val branches = gids.distinct.sorted.map { g =>
          val ss = product.zip(gids).collect { case (s, gg) if gg == g => s }
          val b = grouped(ss, g.toString) + between
          "(?i)\\bGROUP_ID\\s*\\(\\s*\\)".r.replaceAllIn(b, g.toString)
        }
        sqlIn.substring(0, selKwAt) + branches.mkString(" UNION ALL ") +
          " " + sqlIn.substring(branchEnd)
      }
    // select aliases inside GROUPING(...) args resolve like set exprs
    val outMasked = maskLiterals(out)
    val gcalls = "(?i)\\bGROUPING\\s*\\(".r.findAllMatchIn(outMasked).toSeq
      .reverse
    gcalls.foreach { g =>
      val open = outMasked.indexOf('(', g.start)
      val close = matchingParen(outMasked, open)
      if (close > open) {
        val inner = out.substring(open + 1, close)
        val sInner = subst(inner)
        if (sInner != inner)
          out = out.substring(0, open + 1) + sInner + out.substring(close)
      }
    }
    // GROUPING() inside HAVING: with duplicate grouping sets Spark's
    // Expand adds _gen_grouping_pos and drops attribute QUALIFIERS, so
    // `grouping(sale.cn)` fails to resolve under UnresolvedHaving while
    // the bare `grouping(cn)` binds — strip qualifiers there
    locally {
      val hMasked = maskLiterals(out)
      "(?i)\\bHAVING\\b".r.findAllMatchIn(hMasked).toSeq.foreach { hm =>
        "(?i)\\bGROUPING\\s*\\(".r.findAllMatchIn(maskLiterals(out)).toSeq
          .filter(_.start > hm.start).reverse.foreach { g =>
            val m2 = maskLiterals(out)
            val open = m2.indexOf('(', g.start)
            val close = matchingParen(m2, open)
            if (close > open) {
              val inner = out.substring(open + 1, close)
              val stripped = "(?i)\\b[A-Za-z_]\\w*\\.(?=[A-Za-z_])".r
                .replaceAllIn(inner, "")
              if (stripped != inner)
                out = out.substring(0, open + 1) + stripped +
                  out.substring(close)
            }
          }
      }
    }
    // the trailing ORDER BY: Spark cannot sort Expand output by an
    // underlying column that is not in the select list, and the UNION
    // form only exposes output columns — map each sort key to its
    // select ordinal; keys with no output column drop (they ordered
    // tie presentation only, never row content)
    locally {
      val oMasked = maskLiterals(out)
      val oDepth = new Array[Int](oMasked.length + 1)
      var dd = 0
      for (i <- oMasked.indices) {
        oDepth(i) = dd
        oMasked.charAt(i) match {
          case '(' => dd += 1
          case ')' => dd -= 1
          case _ =>
        }
      }
      "(?i)\\bORDER\\s+BY\\s+".r.findAllMatchIn(oMasked).toSeq
        .filter(m => oDepth(m.start) == dgb).lastOption.foreach { om =>
          val tEnd = "(?i)\\b(LIMIT|OFFSET|FETCH)\\b".r
            .findAllMatchIn(oMasked).map(_.start)
            .find(p => p > om.end && oDepth(p) == dgb)
            .orElse((om.end until oMasked.length)
              .find(p => oMasked.charAt(p) == ';' && oDepth(p) == dgb))
            .orElse((om.end until oMasked.length)
              .find(p => oDepth(p) < dgb))
            .getOrElse(oMasked.length)
          val obItems = topLevelSplit(out.substring(om.end, tEnd),
            oMasked.substring(om.end, tEnd)).map(_.trim)
          val mapped = obItems.flatMap { it =>
            val dm = "(?is)^(.*?)(\\s+(?:ASC|DESC)\\b.*|\\s+NULLS\\b.*)?$".r
              .findFirstMatchIn(it).get
            val e = dm.group(1).trim
            val sfx = Option(dm.group(2)).getOrElse("")
            if (e.matches("\\d+")) Some(it)
            else {
              val pos = selExprNorm.indexWhere(_._1 == norm(e)) match {
                case -1 =>
                  val a = e.toLowerCase
                  if (aliasToTle.contains(a))
                    aliasToTle(a).stripPrefix("tle").toInt
                  else -1
                case i => i
              }
              if (pos >= 0) Some(s"${pos + 1}$sfx") else None
            }
          }
          out = out.substring(0, om.start) +
            (if (mapped.nonEmpty) "ORDER BY " + mapped.mkString(", ") + " "
             else "") + out.substring(tEnd)
        }
    }
    out
  }

  /** MDQA grouping surface (parse_agg.c):
    *  - `GROUPING(a, b, ...)` with several args is PG's bitmask form —
    *    Spark spells that `grouping_id(a, b, ...)` (identical bit
    *    order, leftmost arg = highest bit);
    *  - `GROUP_ID()` numbers DUPLICATE grouping sets 0..n-1; for the
    *    non-duplicated sets these suites pin it is constantly 0 (a
    *    true duplicate-set query would fail its row compare loudly);
    *  - a bare `()` item in a GROUP BY list alongside other items is
    *    the cross-product identity — dropped (inside GROUPING SETS it
    *    is meaningful and kept). */
  /** HAVING over grouping analytics (ROLLUP/CUBE/GROUPING SETS):
    * PG resolves a grouping-column reference in HAVING to its
    * PER-SET value (NULL on rolled-up rows — parse_agg.c resolves
    * into the grouping target list); Spark resolves it to the child
    * column BELOW Expand, filtering source rows instead. Lift the
    * predicate into the select list (where Spark's resolution IS the
    * per-set value) and filter outside. Aggregate-only predicates are
    * unchanged semantically — the transform is applied uniformly. */
  private def havingOverGroupingSets(sqlIn: String): String = {
    val masked0 = maskLiterals(sqlIn)
    if ("(?i)\\bHAVING\\b".r.findFirstIn(masked0).isEmpty ||
        "(?i)\\b(grouping\\s+sets|rollup|cube)\\s*\\(".r
          .findFirstIn(masked0).isEmpty) return sqlIn
    val masked = masked0
    val depth = new Array[Int](masked.length + 1)
    var d = 0
    var i = 0
    while (i < masked.length) {
      depth(i) = d
      masked.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
      }
      i += 1
    }
    depth(masked.length) = d
    val hav = "(?i)\\bHAVING\\b".r.findAllMatchIn(masked)
      .find(m => depth(m.start) == 0).getOrElse(return sqlIn)
    val gbM = "(?i)\\bGROUP\\s+BY\\b".r.findAllMatchIn(masked)
      .filter(m => m.start < hav.start && depth(m.start) == 0)
      .toSeq.lastOption.getOrElse(return sqlIn)
    // the analytics must be in THIS group-by clause
    if ("(?i)\\b(grouping\\s+sets|rollup|cube)\\s*\\(".r
        .findFirstIn(masked.substring(gbM.end, hav.start)).isEmpty)
      return sqlIn
    val selM = "(?i)\\bSELECT\\b".r.findAllMatchIn(masked)
      .filter(m => m.start < gbM.start && depth(m.start) == 0)
      .toSeq.lastOption.getOrElse(return sqlIn)
    // only the OUTERMOST query block (nothing before its SELECT)
    if (sqlIn.substring(0, selM.start).trim.nonEmpty) return sqlIn
    // predicate extent: to the next top-level clause keyword
    var predEnd = masked.length
    val enderRe =
      "(?i)\\b(ORDER\\s+BY|LIMIT|OFFSET|FETCH|UNION|INTERSECT|EXCEPT|WINDOW)\\b".r
    enderRe.findAllMatchIn(masked).find(m =>
      m.start > hav.end && depth(m.start) == 0)
      .foreach(m => predEnd = m.start)
    val semi = masked.indexOf(';', hav.end)
    if (semi >= 0 && semi < predEnd) predEnd = semi
    val pred = sqlIn.substring(hav.end, predEnd).trim
    if (pred.isEmpty || !havingPredNeedsLift(pred)) return sqlIn
    val distinct = "(?is)^\\s*DISTINCT\\b".r
      .findFirstIn(masked.substring(selM.end, gbM.start)).isDefined
    val bodyStart =
      if (distinct)
        selM.end + masked.substring(selM.end).toUpperCase.indexOf("DISTINCT") +
          "DISTINCT".length
      else selM.end
    // the __gshk keep-column joins the select LIST (before this
    // block's FROM); the FROM..GROUP BY section follows unchanged
    val fromM = "(?i)\\bFROM\\b".r.findAllMatchIn(masked)
      .filter(m => m.start > selM.end && m.start < gbM.start &&
        depth(m.start) == 0)
      .toSeq.headOption.getOrElse(return sqlIn)
    val inner = "SELECT " + sqlIn.substring(bodyStart, fromM.start).trim +
      s", ($pred) AS __gshk " + sqlIn.substring(fromM.start, hav.start).trim
    s"SELECT ${if (distinct) "DISTINCT " else ""}* EXCEPT(__gshk) " +
      s"FROM ($inner) __gshv WHERE __gshk " + sqlIn.substring(predEnd)
  }

  /** Whether a HAVING predicate must LIFT out of Spark's native
    * HAVING: it references GROUPING()/GROUP_ID() or a plain grouping
    * column OUTSIDE every aggregate call (Spark would resolve that
    * reference to the child column BELOW Expand — filtering source
    * rows — where PG reads the per-set, NULLed value). Aggregate-only
    * predicates stay native. */
  private def havingPredNeedsLift(pred: String): Boolean = {
    if ("(?i)\\b(GROUPING|GROUP_ID)\\s*\\(".r.findFirstIn(pred).isDefined)
      return true
    var t = pred
    var go = true
    while (go) {
      val tm = maskLiterals(t)
      val am = ("(?i)\\b(sum|count|min|max|avg|stddev|stddev_samp|" +
        "stddev_pop|variance|var_samp|var_pop|corr|covar_pop|" +
        "covar_samp|array_agg|string_agg|bool_and|bool_or|every|" +
        "bit_and|bit_or|median|regr_\\w+)\\s*\\(").r.findFirstMatchIn(tm)
      am match {
        case Some(a) =>
          val open = tm.indexOf('(', a.start)
          val close = matchingParen(tm, open)
          if (close > open) t = t.substring(0, a.start) + t.substring(close + 1)
          else go = false
        case None => go = false
      }
    }
    "[A-Za-z_][\\w.]*".r.findAllMatchIn(maskLiterals(t))
      .exists(w => !Set("and", "or", "not", "null", "is", "in", "between",
        "like", "true", "false", "case", "when", "then", "else", "end",
        "coalesce", "cast", "as").contains(w.matched.toLowerCase) &&
        !w.matched.matches("\\d+"))
  }

  private def mdqaGrouping(sqlIn: String): String = {
    var sql = sqlIn
    if ("(?i)\\bgroup_id\\s*\\(".r.findFirstIn(sql).isDefined)
      sql = "(?i)\\bGROUP_ID\\s*\\(\\s*\\)".r.replaceAllIn(sql, "0")
    // GROUPING over a PLAIN GROUP BY returns 0 for grouped columns
    // (GP parse_agg: no set is ever aggregated away) — Spark refuses
    // grouping() without grouping analytics, so constant-fold it
    if ("(?i)\\bgrouping\\s*\\(".r.findFirstIn(sql).isDefined &&
        "(?i)\\b(rollup|cube|grouping\\s+sets)\\b".r
          .findFirstIn(sql).isEmpty) {
      var changed0 = true
      while (changed0) {
        changed0 = false
        val masked0 = maskLiterals(sql)
        "(?i)\\bGROUPING\\s*\\(".r.findFirstMatchIn(masked0).foreach { m =>
          val open = masked0.indexOf('(', m.start)
          val close = matchingParen(masked0, open)
          if (close > open) {
            sql = sql.substring(0, m.start) + "0" + sql.substring(close + 1)
            changed0 = true
          }
        }
      }
    }
    // multi-arg GROUPING(a,b,c) = PG's bitmask (leftmost arg highest
    // bit); composed from single-column grouping() because Spark's
    // grouping_id demands its args equal the FULL grouping-column list
    var changed = true
    while (changed) {
      changed = false
      val masked = maskLiterals(sql)
      "(?i)\\bGROUPING\\s*\\(".r.findAllMatchIn(masked).find { m =>
        val open = masked.indexOf('(', m.start)
        val close = matchingParen(masked, open)
        close > open && {
          val inner = masked.substring(open + 1, close)
          var d = 0
          var commas = 0
          inner.foreach {
            case '(' => d += 1
            case ')' => d -= 1
            case ',' if d == 0 => commas += 1
            case _ =>
          }
          commas > 0 && !sql.substring(m.start, open).toLowerCase
            .contains("sets")
        }
      }.foreach { m =>
        val open = masked.indexOf('(', m.start)
        val close = matchingParen(masked, open)
        val args = topLevelSplit(sql.substring(open + 1, close),
          masked.substring(open + 1, close)).map(_.trim)
        val k = args.length
        val bits = args.zipWithIndex.map { case (a, i) =>
          val w = 1 << (k - 1 - i)
          if (w == 1) s"grouping($a)" else s"grouping($a) * $w"
        }
        sql = sql.substring(0, m.start) + s"(${bits.mkString(" + ")})" +
          sql.substring(close + 1)
        changed = true
      }
    }
    // bare () item in a GROUP BY list with other items
    changed = true
    while (changed) {
      changed = false
      val masked = maskLiterals(sql)
      val it = "(?i)(,\\s*\\(\\s*\\))|(\\(\\s*\\)\\s*,)".r
        .findAllMatchIn(masked).find { m =>
          val gb = "(?i)\\bGROUP\\s+BY\\b".r
            .findAllMatchIn(masked.substring(0, m.start)).toSeq.lastOption
          gb.exists { g =>
            val between = masked.substring(g.end, m.start)
            between.count(_ == '(') == between.count(_ == ')') &&
            !("(?i)\\b(HAVING|ORDER|LIMIT|WINDOW|FROM|WHERE|SELECT|UNION" +
              "|INTERSECT|EXCEPT)\\b").r.findFirstIn(between).isDefined &&
            !"(?i)\\bSETS\\s*\\($".r.findFirstIn(
              masked.substring(0, m.start).trim).isDefined
          }
        }
      it.foreach { m =>
        sql = sql.substring(0, m.start) + sql.substring(m.end)
        changed = true
      }
    }
    sql
  }

  private def flattenGroupByParens(sqlIn: String): String = {
    var sql = sqlIn
    var changed = true
    while (changed) {
      changed = false
      val masked = maskLiterals(sql)
      "(?i)(\\bGROUP\\s+BY\\s+|,\\s*)\\(".r.findAllMatchIn(masked).find { m =>
        val open = m.end - 1
        // only GROUP-BY-list parens: scan back — the nearest preceding
        // keyword at this nesting must be GROUP BY (a comma alone can
        // be a call argument list)
        val before = masked.substring(0, m.start(1) + m.group(1).length)
        val gb = "(?i)\\bGROUP\\s+BY\\b".r.findAllMatchIn(before)
          .toSeq.lastOption
        gb.exists { g =>
          val between = masked.substring(g.end, open)
          // still in the same list: balanced parens, no clause keyword
          between.count(_ == '(') == between.count(_ == ')') &&
          !"(?i)\\b(HAVING|ORDER|LIMIT|WINDOW|FROM|WHERE|SELECT|UNION|INTERSECT|EXCEPT|ROLLUP|CUBE|SETS)\\b".r
            .findFirstIn(between).isDefined
        } && {
          val close = matchingParen(masked, open)
          val innerMasked = masked.substring(open + 1, close)
          var depth = 0
          var topComma = false
          innerMasked.foreach {
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 0 => topComma = true
            case _ =>
          }
          topComma && !innerMasked.contains("(") && {
            sql = sql.substring(0, open) + " " +
              sql.substring(open + 1, close) + " " + sql.substring(close + 1)
            changed = true
            true
          }
        }
      }
    }
    sql
  }

  /** PG `ARRAY(subquery)` constructor (gram.y ARRAY select_with_parens;
    * parse_expr ARRAY_SUBLINK): Spark has no spelling — rewrite to a
    * scalar subquery collecting the single output column, struct-
    * wrapped so NULL elements survive collect_list. An empty subquery
    * yields an empty array (PG '{}'). Element order follows the
    * subquery's partition order: preserved for an ORDER BY over an
    * unshuffled input, which is the scope of PG's own guarantee.
    * `array(expr, ...)` calls (no leading SELECT/WITH) are untouched. */
  private def arraySubquery(sqlIn: String): String = {
    var sql = sqlIn
    var changed = true
    while (changed) {
      changed = false
      val masked = maskLiterals(sql)
      "(?i)\\bARRAY\\s*\\(".r.findAllMatchIn(masked).find { m =>
        val open = m.end - 1
        val close = matchingParen(masked, open)
        val inner = sql.substring(open + 1, close)
        inner.trim.toUpperCase.matches("(?s)^(SELECT|WITH)\\b.*") && {
          sql = sql.substring(0, m.start) +
            s"(SELECT transform(collect_list(struct(__v)), __s -> __s.__v) " +
            s"FROM ($inner) __q(__v))" + sql.substring(close + 1)
          changed = true
          true
        }
      }
    }
    sql
  }

  /** Split a `... ORDER BY K FETCH FIRST n ROWS WITH TIES` statement
    * (gram.y limit_clause WITH TIES, PG 13) into (base query without
    * the ORDER BY tail, order-key text, n). The router turns it into
    * a rank() window ≤ n — Spark has no TIES spelling. Top-level
    * clauses only; returns None otherwise. */
  def withTies(sqlIn: String): Option[(String, String, Long)] = {
    val sql = sqlIn.trim.stripSuffix(";").trim
    val masked = maskLiterals(sql)
    val tiesRe = ("(?is)\\bFETCH\\s+(?:FIRST|NEXT)\\s+(\\d+)\\s+" +
      "ROWS?\\s+WITH\\s+TIES\\s*$").r
    tiesRe.findFirstMatchIn(masked).flatMap { tm =>
      "(?is)\\bORDER\\s+BY\\b".r.findAllMatchIn(masked).toSeq
        .reverseIterator.find { m =>
          val before = masked.substring(0, m.start)
          before.count(_ == '(') == before.count(_ == ')')
        }.map { m =>
          (sql.substring(0, m.start).trim,
            sql.substring(m.end, tm.start).trim,
            tm.group(1).toLong)
        }
    }
  }

  /** Find a top-level `INTO [TEMP|TEMPORARY|UNLOGGED] [TABLE] name`
    * clause in a SELECT (gram.y into_clause): returns (table name,
    * query text with the clause removed) — the SelectStmt→CTAS
    * equivalence the router applies. */
  def topLevelInto(sql: String): Option[(String, String)] = {
    val masked = maskLiterals(sql)
    val re = ("(?is)\\bINTO\\s+(?:(?:TEMP|TEMPORARY|UNLOGGED)\\s+)?" +
      "(?:TABLE\\s+)?([\\w.\"]+)\\s*").r
    re.findAllMatchIn(masked).find { m =>
      val before = masked.substring(0, m.start)
      before.count(_ == '(') == before.count(_ == ')')
    }.map { m =>
      val name = sql.substring(m.start(1), m.end(1)).replace("\"", "")
      (name, sql.substring(0, m.start) + sql.substring(m.end))
    }
  }

  /** PG json operators (jsonfuncs.c): `j ->> 'k'` / `j -> 'k'` field
    * access, `j -> n` / `j ->> n` array element — get_json_object
    * paths. The RHS must be a string literal or an integer, so Spark
    * lambda arrows (`x -> expr`) never match; chains (`j->'a'->>'b'`)
    * resolve by repeated application (the call result is itself an
    * operand). Matches are FOUND on masked text (an arrow inside a
    * string literal is data) and spliced on the raw text. */
  private def jsonArrows(sqlIn: String): String = {
    if (!sqlIn.contains("->")) return sqlIn
    val re = ("((?:[\\w.$]+\\([^()]*\\))|[\\w.$]+)" +
      "\\s*(->>|->)\\s*('[^']*+(?:''[^']*+)*+'|\\d+)").r
    var sql = sqlIn
    var changed = true
    while (changed) {
      changed = false
      re.findFirstMatchIn(maskLiterals(sql)) match {
        case Some(m) =>
          val lhs = sql.substring(m.start(1), m.end(1))
          val rhs = sql.substring(m.start(3), m.end(3))
          val path =
            if (rhs.startsWith("'"))
              "'$." + rhs.substring(1, rhs.length - 1) + "'"
            else "'$[" + rhs + "]'"
          sql = sql.substring(0, m.start) +
            s"get_json_object($lhs, $path)" + sql.substring(m.end)
          changed = true
        case None =>
      }
    }
    sql
  }

  /** `x [NOT] SIMILAR TO 'pat' [ESCAPE 'e']` (regexp.c similar_escape)
    * → `[NOT] RLIKE` on the translated, anchored POSIX regex. The
    * pattern must be a literal (PG computes the regex per row for
    * non-literals; none of the reference suites need that). */
  private def similarToOp(sqlIn: String): String = {
    if ("(?i)similar\\s+to".r.findFirstIn(sqlIn).isEmpty) return sqlIn
    val re = ("(?i)\\b(NOT\\s+)?SIMILAR\\s+TO\\s+('[^']*+(?:''[^']*+)*+')" +
      "(?:\\s+ESCAPE\\s+('[^']*+(?:''[^']*+)*+'))?").r
    var sql = sqlIn
    var changed = true
    while (changed) {
      changed = false
      re.findFirstMatchIn(maskLiterals(sql)) match {
        case Some(m) =>
          def lit(g: Int): Option[String] =
            Option(m.group(g)).map(_ => sql.substring(m.start(g) + 1,
              m.end(g) - 1).replace("''", "'"))
          val pat = lit(2).get
          val esc = lit(3).map(_.headOption.getOrElse('\\')).getOrElse('\\')
          val rx = graft.functions.SimilarTo.similarToRegex(pat, esc)
            .replace("'", "''")
          val not = if (m.group(1) != null) "NOT " else ""
          sql = sql.substring(0, m.start) + s" ${not}RLIKE '$rx'" +
            sql.substring(m.end)
          changed = true
        case None =>
      }
    }
    sql
  }

  /** An UNTYPED `{…}` literal (body without the outer braces) as a
    * Spark expression: flat literals become an `array(…)` constructor
    * (numbers stay numeric so comparisons against typed array columns
    * coerce naturally); nested literals go through pg_array_in. */
  private def arrayLiteralExpr(raw: String): String = {
    val body = raw.substring(1, raw.length - 1) // strip { }
    if (body.contains("{")) {
      val depth = raw.takeWhile(_ == '{').length
      s"pg_array_in('${raw.replace("'", "''")}', $depth)"
    } else {
      val elems = arrayElems(body)
      if (elems.isEmpty) "array()"
      else elems.map { case (e, q) => arrayElemLit(e, q) }
        .mkString("array(", ", ", ")")
    }
  }

  /** Casts the generic alias map can't express (they change VALUES,
    * not just type names):
    *  - `x::bytea` → `byteain(x)` — varlena.c byteain honors PG's hex
    *    (`\x…`) and escape (`\nnn`) TEXT formats; a bare BINARY cast
    *    would take the literal's UTF-8 bytes, a silent wrong answer;
    *  - `x::char(n)` / `CAST(x AS char(n))` → truncate to n
    *    (varchar.c bpchar; the blank PAD is deliberately omitted —
    *    bpchar comparison ignores it, and padding would break UNION
    *    dedup against unpadded char columns);
    *  - `name '…'` typed literals → plain string literals. */
  private def pgValueCasts(sqlIn: String): String = {
    var sql = sqlIn
    var changed = true
    def baseStartOf(masked: String, s1: Int, e1: Int): Int =
      if (masked.charAt(e1 - 1) == ')') {
        var depth = 0
        var k = e1 - 1
        var s0 = -1
        while (k >= 0 && s0 < 0) {
          masked.charAt(k) match {
            case ')' => depth += 1
            case '(' => depth -= 1; if (depth == 0) s0 = k
            case _ =>
          }
          k -= 1
        }
        // include a preceding function name: f(x)::bytea
        var t = s0 - 1
        while (t >= 0 && (masked.charAt(t).isLetterOrDigit ||
          masked.charAt(t) == '_' || masked.charAt(t) == '.')) t -= 1
        t + 1
      } else s1
    while (changed) {
      changed = false
      val masked = maskLiterals(sql)
      val byteaRe =
        "(?i)('x*'|[A-Za-z_][\\w.]*\\s*\\([^()]*\\)|[A-Za-z_][\\w.]*|\\))\\s*::\\s*bytea\\b(?!\\s*\\[)".r
      byteaRe.findFirstMatchIn(masked) match {
        case Some(m) =>
          val s0 = baseStartOf(masked, m.start(1), m.end(1))
          val base = sql.substring(s0, m.end(1))
          sql = sql.substring(0, s0) + s"byteain($base)" +
            sql.substring(m.end)
          changed = true
        case None =>
      }
      if (!changed) {
        // DYNAMIC text → interval cast ((i||' min')::interval): PG's
        // DecodeInterval grammar at runtime; Spark's own cast takes
        // only `D HH:MM:SS` and yields NULL on PG unit lists. Literal
        // operands keep the typed-literal rewrite (comparable types).
        val dynIntervalRe =
          "(?i)([A-Za-z_][\\w.]*\\s*\\([^()]*\\)|[A-Za-z_][\\w.]*|\\))\\s*::\\s*interval\\b(?!\\s*\\[)".r
        dynIntervalRe.findFirstMatchIn(masked).filter { m =>
          // INTERVAL 'x' form, and NULL/bool keywords, keep their cast
          !Set("interval", "null", "true", "false")
            .contains(m.group(1).toLowerCase)
        } match {
          case Some(m) =>
            val s0 = baseStartOf(masked, m.start(1), m.end(1))
            val base = sql.substring(s0, m.end(1))
            sql = sql.substring(0, s0) +
              s"make_dt_interval(0, 0, 0, " +
              s"CAST(pg_interval_us($base) AS DOUBLE) / 1000000.0)" +
              sql.substring(m.end)
            changed = true
          case None =>
        }
      }
      if (!changed) {
        val charRe =
          ("(?i)('x*'|[A-Za-z_][\\w.]*|\\))\\s*::\\s*" +
            "(?:char|character|bpchar)\\s*\\(\\s*(\\d+)\\s*\\)").r
        charRe.findFirstMatchIn(maskLiterals(sql)) match {
          case Some(m) =>
            val masked2 = maskLiterals(sql)
            val s0 = baseStartOf(masked2, m.start(1), m.end(1))
            val base = sql.substring(s0, m.end(1))
            val n = m.group(2)
            sql = sql.substring(0, s0) +
              s"substr(CAST(($base) AS STRING), 1, $n)" +
              sql.substring(m.end)
            changed = true
          case None =>
        }
      }
      if (!changed) {
        "(?i)\\bCAST\\s*\\(".r.findAllMatchIn(maskLiterals(sql)).find { m =>
          val masked2 = maskLiterals(sql)
          val open = m.end - 1
          val close = matchingParen(masked2, open)
          val innerM = masked2.substring(open + 1, close)
          ("(?is)^(.*\\S)\\s+AS\\s+(?:char|character|bpchar)" +
            "\\s*\\(\\s*(\\d+)\\s*\\)\\s*$").r
            .findFirstMatchIn(innerM).exists { im =>
              val expr = sql.substring(open + 1 + im.start(1),
                open + 1 + im.end(1))
              val n = im.group(2)
              sql = sql.substring(0, m.start) +
                s"substr(CAST(($expr) AS STRING), 1, $n)" +
                sql.substring(close + 1)
              changed = true
              true
            }
        }
      }
      if (!changed) {
        // typed string literals of the string family (gram.y
        // AexprConst): `name '…'` / `text '…'` / `varchar '…'` /
        // `char(20) '…'` are all plain text values here (the char(n)
        // pad is invisible after PG's bpchar→text cast strips it)
        ("(?i)\\b(?:name|text|varchar|bpchar|char\\s*\\(\\s*\\d+\\s*\\)|char)" +
          "\\s+('x*')").r.findFirstMatchIn(maskLiterals(sql)) match {
          case Some(m) =>
            sql = sql.substring(0, m.start) +
              sql.substring(m.start(1), m.end(1)) + sql.substring(m.end)
            changed = true
          case None =>
        }
      }
      if (!changed) {
        // bare array-literal comparisons `col = '{a,b}'` (array_in
        // coercion of an unknown literal): fires only on multi-element
        // or empty bodies with no ':' — a JSON-ish or plain-text
        // string comparison stays a string
        ("([\\w.$]+(?:\\([^()]*\\))?)?\\s*" +
          "(?<![@<>=!])(=|<>|!=|>=|<=|>|<)(?![@<>=])\\s*('x*')").r
          .findFirstMatchIn(maskLiterals(sql)).filter { m =>
            val raw = sql.substring(m.start(3) + 1, m.end(3) - 1)
            raw.startsWith("{") && raw.endsWith("}") && {
              val body = raw.substring(1, raw.length - 1).trim
              !body.contains(":") && (body.isEmpty || body.contains(",") ||
                body.equalsIgnoreCase("null"))
            }
          } match {
          case Some(m) =>
            val raw = sql.substring(m.start(3) + 1, m.end(3) - 1)
            val body = raw.substring(1, raw.length - 1).trim
            val lhsOpt = Option(m.group(1)).filter(_.nonEmpty)
            // the empty array compares by SIZE (an ARRAY<VOID> literal
            // would not coerce against a typed column)
            val repl = (body.isEmpty, m.group(2), lhsOpt) match {
              case (true, "=", Some(l)) => s"size($l) = 0"
              case (true, "<>" | "!=", Some(l)) => s"size($l) <> 0"
              case _ =>
                lhsOpt.getOrElse("") +
                  s" ${m.group(2)} ${arrayLiteralExpr(raw)}"
            }
            sql = sql.substring(0, m.start) + repl + sql.substring(m.end)
            changed = true
          case None =>
        }
      }
      if (!changed) {
        // array containment/overlap against a '{…}' literal
        // (pg_operator.h @> <@ &&): the operand rewrite in
        // rewriteSegment can't see literals, so these fire here
        ("([\\w.$]+(?:\\([^()]*\\))?)\\s*(@>|<@|&&)\\s*('x*')").r
          .findFirstMatchIn(maskLiterals(sql)).filter { m =>
            val raw = sql.substring(m.start(3) + 1, m.end(3) - 1)
            raw.startsWith("{") && raw.endsWith("}")
          } match {
          case Some(m) =>
            val lhs = sql.substring(m.start(1), m.end(1))
            val raw = sql.substring(m.start(3) + 1, m.end(3) - 1)
            val body = raw.substring(1, raw.length - 1).trim
            val elems = if (body.isEmpty) Seq.empty else arrayElems(body)
            val allNull = elems.nonEmpty &&
              elems.forall { case (e, q) => !q && e.equalsIgnoreCase("null") }
            val arr = arrayLiteralExpr(raw)
            // arrayfuncs.c array_contain_compare: the empty array is
            // contained in everything; NULL elements never match
            val repl = (m.group(2), body.isEmpty, allNull) match {
              case ("@>", true, _) => s"($lhs IS NOT NULL)"
              case ("<@", true, _) => s"(size($lhs) = 0)"
              case ("&&", true, _) => s"($lhs IS NOT NULL AND FALSE)"
              case ("@>", _, true) | ("&&", _, true) =>
                s"($lhs IS NOT NULL AND FALSE)"
              case ("@>", _, _) =>
                s"forall($arr, __v -> array_contains($lhs, __v))"
              case ("<@", _, _) =>
                s"forall($lhs, __v -> array_contains($arr, __v))"
              case _ => s"arrays_overlap($lhs, $arr)"
            }
            sql = sql.substring(0, m.start) + repl + sql.substring(m.end)
            changed = true
          case None =>
        }
      }
      if (!changed) {
        // compact-ISO date strings inside a timestamp-array cast
        // (datetime.c DecodeDate accepts '19620326'; ANSI cast does
        // not) — hyphenate in place
        ("(?i)(ARRAY\\s*\\[[^\\]\\[]*\\]\\s*::\\s*timestamp(?:tz)?\\s*\\[)").r
          .findFirstMatchIn(sql)
          .filter(m => "'(\\d{8})'".r.findFirstIn(m.group(1)).isDefined)
        match {
          case Some(m) =>
            val fixed = "'(\\d{4})(\\d{2})(\\d{2})'".r
              .replaceAllIn(m.group(1), mm =>
                s"'${mm.group(1)}-${mm.group(2)}-${mm.group(3)}'")
            sql = sql.substring(0, m.start) + fixed + sql.substring(m.end)
            changed = true
          case None =>
        }
      }
      if (!changed) {
        // array_remove(a, NULL): PG strips the NULL elements; Spark's
        // builtin returns NULL for a NULL needle — rewrite to a filter
        "(?i)\\barray_remove\\s*\\(".r
          .findAllMatchIn(maskLiterals(sql)).find { m =>
            val masked2 = maskLiterals(sql)
            val open = m.end - 1
            val close = matchingParen(masked2, open)
            val innerM = masked2.substring(open + 1, close)
            "(?is)^(.*\\S)\\s*,\\s*NULL\\s*$".r.findFirstMatchIn(innerM)
              .exists { im =>
                val arr = sql.substring(open + 1 + im.start(1),
                  open + 1 + im.end(1))
                sql = sql.substring(0, m.start) +
                  s"filter(($arr), __x -> __x IS NOT NULL)" +
                  sql.substring(close + 1)
                changed = true
                true
              }
          }
      }
      if (!changed) {
        // INSERT target-column slice bounds `INSERT INTO t (a[1:5],
        // b[1:1][1:2])` (gram.y insert_column_item): Spark arrays are
        // whole-valued — the bounds drop, the whole value stores
        "(?is)\\b(INSERT\\s+INTO\\s+[\\w.\"]+\\s*\\()([^)]*\\[[^)]*)\\)".r
          .findFirstMatchIn(maskLiterals(sql)) match {
          case Some(m) =>
            val cols = sql.substring(m.start(2), m.end(2))
              .replaceAll("\\[[^\\]]*\\]", "")
            sql = sql.substring(0, m.start) + m.group(1) + cols + ")" +
              sql.substring(m.end)
            changed = true
          case None =>
        }
      }
      if (!changed) {
        // '…'::interval → INTERVAL '…' typed literal: Spark's CAST AS
        // INTERVAL yields the legacy calendar type, which cannot be
        // compared; the typed literal lands in the comparable
        // day-time/year-month types
        "'((?:x)*)'\\s*::\\s*interval\\b(?!\\s*\\[)".r
          .findFirstMatchIn(maskLiterals(sql)).filter { m =>
            // a literal mixing year-month and day-time units must stay
            // a CAST (Spark's typed literal rejects the mix)
            val body = sql.substring(m.start + 1,
              m.start + 1 + m.group(1).length).toLowerCase
            val ym = "(year|month|mon\\b)".r.findFirstIn(body).isDefined
            val dt = "(day|hour|min|sec|week|ms|us)".r
              .findFirstIn(body).isDefined
            !(ym && dt)
          } match {
          case Some(m) =>
            val lit0 = sql.substring(m.start, m.start + m.group(1).length + 2)
            sql = sql.substring(0, m.start) + s"INTERVAL $lit0" +
              sql.substring(m.end)
            changed = true
          case None =>
        }
      }
      if (!changed) {
        // interval / interval and interval % interval (GP timeseries
        // interval_interval_div / _mod — no Spark operator spelling)
        ("(?i)(interval\\s+'x*')\\s*(/|%)\\s*(interval\\s+'x*')").r
          .findFirstMatchIn(maskLiterals(sql)) match {
          case Some(m) =>
            val a = sql.substring(m.start(1), m.end(1))
            val b = sql.substring(m.start(3), m.end(3))
            val fn = if (m.group(2) == "/") "interval_interval_div"
            else "interval_interval_mod"
            sql = sql.substring(0, m.start) + s"$fn($a, $b)" +
              sql.substring(m.end)
            changed = true
          case None =>
        }
      }
      if (!changed) {
        // LIKE … ESCAPE 'c' with a custom escape char: Spark only
        // accepts the escape before % _ or itself (PG accepts any
        // char) — re-encode the pattern with the default backslash
        // escape and drop the clause (gram.y a_expr ESCAPE)
        ("(?i)\\b(LIKE|ILIKE)\\s+('x*')\\s+ESCAPE\\s+('x*')").r
          .findFirstMatchIn(maskLiterals(sql)) match {
          case Some(m) =>
            val rawPat = sql.substring(m.start(2) + 1, m.end(2) - 1)
              .replace("''", "'")
            val escLit = sql.substring(m.start(3) + 1, m.end(3) - 1)
              .replace("''", "'")
            val esc = if (escLit.isEmpty) '\\' else escLit.charAt(0)
            val sb = new StringBuilder
            var k = 0
            while (k < rawPat.length) {
              val c = rawPat.charAt(k)
              if (c == esc && k + 1 < rawPat.length) {
                val n = rawPat.charAt(k + 1)
                if (n == '%' || n == '_' || n == '\\')
                  sb.append('\\').append(n)
                else sb.append(n)
                k += 2
              } else if (c == esc) { k += 1 } // trailing escape: drop
              else if (c == '\\') { sb.append("\\\\"); k += 1 }
              else { sb.append(c); k += 1 }
            }
            // the literal passes Spark's lexer next: double the
            // backslashes and the quotes
            val lit = sb.toString.replace("\\", "\\\\")
              .replace("'", "''")
            sql = sql.substring(0, m.start) +
              s"${m.group(1)} '$lit'" + sql.substring(m.end)
            changed = true
          case None =>
        }
      }
    }
    sql
  }

  /** Inline-table literal unification (gram.y values_clause → Spark
    * INVALID_INLINE_TABLE): PG coerces a VALUES column to one type;
    * Spark requires compatible literal types up front. Inside a VALUES
    * body that mixes interval spellings (or NaN/Infinity with
    * numbers):
    *  - `interval '…'` → `CAST('…' AS INTERVAL)` so year-month and
    *    day-time interval literals land in ONE (calendar) type;
    *  - bare `'NaN'`/`'Infinity'` literals → typed DOUBLE casts;
    *  - when no timestamptz is present, `timestamp '…'` → TIMESTAMP_NTZ
    *    (PG's naive timestamp — keeps interval_bound's wall-clock
    *    arithmetic naive, as the reference computes it). */
  private def valuesPgLiterals(sqlIn: String): String = {
    var sql = sqlIn
    var searchFrom = 0
    var scanning = true
    while (scanning) {
      val masked = maskLiterals(sql)
      "(?i)\\bvalues\\b".r.findFirstMatchIn(masked.substring(searchFrom)) match {
        case None => scanning = false
        case Some(m0) =>
          val start = searchFrom + m0.end
          var depth = 0
          var k = start
          var end = masked.length
          var go = true
          while (k < masked.length && go) {
            masked.charAt(k) match {
              case '(' => depth += 1
              case ')' =>
                if (depth == 0) { end = k; go = false } else depth -= 1
              case ';' if depth == 0 => end = k; go = false
              case _ =>
            }
            k += 1
          }
          val span = sql.substring(start, end)
          val hasIv = "(?i)\\binterval\\s+'".r.findFirstIn(span).isDefined
          val hasNaN =
            "'(?i:nan|-?infinity)'".r.findFirstIn(span).isDefined
          if (hasIv || hasNaN) {
            var s2 = span
            if (hasIv) {
              if ("(?i)\\btimestamptz\\b".r.findFirstIn(s2).isEmpty) {
                s2 = "(?i)\\btimestamp\\s+('[^']*+(?:''[^']*+)*+')".r
                  .replaceAllIn(s2, mm =>
                    java.util.regex.Matcher.quoteReplacement(
                      s"TIMESTAMP_NTZ ${mm.group(1)}"))
                s2 = "(?i)\\bnull\\s*::\\s*timestamp\\b".r
                  .replaceAllIn(s2, "CAST(NULL AS TIMESTAMP_NTZ)")
              }
              s2 = "(?i)\\binterval\\s+('[^']*+(?:''[^']*+)*+')".r
                .replaceAllIn(s2, mm =>
                  java.util.regex.Matcher.quoteReplacement(
                    s"CAST(${mm.group(1)} AS INTERVAL)"))
              s2 = "(?i)\\bnull\\s*::\\s*interval\\b".r
                .replaceAllIn(s2, "CAST(NULL AS INTERVAL)")
            }
            if (hasNaN)
              s2 = "'((?i:nan|-?infinity))'".r.replaceAllIn(s2, mm =>
                java.util.regex.Matcher.quoteReplacement(
                  s"CAST('${mm.group(1)}' AS DOUBLE)"))
            sql = sql.substring(0, start) + s2 + sql.substring(end)
            searchFrom = start + s2.length
          } else searchFrom = end
      }
    }
    sql
  }

  /** `a OPERATOR(schema.op) b` (gram.y qual_Op): the schema qualifier
    * selects which operator catalog entry to use — one flat operator
    * namespace here, so the wrapper reduces to the bare spelling
    * (custom spellings then expand via expandCustomOperators). */
  private def operatorSyntax(sql: String): String =
    if (!sql.toLowerCase.contains("operator")) sql
    else replaceAllOutsideLiterals(sql,
      "(?i)\\bOPERATOR\\s*\\(\\s*(?:[\\w\"]+\\s*\\.\\s*)*([^()\\s]+)\\s*\\)",
      " $1 ")

  def rewrite(sqlIn: String): String = {
    // quantified runs BEFORE arraySubquery so `= ANY(ARRAY(subquery))`
    // is seen as the sublink it is, not a collect()'d scalar array
    val sql = rowCompare(arraySubquery(quantified(flattenGroupByParens(havingOverGroupingSets(mdqaGrouping(pgGroupingSets(
      regexSubstring(extractFields(unnestFrom(generateSeriesRewrite(srfSelectHoist(srfInsertValues(lateralValues(cteSingleRowValues(
        windowOrder(arraySlices(subscripts(arrayConcatOps(arrayBrackets(arrayLiteralCasts(
          quotedIdents(joinOnSubqueryToFilter(gpDistRandom(
            complexRewrites(intervalSpacing(monDateLiterals(slashDateLiterals(compactDateLiterals(pgDateTemplates(
              valuesPgLiterals(pgValueCasts(pgStringSyntax(orderByNulls(orderedAgg(percentileArray(hypotheticalSetAgg(
                windowClauseExpand(nestedJoinOns(
                  orderByOrdinal(jsonArrows(similarToOp(distinctOn(stripCorrelatedOrderBy(
                    // LIMIT/OFFSET NULL = no limit (select_limit gram)
                    "(?i)\\b(LIMIT|OFFSET)\\s+NULL\\b".r.replaceAllIn(
                      // count(a.*) — a whole-row var (parse_func.c):
                      // count of non-null composites. Spark's struct
                      // over the qualified star carries the same rows
                      // for base-relation refs (an outer join's
                      // null-extended composite differs — PG skips it,
                      // struct() does not; none of the ported suites
                      // count over null-extended whole rows)
                      "(?i)\\bcount\\s*\\(\\s*(\\w+)\\s*\\.\\s*\\*\\s*\\)".r
                        .replaceAllIn(operatorSyntax(sqlIn), "count(struct($1.*))"),
                      "")))))))))))))))))))))))))))))))))))))))))))))
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
    ps.foreach { case (isLit, text) =>
      if (!isLit && negFrameRe.findFirstIn(text).isDefined)
        throw new IllegalArgumentException(
          "RANGE parameter cannot be negative (window frame offset must " +
            "not be negative)")
    }
    sb.toString
  }
}
