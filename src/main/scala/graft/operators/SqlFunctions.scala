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
  * cannot recurse either). `RETURNS TABLE(...)`/`RETURNS SETOF` keeps
  * the full SELECT body and the call site inlines as a derived table —
  * the parameterized-view semantics of PG's
  * inline_set_returning_function (clauses.c).
  */
object SqlFunctions {

  /** `defaults` aligns with `params` (None = required); `variadic`
    * marks the LAST parameter as PG VARIADIC (extra call-site args
    * collect into one array argument, funcapi.c). */
  final case class SqlFn(name: String, params: Seq[String], body: String,
                         setof: Boolean = false,
                         defaults: Seq[Option[String]] = Seq.empty,
                         variadic: Boolean = false)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, SqlFn]()

  // function attributes PG allows after LANGUAGE (gram.y
  // createfunc_opt_item / common_func_opt_item): volatility, strict-
  // ness, security, SQL-data access, costs — all irrelevant to an
  // inlined expression macro, all dropped
  private val fnAttrs =
    "(?:\\s+(?:VOLATILE|STABLE|IMMUTABLE|STRICT|(?:NOT\\s+)?LEAKPROOF|" +
      "CALLED\\s+ON\\s+NULL\\s+INPUT|RETURNS\\s+NULL\\s+ON\\s+NULL\\s+INPUT|" +
      "SECURITY\\s+(?:DEFINER|INVOKER)|PARALLEL\\s+\\w+|COST\\s+\\d+|" +
      "ROWS\\s+\\d+|NO\\s+SQL|CONTAINS\\s+SQL|READS\\s+SQL\\s+DATA|" +
      "MODIFIES\\s+SQL\\s+DATA|EXECUTE\\s+ON\\s+\\w+))*"

  // the parameter list is matched NON-GREEDILY up to `) RETURNS` so a
  // parenthesized parameter type (`char(2)`) can't truncate it
  private val fnRe =
    ("(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?FUNCTION\\s+([\\w.]+)\\s*" +
      "\\((.*?)\\)\\s*RETURNS\\s+(TABLE\\s*\\([^)]*\\)|SETOF\\s+[\\w.]+|" +
      "[\\w ]+?(?:\\([\\d, ]*\\))?)\\s+AS\\s+" +
      "(?:'(.*?)'|\\$\\$(.*?)\\$\\$)\\s*LANGUAGE\\s+'?SQL'?" +
      fnAttrs + "\\s*;?\\s*$").r

  private val plRe =
    ("(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?FUNCTION\\s+([\\w.]+)\\s*" +
      "\\((.*?)\\)\\s*RETURNS\\s+([\\w ]+?(?:\\([\\d, ]*\\))?)\\s+AS\\s+" +
      "(?:\\$\\$(.*?)\\$\\$|'([^']*+(?:''[^']*+)*+)')\\s*LANGUAGE\\s+'?PLPGSQL'?" +
      fnAttrs + "\\s*;?\\s*$").r

  /** The canonical SETOF plpgsql shape — `FOR r IN <query> LOOP RETURN
    * NEXT r; END LOOP; RETURN;` (pl_exec.c exec_stmt_return_next): the
    * function IS the query, so it registers exactly like a LANGUAGE
    * SQL table function (qp_functions_in_contexts_setup.sql:39). */
  private val plSetofRe =
    ("(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?FUNCTION\\s+([\\w.]+)\\s*" +
      "\\((.*?)\\)\\s*RETURNS\\s+SETOF\\s+[\\w.]+\\s+AS\\s+\\$\\$\\s*" +
      "(?:DECLARE\\s+.*?)?BEGIN\\s+" +
      "FOR\\s+(\\w+)\\s+IN\\s+(.*?)\\s+LOOP\\s+RETURN\\s+NEXT\\s+\\3\\s*;" +
      "\\s*END\\s+LOOP\\s*;\\s*RETURN\\s*;\\s*END\\s*;?\\s*" +
      "\\$\\$\\s*LANGUAGE\\s+'?PLPGSQL'?" + fnAttrs + "\\s*;?\\s*$").r

  /** Parse a parameter list (gram.y func_arg_with_default): per item
    * `[IN|OUT|INOUT|VARIADIC] name type [DEFAULT expr | = expr]` →
    * (names, default expressions, last-param-variadic). */
  private[operators] def parseParams(
      text: String): (Seq[String], Seq[Option[String]], Boolean) = {
    val items = GreengageDdl.splitTop(text).map(_.trim).filter(_.nonEmpty)
    var variadic = false
    val parsed = items.zipWithIndex.map { case (it, idx) =>
      val dm = "(?is)^(.*?)(?:\\s+DEFAULT\\s+|\\s*=\\s*)(.+)$".r
        .findFirstMatchIn(it)
      val head = dm.map(_.group(1)).getOrElse(it).trim
      val dflt = dm.map(_.group(2).trim)
      val toks = head.split("\\s+").toSeq
      val afterMode = toks.head.toLowerCase match {
        case "in" | "out" | "inout" => toks.drop(1)
        case "variadic" => variadic = true; toks.drop(1)
        case _ => toks
      }
      // a lone token is an UNNAMED parameter's type (`vol(text)`);
      // the body addresses it positionally as $n, so the placeholder
      // name just has to never match a word in the body
      val name =
        if (afterMode.length == 1) s"$$${idx + 1}"
        else afterMode.head.toLowerCase
      (name, dflt)
    }
    // PG: every parameter after the first defaulted one has a default
    val firstDflt = parsed.indexWhere(_._2.isDefined)
    require(firstDflt < 0 || parsed.drop(firstDflt).forall(_._2.isDefined),
      s"parameter after one with a default must have a default: $text")
    (parsed.map(_._1), parsed.map(_._2), variadic)
  }

  /** Alpha-rename short derived-table aliases inside a function body
    * (`FROM generate_series(..) i`) to collision-proof names: the
    * inline expansion is TEXTUAL, so a call-site argument mentioning a
    * column `i` would otherwise be captured by the body's own alias
    * (PG binds arguments before inlining — no capture there). */
  private def renameLoopAliases(body: String,
                                params: Seq[String]): String = {
    val masked = PgSql.maskLiterals(body)
    val aliases = "(?i)generate_series\\s*\\(".r.findAllMatchIn(masked)
      .flatMap { m =>
        // arguments may nest calls — paren-balance to the close
        val open = masked.indexOf('(', m.start)
        val close = try PgSql.matchingParen(masked, open)
          catch { case _: Exception => -1 }
        if (close < 0) None
        else "(?is)^\\s*(?:AS\\s+)?([a-z]\\w{0,2})\\b".r
          .findFirstMatchIn(body.substring(close + 1)).map(_.group(1))
      }.toSeq.distinct
      .filterNot(a => params.contains(a.toLowerCase))
      .filterNot(a => Set("as", "on").contains(a.toLowerCase))
    aliases.foldLeft(body) { (b, a) =>
      b.replaceAll("(?i)(?<![\\w.$])" + Pattern.quote(a) + "(?![\\w(])",
        "__gs_" + a.toLowerCase)
    }
  }

  /** `public.` is always on PG's search_path, so `public.f` resolves
    * at BARE call sites too — register the unqualified alias (other
    * schemas stay qualified-only, like PG's default path). */
  private def registerPublicAlias(fn: SqlFn): Unit =
    if (fn.name.startsWith("public.")) {
      registry.put(fn.name.stripPrefix("public."),
        fn.copy(name = fn.name.stripPrefix("public.")))
      ()
    }

  /** The registered body of a SQL function, if any (PgAggregates
    * inspects FINALFUNC bodies to recognize aggregate idioms). */
  def bodyOf(name: String): Option[String] =
    Option(registry.get(name.toLowerCase)).map(_.body)

  /** Parse + register a CREATE FUNCTION statement — `LANGUAGE SQL`
    * single-expression bodies, or the `LANGUAGE plpgsql` subset
    * compiled by [[compilePlpgsql]]. Either way the registered function
    * is ONE SQL expression, so call sites inline into a single
    * declarative plan for Catalyst (no interpreter, no per-row
    * re-entry). */
  def create(ddl00: String): SqlFn = {
    // tagged dollar quoting ($BODY$ ... $BODY$, scan.l dolq rules)
    // normalizes to the bare $$ form the shape regexes read
    val ddl0 = "(?s)\\$(\\w+)\\$(.*?)\\$\\1\\$".r.replaceAllIn(ddl00, m =>
      java.util.regex.Matcher.quoteReplacement("$$" + m.group(2) + "$$"))
    // gram.y allows the attribute list in any order: normalize the
    // `LANGUAGE SQL [IMMUTABLE STRICT COST n ...] AS $$...$$` spelling
    // to `AS $$...$$ LANGUAGE SQL <attrs>`
    val ddl = ("(?is)\\bLANGUAGE\\s+'?(SQL|PLPGSQL)'?(" + fnAttrs +
      ")\\s+AS\\s+(\\$\\$.*?\\$\\$|'[^']*+(?:''[^']*+)*+')").r.replaceAllIn(ddl0, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"AS ${m.group(3)} LANGUAGE ${m.group(1)}${m.group(2)}"))
    createOrdered(ddl)
  }

  private def createOrdered(ddl: String): SqlFn = fnRe.findFirstMatchIn(ddl) match {
    case Some(m) =>
      val name = m.group(1).toLowerCase
      val (params, defaults, variadic) = parseParams(m.group(2))
      val rt = m.group(3).trim.toLowerCase
      // RETURNS TABLE(...)/SETOF: the body stays a full SELECT and the
      // call site inlines as a derived table — PG's SQL table function
      // is exactly a parameterized view (inline_set_returning_function)
      val setof = rt.startsWith("table") || rt.startsWith("setof")
      val raw = Option(m.group(4)).getOrElse(m.group(5)).trim.stripSuffix(";").trim
      require(raw.toLowerCase.startsWith("select"),
        s"SQL function body must be 'SELECT ...': $raw")
      val body0 = if (setof) raw else raw.substring("select".length).trim
      val body = renameLoopAliases(body0, params)
      val fn = SqlFn(name, params, body, setof, defaults, variadic)
      registry.put(name, fn)
      registerPublicAlias(fn)
      fn
    case None => plSetofRe.findFirstMatchIn(ddl) match {
      case Some(sm) =>
        val name = sm.group(1).toLowerCase
        val (params, defaults, variadic) = parseParams(sm.group(2))
        val fn = SqlFn(name, params, sm.group(4).trim, setof = true,
          defaults = defaults, variadic = variadic)
        registry.put(name, fn)
        registerPublicAlias(fn)
        fn
      case None => createPl(ddl)
    }
  }

  private def createPl(ddl: String): SqlFn = {
      val m = plRe.findFirstMatchIn(ddl).getOrElse(
        throw new IllegalArgumentException(
          s"not a CREATE FUNCTION ... LANGUAGE SQL/plpgsql statement: $ddl"))
      val name = m.group(1).toLowerCase
      val (params, defaults, variadic) = parseParams(m.group(2))
      val returns = pgTypeToSpark(m.group(3).trim)
      val rawBody = Option(m.group(4))
        .getOrElse(m.group(5).replace("''", "'"))
      val fn = SqlFn(name, params, compilePlpgsql(rawBody, returns),
        defaults = defaults, variadic = variadic)
      registry.put(name, fn)
      registerPublicAlias(fn)
      fn
  }

  // ------------------------------------------------------------------
  // PL/pgSQL subset (reference `src/pl/plpgsql/src/` — a 13k-LoC
  // interpreter; `pl_comp.c` parameter resolution, `pl_exec.c`
  // exec_stmt_if). The restricted shape most scalar plpgsql functions
  // take — DECLARE with initializers, straight-line `v := expr;`
  // assignments, IF/ELSIF/ELSE with RETURN branches (nesting allowed)
  // — is compiled to ONE CASE expression: assignments are inlined
  // SSA-style (each variable's definition is substituted forward, so
  // `v := v + 1` chains), and the IF ladder becomes CASE WHEN. No
  // interpreter exists at runtime; the function call is an expression
  // macro exactly like a LANGUAGE SQL function, fully codegen.
  // ------------------------------------------------------------------

  /** Compile a DECLARE/BEGIN/IF/loops/RETURN body — with an optional
    * `EXCEPTION WHEN <condition> THEN <handler>` section before END
    * (pl_exec.c exec_stmt_block's PG_CATCH) — to a single SQL
    * expression. With a handler, body and handler both cast to the
    * declared RETURNS type and wrap in the codegen
    * [[graft.functions.PlpgsqlCatch]] try/catch expression. */
  private[operators] def compilePlpgsql(body0: String,
                                        returns: Option[String] = None): String = {
    // strip `-- ...` line comments outside literals (pl_scanner.c eats
    // them before the grammar; a commented-out SELECT must not compile)
    val body = body0.linesIterator.map { ln =>
      val spans = literalSpans(ln)
      "--".r.findAllMatchIn(ln)
        .find(m => !spans.exists { case (s, e) => m.start >= s && m.start < e })
        .map(m => ln.substring(0, m.start)).getOrElse(ln)
    }.mkString("\n")
    val m = "(?is)^\\s*(?:DECLARE\\s+(.*?))??BEGIN\\s+(.*?)\\s*END\\s*;?\\s*$".r
      .findFirstMatchIn(body.trim).getOrElse(throw new IllegalArgumentException(
        s"unsupported plpgsql body (expected [DECLARE ...] BEGIN ... END): $body"))
    var env = Map.empty[String, String]
    val declText = mapOutsideLiterals(Option(m.group(1)).getOrElse("")) {
      seg => seg.replaceAll("(?i)\\bDEFAULT\\b", ":=") }
    for (d <- splitStatements(declText)) {
      val parts = d.split(":=", 2)
      val declared = parts(0).trim.split("\\s+", 2)
      val name = declared(0).toLowerCase
      require(name.matches("\\w+"), s"bad plpgsql declaration: $d")
      // honor the declared type: PG coerces the initializer to it, and
      // the FOR-loop state struct takes its field types from these
      // initializers (a bare 0.0 literal would otherwise be DECIMAL)
      val cast = declared.drop(1).headOption.flatMap(pgTypeToSpark)
      if (parts.length == 2) {
        val init = substNamed(parts(1).trim, env)
        env += name -> cast.fold(s"($init)")(t => s"(CAST(($init) AS $t))")
      }
      // uninitialized variables must be assigned before first read —
      // a premature read leaves the bare name and fails analysis
    }
    val inner = m.group(2)
    // first EXCEPTION token outside literals splits main from handler
    val spans = literalSpans(inner)
    def inLit(p: Int) = spans.exists { case (s, e) => p >= s && p < e }
    "(?is)\\bEXCEPTION\\s+WHEN\\s+(\\w+)\\s+THEN\\b".r.findAllMatchIn(inner)
      .find(t => !inLit(t.start)) match {
      case None =>
        // PG coerces RETURN to the declared type (pl_exec.c
        // exec_stmt_return → exec_cast_value): a text literal out of
        // a RETURNS DATE function must come back as a date. date_in
        // accepts the compact '20080101' spelling, which Spark's CAST
        // refuses — the DATE coercion carries that acceptance along
        val e = compileSeq(inner, env)
        returns.fold(e) {
          case t @ "DATE" =>
            s"CAST(CASE WHEN CAST(($e) AS STRING) RLIKE '^\\\\d{8}$$' " +
              s"THEN to_date(CAST(($e) AS STRING), 'yyyyMMdd') " +
              s"ELSE CAST(($e) AS $t) END AS $t)"
          case t => s"CAST(($e) AS $t)"
        }
      case Some(x) =>
        val cond = x.group(1).toLowerCase
        require(graft.functions.PlpgsqlCatch.conditions.contains(cond),
          s"unsupported plpgsql condition: $cond " +
            s"(supported: ${graft.functions.PlpgsqlCatch.conditions.mkString(", ")})")
        val mainExpr = compileSeq(inner.substring(0, x.start), env)
        val handlerExpr = compileSeq(inner.substring(x.end), env)
        def cast(e: String) = returns.fold(s"($e)")(t => s"CAST(($e) AS $t)")
        s"plpgsql_catch(${cast(mainExpr)}, ${cast(handlerExpr)}, '$cond')"
    }
  }

  /** Compile a statement sequence (assignments, bounded FOR loops, then
    * RETURN or an IF ladder) to the expression it returns. */
  private def compileSeq(text0: String, env0: Map[String, String]): String = {
    var env = env0
    var rest = text0.trim
    while (rest.nonEmpty) {
      if (rest.matches("(?is)^RETURN\\b.*")) {
        val (stmt, _) = takeStatement(rest)
        return substNamed(stmt.substring("return".length).trim, env)
      } else if (rest.matches("(?is)^RAISE\\s+EXCEPTION\\b.*")) {
        // the branch ends by aborting: raise_error carries PG's
        // message (pl_exec.c exec_stmt_raise); % placeholders become
        // format_string %s slots
        val (stmt, _) = takeStatement(rest)
        val argText = stmt.replaceFirst("(?is)^RAISE\\s+EXCEPTION\\s+", "")
        val parts = GreengageDdl.splitTop(argText).map(_.trim)
        val msg = substNamed(parts.head, env)
        return if (parts.length == 1) s"raise_error($msg)"
        else {
          // replace % inside the (single-literal) format with %s
          val fmtd =
            if (msg.startsWith("'")) "'" +
              msg.stripPrefix("'").stripSuffix("'").replace("%", "%s") + "'"
            else msg
          s"raise_error(format_string($fmtd, ${
            parts.tail.map(a => substNamed(a, env)).mkString(", ")}))"
        }
      } else if (rest.matches("(?is)^SELECT\\b.*")) {
        // `SELECT ... INTO var` (pl_exec.c exec_stmt_execsql): the
        // query's single value binds the variable. A trailing LIMIT 1
        // becomes max() — Spark rejects LIMIT inside a correlated
        // scalar subquery, and an un-ordered LIMIT 1 is arbitrary-row
        // in PG anyway, so the deterministic refinement is faithful.
        val (stmt, tail) = takeStatement(rest)
        val spans2 = literalSpans(stmt)
        def inL(p: Int) = spans2.exists { case (s, e) => p >= s && p < e }
        val im = "(?i)\\bINTO\\s+(\\w+)\\b".r.findAllMatchIn(stmt)
          .find(t => !inL(t.start)).getOrElse(
            throw new IllegalArgumentException(
              s"plpgsql SELECT without INTO: $stmt"))
        val varName = im.group(1).toLowerCase
        val sansInto = (stmt.substring(0, im.start) + " " +
          stmt.substring(im.end)).trim.stripSuffix(";").trim
        val hasFrom = "(?i)\\bFROM\\b".r.findAllMatchIn(sansInto)
          .exists(t => !inL(t.start))
        val expr =
          if (!hasFrom) sansInto.replaceFirst("(?is)^SELECT", "").trim
          else {
            val lim = sansInto.replaceFirst("(?is)\\s+LIMIT\\s+1\\s*$", "")
            if (lim != sansInto) {
              val m2 = "(?is)^SELECT\\s+(.*?)\\s+(FROM\\b.*)$".r
                .findFirstMatchIn(lim).getOrElse(
                  throw new IllegalArgumentException(
                    s"cannot parse plpgsql SELECT INTO: $stmt"))
              s"(SELECT max(${m2.group(1)}) ${m2.group(2)})"
            } else s"($sansInto)"
          }
        env += varName -> ("(" + substNamed(expr, env) + ")")
        rest = tail.trim
      } else if (rest.matches("(?is)^IF\\b.*")) {
        return compileIfChain(rest, env)
      } else if (rest.matches("(?is)^FOREACH\\b.*")) {
        val (newEnv, tail) = compileForeach(rest, env)
        env = newEnv
        rest = tail.trim
      } else if (rest.matches("(?is)^FOR\\s+\\w+\\s+IN\\s+SELECT\\b.*")) {
        val (newEnv, tail) = compileForQuery(rest, env)
        env = newEnv
        rest = tail.trim
      } else if (rest.matches("(?is)^FOR\\b.*")) {
        val (newEnv, tail) = compileForLoop(rest, env)
        env = newEnv
        rest = tail.trim
      } else if (rest.matches("(?is)^WHILE\\b.*")) {
        val (newEnv, tail) = compileWhileLoop(rest, env)
        env = newEnv
        rest = tail.trim
      } else {
        val (stmt, tail) = takeStatement(rest)
        val parts = stmt.split(":=", 2)
        require(parts.length == 2 && parts(0).trim.matches("(?i)\\w+"),
          s"unsupported plpgsql statement (expected `var := expr;`): $stmt")
        env += parts(0).trim.toLowerCase ->
          ("(" + substNamed(parts(1).trim, env) + ")")
        rest = tail.trim
      }
    }
    throw new IllegalArgumentException(
      "plpgsql control reached end of function without RETURN")
  }

  /** `IF c THEN ... [ELSIF c THEN ...]* [ELSE ...] END IF; [cont]` →
    * `CASE WHEN ... END`. Statements after END IF are the implicit ELSE
    * when the ladder has none (PG falls through); with no continuation
    * either, the fall-through yields NULL (PG would raise "control
    * reached end of function" at runtime — unreachable in well-formed
    * functions). */
  private def compileIfChain(text: String, env: Map[String, String]): String = {
    val spans = literalSpans(text)
    def inLit(p: Int) = spans.exists { case (s, e) => p >= s && p < e }
    // END IF first in the alternation so its IF token is consumed with it
    val tokRe = "(?is)\\bEND\\s+IF\\b|\\bELSIF\\b|\\bELSE\\b|\\bTHEN\\b|\\bIF\\b".r
    var depth = 0
    var endIf: Option[(Int, Int)] = None
    val marks = scala.collection.mutable.ListBuffer.empty[(String, Int, Int)]
    for (t <- tokRe.findAllMatchIn(text) if endIf.isEmpty && !inLit(t.start)) {
      val kind = t.matched.toUpperCase.replaceAll("\\s+", " ")
      kind match {
        case "IF" =>
          depth += 1
          if (depth == 1) marks += (("IF", t.start, t.end))
        case "END IF" =>
          if (depth == 1) endIf = Some((t.start, t.end))
          depth -= 1
        case k =>
          if (depth == 1) marks += ((k, t.start, t.end))
      }
    }
    val (endStart, endEnd) = endIf.getOrElse(throw new IllegalArgumentException(
      s"IF without matching END IF in plpgsql body: $text"))
    // walk IF cond THEN body (ELSIF cond THEN body)* (ELSE body)?
    val bounds = marks.toList :+ (("END IF", endStart, endEnd))
    val whens = scala.collection.mutable.ListBuffer.empty[String]
    var elseExpr: Option[String] = None
    var i = 0
    while (i < bounds.length - 1) {
      bounds(i) match {
        case ("IF" | "ELSIF", _, condFrom) =>
          val (thenKind, thenStart, thenEnd) = bounds(i + 1)
          require(thenKind == "THEN", s"expected THEN after IF/ELSIF: $text")
          val cond = text.substring(condFrom, thenStart).trim
          val bodyEnd = bounds(i + 2)._2
          val branch = text.substring(thenEnd, bodyEnd)
          whens += s"WHEN ${substNamed(cond, env)} THEN ${compileSeq(branch, env)}"
          i += 2
        case ("ELSE", _, from) =>
          elseExpr = Some(compileSeq(text.substring(from, endStart), env))
          i += 1
        case (k, _, _) =>
          throw new IllegalArgumentException(s"unexpected $k in IF ladder: $text")
      }
    }
    val cont = text.substring(endEnd).trim.replaceFirst("^;", "").trim
    val els = elseExpr.orElse(
      if (cont.nonEmpty) Some(compileSeq(cont, env)) else None)
    "CASE " + whens.mkString(" ") + els.fold("")(e => s" ELSE $e") + " END"
  }

  /** PG declaration type → Spark cast target (pg_type.h names). Unknown
    * types fall through to None: the initializer keeps its natural SQL
    * type, exactly the pre-typed behavior. */
  private def pgTypeToSpark(t: String): Option[String] = {
    val n = t.trim.toLowerCase.stripSuffix(";").trim
    n match {
      case "double precision" | "float8" | "double" => Some("DOUBLE")
      case "real" | "float4" => Some("FLOAT")
      case "smallint" | "int2" => Some("SMALLINT")
      case "int" | "integer" | "int4" => Some("INT")
      case "bigint" | "int8" => Some("BIGINT")
      case "text" | "string" => Some("STRING")
      case "boolean" | "bool" => Some("BOOLEAN")
      case "date" => Some("DATE")
      case "timestamp" | "timestamptz" => Some("TIMESTAMP")
      case _ if n.startsWith("varchar") || n.startsWith("char") => Some("STRING")
      case _ if n.startsWith("numeric") || n.startsWith("decimal") =>
        Some(n.replace("numeric", "decimal").toUpperCase)
      case _ => None
    }
  }

  /** `FOR v IN [REVERSE] a..b [BY s] LOOP <assignments> END LOOP;` →
    * `aggregate(sequence(a,b[,s]), <state struct>, <merge lambda>)`
    * (reference `pl_exec.c:1423-1431` exec_stmt_fori). The loop-carried
    * variables — every variable assigned in the body — become fields of
    * a struct accumulator whose zero is their pre-loop value, and the
    * body's assignment sequence becomes the merge lambda (SSA forward
    * substitution inside one iteration, same rule as straight-line
    * code). Still zero interpreter: the loop is ONE codegen'd
    * higher-order expression; each downstream read of a state variable
    * projects its field off that expression.
    *
    * PG iteration semantics kept exactly: a forward loop with lo > hi
    * (or a REVERSE loop with lo < hi) runs zero iterations, and REVERSE
    * counts DOWN from the first bound (`FOR i IN REVERSE 10..1`). The
    * state-struct field types are fixed by the zero value, so
    * initializers set the arithmetic type (declare `0.0`, not `0`, for a
    * double accumulator) — the same rule PG's %TYPE-less declarations
    * follow. Loop-carried variables must be declared/assigned before the
    * loop; nested FOR loops are rejected (one aggregate level). */
  private def compileForLoop(text: String, env: Map[String, String]):
      (Map[String, String], String) = {
    val h = ("(?is)^FOR\\s+(\\w+)\\s+IN\\s+(REVERSE\\s+)?(.*?)\\s*\\.\\.\\s*" +
      "(.*?)(?:\\s+BY\\s+(.*?))?\\s*\\bLOOP\\b").r
      .findFirstMatchIn(text).getOrElse(throw new IllegalArgumentException(
        s"unsupported plpgsql FOR (expected FOR v IN [REVERSE] a..b [BY s] LOOP): $text"))
    val loopVar = h.group(1).toLowerCase
    val reverse = h.group(2) != null
    val lo = substNamed(h.group(3).trim, env)
    val hi = substNamed(h.group(4).trim, env)
    val step = Option(h.group(5)).map(s => substNamed(s.trim, env)).getOrElse("1")
    val (stmts, stateVars, endE) = loopBody(text, h.end, env, "FOR")
    // empty-range image with the sequence's own element type
    val empty = s"slice(sequence(($lo),($lo)),1,0)"
    val seq =
      if (reverse) s"CASE WHEN ($lo) >= ($hi) THEN sequence(($lo),($hi),-($step)) ELSE $empty END"
      else s"CASE WHEN ($lo) <= ($hi) THEN sequence(($lo),($hi),($step)) ELSE $empty END"
    val newEnv = foldLoop(seq, loopVar, stmts, stateVars, env)
    val tail = text.substring(endE).trim.replaceFirst("^;", "")
    (newEnv, tail)
  }

  /** Assemble the state-struct fold every loop form shares: loop-carried
    * variables become fields of a struct accumulator whose zero is their
    * pre-loop value; the body's assignment sequence becomes the merge
    * lambda (SSA forward substitution inside one iteration); each
    * downstream read of a state variable projects its field off the
    * fold. `emptyAs` wraps reads in COALESCE for sources that yield SQL
    * NULL (not an empty array) on zero rows — a loop over nothing keeps
    * the pre-loop state, as in PG. */
  private def foldLoop(arrExpr: String, loopVar: String, stmts: Seq[String],
                       stateVars: Seq[String], env: Map[String, String],
                       emptyAs: Boolean = false,
                       wrap: String => String = identity): Map[String, String] = {
    require(!stateVars.contains(loopVar),
      s"cannot assign to the loop variable $loopVar")
    val acc = "g_loop_acc"
    val idx = "g_loop_i"
    require(!env.contains(acc) && !env.contains(idx) &&
      loopVar != acc && loopVar != idx, s"$acc/$idx are reserved names")
    var loopEnv = env ++
      stateVars.map(v => v -> s"($acc.$v)").toMap + (loopVar -> idx)
    for (stmt <- stmts) {
      val parts = stmt.split(":=", 2)
      loopEnv += parts(0).trim.toLowerCase ->
        ("(" + substNamed(parts(1).trim, loopEnv) + ")")
    }
    val zero = stateVars.map(v => s"'$v', ${env(v)}").mkString(", ")
    val merge = stateVars.map(v => s"'$v', ${loopEnv(v)}").mkString(", ")
    val agg = wrap(
      s"aggregate(($arrExpr), named_struct($zero), ($acc, $idx) -> named_struct($merge))")
    env ++ stateVars.map(v => v ->
      (if (emptyAs) s"(coalesce((($agg).$v), ${env(v)}))"
       else s"(($agg).$v)")).toMap
  }

  /** `FOREACH v IN ARRAY expr LOOP <assignments> END LOOP;` (reference
    * `src/pl/plpgsql/src/pl_exec.c:1445` exec_stmt_foreach_a) → the same
    * state-struct fold as integer FOR, but folding over the ARRAY value
    * itself: the loop variable binds each element in order. One codegen'd
    * higher-order expression, no interpreter. */
  private def compileForeach(text: String, env: Map[String, String]):
      (Map[String, String], String) = {
    val spans = literalSpans(text)
    def inLit(p: Int) = spans.exists { case (s, e) => p >= s && p < e }
    val h = "(?is)^FOREACH\\s+(\\w+)\\s+IN\\s+ARRAY\\s+".r
      .findFirstMatchIn(text).getOrElse(throw new IllegalArgumentException(
        s"unsupported plpgsql FOREACH (expected FOREACH v IN ARRAY expr LOOP): $text"))
    val loopTok = "(?is)\\bLOOP\\b".r.findAllMatchIn(text)
      .find(t => t.start >= h.end && !inLit(t.start))
      .getOrElse(throw new IllegalArgumentException(
        s"FOREACH without LOOP in plpgsql body: $text"))
    val loopVar = h.group(1).toLowerCase
    val arr = substNamed(text.substring(h.end, loopTok.start).trim, env)
    val (stmts, stateVars, endE) = loopBody(text, loopTok.end, env, "FOREACH")
    val newEnv = foldLoop(arr, loopVar, stmts, stateVars, env)
    (newEnv, text.substring(endE).trim.replaceFirst("^;", ""))
  }

  /** `FOR rec IN SELECT ... [ORDER BY ...] LOOP <assignments> END LOOP;`
    * (reference `src/pl/plpgsql/src/pl_exec.c:1435` exec_stmt_fors) for
    * accumulation-only bodies: the query inlines as a scalar subquery
    * collecting `named_struct` records, and the loop becomes the same
    * state-struct fold (`rec.field` reads the element's field). The
    * whole function stays ONE SQL expression — a correlated query
    * decorrelates into a join + aggregate under Catalyst, which is the
    * plan a hand-written SQL rewrite of the loop would get.
    *
    * Subset rules: select items are `expr AS alias` or plain columns;
    * ORDER BY keys must be select-list aliases, one direction for all
    * keys (the records sort by those fields first — ties then order by
    * the remaining fields, a deterministic refinement of PG's arbitrary
    * tie order). A query yielding zero rows leaves the loop state at its
    * pre-loop values. Collected rows materialize per outer row, so the
    * inner query must be group-bounded — same rule as array_agg. */
  private def compileForQuery(text: String, env: Map[String, String]):
      (Map[String, String], String) = {
    val spans = literalSpans(text)
    def inLit(p: Int) = spans.exists { case (s, e) => p >= s && p < e }
    val h = "(?is)^FOR\\s+(\\w+)\\s+IN\\s+(?=SELECT\\b)".r
      .findFirstMatchIn(text).getOrElse(throw new IllegalArgumentException(
        s"unsupported plpgsql FOR-over-query: $text"))
    val loopTok = "(?is)\\bLOOP\\b".r.findAllMatchIn(text)
      .find(t => t.start >= h.end && !inLit(t.start))
      .getOrElse(throw new IllegalArgumentException(
        s"FOR-over-query without LOOP in plpgsql body: $text"))
    val rec = h.group(1).toLowerCase
    val query = text.substring(h.end, loopTok.start).trim
    val qSpans = literalSpans(query)
    def qInLit(p: Int) = qSpans.exists { case (s, e) => p >= s && p < e }
    def depthAt(pos: Int): Int = {
      var d = 0
      var i = 0
      while (i < pos) {
        if (!qInLit(i)) {
          val c = query.charAt(i)
          if (c == '(') d += 1 else if (c == ')') d -= 1
        }
        i += 1
      }
      d
    }
    // split a top-level ORDER BY off the query
    val (sel, orderBy) = "(?is)\\bORDER\\s+BY\\b".r.findAllMatchIn(query)
      .find(t => !qInLit(t.start) && depthAt(t.start) == 0) match {
      case Some(t) =>
        (query.substring(0, t.start).trim, Some(query.substring(t.end).trim))
      case None => (query, None)
    }
    // select list up to the first top-level FROM
    val fromTok = "(?is)\\bFROM\\b".r.findAllMatchIn(sel)
      .find(t => !qInLit(t.start) && depthAt(t.start) == 0)
      .getOrElse(throw new IllegalArgumentException(
        s"FOR-over-query needs a FROM clause: $query"))
    val items = GreengageDdl.splitTop(
      sel.substring("select".length, fromTok.start)).map(_.trim)
    val aliasRe = "(?is)^(.*?)\\s+AS\\s+(\\w+)$".r
    val fields: Seq[String] = items.map {
      case aliasRe(_, a) => a.toLowerCase
      case id if id.matches("(?i)[\\w.]+") => id.split("\\.").last.toLowerCase
      case other => throw new IllegalArgumentException(
        s"FOR-over-query select items must be `expr AS alias` or plain columns: $other")
    }
    // ORDER BY keys (select-list aliases, single direction) lead the
    // struct so sort_array orders the collected records like the query
    val (sortKeys, desc) = orderBy match {
      case None => (Seq.empty[String], false)
      case Some(ob) =>
        val keys = GreengageDdl.splitTop(ob).map(_.trim.toLowerCase)
        val dirs = keys.map(k => k.endsWith(" desc"))
        require(dirs.distinct.lengthCompare(1) == 0,
          s"FOR-over-query ORDER BY must use one direction: $ob")
        val names = keys.map(_.replaceAll("(?i)\\s+(asc|desc)$", "").trim)
        names.foreach(k => require(fields.contains(k),
          s"ORDER BY key $k is not a select-list alias of: ${fields.mkString(", ")}"))
        (names, dirs.head)
    }
    val ordered = sortKeys ++ fields.filterNot(sortKeys.contains)
    val structFields = ordered.map(f => s"'$f', $f").mkString(", ")
    val inner = substNamed(sel, env)
    // the fold must live INSIDE the scalar subquery (Spark rejects
    // subquery expressions within higher-order functions), so the
    // subquery computes `aggregate(array_agg(records), zero, merge)`
    // and each state read projects a field off its struct result
    val collect = s"array_agg(named_struct($structFields))"
    val arr =
      if (sortKeys.isEmpty) collect
      else if (desc) s"sort_array($collect, false)"
      else s"sort_array($collect)"
    val (stmts, stateVars, endE) = loopBody(text, loopTok.end, env, "FOR")
    // array_agg yields NULL (not []) on zero rows — keep pre-loop state
    val newEnv = foldLoop(arr, rec, stmts, stateVars, env, emptyAs = true,
      wrap = a => s"(SELECT $a FROM ($inner) g_for_q)")
    (newEnv, text.substring(endE).trim.replaceFirst("^;", ""))
  }

  /** Parse an assignments-only loop body starting at `from` (just past
    * the LOOP keyword): (statements, loop-carried vars in first-
    * assignment order, offset just past END LOOP). */
  private def loopBody(text: String, from: Int, env: Map[String, String],
                       kind: String): (Seq[String], Seq[String], Int) = {
    val spans = literalSpans(text)
    def inLit(p: Int) = spans.exists { case (s, e) => p >= s && p < e }
    val endTok = "(?is)\\bEND\\s+LOOP\\b".r.findAllMatchIn(text)
      .find(t => t.start >= from && !inLit(t.start))
      .getOrElse(throw new IllegalArgumentException(
        s"$kind without matching END LOOP in plpgsql body: $text"))
    val body = text.substring(from, endTok.start)
    require(!"(?is)\\bLOOP\\b".r.findAllMatchIn(body)
        .exists(t => !inLit(from + t.start)),
      s"nested loops are not supported in the plpgsql subset: $body")
    val stmts = splitStatements(body)
    require(stmts.nonEmpty, s"empty plpgsql $kind body: $text")
    val stateVars = scala.collection.mutable.LinkedHashSet.empty[String]
    for (stmt <- stmts) {
      val parts = stmt.split(":=", 2)
      require(parts.length == 2 && parts(0).trim.matches("(?i)\\w+"),
        s"unsupported statement in plpgsql $kind body (expected `var := expr;`): $stmt")
      val v = parts(0).trim.toLowerCase
      require(env.contains(v),
        s"loop-carried variable $v must be declared/assigned before the loop")
      stateVars += v
    }
    (stmts, stateVars.toSeq, endTok.end)
  }

  /** Iteration budget for WHILE loops (the declarative compile runs a
    * fixed-length fold with a guarded merge, so the budget bounds per-row
    * work; exceeding it raises, never silently truncates). */
  private val WhileCap = 64

  /** `WHILE cond LOOP <assignments> END LOOP;` (pl_exec.c exec_stmt_while)
    * → a fixed-length `aggregate(sequence(1, 64), state, guarded merge)`:
    * each step applies the body only while `cond` still holds on the
    * accumulated state, so the fold computes exactly PG's loop for any
    * loop that terminates within the budget — and every state-variable
    * read afterwards is wrapped in a `CASE WHEN cond(final) THEN
    * raise_error(...) END` guard, so a loop that would still be running
    * at the budget RAISES instead of silently returning a truncated
    * answer. Per-row cost is always the full budget (guarded no-ops
    * after termination) — the price of a declarative, interpreter-free
    * compile. */
  private def compileWhileLoop(text: String, env: Map[String, String]):
      (Map[String, String], String) = {
    val h = "(?is)^WHILE\\s+(.*?)\\s*\\bLOOP\\b".r.findFirstMatchIn(text)
      .getOrElse(throw new IllegalArgumentException(
        s"unsupported plpgsql WHILE (expected WHILE cond LOOP): $text"))
    val condRaw = h.group(1).trim
    val (stmts, stateVars, endE) = loopBody(text, h.end, env, "WHILE")
    val acc = "g_loop_acc"
    val idx = "g_loop_i"
    require(!env.contains(acc) && !env.contains(idx),
      s"$acc/$idx are reserved names")
    val accEnv = env ++ stateVars.map(v => v -> s"($acc.$v)").toMap
    val condAcc = substNamed(condRaw, accEnv)
    var loopEnv = accEnv
    for (stmt <- stmts) {
      val parts = stmt.split(":=", 2)
      loopEnv += parts(0).trim.toLowerCase ->
        ("(" + substNamed(parts(1).trim, loopEnv) + ")")
    }
    val zero = stateVars.map(v => s"'$v', ${env(v)}").mkString(", ")
    // the guard sits OUTSIDE the struct construction: once the loop has
    // terminated, every remaining budget step returns the accumulator
    // by identity instead of rebuilding a same-valued struct per field
    val merge = stateVars.map(v => s"'$v', ${loopEnv(v)}").mkString(", ")
    val agg = s"aggregate(sequence(1, $WhileCap), named_struct($zero), " +
      s"($acc, $idx) -> CASE WHEN $condAcc THEN named_struct($merge) " +
      s"ELSE $acc END)"
    // let-bind the fold ONCE per read via transform(array(agg), st -> …):
    // the non-termination guard needs the final state for both the
    // condition and the value, and a plain text macro would expand the
    // whole 64-step fold twice (HOFs evaluate interpreted — no CSE)
    val st = "g_loop_st"
    require(!env.contains(st), s"$st is a reserved name")
    val condSt = substNamed(condRaw,
      env ++ stateVars.map(v => v -> s"($st.$v)").toMap)
    val guarded = env ++ stateVars.map(v => v ->
      (s"(element_at(transform(array($agg), $st -> " +
        s"CASE WHEN $condSt THEN raise_error(" +
        s"'plpgsql WHILE did not terminate within $WhileCap iterations') " +
        s"ELSE $st.$v END), 1))")).toMap
    (guarded, text.substring(endE).trim.replaceFirst("^;", ""))
  }

  /** (first top-level statement without its ';', remainder). */
  private def takeStatement(text: String): (String, String) = {
    val spans = literalSpans(text)
    def inLit(p: Int) = spans.exists { case (s, e) => p >= s && p < e }
    val cut = text.indices.find(i => text.charAt(i) == ';' && !inLit(i))
      .getOrElse(text.length)
    (text.substring(0, cut).trim,
      if (cut < text.length) text.substring(cut + 1) else "")
  }

  private def splitStatements(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var rest = text
    while (rest.trim.nonEmpty) {
      val (stmt, tail) = takeStatement(rest)
      if (stmt.nonEmpty) out += stmt
      rest = tail
    }
    out.result()
  }

  /** Literal-aware whole-word variable substitution (no positional $n —
    * those stay for call-site expansion). */
  private def substNamed(body: String, env: Map[String, String]): String =
    if (env.isEmpty) body
    else {
      val re = ("(?i)\\b(" + env.keys.map(Pattern.quote).mkString("|") + ")\\b").r
      mapOutsideLiterals(body)(seg => re.replaceAllIn(seg,
        mm => Matcher.quoteReplacement(env(mm.group(1).toLowerCase))))
    }

  def drop(name: String): Unit = registry.remove(name.toLowerCase)

  /** Inline every registered SQL-function call site, to fixpoint
    * (functions may call other functions; recursion throws). */
  def expand(sql: String): String = {
    // user-defined operators first: their implementing functions are
    // registered macros, so the rewritten call sites inline below
    var cur = PgAggregates.substituteNames(
      PgSql.expandCustomOperators(sql))
    var rounds = 0
    var changed = true
    while (changed) {
      require(rounds < 256,
        "SQL function expansion did not converge (recursive function?)")
      val next = expandOnce(setofToLateral(cur))
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
  /** The clause keyword governing position `at` (parens scope). */
  private def clauseAt(masked: String, at: Int): String = {
    val clause = scala.collection.mutable.Stack[String]("")
    val kws = Seq("select", "from", "where", "group", "having", "order",
      "values", "returning", "limit", "window", "on", "using", "set")
    var i = 0
    while (i < at) {
      masked.charAt(i) match {
        case '(' => clause.push(""); i += 1
        case ')' => if (clause.size > 1) clause.pop(); i += 1
        case _ =>
          val kw = kws.find(w =>
            masked.regionMatches(true, i, w, 0, w.length) &&
              (i == 0 || (!Character.isLetterOrDigit(masked.charAt(i - 1)) &&
                masked.charAt(i - 1) != '_' && masked.charAt(i - 1) != '.')) &&
              (i + w.length >= masked.length ||
                (!Character.isLetterOrDigit(masked.charAt(i + w.length)) &&
                  masked.charAt(i + w.length) != '_')))
          kw match {
            case Some(w) =>
              clause.pop(); clause.push(w); i += w.length
            case None => i += 1
          }
      }
    }
    clause.top
  }

  /** SRFs in the SELECT list (ExecProjectSet): `SELECT f_setof(x) FROM
    * t` multiplies rows. Spark has no ProjectSet over SQL-function
    * bodies, so the call moves to a LATERAL FROM item and the select
    * item becomes its column — identical semantics for a single-column
    * SRF (an empty set drops the row, as PG does). */
  private def setofToLateral(sql0: String): String = {
    import scala.jdk.CollectionConverters._
    var sql = sql0
    var n = 0
    var changed = true
    while (changed && n < 16) {
      changed = false
      val masked = PgSql.maskLiterals(sql)
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
      val hit = registry.values().asScala.filter(_.setof).flatMap { fn =>
        ("(?i)\\b" + Pattern.quote(fn.name) + "\\s*\\(").r
          .findAllMatchIn(masked)
          .filter(m => clauseAt(masked, m.start) == "select")
          .map(m => (fn, m))
      }.headOption
      hit match {
        case None =>
        case Some((fn, m)) =>
          n += 1
          val open = masked.indexOf('(', m.start)
          val (_, after) = GreengageDdl.balanced(sql, open)
          val call = sql.substring(m.start, after)
          val tAlias = s"__graft_srf_$n"
          val vCol = s"__graft_srfv_$n"
          val myDepth = depth(m.start)
          def word(at: Int, w: String): Boolean =
            masked.regionMatches(true, at, w, 0, w.length) &&
              (at == 0 || (!Character.isLetterOrDigit(masked.charAt(at - 1)) &&
                masked.charAt(at - 1) != '_')) &&
              (at + w.length >= masked.length ||
                (!Character.isLetterOrDigit(masked.charAt(at + w.length)) &&
                  masked.charAt(at + w.length) != '_'))
          // the enclosing SELECT's FROM at the same depth, after the call
          var j = after
          var fromAt = -1
          while (j < masked.length && fromAt < 0 && depth(j) >= myDepth) {
            if (depth(j) == myDepth && word(j, "from")) fromAt = j
            j += 1
          }
          val enders = Seq("where", "group", "having", "order", "limit",
            "union", "intersect", "except", "window", "fetch", "offset",
            "returning")
          // end-of-clause scan runs THROUGH masked.length: depth(p)
          // is the depth BEFORE char p, so a drop below the call's
          // depth means char p-1 closed the enclosing subselect — the
          // splice must land INSIDE it (end = p - 1), including when
          // that ')' is the statement's last character
          def clauseEnd(from: Int): Int = {
            var k = from
            var end = masked.length
            var scanning = true
            while (k <= masked.length && scanning) {
              if (depth(k) < myDepth) { end = k - 1; scanning = false }
              else if (k < masked.length && depth(k) == myDepth &&
                (masked.charAt(k) == ';' || enders.exists(word(k, _)))) {
                end = k; scanning = false
              } else k += 1
            }
            end
          }
          if (fromAt >= 0) {
            val end = clauseEnd(fromAt + 4) // end of the FROM item list
            sql = sql.substring(0, m.start) + vCol +
              sql.substring(after, end).stripSuffix(" ") +
              s", LATERAL $call AS $tAlias($vCol) " + sql.substring(end)
          } else {
            // no FROM clause: the SRF becomes the sole FROM item
            val end = clauseEnd(after)
            sql = sql.substring(0, m.start) + vCol +
              sql.substring(after, end) +
              s" FROM $call AS $tAlias($vCol) " + sql.substring(end)
          }
          changed = true
      }
    }
    sql
  }

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
          .filter(_ != "()")
        val np = fn.params.length
        // VARIADIC: the tail collects into one array argument;
        // DEFAULTs fill unsupplied trailing parameters (funcapi.c /
        // gram.y func_arg_with_default)
        val filled: Seq[String] =
          if (fn.variadic) {
            require(args.length >= np - 1,
              s"${fn.name} expects at least ${np - 1} args, got ${args.length}: $argText")
            args.take(np - 1) :+
              s"array(${args.drop(np - 1).mkString(", ")})"
          } else if (args.length < np && fn.defaults.nonEmpty) {
            val fills = fn.defaults.drop(args.length).map(_.getOrElse(
              throw new IllegalArgumentException(
                s"${fn.name} expects $np args, got ${args.length}: $argText")))
            args ++ fills.map(d => s"($d)")
          } else {
            require(args.length == np,
              s"${fn.name} expects $np args, got ${args.length}: $argText")
            args
          }
        val body = substitute(fn.body, fn.params, filled)
        // a SCALAR function referenced in FROM is a one-row function
        // RTE in PG (parse_relation.c) — inline as a one-row subquery;
        // everywhere else the body inlines as a parenthesized expression
        val repl =
          if (!fn.setof &&
            clauseAt(PgSql.maskLiterals(sql), m.start) == "from")
            "(SELECT (" + body + "))"
          else "(" + body + ")"
        return sql.substring(0, m.start) + repl + sql.substring(after)
      }
    }
    sql
  }
}
