package graft

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing entry point: a Greengage-capability engine on Spark.
  *
  * {{{
  * val spark = Graft.session()                  // tuned SparkSession
  * Graft.open(spark, "/data/warehouse/sf100")   // register tables + fns
  * spark.sql("SELECT ...")                      // full SQL surface
  * graft.operators.Dedup.nearDupPairs(...)      // pipeline operators
  * }}}
  *
  * Session defaults encode the semantic contract (SURVEY §7.3): UTC,
  * ANSI mode (PG-style error-on-overflow/div0), AQE with skew-join
  * handling, and the fixture nanos-timestamp handling.
  */
object Graft {

  // affected-row tracking for plpgsql's FOUND / GET DIAGNOSTICS
  // (pl_exec.c exec_stmt_execsql reads SPI_processed): the interpreter
  // flips trackAffected around a DML statement; the DML dispatch
  // paths report their counts. Off by default — INSERT would
  // otherwise pay an extra count scan per statement.
  private[graft] val trackAffected = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }
  private[graft] val lastAffected = new ThreadLocal[java.lang.Long] {
    override def initialValue(): java.lang.Long = -1L
  }
  private def recordAffected(n: => Long): Unit =
    if (trackAffected.get) lastAffected.set(n)

  def session(master: String = "local[*]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors,
              appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    Tables.tune(s)
    functions.GraftFunctions.register(s)
    s
  }

  /** Register the parquet tables under `dataDir` plus all engine
    * functions on an existing session. */
  def open(spark: SparkSession, dataDir: String): Unit =
    Tables.register(spark, dataDir)

  /** The engine's query catalog (name → builder) — every SURVEY §2
    * operator has an entry here. */
  def catalog: Map[String, (SparkSession, String) => DataFrame] =
    SparkEntry.queries

  private val copyRe =
    // options: the 9.0+ WITH (...) list or the legacy bare-keyword
    // tail (`csv`, `with delimiter ','`, `null as ''` — copy.c
    // opt_legacy) up to LOG ERRORS / SEGMENT REJECT
    ("(?is)^\\s*COPY\\s+(\\(.*\\)|[\\w.\"]+)\\s+(TO|FROM)\\s+'([^']+)'\\s*" +
      "((?:WITH\\s*)?(?:\\([^()]*\\)|(?!LOG\\s+ERRORS|SEGMENT\\s+REJECT)[^;()])*?)?\\s*(LOG\\s+ERRORS)?\\s*" +
      "(?:SEGMENT\\s+REJECT\\s+LIMIT\\s+(\\d+)\\s*(ROWS|PERCENT)?)?\\s*;?\\s*$").r
  private val copyProgRe =
    "(?is)^\\s*COPY\\s+(\\(.*\\)|[\\w.\"]+)\\s+(TO|FROM)\\s+PROGRAM\\s+'([^']+)'\\s*(WITH\\s*\\(.*\\))?\\s*;?\\s*$".r
  private val deleteRe = "(?is)^\\s*DELETE\\s+FROM\\s+([\\w.\"]+)(.*)$".r
  private val updateRe = "(?is)^\\s*UPDATE\\s+([\\w.\"]+)\\s+SET\\s+(.+)$".r

  /** Index of the first occurrence of word `kw` at paren-depth 0 and
    * outside single-quoted literals ('' escapes honored), or -1 — the
    * statement splitter must never cut inside a string or a subquery
    * (the reference's scanner tokenizes literals before the grammar
    * sees keywords). */
  private def topKeyword(s: String, kw: String): Int = {
    def isWordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    var depth = 0
    var i = 0
    val n = s.length
    while (i < n) {
      s.charAt(i) match {
        case '\'' =>
          i += 1
          var closed = false
          while (i < n && !closed) {
            if (s.charAt(i) == '\'') {
              if (i + 1 < n && s.charAt(i + 1) == '\'') i += 1 else closed = true
            }
            i += 1
          }
          i -= 1 // outer loop advances past the closing quote
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 &&
            s.regionMatches(true, i, kw, 0, kw.length) &&
            (i == 0 || !isWordChar(s.charAt(i - 1))) &&
            (i + kw.length >= n || !isWordChar(s.charAt(i + kw.length))) =>
          return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Parse one `table [AS] [alias]` FROM/USING item → (table, alias). */
  private def parseFromItem(text: String): (String, String) = {
    val m = "(?is)^\\s*([\\w.\"]+)(?:\\s+(?:AS\\s+)?(\\w+))?\\s*$".r
      .findFirstMatchIn(text).getOrElse(throw new IllegalArgumentException(
        s"cannot parse FROM/USING item (one table [alias]): $text"))
    val name = m.group(1).replace("\"", "")
    (name, Option(m.group(2)).getOrElse(name))
  }

  /** Split a DML tail at its top-level RETURNING clause (gram.y
    * returning_clause): (textBefore, Some(selectItems)) or (text,
    * None). Items are PgSql-rewritten select expressions. */
  private def splitReturning(rest: String): (String, Option[Seq[String]]) = {
    val r = topKeyword(rest, "RETURNING")
    if (r < 0) (rest, None)
    else (rest.substring(0, r),
      Some(operators.GreengageDdl.splitTop(
          rest.substring(r + "RETURNING".length))
        .map(operators.PgSql.rewrite)))
  }

  /** Execute one Greengage SQL statement, routed to the subsystem that
    * implements its verb (the dispatch `src/backend/tcop/utility.c`
    * does in the reference): CREATE TABLE / MATERIALIZED VIEW /
    * SEQUENCE / FUNCTION, ALTER TABLE (incl. partition maintenance),
    * REFRESH MATERIALIZED VIEW, COPY TO/FROM, and everything else to
    * `spark.sql` after the [[operators.PgSql]] lexical rewrites.
    * Returns the result DataFrame for queries, None for commands. */
  def execute(spark: SparkSession, sql: String): Option[DataFrame] = {
    // standard_conforming_strings: pick the session GUC up per
    // statement so SET/RESET take effect lexically (PgSql.stdStrings)
    operators.PgSql.stdStrings = spark.conf
      .getOption("standard_conforming_strings")
      .exists(v => v.equalsIgnoreCase("on") || v.equalsIgnoreCase("true"))
    // PG TEMP/TEMPORARY/UNLOGGED tables (gram.y OptTemp): Spark's
    // CREATE TEMPORARY TABLE is a different (provider-required, V1)
    // beast, so these land as ordinary tables — same visibility within
    // the session; the drop-at-session-end lifecycle is not replicated
    // pg_temp schema = the session temp namespace; one session here,
    // so the qualifier drops everywhere (CREATE and call sites alike)
    // leading comments would defeat every `^VERB` route below (the
    // reference's scanner eats them before the grammar too)
    var t = sql.trim
    while (t.startsWith("/*") || t.startsWith("--")) {
      if (t.startsWith("/*")) {
        val close = t.indexOf("*/")
        t = if (close < 0) "" else t.substring(close + 2).trim
      } else {
        val nl = t.indexOf('\n')
        t = if (nl < 0) "" else t.substring(nl + 1).trim
      }
    }
    t = t.replaceAll("(?i)\\bpg_temp\\.", "").replaceFirst(
      "(?is)^CREATE\\s+(?:GLOBAL\\s+|LOCAL\\s+)?(?:TEMP|TEMPORARY|UNLOGGED)\\s+TABLE",
      "CREATE TABLE")
    // `public` heads PG's search_path and is where unqualified names
    // land (namespace.c): a `public.`-qualified relation IS the
    // unqualified one here, so the qualifier drops (outside literals —
    // `schemaname = 'public'` probes must survive)
    if (t.toLowerCase.contains("public."))
      t = operators.PgSql.replaceAllOutsideLiterals(t,
        "(?i)\\bpublic\\.(?=[\\w\"])", "")
    def is(re: String) = re.r.findFirstIn(t).isDefined
    def stripSemi(s: String) = s.trim.stripSuffix(";").trim
    // `INSERT INTO t ( SELECT ... )` (gram.y insert_rest accepts a
    // parenthesized select_no_parens): unwrap so the body parsers see
    // the SELECT directly
    locally {
      val mm = ("(?is)^(\\s*INSERT\\s+INTO\\s+[\\w.\"]+\\s*)\\(" +
        "(?=\\s*SELECT\\b)").r.findFirstMatchIn(
          operators.PgSql.maskLiterals(t))
      mm.foreach { m0 =>
        val masked = operators.PgSql.maskLiterals(t)
        val open = m0.end - 1
        val close = operators.PgSql.matchingParen(masked, open)
        if (close > open && t.substring(close + 1).trim.stripSuffix(";")
            .trim.isEmpty)
          t = t.substring(0, open) + " " + t.substring(open + 1, close) +
            " " + t.substring(close + 1)
      }
    }
    // interpreted scalar plpgsql calls (SIRV shape): evaluate each
    // call ONCE driver-side and splice the value in as a typed
    // literal — PG's InitPlan evaluation of an uncorrelated volatile
    // function (never inside function/trigger DDL or DO bodies, whose
    // call text must stay verbatim for later compilation)
    // ... nor inside statements that reference a function by SIGNATURE
    // (DROP/ALTER/GRANT/REVOKE/COMMENT ... FUNCTION f(int)): the
    // type-name list is not an argument list — substitution there would
    // evaluate the function at DDL time (side effects!) and mangle the
    // statement
    if (!is("(?is)^(CREATE\\s+(OR\\s+REPLACE\\s+)?" +
          "(FUNCTION|PROCEDURE|TRIGGER)|DO)\\b") &&
        !is("(?is)^\\s*(DROP|ALTER|COMMENT\\s+ON|GRANT|REVOKE)\\b[\\s\\S]*?" +
          "\\bFUNCTION\\b") &&
        operators.PlDo.hasInterpretedCall(t))
      t = operators.PlDo.substituteInterpretedCalls(spark, t)
    // transaction control (xact.c StartTransactionCommand): BEGIN /
    // COMMIT / ROLLBACK as table-state scopes — see operators.Txn
    // gram.y TransactionStmt: BEGIN [TRANSACTION|WORK] followed by any
    // transaction_mode_list (ISOLATION LEVEL ..., READ ONLY/WRITE,
    // [NOT] DEFERRABLE) — keyword combinations stack
    if (is("(?is)^(BEGIN|START\\s+TRANSACTION)(\\s+(TRANSACTION|WORK))?" +
        "(\\s+(ISOLATION|READ|NOT\\s+DEFERRABLE|DEFERRABLE)\\b[^;]*)?;?\\s*$")) {
      operators.Txn.begin(spark); return None
    }
    if (is("(?is)^(COMMIT|END)\\s*(TRANSACTION|WORK)?;?\\s*$")) {
      operators.Txn.commit(spark); return None
    }
    if (is("(?is)^(ROLLBACK|ABORT)\\s*(TRANSACTION|WORK)?;?\\s*$")) {
      operators.Txn.rollback(spark); return None
    }
    if (is("(?is)^(SAVEPOINT|RELEASE)\\b"))
      throw new UnsupportedOperationException(
        "SAVEPOINT/sub-transactions are not supported (Txn scopes are flat)")
    if (operators.Txn.active) operators.Txn.interceptDml(spark, t)
    if (is("(?is)^CREATE\\s+(READABLE\\s+|WRITABLE\\s+)?EXTERNAL\\b")) {
      operators.ExternalTable.create(spark, t); None
    } else if (is("(?is)^DROP\\s+EXTERNAL\\s+(WEB\\s+)?TABLE\\b")) {
      operators.ExternalTable.drop(spark,
        stripSemi(t).split("\\s+").last); None
    } else if (is("(?is)^CREATE\\s+(TABLE|MATERIALIZED\\s+VIEW)\\b")) {
      operators.GreengageDdl.execute(spark, t); None
    } else if (is("(?is)^CREATE\\s+TEXT\\s+SEARCH\\s+DICTIONARY\\b")) {
      functions.TsDictionaries.create(spark, t); None
    } else if (is("(?is)^ALTER\\s+TEXT\\s+SEARCH\\s+DICTIONARY\\b")) {
      functions.TsDictionaries.alter(spark, t); None
    } else if (is("(?is)^DROP\\s+TEXT\\s+SEARCH\\s+DICTIONARY\\b")) {
      functions.TsDictionaries.drop(spark, t); None
    } else if (is("(?is)^(CREATE|ALTER|DROP)\\s+TEXT\\s+SEARCH\\s+" +
        "(CONFIGURATION|TEMPLATE|PARSER)\\b")) {
      // configuration/template/parser DDL: accepted no-ops — the lexize
      // chain is configuration-keyed internally (TsLexize.lexize)
      None
    } else if (is("(?is)^CREATE\\s+TYPE\\b")) {
      // enum/composite/shell types (typecmds.c DefineEnum:1126) — the
      // first statements of a restored pg_dump
      operators.PgTypes.createType(t); None
    } else if (is("(?is)^CREATE\\s+DOMAIN\\b")) {
      operators.PgTypes.createDomain(t); None
    } else if (is("(?is)^ALTER\\s+TYPE\\b.*\\bADD\\s+VALUE\\b")) {
      operators.PgTypes.alterAddValue(t); None
    } else if (is("(?is)^ALTER\\s+(TYPE|DOMAIN)\\b")) {
      // OWNER TO records for the pg_type/pg_authid introspection join;
      // SET SCHEMA / RENAME boilerplate stays an existence no-op
      ("(?is)^ALTER\\s+(?:TYPE|DOMAIN)\\s+([\\w.\"]+)\\s+OWNER\\s+TO\\s+" +
        "([\\w\"]+)").r.findFirstMatchIn(t).foreach(m =>
        operators.PgTypes.setOwner(m.group(1), m.group(2)))
      None
    } else if (is("(?is)^DROP\\s+(TYPE|DOMAIN)\\b")) {
      // CASCADE drops the dependent COLUMNS (dependency.c): any table
      // column declared with the type goes with it
      if ("(?i)\\bCASCADE\\b".r.findFirstIn(t).isDefined)
        ("(?is)^DROP\\s+(?:TYPE|DOMAIN)\\s+(?:IF\\s+EXISTS\\s+)?" +
          "([\\w.\"]+)").r.findFirstMatchIn(stripSemi(t)).foreach { m =>
          operators.PgTypes.tablesUsing(m.group(1)).foreach {
            case (tbl, col) =>
              try {
                if (spark.catalog.tableExists(tbl))
                  operators.GreengageDdl.alter(spark,
                    s"ALTER TABLE $tbl DROP COLUMN $col")
              } catch { case scala.util.control.NonFatal(_) => }
          }
        }
      operators.PgTypes.drop(t); None
    } else if (is("(?is)^CREATE\\s+SEQUENCE\\b")) {
      operators.GreengageDdl.createSequence(t); None
    } else if (is("(?is)^ALTER\\s+SEQUENCE\\b.*\\bRESTART\\b")) {
      // ALTER SEQUENCE s RESTART [WITH n] (commands/sequence.c)
      val m = ("(?is)^ALTER\\s+SEQUENCE\\s+([\\w.\"]+)\\s+RESTART" +
        "(?:\\s+WITH)?\\s*(\\d+)?\\s*;?\\s*$").r.findFirstMatchIn(t).getOrElse(
        throw new IllegalArgumentException(s"cannot parse ALTER SEQUENCE: $t"))
      operators.GreengageDdl.setval(m.group(1).replace("\"", ""),
        Option(m.group(2)).map(_.toLong).getOrElse(1L) - 1)
      None
    } else if (is("(?is)^ALTER\\s+SEQUENCE\\b")) {
      // OWNED BY / CACHE / INCREMENT surgery (commands/sequence.c
      // AlterSequence): existence-checked no-op — ownership only
      // drives DROP cascades, and the id-block allocator has no cache
      val name = ("(?is)^ALTER\\s+SEQUENCE\\s+(?:IF\\s+EXISTS\\s+)?" +
        "([\\w.\"]+)").r.findFirstMatchIn(t).get.group(1).replace("\"", "")
      operators.GreengageDdl.nextBase(name)
      None
    } else if (is("(?is)^DROP\\s+SEQUENCE\\b")) {
      operators.GreengageDdl.dropSequence(stripSemi(t)
        .replaceFirst("(?is)^DROP\\s+SEQUENCE\\s+(IF\\s+EXISTS\\s+)?", "")
        .replace("\"", "")); None
    } else if (is("(?is)^CREATE\\s+SCHEMA\\b")) {
      // schemas ↔ Spark databases (namespace.c); AUTHORIZATION dropped
      val name = stripSemi(t)
        .replaceFirst("(?is)^CREATE\\s+SCHEMA\\s+(IF\\s+NOT\\s+EXISTS\\s+)?", "")
        .replaceFirst("(?is)\\s+AUTHORIZATION\\s+.*$", "").trim.replace("\"", "")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $name"); None
    } else if (is("(?is)^(GRANT|REVOKE|COMMENT\\s+ON|ALTER\\s+ROLE|" +
        "CREATE\\s+ROLE|DROP\\s+ROLE|CREATE\\s+USER|DROP\\s+USER|" +
        "ALTER\\s+USER|ALTER\\s+DEFAULT\\s+PRIVILEGES|" +
        "CHECKPOINT|DISCARD)\\b")) {
      // privilege/ownership/comment statements: accepted no-ops — a
      // single-user Spark session has no ACLs to apply them to, and
      // every migrated pg_dump script is full of them (utility.c routes
      // these to aclchk.c/comment.c, both catalog-only). Role identity
      // is recorded for the pg_authid introspection view.
      "(?is)^CREATE\\s+(?:ROLE|USER)\\s+([\\w\"]+)".r
        .findFirstMatchIn(t).foreach(m =>
          operators.PgCatalog.recordRole(m.group(1).replace("\"", "")))
      "(?is)^DROP\\s+(?:ROLE|USER)\\s+(?:IF\\s+EXISTS\\s+)?([\\w\"]+)".r
        .findFirstMatchIn(t).foreach(m =>
          operators.PgCatalog.dropRole(m.group(1).replace("\"", "")))
      // table GRANT/REVOKE record into the ACL registry so
      // has_table_privilege answers like aclchk.c would.
      // `WITH GRANT OPTION` / REVOKE's `GRANT OPTION FOR` and
      // `CASCADE|RESTRICT` come off before the grantee capture so
      // the recorded role is the bare name; the per-SCHEMA bulk form
      // (`ON ALL TABLES IN SCHEMA s`) expands to every table of the
      // schema at grant time (aclchk.c ExecGrant_Relation over
      // objectsInSchemaToOids)
      val tAcl = stripSemi(t)
        .replaceFirst("(?is)\\s+WITH\\s+GRANT\\s+OPTION\\s*$", "")
        .replaceFirst("(?is)\\s+(CASCADE|RESTRICT)\\s*$", "")
        .replaceFirst("(?is)^REVOKE\\s+GRANT\\s+OPTION\\s+FOR\\s+", "REVOKE ")
      val allInSchema =
        ("(?is)^(GRANT|REVOKE)\\s+([\\w,\\s]+?)\\s+ON\\s+ALL\\s+TABLES\\s+" +
          "IN\\s+SCHEMA\\s+([\\w.\"]+)\\s+(?:TO|FROM)\\s+(?:GROUP\\s+)?" +
          "([\\w,\\s\"]+?)\\s*$").r.findFirstMatchIn(tAcl)
      val single = if (allInSchema.isDefined) None else
        ("(?is)^(GRANT|REVOKE)\\s+([\\w,\\s]+?)\\s+ON\\s+(?:TABLE\\s+)?" +
          "([\\w.\"]+)\\s+(?:TO|FROM)\\s+(?:GROUP\\s+)?([\\w,\\s\"]+?)\\s*$").r
          .findFirstMatchIn(tAcl)
      (allInSchema.toSeq ++ single.toSeq).foreach { m =>
        val privs = m.group(2).toLowerCase.split(",").map(_.trim)
          .map(p => if (p.startsWith("all")) "all" else p).toSet
        val rels: Seq[String] =
          if (allInSchema.isDefined) {
            // `public` is PG's default schema → Spark's current db;
            // record bare names there (aclKey strips `public.` too)
            val db = m.group(3).replace("\"", "")
            val sparkDb = if (db.equalsIgnoreCase("public")) "default" else db
            try spark.catalog.listTables(sparkDb).collect().toSeq
              .map(tb => if (sparkDb == "default") tb.name
                         else s"$sparkDb.${tb.name}")
            catch { case scala.util.control.NonFatal(_) => Seq.empty }
          } else Seq(m.group(3).replace("\"", ""))
        m.group(4).split(",").map(_.replace("\"", "").trim)
          .filter(_.nonEmpty).foreach { role =>
            rels.foreach { rel =>
              if (m.group(1).equalsIgnoreCase("GRANT"))
                operators.PgCatalog.recordGrant(role, rel, privs)
              else operators.PgCatalog.recordRevoke(role, rel, privs)
            }
          }
      }
      None
    } else if (is("(?is)^ALTER\\s+TABLE\\b.*\\bOWNER\\s+TO\\b")) {
      spark.table(stripSemi(t) // existence-checked no-op, like LOCK
        .replaceFirst("(?is)^ALTER\\s+TABLE\\s+(IF\\s+EXISTS\\s+)?(ONLY\\s+)?", "")
        .replaceFirst("(?is)\\s+OWNER\\s+TO\\s+.*$", "").trim.replace("\"", ""))
      None
    } else if (operators.Triggers.isTriggerFunctionDdl(t)) {
      operators.Triggers.createFunction(stripSemi(t)); None
    } else if (operators.Triggers.isCreateTrigger(t)) {
      operators.Triggers.createTrigger(stripSemi(t)); None
    } else if (is("(?is)^DROP\\s+TRIGGER\\b")) {
      val m = ("(?is)^DROP\\s+TRIGGER\\s+(?:IF\\s+EXISTS\\s+)?([\\w\"]+)" +
        "\\s+ON\\s+([\\w.\"]+)").r.findFirstMatchIn(t).getOrElse(
        throw new IllegalArgumentException(s"cannot parse DROP TRIGGER: $t"))
      operators.Triggers.dropTrigger(m.group(1), m.group(2)); None
    } else if (is("(?is)^CREATE\\s+(OR\\s+REPLACE\\s+)?FUNCTION\\b") &&
        is("(?is)\\bLANGUAGE\\s+internal\\b")) {
      // re-exposing a catalog C function under a local name (regress
      // suites build aggregates from these) — record the alias
      val m = ("(?is)^CREATE\\s+(?:OR\\s+REPLACE\\s+)?FUNCTION\\s+" +
        "([\\w.\"]+)[\\s\\S]*?AS\\s+'([\\w]+)'").r
        .findFirstMatchIn(stripSemi(t)).getOrElse(
          throw new IllegalArgumentException(
            s"cannot parse LANGUAGE internal function: $t"))
      operators.PgAggregates.registerInternal(
        m.group(1).replace("\"", ""), m.group(2))
      None
    } else if (is("(?is)^CREATE\\s+(OR\\s+REPLACE\\s+)?FUNCTION\\b") &&
        operators.PlDo.isVoidFunctionDdl(stripSemi(t))) {
      // RETURNS VOID plpgsql = a side-effect body: the procedure
      // interpreter runs it (SELECT f(..) / PERFORM route there)
      operators.PlDo.createVoidFunction(stripSemi(t)); None
    } else if (is("(?is)^CREATE\\s+(OR\\s+REPLACE\\s+)?FUNCTION\\b") &&
        operators.PlPython.isPlPythonDdl(t)) {
      // LANGUAGE plpythonu: driver-side interpreter; each
      // plpy.execute re-enters this router (data work distributed)
      operators.PlPython.createFunction(stripSemi(t)); None
    } else if (is("(?is)^CREATE\\s+(OR\\s+REPLACE\\s+)?FUNCTION\\b")) {
      // inline-expression compilation first (codegen macro — the fast
      // path); an imperative plpgsql body (DDL/EXECUTE/loops — the
      // SIRV shape) falls back to the PlDo interpreter, evaluated
      // once per call site like PG's InitPlan
      try operators.SqlFunctions.create(t)
      catch {
        case e: IllegalArgumentException
            if operators.PlDo.isScalarFunctionDdl(stripSemi(t)) =>
          try operators.PlDo.createScalarFunction(stripSemi(t))
          catch { case _: Exception => throw e }
        case e: IllegalArgumentException
            if operators.PlDo.isSetofPlpgsqlDdl(stripSemi(t)) =>
          // imperative SETOF body (RETURN NEXT loop): registered,
          // calls error loudly
          try operators.PlDo.registerSetofStub(stripSemi(t))
          catch { case _: Exception => throw e }
      }
      None
    } else if (is("(?is)^CREATE\\s+(OR\\s+REPLACE\\s+)?" +
        "(ORDERED\\s+)?AGGREGATE\\b")) {
      operators.PgAggregates.create(stripSemi(t)); None
    } else if (is("(?is)^ALTER\\s+AGGREGATE\\b.*\\bRENAME\\s+TO\\b")) {
      operators.PgAggregates.alterRename(stripSemi(t)); None
    } else if (is("(?is)^DROP\\s+FUNCTION\\b")) {
      // `DROP FUNCTION f(int)` — the PG signature form names argument
      // types; the registry keys on the bare name
      val fname = stripSemi(t)
        .replaceFirst("(?is)^DROP\\s+FUNCTION\\s+(IF\\s+EXISTS\\s+)?", "")
        .replaceFirst("(?s)\\s*\\(.*$", "").trim.replace("\"", "")
      operators.SqlFunctions.drop(fname)
      operators.Triggers.dropFunction(fname)
      operators.PlDo.dropScalarFunction(fname)
      None
    } else if (is("(?is)^DROP\\s+AGGREGATE\\b")) {
      operators.PgAggregates.drop(stripSemi(t)
        .replaceFirst("(?is)^DROP\\s+AGGREGATE\\s+(IF\\s+EXISTS\\s+)?", "")
        .replaceFirst("(?s)\\s*\\(.*$", "").trim)
      None
    } else if (is("(?is)^CREATE\\s+OPERATOR\\s+(?!CLASS|FAMILY)")) {
      // a built-in spelling (=, <, >=, ...) over a binary-compatible
      // user type (partition.sql's myint) already means the right
      // thing — registering it would rewrite EVERY such operator in
      // later statements into the implementing function
      val spelling = "(?is)^CREATE\\s+OPERATOR\\s+([^\\s(]+)".r
        .findFirstMatchIn(t).map(_.group(1).replaceAll("^.*\\.", ""))
      val builtin = Set("=", "<>", "!=", "<", ">", "<=", ">=")
      if (spelling.exists(builtin.contains)) None
      else { operators.PgSql.registerOperator(stripSemi(t)); None }
    } else if (is("(?is)^(CREATE|DROP)\\s+CAST\\b")) {
      // CREATE CAST .. WITHOUT FUNCTION AS IMPLICIT (typecmds.c): the
      // types are already binary-compatible here (base-alias types map
      // to the builtin), so the cast surface is a no-op
      None
    } else if (is("(?is)^(CREATE|ALTER|DROP)\\s+OPERATOR\\s+(CLASS|FAMILY)\\b")) {
      // operator classes/families organize INDEX access methods
      // (opclasscmds.c) — layout-only indexes have no opclasses to
      // bind, the operators themselves already registered above
      None
    } else if (is("(?is)^DROP\\s+OPERATOR\\b")) {
      operators.PgSql.dropOperator(stripSemi(t)); None
    } else if (is("(?is)^CREATE\\s+(OR\\s+REPLACE\\s+)?PROCEDURE\\b")) {
      operators.PlDo.createProcedure(t); None
    } else if (is("(?is)^CALL\\b")) {
      // procedures run for their side effects; notices go to the log
      operators.PlDo.call(spark, t).foreach(n => System.err.println(s"[plpgsql] $n"))
      None
    } else if (is("(?is)^DO\\b")) {
      // anonymous plpgsql block (commands/functioncmds.c ExecuteDoStmt)
      operators.PlDo.executeDo(spark, t).foreach(n => System.err.println(s"[plpgsql] $n"))
      None
    } else if (is("(?is)^ALTER\\s+TABLE\\b.*\\b(SUB)?PARTITION\\b")) {
      operators.GreengageDdl.alterPartition(spark, t); None
    } else if (is("(?is)^ALTER\\s+TABLE\\b")) {
      operators.GreengageDdl.alter(spark, t); None
    } else if (is("(?is)^REFRESH\\s+MATERIALIZED\\s+VIEW\\b")) {
      val name = t.split("\\s+").last.stripSuffix(";")
      operators.GreengageDdl.refreshMaterializedView(spark, name); None
    } else if (is("(?is)^CREATE\\s+(UNIQUE\\s+)?INDEX\\b")) {
      operators.GreengageDdl.createIndex(spark, t); None
    } else if (is("(?is)^DROP\\s+INDEX\\b")) {
      operators.GreengageDdl.dropIndex(spark, t); None
    } else if (is("(?is)^CLUSTER\\b")) {
      operators.GreengageDdl.cluster(spark, t); None
    } else if (is("(?is)^ANALYZE\\s+(?!TABLE\\b)[\\w.\"]+\\s*;?\\s*$")) {
      // PG's bare `ANALYZE t` -> CBO statistics (SURVEY §4.1)
      val name = t.split("\\s+").last.stripSuffix(";").replace("\"", "")
      analyzeTable(spark, name)
      operators.PgCatalog.recordStats(spark, name)
      None
    } else if (is("(?is)^VACUUM\\b")) {
      // VACUUM [FULL] [FREEZE] [VERBOSE] [ANALYZE] t (commands/vacuum.c)
      val words = t.stripSuffix(";").trim.split("\\s+").toList
      val optWords = Set("FULL", "FREEZE", "VERBOSE", "ANALYZE")
      val name = words.drop(1).lastOption
        .filterNot(w => optWords.contains(w.toUpperCase))
        .getOrElse(throw new IllegalArgumentException(
          "database-wide VACUUM is not supported: name a table"))
        .replace("\"", "")
      operators.Dml.vacuum(spark, name)
      if (words.exists(_.equalsIgnoreCase("ANALYZE"))) {
        analyzeTable(spark, name)
        operators.PgCatalog.recordStats(spark, name)
      }
      None
    } else if (is("(?is)^EXPLAIN\\s*\\([^)]*\\bFORMAT\\s+JSON\\b")) {
      // EXPLAIN (FORMAT JSON [, ANALYZE]) (explain.c json format):
      // one row, one "QUERY PLAN" column holding the JSON document
      val analyze = is("(?is)^EXPLAIN\\s*\\([^)]*\\bANALYZE\\b")
      val body = operators.PgSql.rewrite(stripSemi(t)
        .replaceFirst("(?is)^EXPLAIN\\s*\\([^)]*\\)\\s*", ""))
      // without ANALYZE, a command body (INSERT/CTAS) must be PLANNED
      // but not run — spark.sql executes commands eagerly, so those
      // route through a CommandExecutionMode.SKIP QueryExecution
      // (explain.c: only ANALYZE executes the statement)
      val isCommand = "(?is)^\\s*(INSERT|CREATE|REPLACE|DELETE|UPDATE|MERGE|TRUNCATE|DROP|ALTER)\\b"
        .r.findFirstIn(body).isDefined
      val json =
        if (isCommand && !analyze)
          operators.ExplainAnalyze.explainJsonQe(
            org.apache.spark.sql.graft.GraftInternals
              .lazyQueryExecution(spark, body), analyze = false)
        else operators.ExplainAnalyze.explainJson(spark.sql(body), analyze)
      import spark.implicits._
      Some(Seq(json).toDF("QUERY PLAN"))
    } else if (is("(?is)^EXPLAIN\\s+ANALYZE\\b") ||
        is("(?is)^EXPLAIN\\s*\\([^)]*\\bANALYZE\\b")) {
      // commands/explain.c with instrumentation: run the query and
      // surface per-operator runtime metrics as rows. Covers both the
      // legacy EXPLAIN ANALYZE and the PG 9+ parenthesized
      // EXPLAIN (ANALYZE [, option...]) spellings.
      Some(operators.ExplainAnalyze.runAsDataFrame(spark.sql(
        operators.PgSql.rewrite(stripSemi(t)
          .replaceFirst("(?is)^EXPLAIN\\s*\\([^)]*\\)\\s*", "")
          .replaceFirst("(?is)^EXPLAIN\\s+ANALYZE\\s+", "")))))
    } else if (is("(?is)^EXPLAIN\\s*\\(")) {
      // parenthesized non-ANALYZE options (COSTS, VERBOSE, FORMAT):
      // Spark's EXPLAIN renders its own format — options drop
      Some(spark.sql("EXPLAIN " + operators.PgSql.rewrite(stripSemi(t)
        .replaceFirst("(?is)^EXPLAIN\\s*\\([^)]*\\)\\s*", ""))))
    } else if (is("(?is)^PREPARE\\b")) {
      // prepared statements (commands/prepare.c); EXECUTE re-enters the
      // router so any verb can be prepared
      operators.Prepared.prepare(stripSemi(t)); None
    } else if (is("(?is)^EXECUTE\\b")) {
      execute(spark, operators.Prepared.executeText(stripSemi(t)))
    } else if (is("(?is)^DEALLOCATE\\b")) {
      operators.Prepared.deallocate(stripSemi(t)); None
    } else if (is("(?is)^TRUNCATE\\b")) {
      // PG allows bare TRUNCATE t, a table list, ONLY, and trailing
      // identity/cascade options; Spark needs TRUNCATE TABLE per table
      operators.GreengageDdl.splitTop(stripSemi(t)
          .replaceFirst("(?is)^TRUNCATE\\s+(TABLE\\s+)?(ONLY\\s+)?", "")
          .replaceFirst("(?is)\\s+(RESTART|CONTINUE)\\s+IDENTITY.*$", "")
          .replaceFirst("(?is)\\s+(CASCADE|RESTRICT)\\s*$", ""))
        .foreach(n => spark.sql(s"TRUNCATE TABLE ${n.replace("\"", "")}"))
      None
    } else if (is("(?is)^SET\\b")) {
      // PG GUC form into the session conf; Spark's own SET otherwise
      if (operators.Guc.trySet(spark, t)) None else Some(spark.sql(t))
    } else if (is("(?is)^RESET\\b")) {
      operators.Guc.reset(spark, t); None
    } else if (is("(?is)^SHOW\\b")) {
      operators.Guc.tryShow(spark, t)
        .orElse(Some(spark.sql(operators.PgSql.rewrite(t))))
    } else if (is("(?is)^(DECLARE|CLOSE|MOVE)\\b")) {
      // portal statements (commands/portalcmds.c) → cursor surface
      operators.Cursors.execute(spark, stripSemi(t)); None
    } else if (is("(?is)^FETCH\\b")) {
      Some(operators.Cursors.execute(spark, stripSemi(t)))
    } else if (is("(?is)^(BEGIN|START\\s+TRANSACTION|COMMIT|END)\\b")) {
      // transaction grouping (tcop): every routed statement is already
      // atomic via the staged swap, so BEGIN/COMMIT are accepted no-ops
      // for script compatibility; ROLLBACK below is rejected loudly —
      // there is no multi-statement undo to honor silently
      None
    } else if (is("(?is)^ROLLBACK\\b")) {
      throw new UnsupportedOperationException(
        "ROLLBACK is not supported: statements commit atomically " +
          "(staged swap); there is no open transaction to roll back")
    } else if (is("(?is)^LOCK\\b")) {
      // LOCK [TABLE] t [IN ... MODE] [NOWAIT]: existence-checked no-op —
      // the single-writer staged-swap model needs no table locks
      val name = stripSemi(t)
        .replaceFirst("(?is)^LOCK\\s+(TABLE\\s+)?(ONLY\\s+)?", "")
        .replaceFirst("(?is)\\s+IN\\s+.+$", "")
        .replaceFirst("(?is)\\s+NOWAIT$", "").trim.replace("\"", "")
      spark.table(name)
      None
    } else if (is("(?is)^INSERT\\s+INTO\\b") && {
      val n = "(?is)^INSERT\\s+INTO\\s+([\\w.\"]+)".r
        .findFirstMatchIn(t).map(_.group(1))
      n.exists(operators.Rules.hasInsertRules)
    }) {
      // ON INSERT rewrite rules (rewriteHandler.c): fire each
      // qualifying rule's action over the inserted row set
      operators.Rules.routeInsert(spark, stripSemi(t), s => { execute(spark, s); () })
      None
    } else if (is("(?is)^INSERT\\s+INTO\\b") && {
      val n = "(?is)^INSERT\\s+INTO\\s+([\\w.\"]+)".r
        .findFirstMatchIn(t).map(_.group(1))
      n.exists(operators.Triggers.hasInsertTrigger)
    }) {
      // BEFORE INSERT row triggers (trigger.c): the NEW.col
      // assignments fuse into the insert's own projection
      operators.Triggers.routeInsert(spark, stripSemi(t), s => { execute(spark, s); () })
      None
    } else if (operators.Rules.isCreateRule(t)) {
      operators.Rules.create(spark, stripSemi(t)); None
    } else if (is("(?is)^DROP\\s+RULE\\b")) {
      val m = ("(?is)^DROP\\s+RULE\\s+(?:IF\\s+EXISTS\\s+)?(\"?[\\w]+\"?)" +
        "\\s+ON\\s+([\\w.\"]+)").r.findFirstMatchIn(t).getOrElse(
        throw new IllegalArgumentException(s"cannot parse DROP RULE: $t"))
      operators.Rules.dropRule(m.group(1), m.group(2).replace("\"", "")); None
    } else if (is("(?is)^INSERT\\s+INTO\\s+(pg_catalog\\.)?pg_(statistic|class|attribute)\\b")) {
      // direct system-catalog surgery (allow_system_table_mods): the
      // planner statistics it plants only steer PG's costing — the
      // engine's CBO reads ANALYZE output instead; accepted no-op
      None
    } else if (is("(?is)^INSERT\\s+INTO\\b") && {
      val n = "(?is)^INSERT\\s+INTO\\s+([\\w.\"]+)".r
        .findFirstMatchIn(t).map(_.group(1).replace("\"", ""))
      n.exists(nm => operators.GreengageDdl.childTarget(nm).isDefined)
    }) {
      // INSERT into a partition-child relation: the parent IS the
      // store (PG checks the child's bound constraint; rows outside
      // it would error there — accepted here, documented divergence)
      val m = "(?is)^(INSERT\\s+INTO\\s+)([\\w.\"]+)([\\s\\S]*)$".r
        .findFirstMatchIn(stripSemi(t)).get
      val parent = operators.GreengageDdl
        .childTarget(m.group(2).replace("\"", "")).get._1
      execute(spark, m.group(1) + parent + m.group(3))
    } else if (is("(?is)^INSERT\\s+INTO\\s+[\\w.\"]+\\s+DEFAULT\\s+VALUES\\s*;?\\s*$")) {
      // INSERT ... DEFAULT VALUES (gram.y insert_rest): one row of
      // column defaults (SERIAL sequences advance, like PG)
      val tbl = "(?is)^INSERT\\s+INTO\\s+([\\w.\"]+)".r
        .findFirstMatchIn(t).get.group(1).replace("\"", "")
      import org.apache.spark.sql.functions.lit
      val cols = spark.table(tbl).schema.fields.map { f =>
        (operators.GreengageDdl.serialSeq(tbl, f.name) match {
          case Some(seq) =>
            lit(operators.GreengageDdl.nextvalDense(seq, 1))
          case None =>
            if (f.metadata.contains("CURRENT_DEFAULT"))
              org.apache.spark.sql.functions.expr(
                f.metadata.getString("CURRENT_DEFAULT"))
            else lit(null)
        }).cast(f.dataType).as(f.name)
      }
      val one = spark.range(1).select(cols.toIndexedSeq: _*)
      one.createOrReplaceTempView("__graft_defv")
      try spark.sql(s"INSERT INTO $tbl SELECT * FROM __graft_defv")
      finally spark.catalog.dropTempView("__graft_defv")
      None
    } else if (is("(?is)^INSERT\\s+INTO\\b") && {
      val n = "(?is)^INSERT\\s+INTO\\s+([\\w.\"]+)".r
        .findFirstMatchIn(t).map(_.group(1))
      n.exists(operators.ExternalTable.isWritable)
    }) {
      // INSERT into a WRITABLE EXTERNAL TABLE → its registered sink
      val m = "(?is)^INSERT\\s+INTO\\s+([\\w.\"]+)\\s+(.*)$".r
        .findFirstMatchIn(stripSemi(t)).get
      operators.ExternalTable.insertInto(spark, m.group(1),
        spark.sql(operators.PgSql.rewrite(m.group(2))))
      None
    } else if (is("(?is)^INSERT\\s+INTO\\b") &&
        topKeyword(stripSemi(t), "ON CONFLICT") >= 0) {
      // INSERT ... ON CONFLICT (keys) DO NOTHING | DO UPDATE SET ...
      // (PG 9.5 upsert, gram.y OnConflictExpr) → the MERGE special
      // cases Dml.upsert/merge implement. Target-row references in SET
      // must be qualified (excluded.col / <table>.col), as dump
      // scripts write them.
      val st = stripSemi(t)
      val oc = topKeyword(st, "ON CONFLICT")
      val insertSql = st.substring(0, oc)
      val clause = st.substring(oc + "ON CONFLICT".length).trim
      val m = "(?is)^(?:\\(([^)]*)\\)\\s*)?DO\\s+(NOTHING|UPDATE\\s+SET\\s+(.*))$".r
        .findFirstMatchIn(clause).getOrElse(throw new IllegalArgumentException(
          s"cannot parse ON CONFLICT clause: $t"))
      val im = "(?is)^INSERT\\s+INTO\\s+([\\w.\"]+)\\s*(\\([^)]*\\))?\\s*(.*)$".r
        .findFirstMatchIn(insertSql).get
      val table = im.group(1).replace("\"", "")
      val keys = Option(m.group(1)).map(ks =>
        operators.GreengageDdl.splitTop(ks).map(_.replace("\"", "").trim))
        .getOrElse(throw new IllegalArgumentException(
          "ON CONFLICT requires an explicit conflict target column list"))
      val tbl = spark.table(table)
      val body = spark.sql(operators.PgSql.rewrite(im.group(3)))
      val cols = Option(im.group(2)).map(cl => operators.GreengageDdl.splitTop(
          cl.stripPrefix("(").stripSuffix(")")).map(_.replace("\"", "")))
        .getOrElse(tbl.columns.toSeq)
      val source = body.toDF(cols: _*).select(tbl.columns.map { c =>
        if (cols.contains(c)) org.apache.spark.sql.functions.col(c)
        else org.apache.spark.sql.functions.lit(null)
          .cast(tbl.schema(c).dataType).as(c)
      }.toSeq: _*)
      operators.PgTypes.validate(source, table,
        tbl.columns.map(c => c.toLowerCase -> c).toMap)
      if (m.group(2).trim.equalsIgnoreCase("NOTHING"))
        operators.Dml.upsert(spark, table, source, keys, doNothing = true)
      else {
        val sets = operators.GreengageDdl.splitTop(m.group(3)).map { a =>
          val Array(l, r) = a.split("=", 2)
          val ex = r.trim
            .replaceAll("(?i)\\bexcluded\\.", "s.")
            .replaceAll("(?i)\\b" + java.util.regex.Pattern.quote(table) + "\\.", "t.")
          l.trim.replace("\"", "") ->
            org.apache.spark.sql.functions.expr(operators.PgSql.rewrite(ex))
        }.toMap
        operators.Dml.merge(spark, table, source, keys,
          whenMatchedUpdate = sets)
      }
      None
    } else if (is("(?is)^INSERT\\s+INTO\\b") &&
        topKeyword(stripSemi(t), "RETURNING") >= 0) {
      // INSERT ... RETURNING: run the insert, then project the
      // inserted rows under the table's column names (NEW image)
      val st = stripSemi(t)
      val r = topKeyword(st, "RETURNING")
      val items = operators.GreengageDdl.splitTop(
        st.substring(r + "RETURNING".length)).map(operators.PgSql.rewrite)
      val insertSql = st.substring(0, r)
      val m = "(?is)^INSERT\\s+INTO\\s+([\\w.\"]+)\\s*(\\([^)]*\\))?\\s*(.*)$".r
        .findFirstMatchIn(insertSql).get
      val table = m.group(1).replace("\"", "")
      val tbl = spark.table(table)
      val body = spark.sql(operators.PgSql.rewrite(m.group(3)))
      val named0 = Option(m.group(2)) match {
        case None => body.toDF(tbl.columns.toSeq: _*)
        case Some(colList) =>
          val cols = operators.GreengageDdl.splitTop(
            colList.stripPrefix("(").stripSuffix(")")).map(_.replace("\"", ""))
          val renamed = body.toDF(cols: _*)
          renamed.select(tbl.columns.map { c =>
            if (cols.contains(c)) org.apache.spark.sql.functions.col(c)
            else org.apache.spark.sql.functions.lit(null)
              .cast(tbl.schema(c).dataType).as(c)
          }.toSeq: _*)
      }
      // RETURNING carries the table's column types, not the VALUES
      // literals' (PG applies the input functions before returning)
      val named = named0.select(tbl.columns.map(c =>
        org.apache.spark.sql.functions.col(c)
          .cast(tbl.schema(c).dataType).as(c)).toSeq: _*)
      operators.PgTypes.validate(named, table,
        tbl.columns.map(c => c.toLowerCase -> c).toMap)
      spark.sql(operators.PgSql.rewrite(insertSql))
      Some(named.selectExpr(items: _*))
    } else if (is("(?is)^INSERT\\s+INTO\\b") && {
      val n = "(?is)^INSERT\\s+INTO\\s+([\\w.\"]+)".r
        .findFirstMatchIn(t).map(_.group(1).replace("\"", ""))
      n.exists(nm => operators.PgTypes.constraintsFor(nm).nonEmpty)
    }) {
      // INSERT into a table with enum/domain columns: enforce the check
      // constraints over the batch (ONE aggregate) before the write —
      // PG's "invalid input value for enum" contract. The source is
      // evaluated twice (validate + insert); dump-replay inserts are
      // VALUES lists, so the recheck is a few rows.
      val st = stripSemi(t)
      val m = "(?is)^INSERT\\s+INTO\\s+([\\w.\"]+)\\s*(\\([^)]*\\))?\\s*(.*)$".r
        .findFirstMatchIn(st).get
      val table = m.group(1).replace("\"", "")
      val body = spark.sql(operators.PgSql.rewrite(m.group(3)))
      val cols = Option(m.group(2)).map(cl => operators.GreengageDdl.splitTop(
          cl.stripPrefix("(").stripSuffix(")")).map(_.replace("\"", "")))
        .getOrElse(spark.table(table).columns.toSeq)
      val byName = cols.zip(body.columns).map {
        case (c, dc) => c.toLowerCase -> dc }.toMap
      operators.PgTypes.validate(body, table, byName)
      try spark.sql(operators.PgSql.rewrite(st))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getErrorClass).exists(c =>
              c.startsWith("INCOMPATIBLE_DATA_FOR_TABLE") ||
                c.startsWith("INSERT_COLUMN_ARITY_MISMATCH")) =>
          // composite-typed targets (e.g. COMPLEX) take their string
          // literals through the input-function coercion path
          insertWithAssignmentCasts(spark, st)
        case e: Exception
            if String.valueOf(e.getMessage)
              .contains("CAST_INVALID_INPUT") =>
          // ANSI store-assignment cast failed at RUNTIME (e.g. a PG
          // datestyle timestamp string); the failed job did not
          // commit — retry through the input-function coercion path
          insertWithAssignmentCasts(spark, st)
      }
      None
    } else if (is("(?is)^SELECT\\b") &&
        topKeyword(stripSemi(t), "INTO") >= 0) {
      // SELECT ... INTO newtable FROM ... (gram.y into_clause): the
      // pre-CTAS spelling — lift the INTO target out and run CTAS
      val st = stripSemi(t)
      val i = topKeyword(st, "INTO")
      val m = ("(?is)^(?:(?:TEMP|TEMPORARY|UNLOGGED)\\s+)?(?:TABLE\\s+)?" +
        "([\\w.\"]+)\\s*(.*)$").r.findFirstMatchIn(
          st.substring(i + "INTO".length).trim).getOrElse(
        throw new IllegalArgumentException(s"cannot parse SELECT INTO: $t"))
      operators.GreengageDdl.execute(spark,
        s"CREATE TABLE ${m.group(1)} AS ${st.substring(0, i)} ${m.group(2)}")
      None
    } else if (is("(?is)^DELETE\\s+FROM\\b")) {
      val m = deleteRe.findFirstMatchIn(stripSemi(t)).getOrElse(
        throw new IllegalArgumentException(s"cannot parse DELETE: $t"))
      // DELETE FROM t [AS] alias (gram.y relation_expr_opt_alias):
      // references in the WHERE are alias-qualified — strip the alias
      // qualifier so the condition resolves against the bare table
      val (rest0, returning) = splitReturning(m.group(2))
      val aliasM = "(?is)^\\s*(?:AS\\s+)?([A-Za-z_]\\w*)\\b(.*)$".r
        .findFirstMatchIn(rest0).filter(am => !Set("where", "using")
          .contains(am.group(1).toLowerCase))
      val rest = aliasM match {
        case Some(am) =>
          // requalify by the REAL table name (not bare): a stripped
          // reference inside a subquery with same-named columns would
          // turn the outer ref ambiguous (parse_relation.c resolves
          // the alias to the delete target's RTE)
          val tgt = m.group(1).replace("\"", "").split("\\.").last
          operators.PgSql.replaceAllOutsideLiterals(am.group(2),
            "(?i)\\b" + java.util.regex.Pattern.quote(am.group(1)) + "\\.",
            java.util.regex.Matcher.quoteReplacement(tgt + "."))
        case None => rest0
      }
      val w = topKeyword(rest, "WHERE")
      val u = topKeyword(rest, "USING")
      // DML on a partition-child relation routes to the parent
      // restricted to the child's slice (the parent IS the store)
      val (table, childPred) =
        operators.GreengageDdl.childTarget(m.group(1).replace("\"", "")) match {
          case Some((parent, pred)) => (parent, Some(pred))
          case None => (m.group(1).replace("\"", ""), None)
        }
      if (u >= 0) {
        // DELETE FROM t USING s [alias] WHERE join-cond (gram.y
        // using_clause) → anti join. RETURNING materializes the OLD
        // images of rows with a match BEFORE the swap (wCTE contract)
        val retUsing = returning.map { items =>
          val usingTxt0 = rest.substring(u + "USING".length,
            if (w > u) w else rest.length)
          val condTxt0 = if (w > u) rest.substring(w + "WHERE".length) else "1=1"
          spark.sql(operators.PgSql.rewrite(
            s"""SELECT ${items.mkString(", ")} FROM $table
               |WHERE EXISTS (SELECT 1 FROM $usingTxt0
               |              WHERE $condTxt0)""".stripMargin))
            .localCheckpoint(true)
        }
        if (w < 0) {
          // DELETE FROM t USING s — no WHERE: a cross join qualifies
          // EVERY target row as soon as the source has one row
          val usingText = rest.substring(u + "USING".length)
          val any = spark.sql(operators.PgSql.rewrite(
            s"SELECT 1 FROM $usingText LIMIT 1")).count()
          if (any > 0)
            operators.Dml.deleteWhere(spark, table,
              org.apache.spark.sql.functions.lit(true))
          return retUsing
        }
        val usingText = rest.substring(u + "USING".length, w)
        val condText = rest.substring(w + "WHERE".length)
        try {
          val (src, alias) = parseFromItem(usingText)
          val nDel = operators.Dml.deleteUsing(spark, table, table,
            spark.table(src).alias(alias),
            org.apache.spark.sql.functions.expr(
              operators.PgSql.rewrite(condText)))
          recordAffected(nDel)
        } catch {
          case _: IllegalArgumentException =>
            // a join-shaped USING list (`USING t1 JOIN t2 USING (a)`,
            // gram.y from_list): semantically NOT EXISTS over the
            // joined source — build the kept-rows set in SQL (the
            // outer table name qualifies its own columns) and swap
            val kept = spark.sql(operators.PgSql.rewrite(
              s"SELECT * FROM $table WHERE NOT EXISTS " +
                s"(SELECT 1 FROM $usingText WHERE $condText)"))
            val nDel = operators.Dml.deleteKeeping(spark, table, kept)
            recordAffected(nDel)
        }
        return retUsing
      }
      require(rest.trim.isEmpty || w >= 0, s"cannot parse DELETE tail: $rest")
      val cond0 =
        if (w >= 0) org.apache.spark.sql.functions.expr(
          operators.PgSql.rewrite(rest.substring(w + "WHERE".length)))
        else org.apache.spark.sql.functions.lit(true)
      val cond = childPred
        .map(p => cond0 && org.apache.spark.sql.functions.expr(p))
        .getOrElse(cond0)
      // RETURNING sees the deleted rows' OLD image — materialized
      // BEFORE the staged swap replaces the files under the plan
      val ret = returning.map(items =>
        spark.table(table).where(cond)
          .selectExpr(items: _*).localCheckpoint(true))
      // an inheritance parent's DELETE touches every member (PG plans
      // one ModifyTable over the whole inheritance set)
      locally {
        val n = operators.GreengageDdl.inheritanceMembers(table)
          .map(mb => operators.Dml.deleteWhere(spark, mb, cond)).sum
        recordAffected(n)
      }
      ret
    } else if (is("(?is)^UPDATE\\b")) {
      // UPDATE t [AS] alias SET (gram.y relation_expr_opt_alias):
      // strip the alias, alias-qualified refs fall back to the table
      val tNoAlias = "(?is)^(UPDATE\\s+[\\w.\"]+)\\s+(?:AS\\s+)?(\\w+)\\s+SET\\b".r
        .findFirstMatchIn(stripSemi(t)) match {
        case Some(am) if !am.group(2).equalsIgnoreCase("SET") =>
          val tbl = am.group(1).replaceFirst("(?is)^UPDATE\\s+", "")
          // masked replacement: an alias token inside a string
          // literal (SET txt = 'm.x') must survive untouched
          operators.PgSql.replaceAllOutsideLiterals(
            am.group(1) + " SET" + stripSemi(t).substring(am.end),
            "(?i)\\b" +
              java.util.regex.Pattern.quote(am.group(2)) + "\\.",
            java.util.regex.Matcher.quoteReplacement(tbl) + ".")
        case _ => stripSemi(t)
      }
      val m = updateRe.findFirstMatchIn(tNoAlias).getOrElse(
        throw new IllegalArgumentException(s"cannot parse UPDATE: $t"))
      val (rest, returning) = splitReturning(m.group(2))
      // locate the top-level WHERE: one inside a SET literal or a
      // subquery must not cut the statement
      val w = topKeyword(rest, "WHERE")
      val f = topKeyword(rest, "FROM")
      val setPart =
        if (f >= 0) rest.substring(0, f)
        else if (w >= 0) rest.substring(0, w) else rest
      val updTable = m.group(1).replace("\"", "")
      val assignments = operators.GreengageDdl.splitTop(setPart).map { a =>
        val Array(k, v) = a.split("=", 2)
        val colName = k.trim.replace("\"", "")
        val vt = v.trim
        colName -> (
          if (vt.equalsIgnoreCase("DEFAULT")) {
            // SET col = DEFAULT (rewriteTargetListIU): the declared
            // column default, NULL when none
            val fld = spark.table(updTable).schema
              .find(_.name.equalsIgnoreCase(colName))
            val dflt = fld.filter(_.metadata.contains("CURRENT_DEFAULT"))
              .map(_.metadata.getString("CURRENT_DEFAULT"))
            org.apache.spark.sql.functions.expr(
              dflt.getOrElse("CAST(NULL AS " +
                fld.map(_.dataType.sql).getOrElse("STRING") + ")"))
          } else if (vt.matches("(?s)^'([^']|'')*'$") &&
              (try spark.table(updTable).schema
                .find(_.name.equalsIgnoreCase(colName)).exists(_.dataType
                  .isInstanceOf[org.apache.spark.sql.types.DayTimeIntervalType])
              catch { case _: Exception => false }))
            // a bare string literal assigned to a day-time interval
            // column parses with PG's interval grammar (DecodeInterval)
            org.apache.spark.sql.functions.expr(
              s"make_dt_interval(0, 0, 0, pg_interval_us($vt) / 1e6)")
          else org.apache.spark.sql.functions.expr(
            operators.PgSql.rewrite(vt)))
      }.toMap pipe { setAssigns =>
        // BEFORE UPDATE row triggers fire over the NEW image (SET
        // already applied): NEW.x in a trigger rhs reads the SET
        // expression when x is assigned, the stored column otherwise
        val trig = operators.Triggers.rowAssigns(updTable, "UPDATE")
        if (trig.isEmpty) setAssigns
        else {
          val setTexts = operators.GreengageDdl.splitTop(setPart).map { a =>
            val Array(k, v) = a.split("=", 2)
            k.trim.replace("\"", "").toLowerCase -> v.trim
          }.toMap
          trig.foldLeft(setAssigns) { case (acc, (c, rhs)) =>
            val resolved = rhs.replaceAll("(?i)\\bNEW\\s*\\.\\s*(\\w+)", "$1")
            val inlined = setTexts.foldLeft(resolved) { case (s, (sc, sv)) =>
              operators.PgSql.replaceAllOutsideLiterals(s,
                "(?i)(?<![\\w.])" + java.util.regex.Pattern.quote(sc) +
                  "(?![\\w(])",
                java.util.regex.Matcher.quoteReplacement(s"($sv)"))
            }
            acc + (c -> org.apache.spark.sql.functions.expr(
              operators.PgSql.rewrite(inlined)))
          }
        }
      }
      if (f >= 0) {
        // UPDATE t SET ... FROM s [alias] WHERE join-cond (gram.y
        // from_clause on UPDATE) → join-update
        require(returning.isEmpty, "RETURNING with FROM is not supported")
        require(w > f, s"UPDATE ... FROM needs a WHERE join condition: $t")
        val fromText = rest.substring(f + "FROM".length, w)
        val condText = rest.substring(w + "WHERE".length)
        try {
          val (src, alias) = parseFromItem(fromText)
          operators.Dml.updateFrom(spark, m.group(1).replace("\"", ""),
            m.group(1).replace("\"", ""), spark.table(src).alias(alias),
            org.apache.spark.sql.functions.expr(
              operators.PgSql.rewrite(condText)),
            assignments)
        } catch {
          case _: IllegalArgumentException =>
            // a FROM LIST (`FROM r, s` — gram.y from_list) or derived
            // items (`FROM (VALUES(..)) AS v(i,j)`): flatten the
            // joined source into uniquely-named columns so the
            // condition and assignments keep their table qualifiers
            // (`r.b` → `r__b`) over one derived source
            val items: Seq[(String, Seq[String])] =
              operators.GreengageDdl.splitTop(fromText).map { it0 =>
                val it = it0.trim
                if (it.startsWith("(")) {
                  val am = "(?is)\\)\\s*(?:AS\\s+)?(\\w+)\\s*(\\(([^)]*)\\))?\\s*$".r
                    .findFirstMatchIn(it).getOrElse(
                      throw new IllegalArgumentException(
                        s"cannot parse derived FROM item: $it"))
                  val cols = Option(am.group(3))
                    .map(_.split(",").map(_.trim).toSeq)
                    .getOrElse(spark.sql(operators.PgSql.rewrite(
                      s"SELECT * FROM $it")).columns.toSeq)
                  (am.group(1), cols)
                } else {
                  val (tbl, al) = parseFromItem(it)
                  (al, spark.table(tbl).columns.toSeq)
                }
              }
            // PG names unaliased function outputs after the function
            // (FigureColname): a derived `select avg(x), r` exposes
            // column "avg" — qualifiers in the statement reference it
            def figure(c: String): String =
              "^([A-Za-z_][A-Za-z_0-9]*)\\(.*\\)$".r
                .findFirstMatchIn(c).map(_.group(1))
                .filterNot(_.equalsIgnoreCase("cast")).getOrElse(c)
            val srcSql = "SELECT " + items.flatMap { case (al, cols) =>
              // backticks: a derived item's column may carry function
              // spelling ("avg(population)") — unquoted it re-parses
              cols.map(c => s"$al.`$c` AS `${al}__${figure(c)}`")
            }.mkString(", ") + " FROM " + fromText
            val targetCols = spark.table(m.group(1).replace("\"", ""))
              .columns.map(_.toLowerCase).toSet
            // a bare column name resolves across the joint namespace
            // (transformExpr): target first, else the UNIQUE source
            val bareMap: Map[String, String] = items
              .flatMap { case (al, cols) => cols.map(c =>
                figure(c).toLowerCase -> s"${al}__${figure(c)}") }
              .groupBy(_._1).collect {
                case (c, hits)
                    if hits.size == 1 && !targetCols.contains(c) =>
                  c -> hits.head._2
              }
            def q(s: String) = {
              // masked replacements: qualifiers/columns inside string
              // literals must not be rewritten
              val qualified = items.foldLeft(s) { case (acc, (al, _)) =>
                operators.PgSql.replaceAllOutsideLiterals(acc,
                  "(?i)\\b" + java.util.regex.Pattern.quote(al) + "\\.(\\w+)",
                  java.util.regex.Matcher.quoteReplacement(al) + "__$1")
              }
              bareMap.foldLeft(qualified) { case (acc, (c, repl)) =>
                operators.PgSql.replaceAllOutsideLiterals(acc,
                  "(?i)(?<![\\w.])" +
                    java.util.regex.Pattern.quote(c) + "(?![\\w(])",
                  java.util.regex.Matcher.quoteReplacement(repl))
              }
            }
            val reAssign = operators.GreengageDdl.splitTop(setPart).map { a =>
              val Array(k, v) = a.split("=", 2)
              k.trim.replace("\"", "") -> org.apache.spark.sql.functions
                .expr(operators.PgSql.rewrite(q(v.trim)))
            }.toMap
            operators.Dml.updateFrom(spark, m.group(1).replace("\"", ""),
              m.group(1).replace("\"", ""),
              spark.sql(operators.PgSql.rewrite(srcSql)),
              org.apache.spark.sql.functions.expr(
                operators.PgSql.rewrite(q(condText))),
              reAssign)
        }
        return None
      }
      val cond0 =
        if (w >= 0) org.apache.spark.sql.functions.expr(
          operators.PgSql.rewrite(rest.substring(w + "WHERE".length)))
        else org.apache.spark.sql.functions.lit(true)
      // UPDATE against a partition-child view routes to the parent
      // restricted to the child's slice
      val (table, cond) =
        operators.GreengageDdl.childTarget(m.group(1).replace("\"", "")) match {
          case Some((parent, pred)) =>
            (parent, cond0 && org.apache.spark.sql.functions.expr(pred))
          case None => (m.group(1).replace("\"", ""), cond0)
        }
      // RETURNING sees the NEW image of the updated rows (PG returns
      // post-update values), materialized before the swap
      val ret = returning.map { items =>
        val src = spark.table(table).where(cond)
        val updated = src.select(src.columns.map { c =>
          assignments.getOrElse(c, org.apache.spark.sql.functions.col(c)).as(c)
        }.toSeq: _*)
        updated.selectExpr(items: _*).localCheckpoint(true)
      }
      locally {
        val n = operators.GreengageDdl.inheritanceMembers(table)
          .map(mb => operators.Dml.updateWhere(spark, mb, cond, assignments))
          .sum
        recordAffected(n)
      }
      ret
    } else if (is("(?is)^(SELECT|WITH)\\b") &&
        operators.PgSql.withTies(t).isDefined) {
      // FETCH FIRST n ROWS WITH TIES (PG 13): peers of the n-th row on
      // the ORDER BY key are kept — a rank() window, since Spark has
      // no TIES spelling; the rank column drops from the result.
      // Ordinal keys (ORDER BY 1) must be resolved to output columns
      // first: Spark's orderByOrdinal applies only to top-level sorts,
      // so a bare integer inside the window spec would be a CONSTANT
      // (rank 1 for every row — all rows returned silently).
      val (base, keys, n) = operators.PgSql.withTies(t).get
      val baseDf = spark.sql(operators.PgSql.rewrite(base))
      val cols = baseDf.columns
      val resolved = operators.GreengageDdl.splitTop(keys).map { item =>
        val it = item.trim
        "^(\\d+)\\b(.*)$".r.findFirstMatchIn(it) match {
          case Some(m) =>
            val i = m.group(1).toInt
            require(i >= 1 && i <= cols.length,
              s"ORDER BY position $i is not in select list (1..${cols.length})")
            "`" + cols(i - 1).replace("`", "``") + "`" + m.group(2)
          case None => it
        }
      }.mkString(", ")
      Some(spark.sql(operators.PgSql.rewrite(
        s"""SELECT * FROM (SELECT __t.*, rank() OVER (ORDER BY $resolved)
           |AS __tie_r FROM ($base) __t) WHERE __tie_r <= $n
           |ORDER BY $resolved""".stripMargin)).drop("__tie_r"))
    } else if ({
      val m = "(?is)^\\s*SELECT\\s+([\\w.]+)\\s*\\((.*)\\)\\s*;?\\s*$".r
        .findFirstMatchIn(t)
      m.exists(mm => operators.PlDo.isVoidFunction(mm.group(1)))
    }) {
      // SELECT f(args) of a VOID plpgsql function: run the body for
      // its side effects; PG's result is one row of an empty VOID cell
      val mm = "(?is)^\\s*SELECT\\s+([\\w.]+)\\s*\\((.*)\\)\\s*;?\\s*$".r
        .findFirstMatchIn(t).get
      operators.PlDo.callVoidFunction(spark, mm.group(1), mm.group(2))
      Some(spark.sql("SELECT CAST(NULL AS STRING) AS " +
        mm.group(1).split("\\.").last.toLowerCase))
    } else if (is("(?is)^SELECT\\b") &&
        operators.PgSql.topLevelInto(stripSemi(t)).isDefined) {
      // SELECT ... INTO name (gram.y into_clause) is CTAS with the
      // select list as the new table's shape; TEMP/UNLOGGED drop
      val (name, rest) = operators.PgSql.topLevelInto(stripSemi(t)).get
      execute(spark, s"CREATE TABLE $name AS $rest")
    } else if (is("(?is)^INSERT\\s+INTO\\b") &&
        insertNeedsReorder(spark, t)) {
      // positional INSERT into a partition-reordered table: map by the
      // PG-declared order, not the physical schema (silent column
      // mis-assignment otherwise when the types happen to line up)
      insertWithAssignmentCasts(spark, stripSemi(t)); None
    } else if (is("(?is)^DROP\\s+(TABLE|VIEW)\\b") && {
      val names = operators.GreengageDdl.splitTop(
        "(?is)^DROP\\s+(TABLE|VIEW)\\s+(IF\\s+EXISTS\\s+)?".r
          .replaceFirstIn(stripSemi(t), "")
          .replaceAll("(?is)\\s+(CASCADE|RESTRICT)\\s*$", ""))
      names.length > 1 ||
        "(?is)\\b(CASCADE|RESTRICT)\\s*$".r.findFirstIn(stripSemi(t)).isDefined ||
        names.exists(n => operators.GreengageDdl.isInheritanceMember(n.trim))
    }) {
      // PG's multi-target DROP a, b, c and CASCADE/RESTRICT tails
      // (gram.y DropStmt) — Spark drops one relation, no tail. CASCADE
      // degrades to dropping just the named relation: dependent views
      // aren't tracked (they fail at next use instead, loudly).
      val m = "(?is)^DROP\\s+(TABLE|VIEW)\\s+(IF\\s+EXISTS\\s+)?".r
        .findFirstMatchIn(stripSemi(t)).get
      val kind = m.group(1).toUpperCase
      val ifE = if (m.group(2) != null) "IF EXISTS " else ""
      operators.GreengageDdl.splitTop(
        "(?is)^DROP\\s+(TABLE|VIEW)\\s+(IF\\s+EXISTS\\s+)?".r
          .replaceFirstIn(stripSemi(t), "")
          .replaceAll("(?is)\\s+(CASCADE|RESTRICT)\\s*$", ""))
        .foreach { n =>
          // inheritance: dropping a parent drops its view + __only;
          // dropping a child detaches it from its parents' views
          operators.Rules.clearTable(n.trim)
          operators.Triggers.clearTable(n.trim)
          if (!operators.GreengageDdl.handleInheritanceDrop(spark, n.trim))
            spark.sql(s"DROP $kind $ifE${n.trim}")
        }
      None
    } else copyProgRe.findFirstMatchIn(t) match {
      case Some(m) => runCopyProgram(spark, m); None
      case None => copyRe.findFirstMatchIn(t) match {
        case Some(m) => runCopy(spark, m); None
        case None =>
          // introspection queries see a fresh catalog snapshot
          if (operators.PgCatalog.mentionsCatalog(t))
            operators.PgCatalog.register(spark)
          // get_ao_distribution('t'::regclass) (pg_proc.sql:149):
          // per-segment tuple counts under the table's DISTRIBUTED BY
          // placement, via the bit-exact cdbhash (functions.GpHash)
          if (t.toLowerCase.contains("get_ao_distribution"))
            t = rewriteAoDistribution(spark, t)
          // pg_relation_size / gp_update_ao_master_stats: catalog math
          // over footer metadata (no data scan)
          if (t.toLowerCase.contains("pg_relation_size") ||
              t.toLowerCase.contains("gp_update_ao_master_stats"))
            t = rewriteRelationStats(spark, t)
          // has_table_privilege (acl.c): a single-user session holds
          // every privilege — constant true after an existence check
          if (t.toLowerCase.contains("has_table_privilege"))
            t = rewriteHasTablePrivilege(spark, t)
          // whole-row reference in array_agg (array_agg(t) over FROM t)
          // → a struct over the relation's PG-ordered columns
          if (t.toLowerCase.contains("array_agg"))
            t = rewriteWholeRowAgg(spark, t)
          // data-modifying CTEs re-enter the router per wCTE
          if (is("(?is)^WITH\\b") && operators.DmlCte.hasDml(stripSemi(t)))
            operators.DmlCte.run(spark, stripSemi(t), execute)
          else operators.Tablefunc.route(spark, t)
            .orElse {
              // registered CREATE FUNCTION macros inline first (no-op
              // scan when none is called), then the PG lexical rewrite
              try Some(operators.BpcharEq(spark,
                operators.PgIntDiv(spark, spark.sql(
                  operators.PgSql.rewrite(operators.SqlFunctions.expand(
                    expandQualifiedStars(spark,
                      expandReorderedStar(spark, t))))))))
              catch {
                case e: org.apache.spark.sql.AnalysisException
                    if is("(?is)^CREATE\\s+(OR\\s+REPLACE\\s+)?VIEW\\b") &&
                      Option(e.getErrorClass).exists(c =>
                        c.startsWith("CREATE_PERMANENT_VIEW_WITHOUT_ALIAS") ||
                          // a body over the catalog compat TEMP views
                          // (pg_partition_rule &c) can't be a catalog
                          // view — degrade to a session view
                          c.startsWith("INVALID_TEMP_OBJ_REFERENCE")) =>
                  // PG auto-names view columns after the expression's
                  // function (parse_target FigureColname); Spark
                  // demands explicit aliases — synthesize them
                  createViewAutoAlias(spark, stripSemi(t)); None
                case e: org.apache.spark.sql.AnalysisException
                    if is("(?is)^\\s*WITH\\b") &&
                      Option(e.getErrorClass).exists(
                        _.startsWith("ASSIGNMENT_ARITY_MISMATCH")) =>
                  // a WITH alias list shorter than its body (legal in
                  // PG) — extend and retry
                  extendShortCteAliasLists(spark, t) match {
                    case Some(t2) => Some(operators.BpcharEq(spark,
                      operators.PgIntDiv(spark, spark.sql(
                        operators.PgSql.rewrite(
                          operators.SqlFunctions.expand(t2))))))
                    case None => throw e
                  }
                case e: org.apache.spark.sql.AnalysisException
                    if is("(?is)^INSERT\\s+INTO\\b") &&
                      Option(e.getErrorClass).exists(c =>
                        c.startsWith("INCOMPATIBLE_DATA_FOR_TABLE") ||
                          // PG fills unmentioned trailing columns with
                          // NULL; Spark requires full arity
                          c.startsWith("INSERT_COLUMN_ARITY_MISMATCH")) =>
                  insertWithAssignmentCasts(spark, stripSemi(t)); None
                case e: Exception
                    if is("(?is)^INSERT\\s+INTO\\b") &&
                      Option(e.getMessage).exists(msg =>
                        msg.contains("CAST_INVALID_INPUT") ||
                          // custom input-function expressions inside a
                          // VALUES list (TO_LSEG over concat) don't
                          // constant-fold as an inline table
                          msg.contains("INVALID_INLINE_TABLE")) =>
                  // a datestyle-dependent text value ('1-2-07' under
                  // MDY) that Spark's plain cast refuses — the
                  // projection path's lenient datetime chain takes it
                  insertWithAssignmentCasts(spark, stripSemi(t)); None
              }
            }
      }
    }
  }

  /** ANALYZE → table + column CBO statistics. TIMESTAMP_NTZ columns
    * are excluded from the column pass: Spark's FilterEstimation
    * crashes on NTZ column stats (EstimationUtils.toDouble has no
    * TimestampNTZType case — MatchError inside the optimizer), and a
    * missing column stat only degrades the estimate. */
  private def analyzeTable(spark: SparkSession, name: String): Unit = {
    import org.apache.spark.sql.types._
    val fields = spark.table(name).schema.fields
    val safe = fields.filterNot(f => f.dataType == TimestampNTZType ||
      f.dataType.isInstanceOf[ArrayType] ||
      f.dataType.isInstanceOf[MapType] ||
      f.dataType.isInstanceOf[StructType] ||
      f.dataType.isInstanceOf[DayTimeIntervalType] ||
      f.dataType.isInstanceOf[YearMonthIntervalType]) // no column stats
    if (safe.length == fields.length)
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
    else if (safe.nonEmpty)
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR COLUMNS " +
        safe.map(f => s"`${f.name}`").mkString(", "))
    else
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS")
  }

  /** PG assignment coercion on INSERT (parse_coerce.c
    * COERCION_ASSIGNMENT): source rows coerce column-by-column to the
    * target types — '2018-1-10' into a date column, text into
    * numerics — where Spark's store-assignment check refuses the
    * implicit cast. Engaged only as the fallback when the native
    * INSERT fails that check, so typed inserts keep their original
    * plan; the cast projection runs through a SQL INSERT so
    * bucketed/partitioned writes stay native. Malformed values error
    * at runtime exactly as PG's input functions do (ANSI cast). */
  /** CREATE VIEW whose body has unnamed expression columns: derive
    * each missing alias the way PG's FigureColname does — the leading
    * identifier of the generated column text (`percentile_cont(...)` →
    * `percentile_cont`) — dedupe, and re-issue with explicit aliases. */
  private def createViewAutoAlias(spark: SparkSession, st: String): Unit = {
    val m = ("(?is)^CREATE\\s+(OR\\s+REPLACE\\s+)?VIEW\\s+([\\w.\"]+)\\s*" +
      "(\\([^)]*\\))?\\s*AS\\s+(.*)$").r.findFirstMatchIn(st).getOrElse(
        throw new IllegalArgumentException(s"cannot parse CREATE VIEW: $st"))
    val body = operators.PgIntDiv(spark,
      spark.sql(operators.PgSql.rewrite(m.group(4))))
    val used = scala.collection.mutable.Set[String]()
    val aliases = body.columns.map { c =>
      val base0 = c.takeWhile(ch => ch.isLetterOrDigit || ch == '_')
      val base = if (base0.isEmpty || base0.head.isDigit) "column" else base0
      var a = base; var i = 1
      while (used.contains(a.toLowerCase)) { a = s"$base$i"; i += 1 }
      used += a.toLowerCase
      a
    }
    // registered as a session view: a catalog view can't reference the
    // plan-level rewrites (PgIntDiv) the body needs, and PG regress
    // views are session-lived anyway
    val named = Option(m.group(3)) match {
      case Some(cl) => body.toDF(operators.GreengageDdl.splitTop(
        cl.stripPrefix("(").stripSuffix(")")).map(_.trim): _*)
      case None => body.toDF(aliases.toIndexedSeq: _*)
    }
    val viewName = m.group(2).replace("\"", "")
    if (viewName.contains(".")) {
      // temp views cannot carry a schema: re-issue as a CATALOG view,
      // aliasing each analyzed output column explicitly (the body's
      // own names are stable — they came from the analyzed plan). The
      // legacy flag lets inner derived-table aliases through — every
      // OUTPUT column here carries an explicit alias, which is what
      // the check is for (PG's FigureColname names these itself)
      val sel = body.columns.zip(named.columns).map { case (in, a) =>
        s"`${in.replace("`", "``")}` AS `$a`" }.mkString(", ")
      val flag = "spark.sql.legacy.allowAutoGeneratedAliasForView"
      val before = spark.conf.getOption(flag)
      spark.conf.set(flag, "true")
      try spark.sql(s"CREATE OR REPLACE VIEW $viewName AS SELECT $sel " +
        s"FROM (${operators.PgSql.rewrite(m.group(4))}) __graft_vab")
      finally before match {
        case Some(v) => spark.conf.set(flag, v)
        case None => spark.conf.unset(flag)
      }
    } else named.createOrReplaceTempView(viewName)
  }

  /** `SELECT [DISTINCT] * FROM t ...` on a partition-reordered table:
    * the hive layout moved partition keys to the schema's end, so a
    * bare star would expose physical order (and ORDER BY ordinals
    * would bind to it). Expand the star to the PG-declared column list
    * (parse_target.c ExpandAllTables order). */
  private def expandReorderedStar(spark: SparkSession, t: String): String = {
    val re = ("(?is)^(\\s*SELECT\\s+(?:DISTINCT\\s+)?)\\*" +
      "(\\s+FROM\\s+([\\w.\"]+)\\s*(?:;|\\s+(?:WHERE|ORDER|GROUP|LIMIT|OFFSET)\\b.*)?)$").r
    re.findFirstMatchIn(t) match {
      case Some(m) =>
        val tbl = m.group(3).replace("\"", "")
        declaredOrder(spark, tbl) match {
          case Some(d) if {
            val phys =
              try spark.table(tbl).columns.toSeq.map(_.toLowerCase)
              catch { case _: Exception => Seq.empty[String] }
            phys.nonEmpty && d.map(_.toLowerCase) != phys
          } => m.group(1) + d.mkString(", ") + m.group(2)
          case _ => t
        }
      case None =>
        // `SELECT * FROM t1 JOIN t2 ...` over plain named tables: when
        // ANY of them is partition-reordered, the bare star must
        // expand per-table in DECLARED order (the join's physical
        // star would surface the hive layout)
        val jm = ("(?is)^(\\s*SELECT\\s+(?:DISTINCT\\s+)?)\\*" +
          "(\\s+FROM\\s+)(.+)$").r.findFirstMatchIn(t)
        jm match {
          case Some(m) =>
            val tail = m.group(3)
            val wm = "(?is)\\b(WHERE|GROUP|ORDER|LIMIT|OFFSET|UNION|HAVING)\\b".r
              .findFirstMatchIn(operators.PgSql.maskLiterals(tail))
            val fromTxt = wm.map(w => tail.substring(0, w.start))
              .getOrElse(tail).stripSuffix(";")
            if (fromTxt.contains("(") || fromTxt.contains(")")) t
            else {
              val refRe = ("(?is)(?:^|\\bJOIN\\s+|,\\s*)([\\w.\"]+)" +
                "(?:\\s+(?:AS\\s+)?(?!(?:ON|JOIN|LEFT|RIGHT|FULL|INNER|" +
                "CROSS|OUTER|USING|NATURAL)\\b)([A-Za-z_]\\w*))?").r
              val refs = refRe.findAllMatchIn(fromTxt.trim).map(rm =>
                (rm.group(1).replace("\"", ""), Option(rm.group(2)))).toSeq
              val anyReordered = refs.exists { case (tbl, _) =>
                declaredOrder(spark, tbl).exists { d =>
                  val phys = try spark.table(tbl).columns.toSeq
                    .map(_.toLowerCase)
                  catch { case _: Exception => Seq.empty[String] }
                  phys.nonEmpty && d.map(_.toLowerCase) != phys
                }
              }
              if (!anyReordered || refs.isEmpty) t
              else {
                val items = refs.flatMap { case (tbl, alias) =>
                  val q = alias.getOrElse(tbl)
                  val cols = declaredOrder(spark, tbl).getOrElse(
                    try spark.table(tbl).columns.toSeq
                    catch { case _: Exception => return t })
                  cols.map(c => s"$q.`$c`")
                }
                m.group(1) + items.mkString(", ") + m.group(2) + tail
              }
            }
          case None => t
        }
    }
  }

  /** Qualified stars (`t.*` / `alias.*`) over partition-reordered
    * tables, in any FROM shape (joins included): expanded to the
    * declared column order for the same reason as the bare star. */
  private def expandQualifiedStars(spark: SparkSession, t: String): String = {
    // positions found on the literal-masked text: a regex pattern
    // '.*' inside a string must never look like a qualified star
    val masked = operators.PgSql.maskLiterals(t)
    val ms = "([A-Za-z_]\\w*)\\s*\\.\\s*\\*".r.findAllMatchIn(masked)
      .toSeq.reverse
    ms.foldLeft(t) { (acc, m) =>
      val name = m.group(1)
      val tbl =
        if (declaredOrder(spark, name).isDefined) Some(name)
        else ("(?is)\\b(?:FROM|JOIN|,)\\s+([\\w.\"]+)\\s+(?:AS\\s+)?" +
          java.util.regex.Pattern.quote(name) + "\\b").r
          .findFirstMatchIn(t).map(_.group(1).replace("\"", ""))
      tbl.flatMap(tb => declaredOrder(spark, tb).filter { d =>
        val phys = try spark.table(tb).columns.toSeq.map(_.toLowerCase)
          catch { case _: Exception => Seq.empty[String] }
        phys.nonEmpty && d.map(_.toLowerCase) != phys
      }) match {
        case Some(d) =>
          acc.substring(0, m.start) + d.map(c => s"$name.$c")
            .mkString(", ") + acc.substring(m.end)
        case None => acc
      }
    }
  }

  /** The PG-declared column order recorded at CREATE time for tables
    * whose hive partition layout reordered the physical schema. */
  private def declaredOrder(spark: SparkSession,
                            table: String): Option[Seq[String]] =
    try {
      spark.sql(s"SHOW TBLPROPERTIES $table('graft.pgcolorder')")
        .collect().headOption.map(_.getString(1))
        .filterNot(_.contains("does not have property"))
        .map(_.split(",").toSeq)
    } catch { case _: Exception => None }

  /** True when a plain INSERT must route through the cast-projection
    * path: (a) a positional insert into a partition-reordered table
    * would silently mis-map columns (hive layout puts partition keys
    * last), or (b) the body contains coerced integer division, which
    * only the DataFrame path can give PG's truncating semantics (a
    * command executes eagerly inside spark.sql, before PgIntDiv could
    * see it). */
  private def insertNeedsReorder(spark: SparkSession, t: String): Boolean = {
    val m = "(?is)^INSERT\\s+INTO\\s+([\\w.\"]+)\\s*(\\([^)]*\\))?\\s*(.*)$".r
      .findFirstMatchIn(t.trim.stripSuffix(";"))
    m.exists { mm =>
      val reorder = mm.group(2) == null && {
        val tbl = mm.group(1).replace("\"", "")
        declaredOrder(spark, tbl).exists(d =>
          try d.map(_.toLowerCase) !=
            spark.table(tbl).columns.map(_.toLowerCase).toSeq
          catch { case _: Exception => false })
      }
      // (c) a SERIAL column the statement does not mention needs its
      // sequence default — only the projection path can assign it
      val serialMissing = {
        val tbl = mm.group(1).replace("\"", "")
        val fields =
          try spark.table(tbl).schema.fieldNames.toSeq
          catch { case _: Exception => Seq.empty[String] }
        val listed = Option(mm.group(2)).map(cl =>
          operators.GreengageDdl.splitTop(
            cl.stripPrefix("(").stripSuffix(")"))
            .map(_.replace("\"", "").trim.toLowerCase).toSet)
        fields.exists(f =>
          operators.GreengageDdl.serialSeq(tbl, f).isDefined &&
            listed.exists(!_.contains(f.toLowerCase)))
      }
      // (d) blank-padded char(n) columns: values store right-trimmed
      // so bpchar comparison/length semantics hold (varlena.c bpchareq
      // ignores trailing blanks) — only the projection path trims
      val hasCharCols = operators.GreengageDdl.charCols(
        mm.group(1).replace("\"", "")).nonEmpty
      // (e) an inheritance parent is a VIEW — the projection path
      // redirects to the parent's own physical table (__only)
      val inhParent = operators.GreengageDdl.isInheritanceParent(
        mm.group(1).replace("\"", ""))
      // (f) box/lseg columns canonicalize their text on insert
      val hasGeoCols = operators.GreengageDdl.geoCols(
        mm.group(1).replace("\"", "")).nonEmpty
      // (g) bounded partitioned tables without a default partition
      // validate the coverage predicate before the write
      val boundCheck = operators.GreengageDdl.needsInsertBoundCheck(
        mm.group(1).replace("\"", ""))
      reorder || serialMissing || hasCharCols || inhParent || hasGeoCols ||
        boundCheck ||
        (mm.group(3).contains("/") && {
        try {
          val body = spark.sql(operators.PgSql.rewrite(
            operators.SqlFunctions.expand(mm.group(3))))
          val analyzed = body.queryExecution.analyzed
          !operators.PgIntDiv.transformPlan(analyzed).fastEquals(analyzed)
        } catch { case _: Exception => false }
      })
    }
  }

  private def insertWithAssignmentCasts(spark: SparkSession,
                                        st: String): Unit = {
    val m = "(?is)^INSERT\\s+INTO\\s+([\\w.\"]+)\\s*(\\([^)]*\\))?\\s*(.*)$".r
      .findFirstMatchIn(st).getOrElse(
        throw new IllegalArgumentException(s"cannot parse INSERT: $st"))
    // INSERT into an inheritance parent stores into the parent's own
    // physical table (<parent>__only) — PG routes to the parent rel
    val table = operators.GreengageDdl.physicalTarget(
      m.group(1).replace("\"", ""))
    val tgt = spark.table(table).schema
    val cols = Option(m.group(2)).map(cl => operators.GreengageDdl.splitTop(
        cl.stripPrefix("(").stripSuffix(")")).map(_.replace("\"", "").trim))
      .orElse(declaredOrder(spark, table))
      .getOrElse(tgt.fieldNames.toSeq)
    // `DEFAULT` items in VALUES rows (gram.y set_clause DEFAULT):
    // resolved here to the declared column default (or typed NULL) —
    // a bare VALUES body cannot carry Spark's DEFAULT resolution
    val bodyTxt = {
      val b0 = m.group(3)
      if ("(?is)^\\s*VALUES\\b".r.findFirstIn(b0).isDefined &&
          "(?i)\\bDEFAULT\\b".r.findFirstIn(b0).isDefined) {
        val inner = b0.trim.replaceFirst("(?is)^VALUES\\s*", "")
        val rows = operators.GreengageDdl.splitTop(inner)
        "VALUES " + rows.map { r0 =>
          val r = r0.trim.stripPrefix("(").stripSuffix(")")
          val items = operators.GreengageDdl.splitTop(r)
          "(" + items.zipWithIndex.map { case (it, k) =>
            if (it.trim.equalsIgnoreCase("DEFAULT") && k < cols.length) {
              val fld = tgt.fields.find(_.name.equalsIgnoreCase(cols(k)))
              fld.filter(_.metadata.contains("CURRENT_DEFAULT"))
                .map(_.metadata.getString("CURRENT_DEFAULT"))
                .getOrElse("CAST(NULL AS " +
                  fld.map(_.dataType.sql).getOrElse("STRING") + ")")
            } else it
          }.mkString(", ") + ")"
        }.mkString(", ")
      } else b0
    }
    val body = operators.PgIntDiv(spark, spark.sql(
      operators.PgSql.rewrite(operators.SqlFunctions.expand(
        expandQualifiedStars(spark,
          // a bare `SELECT * FROM t` body over a partition-reordered
          // source must expand to the DECLARED order — positional
          // mapping against the target reads it left-to-right
          expandReorderedStar(spark, bodyTxt))))))
    require(body.columns.length <= cols.length,
      s"INSERT has more expressions than target columns: $st")
    val b2 = body.toDF(body.columns.indices.map(i => s"__c$i"): _*)
    import org.apache.spark.sql.functions.{col, lit, coalesce, try_to_timestamp}
    import org.apache.spark.sql.types._
    val aligned = tgt.fields.map { f =>
      val i = cols.indexWhere(_.equalsIgnoreCase(f.name))
      if (i >= 0 && i < b2.columns.length) {
        val src = col(s"__c$i")
        val lenient = (f.dataType, b2.schema(s"__c$i").dataType) match {
          // PG's timestamp input function takes many spellings
          // (datetime.c DecodeDateTime); ANSI cast alone rejects them
          case (TimestampType | TimestampNTZType | DateType, StringType) =>
            coalesce(
              try_to_timestamp(src),
              try_to_timestamp(src, lit("yyyy/M/d h:mm:ss a")),
              try_to_timestamp(src, lit("yyyy/M/d H:mm:ss")),
              try_to_timestamp(src, lit("M/d/yyyy h:mm:ss a")),
              try_to_timestamp(src, lit("yyyy-M-d")),
              // slash datestyle '2016/11/09' (datetime.c DecodeDate)
              try_to_timestamp(src, lit("yyyy/M/d")),
              // MDY datestyle with 2-digit year ('1-2-07' → Jan 2
              // 2007; the regress suites pin DateStyle "ISO, MDY") —
              // gated so ISO forms above always win
              org.apache.spark.sql.functions.when(
                src.rlike("^\\d{1,2}-\\d{1,2}-\\d{2}$"),
                try_to_timestamp(src, lit("M-d-yy"))),
              // month-name datestyle '15-JAN-03' / '15-JAN-2003'
              // (datetime.c: a month NAME disambiguates); initcap
              // because the Java formatter wants 'Jan'
              org.apache.spark.sql.functions.when(
                src.rlike("^\\d{1,2}-[A-Za-z]{3}-\\d{2}$"),
                try_to_timestamp(
                  org.apache.spark.sql.functions.initcap(src),
                  lit("d-MMM-yy"))),
              org.apache.spark.sql.functions.when(
                src.rlike("^\\d{1,2}-[A-Za-z]{3}-\\d{4}$"),
                try_to_timestamp(
                  org.apache.spark.sql.functions.initcap(src),
                  lit("d-MMM-yyyy"))),
              // PG compact ISO date '20210202' (datetime.c DecodeDate);
              // gated on 8 digits so plain numbers can't mis-parse
              org.apache.spark.sql.functions.when(
                src.rlike("^\\d{8}$"), try_to_timestamp(src, lit("yyyyMMdd"))),
              // 'Thu Sep 14 03:19:54 EDT 2023' postgres datestyle —
              // Spark's formatter lacks day-name (EEE) and zone-abbrev
              // patterns, so strip both and parse the rest (the local
              // time is kept; datetime.c DecodeDateTime)
              try_to_timestamp(
                org.apache.spark.sql.functions.regexp_replace(
                  org.apache.spark.sql.functions.regexp_replace(
                    src, "^[A-Za-z]{3}\\s+", ""),
                  "\\s+[A-Z]{2,5}\\s+(\\d{4})$", " $1"),
                lit("MMM d HH:mm:ss yyyy")),
              src) // truly malformed input: the final cast raises
          case (_: org.apache.spark.sql.types.DayTimeIntervalType,
              StringType) =>
            // PG interval text ('14 hours', '1 day 00:00:10') into a
            // day-time interval column (datetime.c DecodeInterval);
            // unparsable text falls to the typed cast, which raises
            coalesce(
              org.apache.spark.sql.functions.expr(
                s"make_dt_interval(0, 0, 0, pg_interval_us(`__c$i`) / 1e6)")
                .cast(f.dataType),
              src.cast(f.dataType))
          case (at: ArrayType, StringType) =>
            // PG array literal '{1,2,3}' (arrayfuncs.c array_in) —
            // parse to nested strings at the declared depth; the
            // final .cast converts the elements
            def depthOf(t: org.apache.spark.sql.types.DataType): Int =
              t match {
                case ArrayType(e, _) => 1 + depthOf(e)
                case _ => 0
              }
            org.apache.spark.sql.graft.GraftInternals.exprColumn(
              graft.functions.PgArrayInExpr(
                org.apache.spark.sql.graft.GraftInternals.columnExpr(src),
                depthOf(at)))
          case (st: StructType, StringType)
              if operators.PgComplex.isComplexStruct(st) =>
            // COMPLEX input function (' 5 + 3i ', complex_type.c)
            org.apache.spark.sql.functions.expr(
              operators.PgComplex.inExprSql(s"__c$i"))
          case (st: StructType, StringType) =>
            // PG composite literal '(1,2)' (rowtypes record_in) — strip
            // the parens, parse fields per the declared struct
            org.apache.spark.sql.functions.from_csv(
              org.apache.spark.sql.functions.regexp_replace(
                src, "^\\(|\\)$", ""),
              st, Map.empty[String, String])
          case _ => src
        }
        val castd = lenient.cast(f.dataType)
        // bpchar columns store right-trimmed (varlena.c bpchareq
        // ignores trailing blanks; length()/casts drop them too).
        // Guarded on the TARGET type: the char registry is keyed by
        // bare table name, and a re-created same-named table with an
        // INT column must never take the trim (it would force STRING)
        (if (f.dataType == org.apache.spark.sql.types.StringType &&
            operators.GreengageDdl.charCols(table)
              .contains(f.name.toLowerCase))
          org.apache.spark.sql.functions.rtrim(castd)
        else if (f.dataType == org.apache.spark.sql.types.StringType &&
            operators.GreengageDdl.geoCols(table)
              .contains(f.name.toLowerCase)) {
          // box/lseg input canonicalization (geo_ops.c box_in corner
          // reorder, lseg_out bracket form)
          val fn = operators.GreengageDdl.geoCols(table)(f.name.toLowerCase)
          org.apache.spark.sql.graft.GraftInternals.exprColumn(
            if (fn == "box")
              graft.functions.PgBoxIn(
                org.apache.spark.sql.graft.GraftInternals.columnExpr(castd))
            else graft.functions.PgLsegIn(
              org.apache.spark.sql.graft.GraftInternals.columnExpr(castd)))
        } else castd).as(f.name)
      } else operators.GreengageDdl.serialSeq(table, f.name) match {
        case Some(seq) =>
          // SERIAL column (gram.y: serial → int + nextval default):
          // dense PG-exact ids for this statement's rows. The whole
          // statement reserves one contiguous block, then row_number
          // assigns within it — a single-partition window, fine for the
          // per-statement INSERT path (PG sequences serialize the same
          // way); bulk loads at scale use the blocked nextvalColumn.
          val n = b2.count()
          val base = operators.GreengageDdl.nextvalDense(seq, n)
          import org.apache.spark.sql.expressions.Window
          (org.apache.spark.sql.functions.row_number().over(
            Window.orderBy(
              org.apache.spark.sql.functions.monotonically_increasing_id()))
            + lit(base - 1)).cast(f.dataType).as(f.name)
        case None =>
          // unmentioned column: its declared DEFAULT (Spark keeps the
          // SQL text in the field metadata), else NULL — PG's rule
          val dflt =
            if (f.metadata.contains("CURRENT_DEFAULT"))
              org.apache.spark.sql.functions.expr(
                f.metadata.getString("CURRENT_DEFAULT"))
            else lit(null)
          dflt.cast(f.dataType).as(f.name)
      }
    }
    val view = "__graft_ins_src"
    val shaped = b2.select(aligned.toIndexedSeq: _*)
    recordAffected(shaped.count()) // only counts when tracking is on
    // bounds-recorded tables with no default partition reject rows
    // outside every declared bound (execMain.c partition routing)
    operators.GreengageDdl.checkInsertBounds(spark, table, shaped)
    shaped.createOrReplaceTempView(view)
    try spark.sql(s"INSERT INTO $table SELECT * FROM $view")
    finally spark.catalog.dropTempView(view)
  }

  /** COPY ... FROM/TO PROGRAM 'cmd' (commands/copy.c program form):
    * FROM runs the command through the execute-protocol source (strict
    * — any malformed line fails the load, PG's default) and appends;
    * TO streams the rows into the command's stdin one partition at a
    * time (the program runs once, as on PG's dispatching node). */
  private def runCopyProgram(spark: SparkSession,
                             m: scala.util.matching.Regex.Match): Unit = {
    val target = m.group(1)
    val cmd = m.group(3)
    val optsRaw = Option(m.group(4)).getOrElse("")
    val delim = s"(?is)\\bDELIMITER\\s+'([^']*)'".r
      .findFirstMatchIn(optsRaw).map(_.group(1)).getOrElse(",")
    if (m.group(2).equalsIgnoreCase("FROM")) {
      val table = target.replace("\"", "")
      require(!target.startsWith("("), "COPY FROM needs a table target")
      val schema = spark.table(table).schema
      sources.ExecSource
        .readCsv(spark, cmd, schema, partitions = 1, rejectLimit = 0,
          delimiter = delim)
        .good.drop("segment")
        .write.mode("append").insertInto(table)
    } else {
      val df =
        if (target.startsWith("("))
          spark.sql(operators.PgSql.rewrite(
            target.stripPrefix("(").stripSuffix(")")))
        else spark.table(target.replace("\"", ""))
      val pb = new ProcessBuilder("/bin/sh", "-c", cmd)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        proc.getOutputStream, java.nio.charset.StandardCharsets.UTF_8))
      try {
        val it = df.toLocalIterator() // one partition in memory at a time
        while (it.hasNext) {
          val r = it.next()
          var i = 0
          while (i < r.length) {
            if (i > 0) w.write(delim)
            if (!r.isNullAt(i)) w.write(r.get(i).toString)
            i += 1
          }
          w.write('\n')
        }
      } finally w.close()
      val rc = proc.waitFor()
      require(rc == 0, s"COPY TO PROGRAM exited $rc: $cmd")
    }
  }

  /** COPY (commands/copy.c subset): csv with HEADER / DELIMITER /
    * NULL options. TO writes a table or `(query)`; FROM appends into
    * an existing table using its catalog schema. */
  /** `get_ao_distribution('t'::regclass)` in a FROM clause → a temp
    * view holding the per-segment (segmentid, tupcount) placement
    * counts (functions.GpHash — the bit-exact cdbhash placement). */
  private val aoDistRe =
    ("(?i)(?:pg_catalog\\s*\\.\\s*)?get_ao_distribution\\s*\\(\\s*" +
      "'([^']+)'\\s*(?:::\\s*regclass)?\\s*\\)").r
  private def rewriteAoDistribution(spark: SparkSession, sql: String): String =
    aoDistRe.replaceAllIn(sql, m => {
      val tbl = m.group(1)
      val vname = "__gp_aodist_" + tbl.replaceAll("[^A-Za-z0-9]", "_")
      functions.GpHash.aoDistribution(spark, tbl)
        .createOrReplaceTempView(vname)
      vname
    })

  /** PG allows a WITH item's column-alias list to name FEWER columns
    * than its body yields (parse_relation.c buildRelationAliases: the
    * remaining columns keep their own names); Spark demands exact
    * arity. Extend each short list with the body's surviving names. */
  private def extendShortCteAliasLists(spark: SparkSession,
                                       sql: String): Option[String] = {
    val re = "(?is)\\b(\\w+)\\s*\\(([^()]*)\\)\\s+as\\s*\\(".r
    var out = sql
    var changed = false
    var guard = 0
    var found = true
    while (found && guard < 20) {
      guard += 1
      found = false
      re.findAllMatchIn(out).find { mm =>
        val listed = operators.GreengageDdl.splitTop(mm.group(2))
          .map(_.trim).filter(_.nonEmpty)
        val (body, _) = operators.GreengageDdl.balanced(out, mm.end - 1)
        val cols = try spark.sql(operators.PgSql.rewrite(body)).columns.toSeq
          catch { case _: Exception => Seq.empty }
        if (cols.length > listed.length && listed.nonEmpty) {
          val extra = cols.drop(listed.length).map(c => s"`$c`")
          out = out.substring(0, mm.start(2)) +
            (listed ++ extra).mkString(", ") + out.substring(mm.end(2))
          changed = true; found = true
          true
        } else false
      }
    }
    if (changed) Some(out) else None
  }

  /** `array_agg(t)` where `t` is the FROM relation — a WHOLE-ROW
    * reference (parse_expr.c whole-row Var). Spark has no row-typed
    * relation alias, so the row becomes a struct over the relation's
    * PG-declared column order (hive layout moves partition keys last;
    * `graft.pgcolorder` restores the declared order). */
  private def rewriteWholeRowAgg(spark: SparkSession, sql: String): String = {
    // the rel must appear as a FROM/JOIN item — tested on the
    // literal-masked text so `'... from t ...'` inside a string never
    // qualifies, and JOINed relations qualify like FROM items
    val masked = operators.PgSql.maskLiterals(sql)
    "(?i)\\barray_agg\\s*\\(\\s*([A-Za-z_][\\w]*)\\s*\\)".r
      .replaceAllIn(sql, m => {
        val rel = m.group(1)
        val inFrom = ("(?is)\\b(?:from|join)\\s+" +
          java.util.regex.Pattern.quote(rel) + "\\b").r
          .findFirstIn(masked).isDefined
        val isCol = try spark.table(rel).columns
          .exists(_.equalsIgnoreCase(rel)) catch { case _: Exception => true }
        if (!inFrom || isCol) m.matched
        else {
          val cols = (try {
            spark.sql(s"SHOW TBLPROPERTIES $rel('graft.pgcolorder')")
              .collect().headOption.map(_.getString(1))
              .filterNot(_.contains("does not have"))
              .map(_.split(",").toSeq)
          } catch { case scala.util.control.NonFatal(_) => None })
            .getOrElse(spark.table(rel).columns.toSeq)
          java.util.regex.Matcher.quoteReplacement(
            s"array_agg(struct(${cols.map(c => s"`$c`").mkString(", ")}))")
        }
      })
  }

  /** `has_table_privilege(..)` (acl.c): a single-user session holds
    * every privilege, so each call folds to `true` — but like PG the
    * named relation must exist (get_relname_relid errors otherwise).
    * Matched on the literal-masked text so a call spelling inside a
    * string literal is never rewritten. */
  private def rewriteHasTablePrivilege(spark: SparkSession,
                                       sql: String): String = {
    val masked = operators.PgSql.maskLiterals(sql)
    val p = java.util.regex.Pattern.compile(
      "(?is)\\bhas_table_privilege\\s*\\(([^()]*)\\)")
    val m = p.matcher(masked)
    val sb = new java.lang.StringBuilder
    var prev = 0
    while (m.find()) {
      sb.append(sql, prev, m.start)
      // split args on the MASKED text (a comma inside a literal is
      // masked), then read each part from the original string
      var off = m.start(1)
      val args = masked.substring(m.start(1), m.end(1)).split(",", -1)
        .map { pt =>
          val s = sql.substring(off, off + pt.length); off += pt.length + 1
          s.trim
        }.toSeq
      // 2-arg form (table, priv); 3-arg form (user, table, priv)
      val rel = if (args.length >= 3) args(1) else args.headOption.getOrElse("")
      def lit(s: String): Option[String] =
        "^'([^']*)'".r.findFirstMatchIn(s.trim).map(_.group(1))
      lit(rel).foreach { name0 =>
        val name = name0.replace("\"", "").replaceAll("(?i)^public\\.", "")
        if (!spark.catalog.tableExists(name))
          throw new IllegalArgumentException(
            s"""relation "$name" does not exist""")
      }
      // explicit recorded role: consult the ACL registry (aclchk.c);
      // the session superuser (2-arg form or unrecorded role) holds
      // every privilege
      val answer = (if (args.length >= 3) lit(args(0)) else None) match {
        case Some(role) if operators.PgCatalog.isRecordedRole(role) =>
          (for {
            rl <- lit(rel)
            pv <- lit(args(2))
          } yield operators.PgCatalog.roleHasPrivilege(role,
            rl.replace("\"", "").replaceAll("(?i)^public\\.", ""), pv))
            .getOrElse(true)
        case _ => true
      }
      sb.append(answer.toString)
      prev = m.end
    }
    sb.append(sql, prev, sql.length)
    sb.toString
  }

  /** `pg_relation_size('t')` (dbsize.c) — the PG heap size model over
    * footer-metadata row counts: rows-per-page from the 8K page, the
    * 28-byte tuple header + 4-byte line pointer, MAXALIGNed data
    * width, honoring the table's declared fillfactor (`WITH
    * (fillfactor=N)` caps page fill, storage.sgml). An estimate — PG's
    * number is physical — but it scales with the same inputs the
    * suites assert on (row count × width × fillfactor).
    * `gp_update_ao_master_stats('t')` (aocatalog) returns the live
    * tuple count. */
  private def rewriteRelationStats(spark: SparkSession, sql: String): String = {
    var out = ("(?i)pg_relation_size\\s*\\(\\s*'([^']+)'\\s*" +
      "(?:::\\s*regclass)?\\s*\\)").r.replaceAllIn(sql, m => {
      val tbl = m.group(1)
      val rows = spark.table(tbl).count()
      val ff = (try {
        spark.sql(s"SHOW TBLPROPERTIES $tbl('greengage.fillfactor')")
          .collect().headOption.map(_.getString(1))
          .filterNot(_.contains("does not have"))
      } catch { case _: Exception => None }).map(_.toInt).getOrElse(100)
      import org.apache.spark.sql.types._
      val width = spark.table(tbl).schema.fields.map(_.dataType match {
        case BooleanType => 1L
        case ShortType => 2L
        case IntegerType | FloatType | DateType => 4L
        case LongType | DoubleType | TimestampType | TimestampNTZType => 8L
        case _: DecimalType => 10L
        case _ => 33L // varlena average
      }).sum
      val perRow = 4L + 28L + ((width + 7) / 8) * 8 // lp + header + data
      val perPage = math.max(1L, (8168L * ff / 100) / perRow)
      val pages = (rows + perPage - 1) / perPage
      (pages * 8192L).toString
    })
    out = ("(?i)gp_update_ao_master_stats\\s*\\(\\s*'([^']+)'\\s*" +
      "(?:::\\s*regclass)?\\s*\\)").r.replaceAllIn(out, m =>
      spark.table(m.group(1)).count().toString)
    out
  }

  private def runCopy(spark: SparkSession,
                      m: scala.util.matching.Regex.Match): Unit = {
    val target = m.group(1)
    val path = m.group(3)
    val optsRaw = Option(m.group(4)).getOrElse("")
    def opt(name: String): Option[String] =
      s"(?is)\\b$name\\s+(?:AS\\s+)?'([^']*)'".r.findFirstMatchIn(optsRaw)
        .map(_.group(1))
    val header = "(?is)\\bHEADER\\b".r.findFirstIn(optsRaw).isDefined
    val delim = opt("DELIMITER").getOrElse(",")
    val nullTok = opt("NULL").getOrElse("")
    if (m.group(2).equalsIgnoreCase("TO")) {
      val df =
        if (target.startsWith("("))
          spark.sql(operators.PgSql.rewrite(
            target.stripPrefix("(").stripSuffix(")")))
        else spark.table(target.replace("\"", ""))
      df.write.mode("overwrite")
        .option("header", header.toString).option("sep", delim)
        .option("nullValue", nullTok).csv(path)
    } else {
      val table = target.replace("\"", "")
      require(!target.startsWith("("), "COPY FROM needs a table target")
      val schema = spark.table(table).schema
      // enum/domain check constraints apply to COPY exactly as to
      // INSERT (copy.c runs the same per-type input functions)
      def checked(df: org.apache.spark.sql.DataFrame) = {
        operators.PgTypes.validate(df, table,
          df.columns.map(c => c.toLowerCase -> c).toMap)
        df
      }
      (Option(m.group(6)), Option(m.group(5))) match {
        case (None, None) =>
          checked(spark.read.schema(schema)
            .option("header", header.toString).option("sep", delim)
            .option("nullValue", nullTok).csv(path))
            .write.mode("append").insertInto(table)
        case (limit, logErrors) =>
          // Greengage COPY SREH (cdbsreh.c): tolerate up to N bad rows
          // (or N percent), load the rest; LOG ERRORS registers the
          // queryable <table>_errors view, like external tables
          val res = limit match {
            case Some(n) if m.group(7) != null &&
                m.group(7).equalsIgnoreCase("PERCENT") =>
              operators.Sreh.readCsvPercent(spark, path, schema,
                n.toDouble, header, delim, nullTok)
            case Some(n) =>
              operators.Sreh.readCsv(spark, path, schema, n.toLong,
                header, delim, nullTok)
            case None => // bare LOG ERRORS: strict limit, log anyway
              operators.Sreh.readCsv(spark, path, schema, 0L, header,
                delim, nullTok)
          }
          checked(res.good).write.mode("append").insertInto(table)
          if (logErrors.isDefined)
            res.errorLog.createOrReplaceTempView(s"${table}_errors")
      }
    }
  }
}
