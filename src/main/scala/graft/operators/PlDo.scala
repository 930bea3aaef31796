package graft.operators

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.DataType

/** Statement-level PL/pgSQL — `DO` anonymous blocks, `CREATE
  * PROCEDURE`, and `CALL` (reference `src/pl/plpgsql/src/pl_exec.c`
  * exec_stmt dispatch; `DO` in `commands/functioncmds.c`
  * ExecuteDoStmt; procedures in `CreateFunction` with prokind 'p').
  *
  * Where [[SqlFunctions.compilePlpgsql]] compiles expression-shaped
  * function bodies into ONE inline SQL expression (no runtime
  * interpreter), a DO block is imperative glue around whole
  * statements — DDL, DML, dynamic EXECUTE — so it runs here as a
  * driver-side interpreter: control flow and scalar variables live on
  * the driver, and every contained statement re-enters
  * [[graft.Graft.execute]], keeping the actual data work distributed.
  * That is the reference's own split: its PL interpreter runs on one
  * backend and dispatches full statements to the executor.
  *
  * Supported statements: `DECLARE` scalars (typed, with `:=`/DEFAULT
  * initializers), assignment `v := expr`, `IF/ELSIF/ELSE`, `FOR v IN
  * [REVERSE] a..b LOOP`, `FOR rec IN <query> LOOP` (fields as
  * `rec.col`), `WHILE`, `EXIT [WHEN]`, `CONTINUE [WHEN]`, dynamic
  * `EXECUTE <expr> [INTO var]`, `PERFORM`, `RAISE NOTICE/INFO/WARNING/
  * EXCEPTION 'fmt %' [, args]`, `NULL`, a trailing `EXCEPTION WHEN
  * OTHERS THEN` handler, and any other statement verbatim through the
  * router. Loops are bounded (100k iterations / 100k driver-side rows
  * per FOR-query) — the driver-orchestration contract, stated loudly.
  */
object PlDo {

  /** Loop/row bound: procedural driver-side work, not a data path. */
  private val MaxIters = 100000

  // ---------------------------------------------------------------
  // statement AST
  // ---------------------------------------------------------------
  private sealed trait Stmt
  private case class Assign(name: String, expr: String) extends Stmt
  private case class Ret(expr: Option[String]) extends Stmt
  private case class DynExec(expr: String, into: Seq[String]) extends Stmt
  private case class SelectInto(query: String, vars: Seq[String]) extends Stmt
  private case class Perform(query: String) extends Stmt
  private case class Raise(level: String, fmt: String, args: Seq[String]) extends Stmt
  private case class IfStmt(branches: Seq[(String, Seq[Stmt])],
                            els: Seq[Stmt]) extends Stmt
  private case class ForRange(v: String, from: String, to: String,
                              reverse: Boolean, body: Seq[Stmt]) extends Stmt
  private case class ForQuery(v: String, query: String,
                              body: Seq[Stmt]) extends Stmt
  private case class WhileStmt(cond: String, body: Seq[Stmt]) extends Stmt
  private case class ExitStmt(when: Option[String], continue: Boolean) extends Stmt
  private case class GetDiag(v: String, item: String) extends Stmt
  private case class SqlStmt(text: String) extends Stmt

  private final class ExitSignal(val continue: Boolean)
    extends RuntimeException(null, null, false, false)

  /** RETURN from a function body: carries the rendered literal (null
    * for a bare `RETURN;`). */
  private final class ReturnSignal(val lit: String)
    extends RuntimeException(null, null, false, false)

  private final case class Block(decls: Seq[(String, String, Option[String])],
                                 body: Seq[Stmt],
                                 handler: Seq[(Seq[String], Seq[Stmt])])

  // ---------------------------------------------------------------
  // lexical helpers (single-quoted literals with '' escapes)
  // ---------------------------------------------------------------
  private def skipLiteral(s: String, i0: Int): Int = {
    var i = i0 + 1
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2 else return i + 1
      } else i += 1
    }
    throw new IllegalArgumentException(s"unterminated literal in: $s")
  }

  private def isWord(c: Char) = Character.isLetterOrDigit(c) || c == '_'

  /** If the keyword phrase (words separated by whitespace) starts at
    * `i`, the index just past it; else -1. */
  private def phraseAt(s: String, i: Int, phrase: String): Int = {
    if (i > 0 && (isWord(s.charAt(i - 1)) || s.charAt(i - 1) == '.')) return -1
    var p = i
    val words = phrase.split(' ')
    var w = 0
    while (w < words.length) {
      if (w > 0) {
        val p0 = p
        while (p < s.length && s.charAt(p).isWhitespace) p += 1
        if (p == p0) return -1
      }
      val word = words(w)
      if (!s.regionMatches(true, p, word, 0, word.length)) return -1
      p += word.length
      w += 1
    }
    if (p < s.length && isWord(s.charAt(p))) -1 else p
  }

  /** Next top-level (outside literals/parens) occurrence of any of the
    * phrases, scanning from `from`: (startIdx, phrase, endIdx) or
    * (-1, "", -1). A bare ";" entry matches the separator char. */
  private def findTop(s: String, from: Int,
                      phrases: Seq[String]): (Int, String, Int) = {
    var i = from
    var depth = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') i = skipLiteral(s, i)
      else {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0) {
          var k = 0
          while (k < phrases.length) {
            val ph = phrases(k)
            if (ph == ";") { if (c == ';') return (i, ";", i + 1) }
            else if (ph == "..") {
              if (c == '.' && i + 1 < s.length && s.charAt(i + 1) == '.')
                return (i, "..", i + 2)
            } else {
              val e = phraseAt(s, i, ph)
              if (e >= 0) return (i, ph, e)
            }
            k += 1
          }
        }
        i += 1
      }
    }
    (-1, "", -1)
  }

  /** Apply `f` to the segments of `text` outside single-quoted
    * literals; literals pass through untouched. */
  private def mapOutsideLiterals(text: String)(f: String => String): String = {
    val sb = new StringBuilder
    var i = 0
    var segStart = 0
    while (i < text.length) {
      if (text.charAt(i) == '\'') {
        sb ++= f(text.substring(segStart, i))
        val e = skipLiteral(text, i)
        sb ++= text.substring(i, e)
        i = e
        segStart = e
      } else i += 1
    }
    sb ++= f(text.substring(segStart))
    sb.toString
  }

  /** Literal-aware split on top-level semicolons. */
  private def splitOnSemicolons(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < s.length) {
      val (e, _, _) = findTop(s, pos, Seq(";"))
      val end = if (e >= 0) e else s.length
      out += s.substring(pos, end)
      pos = end + 1
    }
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  // ---------------------------------------------------------------
  // parsing
  // ---------------------------------------------------------------
  private def parseBlock(body0: String): Block = {
    // `--` line comments are lexical (pl_scanner shares scan.l): strip
    // them outside literals so the ';' splitter can't glue a comment
    // onto the next statement
    val body = mapOutsideLiterals(body0)(_.replaceAll("--[^\n]*", ""))
    val m = "(?is)^\\s*(?:DECLARE\\s+(.*?))??BEGIN\\s+(.*)\\s*END\\s*;?\\s*$".r
      .findFirstMatchIn(body.trim).getOrElse(throw new IllegalArgumentException(
        s"unsupported plpgsql body (expected [DECLARE ...] BEGIN ... END): $body"))
    val decls = splitOnSemicolons(Option(m.group(1)).getOrElse("")).map { d =>
      val withInit0 = mapOutsideLiterals(d) {
        _.replaceAll("(?i)\\bDEFAULT\\b", ":=") }
      // `iter INT = 0` — plpgsql accepts bare `=` as the initializer
      // operator (pl_gram.y decl_defval); '=' cannot occur in a type
      // name, so the first one outside := is it
      val withInit = if (withInit0.contains(":=")) withInit0 else {
        val i = withInit0.indexOf('=')
        if (i < 0) withInit0
        else withInit0.substring(0, i) + ":=" + withInit0.substring(i + 1)
      }
      val parts = withInit.split(":=", 2)
      val head = parts(0).trim.split("\\s+", 2)
      require(head.length == 2 && head(0).matches("(?i)\\w+"),
        s"bad plpgsql declaration: $d")
      // the RAW type text is kept; resolution happens at run time so
      // composite/%rowtype/record declarations can bind against the
      // live catalog (a table's rowtype is its current schema)
      val t = head(1).trim.replaceAll("(?i)^CONSTANT\\s+", "")
      (head(0).toLowerCase, t, parts.drop(1).headOption.map(_.trim))
    }
    val inner = m.group(2)
    val (main, term, p) = parseSeq(inner, 0, Seq("EXCEPTION"))
    // EXCEPTION WHEN <cond> [OR <cond>…] THEN <stmts> [WHEN …]
    // (pl_gram.y proc_exceptions; conditions are PG condition names,
    // plus OTHERS which matches everything but QUERY_CANCELED)
    val handler = if (term == "EXCEPTION") {
      val sections = Seq.newBuilder[(Seq[String], Seq[Stmt])]
      var pos = p
      var more = true
      while (more) {
        val h = "(?is)^\\s*WHEN\\s+([\\w ]+?(?:\\s+OR\\s+[\\w ]+?)*)\\s+THEN\\b".r
          .findFirstMatchIn(inner.substring(pos)).getOrElse(
            throw new IllegalArgumentException(
              s"cannot parse EXCEPTION section at: ${inner.substring(pos).take(80)}"))
        val names = h.group(1).split("(?i)\\s+OR\\s+").toSeq
          .map(_.trim.toLowerCase)
        val (stmts, term2, p2) = parseSeq(inner, pos + h.end, Seq("WHEN"))
        sections += ((names, stmts))
        if (term2 == "WHEN") { pos = p2 - "WHEN".length; more = true }
        else more = false
      }
      sections.result()
    } else Seq.empty
    Block(decls, main, handler)
  }

  /** Parse statements until one of `terms` (or end of text, always an
    * accepted terminator): (stmts, matchedTerm, posAfterTerm). */
  private def parseSeq(s: String, start: Int,
                       terms: Seq[String]): (Seq[Stmt], String, Int) = {
    val out = Seq.newBuilder[Stmt]
    var pos = start
    while (true) {
      while (pos < s.length &&
        (s.charAt(pos).isWhitespace || s.charAt(pos) == ';')) pos += 1
      if (pos >= s.length) return (out.result(), "", pos)
      for (t <- terms) {
        val e = phraseAt(s, pos, t)
        if (e >= 0) return (out.result(), t, e)
      }
      if (phraseAt(s, pos, "IF") >= 0) {
        val (ifStmt, p) = parseIf(s, phraseAt(s, pos, "IF"))
        out += ifStmt; pos = p
      } else if (phraseAt(s, pos, "FOR") >= 0) {
        val hdrStart = phraseAt(s, pos, "FOR")
        val (ls, _, le) = findTop(s, hdrStart, Seq("LOOP"))
        require(ls >= 0, s"FOR without LOOP at: ${s.substring(pos).take(60)}")
        val hdr = s.substring(hdrStart, ls).trim
        val (body, _, p) = parseSeq(s, le, Seq("END LOOP"))
        val hm = "(?is)^(\\w+)\\s+IN\\s+(REVERSE\\s+)?(.*)$".r
          .findFirstMatchIn(hdr).getOrElse(throw new IllegalArgumentException(
            s"cannot parse FOR header: $hdr"))
        val range = findTop(hm.group(3), 0, Seq(".."))
        out += (if (range._1 >= 0)
          ForRange(hm.group(1).toLowerCase,
            hm.group(3).substring(0, range._1).trim,
            hm.group(3).substring(range._3).trim,
            hm.group(2) != null, body)
        else {
          require(hm.group(2) == null, s"REVERSE needs a range: $hdr")
          ForQuery(hm.group(1).toLowerCase, hm.group(3).trim, body)
        })
        pos = p
      } else if (phraseAt(s, pos, "WHILE") >= 0) {
        val cs = phraseAt(s, pos, "WHILE")
        val (ls, _, le) = findTop(s, cs, Seq("LOOP"))
        require(ls >= 0, s"WHILE without LOOP at: ${s.substring(pos).take(60)}")
        val (body, _, p) = parseSeq(s, le, Seq("END LOOP"))
        out += WhileStmt(s.substring(cs, ls).trim, body)
        pos = p
      } else if (phraseAt(s, pos, "LOOP") >= 0) {
        // bare LOOP ... END LOOP (exits via EXIT WHEN)
        val (body, _, p) = parseSeq(s, phraseAt(s, pos, "LOOP"), Seq("END LOOP"))
        out += WhileStmt("true", body)
        pos = p
      } else {
        val (se, _, _) = findTop(s, pos, Seq(";"))
        val end = if (se >= 0) se else s.length
        val text = s.substring(pos, end).trim
        out += parseSimple(text)
        pos = end + 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def parseIf(s: String, condStart: Int): (IfStmt, Int) = {
    val branches = Seq.newBuilder[(String, Seq[Stmt])]
    var pos = condStart
    var els: Seq[Stmt] = Nil
    var done = -1
    while (done < 0) {
      val (ts, _, te) = findTop(s, pos, Seq("THEN"))
      require(ts >= 0, s"IF without THEN at: ${s.substring(pos).take(60)}")
      val cond = s.substring(pos, ts).trim
      // ELSEIF is PG's accepted alternate spelling (pl_gram.y K_ELSIF)
      val (stmts, term, p) =
        parseSeq(s, te, Seq("ELSEIF", "ELSIF", "ELSE", "END IF"))
      branches += ((cond, stmts))
      term match {
        case "ELSIF" | "ELSEIF" => pos = p
        case "ELSE" =>
          val (e, _, p2) = parseSeq(s, p, Seq("END IF"))
          els = e; done = p2
        case "END IF" => done = p
        case "" => throw new IllegalArgumentException("IF without END IF")
      }
    }
    (IfStmt(branches.result(), els), done)
  }

  private def parseSimple(text: String): Stmt = {
    val assign = "(?s)^(\\w+(?:\\.\\w+)?)\\s*:=(.*)$".r
    val raise = "(?is)^RAISE\\s+(NOTICE|INFO|WARNING|LOG|DEBUG|EXCEPTION)\\s+('[^']*+(?:''[^']*+)*+')\\s*(?:,(.*))?$".r
    text match {
      case t if phraseAt(t, 0, "EXECUTE") >= 0 =>
        val rest = t.substring(phraseAt(t, 0, "EXECUTE")).trim
        val (is, _, ie) = findTop(rest, 0, Seq("INTO"))
        if (is >= 0)
          DynExec(rest.substring(0, is).trim,
            GreengageDdl.splitTop(rest.substring(ie)
                // INTO STRICT: the 1-row enforcement is not replicated
                // (no-row/multi-row error surfaces are ERR entries)
                .replaceFirst("(?is)^\\s*STRICT\\b", ""))
              .map(_.trim.toLowerCase))
        else DynExec(rest, Nil)
      case t if phraseAt(t, 0, "GET DIAGNOSTICS") >= 0 =>
        val m2 = ("(?is)^GET\\s+DIAGNOSTICS\\s+(\\w+)\\s*:?=\\s*" +
          "(ROW_COUNT|RESULT_OID)\\s*$").r.findFirstMatchIn(t).getOrElse(
          throw new IllegalArgumentException(
            s"unsupported GET DIAGNOSTICS item: $t"))
        GetDiag(m2.group(1).toLowerCase, m2.group(2).toUpperCase)
      case t if phraseAt(t, 0, "RETURN") >= 0 =>
        val rest = t.substring(phraseAt(t, 0, "RETURN")).trim
        require(!"(?is)^(QUERY|NEXT)\\b".r.findFirstIn(rest).isDefined,
          s"RETURN QUERY/NEXT is not supported in the interpreter: $t")
        Ret(if (rest.isEmpty) None else Some(rest))
      case t if phraseAt(t, 0, "PERFORM") >= 0 =>
        Perform(t.substring(phraseAt(t, 0, "PERFORM")).trim)
      case t if phraseAt(t, 0, "EXIT") >= 0 =>
        val rest = t.substring(phraseAt(t, 0, "EXIT")).trim
        ExitStmt(parseWhen(rest), continue = false)
      case t if phraseAt(t, 0, "CONTINUE") >= 0 =>
        val rest = t.substring(phraseAt(t, 0, "CONTINUE")).trim
        ExitStmt(parseWhen(rest), continue = true)
      case raise(level, fmt, args) =>
        Raise(level.toUpperCase,
          fmt.substring(1, fmt.length - 1).replace("''", "'"),
          Option(args).map(GreengageDdl.splitTop(_)).getOrElse(Nil))
      case t if t.equalsIgnoreCase("NULL") => SqlStmt("")
      case assign(name, expr) => Assign(name.toLowerCase, expr.trim)
      // `var = expr;` — plpgsql accepts plain `=` for assignment
      // (pl_gram.y: assign_operator is ':=' or '='); only a lone
      // leading identifier can be one, so SQL verbs fall through
      case t if "(?s)^(\\w+(?:\\.\\w+)?)\\s*=[^=].*$".r.findFirstIn(t)
          .isDefined && {
        val head = t.takeWhile(c => Character.isLetterOrDigit(c) || c == '_')
        !Set("select", "insert", "update", "delete", "truncate", "merge",
          "create", "drop", "alter", "copy", "call", "set", "values",
          "with", "begin", "commit", "rollback", "grant", "revoke")
          .contains(head.toLowerCase)
      } =>
        val m2 = "(?s)^(\\w+(?:\\.\\w+)?)\\s*=(.*)$".r.findFirstMatchIn(t).get
        Assign(m2.group(1).toLowerCase, m2.group(2).trim)
      case t if phraseAt(t, 0, "SELECT") >= 0 && {
        val (i, _, _) = findTop(t, 0, Seq("INTO")); i >= 0
      } =>
        // SELECT ... INTO v[, v2 ...] [FROM ...] (pl_gram.y INTO
        // capture): the INTO clause lifts out, the query runs, and the
        // first row's columns bind positionally
        val (is, _, ie) = findTop(t, 0, Seq("INTO"))
        val (fs, _, _) = findTop(t, ie, Seq("FROM", "WHERE", "GROUP", "ORDER"))
        val tail = if (fs >= 0) " " + t.substring(fs) else ""
        val vars = GreengageDdl.splitTop(
          t.substring(ie, if (fs >= 0) fs else t.length)
            .replaceFirst("(?is)^\\s*STRICT\\b", ""))
          .map(_.trim.toLowerCase)
        SelectInto(t.substring(0, is) + tail, vars)
      case t => SqlStmt(t)
    }
  }

  private def parseWhen(rest: String): Option[String] = {
    if (rest.isEmpty) None
    else {
      val m = "(?is)^WHEN\\s+(.*)$".r.findFirstMatchIn(rest).getOrElse(
        throw new IllegalArgumentException(s"cannot parse EXIT/CONTINUE: $rest"))
      Some(m.group(1).trim)
    }
  }

  // ---------------------------------------------------------------
  // execution
  // ---------------------------------------------------------------
  private final class Env {
    // FOUND magic variable (pl_exec.c exec_set_found) + the
    // ROW_COUNT diagnostic of the last SQL statement
    var found: Boolean = false
    var rowCount: Long = 0L
    val vars = mutable.LinkedHashMap.empty[String, String] // name → SQL literal
    // ROW variables (composite/%rowtype/record declarations): name →
    // ordered (field, spark type); each field's value lives in vars
    // under "name.field"
    val rows = mutable.LinkedHashMap.empty[String, Seq[(String, String)]]
    val notices = mutable.Buffer.empty[String]
  }

  /** Fields of a row type: a registered composite, an existing
    * table's rowtype, or `record` (late-bound — empty until the first
    * INTO binds it). */
  private def rowFieldsOf(spark: SparkSession,
                          typeName: String): Option[Seq[(String, String)]] = {
    val base = typeName.replaceAll("(?i)\\s*%rowtype$", "").trim
    if (base.equalsIgnoreCase("record")) Some(Seq.empty)
    else PgTypes.resolveComposite(base).map(_.fields)
      .orElse {
        val clean = base.replace("\"", "")
        val exists = try spark.catalog.tableExists(clean)
          catch { case scala.util.control.NonFatal(_) => false }
        if (exists)
          Some(spark.table(clean).schema.fields.toSeq
            .map(f => (f.name, f.dataType.sql)))
        else None
      }
  }

  /** Whether a raw declared type maps to a SCALAR spark type (arrays
    * included) — row treatment only applies beyond these. */
  private def scalarTypeOf(t: String): Option[String] =
    scala.util.Try(GreengageDdl.mapType(t)).toOption

  /** The struct literal for a row variable's current field values. */
  private def structLit(env: Env, n: String): String = {
    val fields = env.rows(n)
    if (fields.isEmpty) "NULL"
    else "named_struct(" + fields.map { case (f, ft) =>
      val v = env.vars.getOrElse(s"$n.${f.toLowerCase}", "NULL")
      s"'$f', CAST(($v) AS $ft)"
    }.mkString(", ") + ")"
  }

  /** Bind an INTO target list against a result row: a single ROW
    * variable takes every column positionally (pl_exec.c
    * exec_move_row); scalars bind one column each. */
  private def bindInto(env: Env, vars: Seq[String],
                       df: org.apache.spark.sql.DataFrame,
                       setFound: Boolean = false): Unit = {
    val rows = df.limit(1).collect()
    if (setFound) { // SELECT INTO sets FOUND; EXECUTE INTO does not
      env.found = rows.nonEmpty
      env.rowCount = rows.length.toLong
    }
    if (vars.length == 1 && env.rows.contains(vars.head)) {
      val n = vars.head
      val declared = env.rows(n)
      val fields =
        if (declared.nonEmpty) declared
        else { // record: adopt the query's shape
          val fs = df.schema.fields.toSeq.map(f => (f.name, f.dataType.sql))
          env.rows(n) = fs; fs
        }
      fields.zipWithIndex.foreach { case ((f, ft), i) =>
        env.vars(s"$n.${f.toLowerCase}") =
          if (rows.isEmpty || i >= df.schema.length) s"CAST(NULL AS $ft)"
          else render(rows(0).get(i), df.schema(i).dataType)
      }
    } else {
      require(vars.length <= df.schema.length,
        s"INTO: ${vars.length} variables for ${df.schema.length} columns")
      vars.zipWithIndex.foreach { case (v, i) =>
        env.vars(v) =
          if (rows.isEmpty) s"CAST(NULL AS ${df.schema(i).dataType.sql})"
          else render(rows(0).get(i), df.schema(i).dataType)
      }
    }
  }

  /** Render a driver-side value as a typed SQL literal. */
  private def render(v: Any, dt: DataType): String = v match {
    case null => s"CAST(NULL AS ${dt.sql})"
    case s: String => "'" + s.replace("'", "''") + "'"
    case t: java.sql.Timestamp => s"CAST('$t' AS TIMESTAMP)"
    case t: java.time.Instant => s"CAST('$t' AS TIMESTAMP)"
    case t: java.time.LocalDateTime => s"CAST('$t' AS TIMESTAMP_NTZ)"
    case d: java.sql.Date => s"DATE '$d'"
    case d: java.time.LocalDate => s"DATE '$d'"
    case d: java.math.BigDecimal => s"CAST($d AS ${dt.sql})"
    case b: Array[Byte] => s"X'${b.map("%02x".format(_)).mkString}'"
    case n: java.lang.Number => n.toString
    case b: java.lang.Boolean => b.toString
    case r: org.apache.spark.sql.Row =>
      val st = dt match {
        case s: org.apache.spark.sql.types.StructType => s
        case other0 => throw new IllegalArgumentException(
          s"plpgsql: row value with non-struct type ${other0.sql}")
      }
      "named_struct(" + st.fields.zipWithIndex.map { case (f, i) =>
        s"'${f.name}', CAST((${render(r.get(i), f.dataType)}) AS " +
          s"${f.dataType.sql})"
      }.mkString(", ") + ")"
    case s: scala.collection.Seq[_] =>
      val et = dt match {
        case a: org.apache.spark.sql.types.ArrayType => a.elementType
        case other0 => throw new IllegalArgumentException(
          s"plpgsql: sequence value with non-array type ${other0.sql}")
      }
      if (s.isEmpty) s"CAST(ARRAY() AS ${dt.sql})"
      else "ARRAY(" + s.map(x => render(x, et)).mkString(", ") + ")"
    case other => throw new IllegalArgumentException(
      s"plpgsql: cannot render ${other.getClass.getName} as a literal")
  }

  /** PG float8out text form (float.c with shortest-repr): integral
    * values print without a fraction or exponent; others drop a
    * trailing `.0`. Spark's CAST(DOUBLE AS STRING) prints `7.0744E7`
    * where PG prints `70744000` — a var baked into text via `::text`
    * must take PG's form. */
  private def pgDoubleText(d: Double): String = {
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString
    else {
      val s = d.toString
      if (s.endsWith(".0")) s.dropRight(2) else s
    }
  }

  /** Substitute environment variables (word-bounded, outside literals;
    * longest names first so `rec.total` wins over `rec`). */
  private def subst(text: String, env: Env): String = {
    val text1 = // FOUND is reserved in plpgsql (pl_comp.c) — never a var
      if ("(?i)(?<![\\w.])found(?![\\w.])".r.findFirstIn(text).isDefined)
        mapOutsideLiterals(text)(_.replaceAll(
          "(?i)(?<![\\w.])found(?![\\w.])", env.found.toString))
      else text
    if (env.vars.isEmpty) return text1
    val keys = env.vars.keys.toSeq.sortBy(-_.length)
    mapOutsideLiterals(text1) { seg =>
      val seg1 = keys.foldLeft(seg) { (acc, k) =>
        // `var::text` over a float8 var: splice PG's float8out form
        // as a string literal (Spark's double→string cast would emit
        // scientific notation)
        val lit = env.vars(k)
        val asDouble = scala.util.Try(lit.toDouble).toOption
          .filter(_ => lit.matches("-?\\d+(\\.\\d+)?([eE][-+]?\\d+)?"))
        asDouble match {
          case Some(d) if lit.contains(".") || lit.toLowerCase.contains("e") =>
            acc.replaceAll(
              "(?i)(?<![\\w.])" + java.util.regex.Pattern.quote(k) +
                "\\s*::\\s*text\\b",
              java.util.regex.Matcher.quoteReplacement(
                s"'${pgDoubleText(d)}'"))
          case _ => acc
        }
      }
      val seg2 = keys.foldLeft(seg1) { (acc, k) =>
        acc.replaceAll(
          "(?i)(?<![\\w.])" + java.util.regex.Pattern.quote(k) + "(?![\\w.])",
          java.util.regex.Matcher.quoteReplacement(env.vars(k)))
      }
      // a bare ROW variable (not followed by `.field`) becomes its
      // struct literal
      env.rows.keys.toSeq.sortBy(-_.length).foldLeft(seg2) { (acc, n) =>
        acc.replaceAll(
          "(?i)(?<![\\w.])" + java.util.regex.Pattern.quote(n) + "(?![\\w.(])",
          java.util.regex.Matcher.quoteReplacement(structLit(env, n)))
      }
    }
  }

  private def evalRow(spark: SparkSession, expr: String, env: Env) = {
    val sub0 = subst(expr, env)
    // calls to interpreted functions INSIDE expressions (including
    // self-recursion) evaluate here, depth-first
    val sub = if (hasInterpretedCall(sub0))
      substituteInterpretedCalls(spark, sub0) else sub0
    val df = spark.sql(s"SELECT (${PgSql.rewrite(sub)})")
    (df.head().get(0), df.schema.head.dataType)
  }

  private def eval(spark: SparkSession, expr: String, env: Env): String = {
    val (v, dt) = evalRow(spark, expr, env)
    render(v, dt)
  }

  private def evalBool(spark: SparkSession, expr: String, env: Env): Boolean =
    evalRow(spark, expr, env)._1 match {
      case b: java.lang.Boolean => b.booleanValue()
      case null => false
      case other => throw new IllegalArgumentException(
        s"plpgsql condition is not boolean: $expr → $other")
    }

  private def run(spark: SparkSession, stmts: Seq[Stmt], env: Env): Unit =
    stmts.foreach {
      case Assign(n, e) => env.vars(n) = eval(spark, e, env)
      case GetDiag(v, item) =>
        env.vars(v) = if (item == "ROW_COUNT") env.rowCount.toString else "0"
      case SqlStmt("") => ()
      case SqlStmt(text) =>
        // a DML statement updates FOUND/ROW_COUNT (exec_stmt_execsql);
        // Graft's DML paths report their affected-row counts through
        // the tracking hook
        val isDml = "(?is)^\\s*(INSERT|UPDATE|DELETE|MERGE)\\b".r
          .findFirstIn(text).isDefined
        if (isDml) {
          graft.Graft.trackAffected.set(true)
          graft.Graft.lastAffected.set(-1L)
        }
        try graft.Graft.execute(spark, PgSql.rewrite(subst(text, env)))
        finally if (isDml) {
          val n = graft.Graft.lastAffected.get
          if (n >= 0) { env.rowCount = n; env.found = n > 0 }
          graft.Graft.trackAffected.set(false)
        }
      case Perform(q) =>
        // PERFORM = SELECT with the result discarded but FULLY
        // evaluated (pl_exec.c exec_stmt_perform) — foreach forces
        // every projected expression; count() would let Catalyst prune
        // a side-effecting or failing column away. A call to a
        // registered VOID plpgsql function routes to the interpreter.
        val qq = subst(q, env)
        val fm = "(?is)^\\s*([\\w.]+)\\s*\\((.*)\\)\\s*;?\\s*$".r
          .findFirstMatchIn(qq)
        if (fm.exists(f => isVoidFunction(f.group(1))))
          callVoidFunction(spark, fm.get.group(1), fm.get.group(2))
        else
          spark.sql(PgSql.rewrite("SELECT " + qq)).foreach(_ => (): Unit)
      case SelectInto(q, vars) =>
        bindInto(env, vars, spark.sql(PgSql.rewrite(subst(q, env))),
          setFound = true)
      case Ret(e) =>
        throw new ReturnSignal(e.map(x => eval(spark, x, env)).orNull)
      case DynExec(expr, into) =>
        val sqlText = evalRow(spark, expr, env)._1
        require(sqlText != null, "EXECUTE of NULL statement text")
        val res = graft.Graft.execute(spark, sqlText.toString)
        if (into.nonEmpty) {
          val df = res.getOrElse(throw new IllegalArgumentException(
            s"EXECUTE ... INTO needs a query: $sqlText"))
          // no row → every target becomes NULL (pl_exec.c
          // exec_stmt_dynexecute with strict off)
          bindInto(env, into, df)
        }
      case Raise(level, fmt, args) =>
        val rendered = args.map(a => evalRow(spark, a, env)._1)
        val msg = rendered.foldLeft(fmt) { (acc, v) =>
          acc.replaceFirst("%", java.util.regex.Matcher.quoteReplacement(
            if (v == null) "<NULL>" else v.toString))
        }
        if (level == "EXCEPTION") throw new RuntimeException(msg)
        env.notices += s"$level: $msg"
      case IfStmt(branches, els) =>
        branches.find { case (c, _) => evalBool(spark, c, env) } match {
          case Some((_, body)) => run(spark, body, env)
          case None => run(spark, els, env)
        }
      case ExitStmt(when, cont) =>
        if (when.forall(evalBool(spark, _, env))) throw new ExitSignal(cont)
      case ForRange(v, a, b, rev, body) =>
        // PG: FOR i IN a..b counts up; REVERSE a..b counts DOWN from a
        // to b (pl_gram.y for_control) — empty when the direction is
        // wrong, never an error
        val first = evalRow(spark, a, env)._1.asInstanceOf[Number].longValue()
        val second = evalRow(spark, b, env)._1.asInstanceOf[Number].longValue()
        val step = if (rev) -1L else 1L
        val n = math.max(0L, (second - first) * step + 1)
        require(n <= MaxIters, s"plpgsql FOR range too large: $n > $MaxIters")
        var i = 0L
        var exited = false
        while (i < n && !exited) {
          env.vars(v) = (first + step * i).toString
          try run(spark, body, env)
          catch { case e: ExitSignal => if (!e.continue) exited = true }
          i += 1
        }
        env.vars.remove(v)
      case ForQuery(v, q, body) =>
        val df = spark.sql(PgSql.rewrite(subst(q, env)))
        val rows = df.limit(MaxIters + 1).collect()
        require(rows.length <= MaxIters,
          s"plpgsql FOR query exceeds $MaxIters driver-side rows")
        val fields = df.schema.fields
        var exited = false
        for (row <- rows if !exited) {
          fields.zipWithIndex.foreach { case (f, i) =>
            env.vars(s"$v.${f.name.toLowerCase}") = render(row.get(i), f.dataType)
          }
          try run(spark, body, env)
          catch { case e: ExitSignal => if (!e.continue) exited = true }
        }
        fields.foreach(f => env.vars.remove(s"$v.${f.name.toLowerCase}"))
        env.found = rows.nonEmpty // FOR-query sets FOUND (exec_stmt_fors)
      case WhileStmt(cond, body) =>
        var i = 0
        var exited = false
        while (!exited && evalBool(spark, cond, env)) {
          i += 1
          require(i <= MaxIters, s"plpgsql WHILE exceeded $MaxIters iterations")
          try run(spark, body, env)
          catch { case e: ExitSignal => if (!e.continue) exited = true }
        }
    }

  private def runBlock(spark: SparkSession, block: Block, env: Env): Unit = {
    for ((n, t0, init) <- block.decls) {
      val scalar = scalarTypeOf(t0)
      val rowF = if (scalar.isDefined &&
          PgTypes.resolveComposite(t0).isEmpty) None
        else rowFieldsOf(spark, t0)
      rowF match {
        case Some(fields) =>
          env.rows(n) = fields
          fields.foreach { case (f, ft) =>
            env.vars(s"$n.${f.toLowerCase}") = s"CAST(NULL AS $ft)" }
          require(init.isEmpty,
            s"row variable $n cannot take a scalar initializer")
        case None =>
          val t = scalar.getOrElse(throw new IllegalArgumentException(
            s"unknown plpgsql declaration type: $t0"))
          env.vars(n) = init match {
            case Some(e) => eval(spark, s"CAST(($e) AS $t)", env)
            case None => s"CAST(NULL AS $t)"
          }
      }
    }
    if (block.handler.isEmpty) run(spark, block.body, env)
    else {
      try run(spark, block.body, env)
      catch {
        case r: ReturnSignal => throw r // RETURN is not an error
        case _: ExitSignal => throw new IllegalArgumentException(
          "EXIT outside any loop")
        case scala.util.control.NonFatal(e) =>
          val cond = conditionOf(e)
          val section = block.handler.find { case (names, _) =>
            names.contains(cond) || names.contains("others") ||
              names.contains("sqlstate") // WHEN SQLSTATE '...' coarse
          }.getOrElse(throw e) // unmatched condition re-raises (PG)
          // SQLERRM / SQLSTATE magic variables in the handler
          val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
            .replaceAll("\\s+", " ").take(200)
          env.vars("sqlerrm") = "'" + msg.replace("'", "''") + "'"
          env.vars("sqlstate") = "'" + sqlstateOf(cond) + "'"
          run(spark, section._2, env)
      }
    }
  }

  /** Map an engine exception to the PG condition name its class
    * corresponds to (utils/errcodes.txt) — heuristic on the message,
    * loud `others` fallback. */
  private def conditionOf(e: Throwable): String = {
    val m = String.valueOf(e.getMessage).toLowerCase
    if (m.contains("divide by zero") || m.contains("division by zero") ||
      m.contains("divide_by_zero")) "division_by_zero"
    else if (m.contains("duplicate") || m.contains("unique"))
      "unique_violation"
    else if (m.contains("foreign key")) "foreign_key_violation"
    else if (m.contains("table_or_view_not_found") ||
      m.contains("cannot be found")) "undefined_table"
    else if (m.contains("unresolved_column")) "undefined_column"
    else if (m.contains("unresolved_routine")) "undefined_function"
    else if (m.contains("arithmetic_overflow") || m.contains("overflow") ||
      m.contains("out of range")) "numeric_value_out_of_range"
    else if (m.contains("cast_invalid_input") || m.contains("malformed"))
      "invalid_text_representation"
    else if (m.contains("more than one row")) "too_many_rows"
    else if (m.contains("no rows")) "no_data_found"
    else "internal_error"
  }

  private def sqlstateOf(cond: String): String = cond match {
    case "division_by_zero" => "22012"
    case "unique_violation" => "23505"
    case "foreign_key_violation" => "23503"
    case "undefined_table" => "42P01"
    case "undefined_column" => "42703"
    case "undefined_function" => "42883"
    case "numeric_value_out_of_range" => "22003"
    case "invalid_text_representation" => "22P02"
    case "too_many_rows" => "P0003"
    case "no_data_found" => "P0002"
    case _ => "XX000"
  }

  // ---------------------------------------------------------------
  // entry points
  // ---------------------------------------------------------------
  private val doRe =
    ("(?is)^\\s*DO\\s+(?:LANGUAGE\\s+plpgsql\\s+)?" +
      "(?:\\$(\\w*)\\$(.*)\\$\\1\\$|'([^']*+(?:''[^']*+)*+)')" +
      "(?:\\s+LANGUAGE\\s+plpgsql)?\\s*;?\\s*$").r

  /** Execute a `DO` block; returns the RAISE NOTICE/INFO/WARNING lines
    * (the reference streams them to the client). */
  def executeDo(spark: SparkSession, stmt: String): Seq[String] = {
    val m = doRe.findFirstMatchIn(stmt).getOrElse(
      throw new IllegalArgumentException(s"cannot parse DO statement: $stmt"))
    val body = Option(m.group(2)).getOrElse(m.group(3).replace("''", "'"))
    val env = new Env
    runBlock(spark, parseBlock(body), env)
    env.notices.toSeq
  }

  private final case class Proc(name: String, params: Seq[(String, String)],
                                body: Block)
  private val procedures = new ConcurrentHashMap[String, Proc]()

  private val procRe =
    ("(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?PROCEDURE\\s+([\\w.]+)\\s*" +
      "\\(([^)]*)\\)\\s+AS\\s+\\$(\\w*)\\$(.*)\\$\\3\\$" +
      "\\s+LANGUAGE\\s+PLPGSQL\\s*;?\\s*$").r

  /** `CREATE PROCEDURE name(p type, ...) AS $$ ... $$ LANGUAGE
    * plpgsql` — parsed once, bodies run through the same interpreter
    * at CALL time. IN parameters only (OUT/INOUT rejected). */
  def createProcedure(ddl: String): String = {
    val m = procRe.findFirstMatchIn(ddl).getOrElse(
      throw new IllegalArgumentException(
        s"not a CREATE PROCEDURE ... LANGUAGE plpgsql statement: $ddl"))
    val params = GreengageDdl.splitTop(m.group(2)).map { p =>
      val parts = p.trim.replaceAll("(?i)^IN\\s+", "").split("\\s+", 2)
      require(parts.length == 2 && !parts(0).matches("(?i)OUT|INOUT"),
        s"only IN parameters are supported: '$p'")
      (parts(0).toLowerCase, GreengageDdl.mapType(parts(1)))
    }
    val name = m.group(1).toLowerCase
    procedures.put(name, Proc(name, params, parseBlock(m.group(4))))
    name
  }

  /** `CREATE FUNCTION f(...) RETURNS VOID AS $$ ... $$ LANGUAGE
    * plpgsql` — a function run for SIDE EFFECTS (pl_exec.c: prokind
    * 'f' with a VOID result): same interpreter as procedures.
    * Positional `$n` parameter references rewrite to synthetic names
    * (`__p_n`); unnamed parameters get those names too. Invoked via
    * `SELECT f(args)` (Graft routes it here) or PERFORM. */
  private val voidFnRe =
    ("(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?FUNCTION\\s+([\\w.]+)\\s*" +
      "\\(([^)]*)\\)\\s+RETURNS\\s+VOID\\s+AS\\s+\\$(\\w*)\\$(.*)\\$\\3\\$" +
      // volatility/strictness may sit BEFORE the language tag
      // (gram.y createfunc_opt_item order is free)
      "\\s*(?:(?:VOLATILE|STABLE|IMMUTABLE|STRICT|SECURITY\\s+\\w+)\\s+)*" +
      "LANGUAGE\\s+'?PLPGSQL'?" +
      "(?:\\s+(?:VOLATILE|STABLE|IMMUTABLE|STRICT|SECURITY\\s+\\w+))*" +
      "\\s*;?\\s*$").r

  def isVoidFunctionDdl(ddl: String): Boolean =
    voidFnRe.findFirstMatchIn(ddl).isDefined

  def createVoidFunction(ddl: String): String = {
    val m = voidFnRe.findFirstMatchIn(ddl).getOrElse(
      throw new IllegalArgumentException(
        s"not a CREATE FUNCTION ... RETURNS VOID plpgsql statement: $ddl"))
    val params = GreengageDdl.splitTop(m.group(2)).zipWithIndex.map {
      case (p, i) =>
        val parts = p.trim.replaceAll("(?i)^IN\\s+", "").split("\\s+", 2)
        if (parts.length == 2)
          (parts(0).toLowerCase, GreengageDdl.mapType(parts(1)))
        else (s"__p_${i + 1}", GreengageDdl.mapType(parts(0)))
    }
    val body = m.group(4).replaceAll("\\$(\\d+)", "__p_$1")
    val name = m.group(1).toLowerCase
    procedures.put(name, Proc(name, params, parseBlock(body)))
    name
  }

  def isVoidFunction(name: String): Boolean =
    procedures.containsKey(name.toLowerCase)

  /** Run a registered void function with the given argument
    * EXPRESSIONS (evaluated in the session). */
  def callVoidFunction(spark: SparkSession, name: String,
                       argList: String): Unit = {
    val proc = Option(procedures.get(name.toLowerCase)).getOrElse(
      throw new IllegalArgumentException(s"unknown function: $name"))
    val args =
      if (argList.trim.isEmpty) Seq.empty
      else GreengageDdl.splitTop(argList)
    require(args.length == proc.params.length,
      s"$name: ${args.length} args for ${proc.params.length} params")
    val env = new Env
    proc.params.zip(args).foreach { case ((n, t), a) =>
      env.vars(n) = eval(spark, s"CAST(($a) AS $t)", env)
    }
    try runBlock(spark, proc.body, env)
    catch { case _: ReturnSignal => () } // bare RETURN exits a void fn
  }

  private val callRe = "(?is)^\\s*CALL\\s+([\\w.]+)\\s*\\((.*)\\)\\s*;?\\s*$".r

  /** `CALL name(args...)`: argument expressions evaluate in the
    * session, bind to the declared parameters, and the stored body
    * runs. Returns the notices, like [[executeDo]]. */
  def call(spark: SparkSession, stmt: String): Seq[String] = {
    val m = callRe.findFirstMatchIn(stmt).getOrElse(
      throw new IllegalArgumentException(s"cannot parse CALL: $stmt"))
    val proc = Option(procedures.get(m.group(1).toLowerCase)).getOrElse(
      throw new IllegalArgumentException(s"unknown procedure: ${m.group(1)}"))
    val args = GreengageDdl.splitTop(m.group(2))
    require(args.length == proc.params.length,
      s"CALL ${proc.name}: ${args.length} args for ${proc.params.length} params")
    val env = new Env
    proc.params.zip(args).foreach { case ((n, t), a) =>
      env.vars(n) = eval(spark, s"CAST(($a) AS $t)", env)
    }
    try runBlock(spark, proc.body, env)
    catch { case _: ReturnSignal => () }
    env.notices.toSeq
  }

  // ---------------------------------------------------------------
  // Interpreted SCALAR functions (the reference's SIRV shape —
  // sirv_functions.sql: volatile plpgsql functions whose bodies run
  // DDL/EXECUTE/loops and RETURN one value). PG evaluates such a call
  // ONCE per statement as an InitPlan on the dispatcher
  // (planner.c/createplan.c InitPlan for uncorrelated fn scans); the
  // analog here is driver-side evaluation at statement-rewrite time:
  // the body runs through this interpreter (each contained statement
  // re-enters Graft.execute, so the data work stays distributed) and
  // the call text is replaced with the RETURNed value as a typed
  // literal. Registered as the FALLBACK when SqlFunctions can't
  // compile the body to one inline expression.
  // ---------------------------------------------------------------
  /** `returns` keeps the RAW PG type name — resolved per call so a
    * table-rowtype return binds the live schema; `record` skips the
    * result cast entirely. */
  private final case class ScalarFn(name: String,
                                    params: Seq[(String, String)],
                                    returns: String, body: Block)
  private val scalarFns = new ConcurrentHashMap[String, ScalarFn]()

  private def mapRetType(t: String): String = {
    val tt = t.trim
    if (tt.endsWith("[]"))
      s"ARRAY<${GreengageDdl.mapType(tt.dropRight(2).trim)}>"
    else GreengageDdl.mapType(tt)
  }

  /** Spark type of a function's declared return, or None for `record`
    * (untyped — the literal passes through uncast). */
  private def retSparkType(spark: SparkSession, pg: String): Option[String] =
    if (pg.equalsIgnoreCase("record")) None
    else scala.util.Try(mapRetType(pg)).toOption
      .orElse(rowFieldsOf(spark, pg).map(fs =>
        fs.map { case (f, t) => s"$f: $t" }.mkString("STRUCT<", ", ", ">")))

  /** Whether calls to `name` yield a COMPOSITE value (drives FROM-item
    * column expansion, PG's func_table semantics). */
  private def returnsComposite(spark: SparkSession, name: String): Boolean =
    Option(scalarFns.get(name.toLowerCase)).exists { fn =>
      fn.returns.equalsIgnoreCase("record") ||
        retSparkType(spark, fn.returns).exists(_.startsWith("STRUCT<"))
    }

  private val fnAttr =
    "(?:VOLATILE|STABLE|IMMUTABLE|STRICT|SECURITY\\s+\\w+|" +
      "MODIFIES\\s+SQL\\s+DATA|READS\\s+SQL\\s+DATA|NO\\s+SQL|" +
      "CONTAINS\\s+SQL|COST\\s+\\d+|CALLED\\s+ON\\s+NULL\\s+INPUT|" +
      "RETURNS\\s+NULL\\s+ON\\s+NULL\\s+INPUT)"

  /** Split a CREATE FUNCTION DDL around its first `$tag$...$tag$`
    * body — matching the body with a regex would backtrack
    * catastrophically on 50-line function sources. */
  private def splitDollarBody(ddl: String)
      : Option[(String, String, String)] = {
    val open = "\\$(\\w*)\\$".r.findFirstMatchIn(ddl).getOrElse(
      return splitQuotedBody(ddl))
    val tag = "$" + open.group(1) + "$"
    val end = ddl.indexOf(tag, open.end)
    if (end < 0) None
    else Some((ddl.substring(0, open.start),
      ddl.substring(open.end, end), ddl.substring(end + tag.length)))
  }

  /** The pre-dollar-quoting body spelling `AS '...'` with `''`
    * escapes (still common in the regress suites). */
  private def splitQuotedBody(ddl: String)
      : Option[(String, String, String)] = {
    val m = "(?is)\\bAS\\s*'".r.findFirstMatchIn(ddl).getOrElse(return None)
    val start = m.end - 1
    val end = try skipLiteral(ddl, start)
      catch { case _: IllegalArgumentException => return None }
    Some((ddl.substring(0, start),
      ddl.substring(start + 1, end - 1).replace("''", "'"),
      ddl.substring(end)))
  }

  private val scalarHeadRe =
    ("(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?FUNCTION\\s+([\\w.]+)\\s*" +
      "\\(([^)]*)\\)\\s*(?:RETURNS\\s+([\\w\\[\\]]+(?:\\s+precision)?)\\s+)?" +
      "AS\\s*$").r
  private val scalarTailRe =
    (s"(?is)^\\s*(?:$fnAttr\\s+)*LANGUAGE\\s+'?PLPGSQL'?" +
      s"(?:\\s+$fnAttr)*\\s*;?\\s*$$").r

  private def parseScalarFnDdl(ddl: String)
      : Option[(String, String, Option[String], String)] =
    splitDollarBody(ddl).flatMap { case (head, body, tail) =>
      for {
        hm <- scalarHeadRe.findFirstMatchIn(head)
        if scalarTailRe.findFirstIn(tail).isDefined
      } yield (hm.group(1), hm.group(2), Option(hm.group(3)), body)
    }

  def isScalarFunctionDdl(ddl: String): Boolean =
    parseScalarFnDdl(ddl).exists { case (_, params, rt, _) =>
      // no RETURNS clause is legal only with OUT parameters (the
      // return is the OUT record, gram.y func_args_with_defaults)
      rt.forall(r => !r.equalsIgnoreCase("void") &&
        !r.toLowerCase.startsWith("setof")) &&
        (rt.isDefined ||
          "(?i)\\bOUT\\s+\\w".r.findFirstIn(params).isDefined)
    }

  /** Register an interpreted scalar plpgsql function. OUT parameters
    * become local variables; with no RETURNS clause the function
    * returns the OUT record. */
  def createScalarFunction(ddl: String): String = {
    val (fname, paramsTxt, retOpt, rawBody) =
      parseScalarFnDdl(ddl).getOrElse(
        throw new IllegalArgumentException(
          s"not a CREATE FUNCTION ... RETURNS <type> plpgsql statement: $ddl"))
    val allParams = GreengageDdl.splitTop(paramsTxt)
    val outs = allParams.filter(p =>
      "(?i)^\\s*OUT\\s+\\w".r.findFirstIn(p).isDefined)
    val params = allParams
      .filterNot(p => "(?i)^\\s*OUT\\s+\\w".r.findFirstIn(p).isDefined)
      .zipWithIndex.map { case (p, i) =>
        val parts = p.trim.replaceAll("(?i)^(IN|INOUT)\\s+", "")
          .split("\\s+", 2)
        if (parts.length == 2)
          (parts(0).toLowerCase, mapRetType(parts(1)))
        else (s"__p_${i + 1}", mapRetType(parts(0)))
      }
    // OUT params: DECLARE-equivalent locals; an implicit `RETURN
    // (out1, ...)` record is never consumed by the ported call sites,
    // so registration suffices (a call returns NULL record)
    val outDecls = outs.map { p =>
      val parts = p.trim.replaceFirst("(?i)^OUT\\s+", "").split("\\s+", 2)
      s"${parts(0)} ${parts(1)};"
    }
    val body0 = rawBody.replaceAll("\\$(\\d+)", "__p_$1")
    val body =
      if (outDecls.isEmpty) body0
      else { // graft the OUT declarations into the DECLARE section
        val trimmed = body0.replaceFirst("(?is)^\\s*DECLARE\\s+", "")
        "DECLARE " + outDecls.mkString(" ") + " " + trimmed
      }
    val returns = retOpt.map(_.trim).getOrElse("record")
    val name = fname.toLowerCase
    scalarFns.put(name, ScalarFn(name, params, returns, parseBlock(body)))
    name
  }

  def isScalarFunction(name: String): Boolean =
    scalarFns.containsKey(name.toLowerCase)

  // SETOF plpgsql with imperative bodies (RETURN NEXT loops): the
  // reference's own suites never successfully CALL these through this
  // engine's ported statements (GP errors on set-valued calls in the
  // contexts used), so registration succeeds and any call errors
  // loudly — never a silent wrong answer.
  private val setofStubs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def isSetofPlpgsqlDdl(ddl: String): Boolean =
    splitDollarBody(ddl).exists { case (head, _, tail) =>
      ("(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?FUNCTION\\s+[\\w.]+\\s*" +
        "\\([^)]*\\)\\s*RETURNS\\s+SETOF\\s+[\\w.]+\\s+AS\\s*$").r
        .findFirstIn(head).isDefined &&
        scalarTailRe.findFirstIn(tail).isDefined
    }

  def registerSetofStub(ddl: String): String = {
    val m = ("(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?FUNCTION\\s+" +
      "([\\w.]+)").r.findFirstMatchIn(ddl).getOrElse(
      throw new IllegalArgumentException(s"cannot parse SETOF function: $ddl"))
    val name = m.group(1).toLowerCase
    setofStubs.add(name)
    name
  }

  def isSetofStub(name: String): Boolean =
    setofStubs.contains(name.toLowerCase)

  // interpreted functions registered by OTHER language runtimes
  // (plpythonu — PlPython): name → (spark, argList) => result literal.
  // They join scalarFns in call-site substitution.
  private val externalFns = new ConcurrentHashMap[
    String, (SparkSession, String) => String]()

  def registerExternalFunction(name: String,
      call: (SparkSession, String) => String): Unit = {
    externalFns.put(name.toLowerCase, call); ()
  }

  def dropScalarFunction(name: String): Unit = {
    scalarFns.remove(name.toLowerCase)
    procedures.remove(name.toLowerCase)
    externalFns.remove(name.toLowerCase)
    ()
  }

  /** Run a registered scalar function; returns the RETURN value as a
    * typed SQL literal (`CAST((<lit>) AS <type>)`). */
  def callScalarFunction(spark: SparkSession, name: String,
                         argList: String): String = {
    Option(externalFns.get(name.toLowerCase)).foreach { f =>
      return f(spark, argList)
    }
    val fn = Option(scalarFns.get(name.toLowerCase)).getOrElse(
      throw new IllegalArgumentException(s"unknown function: $name"))
    val args =
      if (argList.trim.isEmpty) Seq.empty else GreengageDdl.splitTop(argList)
    require(args.length == fn.params.length,
      s"$name: ${args.length} args for ${fn.params.length} params")
    val env = new Env
    fn.params.zip(args).foreach { case ((n, t), a) =>
      env.vars(n) = eval(spark, s"CAST(($a) AS $t)", env)
    }
    val lit =
      try { runBlock(spark, fn.body, env); null }
      catch { case r: ReturnSignal => r.lit }
    retSparkType(spark, fn.returns) match {
      case Some(t) if lit == null => s"CAST(NULL AS $t)"
      case Some(t) => s"CAST(($lit) AS $t)"
      case None => if (lit == null) "NULL" else s"($lit)"
    }
  }

  /** True when the statement text calls a registered interpreted
    * scalar function (outside string literals). */
  private def interpretedNames: Seq[String] = {
    import scala.jdk.CollectionConverters._
    (scalarFns.keys.asScala ++ externalFns.keys.asScala).toSeq.distinct
  }

  def hasInterpretedCall(sql: String): Boolean = {
    if (scalarFns.isEmpty && externalFns.isEmpty) return false
    val masked = PgSql.maskLiterals(sql)
    interpretedNames.exists(n =>
      ("(?i)(?<![\\w.])" + java.util.regex.Pattern.quote(n) + "\\s*\\(").r
        .findFirstIn(masked).isDefined)
  }

  private def firstCall(masked: String): Option[(String, Int, Int)] = {
    interpretedNames.flatMap { n =>
      ("(?i)(?<![\\w.])" + java.util.regex.Pattern.quote(n) + "\\s*\\(").r
        .findFirstMatchIn(masked)
        .map(m => (n, m.start, m.end - 1)) // (name, callStart, '(' idx)
    }.sortBy(_._2).headOption
  }

  /** FROM-position scalar-function items (gram.y func_table — PG
    * treats `FROM f(args) [AS a]` as a one-row, one-column table
    * source): wrap each FROM item that contains an interpreted call
    * into `(SELECT <item> AS <alias>) AS <alias>` so the scalar
    * substitution below leaves valid SQL. */
  private def rewriteFromItems(sql: String): String = {
    val masked = PgSql.maskLiterals(sql)
    val fromRe = "(?i)\\bfrom\\s+".r
    val stops = Seq("WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "OFFSET",
      "UNION", "INTERSECT", "EXCEPT", "WINDOW", "DISTRIBUTED", "RETURNING",
      "JOIN", "ON", "USING", "INTO")
    val edits = Seq.newBuilder[(Int, Int, String)] // (start, end, replacement)
    for (fm <- fromRe.findAllMatchIn(masked)) {
      var pos = fm.end
      var more = true
      while (more) {
        // one from-item: scan to the next top-level ',' / stop keyword
        var i = pos
        var depth = 0
        var end = -1
        while (i < masked.length && end < 0) {
          val c = masked.charAt(i)
          if (c == '(') depth += 1
          else if (c == ')') { depth -= 1; if (depth < 0) end = i }
          else if (depth == 0) {
            if (c == ',' || c == ';') end = i
            else if (c.isLetter &&
                stops.exists(k => phraseAt(masked, i, k) >= 0)) end = i
          }
          i += 1
        }
        if (end < 0) end = masked.length
        val raw = sql.substring(pos, end)
        val lead = raw.length - raw.replaceFirst("^\\s+", "").length
        val item = raw.trim
        val itemStart = pos + lead
        val itemEnd = itemStart + item.length
        val im = ("(?is)^([\\w.]+)\\s*\\((.*)\\)" +
          "(?:\\s+(?:AS\\s+)?(\\w+))?$").r.findFirstMatchIn(item)
        im match {
          case Some(m2) if hasInterpretedCall(item) =>
            val alias = Option(m2.group(3)).getOrElse(
              m2.group(1).split("\\.").last)
            val call = (m2.group(3) match {
              case null => item
              case a => item.substring(0, item.lastIndexOf(a))
                .replaceAll("(?is)\\s+AS\\s*$", "")
            }).trim
            // a composite-returning function in FROM expands to its
            // COLUMNS (PG func_table); a scalar one is a one-column
            // table named by the alias
            val composite = returnsComposite(
              org.apache.spark.sql.SparkSession.active, m2.group(1))
            edits += ((itemStart, itemEnd,
              if (composite)
                s"(SELECT __r.* FROM (SELECT $call AS __r)) AS $alias"
              else s"(SELECT $call AS $alias) AS $alias"))
          case _ =>
        }
        // continue through the comma list; stop at keywords/; /)
        more = end < masked.length && masked.charAt(end) == ','
        pos = end + 1
      }
    }
    val es = edits.result().sortBy(-_._1)
    es.foldLeft(sql) { (acc, e) =>
      acc.substring(0, e._1) + e._3 + acc.substring(e._2)
    }
  }

  /** Replace every interpreted-function call in the statement with its
    * evaluated value as a typed literal (left-to-right; each call
    * evaluates exactly once). FROM-position items wrap first. */
  def substituteInterpretedCalls(spark: SparkSession, sql0: String): String = {
    var sql = rewriteFromItems(sql0)
    var guard = 0
    while (guard < 500) {
      guard += 1
      val masked = PgSql.maskLiterals(sql)
      firstCall(masked) match {
        case None => return sql
        case Some((name, start, open)) =>
          val close = PgSql.matchingParen(masked, open)
          require(close > open, s"unbalanced call to $name in: $sql")
          val lit = callScalarFunction(spark, name,
            sql.substring(open + 1, close))
          sql = sql.substring(0, start) + lit + sql.substring(close + 1)
      }
    }
    throw new IllegalStateException(
      "interpreted-call substitution did not converge")
  }
}
