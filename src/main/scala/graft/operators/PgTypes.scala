package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User-defined PG types — `CREATE TYPE ... AS ENUM`, composite
  * `CREATE TYPE ... AS (...)`, and `CREATE DOMAIN` (reference
  * `src/backend/commands/typecmds.c`: DefineEnum :1126, DefineCompositeType,
  * DefineDomain; grammar `gram.y` DefineStmt/CreateDomainStmt). These are
  * the first statements of any restored pg_dump, so the router must
  * accept them for dump replay to get anywhere.
  *
  * Spark mapping (SURVEY §1.2): enum → STRING plus a check constraint
  * enforced on INSERT/COPY into declaring tables (PG errors with
  * "invalid input value for enum"); composite → STRUCT with the mapped
  * field types; domain → its base type plus the optional CHECK
  * (VALUE ...) predicate, enforced the same way. Label order is kept so
  * enum comparisons *could* order by ordinal; values themselves are
  * plain strings, exactly how parquet would store them at scale.
  *
  * Enforcement is ONE aggregate over the inserted batch (all constrained
  * columns folded into a single pass), before the write — map-side work,
  * no extra shuffle. */
object PgTypes {

  final case class EnumType(labels: Seq[String])
  final case class DomainType(baseSpark: String, check: Option[String])
  final case class CompositeType(fields: Seq[(String, String)])

  private val enums = TrieMap[String, EnumType]()
  private val domains = TrieMap[String, DomainType]()
  private val composites = TrieMap[String, CompositeType]()
  // base types declared with catalog I/O functions (CREATE TYPE t
  // (input=t_in, ...) where t_in is LANGUAGE internal): the input
  // function names the binary-compatible builtin, so the type IS that
  // builtin here (partition.sql's myint over int4in/int4out)
  private val baseAliases = TrieMap[String, String]()
  private val inputFnType = Map(
    "int2in" -> "SMALLINT", "int4in" -> "INT", "int8in" -> "BIGINT",
    "float4in" -> "FLOAT", "float8in" -> "DOUBLE",
    "numeric_in" -> "DECIMAL(38,18)", "boolin" -> "BOOLEAN",
    "textin" -> "STRING", "varcharin" -> "STRING", "bpcharin" -> "STRING",
    "date_in" -> "DATE", "timestamp_in" -> "TIMESTAMP_NTZ",
    "timestamptz_in" -> "TIMESTAMP", "byteain" -> "BINARY")
  // the reference ships COMPLEX as a builtin (complex_type.c,
  // pg_type.h) — modeled as the re/im struct per SURVEY §1.2
  composites.put("complex",
    CompositeType(Seq("re" -> "DOUBLE", "im" -> "DOUBLE")))
  // table → (column, registered type name) for constraint enforcement
  private val tableCols = TrieMap[String, Seq[(String, String)]]()

  private def norm(n: String): String =
    n.replace("\"", "").trim.toLowerCase.stripPrefix("public.")

  // type owners (ALTER TYPE ... OWNER TO) for the pg_type/pg_authid
  // introspection join; default owner is the bootstrap superuser
  private val owners = TrieMap[String, String]()

  def setOwner(typeName: String, role: String): Unit = {
    owners.put(norm(typeName), role.replace("\"", "")); ()
  }

  /** (bare type name, owner role) for every registered user type. */
  def allTypes: Seq[(String, String)] =
    (enums.keySet ++ domains.keySet ++ composites.keySet).toSeq.map { n =>
      (n.split("\\.").last, owners.getOrElse(n, "gpadmin"))
    }

  def isRegistered(typeName: String): Boolean = {
    val n = norm(typeName)
    enums.contains(n) || domains.contains(n) || composites.contains(n) ||
      baseAliases.contains(n)
  }

  /** Spark SQL type string for a registered type name, if any. */
  def resolve(typeName: String): Option[String] = {
    val n = norm(typeName)
    enums.get(n).map(_ => "STRING")
      .orElse(domains.get(n).map(_.baseSpark))
      .orElse(baseAliases.get(n))
      .orElse(composites.get(n).map(c =>
        c.fields.map { case (f, t) => s"$f: $t" }.mkString("STRUCT<", ", ", ">")))
  }

  /** Composite (row) types only — a LIST partition over one of these
    * stores the PG text form, see GreengageDdl. */
  def resolveComposite(typeName: String): Option[CompositeType] =
    composites.get(norm(typeName))

  /** `CREATE TYPE name AS ENUM ('a', ...)` or
    * `CREATE TYPE name AS (field type, ...)`. A bare `CREATE TYPE name`
    * (shell type, pg_dump emits these before I/O functions) is a no-op. */
  def createType(ddl: String): Unit = {
    val sql = ddl.trim.stripSuffix(";").trim
    val m = "(?is)^CREATE\\s+TYPE\\s+([\\w.\"]+)\\s*(.*)$".r
      .findFirstMatchIn(sql).getOrElse(
        throw new IllegalArgumentException(s"cannot parse CREATE TYPE: $ddl"))
    val name = norm(m.group(1))
    val rest = m.group(2).trim
    if (rest.isEmpty) () // shell type
    else if (rest.matches("(?is)^AS\\s+ENUM\\s*\\(.*")) {
      val (body, _) = GreengageDdl.balanced(rest, rest.indexOf('('))
      val labels = "'([^']*+(?:''[^']*+)*+)'".r.findAllMatchIn(body)
        .map(_.group(1).replace("''", "'")).toSeq
      require(enums.putIfAbsent(name, EnumType(labels)).isEmpty,
        s"type \"$name\" already exists")
    } else if (rest.matches("(?is)^AS\\s*\\(.*")) {
      val (body, _) = GreengageDdl.balanced(rest, rest.indexOf('('))
      val fields = GreengageDdl.splitTop(body).map { fdef =>
        val parts = fdef.trim.split("\\s+", 2)
        require(parts.length == 2, s"cannot parse composite field: '$fdef'")
        (parts(0).replace("\"", ""), GreengageDdl.mapType(parts(1)))
      }
      require(composites.putIfAbsent(name, CompositeType(fields)).isEmpty,
        s"type \"$name\" already exists")
    } else {
      // base type with I/O functions: when the input function was
      // aliased to a catalog builtin (LANGUAGE internal), the type is
      // binary-compatible with that builtin — register the alias.
      // Otherwise map to STRING (values round-trip as text).
      val viaInput = for {
        inFn <- "(?i)\\binput\\s*=\\s*([\\w.\"]+)".r.findFirstMatchIn(rest)
          .map(_.group(1).replace("\"", ""))
        cname <- PgAggregates.internalOf(inFn)
        spark <- inputFnType.get(cname)
      } yield spark
      viaInput match {
        case Some(sparkType) => baseAliases.putIfAbsent(name, sparkType)
        case None => enums.putIfAbsent(name, EnumType(Nil))
      }
    }
    ()
  }

  /** `CREATE DOMAIN name [AS] base [DEFAULT ...] [NOT NULL]
    * [CHECK (...)]` — the CHECK predicate keeps its `VALUE`
    * placeholder and is re-bound per column at enforcement. */
  def createDomain(ddl: String): Unit = {
    val sql = ddl.trim.stripSuffix(";").trim
    val m = "(?is)^CREATE\\s+DOMAIN\\s+([\\w.\"]+)\\s+(?:AS\\s+)?(.*)$".r
      .findFirstMatchIn(sql).getOrElse(
        throw new IllegalArgumentException(s"cannot parse CREATE DOMAIN: $ddl"))
    val name = norm(m.group(1))
    var rest = m.group(2).trim
    var check: Option[String] = None
    val checkRe = "(?is)\\bCHECK\\s*\\(".r
    checkRe.findFirstMatchIn(rest).foreach { c =>
      val (body, after) = GreengageDdl.balanced(rest, c.end - 1)
      check = Some(body)
      rest = (rest.substring(0, c.start) + " " + rest.substring(after)).trim
    }
    val base = rest
      .replaceAll("(?is)\\bDEFAULT\\s+\\S+", " ")
      .replaceAll("(?is)\\bNOT\\s+NULL\\b|\\bNULL\\b", " ").trim
    require(domains.putIfAbsent(name,
      DomainType(GreengageDdl.mapType(base), check)).isEmpty,
      s"domain \"$name\" already exists")
  }

  /** `ALTER TYPE name ADD VALUE [IF NOT EXISTS] 'label'
    * [BEFORE|AFTER 'other']` (typecmds.c AddEnumLabel). */
  def alterAddValue(ddl: String): Unit = {
    val m = ("(?is)^ALTER\\s+TYPE\\s+([\\w.\"]+)\\s+ADD\\s+VALUE\\s+" +
      "(?:IF\\s+NOT\\s+EXISTS\\s+)?'([^']*+(?:''[^']*+)*+)'" +
      "(?:\\s+(BEFORE|AFTER)\\s+'([^']*+(?:''[^']*+)*+)')?").r
      .findFirstMatchIn(ddl.trim).getOrElse(
        throw new IllegalArgumentException(s"cannot parse ALTER TYPE: $ddl"))
    val name = norm(m.group(1))
    val label = m.group(2).replace("''", "'")
    val e = enums.getOrElse(name,
      throw new IllegalArgumentException(s"type \"$name\" does not exist"))
    if (!e.labels.contains(label)) {
      val labels = (Option(m.group(3)).map(_.toUpperCase), Option(m.group(4))) match {
        case (Some(pos), Some(anchor)) =>
          val i = e.labels.indexOf(anchor.replace("''", "'"))
          require(i >= 0, s"enum label \"$anchor\" does not exist")
          val at = if (pos == "BEFORE") i else i + 1
          (e.labels.take(at) :+ label) ++ e.labels.drop(at)
        case _ => e.labels :+ label
      }
      enums.put(name, EnumType(labels))
    }
  }

  /** DROP TYPE / DROP DOMAIN [IF EXISTS] name [CASCADE|RESTRICT]. */
  def drop(ddl: String): Unit = {
    val m = ("(?is)^DROP\\s+(?:TYPE|DOMAIN)\\s+(?:IF\\s+EXISTS\\s+)?" +
      "([\\w.\"]+)").r.findFirstMatchIn(ddl.trim).getOrElse(
        throw new IllegalArgumentException(s"cannot parse DROP TYPE: $ddl"))
    val n = norm(m.group(1))
    enums.remove(n); domains.remove(n); composites.remove(n)
    baseAliases.remove(n)
    ()
  }

  // EVERY registered-type column per table (constrained or not):
  // DROP TYPE .. CASCADE must drop the dependent columns
  private val typedTableCols =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(String, String)]]

  /** Record which of a new table's columns carry registered constrained
    * types (called from the CREATE TABLE path). */
  def recordTable(table: String, cols: Seq[(String, String)]): Unit = {
    if (cols.nonEmpty)
      typedTableCols.put(norm(table),
        cols.map { case (c, tn) => (c, norm(tn)) })
    else typedTableCols.remove(norm(table))
    val constrained = cols.filter { case (_, tn) =>
      val n = norm(tn)
      enums.get(n).exists(_.labels.nonEmpty) ||
        domains.get(n).exists(_.check.isDefined)
    }
    if (constrained.nonEmpty)
      tableCols.put(norm(table), constrained.map { case (c, tn) => (c, norm(tn)) })
    else tableCols.remove(norm(table))
    ()
  }

  /** (table, column) pairs declared with `typeName` — the CASCADE
    * surface of DROP TYPE (dependency.c). */
  def tablesUsing(typeName: String): Seq[(String, String)] = {
    val n = norm(typeName)
    typedTableCols.toSeq.flatMap { case (t, cols) =>
      cols.collect { case (c, tn) if tn == n => (t, c) }
    }
  }

  def constraintsFor(table: String): Seq[(String, String)] =
    tableCols.getOrElse(norm(table), Nil)

  /** Enforce enum labels + domain CHECKs over an insert batch in ONE
    * aggregate pass. `byName` maps constrained column name → the name
    * it carries in `df` (insert column lists can reorder/rename). */
  def validate(df: DataFrame, table: String,
               byName: Map[String, String]): Unit = {
    val cons = constraintsFor(table).flatMap { case (c, tn) =>
      // a dropped type leaves the column unconstrained (PG would have
      // refused the DROP; we accept CASCADE semantics)
      byName.get(c.toLowerCase)
        .filter(_ => enums.contains(tn) || domains.contains(tn))
        .map(dfCol => (c, tn, dfCol))
    }
    if (cons.isEmpty) return
    val checks = cons.map { case (c, tn, dfCol) =>
      val v = col(dfCol)
      val bad = enums.get(tn) match {
        case Some(e) => v.isNotNull && !v.isin(e.labels: _*)
        case None =>
          val d = domains(tn)
          val pred = expr(d.check.get.replaceAll("(?i)\\bVALUE\\b", s"`$dfCol`"))
          v.isNotNull && !coalesce(pred, lit(false))
      }
      sum(when(bad, 1L).otherwise(0L)).as(s"__bad_$c")
    }
    val row = df.agg(checks.head, checks.tail: _*).head()
    cons.zipWithIndex.foreach { case ((c, tn, _), i) =>
      val n = if (row.isNullAt(i)) 0L else row.getLong(i)
      if (n > 0)
        throw new IllegalArgumentException(
          if (enums.contains(tn))
            s"invalid input value for enum $tn in column $c ($n rows)"
          else s"value for domain $tn violates check constraint in column $c ($n rows)")
    }
  }
}
