package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Session-variable statements (reference `src/backend/commands/
  * variable.c` + `utils/misc/guc.c`): `SET [SESSION|LOCAL] name
  * {TO|=} value`, `SET TIME ZONE v`, `RESET name`, `SHOW name|ALL`.
  * Spark-native mapping: variables live in the session's runtime conf
  * (arbitrary keys are legal there, scoped per session exactly like
  * PG's session GUCs); the GUCs with a real Spark equivalent are
  * translated — `timezone` → `spark.sql.session.timeZone` — so a
  * migrated script's `SET TIME ZONE` actually changes query results.
  */
object Guc {

  /** GUCs with a genuine Spark conf behind them. */
  private val mapped = Map(
    "timezone" -> "spark.sql.session.timeZone",
    "time zone" -> "spark.sql.session.timeZone")

  /** GUC metadata (guc.c config_generic / guc_gp.c): vartype, boot
    * default, unit ("" = none), category (config_group_names text),
    * [min, max] for ints. Drives `SHOW` for never-set variables, unit
    * pretty-printing, range validation, and the `pg_settings` view.
    * A working subset: the variables regress suites and migration
    * scripts actually read, not the full 600-entry table. */
  final case class GucMeta(vartype: String, boot: String, unit: String,
                           category: String,
                           min: Long = Long.MinValue,
                           max: Long = Long.MaxValue)

  private val qtMethod = "Query Tuning / Planner Method Configuration"
  private val qtOther = "Query Tuning / Other Planner Options"
  private val meta: Map[String, GucMeta] = Map(
    // guc_gp.c:714 — bool, default true
    "gp_enable_predicate_propagation" ->
      GucMeta("bool", "on", "", qtOther),
    // guc_gp.c:4048 — int seconds, default 7200, range [0, 7200]
    "gp_interconnect_setup_timeout" ->
      GucMeta("integer", "7200", "s", "GP Array Tuning", 0, 7200),
    // autovacuum is force-disabled in the reference (autovacuum.c)
    "autovacuum" -> GucMeta("bool", "off", "", "Autovacuum"),
    "enable_seqscan" -> GucMeta("bool", "on", "", qtMethod),
    "enable_indexscan" -> GucMeta("bool", "on", "", qtMethod),
    "enable_bitmapscan" -> GucMeta("bool", "on", "", qtMethod),
    "enable_hashjoin" -> GucMeta("bool", "on", "", qtMethod),
    "enable_mergejoin" -> GucMeta("bool", "off", "", qtMethod),
    "enable_nestloop" -> GucMeta("bool", "off", "", qtMethod),
    "enable_sort" -> GucMeta("bool", "on", "", qtMethod),
    "enable_hashagg" -> GucMeta("bool", "on", "", qtMethod),
    "enable_groupagg" -> GucMeta("bool", "on", "", qtMethod),
    "gp_enable_multiphase_agg" -> GucMeta("bool", "on", "", qtMethod),
    "gp_enable_agg_distinct" -> GucMeta("bool", "on", "", qtOther),
    "gp_enable_fast_sri" -> GucMeta("bool", "on", "", qtOther),
    "gp_enable_direct_dispatch" -> GucMeta("bool", "on", "", qtOther),
    "optimizer" -> GucMeta("bool", "on", "", qtOther),
    "gp_autostats_mode" ->
      GucMeta("enum", "none", "", "Statistics / ANALYZE Database Contents"),
    "datestyle" -> GucMeta("string", "ISO, MDY", "",
      "Client Connection Defaults / Locale and Formatting"),
    "intervalstyle" -> GucMeta("enum", "postgres", "",
      "Client Connection Defaults / Locale and Formatting"),
    "standard_conforming_strings" -> GucMeta("bool", "on", "",
      "Version and Platform Compatibility / Previous PostgreSQL Versions"),
    "bytea_output" -> GucMeta("enum", "hex", "",
      "Client Connection Defaults / Statement Behavior"),
    "search_path" -> GucMeta("string", "\"$user\",public", "",
      "Client Connection Defaults / Statement Behavior"),
    "statement_mem" -> GucMeta("integer", "128000", "kB",
      "Resource Usage / Memory", 1000, Int.MaxValue),
    "gp_vmem_protect_limit" -> GucMeta("integer", "8192", "MB",
      "Resource Usage / Memory", 0, Int.MaxValue))

  /** SHOW's unit pretty-print (guc.c convert_from_base_unit): climb to
    * the largest unit the value divides evenly into. */
  private def displayWithUnit(raw: String, unit: String): String = {
    val n = try raw.trim.toLong catch { case _: NumberFormatException =>
      return raw }
    val chain: Seq[(Long, String)] = unit match {
      case "s" => Seq(86400L -> "d", 3600L -> "h", 60L -> "min", 1L -> "s")
      case "ms" => Seq(86400000L -> "d", 3600000L -> "h", 60000L -> "min",
        1000L -> "s", 1L -> "ms")
      case "min" => Seq(1440L -> "d", 60L -> "h", 1L -> "min")
      case "kB" => Seq(1048576L -> "GB", 1024L -> "MB", 1L -> "kB")
      case "MB" => Seq(1024L -> "GB", 1L -> "MB")
      case _ => return raw
    }
    if (n == 0) return s"0$unit"
    chain.collectFirst {
      case (f, u) if n % f == 0 => s"${n / f}$u"
    }.getOrElse(raw)
  }

  /** The value SHOW/pg_settings reports for `name`: the session-set
    * value if any, else the boot default; int GUCs with units render
    * in the largest clean unit. None = unknown GUC never set. */
  def currentSetting(spark: SparkSession, name: String): Option[String] = {
    val k = key(name)
    val raw = spark.conf.getOption(k).orElse(meta.get(k).map(_.boot))
    raw.map { v =>
      meta.get(k) match {
        case Some(mm) if mm.vartype == "bool" =>
          if (Set("on", "true", "1", "yes", "t").contains(v.toLowerCase))
            "on" else "off"
        case Some(mm) if mm.unit.nonEmpty => displayWithUnit(v, mm.unit)
        case _ => v
      }
    }
  }

  /** Rows for the pg_settings compat view: every known-meta GUC plus
    * any session-set variable, with PG's column set. */
  def pgSettingsRows(spark: SparkSession): Seq[(String, String, String,
      String, String, String)] = {
    val sessionKeys = spark.conf.getAll.keys
      .filter(k => !k.startsWith("spark.") && !k.startsWith("graft."))
      .map(_.toLowerCase).toSet
    (meta.keySet ++ sessionKeys).toSeq.sorted.map { name =>
      val m = meta.get(name)
      (name,
        currentSetting(spark, name).getOrElse(""),
        m.map(_.unit).filter(_.nonEmpty).orNull,
        m.map(_.category).getOrElse("Customized Options"),
        m.map(_.vartype).getOrElse("string"),
        m.map(_.boot).getOrElse(""))
    }
  }

  private val setRe =
    "(?is)^\\s*SET\\s+(?:SESSION\\s+|LOCAL\\s+)?(TIME\\s+ZONE|[\\w.]+)(?:\\s*(?:TO|=)\\s*|\\s+)(.+?)\\s*;?\\s*$".r
  private val resetRe = "(?is)^\\s*RESET\\s+([\\w.]+)\\s*;?\\s*$".r
  private val showRe = "(?is)^\\s*SHOW\\s+(ALL|[\\w.]+)\\s*;?\\s*$".r

  private def key(name: String): String = {
    val n = name.toLowerCase.replaceAll("\\s+", " ")
    mapped.getOrElse(n, n)
  }

  private def unquote(v: String): String = {
    val t = v.trim
    if (t.length >= 2 && t.startsWith("'") && t.endsWith("'"))
      t.substring(1, t.length - 1).replace("''", "'")
    else t
  }

  /** Apply a PG-shaped SET; false when the text isn't one (e.g. bare
    * `SET` or `SET -v` — the router falls back to Spark's own form). */
  /** `search_path` maps to Spark's current database (namespace.c →
    * catalog namespace): the FIRST existing schema on the path becomes
    * current, so unqualified CREATE/SELECT land there and `DROP SCHEMA
    * ... CASCADE` takes its tables with it, exactly PG's behavior.
    * `public` (and `"$user"`) are the default database. */
  private def applySearchPath(spark: SparkSession, v: String): Unit = {
    val first = v.split(",")
      .map(_.trim.stripPrefix("'").stripSuffix("'").trim.replace("\"", ""))
      .filter(s => s.nonEmpty && s.matches("[\\w$]+"))
      .map { case "$user" | "public" => "default"; case s => s }
      .find(spark.catalog.databaseExists)
    spark.catalog.setCurrentDatabase(first.getOrElse("default"))
  }

  def trySet(spark: SparkSession, stmt: String): Boolean =
    setRe.findFirstMatchIn(stmt) match {
      case None => false
      case Some(m) =>
        val k = key(m.group(1))
        val v0 = unquote(m.group(2))
        // int GUCs: accept a unit suffix ('1900MB'), normalize to the
        // base unit, and enforce the declared range (guc.c
        // parse_int + set_config_option out-of-range error)
        val v = meta.get(k) match {
          case Some(mm) if mm.vartype == "integer" &&
              !v0.equalsIgnoreCase("default") =>
            val um = "(?i)^\\s*(-?\\d+)\\s*([a-z]*)\\s*$".r
              .findFirstMatchIn(v0).getOrElse(
                throw new IllegalArgumentException(
                  s"parameter \"$k\" requires an integer value"))
            val mult = (um.group(2).toLowerCase, mm.unit) match {
              case ("", _) => 1L
              case ("kb", "kB") => 1L
              case ("mb", "kB") => 1024L
              case ("gb", "kB") => 1048576L
              case ("mb", "MB") => 1L
              case ("gb", "MB") => 1024L
              case ("s", "s") => 1L
              case ("min", "s") => 60L
              case ("h", "s") => 3600L
              case ("d", "s") => 86400L
              case ("ms", "ms") => 1L
              case ("s", "ms") => 1000L
              case ("min", "ms") => 60000L
              case (u, _) => throw new IllegalArgumentException(
                s"invalid unit \"$u\" for parameter \"$k\"")
            }
            val n = um.group(1).toLong * mult
            if (n < mm.min || n > mm.max)
              throw new IllegalArgumentException(
                s"$n is outside the valid range for parameter " +
                  s"\"$k\" (${mm.min} .. ${mm.max})")
            n.toString
          case _ => v0
        }
        if (k == "search_path") applySearchPath(spark, v)
        if (v.equalsIgnoreCase("default")) spark.conf.unset(k)
        else spark.conf.set(k, v)
        true
    }

  def reset(spark: SparkSession, stmt: String): Unit = {
    val m = resetRe.findFirstMatchIn(stmt).getOrElse(
      throw new IllegalArgumentException(s"cannot parse RESET: $stmt"))
    val k = key(m.group(1))
    if (k == "search_path") spark.catalog.setCurrentDatabase("default")
    spark.conf.unset(k)
  }

  /** Spark's own SHOW objects (fall through to spark.sql, not a GUC). */
  private val sparkShow = Set("tables", "table", "databases", "namespaces",
    "schemas", "catalogs", "columns", "create", "current", "functions",
    "partitions", "tblproperties", "views")

  /** `SHOW x` — a one-row, one-column frame named after the variable
    * (PG's SHOW output shape); `SHOW ALL` routes to the conf listing.
    * None for Spark's own SHOW forms (router falls through). */
  def tryShow(spark: SparkSession, stmt: String): Option[DataFrame] =
    showRe.findFirstMatchIn(stmt) match {
      case Some(m) if !sparkShow.contains(m.group(1).toLowerCase) =>
        Some(
          if (m.group(1).equalsIgnoreCase("all")) spark.sql("SET")
          else {
            val v = currentSetting(spark, m.group(1)).getOrElse(
              throw new IllegalArgumentException(
                s"unrecognized parameter: ${key(m.group(1))}"))
            spark.createDataFrame(
              java.util.List.of(Row(v)),
              StructType(Seq(StructField(m.group(1).toLowerCase, StringType))))
          })
      case _ => None
    }
}
