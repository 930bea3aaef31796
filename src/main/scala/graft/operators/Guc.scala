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
        val v = unquote(m.group(2))
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
            val k = key(m.group(1))
            val v = spark.conf.getOption(k).getOrElse(
              throw new IllegalArgumentException(s"unrecognized parameter: $k"))
            spark.createDataFrame(
              java.util.List.of(Row(v)),
              StructType(Seq(StructField(m.group(1).toLowerCase, StringType))))
          })
      case _ => None
    }
}
