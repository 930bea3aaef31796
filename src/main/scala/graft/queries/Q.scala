package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the query catalog.
  *
  * Float determinism convention (FIXTURES.md: monetary columns are DOUBLE):
  * every aggregate over doubles goes through an exact DECIMAL cast, so the
  * result is independent of partitioning/merge order and bit-identical to
  * the DuckDB oracle computing the same decimal sum. The final value is
  * cast back to DOUBLE. Non-aggregated double arithmetic is IEEE-exact and
  * needs no special handling as long as the oracle uses the same
  * expression shape.
  */
object Q {

  type QueryFn = (SparkSession, String) => DataFrame

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    graft.Tables.register(spark, sfDir)
    spark.table(name)
  }

  def sql(spark: SparkSession, sfDir: String, q: String): DataFrame = {
    graft.Tables.register(spark, sfDir)
    spark.sql(q)
  }

  /** Exact decimal image of a 2-dp monetary double. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Order-insensitive exact sum of a monetary double, surfaced as double. */
  def sumd(c: Column): Column = sum(dec(c)).cast("double")

  /** Oracle-side spelling of [[sumd]]. */
  def oSumd(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"
}
