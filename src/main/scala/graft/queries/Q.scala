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

  /** Order-insensitive exact sum of a monetary double, surfaced as double.
    *
    * Spelled over LONG CENTS instead of `sum(decimal(18,2))`: the decimal
    * aggregate carries 128-bit state with per-row overflow checks through
    * the agg hash map, while the long sum is a codegen'd primitive.
    * Equivalence: `round(c*100)` recovers the exact cents of a 2-dp
    * monetary double (the double is within 2^-40 of its decimal value, so
    * the nearest integer to c*100 IS the cents value — the same integer
    * `CAST(c AS DECIMAL(18,2))` rounds to), the long sum of cents is
    * exact, and one final IEEE division by 100.0 is correctly rounded —
    * bit-identical to casting the exact decimal sum to double (both are
    * nearest-double of the same rational). Headroom: 9.2e16 dollars per
    * group-sum vs decimal(18,2)'s 1e16 cap per VALUE — the long spelling
    * widens, not narrows, the domain. Verified hash-exact against the
    * DuckDB oracle (which still computes the decimal spelling, oSumd)
    * across the full catalog. */
  def sumd(c: Column): Column =
    (sum(round(c * lit(100)).cast("long")) / lit(100.0)).cast("double")

  /** Oracle-side spelling of [[sumd]]. */
  def oSumd(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"
}
