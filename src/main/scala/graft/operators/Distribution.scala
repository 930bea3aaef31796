package graft.operators

import org.apache.spark.sql.{Column, DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-design surface mirroring the reference's distribution DDL
  * (`DISTRIBUTED BY (cols)` / `RANDOMLY` / `REPLICATED`,
  * `src/backend/parser/gram.y:4835-4851`; hash routing
  * `src/backend/cdb/cdbhash.c:173`) and `PARTITION BY`
  * (`cdbpartition.c`). In Spark terms: hash distribution = repartition /
  * bucketBy, replicated = broadcast hint, range/list partitioning =
  * hive-style directory partitioning with pruning.
  */
object Distribution {

  implicit class DistOps(val df: DataFrame) extends AnyVal {

    /** DISTRIBUTED BY (cols) — hash co-location for downstream joins/aggs. */
    def distributedBy(numPartitions: Int, cols: String*): DataFrame =
      df.repartition(numPartitions, cols.map(df.col): _*)

    /** DISTRIBUTED RANDOMLY — round-robin. */
    def distributedRandomly(numPartitions: Int): DataFrame =
      df.repartition(numPartitions)

    /** DISTRIBUTED REPLICATED — full copy on every node (broadcast hint). */
    def replicated: DataFrame = broadcast(df)
  }

  /** Durable DISTRIBUTED BY: bucketed table (co-located, shuffle-free
    * joins between tables bucketed on the same key/count). */
  def createBucketedTable(df: DataFrame, name: String, buckets: Int,
                          bucketCols: Seq[String],
                          sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(name)
  }

  /** PARTITION BY (hive-style dirs → static + dynamic partition pruning). */
  def createPartitionedTable(df: DataFrame, name: String,
                             partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").format("parquet")
      .partitionBy(partitionCols: _*).saveAsTable(name)

  /** ANALYZE → CBO stats (reference `commands/analyze.c` → pg_statistic). */
  /** Data-skew report for a distribution key — the gp_toolkit
    * `gp_skew_coefficients` diagnostic (reference
    * `gpMgmt/../gp_toolkit.sql` skew views): rows per segment under
    * the key's hash distribution, plus the coefficient of variation
    * (stddev/mean, in percent) that gp_toolkit reports. One
    * aggregation; the per-segment histogram is `segments` rows. */
  def skewReport(df: DataFrame, segments: Int,
                 keys: String*): DataFrame =
    skewReportBy(df, pmod(hash(keys.map(col): _*), lit(segments)))

  /** Same report over an explicit segment expression (the catalog row
    * uses a modulo key so the DuckDB oracle can replay it — murmur
    * segment ids are engine-specific). */
  def skewReportBy(df: DataFrame, segmentCol: Column): DataFrame =
    df.groupBy(segmentCol.as("segment"))
      .agg(count(lit(1)).as("n"))
      .agg(
        round(stddev_pop(col("n")) / avg(col("n")) * 100.0, 4)
          .as("skew_coeff_pct"),
        min(col("n")).as("min_rows"), max(col("n")).as("max_rows"),
        count(lit(1)).as("segments_hit"))

  def analyze(spark: SparkSession, table: String, cols: Seq[String]): Unit =
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS ${cols.mkString(", ")}")
}
