package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query catalog lives in graft.queries.*; each entry pairs a Spark
  * pipeline with DuckDB oracle SQL over the same parquet tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 spine: scan → filter → 2-stage hash agg → sort. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q01_tpch_q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ WindowQueries.queries ++
      WindowQueries.queriesExtra ++
      FunctionQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (approx/hash/LSH/streaming
    * internals) get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ WindowQueries.oracle ++
      FunctionQueries.oracle ++ PipelineQueries.oracle
}
