package graft

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
}
