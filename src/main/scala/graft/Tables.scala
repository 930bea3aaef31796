package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog layer: registers the driver-generated parquet tables
  * (TESTDATA.md / FIXTURES.md) as temp views and applies session tuning.
  *
  * Mirrors the reference's master-held catalog (GreengageDB keeps all
  * metadata on the QD, reference `src/backend/catalog/`); here the
  * "catalog" is the Spark session catalog over immutable parquet — the
  * Spark-native analog of AOCS column store (reference
  * `src/backend/access/aocs/aocsam.c:156` per-column compression ==
  * parquet column chunks).
  *
  * Scale note: registration is pure metadata — no data is read here, no
  * collect. All schema handling (the events nanos fix) stays inside the
  * scan projection so it is codegen'd and pushdown-friendly.
  */
object Tables {

  val tpch: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val pipeline: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ pipeline

  /** Session tuning applied to any session we run queries in. Values are
    * runtime-settable SQL confs (safe post-startup). */
  def tune(spark: SparkSession): Unit = {
    val c = spark.conf
    c.set("spark.sql.session.timeZone", "UTC")
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // Runtime bloom-filter pushdown across large joins (100 TB posture;
    // no effect on tiny local inputs beyond planning).
    c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // Cost-based join reorder for ANALYZEd tables (reference: ORCA
    // CJoinOrderDP; stats via Distribution.analyze).
    c.set("spark.sql.cbo.enabled", "true")
    c.set("spark.sql.cbo.joinReorder.enabled", "true")
    // events.parquet stores timestamp[ns] in some generator versions;
    // read those as long nanos and convert explicitly (see load()) —
    // avoids a silent nanos->micros cast.
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // timestamp[us] columns written without isAdjustedToUTC should read
    // as plain TIMESTAMP (session-UTC instants, matching what the
    // DuckDB oracle sees as naive values), not TIMESTAMP_NTZ — and a
    // plain TimestampType keeps min/max predicate pushdown on the scan.
    c.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // PG-style strict semantics (SURVEY §7.3): error on overflow/div0.
    c.set("spark.sql.ansi.enabled", "true")
  }

  /** Raw table reader. `events.ts` has shipped as parquet timestamp[ns]
    * (arrives as long nanos under nanosAsLong — convert with integer
    * division; going through double would lose precision above 2^53 ns)
    * and as timestamp[us] (arrives as TIMESTAMP directly with NTZ
    * inference off). Dispatch on the actual scan type so either
    * generator vintage loads. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    else df
  }

  private var registeredFor: Option[(SparkSession, String)] = None

  /** Register every fixture table as a temp view + custom functions.
    * Idempotent; memoized per (session, sfDir). */
  def register(spark: SparkSession, sfDir: String): Unit = synchronized {
    if (!registeredFor.contains((spark, sfDir))) {
      tune(spark)
      graft.functions.GraftFunctions.register(spark)
      all.foreach { t => load(spark, sfDir, t).createOrReplaceTempView(t) }
      registeredFor = Some((spark, sfDir))
    }
  }

  /** Test hook: forget the memo so the next register re-creates the
    * views (used by suites that shadow fixture names with their own
    * temp views). */
  private[graft] def invalidate(): Unit = synchronized {
    registeredFor = None
  }
}
