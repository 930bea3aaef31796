package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scratch profiler for q98_stream_dedup — prints per-batch
  * StreamingQueryProgress durations so the state-store commit cost is
  * measured, not guessed. Not part of the catalog. */
object ProfileQ98 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, sfDir)

    for (round <- 1 to 3) {
      val doubled = graft.streaming.Streams.eventsStream(spark, sfDir)
        .withColumn("__copy", explode(
          when(col("event_id") % 10 === 0, array(lit(0), lit(1)))
            .otherwise(array(lit(0)))))
        .drop("__copy")
      val agg = doubled
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id", "ts")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_unique"))
      val t0 = System.nanoTime()
      val q = agg.writeStream.format("memory")
        .queryName(s"prof_q98_$round").outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val total = (System.nanoTime() - t0) / 1e9
      println(s"=== round $round total ${f"$total%.2f"}s")
      q.recentProgress.foreach { p =>
        println(s"  batch ${p.batchId}: durationMs=${p.durationMs} " +
          s"rows=${p.numInputRows}")
        p.stateOperators.foreach { so =>
          println(s"    op=${so.operatorName} commitMs=${so.commitTimeMs} " +
            s"rowsUpdated=${so.numRowsUpdated} stateRows=${so.numRowsTotal} " +
            s"memUsed=${so.memoryUsedBytes}")
        }
      }
    }
    spark.stop()
  }
}
