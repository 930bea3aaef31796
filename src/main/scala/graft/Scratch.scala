package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway probe (deleted before final commit rounds).
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 1. Can Spark read the nanos-timestamp events parquet?
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
      ev.printSchema()
      ev.select(col("ts")).orderBy("event_id").show(3, false)
      println("EVENTS-OK")
    } catch { case e: Throwable => println("EVENTS-FAIL: " + e.getMessage.take(500)) }
    // 2. Decimal sum parity probe
    val l = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    l.groupBy("l_returnflag").agg(
      round(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))), 2)
        .cast("double").as("rev"),
      sum("l_quantity").cast("double").as("qty"),
      count(lit(1)).as("n")
    ).orderBy("l_returnflag").show(false)
    spark.stop()
  }
}
