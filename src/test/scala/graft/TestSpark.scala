package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Spark startup is ~10 s). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "target/test-warehouse")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Tables.tune(s)
    graft.functions.GraftFunctions.register(s)
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
}
