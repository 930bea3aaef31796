package graft

import org.apache.spark.sql.SparkSession

/** Dump the executed (post-AQE) physical plan of catalog queries —
  * the generator behind PLANS.md.
  * Usage: runMain graft.PlanDump <sfDir> <query1,query2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.split(",").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE
      println(s"\n## $name\n")
      println("```")
      println(df.queryExecution.executedPlan.toString.trim)
      println("```")
    }
    spark.stop()
  }
}
