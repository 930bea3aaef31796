package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` output for catalog queries into files —
  * the generator behind plans/r21/<query>_{before,after}.txt.
  * Usage: runMain graft.PlanDumpFmt <sfDir> <outDir> <suffix> <q1,q2,...>
  * Writes <outDir>/<query>_<suffix>.txt for each query.
  */
object PlanDumpFmt {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.split(",").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val formatted =
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      // Also run it so the post-AQE executed plan (final Exchange count /
      // join strategy) is captured alongside the static plan.
      df.write.format("noop").mode("overwrite").save()
      val executed = df.queryExecution.executedPlan.toString
      val out = s"== explain(formatted) ==\n$formatted\n" +
        s"== executedPlan (post-AQE) ==\n$executed\n"
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), out)
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
