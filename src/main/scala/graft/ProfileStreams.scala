package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the streaming catalog entries: wraps
  * Streams.runToBatch with a progress listener so per-batch durations
  * and state-store commit costs are measured, not guessed. Not part of
  * the catalog. */
object ProfileStreams {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, sfDir)
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(
      Seq("q136_stream_full_outer", "q229_stream_cdc",
        "q118_stream_stream_join", "q102_stream_stateful"))

    // scoped child sessions do NOT share the default session's streams
    // bus — Streams.scopedSessionHook (set below) attaches this listener
    // inside every scoped session so their batches are observed too
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"  [batch ${p.batchId}] rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
        p.stateOperators.foreach { so =>
          println(s"    op=${so.operatorName} commitMs=${so.commitTimeMs} " +
            s"updated=${so.numRowsUpdated} total=${so.numRowsTotal}")
        }
      }
    }
    spark.streams.addListener(listener)
    graft.streaming.Streams.scopedSessionHook =
      scoped => scoped.streams.addListener(listener)

    // per-job wall time: where do multi-job operators spend it?
    val submitted = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          submitted.put(e.jobId, (System.nanoTime(), desc))
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(submitted.remove(e.jobId)).foreach { case (t0, desc) =>
            val ms = (System.nanoTime() - t0) / 1e6
            if (ms > 20)
              println(f"    job ${e.jobId}%4d ${ms}%8.0f ms  ${desc.take(90)}")
          }
        }
      })

    for (round <- 1 to 2; name <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"=== $name round $round: $total%.2f s")
    }
    spark.stop()
  }
}
