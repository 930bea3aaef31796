package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics beyond the oracle-checked window queries:
  * watermark late-data drop (observable only with multi-batch input) and
  * custom-state sessionization parity. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("watermark drops late rows in append mode across micro-batches") {
    // Two checkpointed runs = two deterministic micro-batches:
    //  run 1 (f1): hour-10 events → watermark 10:10, nothing finalized.
    //  run 2 (f2): hour-1 event is behind the watermark (dropped);
    //  the 12:30 event advances the watermark to 12:00, finalizing
    //  window 10 with exactly the 2 on-time rows; window 12 stays open.
    def rmr(p: String): Unit = { val f = new java.io.File(p)
      if (f.exists()) { def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm); x.delete() }; rm(f) } }
    rmr("target/test-stream")
    val stage = Files.createDirectories(Paths.get("target/test-stream/late"))
    val ckpt = "target/test-stream/ckpt"
    def writeOne(rows: Seq[(java.sql.Timestamp, Long)], name: String): Unit = {
      val tmp = s"target/test-stream/tmp_$name"
      rows.toDF("ts", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, stage.resolve(s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")
    val outDir = "target/test-stream/out"
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("w", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType)))
    def runOnce(name: String): Map[String, Long] = {
      val q = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))))
        .parquet(stage.toAbsolutePath.toString)
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w"), col("n"))
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.schema(outSchema).parquet(outDir).collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    }
    writeOne(Seq((ts(10, 5), 1L), (ts(10, 40), 2L)), "f1")
    val out1 = runOnce("graft_late_run1")
    assert(out1.isEmpty, s"nothing should finalize in run 1: $out1")
    writeOne(Seq((ts(1, 0), 3L), (ts(12, 30), 4L)), "f2")
    val out = runOnce("graft_late_run2")
    assert(out.get("2024-03-01 10:00:00.0").contains(2L),
      s"window 10 should finalize with the 2 on-time rows: $out")
    assert(!out.keys.exists(_.contains("01:00")), s"late row leaked: $out")
    assert(!out.keys.exists(_.contains("12:00")), s"open window emitted: $out")
  }

  test("stream-stream interval join matches the batch interval join") {
    val d = TestSpark.sf0001
    Tables.register(spark, d)
    val streamed = graft.streaming.Streams.streamStreamJoin(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = spark.table("events") // view already surfaces ts as timestamp
    val c = e.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val batch = c.join(p,
      expr("c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 30 minutes"))
      .select("c_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("stream-stream join scopes its shuffle override to a child session") {
    val d = TestSpark.sf0001
    val parentBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val df = graft.streaming.Streams.streamStreamJoin(spark, d)
    // isolation is structural: the 8-partition override lives in a child
    // session, so the parent's conf was never mutated — not even mid-run
    assert(df.sparkSession ne spark)
    assert(df.sparkSession.conf.get("spark.sql.shuffle.partitions") == "8")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == parentBefore)
    assert(df.count() > 0)
  }

  test("stream-stream join: watermark evicts join state across batches") {
    def rmr(p: String): Unit = { val f = new java.io.File(p)
      if (f.exists()) { def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm); x.delete() }; rm(f) } }
    rmr("target/test-ssjoin")
    val stage = Files.createDirectories(Paths.get("target/test-ssjoin/src"))
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")
    def writeOne(rows: Seq[(java.sql.Timestamp, Long, String, Long)],
                 name: String): Unit = {
      val tmp = s"target/test-ssjoin/tmp_$name"
      rows.toDF("ts", "user_id", "event_type", "event_id")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, stage.resolve(s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Thread.sleep(5) // distinct mtimes => deterministic batch order
    }
    // three well-separated hours: by the last batch the watermark has
    // passed hour 10, so its join state must be gone
    writeOne(Seq((ts(10, 0), 1L, "click", 1L), (ts(10, 10), 1L, "purchase", 2L)), "f1")
    writeOne(Seq((ts(20, 0), 1L, "click", 3L), (ts(20, 5), 1L, "purchase", 4L)), "f2")
    writeOne(Seq((ts(23, 0), 1L, "click", 5L), (ts(23, 10), 1L, "purchase", 6L)), "f3")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType)))
    def src() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // one file per micro-batch
      .parquet(stage.toAbsolutePath.toString)
    val clicks = src().where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts")).withWatermark("c_ts", "1 hour")
    val purchases = src().where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts")).withWatermark("p_ts", "1 hour")
    val q = clicks.join(purchases,
      expr("c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 30 minutes"))
      .select("c_id", "p_id")
      .writeStream.format("memory").queryName("graft_ssjoin_state")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // all three pairs joined...
    assert(spark.table("graft_ssjoin_state").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L), (3L, 4L), (5L, 6L)))
    // ...and the final state held fewer rows than were ingested: the
    // watermark evicted the old hours from the symmetric-hash-join state
    val sops = q.recentProgress.flatMap(_.stateOperators)
    assert(sops.exists(_.operatorName.toLowerCase.contains("join")), "no join state op")
    val finalTotal = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).get.stateOperators.map(_.numRowsTotal).sum
    assert(finalTotal < 6, s"join state never evicted: finalTotal=$finalTotal")
  }

  test("left-outer stream-stream join null-extends expired unmatched rows") {
    def rmr(p: String): Unit = { val f = new java.io.File(p)
      if (f.exists()) { def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm); x.delete() }; rm(f) } }
    rmr("target/test-ssloj")
    val stage = Files.createDirectories(Paths.get("target/test-ssloj/src"))
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")
    def writeOne(rows: Seq[(java.sql.Timestamp, Long, String, Long)],
                 name: String): Unit = {
      val tmp = s"target/test-ssloj/tmp_$name"
      rows.toDF("ts", "user_id", "event_type", "event_id")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, stage.resolve(s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Thread.sleep(5)
    }
    // u1's click never matches; u2/u3 match; u4's click arrives last and
    // is still inside the watermark at end-of-stream
    writeOne(Seq((ts(10, 0), 1L, "click", 1L), (ts(10, 0), 2L, "click", 2L),
      (ts(10, 10), 2L, "purchase", 3L)), "f1")
    writeOne(Seq((ts(20, 0), 3L, "click", 4L), (ts(20, 5), 3L, "purchase", 5L)), "f2")
    writeOne(Seq((ts(23, 0), 4L, "click", 6L)), "f3")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType)))
    def src() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toAbsolutePath.toString)
    val clicks = src().where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts")).withWatermark("c_ts", "1 hour")
    val purchases = src().where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts")).withWatermark("p_ts", "1 hour")
    val q = clicks.join(purchases,
      expr("c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 30 minutes"),
      "left_outer")
      .select(col("c_id"), col("p_id"))
      .writeStream.format("memory").queryName("graft_ssloj")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("graft_ssloj").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // matched pairs emit eagerly; u1's unmatched click emits null-extended
    // once the watermark passes its join window; u4's click stays open
    assert(out == Set((1L, -1L), (2L, 3L), (4L, 5L)), out.toString)
  }

  test("session_window: batch and streaming executions agree") {
    Tables.register(spark, TestSpark.sf0001)
    val batch = spark.table("events")
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").cast("timestamp_ntz").as("s_start"),
        col("session_window.end").cast("timestamp_ntz").as("s_end"),
        col("user_id"), col("n_events"))
      .collect().map(_.toString).sorted
    val streaming = graft.streaming.Streams
      .sessionized(spark, TestSpark.sf0001, "10 minutes")
      .collect().map(_.toString).sorted
    assert(batch.toSeq == streaming.toSeq)
  }

  test("custom-state sessionization matches session_window operator") {
    Tables.register(spark, TestSpark.sf0001)
    val viaState = graft.streaming.Sessionize
      .byGroups(spark.table("events"), 10).toDF()
      .select(col("s_start").cast("timestamp_ntz"),
        col("s_end").cast("timestamp_ntz"),
        col("user_id"), col("n_events"))
      .collect().map(_.toString).sorted
    val viaWindow = graft.streaming.Streams
      .sessionized(spark, TestSpark.sf0001, "10 minutes")
      .collect().map(_.toString).sorted
    assert(viaState.length == viaWindow.length)
    assert(viaState.toSeq == viaWindow.toSeq)
  }

  test("salted join/aggregate match unsalted results") {
    Tables.register(spark, TestSpark.sf0001)
    import graft.operators.Skew
    val orders = spark.table("orders")
    val salted = Skew.saltedCountSum(orders, Seq("o_orderstatus"),
      col("o_totalprice").cast("decimal(18,2)"), 8, Seq(col("o_orderkey")))
      .select(col("o_orderstatus"), col("n"), col("s").cast("double"))
      .collect().map(_.toString).sorted
    val plain = orders.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
      .select(col("o_orderstatus"), col("n"), col("s").cast("double"))
      .collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)

    val customer = spark.table("customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val sj = Skew.saltedJoin(orders.withColumnRenamed("o_custkey", "c_custkey"),
      customer, "c_custkey", 8, Seq(col("o_orderkey")))
    val pj = orders.withColumnRenamed("o_custkey", "c_custkey")
      .join(customer, "c_custkey")
    assert(sj.count() == pj.count())
  }

  test("CDC apply: multi-batch out-of-order delivery never regresses a key") {
    import graft.streaming.Streams
    val dir = new java.io.File("target/test-cdc-src")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(dir)
    dir.mkdirs()
    // three files; the LAST-listed file carries OLDER events for users
    // 1 and 2 — with one file per micro-batch the guarded merge must
    // keep the newer rows already applied
    def write(name: String, rows: Seq[(Long, Long, Long, String, Double)]): Unit = {
      // the file source lists $dir flat — emit one bare parquet FILE
      val tmp = new java.io.File(dir, s"__tmp_$name")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("ts", org.apache.spark.sql.functions
          .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
        .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
        .coalesce(1).write.parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(dir, s"$name.parquet").toPath)
      rm(tmp)
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }
    val us = 1000000L // micros → ns fixture convention is ns
    write("a", Seq((1L, 100L * us * 1000, 1L, "new", 1.0),
      (2L, 100L * us * 1000, 2L, "new", 2.0)))
    write("b", Seq((3L, 500L * us * 1000, 1L, "upd", 10.0),
      (4L, 600L * us * 1000, 2L, "upd", 20.0)))
    write("c", Seq((5L, 200L * us * 1000, 1L, "late", 99.0),
      (6L, 600L * us * 1000, 2L, "tie", 42.0))) // ts tie, higher event_id
    val out = Streams.cdcApplyFrom(spark, dir.getAbsolutePath,
        maxFilesPerTrigger = 1)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2),
        r.getLong(3)))).toMap
    // user 1: the late (ts=200) event must NOT overwrite ts=500
    assert(out(1L) == (("upd", 10.0, 3L)), s"regressed: $out")
    // user 2: equal ts resolves by event_id — 6 beats 4
    assert(out(2L) == (("tie", 42.0, 6L)), s"tie broke wrong: $out")

    // SCALE CONTRACT: a batch touching ONE key rewrites only that key's
    // hash bucket — every other bucket partition keeps its exact files
    // (the O(|touched buckets|), not O(|table|), per-batch cost).
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    def bucketFiles(): Map[String, Set[String]] = {
      val root = new java.io.File(wh, "cdc_users_rt")
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(d => d.getName -> d.listFiles()
          .map(_.getName).filter(_.endsWith(".parquet")).toSet).toMap
    }
    val filesBefore = bucketFiles()
    val u1Bucket = spark.range(1)
      .select(Streams.cdcBucket(org.apache.spark.sql.functions.lit(1L)))
      .head().getInt(0)
    val oneKey = Seq((1L, "newer", 123.0, 900L * us, 7L))
      .toDF("user_id", "last_type", "last_value", "last_ts", "last_event_id")
      .withColumn("last_ts", org.apache.spark.sql.functions
        .timestamp_micros(col("last_ts")))
      .withColumn("bucket", Streams.cdcBucket(col("user_id")))
    graft.operators.Dml.upsert(spark, "cdc_users_rt", oneKey,
      Seq("user_id", "bucket"))
    val filesAfter = bucketFiles()
    for ((b, fs) <- filesBefore if b != s"bucket=$u1Bucket")
      assert(filesAfter(b) == fs, s"untouched $b was rewritten")
    assert(filesAfter(s"bucket=$u1Bucket") != filesBefore(s"bucket=$u1Bucket"))
    assert(spark.table("cdc_users_rt").where("user_id = 1")
      .select("last_value").head().getDouble(0) == 123.0)
  }

  test("PG null ordering shim") {
    import graft.operators.PgSort._
    val df = Seq(Some(2), None, Some(1)).toDF("x")
    val out = df.orderByPg((col("x"), true)).collect()
      .map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    assert(out.toSeq == Seq(1, 2, -1))
  }
}
