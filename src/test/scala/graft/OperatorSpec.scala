package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Unit tests for the pipeline/relational operators on literal frames
  * (pg_regress-style single-purpose fixtures, FIXTURES §B).
  */
class OperatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nearDupPairs finds a planted near-dup and no false positive") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = ((1 to 38).map(i => s"tok$i") ++ Seq("xxx", "yyy")).mkString(" ")
    val far = (100 to 140).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(docs, threshold = 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getDouble(2) > 0.8)
  }

  test("nearDupPairs on sf0.001 documents matches exact all-pairs jaccard") {
    Tables.register(spark, TestSpark.sf0001)
    val docs = spark.table("documents")
    val lsh = Dedup.nearDupPairs(docs, threshold = 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // exact answer via shingle self-join (no LSH) — small data only
    val sh = Dedup.withShingles(docs.select("doc_id", "text"))
      .select(col("doc_id"), col("shingles"))
    val exact = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        (size(array_intersect(col("a.shingles"), col("b.shingles"))).cast("double") /
          size(array_union(col("a.shingles"), col("b.shingles"))).cast("double")).as("j"))
      .where(col("j") >= 0.8)
      .select("a.doc_id", "b.doc_id").as[(Long, Long)].collect().toSet
    assert(lsh == exact, s"LSH=${lsh.size} exact=${exact.size}")
    assert(exact.nonEmpty) // fixture has planted near-dups
  }

  test("simhashPairs: identical docs at distance 0, near docs small distance") {
    val a = (1 to 60).map(i => s"w$i").mkString(" ")
    val b = ((1 to 57).map(i => s"w$i") ++ Seq("q1", "q2", "q3")).mkString(" ")
    val docs = Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)).toSet
    assert(pairs.exists { case (x, y, h) => x == 1L && y == 2L && h == 0L })
  }

  test("winnowing fingerprints find the planted near-dup pair") {
    Tables.register(spark, TestSpark.sf0001)
    val docs = spark.table("documents")
    val winnowed = Dedup.winnowPairs(docs, minShared = 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val exact = Dedup.nearDupPairs(docs, threshold = 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // every verified near-dup (jaccard>=0.8) must share many fingerprints
    assert(exact.nonEmpty && (exact -- winnowed).isEmpty,
      s"missed: ${exact -- winnowed}")
  }

  test("exact + fingerprint dedup") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "c b a a"), (4L, "d e f"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactGroups(docs).where(col("n_copies") > 1).collect()
    assert(groups.length == 1 && groups.head.getLong(2) == 1L)
    // fingerprint identifies 1,2,3 as same token set
    val fp = Dedup.withFingerprint(docs).select("doc_id", "fingerprint")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L) == fp(3L) && fp(1L) != fp(4L))
  }

  test("LSH KNN recall vs brute force on sf0.001 embeddings") {
    Tables.register(spark, TestSpark.sf0001)
    val emb = spark.table("embeddings")
    val q = emb.where(col("vec_id") < 20)
    val brute = Knn.bruteForceTopK(emb, q, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Knn.lshTopK(emb, q, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    // 8 planes + hamming-1 probes over 500 random vectors: recall is
    // deterministic given seed 42; pin a generous floor.
    assert(recall > 0.25, s"recall=$recall")
    assert(lsh.size <= 20 * 5)
  }

  test("PQ KNN recall vs brute force on sf0.001 embeddings") {
    Tables.register(spark, TestSpark.sf0001)
    val emb = spark.table("embeddings")
    val q = emb.where(col("vec_id") < 20)
    val brute = Knn.bruteForceTopK(emb, q, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Knn.pqTopK(emb, q, 5, codes = 32, trainIters = 3, refine = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & pq).size.toDouble / brute.size
    // 8 subspaces x 32 codes + 8x ADC-refine over 500 RANDOM vectors
    // (the worst case for quantization — real embeddings cluster);
    // seeded deterministic — pin a generous floor
    info(s"pq recall=$recall")
    assert(recall > 0.4, s"recall=$recall")
    assert(pq.size == 20 * 5) // PQ scores every vector: always a full top-k
  }

  test("IVFADC KNN: recall vs brute force and flat PQ; probed-cell scan is sublinear") {
    Tables.register(spark, TestSpark.sf0001)
    val emb = spark.table("embeddings")
    val q = emb.where(col("vec_id") < 20)
    val brute = Knn.bruteForceTopK(emb, q, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfadc = Knn.ivfadcTopK(emb, q, 5, nCentroids = 16, nProbe = 6,
      codes = 32, trainIters = 2, refine = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivfadc).size.toDouble / brute.size
    val pq = Knn.pqTopK(emb, q, 5, codes = 32, trainIters = 3, refine = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pqRecall = (brute & pq).size.toDouble / brute.size
    info(s"ivfadc recall=$recall (flat-pq recall=$pqRecall)")
    // residual coding + exact refine: at least the flat-PQ quality floor
    // (deterministic seeding makes both recalls reproducible: 0.84 vs 0.76)
    assert(recall > 0.4, s"recall=$recall")
    assert(recall >= pqRecall - 1e-9,
      s"ivfadc recall $recall below flat-pq $pqRecall")
    // scanned fraction: Σ_q Σ_{probed cells} |cell| / (|Q|·N) must be the
    // sublinear nProbe/nCentroids trade, not a full scan in disguise
    val unit = emb.withColumn("__nrm", Knn.norm2(col("embedding")))
      .withColumn("__unit", transform(col("embedding"),
        x => (x.cast("double") / col("__nrm")).cast("float")))
    val (cids, cents) = Knn.kmeansCentroids(unit, 16, 2, "vec_id", "__unit", 64)
    val cidsL = typedLit(cids.toSeq)
    val centsL = typedLit(cents.map(_.toSeq).toSeq)
    val cellSizes = unit
      .withColumn("cid", call_function("best_centroid", col("__unit"), cidsL, centsL))
      .groupBy("cid").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probeLists = unit.where(col("vec_id") < 20)
      .select(call_function("top_centroids", col("__unit"), lit(6), cidsL, centsL).as("p"))
      .collect().map(_.getSeq[Long](0))
    val scanned = probeLists.map(_.map(cellSizes.getOrElse(_, 0L)).sum).sum.toDouble
    val frac = scanned / (emb.count().toDouble * probeLists.length)
    info(f"ivfadc scanned fraction=$frac%.3f (6 of 16 cells probed)")
    assert(frac > 0.0 && frac < 0.75, s"scan fraction $frac is not sublinear")
  }

  test("k-means trains on a bounded deterministic sample above the row threshold") {
    Tables.register(spark, TestSpark.sf0001)
    val emb = spark.table("embeddings")
    val total = emb.count()
    assert(total > 64)
    // force the sampling path with a threshold below the corpus size
    val (cids, cents) = Knn.kmeansCentroids(emb, k = 8, iters = 2,
      maxTrainRows = 64)
    assert(cids.length == 8 && cents.forall(_.length == 64))
    assert(cents.forall(_.forall(d => !d.isNaN && !d.isInfinite)))
    // sampled centroids still partition the full corpus into live cells
    val assigned = emb.withColumn("cid",
      call_function("best_centroid", col("embedding"),
        typedLit(cids.toSeq), typedLit(cents.map(_.toSeq).toSeq)))
      .groupBy("cid").count().collect()
    assert(assigned.length > 1, "sampled training collapsed to one cell")
    assert(assigned.map(_.getLong(1)).sum == total)
    // deterministic: the same seed yields the same model
    val (cids2, cents2) = Knn.kmeansCentroids(emb, k = 8, iters = 2,
      maxTrainRows = 64)
    assert(cids.sameElements(cids2))
    assert(cents.zip(cents2).forall { case (a, b) => a.sameElements(b) })
  }

  test("IVFADC persisted index: build + load + probe equals the one-shot path") {
    Tables.register(spark, TestSpark.sf0001)
    val emb = spark.table("embeddings")
    val q = emb.where(col("vec_id") < 20)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfadc_spec").toString
    try {
      val built = Knn.buildIvfadcIndex(emb, path, nCentroids = 16,
        codes = 32, trainIters = 2)
      // the inverted file is partitioned by cell on disk
      val cellDirs = new java.io.File(path + "/inverted").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cid="))
      assert(cellDirs.length > 1, "inverted file not partitioned by cid")
      // reload from disk — the model roundtrips through the codebooks
      val loaded = Knn.loadIvfadcIndex(spark, path)
      assert(loaded.model.cids.toSeq == built.model.cids.toSeq)
      assert(loaded.model.m == built.model.m &&
        loaded.model.codes == built.model.codes &&
        loaded.model.dim == built.model.dim)
      assert(loaded.model.cents.map(_.toSeq).toSeq ==
        built.model.cents.map(_.toSeq).toSeq)
      assert(loaded.model.books.map(b => (b._1.toSeq, b._2.map(_.toSeq).toSeq)).toSeq ==
        built.model.books.map(b => (b._1.toSeq, b._2.map(_.toSeq).toSeq)).toSeq)
      // probing the persisted index = the one-shot in-memory pipeline
      // (training is deterministic), so recall is unchanged by the split
      val probed = Knn.probeIvfadc(loaded, emb, q, 5, nProbe = 6, refine = 8)
        .select("query_id", "neighbor_id", "cos_sim")
        .as[(Long, Long, Double)].collect().toSet
      val oneShot = Knn.ivfadcTopK(emb, q, 5, nCentroids = 16, nProbe = 6,
        codes = 32, trainIters = 2, refine = 8)
        .select("query_id", "neighbor_id", "cos_sim")
        .as[(Long, Long, Double)].collect().toSet
      assert(probed == oneShot,
        s"persisted-index probe diverged: ${(probed diff oneShot).take(3)} vs ${(oneShot diff probed).take(3)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("embedding-cosine near-dup: all reported pairs verified, subset of exact") {
    Tables.register(spark, TestSpark.sf0001)
    val emb = spark.table("embeddings")
    val lshPairs = Dedup.embedNearDupPairs(emb, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(lshPairs.forall(_._3 >= 0.4))
    // exact answer via broadcast pair scan (test-scale only)
    val exact = Knn.bruteForceTopK(emb, emb, k = 500)
      .where(col("cos_sim") >= 0.4 && col("query_id") < col("neighbor_id"))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = lshPairs.map(p => (p._1, p._2)).toSet
    assert((got -- exact).isEmpty, s"false positives: ${got -- exact}")
    assert(exact.isEmpty || got.nonEmpty) // some recall when pairs exist
  }

  test("IVF KNN recall vs brute force on sf0.001 embeddings") {
    Tables.register(spark, TestSpark.sf0001)
    val emb = spark.table("embeddings")
    val q = emb.where(col("vec_id") < 20)
    val brute = Knn.bruteForceTopK(emb, q, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Knn.ivfTopK(emb, q, 5, nCentroids = 16, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.25, s"recall=$recall")
    // spherical k-means training must move the centroids off the seeds
    // and keep recall at least as healthy
    val (cids0, seeds) = Knn.kmeansCentroids(emb, 16, iters = 0)
    val (cids2, trained) = Knn.kmeansCentroids(emb, 16, iters = 2)
    assert(cids0.sameElements(cids2))
    assert(!seeds.zip(trained).forall { case (a, b) => a.sameElements(b) })
    val ivfT = Knn.ivfTopK(emb, q, 5, nCentroids = 16, nProbe = 4, trainIters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recallT = (brute & ivfT).size.toDouble / brute.size
    assert(recallT > 0.25, s"trained recall=$recallT (untrained $recall)")
  }

  test("connected components: chain, clique, singleton") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val cc = Dedup.connectedComponents(pairs, verts)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("entry smoke: flagship query answers on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("recursive fixpoint: linear chain depth and cyclic termination") {
    val edges = Seq((1, 2), (2, 3), (3, 4)).toDF("parent", "child")
    val seed = Seq((1, 0)).toDF("id", "depth")
    val out = RecursiveCte.fixpoint(seed, f =>
      edges.join(f, col("parent") === col("id"))
        .select(col("child").as("id"), (col("depth") + 1).as("depth")))
      .as[(Int, Int)].collect().toSet
    assert(out == Set((1, 0), (2, 1), (3, 2), (4, 3)))
    // cycle: 1->2->1 must terminate under distinct semantics
    val cyc = Seq((1, 2), (2, 1)).toDF("parent", "child")
    val out2 = RecursiveCte.fixpointDistinct(Seq(Tuple1(1)).toDF("id"), f =>
      cyc.join(f, col("parent") === col("id")).select(col("child").as("id")))
      .as[Int].collect().toSet
    assert(out2 == Set(1, 2))
  }

  test("SREH: within limit keeps good rows, over limit throws") {
    val dir = new java.io.File("target/test-sreh"); dir.mkdirs()
    val f = new java.io.File(dir, "in.csv")
    val rows = (1 to 20).map(i =>
      if (i % 5 == 0) s"$i,broken" else s"$i,n$i,${i * 2.0}")
    java.nio.file.Files.write(f.toPath, rows.mkString("\n").getBytes)
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType), StructField("v", DoubleType)))
    val res = Sreh.readCsv(spark, f.getAbsolutePath, schema, rejectLimit = 10)
    assert(res.rejected == 4)
    assert(res.good.count() == 16)
    val e = intercept[Sreh.RejectLimitExceeded] {
      Sreh.readCsv(spark, f.getAbsolutePath, schema, rejectLimit = 3)
    }
    assert(e.rejected == 4 && e.limit == 3)
  }

  test("SREH percent form: reject limit as a fraction of input rows") {
    val dir = new java.io.File("target/test-sreh-pct"); dir.mkdirs()
    val f = new java.io.File(dir, "in.csv")
    val rows = (1 to 20).map(i =>
      if (i % 5 == 0) s"$i,broken" else s"$i,n$i,${i * 2.0}")
    java.nio.file.Files.write(f.toPath, rows.mkString("\n").getBytes)
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType), StructField("v", DoubleType)))
    // 4/20 = 20% rejects: a 25% limit tolerates it, a 10% limit fails
    assert(Sreh.readCsvPercent(spark, f.getAbsolutePath, schema, pct = 25)
      .good.count() == 16)
    val e = intercept[Sreh.RejectLimitExceeded] {
      Sreh.readCsvPercent(spark, f.getAbsolutePath, schema, pct = 10)
    }
    assert(e.rejected == 4)
  }

  test("SREH badRecordsPath variant spools rejects as an error table") {
    val dir = new java.io.File("target/test-sreh-log"); dir.mkdirs()
    val f = new java.io.File(dir, "in.csv")
    val rows = (1 to 20).map(i =>
      if (i % 5 == 0) s"$i,broken" else s"$i,n$i,${i * 2.0}")
    java.nio.file.Files.write(f.toPath, rows.mkString("\n").getBytes)
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType), StructField("v", DoubleType)))
    val bad = s"target/test-sreh-log/bad_${System.nanoTime()}"
    val res = Sreh.readCsvLogged(spark, f.getAbsolutePath, schema, 10, bad)
    assert(res.rejected == 4)
    assert(res.good.count() == 16)
    assert(res.errorLog.columns.contains("record"))
  }

  test("execute: source runs the command per segment, streams stdout, SREH applies") {
    import graft.sources.ExecSource
    // each segment emits its id 3 times — one process per partition
    val raw = ExecSource.lines(spark,
      "for x in 1 2 3; do echo \"seg-$GRAFT_SEGMENT_ID-$x\"; done", 4)
    assert(raw.rdd.getNumPartitions == 4)
    val got = raw.collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == (for (s <- 0 until 4; x <- 1 to 3)
      yield (s, s"seg-$s-$x")).toSet)
    // column pruning reaches the reader (only `line` requested)
    assert(raw.select("line").count() == 12)
    // CSV parse with reject limit: segment 0 emits one malformed line
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("tag", StringType)))
    val res = ExecSource.readCsv(spark,
      "if [ $GRAFT_SEGMENT_ID -eq 0 ]; then echo oops; fi; " +
        "echo \"$GRAFT_SEGMENT_ID|t\"", schema, partitions = 3, rejectLimit = 2)
    assert(res.rejected == 1)
    assert(res.good.count() == 3)
    assert(res.errorLog.head().getString(0) == "oops")
    intercept[graft.operators.Sreh.RejectLimitExceeded] {
      ExecSource.readCsv(spark, "echo nope", schema,
        partitions = 2, rejectLimit = 1)
    }
    // a failing command fails the read, never returns partial silence
    val e = intercept[Exception] {
      ExecSource.lines(spark, "echo one; exit 3", 1).collect()
    }
    assert(e.getMessage.contains("exited 3") ||
      Option(e.getCause).exists(_.getMessage.contains("exited 3")))
  }

  test("deterministicSplit: stable, partition-invariant, near target fractions") {
    val docs = spark.range(4000).selectExpr("id AS doc_id")
    val a = TextAnalysis.deterministicSplit(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // re-partitioning must not move a single document between splits
    val b = TextAnalysis.deterministicSplit(docs.repartition(13), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 4000.0).toMap
    assert(math.abs(frac("train") - 0.9) < 0.02, frac)
    assert(math.abs(frac("val") - 0.05) < 0.015, frac)
    assert(math.abs(frac("test") - 0.05) < 0.015, frac)
  }

  test("domainBlocklistFilter: parent-domain blocking on label boundaries") {
    val docs = Seq(
      (1L, "https://ads.tracker.com/x"),    // subdomain of blocked parent
      (2L, "https://www.tracker.com/y"),    // www-stripped exact match
      (3L, "https://tracker.company.org/z"),// same label, different domain
      (4L, "https://safe.net/a"),
      (5L, "https://nottracker.com/b"))     // substring but NOT a suffix label
      .toDF("doc_id", "url")
    val bl = Seq("tracker.com").toDF("domain")
    val kept = TextAnalysis.domainBlocklistFilter(docs, "url", bl)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L, 5L))
  }

  test("deterministicShuffle: reproducible permutation, balanced, seed-sensitive") {
    import org.apache.spark.sql.functions.spark_partition_id
    val docs = spark.range(4000).selectExpr("id AS doc_id")
    def run(seed: Long) = TextAnalysis
      .deterministicShuffle(docs, seed = seed, numPartitions = 8)
    // lossless permutation: every id exactly once
    val ids = run(1L).select("doc_id").collect().map(_.getLong(0))
    assert(ids.length == 4000 && ids.toSet == (0L until 4000L).toSet)
    // reproducible: identical partition assignment AND in-partition
    // order across runs and input partitionings
    def image(df: org.apache.spark.sql.DataFrame): Seq[(Int, Seq[Long])] =
      df.select(spark_partition_id().as("p"), $"doc_id")
        .collect().map(r => r.getInt(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toSeq.sortBy(_._1)
    val i1 = image(run(1L))
    val i2 = image(TextAnalysis.deterministicShuffle(
      docs.repartition(17), seed = 1L, numPartitions = 8))
    assert(i1 == i2)
    // a different seed is a genuinely different permutation
    val order1 = run(1L).select("doc_id").collect().map(_.getLong(0)).toSeq
    val order2 = run(2L).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(order1 != order2)
    assert(order1 != (0L until 4000L).toSeq) // actually shuffled
    // hash-bucketing balances: no partition more than 2x the mean
    val sizes = i1.map(_._2.size)
    assert(sizes.size == 8 && sizes.max <= 2 * 4000 / 8, sizes)
  }

  test("contextPack: chunks account for every token, straddles span correctly") {
    val docs = Seq(
      (0L, Seq.fill(300)("w").mkString(" ")),  // 300 tokens
      (32L, Seq.fill(300)("w").mkString(" ")), // same shard, cum 600
      (64L, ""),                               // empty doc, cum stays 600
      (96L, Seq.fill(100)("w").mkString(" ")), // cum 700
      (1L, Seq.fill(10)("w").mkString(" ")))   // different shard
      .toDF("doc_id", "text")
    val got = TextAnalysis.contextPack(docs, capacity = 512)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) == ((0, 300L, 0L, 0L)))   // fits chunk 0
    assert(got(32L) == ((0, 300L, 0L, 1L)))  // straddles 0->1 at 512
    assert(got(64L) == ((0, 0L, 1L, 1L)))    // empty: degenerate span
    assert(got(96L) == ((0, 100L, 1L, 1L)))  // fits chunk 1 (600..700)
    assert(got(1L) == ((1, 10L, 0L, 0L)))    // shard-local numbering
  }

  test("weightedSample: kept set grows monotonically with the weight") {
    val docs = spark.range(2000).selectExpr("id AS doc_id",
      "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'fr' END AS lang")
    def kept(wEn: Double) = TextAnalysis.weightedSample(
      docs, "lang", Map("en" -> wEn, "fr" -> 0.3))
      .collect().map(_.getLong(0)).toSet
    val low = kept(0.2)
    val high = kept(0.6)
    assert(low.subsetOf(high), "upweighting must never drop a kept row")
    assert(low.size < high.size)
    // unknown groups default to weight 0 (dropped)
    val none = TextAnalysis.weightedSample(
      docs, "lang", Map("zz" -> 1.0)).count()
    assert(none == 0)
  }

  test("contaminationPairs: planted 13-gram overlap found, clean doc not") {
    val words = (1 to 40).map(i => s"tok$i")
    val benchText = words.mkString(" ")
    val contaminated = ("x y z " + words.take(15).mkString(" ") + " q r").trim
    val clean = (100 to 140).map(i => s"other$i").mkString(" ")
    val train = Seq((1L, contaminated), (2L, clean)).toDF("doc_id", "text")
    val bench = Seq((10L, benchText)).toDF("doc_id", "text")
    val pairs = TextAnalysis.contaminationPairs(train, bench)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 10L))) // 15 shared tokens ⊃ a 13-gram
    // a 12-token overlap is below the n=13 bar
    val short = Seq((3L, words.take(12).mkString(" ") + " unrelated tail " +
      (200 to 230).map(i => s"p$i").mkString(" "))).toDF("doc_id", "text")
    assert(TextAnalysis.contaminationPairs(short, bench).count() == 0)
  }

  test("piiScrub replaces emails, IPs and phones; plain text untouched") {
    val r = Seq(
      "mail a.user+tag@sub.example.org now",
      "host 192.168.0.1 and 8.8.8.8",
      "call +1-555-0100-22 today",
      "version 1.2 costs 3.4.5 none@",
      "plain words only").toDF("t")
      .select(TextAnalysis.piiScrub($"t").as("s")).collect().map(_.getString(0))
    assert(r(0) == "mail <EMAIL> now")
    assert(r(1) == "host <IP> and <IP>")
    assert(r(2) == "call <PHONE> today")
    assert(r(3) == "version 1.2 costs 3.4.5 none@") // not PII-shaped
    assert(r(4) == "plain words only")
  }

  test("web source: per-segment HTTP slices, round-robin URLs, SREH applies") {
    import graft.sources.{FileDistServer, WebSource}
    val dir = new java.io.File("target/test-webdist")
    dir.mkdirs()
    val f = new java.io.File(dir, "data.txt")
    val w = new java.io.PrintWriter(f, "UTF-8")
    try (0 until 20).foreach(i => w.println(s"$i|t${i % 3}"))
    finally w.close()
    FileDistServer.withServer(dir.getAbsolutePath) { srv =>
      // a protocol-aware server hands each of 4 segments a disjoint
      // round-robin slice; the union is exactly the file
      val raw = WebSource.lines(spark, Seq(srv.url("data.txt")), 4)
      assert(raw.rdd.getNumPartitions == 4)
      val got = raw.collect().map(r => (r.getInt(0), r.getString(1)))
      assert(got.length == 20)
      got.foreach { case (seg, line) =>
        assert(line.takeWhile(_ != '|').toInt % 4 == seg) }
      assert(got.map(_._2).toSet ==
        (0 until 20).map(i => s"$i|t${i % 3}").toSet)
      // column pruning reaches the reader
      assert(raw.select("line").count() == 20)
      // multiple LOCATION urls round-robin across segments
      val two = WebSource.lines(spark,
        Seq(srv.url("data.txt"), srv.url("data.txt")), 2).collect()
      assert(two.map(r => r.getString(1)).toSet ==
        (0 until 20).map(i => s"$i|t${i % 3}").toSet)
      // SREH: malformed lines spool to the error log under the limit
      val fb = new java.io.File(dir, "bad.txt")
      val wb = new java.io.PrintWriter(fb, "UTF-8")
      try {
        wb.println("1|a"); wb.println("oops"); wb.println("2|b")
      } finally wb.close()
      val schema = StructType(Seq(StructField("k", LongType),
        StructField("tag", StringType)))
      val res = WebSource.readCsv(spark, Seq(srv.url("bad.txt")), schema,
        partitions = 1, rejectLimit = 2)
      assert(res.rejected == 1)
      assert(res.good.count() == 2)
      assert(res.errorLog.head().getString(0) == "oops")
      intercept[graft.operators.Sreh.RejectLimitExceeded] {
        WebSource.readCsv(spark, Seq(srv.url("bad.txt")), schema,
          partitions = 1, rejectLimit = 0)
      }
      // a 404 fails the read, never returns empty silence
      val e = intercept[Exception] {
        WebSource.lines(spark, Seq(srv.url("missing.txt")), 1).collect()
      }
      assert(e.getMessage.contains("HTTP 404") ||
        Option(e.getCause).exists(_.getMessage.contains("HTTP 404")))
      // writable side: concurrent partition POSTs land lossless
      import graft.sources.WebSink
      val up = new java.io.File(dir, "up.txt")
      if (up.exists()) up.delete()
      WebSink.writeCsv(
        spark.range(100).selectExpr("id", "concat('v', id % 3) AS tag")
          .repartition(4),
        srv.url("up.txt"))
      val back = scala.io.Source.fromFile(up, "UTF-8").getLines().toSeq
      assert(back.length == 100)
      assert(back.toSet ==
        (0 until 100).map(i => s"$i|v${i % 3}").toSet)
    }
  }

  test("multimodal: real codec decode round-trips exact pixel/sample sums") {
    val docs = Seq(0L, 1L, 2L, 3L, 17L, 42L, 103L).toDF("doc_id")
    val blobs = Multimodal.synthesizeMedia(docs)
    val feats = Multimodal.decodeMedia(blobs, batchSize = 2).collect()
      .map(f => f.id -> f).toMap
    for (id <- Seq(0L, 1L, 2L, 17L, 42L)) { // png, bmp, gif, bmp, gif
      val (w, h, r, g, b) = Multimodal.imageParams(id)
      val f = feats(id)
      assert(f.width == w && f.height == h && f.channels == 3, f)
      assert(f.sum_r == r.toLong * (w * h - 1) + 255, f)
      assert(f.sum_g == g.toLong * (w * h - 1) + 255, f)
      assert(f.sum_b == b.toLong * (w * h - 1) + 255, f)
    }
    for (id <- Seq(3L, 103L)) { // wav: exact PCM sample sum
      val n = Multimodal.wavParams(id)
      val f = feats(id)
      assert(f.width == n && f.height == 1 && f.channels == 1, f)
      assert(f.sum_r == (0 until n).map(i => Multimodal.wavSample(id, i).toLong).sum, f)
    }
    // repartitioning must not change results (batch boundaries move)
    val feats4 = Multimodal.decodeMedia(blobs.repartition(4), batchSize = 1)
      .collect().map(f => f.id -> f.sum_r).toMap
    assert(feats4 == feats.map { case (k, v) => k -> v.sum_r })
  }

  test("multimodal: video frame sampling decodes only the sampled frames") {
    val docs = Seq(5L, 23L, 40L).toDF("doc_id")
    val blobs = Multimodal.synthesizeVideo(docs)
    val feats = Multimodal.sampleVideoFrames(blobs, stride = 3).collect()
    for (f <- feats) {
      val (_, w, h) = Multimodal.videoParams(f.id)
      val (r, g, b) = Multimodal.videoFrameColor(f.id, f.frame_idx)
      assert(f.frame_idx % 3 == 0)
      assert(f.width == w && f.height == h)
      assert(f.sum_r == r.toLong * w * h && f.sum_g == g.toLong * w * h &&
        f.sum_b == b.toLong * w * h, f)
    }
    val (n5, _, _) = Multimodal.videoParams(5L)
    assert(feats.count(_.id == 5L) == (n5 + 2) / 3)
    // skipped-by-length means skipped-by-decode: corrupt frame 1's
    // bytes (not its length prefix) — stride 3 never touches it,
    // stride 1 must fail on it
    val corrupted = blobs.collect().map { bl =>
      val p = bl.payload.clone()
      val len0 = java.nio.ByteBuffer.wrap(p).getInt(8)
      val f1body = 8 + 4 + len0 + 4 // frame 1's first payload byte
      java.util.Arrays.fill(p, f1body, f1body + 8, 0.toByte)
      Multimodal.Blob(bl.id, p, bl.format)
    }.toSeq.toDS()
    assert(Multimodal.sampleVideoFrames(corrupted, stride = 3)
      .count() == feats.length)
    intercept[Exception] {
      Multimodal.sampleVideoFrames(corrupted, stride = 1).collect()
    }
  }

  test("multimodal: RIFF walk honors the odd-chunk pad byte") {
    // WAV with an odd-length LIST chunk before fmt/data: RIFF mandates
    // a pad byte after odd chunks, so a walk without it misreads every
    // following chunk tag
    val samples = Array[Short](100, -200, 300, -400, 500)
    val buf = java.nio.ByteBuffer.allocate(200)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(0); buf.put("WAVE".getBytes)
    buf.put("LIST".getBytes); buf.putInt(3)
    buf.put("abc".getBytes); buf.put(0.toByte) // odd len -> pad byte
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1); buf.putShort(1); buf.putInt(8000); buf.putInt(16000)
    buf.putShort(2); buf.putShort(16)
    buf.put("data".getBytes); buf.putInt(samples.length * 2)
    samples.foreach(buf.putShort)
    val payload = java.util.Arrays.copyOf(buf.array(), buf.position())
    val f = Multimodal.decodeMedia(
      Seq(Multimodal.Blob(7L, payload, "wav")).toDS()).collect().head
    assert(f.width == samples.length && f.channels == 1)
    assert(f.sum_r == samples.map(_.toLong).sum)
    val wins = Multimodal.audioWindows(
      Seq(Multimodal.Blob(7L, payload, "wav")).toDS(), windowSamples = 2)
      .collect().sortBy(_.win)
    assert(wins.length == 3)
    assert(wins.map(_.n).toSeq == Seq(2, 2, 1))
    assert(wins.map(_.sum_sq).sum == samples.map(s => s.toLong * s).sum)
  }

  test("multimodal: JPEG decodes through the real codec (lossy tolerance)") {
    val (w, h, r, g, b) = (40, 24, 120, 80, 200)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (r << 16) | (g << 8) | b)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    val feats = Multimodal.decodeMedia(
      Seq(Multimodal.Blob(1L, out.toByteArray, "jpg")).toDS()).collect()
    val f = feats.head
    assert(f.width == w && f.height == h && f.n_px == w * h)
    // JPEG is lossy: per-channel means land within a few codes of the fill
    assert(math.abs(f.sum_r.toDouble / f.n_px - r) <= 3, f)
    assert(math.abs(f.sum_g.toDouble / f.n_px - g) <= 3, f)
    assert(math.abs(f.sum_b.toDouble / f.n_px - b) <= 3, f)
  }

  test("multimodal: frame sampling slices payloads without a UDF") {
    val docs = Seq(3L, 103L).toDF("doc_id") // wav payloads: known byte length
    val blobs = Multimodal.synthesizeMedia(docs)
    val frames = Multimodal.sampleFrames(blobs.toDF()).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("n_frames")).toMap
    for (id <- Seq(3L, 103L)) {
      val payloadLen = 44 + 2 * Multimodal.wavParams(id)
      assert(frames(id) == math.max(payloadLen / 64 - 1, 0) + 1)
    }
  }

  test("image/audio header parsers: PNG, JPEG, BMP, GIF, WAV") {
    import Multimodal.{Headers, parseHeader}
    assert(parseHeader(Headers.png(640, 480, Array[Byte]())) == Some((640, 480, 3)))
    assert(parseHeader(Headers.jpeg(1920, 1080, "x".getBytes)) == Some((1920, 1080, 3)))
    assert(parseHeader(Headers.wav(2, 44100, new Array[Byte](8))) == Some((44100, 0, 2)))
    // hand-built BMP (BITMAPINFOHEADER) and GIF89a headers
    val bmp = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
    bmp.putInt(40).putInt(800).putInt(600).putShort(1).putShort(24)
    assert(parseHeader(bmp.array()) == Some((800, 600, 3)))
    val gif = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    gif.put("GIF89a".getBytes).putShort(320.toShort).putShort(200.toShort)
    assert(parseHeader(gif.array()) == Some((320, 200, 3)))
    assert(parseHeader("not an image".getBytes).isEmpty)
  }

  test("EXPLAIN ANALYZE surfaces executed-plan metrics that match reality") {
    import graft.operators.ExplainAnalyze
    Tables.register(spark, TestSpark.sf0001)
    val df = spark.sql(
      """SELECT o_orderstatus, COUNT(*) AS n FROM orders
        |WHERE o_totalprice > 1000 GROUP BY o_orderstatus""".stripMargin)
    val metrics = ExplainAnalyze.run(df)
    assert(metrics.nonEmpty)
    // the scan's numOutputRows must equal what the filter actually kept
    val expected = spark.table("orders").where("o_totalprice > 1000").count()
    val scanRows = metrics.filter(m =>
      m.operator.toLowerCase.contains("scan") && m.metric == "numOutputRows")
      .map(_.value)
    assert(scanRows.exists(_ == expected), s"scan rows $scanRows != $expected")
    // aggregate output = number of groups
    val aggRows = metrics.filter(m =>
      m.operator.contains("HashAggregate") && m.metric == "numOutputRows")
    assert(aggRows.nonEmpty)
    assert(aggRows.map(_.value).min == df.count())
    // the tabular form is queryable
    assert(ExplainAnalyze.runAsDataFrame(df)
      .where("metric = 'numOutputRows'").count() > 0)
    // nanosecond-typed metrics are labeled ns (not silently mis-scaled as
    // ms) and sit in sane bounds: a shuffle-write time for this query is
    // far under 10 minutes of nanoseconds
    val ns = metrics.filter(_.unit == "ns")
    assert(ns.nonEmpty, "expected at least one nsTiming metric (shuffle write)")
    assert(ns.forall(m => m.value >= 0 && m.value < 600L * 1000 * 1000 * 1000),
      s"ns metric out of bounds: $ns")
    assert(metrics.forall(m => m.unit != "ms" || m.value < 600L * 1000),
      "an ms-labeled metric is implausibly large — ns leaking into ms?")
  }

  test("cursors: duplicate DECLARE fails without destroying the open portal") {
    Tables.register(spark, TestSpark.sf0001)
    Cursors.execute(spark,
      "DECLARE cdup CURSOR FOR SELECT n_nationkey FROM nation ORDER BY n_nationkey")
    val first = Cursors.execute(spark, "FETCH 5 FROM cdup").collect()
      .map(_.getAs[Number](0).longValue).toSeq
    assert(first == Seq(0L, 1L, 2L, 3L, 4L))
    intercept[IllegalArgumentException](
      Cursors.execute(spark, "DECLARE cdup CURSOR FOR SELECT 1 AS x"))
    // the original portal survives and resumes exactly where it was
    val next = Cursors.execute(spark, "FETCH 5 FROM cdup").collect()
      .map(_.getAs[Number](0).longValue).toSeq
    assert(next == Seq(5L, 6L, 7L, 8L, 9L))
    Cursors.execute(spark, "CLOSE cdup")
  }

  test("cursors: DECLARE/FETCH n pages the full result in order") {
    import graft.operators.Cursors
    Tables.register(spark, TestSpark.sf0001)
    val full = spark.sql(
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey")
    Cursors.execute(spark,
      "DECLARE c1 CURSOR FOR SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey")
    val chunks = Iterator.continually(
      Cursors.execute(spark, "FETCH 37 FROM c1").collect())
      .takeWhile(_.nonEmpty).toSeq
    // chunked retrieval = the whole result, in cursor order
    assert(chunks.map(_.length).sum == full.count())
    assert(chunks.forall(_.length <= 37))
    assert(chunks.flatten.map(_.getLong(0)).toSeq ==
      full.collect().map(_.getLong(0)).toSeq)
    // exhausted cursor keeps returning empty until closed
    assert(Cursors.execute(spark, "FETCH 5 FROM c1").collect().isEmpty)
    Cursors.execute(spark, "CLOSE c1")
    intercept[IllegalArgumentException](Cursors.fetch(spark, "c1", 1))
    // FETCH ALL drains in one call
    Cursors.execute(spark, "DECLARE c2 CURSOR FOR SELECT n_nationkey FROM nation")
    assert(Cursors.execute(spark, "FETCH ALL FROM c2").count() == 25)
    Cursors.execute(spark, "CLOSE c2")
  }

  test("parameterized SQL: one prepared text, multiple bindings (§3.2)") {
    Tables.register(spark, TestSpark.sf0001)
    val prepared = "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > :minPrice"
    val lo = spark.sql(prepared, Map("minPrice" -> 0)).head().getLong(0)
    val hi = spark.sql(prepared, Map("minPrice" -> 100000)).head().getLong(0)
    assert(lo > hi && hi > 0)
  }

  test("SRF targetlist: LCM cycling vs zip-pad, empty-set behavior") {
    import graft.operators.Srf
    import org.apache.spark.sql.functions.{col, expr}
    val df = Seq(
      (1L, Seq(1, 2, 3), Seq("a", "b")),   // lcm 6, zip 3
      (2L, Seq(1, 2), Seq("a", "b")),      // equal: both 2
      (3L, Seq.empty[Int], Seq("a", "b")), // empty: lcm 0 rows, zip pads
      (4L, Seq.empty[Int], Seq.empty[String])) // all empty: 0 rows both
      .toDF("k", "s1a", "s2a")
    val lcm = Srf.projectSetLcm(df, Seq("x" -> col("s1a"), "y" -> col("s2a")))
      .select("k", "x", "y")
    val byK = lcm.collect().groupBy(_.getLong(0))
    assert(byK(1L).length == 6)
    // cycling: row 4 of k=1 is (1 again, b) — sets restart independently
    assert(byK(1L).map(r => (r.getInt(1), r.getString(2))).toSeq.sorted ==
      Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b")))
    assert(byK(2L).length == 2)
    assert(!byK.contains(3L) && !byK.contains(4L)) // empty set annihilates
    val zip = Srf.projectSetZip(df, Seq("x" -> col("s1a"), "y" -> col("s2a")))
      .select("k", "x", "y")
    val zbyK = zip.collect().groupBy(_.getLong(0))
    assert(zbyK(1L).length == 3)
    assert(zbyK(1L).count(r => r.isNullAt(2)) == 1) // b exhausted at i=3
    assert(zbyK(3L).length == 2 && zbyK(3L).forall(_.isNullAt(1)))
    assert(!zbyK.contains(4L))
  }

  test("bloom anti join: exact result, false positives resolved by verify join") {
    import graft.operators.Dedup
    val big = (1L to 2000L).map(i => (i, s"key_$i")).toDF("id", "k")
    val blocked = (1L to 2000L by 7).map(i => s"key_$i").toDF("bk")
    val got = Dedup.bloomAntiJoin(big, "k", blocked, "bk", expectedItems = 300L)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = (1L to 2000L).filterNot(i => (i - 1) % 7 == 0).toSet
    // EXACT despite the bloom's ~1% false-positive rate — candidates
    // that are not really blocked survive via the verify anti join
    assert(got == want)
    // a deliberately tiny filter (high FP rate) still yields the exact set
    val tiny = Dedup.bloomAntiJoin(big, "k", blocked, "bk", expectedItems = 10L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(tiny == want)
    // the clean branch is a pure scan+filter: no join, no exchange
    import org.apache.spark.sql.functions.{call_function, lit, xxhash64}
    val bytes = blocked.agg(call_function("bloom_filter_agg",
        xxhash64($"bk"), lit(300L), lit(3000L)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val probePlan = big.where(
      !call_function("might_contain", lit(bytes), xxhash64($"k")))
    assert(!probePlan.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(probePlan.count() < 2000) // the filter really prunes
  }

  test("skew report: a hot key shows a higher coefficient than a uniform one") {
    import graft.operators.Distribution
    val uniform = (1L to 6400L).map(i => (i, i % 7)).toDF("k", "hot")
    val skewed = uniform.withColumn("hot",
      when($"k" % 10 === 0, $"hot").otherwise(lit(0L)))
    def coeff(df: org.apache.spark.sql.DataFrame, key: String): Double =
      Distribution.skewReport(df, 32, key).head().getDouble(0)
    assert(coeff(uniform, "k") < 20.0, "uniform key should be near-flat")
    assert(coeff(skewed, "hot") > coeff(uniform, "k") * 5,
      "hot key must dominate the coefficient")
  }

  test("trigram perplexity separates reference-like text from noise") {
    import graft.operators.TextAnalysis
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val en = docs.where($"lang" === "en")
    val model = TextAnalysis.charLmTrain(en)
    // English-vs-noise margin on held-out style strings
    val probe = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "zqxj wvkp qzzt xjvw kpqz ztxj vwkp qzzt")).toDF("doc_id", "text")
    val scores = TextAnalysis.withPerplexity(probe, model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) < scores(2L),
      s"noise must score higher perplexity: $scores")
    // corpus-level: the training language scores lower than others
    val byLang = TextAnalysis.withPerplexity(docs, model)
      .groupBy("lang").agg(avg($"perplexity").as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byLang("en") < byLang("zh") && byLang("en") < byLang("de"),
      s"en must look most reference-like: $byLang")
    // deterministic model: same counts both times
    assert(TextAnalysis.charLmTrain(en)._1 == model._1)
  }

  test("BPE training matches the published example; encode is exact") {
    import graft.operators.TextAnalysis
    // the worked example corpus from the subword-NMT paper: the first
    // merges must be (e,s), (es,t), (est,</w>), then (l,o) by the
    // deterministic (count desc, pair asc) tie-break
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, corpus)).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, numMerges = 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")))
    // greedy encode applies merges by rank; unseen words still tokenize
    val ranks = merges.zipWithIndex.toMap
    assert(TextAnalysis.bpeEncodeWord("lowest", ranks).toSeq ==
      Seq("lo", "w", "est</w>"))
    assert(TextAnalysis.bpeEncodeWord("low", ranks).toSeq ==
      Seq("lo", "w", "</w>"))
    // corpus-level: tokens reconstruct the normalized text exactly
    val toks = TextAnalysis.withBpeTokens(docs, merges).select("bpe_tokens")
      .head().getSeq[String](0)
    assert(toks.mkString("").replace("</w>", " ").trim ==
      corpus.toLowerCase)
    // determinism: retraining yields the identical table
    assert(TextAnalysis.bpeTrain(docs, numMerges = 4) == merges)
    // more merges never increase the token count (compression quality)
    val docs2 = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val m0 = TextAnalysis.withBpeTokens(docs2, Nil)
      .agg(sum(size($"bpe_tokens"))).head().getLong(0)
    val m50 = TextAnalysis.withBpeTokens(docs2,
        TextAnalysis.bpeTrain(docs2, numMerges = 50))
      .agg(sum(size($"bpe_tokens"))).head().getLong(0)
    assert(m50 < m0, s"50 merges should compress: $m50 !< $m0")
  }

  test("segmentDedup removes the planted cross-doc paragraph, keeps order") {
    // newline-delimited mode: the shared license header appears in 2
    // docs and must vanish from both; unique paragraphs survive in order
    val docs = Seq(
      (1L, "COMMON LICENSE HEADER\nalpha beta\ngamma delta"),
      (2L, "intro text\nCOMMON LICENSE HEADER\nepsilon zeta"),
      (3L, "solo document\nonly unique lines here")
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, delimiter = "\n", minDocFreq = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("alpha beta\ngamma delta", 1L))
    assert(out(2L) == ("intro text\nepsilon zeta", 1L))
    assert(out(3L) == ("solo document\nonly unique lines here", 0L))
  }

  test("segmentDedup word-window mode: doc losing every segment goes empty") {
    val docs = Seq(
      (1L, "a b c d e f"),   // segments: "a b c", "d e f"
      (2L, "a b c d e f"),   // exact copy — both docs lose everything
      (3L, "x y z a b")      // "x y z" unique; "a b" (short tail) unique
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, wordsPerSegment = 3, minDocFreq = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("", 2L))
    assert(out(2L) == ("", 2L))
    assert(out(3L) == ("x y z a b", 0L))
  }

  test("semanticDedup links planted duplicate vectors, keeps the min id") {
    val rnd = new scala.util.Random(7)
    def v(): Array[Float] = Array.fill(8)(rnd.nextFloat() - 0.5f)
    val base = v(); val near = base.map(x => x * 1.001f)
    val uniques = (10L to 29L).map(i => (i, v()))
    val vecs = (Seq((1L, base), (2L, base.clone()), (3L, near)) ++ uniques)
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(vecs, threshold = 0.99,
        nClusters = 4, iters = 2, dim = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    // the three planted dups share one component; only vec 1 survives
    assert(out(1L)._1 == 1L && out(1L)._2)
    assert(out(2L) == (1L, false) && out(3L) == (1L, false))
    // every unique vector is its own component and kept
    uniques.foreach { case (i, _) => assert(out(i) == (i, true), s"vec $i") }
  }

  test("semanticDedup sub-buckets a hot cluster: candidates stay far below all-pairs") {
    val rnd = new scala.util.Random(11)
    // 600 diverse vectors all forced into ONE cluster — the degenerate
    // case the cluster-size guard exists for
    val assigned = (1L to 600L)
      .map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f), 0L))
      .toDF("vec_id", "embedding", "cluster")
    val cand = Dedup.semanticCandidates(assigned, maxClusterRows = 50L,
      subTables = 4, idCol = "vec_id", vecCol = "embedding", dim = 16)
    val nCand = cand.count()
    val allPairs = 600L * 599L / 2L
    assert(nCand > 0, "sub-bucketing produced no candidates at all")
    assert(nCand < allPairs / 8,
      s"hot cluster still near-quadratic: $nCand of $allPairs pairs")
    // identical vectors always share every sub-bucket — exact-duplicate
    // recall survives the split
    val base = Array.fill(16)(rnd.nextFloat() - 0.5f)
    val withDup = assigned.unionByName(
      Seq((1001L, base, 0L), (1002L, base.clone(), 0L))
        .toDF("vec_id", "embedding", "cluster"))
    val dupCand = Dedup.semanticCandidates(withDup, maxClusterRows = 50L,
      subTables = 4, idCol = "vec_id", vecCol = "embedding", dim = 16)
      .where("a_id = 1001 AND b_id = 1002")
    assert(dupCand.count() == 1L)
  }

  test("naive Bayes classifier separates planted vocabularies") {
    val train = Seq(
      (1L, "apple banana cherry", "fruit"),
      (2L, "banana apple grape", "fruit"),
      (3L, "car truck engine", "vehicle"),
      (4L, "engine wheel car", "vehicle"),
      (5L, "tiger lion bear", "animal"),
      (6L, "bear wolf tiger", "animal")
    ).toDF("doc_id", "text", "topic")
    val model = TextAnalysis.nbTrain(train, "topic")
    val held = Seq(
      (10L, "grape cherry apple"), (11L, "wheel truck engine"),
      (12L, "wolf lion bear"), (13L, "")
    ).toDF("doc_id", "text")
    val preds = TextAnalysis.withNbPrediction(held, model)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(preds(10L) == "fruit")
    assert(preds(11L) == "vehicle")
    assert(preds(12L) == "animal")
    // empty text falls back to the prior argmax tie-break: label asc
    assert(preds(13L) == "animal")
  }

  test("quality classifier filter: separation, noise robustness, heuristic gate") {
    // DCLM-shape seeds sharing common glue words; only the distinctive
    // vocabulary separates the classes
    val good = Seq(
      "the study of mathematics provides careful rigorous analysis",
      "research in physics explains the structure of careful theory",
      "this essay examines historical evidence with rigorous method")
      .map(Tuple1(_)).toDF("text")
    val bad = Seq(
      "buy cheap pills now click here for free money",
      "winner click this link now for your free prize money",
      "cheap deals buy now limited offer click here")
      .map(Tuple1(_)).toDF("text")
    val docs = Seq(
      (1L, "a careful study of the evidence and rigorous analysis of theory"),
      (2L, "click here to buy cheap pills and win free money now"),
      // noisy: one spammy token amid educational text must stay good
      (3L, "the rigorous analysis of historical evidence examines one cheap method"),
      // short: classifier would vote good, the token floor drops it
      (4L, "rigorous analysis"),
      (5L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityClassifierFilter(docs, good, bad,
      minTokens = 5)
      .select("doc_id", "quality_label", "keep").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(out(1L) == (("good", true)))
    assert(out(2L) == (("bad", false)))
    assert(out(3L) == (("good", true))) // one bad token does not flip it
    assert(out(4L) == (("good", false))) // classifier yes, floor no
    assert(!out(5L)._2)
  }

  test("text quality features handle empty and punct-only text") {
    val docs = Seq((1L, ""), (2L, "..."), (3L, "the cat sat."))
      .toDF("doc_id", "text")
    val out = TextAnalysis.withQuality(docs).select("doc_id", "n_tokens",
      "punct_ratio", "stopword_ratio").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 0)
    assert(out(2L).getDouble(2) == 1.0)
    assert(out(3L).getInt(1) == 3)
  }
}
