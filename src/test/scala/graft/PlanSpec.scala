package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts — the 100 TB design assertions the VERDICT
  * asked for: broadcasts where dims are small, pushdown/pruning at the
  * scan, whole-stage codegen on the spine, TakeOrderedAndProject for
  * top-k. Checked via explain output on the real catalog queries.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // finalize the AQE plan (codegen spans appear post-execution)
    df.queryExecution.executedPlan.toString
  }

  test("q17 star join broadcasts region/nation/supplier (no shuffle of dims)") {
    val p = planOf("q17_join_broadcast_star")
    assert(p.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin in:\n$p")
  }

  test("q01 spine is partial+final hash aggregate with whole-stage codegen") {
    val p = planOf("q01_tpch_q1_agg")
    assert(p.contains("HashAggregate"), p)
    assert("partial_sum|partial_count".r.findFirstIn(p).isDefined
      || p.split("HashAggregate").length > 2, "expected 2-stage agg:\n" + p)
    // codegen'd spans render as "*(n)" in the final AQE plan
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, "no codegen spans:\n" + p)
  }

  test("q02 pushes filters and prunes columns at the parquet scan") {
    val df = SparkEntry.queries("q02_filter_project")(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: ["), scan)
    assert(scan.contains("GreaterThan(l_quantity"), scan)
    // pruned read schema: none of the unused columns
    assert(!scan.contains("l_shipdate"), "column pruning failed:\n" + scan)
  }

  test("q40 top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = planOf("q40_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q19 band join plans as an equi-join, not a nested loop") {
    val p = planOf("q19_band_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "band join fell back to a nested loop:\n" + p)
  }

  test("q88 KNN broadcasts the query side (corpus is never shuffled)") {
    val p = planOf("q88_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q101 IVF assignment is a projection: no BNLJ/cartesian, one window (final rank)") {
    val whole = planOf("q101_knn_ivf")
    // AQE renders the plan twice (Final + Initial) — assert on the final one
    val p = whole.split("== Initial Plan ==")(0)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "IVF assignment fell back to a nested loop:\n" + p)
    // the only Window exec is rankTopK's final per-query rank — assignment
    // adds none ("Window [" excludes WindowGroupLimit/windowspecdefinition)
    assert(p.split("Window \\[").length - 1 <= 1, "unexpected extra Window:\n" + p)
    assert(p.contains("best_centroid"), "assignment kernel missing:\n" + p)
  }

  test("q81 LSH dedup contains only equi-joins (no cartesian/BNLJ)") {
    val p = planOf("q81_neardup_lsh")
    assert(!p.contains("CartesianProduct"), "all-pairs join in dedup plan:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"), "non-equi join in dedup plan:\n" + p)
  }

  test("partitioned write + partition-filter pruning") {
    Tables.register(spark, sf)
    val dir = "target/test-warehouse/orders_by_status"
    spark.table("orders").write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(dir)
    val pruned = spark.read.parquet(dir).where("o_orderstatus = 'F'")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(o_orderstatus"), scan)
    assert(pruned.count() > 0)
  }

  private def dropManaged(names: String*): Unit = names.foreach { n =>
    spark.sql(s"DROP TABLE IF EXISTS $n")
    val loc = new java.io.File(s"target/test-warehouse/$n")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
  }

  test("bucketed tables join without an exchange on the bucket key") {
    Tables.register(spark, sf)
    import graft.operators.Distribution
    dropManaged("orders_b", "customer_b")
    Distribution.createBucketedTable(
      spark.table("orders"), "orders_b", 4, Seq("o_custkey"))
    Distribution.createBucketedTable(
      spark.table("customer"), "customer_b", 4, Seq("c_custkey"))
    val j = spark.sql(
      """SELECT /*+ MERGE(orders_b) */ c_custkey, COUNT(*) AS n
        |FROM orders_b JOIN customer_b ON o_custkey = c_custkey
        |GROUP BY c_custkey""".stripMargin)
    val p = j.queryExecution.executedPlan.toString
    // co-located: no Exchange feeding the join on either side
    val joinIdx = p.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, p)
    assert(!p.substring(joinIdx).contains("Exchange hashpartitioning(o_custkey"),
      "bucketed join still shuffles:\n" + p)
  }

  test("DSv2 sequence source prunes columns into the reader") {
    val df = spark.read.format("graft.sources.SeqSource")
      .option("start", "0").option("end", "100").option("partitions", "3")
      .load().select("id")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BatchScan"), p)
    assert(!p.contains("val#") && !p.contains("tag#"), "pruning failed:\n" + p)
    assert(df.count() == 100)
  }

  test("dynamic partition pruning fires on a partitioned fact join") {
    Tables.register(spark, sf)
    val dir = "target/test-warehouse/lineitem_by_flag"
    spark.table("lineitem").write.mode("overwrite")
      .partitionBy("l_returnflag").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("lineitem_part")
    // dim side filtered to one flag value; the fact scan should prune
    // partitions at runtime via a DPP subquery filter.
    val q = spark.sql(
      """SELECT COUNT(*) AS n FROM lineitem_part f
        |JOIN (SELECT l_returnflag AS flag, COUNT(*) AS c FROM lineitem
        |      WHERE l_linestatus = 'F' GROUP BY l_returnflag HAVING COUNT(*) > 100) d
        |ON f.l_returnflag = d.flag""".stripMargin)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"), "no DPP filter in plan:\n" + p)
    assert(q.head().getLong(0) > 0)
  }

  test("IVFADC probe scans a strict subset of the inverted file's partitions") {
    Tables.register(spark, sf)
    val emb = spark.table("embeddings")
    // 3 queries × nProbe=4 probe ≤ 12 of the 16 cells — a strict subset
    // by construction
    val q = emb.where(org.apache.spark.sql.functions.col("vec_id") < 3)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfadc_plan").toString
    try {
      val idx = graft.operators.Knn.buildIvfadcIndex(emb, path,
        nCentroids = 16, codes = 16, trainIters = 1)
      val totalCells = new java.io.File(path + "/inverted").listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("cid="))
      val probe = graft.operators.Knn.probeIvfadc(idx, emb, q, 5, nProbe = 4)
      val scans = probe.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("inverted")) => s
      }
      assert(scans.nonEmpty, "no file scan over the inverted index found")
      val scan = scans.head
      // the probed-cell set reaches the scan as a PARTITION filter...
      assert(scan.partitionFilters.exists(_.references.exists(_.name == "cid")),
        s"no cid partition filter on the inverted scan: ${scan.partitionFilters}")
      // ...and prunes to a strict subset of the cell directories
      val selected = scan.selectedPartitions.partitionCount
      assert(selected > 0 && selected < totalCells,
        s"probe read $selected of $totalCells cell partitions — not pruned")
      assert(probe.count() > 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("ANALYZE feeds CBO row counts") {
    Tables.register(spark, sf)
    dropManaged("nation_t")
    spark.table("nation").write.mode("overwrite").saveAsTable("nation_t")
    graft.operators.Distribution.analyze(spark, "nation_t", Seq("n_nationkey", "n_regionkey"))
    val stats = spark.sql("DESCRIBE EXTENDED nation_t n_nationkey").collect()
      .map(r => r.getString(0) + "=" + r.getString(1)).mkString(";")
    assert(stats.contains("distinct_count=25"), stats)
  }

  test("AQE splits a skewed join partition at runtime") {
    import org.apache.spark.sql.functions.{col, when}
    // 100k rows of one hot key vs 99 cold keys, joined against a side
    // too big to broadcast under the lowered threshold — the skew-join
    // rule must split the hot partition instead of one task dragging
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val skewed = spark.range(0, 200000)
        .select((when(col("id") % 2 === 0, 0).otherwise(col("id") % 99))
          .as("k"), col("id").as("payload"))
      val other = spark.range(0, 5000).select(
        (col("id") % 100).as("k"), col("id").as("dim"))
      val j = skewed.join(other, "k")
      assert(j.collect().length > 0) // execute THIS plan so AQE finalizes
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), "AQE skew-join did not split:\n" + p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join fans the hot key across (key, salt) reducers") {
    import org.apache.spark.sql.functions.{col, when}
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val large = spark.range(0, 50000).select(
        when(col("id") % 2 === 0, 7L).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
      val dim = spark.range(0, 100)
        .select(col("id").as("k"), col("id").as("attr"))
      val sj = graft.operators.Skew
        .saltedJoin(large, dim, "k", 8, Seq(col("payload")))
      // the shuffle key is (k, __salt): the hot key's rows spread over
      // saltFactor reducers instead of pinning one
      val plan = sj.queryExecution.executedPlan.toString
      assert("hashpartitioning\\([^)]*\\bk#\\d+[^)]*__salt".r
        .findFirstIn(plan).isDefined,
        "no (k, __salt) exchange in the salted plan:\n" + plan)
      // result identity with the unsalted join
      assert(sj.count() == large.join(dim, "k").count())
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("fixed-width parse is one codegen projection over the text scan") {
    val dir = new java.io.File("target/test-fwplan").getAbsoluteFile
    dir.mkdirs()
    val f = new java.io.File(dir, "fw.txt")
    java.nio.file.Files.write(f.toPath,
      (0 until 50).map(i => f"$i%-4d${"v" + i}%-8s${i * 3}%-6d")
        .mkString("\n").getBytes)
    val res = graft.operators.FixedWidth.read(spark, Seq(f.getAbsolutePath),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id INT, name STRING, amt BIGINT"),
      Seq("id" -> 4, "name" -> 8, "amt" -> 6), rejectLimit = 0)
    // the substring/rtrim/try_cast projection must live INSIDE a
    // whole-stage codegen span — no UDF, no CodegenFallback island
    val spans = res.good.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, res.good.queryExecution.executedPlan.toString)
    val plan = res.good.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(res.good.count() == 50 && res.rejected == 0)
  }

  test("ANALYZE stats drive a CBO join reorder on a 3-table chain") {
    Tables.register(spark, sf)
    dropManaged("li_cbo", "ord_cbo", "cust_cbo")
    spark.table("lineitem").select("l_orderkey", "l_suppkey")
      .write.saveAsTable("li_cbo")
    spark.table("orders").select("o_orderkey", "o_custkey")
      .write.saveAsTable("ord_cbo")
    spark.table("customer").where("c_custkey < 20").select("c_custkey")
      .write.saveAsTable("cust_cbo")
    graft.operators.Distribution.analyze(spark, "li_cbo", Seq("l_orderkey", "l_suppkey"))
    graft.operators.Distribution.analyze(spark, "ord_cbo", Seq("o_orderkey", "o_custkey"))
    graft.operators.Distribution.analyze(spark, "cust_cbo", Seq("c_custkey"))
    // written in the worst order: the two big tables joined first, the
    // tiny filtered dim appended last
    val q = """SELECT COUNT(*) AS n FROM li_cbo l
              |JOIN ord_cbo o ON l.l_orderkey = o.o_orderkey
              |JOIN cust_cbo c ON o.o_custkey = c.c_custkey""".stripMargin
    def leafOrder(cbo: Boolean): Seq[String] = {
      spark.conf.set("spark.sql.cbo.enabled", cbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo)
      try {
        val plan = spark.sql(q).queryExecution.optimizedPlan.toString
        Seq("li_cbo", "ord_cbo", "cust_cbo")
          .sortBy(t => plan.indexOf("spark_catalog.default." + t))
      } finally {
        spark.conf.set("spark.sql.cbo.enabled", false)
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", false)
      }
    }
    val (heuristic, reordered) = (leafOrder(false), leafOrder(true))
    assert(heuristic == Seq("li_cbo", "ord_cbo", "cust_cbo"), heuristic)
    // stats-driven DP reorder pulls the 19-row dim off the end so the
    // big-big join is filtered before it happens
    assert(reordered != heuristic, s"CBO did not reorder: $reordered")
    assert(reordered.indexOf("cust_cbo") < reordered.indexOf("li_cbo"), reordered)
  }

  test("correlated ALL quantifier plans as two existence joins, no aggregate legs") {
    graft.Tables.register(spark, sf)
    val df = Graft.execute(spark,
      """SELECT o_orderkey FROM orders
        |WHERE o_totalprice > ALL (SELECT l_extendedprice FROM lineitem
        |                          WHERE l_orderkey = o_orderkey)""".stripMargin).get
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    val p = full.split("== Initial Plan ==")(0) // final AQE plan only
    // the EXISTS-leg rewrite: decisive witness + nullability leg, each
    // an existence join over ONE scan of the inner relation — never
    // the one-aggregated-join-per-statistic shape
    assert("ExistenceJoin".r.findAllIn(p).length == 2, p)
    assert(!p.contains("HashAggregate"),
      "quantifier grew aggregate legs:\n" + p)
    assert("lineitem\\.parquet".r.findAllIn(p).length <= 2, p)
  }
}
