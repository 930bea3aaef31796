package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch probe (not part of the library surface). */
object Experiment {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.register(spark, sfDir)
    import graft.functions.Ranges._

    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val best = math.min(once(), once())
      println(f"TIME $label%-28s $best%8.3f s")
    }

    time("q124 current") {
      val words = split(col("text"), " ")
      spark.table("documents")
        .where(tsMatch(words, Seq("data", "query")))
        .withColumn("m", mergedPositions(words, "data", "query"))
        .select(col("doc_id"), round(tsRankCdOf(col("m")), 6).as("rank_cd"))
    }
    time("q124 words column") {
      spark.table("documents")
        .withColumn("words", split(col("text"), " "))
        .where(tsMatch(col("words"), Seq("data", "query")))
        .withColumn("m", mergedPositions(col("words"), "data", "query"))
        .select(col("doc_id"), round(tsRankCdOf(col("m")), 6).as("rank_cd"))
    }
    val j = concat(lit("{\"cust\":{\"key\":"), col("o_custkey"),
      lit(",\"tags\":[\"a\",\""), col("o_orderstatus"),
      lit("\"]},\"prio\":\""), col("o_orderpriority"), lit("\"}"))
    time("q157 current") {
      spark.table("orders").withColumn("doc", j)
        .select(col("o_orderkey"),
          get_json_object(col("doc"), "$.cust.key").as("ckey"),
          get_json_object(col("doc"), "$.cust.tags[1]").as("tag2"),
          get_json_object(col("doc"), "$.prio").as("prio"),
          get_json_object(col("doc"), "$.missing").as("mis"))
    }
    time("q157 from_json once") {
      val sch = "cust struct<key:string, tags:array<string>>, prio string"
      spark.table("orders").withColumn("doc", j)
        .withColumn("p", from_json(col("doc"), org.apache.spark.sql.types.StructType.fromDDL(sch)))
        .select(col("o_orderkey"),
          col("p.cust.key").as("ckey"),
          element_at(col("p.cust.tags"), 2).as("tag2"),
          col("p.prio").as("prio"),
          lit(null).cast("string").as("mis"))
    }
    // value equivalence probe
    locally {
      val sch = "cust struct<key:string, tags:array<string>>, prio string"
      val a = spark.table("orders").withColumn("doc", j)
        .select(col("o_orderkey"),
          get_json_object(col("doc"), "$.cust.key").as("ckey"),
          get_json_object(col("doc"), "$.cust.tags[1]").as("tag2"),
          get_json_object(col("doc"), "$.prio").as("prio"),
          get_json_object(col("doc"), "$.missing").as("mis"))
      val b = spark.table("orders").withColumn("doc", j)
        .withColumn("p", from_json(col("doc"), org.apache.spark.sql.types.StructType.fromDDL(sch)))
        .select(col("o_orderkey"),
          col("p.cust.key").as("ckey"),
          element_at(col("p.cust.tags"), 2).as("tag2"),
          col("p.prio").as("prio"),
          lit(null).cast("string").as("mis"))
      println("q157 diff rows = " + a.exceptAll(b).union(b.exceptAll(a)).count())
    }
    locally {
      import org.apache.spark.sql.expressions.Window
      import graft.queries.Q._
      def variant(fused: Boolean) = {
        val qb = floor(col("l_quantity") / 10).cast("int")
        val w = Window.partitionBy("l_orderkey").orderBy(col("qb"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        val cur = dec(col("l_extendedprice"))
        val frameSum = sum(dec(col("l_extendedprice"))).over(w)
        val frameN = count(lit(1)).over(w)
        val wPeer = Window.partitionBy("l_orderkey").orderBy(col("qb"))
          .rangeBetween(Window.currentRow, Window.currentRow)
        val (peerSum, peerN) =
          if (fused)
            (sum(dec(col("l_extendedprice"))).over(wPeer),
             count(lit(1)).over(wPeer))
          else
            (sum(dec(col("l_extendedprice")))
               .over(Window.partitionBy("l_orderkey", "qb")),
             count(lit(1)).over(Window.partitionBy("l_orderkey", "qb")))
        spark.table("lineitem")
          .select(col("l_orderkey"), qb.as("qb"), col("l_extendedprice"))
          .select(col("l_orderkey"), col("qb"),
            when(frameN > 1, frameSum - cur).cast("double").as("excl_current"),
            when(frameN > peerN, frameSum - peerSum).cast("double").as("excl_group"),
            (frameSum - peerSum + cur).cast("double").as("excl_ties"))
      }
      time("q121 current")(variant(false))
      time("q121 fused rangeBetween(0,0)")(variant(true))
      val a = variant(false); val b = variant(true)
      println("q121 diff rows = " + a.exceptAll(b).union(b.exceptAll(a)).count())
    }
    locally {
      import graft.queries.Q._
      time("q01 current decimal") {
        spark.table("lineitem")
          .where(col("l_shipdate") <= lit("1998-09-02").cast("date"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sumd(col("l_quantity")).as("sum_qty"),
            sumd(col("l_extendedprice")).as("sum_base_price"),
            count(lit(1)).as("count_order"))
      }
      time("q01 long cents") {
        def cents(c: org.apache.spark.sql.Column) =
          round(c * 100).cast("long")
        spark.table("lineitem")
          .where(col("l_shipdate") <= lit("1998-09-02").cast("date"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            (sum(cents(col("l_quantity"))).cast("decimal(28,0)") / 100)
              .cast("double").as("sum_qty"),
            (sum(cents(col("l_extendedprice"))).cast("decimal(28,0)") / 100)
              .cast("double").as("sum_base_price"),
            count(lit(1)).as("count_order"))
      }
      // per-row equivalence of the cents image vs the decimal image
      val bad = spark.table("lineitem").select(
          col("l_extendedprice").as("d"))
        .where(round(col("d") * 100).cast("long") =!=
          (col("d").cast("decimal(18,2)") * 100).cast("long"))
        .count()
      println(s"q01 cents mismatches on l_extendedprice = $bad")
    }
    time("q30 current") {
      spark.table("lineitem").groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("sketch_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
    }
    time("q30 split-join") {
      val li = spark.table("lineitem")
      val sk = li.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("sketch_parts"))
      val ex = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      sk.join(ex, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("approx_parts"),
          col("sketch_parts"), col("exact_parts"))
    }
    spark.stop()
  }
}
