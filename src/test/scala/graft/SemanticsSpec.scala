package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Grouping/window/set-op semantic edges (FIXTURES §B) + the
  * distribution-invariance contract (SURVEY §7.3): results must not
  * depend on spark.sql.shuffle.partitions.
  */
class SemanticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rollup distinguishes real NULL groups from subtotal rows via grouping()") {
    val df = Seq((Some("a"), 1), (None, 2), (Some("a"), 3), (None, 4))
      .toDF("k", "v")
    val out = df.rollup("k").agg(sum("v").as("s"), grouping(col("k")).as("g"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getByte(2))).toSet
    // real NULL group (g=0) vs grand total (g=1)
    assert(out.contains((None, 6L, 0.toByte)))
    assert(out.contains((None, 10L, 1.toByte)))
    assert(out.contains((Some("a"), 4L, 0.toByte)))
  }

  test("rank vs dense_rank on ties; ntile balance") {
    val df = Seq(("x", 10), ("x", 10), ("x", 5), ("x", 1)).toDF("p", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("p").orderBy(col("v").desc)
    val out = df.select(col("v"), rank().over(w).as("r"),
      dense_rank().over(w).as("d"), ntile(2).over(w).as("n"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.count(t => t._2 == 1) == 2)          // tied rank 1
    assert(out.exists(t => t._1 == 5 && t._2 == 3 && t._3 == 2)) // gap in rank, not dense
    assert(out.count(_._4 == 1) == 2 && out.count(_._4 == 2) == 2)
  }

  test("RANGE frame sums all peers of the current order value") {
    val df = Seq(("p", 1, 10), ("p", 1, 20), ("p", 2, 30)).toDF("p", "o", "v")
    df.createOrReplaceTempView("range_peers")
    val out = spark.sql(
      """SELECT o, v, SUM(v) OVER (PARTITION BY p ORDER BY o
        |  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |FROM range_peers""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    assert(out == Set((1, 30L), (2, 60L))) // both o=1 rows see each other
  }

  test("percentile edges: single-row group, even/odd counts") {
    val df = Seq(("a", 10.0), ("b", 1.0), ("b", 2.0), ("c", 1.0), ("c", 2.0), ("c", 4.0))
      .toDF("g", "v")
    df.createOrReplaceTempView("pct_edge")
    val out = spark.sql(
      """SELECT g, percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS p50,
        |       median(v) AS med
        |FROM pct_edge GROUP BY g""".stripMargin)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("a") == ((10.0, 10.0)))  // single row: the value itself
    assert(out("b") == ((1.5, 1.5)))    // even count: midpoint interpolation
    assert(out("c") == ((2.0, 2.0)))    // odd count: middle element
  }

  test("intersectAll/exceptAll multiset counts") {
    val a = Seq(1, 1, 1, 2, 3).toDF("x")
    val b = Seq(1, 1, 2, 2).toDF("x")
    assert(a.intersectAll(b).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 1, 2))
    assert(a.exceptAll(b).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
  }

  test("set-op type coercion: int union long widens (PG-style)") {
    val a = Seq(1, 2).toDF("x")
    val b = Seq(3L, 4L).toDF("x")
    val u = a.union(b.select(col("x")))
    assert(u.schema.head.dataType == org.apache.spark.sql.types.LongType)
    assert(u.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("NULL ordering: PG-style explicit nulls-last/first") {
    val df = Seq(Some(2), None, Some(1)).toDF("x")
    val ascLast = df.orderBy(col("x").asc_nulls_last).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(ascLast.toSeq == Seq(Some(1), Some(2), None))
    val descFirst = df.orderBy(col("x").desc_nulls_first).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(descFirst.toSeq == Seq(None, Some(2), Some(1)))
  }

  test("shuffle-partition invariance: identical results at 1, 4, 32") {
    val names = Seq("q01_tpch_q1_agg", "q21_rollup", "q44_union_distinct",
      "q60_window_rank", "q81_neardup_lsh", "q36_asof_join",
      "q47_intersect_all", "q63_window_range_frame", "q88_knn_brute")
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val results = Seq("1", "4", "32").map { n =>
        spark.conf.set("spark.sql.shuffle.partitions", n)
        names.map { q =>
          SparkEntry.queries(q)(spark, TestSpark.sf0001)
            .collect().map(_.toString).sorted.mkString("\n")
        }
      }
      assert(results(0) == results(1) && results(1) == results(2))
    } finally spark.conf.set("spark.sql.shuffle.partitions", orig)
  }

  test("ANSI mode: division by zero and overflow error like PG") {
    Tables.register(spark, TestSpark.sf0001)
    assert(intercept[Exception](
      spark.sql("SELECT 1/0").collect()).getMessage.contains("DIVIDE_BY_ZERO"))
    assert(intercept[Exception](
      spark.sql("SELECT CAST(9e18 AS BIGINT) + CAST(9e18 AS BIGINT)").collect())
      .getMessage.toLowerCase.contains("overflow"))
  }
}
