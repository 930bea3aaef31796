package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering (the index-replacement layout, SURVEY §2 index
  * row): the write must be lossless, and a 2-d box query over the
  * clustered layout must read measurably fewer rows than the same
  * query over a naturally-ordered layout — the row-group min/max
  * pruning that replaces the reference's btree/bitmap indexes.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def boxQuery(path: String) = {
    val df = spark.read.parquet(path).where(
      col("o_custkey").between(10, 25) && col("o_totalprice") < 100000.0)
    val rows = df.collect().map(_.getLong(0)).sorted.toSeq
    val scanned = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.map(_.metrics("numOutputRows").value).sum
    (rows, scanned)
  }

  test("z-order write is lossless and prunes row groups on 2-d boxes") {
    Tables.register(spark, TestSpark.sf0001)
    val orders = spark.table("orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val natural = s"$dir/natural"
    val zed = s"$dir/zorder"
    orders.repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(natural)
    graft.operators.ZOrder.writeZOrdered(orders, zed,
      Seq("o_custkey", "o_totalprice"))

    // lossless: same content either way
    val zAll = spark.read.parquet(zed).orderBy("o_orderkey").collect().toSeq
    val nAll = orders.orderBy("o_orderkey").collect().toSeq
    assert(zAll == nAll)

    // same box answer, far fewer rows surviving row-group pruning
    val (nRows, nScanned) = boxQuery(natural)
    val (zRows, zScanned) = boxQuery(zed)
    assert(zRows == nRows && zRows.nonEmpty)
    assert(zScanned * 2 <= nScanned,
      s"z-order read $zScanned rows vs $nScanned naturally — no pruning win")
  }

  test("zorderValue on empty / all-NULL input degrades to a constant key") {
    import graft.operators.ZOrder
    // empty table: min/max are NULL — the key must not NPE
    val empty = spark.range(0).selectExpr("id AS a", "id AS b")
    assert(empty.withColumn("z", ZOrder.zorderValue(empty, Seq("a", "b")))
      .count() == 0)
    // all-NULL dimension contributes a constant; the other still orders
    val mixed = spark.range(8).selectExpr(
      "CAST(NULL AS BIGINT) AS a", "id AS b")
    val keys = mixed.withColumn("z", ZOrder.zorderValue(mixed, Seq("a", "b")))
      .orderBy("b").select("z").collect().map(_.getLong(0)).toSeq
    assert(keys == keys.sorted, "surviving dimension must still order the key")
    assert(keys.distinct.size > 1)
  }

  test("morton interleave: bit planes land at i*k+j") {
    import spark.implicits._
    val df = Seq((3L, 1L)).toDF("a", "b")
    // a=0b11 -> bits 0,2; b=0b01 -> bit 1; z = 0b0111 = 7
    val z = df.select(graft.operators.ZOrder
      .interleave(Seq(col("a"), col("b")), bits = 2).as("z")).head().getLong(0)
    assert(z == 7L)
  }
}
