package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NULL-key join semantics (FIXTURES §B, reference bfv_joins.sql
  * patterns): inner/left/semi/anti behavior with NULLs on both sides,
  * null-aware NOT IN, null-safe equality. */
class JoinEdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val l = Seq((Some(1), "a"), (Some(2), "b"), (None, "c"))
    .toDF("k", "lv")
  private lazy val r = Seq((Some(1), "x"), (None, "y"), (Some(3), "z"))
    .toDF("k", "rv")

  test("inner join drops NULL keys on both sides") {
    val out = l.join(r, l("k") === r("k")).collect()
    assert(out.length == 1 && out.head.getInt(0) == 1)
  }

  test("left join keeps NULL-key rows unmatched") {
    val out = l.join(r, l("k") === r("k"), "left").collect()
    assert(out.length == 3)
    assert(out.count(_.isNullAt(2)) == 2) // k=2 and k=NULL have no match
  }

  test("null-safe equality (<=>) matches NULL to NULL") {
    val out = l.join(r, l("k") <=> r("k")).collect()
    assert(out.length == 2) // 1<->1 and NULL<->NULL
  }

  test("left_anti keeps the NULL-key probe row (NOT EXISTS semantics)") {
    val out = l.join(r, l("k") === r("k"), "left_anti").collect()
    assert(out.map(_.getString(1)).sorted.toSeq == Seq("b", "c"))
  }

  test("NOT IN over a subquery containing NULL yields empty (null-aware anti)") {
    l.createOrReplaceTempView("jl")
    r.createOrReplaceTempView("jr")
    val withNull = spark.sql("SELECT lv FROM jl WHERE k NOT IN (SELECT k FROM jr)")
    assert(withNull.count() == 0)
    val noNull = spark.sql(
      "SELECT lv FROM jl WHERE k NOT IN (SELECT k FROM jr WHERE k IS NOT NULL)")
    assert(noNull.collect().map(_.getString(0)).sorted.toSeq == Seq("b"))
  }

  test("full outer join on empty side keeps all rows") {
    val empty = Seq.empty[(Option[Int], String)].toDF("k", "rv")
    val out = l.join(empty, l("k") === empty("k"), "full").collect()
    assert(out.length == 3)
  }
}
