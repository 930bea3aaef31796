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

  // ---- join.sql ports (PG regress): multiway FULL JOIN + the
  // nullability-propagation battery, rows pinned to join.out ---------

  private def joinSqlFixtures(): Unit = {
    Seq(("bb", 11)).toDF("name", "n").createOrReplaceTempView("jt1")
    Seq(("bb", 12), ("cc", 22), ("ee", 42)).toDF("name", "n")
      .createOrReplaceTempView("jt2")
    Seq(("bb", 13), ("cc", 23), ("dd", 33)).toDF("name", "n")
      .createOrReplaceTempView("jt3")
  }

  test("multiway FULL JOIN USING coalesces the key (join.out:1864)") {
    joinSqlFixtures()
    val out = spark.sql(
      """SELECT name, jt1.n, jt2.n, jt3.n
        |FROM jt1 FULL JOIN jt2 USING (name) FULL JOIN jt3 USING (name)"""
        .stripMargin).collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)))).toSet
    assert(out == Set(
      ("bb", Some(11), Some(12), Some(13)),
      ("cc", None, Some(22), Some(23)),
      ("dd", None, None, Some(33)),
      ("ee", None, Some(42), None)))
  }

  test("chained NATURAL FULL JOIN with constant columns (join.out:1961-2003)") {
    joinSqlFixtures()
    val out = spark.sql(
      """SELECT * FROM
        |(SELECT name, n AS s1_n, 1 AS s1_1 FROM jt1) s1
        |NATURAL FULL JOIN
        |(SELECT name, n AS s2_n, 2 AS s2_2 FROM jt2) s2
        |NATURAL FULL JOIN
        |(SELECT name, n AS s3_n, 3 AS s3_2 FROM jt3) s3""".stripMargin)
      .collect().map(r => (r.getString(0),
        Option(r.get(1)), Option(r.get(3)), Option(r.get(5)))).toSet
    // constants in the null-extended sides go to NULL, not 1/2/3
    assert(out == Set(
      ("bb", Some(11), Some(12), Some(13)),
      ("cc", None, Some(22), Some(23)),
      ("dd", None, None, Some(33)),
      ("ee", None, Some(42), None)))
    val nested = spark.sql(
      """SELECT * FROM
        |(SELECT name, n AS s1_n FROM jt1) s1
        |NATURAL FULL JOIN
        |  (SELECT * FROM
        |    (SELECT name, n AS s2_n, 2 AS s2_2 FROM jt2) s2
        |    NATURAL FULL JOIN
        |    (SELECT name, n AS s3_n FROM jt3) s3) ss2""".stripMargin)
      .collect().map(r => (r.getString(0), Option(r.get(1)),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toSet
    assert(nested == Set(
      ("bb", Some(11), Some(12), Some(2), Some(13)),
      ("cc", None, Some(22), Some(2), Some(23)),
      ("dd", None, None, None, Some(33)),
      ("ee", None, Some(42), Some(2), None)))
  }

  test("IS NOT NULL in LOJ ON vs WHERE (join.out:2036-2130 nullability battery)") {
    Seq((1, Some(11)), (2, Some(22)), (3, None), (4, Some(44)), (5, None))
      .toDF("x1", "x2").createOrReplaceTempView("jx")
    Seq((1, Some(111)), (2, Some(222)), (3, Some(333)), (4, None))
      .toDF("y1", "y2").createOrReplaceTempView("jy")
    def q(sql: String): Set[Seq[Option[Int]]] =
      spark.sql(sql).collect()
        .map(r => (0 until r.length).map(i =>
          Option(r.get(i)).map(_.asInstanceOf[Int])).toSeq).toSet
    def row(vs: Integer*): Seq[Option[Int]] = vs.map(Option(_).map(_.toInt))
    // ON-clause IS NOT NULL only suppresses the MATCH, never the row
    assert(q("""SELECT * FROM jx LEFT JOIN jy
                ON x1 = y1 AND x2 IS NOT NULL""") == Set(
      row(1, 11, 1, 111), row(2, 22, 2, 222), row(3, null, null, null),
      row(4, 44, 4, null), row(5, null, null, null)))
    assert(q("""SELECT * FROM jx LEFT JOIN jy
                ON x1 = y1 AND y2 IS NOT NULL""") == Set(
      row(1, 11, 1, 111), row(2, 22, 2, 222), row(3, null, 3, 333),
      row(4, 44, null, null), row(5, null, null, null)))
    // nested LOJ: the qual's table decides which join it gates
    val base = """FROM (jx LEFT JOIN jy ON x1 = y1)
                  LEFT JOIN (SELECT x1 AS xx1, x2 AS xx2 FROM jx) xx"""
    assert(q(s"SELECT * $base ON x1 = xx1") == Set(
      row(1, 11, 1, 111, 1, 11), row(2, 22, 2, 222, 2, 22),
      row(3, null, 3, 333, 3, null), row(4, 44, 4, null, 4, 44),
      row(5, null, null, null, 5, null)))
    assert(q(s"SELECT * $base ON x1 = xx1 AND x2 IS NOT NULL") == Set(
      row(1, 11, 1, 111, 1, 11), row(2, 22, 2, 222, 2, 22),
      row(3, null, 3, 333, null, null), row(4, 44, 4, null, 4, 44),
      row(5, null, null, null, null, null)))
    assert(q(s"SELECT * $base ON x1 = xx1 AND y2 IS NOT NULL") == Set(
      row(1, 11, 1, 111, 1, 11), row(2, 22, 2, 222, 2, 22),
      row(3, null, 3, 333, 3, null), row(4, 44, 4, null, null, null),
      row(5, null, null, null, null, null)))
    assert(q(s"SELECT * $base ON x1 = xx1 AND xx2 IS NOT NULL") == Set(
      row(1, 11, 1, 111, 1, 11), row(2, 22, 2, 222, 2, 22),
      row(3, null, 3, 333, null, null), row(4, 44, 4, null, 4, 44),
      row(5, null, null, null, null, null)))
    // the same quals in WHERE filter rows instead
    assert(q(s"SELECT * $base ON x1 = xx1 WHERE x2 IS NOT NULL") == Set(
      row(1, 11, 1, 111, 1, 11), row(2, 22, 2, 222, 2, 22),
      row(4, 44, 4, null, 4, 44)))
    assert(q(s"SELECT * $base ON x1 = xx1 WHERE y2 IS NOT NULL") == Set(
      row(1, 11, 1, 111, 1, 11), row(2, 22, 2, 222, 2, 22),
      row(3, null, 3, 333, 3, null)))
    assert(q(s"SELECT * $base ON x1 = xx1 WHERE xx2 IS NOT NULL") == Set(
      row(1, 11, 1, 111, 1, 11), row(2, 22, 2, 222, 2, 22),
      row(4, 44, 4, null, 4, 44)))
  }
}
