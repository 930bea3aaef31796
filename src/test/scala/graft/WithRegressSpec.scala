package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's `with_clause.sql` regress suite (non-
  * recursive slices): every query there is paired with an equivalent
  * derived-table formulation, so each port asserts the CTE form and
  * the inlined form produce identical row sets on the same synthetic
  * fixtures, plus hand-pinned aggregates where the regress output is
  * a single value. Recursive CTE coverage lives in OperatorSpec /
  * RelationalQueries (q54, q162). */
class WithRegressSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // with_test1: i%10, 'text'||i%20, i%30 over 0..99 (with_clause.sql:4)
  // with_test2: i%100, 'text'||i%200, i%300 over 0..999
  private lazy val fixtures: Unit = {
    (0 until 100).map(i => (i % 10, "text" + (i % 20), i % 30))
      .toDF("i", "t", "value").createOrReplaceTempView("with_test1")
    (0 until 1000).map(i => (i % 100, "text" + (i % 200), i % 300))
      .toDF("i", "t", "value").createOrReplaceTempView("with_test2")
  }

  // PG-dialect queries (< ALL / < ANY quantifiers) route through the
  // engine's SQL front door, like a migrating user's SQL would
  private def same(cte: String, inlined: String): Unit = {
    val a = Graft.execute(spark, cte).get.collect().map(_.toSeq).toSeq
      .sortBy(_.mkString("|"))
    val b = Graft.execute(spark, inlined).get.collect().map(_.toSeq).toSeq
      .sortBy(_.mkString("|"))
    assert(a == b, s"CTE form differs from inlined form:\n$cte")
  }

  test("CTE forms match their inlined pairs (with_clause.sql:9-75)") {
    fixtures
    // sum(i%30 for 0..99): 3 full cycles 0..29 (=435*3) + 0..9 (=45)
    val total = (0 until 100).map(_ % 30).sum
    val one = spark.sql(
      "WITH my_sum(total) AS (SELECT sum(value) FROM with_test1) " +
        "SELECT * FROM my_sum").head().getLong(0)
    assert(one == total)
    same(
      """WITH my_sum(total) AS (SELECT sum(value) FROM with_test1),
        |     my_count(cnt) AS (SELECT count(*) FROM with_test1)
        |SELECT cnt, total FROM my_sum, my_count""".stripMargin,
      """SELECT cnt, total
        |FROM (SELECT sum(value) AS total FROM with_test1) tmp1,
        |     (SELECT count(*) AS cnt FROM with_test1) tmp2""".stripMargin)
    // one CTE consumed twice in a self-join
    same(
      """WITH my_group_sum(i, total) AS
        |  (SELECT i, sum(value) FROM with_test1 GROUP BY i)
        |SELECT gs1.i, gs1.total, gs2.total
        |FROM my_group_sum gs1, my_group_sum gs2
        |WHERE gs1.i = gs2.i + 1""".stripMargin,
      """SELECT gs1.i, gs1.total, gs2.total
        |FROM (SELECT i, sum(value) AS total FROM with_test1 GROUP BY i) gs1,
        |     (SELECT i, sum(value) AS total FROM with_test1 GROUP BY i) gs2
        |WHERE gs1.i = gs2.i + 1""".stripMargin)
    // a CTE reading an earlier CTE
    same(
      """WITH my_count(i, cnt) AS
        |  (SELECT i, count(*) FROM with_test1 GROUP BY i),
        |     my_sum(total) AS (SELECT sum(cnt) FROM my_count)
        |SELECT * FROM my_sum""".stripMargin,
      """SELECT sum(cnt) AS total FROM
        |  (SELECT i, count(*) AS cnt FROM with_test1 GROUP BY i) my_count"""
        .stripMargin)
    // WITH nested inside a CTE body
    same(
      """WITH my_sum(total) AS (
        |  WITH my_group_sum(total) AS
        |    (SELECT sum(value) FROM with_test1 GROUP BY i)
        |  SELECT sum(total) FROM my_group_sum)
        |SELECT * FROM my_sum""".stripMargin,
      """SELECT sum(total) FROM
        |  (SELECT sum(value) AS total FROM with_test1 GROUP BY i)
        |  my_group_sum""".stripMargin)
  }

  test("CTE in scalar subquery, ALL/ANY over CTEs (with_clause.sql:44-75,160-190)") {
    fixtures
    // CTE consumed by an uncorrelated scalar subquery
    same(
      """WITH my_max(maximum) AS (SELECT max(value) FROM with_test1)
        |SELECT * FROM with_test2
        |WHERE value < (SELECT * FROM my_max)""".stripMargin,
      """SELECT * FROM with_test2
        |WHERE value < (SELECT max(value) FROM with_test1)""".stripMargin)
    // WITH attached to the scalar subquery itself
    same(
      """SELECT * FROM with_test2
        |WHERE value < (WITH my_max(maximum) AS
        |                 (SELECT max(value) FROM with_test1)
        |               SELECT * FROM my_max)""".stripMargin,
      """SELECT * FROM with_test2
        |WHERE value < (SELECT max(value) FROM with_test1)""".stripMargin)
    // < ALL over a grouped CTE
    same(
      """WITH my_groupmax(i, maximum) AS
        |  (SELECT i, max(value) FROM with_test1 GROUP BY i)
        |SELECT * FROM with_test2
        |WHERE value < ALL (SELECT maximum FROM my_groupmax)""".stripMargin,
      """SELECT * FROM with_test2
        |WHERE value < ALL (SELECT max(value) FROM with_test1 GROUP BY i)"""
        .stripMargin)
    // correlated < ANY filtered inside the subquery over the CTE
    same(
      """WITH my_group_sum(i, total) AS
        |  (SELECT i, sum(value) FROM with_test1 GROUP BY i)
        |SELECT with_test2.* FROM with_test2
        |WHERE value < ANY (SELECT total FROM my_group_sum
        |                   WHERE my_group_sum.i = with_test2.i)""".stripMargin,
      """SELECT with_test2.* FROM with_test2
        |WHERE value < ANY (SELECT total FROM
        |  (SELECT i, sum(value) AS total FROM with_test1 GROUP BY i) tmp
        |  WHERE tmp.i = with_test2.i)""".stripMargin)
    // CTE body aggregate feeding a second scalar read of the same CTE
    val n = spark.sql(
      """WITH my_groupmax(i, maximum) AS
        |  (SELECT i, max(value) FROM with_test1 GROUP BY i)
        |SELECT count(*) FROM my_groupmax
        |WHERE maximum > (SELECT sum(maximum)/100 FROM my_groupmax)"""
        .stripMargin).head().getLong(0)
    // maxima: i<10 → max over {i, i+10, i+20 mod 30 pattern} = 20+i
    // for i in 0..9 → {20..29}; sum=245; 245/100=2.45 → all 10 exceed
    assert(n == 10)
  }

  test("inner WITH shadows an outer CTE of the same name (with_clause.sql:70-75)") {
    fixtures
    // outer my_max = max(value) over with_test2 (299); the scalar
    // subquery's own my_max shadows it with max(i) over with_test1 (9)
    same(
      """WITH my_max(maximum) AS (SELECT max(value) FROM with_test2)
        |SELECT * FROM with_test1, my_max
        |WHERE value < (WITH my_max(maximum) AS
        |                 (SELECT max(i) FROM with_test1)
        |               SELECT * FROM my_max)""".stripMargin,
      """SELECT * FROM with_test1,
        |  (SELECT max(value) AS maximum FROM with_test2) my_max
        |WHERE value < (SELECT max(i) FROM with_test1)""".stripMargin)
  }

  test("same CTE under UNION ALL and double FROM use (with_clause.sql:123-126,190)") {
    fixtures
    val both = spark.sql(
      """WITH my_sum(total) AS (SELECT sum(value) FROM with_test1)
        |SELECT * FROM my_sum
        |UNION ALL
        |SELECT * FROM my_sum""".stripMargin).collect()
    val total = (0 until 100).map(_ % 30).sum
    assert(both.map(_.getLong(0)).toSeq == Seq(total, total))
    // one CTE aliased twice in the same FROM (with_b FOO/FOO2)
    Seq(1, 2).toDF("i").createOrReplaceTempView("with_b")
    same(
      """WITH b1 AS (SELECT * FROM with_b)
        |SELECT * FROM (SELECT * FROM b1 WHERE b1.i = 1) AS foo, b1 foo2"""
        .stripMargin,
      """SELECT * FROM
        |  (SELECT * FROM (SELECT * FROM with_b) b1 WHERE b1.i = 1) AS foo,
        |  (SELECT * FROM with_b) AS foo2""".stripMargin)
  }

  test("window function inside a CTE joined back to a table (with_clause.sql:150-158)") {
    fixtures
    same(
      """WITH my_rank AS (SELECT i, t, value,
        |    rank() OVER (ORDER BY value) AS r FROM with_test1)
        |SELECT my_rank.* FROM with_test2, my_rank
        |WHERE with_test2.i = my_rank.i
        |ORDER BY my_rank.i, my_rank.t, my_rank.value, my_rank.r
        |LIMIT 100""".stripMargin,
      """SELECT my_rank.* FROM with_test2,
        |  (SELECT i, t, value, rank() OVER (ORDER BY value) AS r
        |   FROM with_test1) my_rank
        |WHERE with_test2.i = my_rank.i
        |ORDER BY my_rank.i, my_rank.t, my_rank.value, my_rank.r
        |LIMIT 100""".stripMargin)
  }

  test("WITH error cases: duplicate name, forward reference (with_clause.sql:127-145)") {
    fixtures
    // duplicate CTE name in one WITH list is an error
    intercept[Exception](spark.sql(
      """WITH my_sum(total) AS (SELECT sum(value) FROM with_test1),
        |     my_sum(group_total) AS
        |       (SELECT sum(value) FROM with_test1 GROUP BY i)
        |SELECT * FROM my_sum""".stripMargin).collect())
    // non-recursive WITH cannot forward-reference a later CTE
    intercept[Exception](spark.sql(
      """WITH my_sum(total) AS (SELECT sum(total) FROM my_group_sum),
        |     my_group_sum(i, total) AS
        |       (SELECT i, sum(value) FROM with_test1 GROUP BY i)
        |SELECT * FROM my_sum""".stripMargin).collect())
  }

  test("CTAS and INSERT consuming a CTE (with_clause.sql:76-84)") {
    fixtures
    spark.sql("DROP TABLE IF EXISTS with_test3")
    // a prior aborted suite can leave the managed LOCATION on disk
    // with no catalog entry — CREATE would trip LOCATION_ALREADY_EXISTS
    operators.GreengageDdl.clearOrphanLocation(spark, "with_test3")
    spark.sql(
      """CREATE TABLE with_test3 USING parquet AS
        |WITH my_sum(i, total) AS
        |  (SELECT i, sum(value) FROM with_test1 GROUP BY i)
        |SELECT * FROM my_sum""".stripMargin)
    assert(spark.table("with_test3").count() == 10)
    val expect = (0 until 100).groupBy(_ % 10)
      .map { case (k, is) => k -> is.map(_ % 30).sum.toLong }
    val got = spark.table("with_test3").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == expect)
    spark.sql("DROP TABLE with_test3")
  }
}
