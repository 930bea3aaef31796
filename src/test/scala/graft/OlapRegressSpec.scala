package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ports from the reference's qp_olap_group / qp_olap_windowerr regress
  * suites (`/root/reference/src/test/regress/sql/qp_olap_group.sql:156-168`,
  * `qp_olap_windowerr.sql`) over the standard olap fixture
  * (`olap_setup.sql:43-110`: the 12-row sale table + dimensions).
  * Expected rows pinned to `expected/qp_olap_group.out:6007-6050`;
  * divergences from the archived GPDB planner artifacts are documented
  * inline next to the ANSI result asserted.
  */
class OlapRegressSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // olap_setup.sql sale rows (cn, vn, pn, dt, qty, prc)
  private lazy val saleRows = Seq(
    (2, 40, 100, "1401-01-01", 1100, 2400.0),
    (1, 10, 200, "1401-03-01", 1, 0.0),
    (3, 40, 200, "1401-04-01", 1, 0.0),
    (1, 20, 100, "1401-05-01", 1, 0.0),
    (1, 30, 300, "1401-05-02", 1, 0.0),
    (1, 50, 400, "1401-06-01", 1, 0.0),
    (2, 50, 400, "1401-06-01", 1, 0.0),
    (1, 30, 500, "1401-06-01", 12, 5.0),
    (3, 30, 500, "1401-06-01", 12, 5.0),
    (3, 30, 600, "1401-06-01", 12, 5.0),
    (4, 40, 700, "1401-06-01", 1, 1.0),
    (4, 40, 800, "1401-06-01", 1, 1.0))

  private def mkFixture(): Unit = {
    saleRows.toDF("cn", "vn", "pn", "dt", "qty", "prc")
      .createOrReplaceTempView("olap_sale")
    Seq((1, "Macbeth", "Inverness"), (2, "Duncan", "Forres"),
      (3, "Lady Macbeth", "Inverness"), (4, "Witches, Inc", "Lonely Heath"))
      .toDF("cn", "cname", "cloc").createOrReplaceTempView("olap_customer")
    Seq((10, "Witches, Inc"), (20, "Lady Macbeth"), (30, "Duncan"),
      (40, "Macbeth"), (50, "Macduff"))
      .toDF("vn", "vname").createOrReplaceTempView("olap_vendor")
  }

  test("ROLLUP over an always-NULL CASE grouping expr (qp_olap_group.sql:163, .out:6007-6013)") {
    mkFixture()
    // f = CASE WHEN vn = 0 THEN 1 END is NULL on every row; g = 1 const.
    // .out pins three rows: (4, NULL, 1) for set (f,g) and (4, NULL,
    // NULL) twice, for sets (f) and () — duplicate output rows survive.
    val out = spark.sql(
      """SELECT COUNT(DISTINCT cn) AS cn_r, f, g
        |FROM (SELECT cn, CASE WHEN (vn = 0) THEN 1 END AS f, 1 AS g
        |      FROM olap_sale) sale_view
        |GROUP BY ROLLUP(f,g)""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
      .sortBy(_._3.isEmpty)
    assert(out == Seq((4L, None, Some(1)),
      (4L, None, None), (4L, None, None)))
  }

  test("ROLLUP + HAVING over a grouping column (qp_olap_group.sql:164, .out:6015-6023)") {
    mkFixture()
    // ANSI: sets (f,g) and (f) both group by f, so HAVING f > 1 keeps
    // both levels (g = 1 and g grouped-out→NULL); the grand total's
    // NULL f fails. The archived GPDB .out lists only the 5 g=1 rows —
    // its legacy planner deduplicated grouping sets whose non-constant
    // members coincide (g is the constant 1); we keep the ANSI multiset.
    val out = spark.sql(
      """SELECT COUNT(DISTINCT cn) AS cn_r, f, g
        |FROM (SELECT cn, vn + 1 AS f, 1 AS g FROM olap_sale) sale_view
        |GROUP BY ROLLUP(f,g) HAVING (f > 1)""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), Option(r.get(2)))).toSeq
    val leaf = Set((1L, 11), (1L, 21), (2L, 31), (3L, 41), (2L, 51))
    assert(out.count(_._3.contains(1)) == 5)
    assert(out.count(_._3.isEmpty) == 5)
    assert(out.filter(_._3.contains(1)).map(t => (t._1, t._2)).toSet == leaf)
    assert(out.filter(_._3.isEmpty).map(t => (t._1, t._2)).toSet == leaf)
  }

  test("PREPARE with params inside ROLLUP + HAVING (qp_olap_group.sql:166, .out:6025-6040)") {
    mkFixture()
    // The reference re-plans EXECUTE p(2) with $1 folded to a constant
    // BEFORE grouping, so HAVING (g > 1) sees 2 > 1 and every rollup
    // level survives (11 rows, .out:6027-6040). ANSI evaluates HAVING on
    // the grouping column g, which is NULL for the (f) and () levels —
    // those fail — leaving only the 5 leaf rows. We pin the ANSI result
    // through the same PREPARE/EXECUTE machinery the reference exercises.
    try Graft.execute(spark, "DEALLOCATE olap_p")
    catch { case _: IllegalArgumentException => () }
    Graft.execute(spark,
      """PREPARE olap_p AS SELECT COUNT(DISTINCT cn) AS cn_r, f, g
        |FROM (SELECT cn, vn + $1 AS f, $1 AS g FROM olap_sale) sale_view
        |GROUP BY ROLLUP(f,g) HAVING (g > 1)""".stripMargin)
    val out = Graft.execute(spark, "EXECUTE olap_p(2)").get
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(out == Set((1L, 12, 2), (1L, 22, 2), (2L, 32, 2),
      (3L, 42, 2), (2L, 52, 2)))
    Graft.execute(spark, "DEALLOCATE olap_p")
  }

  test("CUBE + HAVING IS NOT NULL over a one-row CTE (qp_olap_group.sql:168, .out:6043-6049)") {
    val out = spark.sql(
      """WITH src AS (SELECT 1 AS a, 1 AS b)
        |SELECT 1 FROM src GROUP BY CUBE(a, b) HAVING a IS NOT NULL""".stripMargin)
      .collect().map(_.getInt(0)).toSeq
    // sets (a,b) and (a) keep a = 1; (b) and () null it out — 2 rows
    assert(out == Seq(1, 1))
  }

  // ---- qp_olap_windowerr: frame-clause error semantics ----

  test("variable RANGE frame bounds fail loudly (qp_olap_windowerr.sql:150-210)") {
    mkFixture()
    // The reference computes per-row frame offsets (and raises 'RANGE
    // parameter cannot be negative' only when a row's value goes
    // negative). Spark requires foldable frame bounds; the engine fails
    // at analysis rather than silently mis-evaluating — loud, per this
    // repo's contract for unsupported reference forms.
    val e = intercept[Exception] {
      spark.sql(
        """SELECT COUNT(qty) OVER (ORDER BY vn DESC
          |  RANGE BETWEEN floor(cn + qty) PRECEDING AND 2 PRECEDING)
          |FROM olap_sale""".stripMargin).collect()
    }
    assert(e.getMessage != null)
  }

  test("negative RANGE offset is rejected (qp_olap_windowerr.out:211-218)") {
    mkFixture()
    // GPDB: 'RANGE parameter cannot be negative'. Spark would silently
    // flip the frame direction on a negative literal offset, so the
    // engine's SQL path (PgSql.rewrite) rejects it up front with the
    // reference's message.
    val e = intercept[IllegalArgumentException] {
      graft.operators.PgSql.rewrite(
        """SELECT COUNT(qty) OVER (ORDER BY vn
          |  RANGE BETWEEN -3 PRECEDING AND CURRENT ROW)
          |FROM olap_sale""".stripMargin)
    }
    assert(e.getMessage.contains("cannot be negative"))
    // a negative ending offset is equally invalid (PG: 'frame ending
    // offset must not be negative')
    intercept[IllegalArgumentException] {
      graft.operators.PgSql.rewrite(
        "SELECT COUNT(*) OVER (ORDER BY vn ROWS BETWEEN 2 PRECEDING AND " +
          "-1 FOLLOWING) FROM olap_sale")
    }
    // plain positive frames pass through untouched
    assert(graft.operators.PgSql.rewrite(
      "SELECT COUNT(*) OVER (ORDER BY vn RANGE BETWEEN 3 PRECEDING AND " +
        "CURRENT ROW) FROM olap_sale").contains("3 PRECEDING"))
  }

  test("division by zero inside a window aggregate errors (qp_olap_windowerr.out:148,225)") {
    mkFixture()
    // prc = 0 rows make prc/prc a 0/0. PG errors for every numeric
    // type; Spark's ANSI mode errors for integral and decimal division
    // (the IEEE float path returns NaN — documented divergence), so the
    // port pins the decimal-typed division, the shape Q.scala uses for
    // all catalog arithmetic.
    val e = intercept[Exception] {
      spark.sql(
        """SELECT COUNT(floor(CAST(prc AS DECIMAL(18,6)) /
          |                   CAST(prc AS DECIMAL(18,6))))
          |  OVER (ORDER BY cn DESC RANGE BETWEEN 3 PRECEDING AND CURRENT ROW)
          |FROM olap_sale""".stripMargin).collect()
    }
    assert(e.getMessage.toUpperCase.contains("DIVIDE_BY_ZERO")
      || e.getMessage.toLowerCase.contains("division by zero"), e.getMessage)
  }
}
