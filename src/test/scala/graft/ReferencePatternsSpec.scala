package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ports of representative cases from the reference's own regress suite
  * (`/root/reference/src/test/regress/sql/aggregate_with_groupingsets.sql`,
  * `bfv_aggregate.sql:1-30`) at unit scale — same fixtures, expected
  * results derived from PostgreSQL semantics.
  */
class ReferencePatternsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // foo(type, prod, quantity) from aggregate_with_groupingsets.sql
  private lazy val foo = Seq((1, "Table", 100.0), (2, "Chair", 250.0),
    (3, "Bed", 300.0)).toDF("type", "prod", "quantity")

  test("grouping sets ((type, prod), (prod)) over a LIMIT subquery") {
    foo.createOrReplaceTempView("gs_foo")
    val out = spark.sql(
      """SELECT type, prod, SUM(quantity) AS s_quant
        |FROM (SELECT type, prod, quantity FROM gs_foo LIMIT 3) F2
        |GROUP BY GROUPING SETS ((type, prod), (prod))""".stripMargin)
      .collect()
      .map(r => (Option(r.get(0)), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set(
      (Some(1), "Table", 100.0), (Some(2), "Chair", 250.0), (Some(3), "Bed", 300.0),
      (None, "Table", 100.0), (None, "Chair", 250.0), (None, "Bed", 300.0)))
  }

  test("duplicate grouping sets emit duplicate groups (PG parity)") {
    foo.createOrReplaceTempView("gs_foo")
    val out = spark.sql(
      """SELECT prod, SUM(quantity) AS s FROM gs_foo
        |GROUP BY GROUPING SETS ((prod), (prod))""".stripMargin).collect()
    assert(out.length == 6, s"expected doubled groups, got ${out.length}")
  }

  // x_outer/y_inner from bfv_aggregate.sql: a=i%3, d=i%3, e=i, i in 1..10
  private lazy val xOuter = (1 to 10).map(i => (i % 3, i, i)).toDF("a", "b", "c")
  private lazy val yInner = (1 to 10).map(i => (i % 3, i)).toDF("d", "e")

  test("window function inside IN subquery (bfv_aggregate.sql:20)") {
    xOuter.createOrReplaceTempView("x_outer")
    yInner.createOrReplaceTempView("y_inner")
    // rank() over (order by d) on d-multiset {0x3,1x4,2x3} → ranks {1,4,8}
    val in = spark.sql(
      """SELECT * FROM x_outer
        |WHERE a IN (SELECT rank() OVER (ORDER BY d) FROM y_inner)""".stripMargin)
    assert(in.count() == 4) // a=1 rows: i = 1,4,7,10
    val notIn = spark.sql(
      """SELECT * FROM x_outer
        |WHERE a NOT IN (SELECT rank() OVER (ORDER BY d) FROM y_inner)""".stripMargin)
    assert(notIn.count() == 6) // a in {0,2}
  }

  test("correlated EXISTS with window function in subquery (bfv_aggregate.sql:26)") {
    xOuter.createOrReplaceTempView("x_outer")
    yInner.createOrReplaceTempView("y_inner")
    val ex = spark.sql(
      """SELECT * FROM x_outer
        |WHERE EXISTS (SELECT rank() OVER (ORDER BY d) FROM y_inner WHERE d = a)""".stripMargin)
    assert(ex.count() == 10) // every a in {0,1,2} matches some d
    val nex = spark.sql(
      """SELECT * FROM x_outer WHERE NOT EXISTS
        |  (SELECT rank() OVER (ORDER BY d) FROM y_inner WHERE d = a)""".stripMargin)
    assert(nex.count() == 0)
  }

  test("array semantics: 1-indexed element_at, empty vs NULL arrays (arrays.sql patterns)") {
    val df = Seq(
      (1, Seq("a", "b", "c")),
      (2, Seq.empty[String]),
      (3, null.asInstanceOf[Seq[String]])).toDF("id", "arr")
    df.createOrReplaceTempView("arr_edge")
    val out = spark.sql(
      """SELECT id,
        |  try_element_at(arr, 1) AS first_el,   -- PG arrays are 1-indexed
        |  size(arr) AS n,
        |  arr IS NULL AS is_null,
        |  size(arr) = 0 AS is_empty
        |FROM arr_edge""".stripMargin).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out(1).getString(1) == "a")
    assert(out(2).isNullAt(1) && out(2).getInt(2) == 0 && !out(2).getBoolean(3))
    assert(out(3).isNullAt(1) && out(3).getBoolean(3))
    // slicing beyond bounds truncates, PG-style
    val s = spark.sql("SELECT slice(array(1,2,3), 2, 99) AS s").head().getSeq[Int](0)
    assert(s == Seq(2, 3))
  }

  test("interval arithmetic edges: month-end clamping (timestamp.c semantics)") {
    // Jan 31 + 1 month clamps to Feb 29 (leap) — PG and Spark agree.
    val r = spark.sql(
      """SELECT TIMESTAMP '2020-01-31 00:00:00' + INTERVAL '1' MONTH AS a,
        |       TIMESTAMP '2019-01-31 00:00:00' + INTERVAL '1' MONTH AS b""".stripMargin)
      .head()
    assert(r.getTimestamp(0).toString.startsWith("2020-02-29"))
    assert(r.getTimestamp(1).toString.startsWith("2019-02-28"))
  }

  test("SRF over empty input: explode drops the row, explode_outer keeps it") {
    val df = Seq((1, Seq("a", "b")), (2, Seq.empty[String])).toDF("id", "arr")
    assert(df.select(col("id"), explode(col("arr"))).count() == 2)
    val outer = df.select(col("id"), explode_outer(col("arr")).as("w"))
    assert(outer.count() == 3)
    assert(outer.where(col("id") === 2).head().isNullAt(1))
  }

  test("lead/lag/last with ignoreNulls (IGNORE NULLS windowfuncs semantics)") {
    val df = Seq((1, Some(10)), (2, None), (3, None), (4, Some(40)))
      .toDF("i", "v")
    df.createOrReplaceTempView("ign")
    val out = spark.sql(
      """SELECT i, last_value(v) IGNORE NULLS OVER
        |  (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM ign""".stripMargin)
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(out == Map(1 -> 10, 2 -> 10, 3 -> 10, 4 -> 40)) // gap-fill carry-forward
  }

  test("prepared statements: dup fails, re-prepare after dealloc, params (prepare.sql)") {
    // prepare.sql:7-18 — PREPARE / EXECUTE / duplicate fails /
    // DEALLOCATE then re-PREPARE succeeds
    Graft.execute(spark, "PREPARE rq1 AS SELECT 1 AS a")
    assert(Graft.execute(spark, "EXECUTE rq1").get.head().getInt(0) == 1)
    intercept[IllegalArgumentException] {
      Graft.execute(spark, "PREPARE rq1 AS SELECT 2 AS a")
    }
    Graft.execute(spark, "DEALLOCATE rq1")
    Graft.execute(spark, "PREPARE rq1 AS SELECT 2 AS a")
    assert(Graft.execute(spark, "EXECUTE rq1").get.head().getInt(0) == 2)
    // prepare.sql:33-47 — parameterized form (type list accepted),
    // $n order independent of use order, missing param errors
    Graft.execute(spark,
      "PREPARE rq3(text, int) AS SELECT $2 + 1 AS n, upper($1) AS s")
    val r = Graft.execute(spark, "EXECUTE rq3('abc', 41)").get.head()
    assert(r.getInt(0) == 42 && r.getString(1) == "ABC")
    intercept[IllegalArgumentException] {
      Graft.execute(spark, "EXECUTE rq3('abc')") // too few params
    }
    // sql92 spelling (prepare.sql:24)
    Graft.execute(spark, "DEALLOCATE PREPARE rq3")
    Graft.execute(spark, "DEALLOCATE PREPARE rq1")
  }

  test("interleaved portals keep independent positions (portals.sql foo1..foo4)") {
    Tables.register(spark, TestSpark.sf0001)
    for (i <- 1 to 4)
      Graft.execute(spark,
        s"DECLARE pfoo$i NO SCROLL CURSOR FOR SELECT n_nationkey FROM nation ORDER BY n_nationkey")
    def fetchKeys(c: String, n: Int): Seq[Int] =
      Graft.execute(spark, s"FETCH $n FROM $c").get.collect()
        .map(_.getInt(0)).toSeq
    // interleave: each portal advances independently
    assert(fetchKeys("pfoo1", 3) == Seq(0, 1, 2))
    assert(fetchKeys("pfoo2", 1) == Seq(0))
    assert(fetchKeys("pfoo1", 2) == Seq(3, 4))
    assert(fetchKeys("pfoo3", 5) == Seq(0, 1, 2, 3, 4))
    assert(fetchKeys("pfoo2", 2) == Seq(1, 2))
    Graft.execute(spark, "MOVE 20 FROM pfoo4")
    assert(fetchKeys("pfoo4", 10) == Seq(20, 21, 22, 23, 24)) // clamped at end
    assert(fetchKeys("pfoo1", 100).head == 5)
    for (i <- 1 to 4) Graft.execute(spark, s"CLOSE pfoo$i")
    // closed portal: further FETCH is an error (portals.sql end state)
    intercept[IllegalArgumentException] {
      Graft.execute(spark, "FETCH 1 FROM pfoo1")
    }
  }

  test("extended protocol analogs: parameterized query + cursor (SURVEY §3.2)") {
    Tables.register(spark, TestSpark.sf0001)
    // PREPARE/BIND/EXECUTE → spark.sql with named parameters
    val n1 = spark.sql(
      "SELECT count(*) AS n FROM orders WHERE o_orderstatus = :st",
      Map("st" -> "F")).head().getLong(0)
    val n2 = spark.sql(
      "SELECT count(*) AS n FROM orders WHERE o_orderstatus = :st",
      Map("st" -> "O")).head().getLong(0)
    assert(n1 > 0 && n2 > 0 && n1 != n2)
    // cursor → toLocalIterator (incremental fetch, no full collect)
    val it = spark.table("nation").orderBy("n_nationkey").toLocalIterator()
    assert(it.next().getInt(0) == 0)
    assert(it.hasNext)
  }

  test("empty grouping set () yields the grand total row alone") {
    foo.createOrReplaceTempView("gs_foo")
    val out = spark.sql(
      "SELECT SUM(quantity) AS s FROM gs_foo GROUP BY GROUPING SETS (())")
      .collect()
    assert(out.length == 1 && out.head.getDouble(0) == 650.0)
  }

  // x/y from bfv_joins.sql: a=b=c=i, i in 1..10
  private def bfvXy(): Unit = {
    val x = (1 to 10).map(i => (i, i, i)).toDF("a", "b", "c")
    x.createOrReplaceTempView("bfv_x")
    x.createOrReplaceTempView("bfv_y")
  }

  test("LOJ ON TRUE + null-filtering WHERE degenerates to inner (bfv_joins.sql:46-60)") {
    bfvXy()
    // null-filtering predicate on the inner side: LOJ ≡ inner cross
    val q1 = spark.sql(
      "SELECT * FROM bfv_x x LEFT JOIN bfv_y y ON True WHERE y.a > 0")
    assert(q1.count() == 100)
    assert(q1.queryExecution.optimizedPlan.toString.contains("Inner"),
      "null-filtering WHERE should convert the outer join:\n" +
        q1.queryExecution.optimizedPlan)
    assert(spark.sql(
      "SELECT * FROM bfv_x x LEFT JOIN bfv_y y ON True WHERE y.a IN (1,2,3)")
      .count() == 30)
    assert(spark.sql(
      "SELECT * FROM bfv_x x LEFT JOIN bfv_y y ON True WHERE y.a = y.b")
      .count() == 100)
    // null-KEEPING predicate must NOT convert: with a non-empty inner,
    // ON TRUE matches everything, so IS NULL filters all rows out
    assert(spark.sql(
      "SELECT * FROM bfv_x x LEFT JOIN bfv_y y ON True WHERE y.a IS NULL")
      .count() == 0)
    assert(spark.sql(
      "SELECT * FROM bfv_x x LEFT JOIN bfv_y y ON True WHERE y.a IS NOT NULL")
      .count() == 100)
  }

  // t1/t2 from bfv_joins.sql: t1=(1,1,1),(2,1,2),(3,NULL,3); t2=(2,3)
  private def bfvT12(): Unit = {
    Seq((Some(1), Some(1), 1), (Some(2), Some(1), 2), (Some(3), None, 3))
      .toDF("a", "b", "c").createOrReplaceTempView("bfv_t1")
    Seq((2, 3)).toDF("a", "b").createOrReplaceTempView("bfv_t2")
  }

  test("IS [NOT] DISTINCT FROM across a LOJ's null-extended side (bfv_joins.sql:62-72)") {
    bfvT12()
    def ks(where: String): Set[Int] = spark.sql(
      s"""SELECT t1.a FROM bfv_t1 t1 LEFT OUTER JOIN bfv_t2 t2 ON t1.a = t2.a
         |WHERE $where""".stripMargin).collect().map(_.getInt(0)).toSet
    // a=1: t2 null-extended (1 vs NULL distinct); a=2: 1 vs 3 distinct;
    // a=3: NULL vs NULL not distinct
    assert(ks("t1.b IS DISTINCT FROM t2.b") == Set(1, 2))
    assert(ks("t1.b IS DISTINCT FROM NULL") == Set(1, 2))
    assert(ks("t2.b IS DISTINCT FROM NULL") == Set(2))
    assert(ks("t2.b IS NOT DISTINCT FROM NULL") == Set(1, 3))
    assert(ks("t1.b IS NOT DISTINCT FROM NULL") == Set(3))
  }

  test("LOJ ON predicate over outer columns only / self-check quals (bfv_joins.sql:74-96)") {
    bfvT12()
    Seq((1, 2, 1)).toDF("a", "b", "c").createOrReplaceTempView("bfv_t3")
    // ON t1.b=1 references only the outer child: every outer row
    // survives (matched or null-extended) — never fewer than |t1|
    assert(spark.sql(
      """SELECT t1.* FROM bfv_t1 t1 LEFT OUTER JOIN bfv_t3 t3 ON t1.b = 1""")
      .count() == 3) // a=1,2 match the 1-row inner; a=3 null-extends
    // (t3.a = t3.a) IS NULL is only true on null-extended rows; it must
    // not be folded away even though a=a looks tautological
    assert(spark.sql(
      """SELECT t1.c FROM bfv_t1 t1 LEFT OUTER JOIN bfv_t3 t3 ON t3.b > t3.a
        |WHERE (t3.a = t3.a) IS NULL""".stripMargin).count() == 0)
    assert(spark.sql(
      """SELECT t1.c FROM bfv_t1 t1 LEFT OUTER JOIN bfv_t3 t3 ON t3.b < t3.a
        |WHERE (t3.a = t3.a) IS NULL""".stripMargin).count() == 3)
  }

  test("window function under a join keeps join-scoped partitions (bfv_joins.sql:120-127)") {
    val bfvFoo = (1 to 10).map(i => (i, i + 1)).toDF("a", "b")
    val bfvBar = (1 to 10).map(i => (i, i + 1)).toDF("c", "d")
    bfvFoo.createOrReplaceTempView("bfv_foo")
    bfvBar.createOrReplaceTempView("bfv_bar")
    spark.sql(
      """SELECT f.a, f.b, b.d FROM bfv_foo f, bfv_bar b WHERE f.a = b.d""")
      .createOrReplaceTempView("bfv_t")
    val out = spark.sql(
      """SELECT * FROM
        |(SELECT b.*, AVG(t.b) OVER (PARTITION BY t.a ORDER BY t.b DESC) AS e
        | FROM bfv_t t, bfv_bar b) cup, bfv_t
        |WHERE e < 10""".stripMargin).collect()
    // t has a=2..10 (one row per a, so e = avg(b) = a+1); e<10 keeps
    // a=2..8 → 7 t-rows × 10 bar rows × 9 outer bfv_t rows
    assert(out.length == 7 * 10 * 9, s"got ${out.length}")
    assert(out.map(_.getDouble(2)).toSet == (3 to 9).map(_.toDouble).toSet)
  }

  test("nested correlated subqueries match PG regress outputs (qp_correlated_query.sql)") {
    // A/B/C/E fixtures from qp_correlated_query.sql setup; expected rows
    // from src/test/regress/expected/qp_correlated_query.out:91-271
    Seq((1, 1), (19, 5), (99, 62), (1, 1), (78, -1)).toDF("i", "j")
      .createOrReplaceTempView("csq_a")
    Seq((1, 43), (88, 1), (-1, 62), (1, 1), (32, 5), (2, 7)).toDF("i", "j")
      .createOrReplaceTempView("csq_b")
    Seq((1, 889), (288, 1), (-1, 625), (32, 65), (32, 62), (3, -1),
      (99, 7), (78, 62), (2, 7)).toDF("i", "j").createOrReplaceTempView("csq_c")
    Seq((1, 889), (288, 1), (-1, 625), (32, 65), (32, 62), (3, -1),
      (99, 7), (78, 62)).toDF("i", "j").createOrReplaceTempView("csq_e")
    def rows(q: String): Seq[Seq[Int]] =
      spark.sql(q).collect().toSeq.map(r =>
        (0 until r.length).map(i => r.getInt(i)))
    // An IN sublink whose operand comes from the OUTERMOST scope while
    // the subquery correlates to the MIDDLE scope ("sublink pull-up
    // based on both left-hand and right-hand input") is beyond
    // Catalyst's decorrelator today — it dies with an internal
    // attribute-binding error. Pin that fact so an upgrade that fixes
    // it is noticed...
    intercept[Exception](rows(
      """SELECT * FROM csq_b b WHERE EXISTS (
        |  SELECT * FROM csq_c c, csq_a a WHERE c.j = a.j
        |    AND b.i IN (SELECT c2.i FROM csq_c c2 WHERE c2.i = a.i AND c2.i != 10))
        |ORDER BY 1, 2""".stripMargin))
    // ...and run the PULLED-UP form (the flattening GP's own planner
    // performs for this sublink: IN in WHERE-truth context ≡ a join
    // conjunct) — single-level correlation, PG-identical rows (.out:91)
    assert(rows(
      """SELECT * FROM csq_b b WHERE EXISTS (
        |  SELECT 1 FROM csq_c c, csq_a a, csq_c c2
        |  WHERE c.j = a.j AND c2.i = a.i AND c2.i != 10 AND c2.i = b.i)
        |ORDER BY 1, 2""".stripMargin) == Seq(Seq(1, 1), Seq(1, 43)))
    // the NOT EXISTS complement (.out:98)
    assert(rows(
      """SELECT * FROM csq_b b WHERE NOT EXISTS (
        |  SELECT 1 FROM csq_c c, csq_a a, csq_c c2
        |  WHERE c.j = a.j AND c2.i = a.i AND c2.i != 10 AND c2.i = b.i)
        |ORDER BY 1, 2""".stripMargin) ==
      Seq(Seq(-1, 62), Seq(2, 7), Seq(32, 5), Seq(88, 1)))
    // correlated NOT IN: NULL-aware anti against the correlated slice (.out:247)
    assert(rows(
      """SELECT a.i FROM csq_a a
        |WHERE a.i NOT IN (SELECT b.i FROM csq_b b WHERE a.i = b.i)
        |ORDER BY a.i""".stripMargin) == Seq(Seq(19), Seq(78), Seq(99)))
    // NOT IN over a correlated AGGREGATE subquery inside EXISTS (.out:255)
    // decorrelates natively; duplicates in A survive (multiset semantics)
    assert(rows(
      """SELECT * FROM csq_a a WHERE EXISTS (
        |  SELECT * FROM csq_b b, csq_c c WHERE c.j = a.j
        |    AND b.i NOT IN (SELECT SUM(c2.i) FROM csq_c c2
        |                    WHERE c2.i = b.i AND c2.i != 10))
        |ORDER BY 1, 2""".stripMargin) ==
      Seq(Seq(1, 1), Seq(1, 1), Seq(78, -1), Seq(99, 62)))
  }

  test("ts_rank_cd matches the Cover() walk on hand-computed examples") {
    import graft.functions.Ranges
    val df = Seq(
      "a x q",          // covers: (1,3) → 0.1/2 = 0.05
      "a q",            // (1,2) → 0.1/1 = 0.1
      "a x x q a",      // (1,4): 0.1/3; (4,5): 0.1/1 → 0.133333
      "a a q q",        // (2,3) only adjacent unlike pair → 0.1
      "q x a x q",      // (1,3): 0.1/2; (3,5): 0.1/2 → 0.1
      "a x x x x x x x" // no cover (q missing) → filtered by tsMatch
    ).zipWithIndex.map { case (t, i) => (i.toLong, t.replace("a", "data").replace("q", "query")) }
      .toDF("doc_id", "text")
    val words = split(col("text"), " ")
    val out = df.where(Ranges.tsMatch(words, Seq("data", "query")))
      .select(col("doc_id"),
        round(Ranges.tsRankCd(words, "data", "query"), 6).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(0L -> 0.05, 1L -> 0.1, 2L -> 0.133333, 3L -> 0.1, 4L -> 0.1))
  }

  test("nested NOT IN chains and the NULL-kill rule (notin.sql q1-q3, q17-q18)") {
    (1 to 10).toDF("c1").createOrReplaceTempView("ni_t1")
    (1 to 5).toDF("c2").createOrReplaceTempView("ni_t2")
    Seq(1, 2, 3).toDF("c3").createOrReplaceTempView("ni_t3")
    Seq(1, 2).toDF("c4").createOrReplaceTempView("ni_t4")
    Seq[Option[Int]](Some(1), Some(2), Some(3), None, Some(5), Some(6), Some(7))
      .toDF("c1n").createOrReplaceTempView("ni_t1n")
    def ks(q: String): Set[Int] =
      spark.sql(q).collect().map(_.getInt(0)).toSet
    // q1: plain null-free NOT IN
    assert(ks("SELECT c1 FROM ni_t1 WHERE c1 NOT IN (SELECT c2 FROM ni_t2)")
      == Set(6, 7, 8, 9, 10))
    // q2: NOT IN nested under NOT IN with an extra filter
    assert(ks(
      """SELECT c1 FROM ni_t1 WHERE c1 NOT IN
        |  (SELECT c2 FROM ni_t2 WHERE c2 > 2 AND c2 NOT IN
        |    (SELECT c3 FROM ni_t3))""".stripMargin)
      == Set(1, 2, 3, 6, 7, 8, 9, 10))
    // q3: triple-nested chain
    assert(ks(
      """SELECT c1 FROM ni_t1 WHERE c1 NOT IN
        |  (SELECT c2 FROM ni_t2 WHERE c2 NOT IN
        |    (SELECT c3 FROM ni_t3 WHERE c3 NOT IN
        |      (SELECT c4 FROM ni_t4)))""".stripMargin)
      == Set(3, 6, 7, 8, 9, 10))
    // q17: ONE null in the subquery kills NOT IN entirely
    assert(ks("SELECT c1 FROM ni_t1 WHERE c1 NOT IN (SELECT c1n FROM ni_t1n)")
      == Set.empty)
    // q18: the innermost NULL empties level 3, which un-filters level 2,
    // which anti-filters level 1 — PG expected rows 6..10 (.out:507)
    assert(ks(
      """SELECT c1 FROM ni_t1 WHERE c1 NOT IN
        |  (SELECT c2 FROM ni_t2 WHERE c2 NOT IN
        |    (SELECT c3 FROM ni_t3 WHERE c3 NOT IN
        |      (SELECT c1n FROM ni_t1n)))""".stripMargin)
      == Set(6, 7, 8, 9, 10))
  }

  test("n-term cover-density walk: 3-term hand case + 2-term closed-form parity") {
    import graft.functions.Ranges
    // 3-term hand walk: "a x b c x a" → covers [1,4] (noise 1) and
    // [3,6] (noise 1) → 0.05 + 0.05
    assert(math.abs(Ranges.coverRankCd(
      "a x b c x a".split(" "), Seq("a", "b", "c")) - 0.1) < 1e-12)
    // term missing entirely → no cover
    assert(Ranges.coverRankCd("a b a".split(" "), Seq("a", "z")) == 0.0)
    // the general walk must agree with the declarative 2-term closed
    // form on real documents (same construction as q124)
    Tables.register(spark, TestSpark.sf0001)
    val docs = spark.table("documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val words = split(col("text"), " ")
    val declarative = spark.table("documents")
      .where(Ranges.tsMatch(words, Seq("data", "query")))
      .withColumn("m", Ranges.mergedPositions(words, "data", "query"))
      .select(col("doc_id"), Ranges.tsRankCdOf(col("m")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(declarative.nonEmpty)
    declarative.foreach { case (id, r) =>
      val general = Ranges.coverRankCd(
        docs(id).split(" "), Seq("data", "query"))
      assert(math.abs(general - r) < 1e-9, s"doc $id: $general vs $r")
    }
  }

  test("weighted cover walk pins tsRankCdWOf; tsv builders agree; norm len=0 guard") {
    import graft.functions.Ranges
    import org.apache.spark.sql.Column
    // weighted Cpos hand case: "a b" labeled A,B → one cover [1,2],
    // Cpos = 2/(1/1.0 + 1/0.4), noise 0 (tsrank.c:745-760)
    val hand = Ranges.coverRankCdW("a b".split(" "), Seq("a", "b"),
      p => if (p == 1) 1.0 else 0.4)
    assert(math.abs(hand - 2.0 / (1.0 / 1.0 + 1.0 / 0.4)) < 1e-12)
    // the declarative weighted 2-term closed form must agree with the
    // weighted JVM walk on real documents (q131's A/B/D labeling) — the
    // oracle spells the same formula, so this is the independent pin
    Tables.register(spark, TestSpark.sf0001)
    val docs = spark.table("documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val words = split(col("text"), " ")
    def lbl(i: Column): Column =
      when(i <= 2, lit(3)).when(i <= 4, lit(2)).otherwise(lit(0))
    val declarative = spark.table("documents")
      .where(Ranges.tsMatch(words, Seq("data", "query")))
      .withColumn("tsv", Ranges.toTsVectorLabeled(words, lbl))
      .withColumn("mw", Ranges.mergedPositionsW(col("tsv"), "data", "query"))
      .select(col("doc_id"), Ranges.tsRankCdWOf(col("mw")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(declarative.nonEmpty)
    def wp(p: Int): Double = if (p <= 2) 1.0 else if (p <= 4) 0.4 else 0.1
    declarative.foreach { case (id, r) =>
      val general = Ranges.coverRankCdW(
        docs(id).split(" "), Seq("data", "query"), wp)
      assert(math.abs(general - r) < 1e-9, s"doc $id: $general vs $r")
    }
    // builder parity: setweight + tsvConcat (shift semantics) must equal
    // the single-pass labeled construction — first 2 words A, rest D
    val built = spark.table("documents").limit(20)
      .withColumn("words", words)
      .where(size(col("words")) > 3)
      .select(
        Ranges.tsvConcat(
          Ranges.setweight(Ranges.toTsVector(slice(col("words"), 1, 2)), "A"),
          Ranges.toTsVector(slice(col("words"), lit(3), size(col("words")) - 2)))
          .as("via_concat"),
        Ranges.toTsVectorLabeled(col("words"),
          i => when(i <= 2, lit(3)).otherwise(lit(0))).as("single_pass"))
      .collect()
    assert(built.nonEmpty)
    built.foreach(r => assert(r.get(0) == r.get(1), s"$r"))
    // empty-left concat is identity on the shifted right side
    val edge = spark.range(1).select(
      Ranges.tsvConcat(
        Ranges.toTsVector(array().cast("array<string>")),
        Ranges.setweight(Ranges.toTsVector(array(lit("w"))), "B")).as("v"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(edge.map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
      == Seq((1, "w", 2)))
    // RANK_NORM_LOGLENGTH on an empty tsvector: skip the norm (t->size
    // guard in calc_rank), never divide by log2(1) = 0
    val nrm = spark.range(1).select(
      Ranges.tsRankNorm(lit(0.5d), 1, lit(0), lit(0)).as("r"))
      .head().getDouble(0)
    assert(nrm == 0.5)
  }

  test("GROUPS frame / EXCLUDE rewrites match SQL:2011 semantics by hand") {
    import org.apache.spark.sql.expressions.Window
    // one partition; peer groups by qb: {10,20} | {30} | {40}
    val df = Seq((1, 1, 10.0), (1, 1, 20.0), (1, 2, 30.0), (1, 3, 40.0))
      .toDF("pk", "qb", "x")
    // GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING via dense_rank + RANGE
    val g = dense_rank().over(Window.partitionBy("pk").orderBy("qb"))
    val wG = Window.partitionBy("pk").orderBy("g").rangeBetween(-1, 1)
    val groups = df.withColumn("g", g)
      .select(col("x"), sum("x").over(wG).as("s")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // hand-computed per SQL:2011: qb=1 rows see groups {1,2} = 60;
    // qb=2 sees all = 100; qb=3 sees groups {2,3} = 70
    assert(groups == Map(10.0 -> 60.0, 20.0 -> 60.0, 30.0 -> 100.0, 40.0 -> 70.0))
    // EXCLUDE over RANGE UNBOUNDED PRECEDING..CURRENT ROW (peers included)
    val wf = Window.partitionBy("pk").orderBy("qb")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wp = Window.partitionBy("pk", "qb")
    val ex = df.select(col("x"),
      when(count(lit(1)).over(wf) > 1, sum("x").over(wf) - col("x"))
        .as("excl_current"),
      when(count(lit(1)).over(wf) > count(lit(1)).over(wp),
        sum("x").over(wf) - sum("x").over(wp)).as("excl_group"),
      (sum("x").over(wf) - sum("x").over(wp) + col("x")).as("excl_ties"))
      .collect().map(r => r.getDouble(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getDouble(3))).toMap
    // hand-computed: x=10: frame {10,20} → current 20, group NULL, ties 10
    //               x=20: frame {10,20} → current 10, group NULL, ties 20
    //               x=30: frame 60 → current 30, group 30, ties 60
    //               x=40: frame 100 → current 60, group 60, ties 100
    assert(ex(10.0) == ((Some(20.0), None, 10.0)), ex(10.0).toString)
    assert(ex(20.0) == ((Some(10.0), None, 20.0)))
    assert(ex(30.0) == ((Some(30.0), Some(30.0), 60.0)))
    assert(ex(40.0) == ((Some(60.0), Some(60.0), 100.0)))
  }

  test("named WINDOW clause binds and misuse errors (window_views.sql, qp_olap_windowerr)") {
    (1 to 6).map(i => (i, i % 3)).toDF("a", "b").createOrReplaceTempView("wv_t")
    // WINDOW w AS (...) with the frame in the named spec
    val v = spark.sql(
      """SELECT a, SUM(a) OVER w AS s FROM wv_t
        |WINDOW w AS (ORDER BY a ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(v(1) == 3 && v(3) == 9 && v(6) == 11)
    // frame start after frame end is a hard error, not a silent empty frame
    intercept[Exception](spark.sql(
      """SELECT SUM(a) OVER (ORDER BY a
        |ROWS BETWEEN 1 FOLLOWING AND 1 PRECEDING) FROM wv_t""".stripMargin)
      .collect())
    // RANGE with an offset frame requires exactly one ORDER BY key
    intercept[Exception](spark.sql(
      """SELECT SUM(a) OVER (ORDER BY a, b
        |RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) FROM wv_t""".stripMargin)
      .collect())
  }

  test("grouping sets over constant grouping exprs (aggregate_with_groupingsets.sql:109-134)") {
    Seq(0, 1).toDF("a").createOrReplaceTempView("gs_const")
    // select 1, a ... grouping sets(1,2): the const is itself a grouping
    // expression — nulled in the {a} set (window.out:214-220)
    val g1 = spark.sql(
      """SELECT x, a FROM (SELECT 1 AS x, a FROM gs_const)
        |GROUP BY GROUPING SETS ((x), (a))""".stripMargin)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(g1 == Set((None, Some(0)), (None, Some(1)), (Some(1), None)))
    // + DISTINCT aggregate alongside (expected :393-397)
    val g2 = spark.sql(
      """SELECT x, a, COUNT(DISTINCT a) AS c
        |FROM (SELECT 1 AS x, a FROM gs_const)
        |GROUP BY GROUPING SETS ((x), (a))""".stripMargin)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2))).toSet
    assert(g2 == Set((None, Some(0), 1L), (None, Some(1), 1L), (Some(1), None, 2L)))
    // outer filter over the grouping-set output (expected :289-293):
    // only the const-grouped row has x=1 and sum=1
    val g3 = spark.sql(
      """SELECT * FROM (
        |  SELECT x, a, SUM(a) AS s FROM (SELECT 1 AS x, a FROM gs_const)
        |  GROUP BY GROUPING SETS ((x), (a))) ss
        |WHERE x = 1 AND s = 1""".stripMargin).collect()
    assert(g3.length == 1 && g3.head.getInt(0) == 1 && g3.head.isNullAt(1)
      && g3.head.getLong(2) == 1L)
    // only constants in a ROLLUP: every set groups the whole input —
    // three rows, each counting both input rows (expected :302-306)
    val g4 = spark.sql(
      """SELECT c1, c2, COUNT(1) AS n
        |FROM (SELECT '' AS c1, '' AS c2, a FROM gs_const)
        |GROUP BY ROLLUP (c1, c2)""".stripMargin)
      .collect().map(_.getLong(2)).toSeq
    assert(g4 == Seq(2L, 2L, 2L))
    val g5 = spark.sql(
      """SELECT c1, c2, COUNT(DISTINCT a) AS n
        |FROM (SELECT '' AS c1, '' AS c2, a FROM gs_const)
        |GROUP BY ROLLUP (c1, c2)""".stripMargin)
      .collect().map(_.getLong(2)).toSeq
    assert(g5 == Seq(2L, 2L, 2L))
  }

  test("DISTINCT aggregate under grouping sets (aggregate_with_groupingsets.sql:139-147)") {
    Seq((1, 1), (2, 1)).toDF("i", "j").createOrReplaceTempView("gs_dqa")
    val out = spark.sql(
      """SELECT i, j, COUNT(DISTINCT j) AS c FROM gs_dqa
        |GROUP BY GROUPING SETS ((i), (j))""".stripMargin)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2))).toSet
    // expected :387-392
    assert(out == Set((None, Some(1), 1L), (Some(1), None, 1L),
      (Some(2), None, 1L)))
  }

  test("coalesce filter over grouping-set output (aggregate_with_groupingsets.sql:71-97)") {
    val out = spark.sql(
      """WITH table1 AS (
        |  SELECT 2 AS city_id, 5 AS cnt UNION ALL
        |  SELECT 2 AS city_id, 1 AS cnt UNION ALL
        |  SELECT 3 AS city_id, 2 AS cnt UNION ALL
        |  SELECT 3 AS city_id, 7 AS cnt),
        |fin AS (
        |  SELECT coalesce(country_id, city_id) AS location_id, total
        |  FROM (SELECT country_id, city_id, SUM(cnt) AS total
        |        FROM (SELECT 1 AS country_id, city_id, cnt FROM table1)
        |        GROUP BY GROUPING SETS ((country_id), (city_id))) base)
        |SELECT * FROM fin WHERE location_id = 1""".stripMargin).collect()
    assert(out.length == 1 && out.head.getInt(0) == 1
      && out.head.getLong(1) == 15L)
  }

  test("bfv_olap: window-in-IN, dead window branches, composite ROLLUP (bfv_olap.sql:296-340,447)") {
    // window function inside an IN subquery used as a WHERE filter —
    // failed an over-zealous "window functions not allowed in WHERE"
    // check at one point (expected output :451-454 → 15)
    assert(spark.sql(
      """SELECT SUM(g) AS s FROM (SELECT explode(sequence(1, 5)) AS g)
        |WHERE g IN (SELECT RANK() OVER (ORDER BY x)
        |            FROM (SELECT explode(sequence(1, 5)) AS x))""".stripMargin)
      .head().getLong(0) == 15L)
    // CASE over constant selector with window functions only in the
    // un-taken branches — crashed the logical-window planner once
    Seq((1, 2, 3, 4, 5, 11), (6, 7, 8, 9, 10, 12))
      .toDF("a", "b", "c", "d", "e", "f").createOrReplaceTempView("mpp23240")
    val dead = spark.sql(
      """SELECT a, b, CASE 1 WHEN 10 THEN SUM(c) OVER (PARTITION BY a)
        |              WHEN 20 THEN SUM(d) OVER (PARTITION BY a)
        |              ELSE 5 END AS sum1
        |FROM (SELECT * FROM mpp23240 WHERE f > 10) x""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    assert(dead == Set((1, 5L), (6, 5L)))
    // composite grouping elements inside ROLLUP — crashed ROLLUP
    // planning once: ROLLUP((dt,cn),(pn),(vn)) = 4 grouping levels
    Seq((1, 10, 100, 7), (1, 20, 200, 8), (2, 10, 300, 9))
      .toDF("dt", "cn", "pn", "vn").createOrReplaceTempView("sale_r")
    val roll = spark.sql(
      """SELECT vn FROM sale_r
        |GROUP BY ROLLUP((dt, cn), (pn), (vn))""".stripMargin).collect()
      .map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    // full level: the 3 distinct vn; the 3 coarser levels: vn = null
    assert(roll.length == 10)
    assert(roll.filter(_ >= 0).sorted.toSeq == Seq(7, 8, 9))
    assert(roll.count(_ == -1) == 7)
  }

  test("empsalary peer frames and ties (window.sql:12-35, window.out:38-93)") {
    // the canonical PG window fixture, results pinned to window.out
    val emp = Seq(
      ("develop", 10L, 5200), ("sales", 1L, 5000), ("personnel", 5L, 3500),
      ("sales", 4L, 4800), ("personnel", 2L, 3900), ("develop", 7L, 4200),
      ("develop", 9L, 4500), ("sales", 3L, 4800), ("develop", 8L, 6000),
      ("develop", 11L, 5200)).toDF("depname", "empno", "salary")
    emp.createOrReplaceTempView("empsalary")
    // named window, partition only (window.out:80-93)
    val sums = spark.sql(
      """SELECT empno, SUM(salary) OVER w AS s FROM empsalary
        |WINDOW w AS (PARTITION BY depname)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums(5L) == 7400L && sums(1L) == 14600L && sums(10L) == 25100L)
    // rank over ties (window.out:38-51)
    val ranks = spark.sql(
      """SELECT empno, RANK() OVER (PARTITION BY depname ORDER BY salary) AS r
        |FROM empsalary""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ranks == Map(5L -> 1, 2L -> 2, 3L -> 1, 4L -> 1, 1L -> 3,
      7L -> 1, 9L -> 2, 10L -> 3, 11L -> 3, 8L -> 5))
    // default RANGE frame: ORDER BY peers share the cumulative sum —
    // both develop 5200 rows read 19100, both sales 4800 rows 9600
    val cum = spark.sql(
      """SELECT empno, SUM(salary) OVER
        |  (PARTITION BY depname ORDER BY salary) AS s
        |FROM empsalary""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cum == Map(7L -> 4200L, 9L -> 8700L, 10L -> 19100L,
      11L -> 19100L, 8L -> 25100L, 3L -> 9600L, 4L -> 9600L, 1L -> 14600L,
      5L -> 3500L, 2L -> 7400L))
    // last_value under the default frame also reaches through peers
    val lv = spark.sql(
      """SELECT empno, LAST_VALUE(empno) OVER
        |  (PARTITION BY depname ORDER BY salary) AS l
        |FROM empsalary""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // peers (10, 11) and (3, 4) see the same last peer row
    assert(lv(10L) == lv(11L) && lv(3L) == lv(4L))
    assert(lv(8L) == 8L && lv(5L) == 5L)
  }

  // ---- qp_misc_jiras.sql ports: planner-bug regressions ------------

  test("scalar DISTINCT-agg subquery beside GROUP BY (qp_misc_jiras.sql:52, tbl2859)") {
    Seq((1, 1, "A", 1), (2, 1, "A", 0), (3, 0, "B", 1))
      .toDF("domain", "class", "attr", "value")
      .createOrReplaceTempView("tbl2859")
    val out = spark.sql(
      """SELECT attr, class,
        |  (SELECT count(DISTINCT class) FROM tbl2859) AS dclass
        |FROM tbl2859 GROUP BY attr, class ORDER BY attr""".stripMargin)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(out == Seq(("A", 1, 2L), ("B", 0, 2L)))
    // and the same under SELECT DISTINCT MAX (tbl3511)
    Seq(1, 2, 3, 4, 5).toDF("i").createOrReplaceTempView("tbl3511")
    val m = spark.sql(
      "SELECT * FROM tbl3511 WHERE i = (SELECT DISTINCT max(i) FROM tbl3511)")
      .collect()
    assert(m.map(_.getInt(0)).toSeq == Seq(5))
  }

  test("row_number in a column-aliased derived table under GROUP BY (qp_misc_jiras.sql:530)") {
    // PG permits an order-less row_number (nondeterministic numbering);
    // Spark demands ORDER BY — same numbering over a single-row input
    val a = spark.sql(
      """SELECT n FROM
        |  (SELECT row_number() OVER (PARTITION BY x ORDER BY x)
        |   FROM VALUES (0) AS t(x)) AS r(n)
        |GROUP BY n""".stripMargin).collect()
    assert(a.map(_.getInt(0)).toSeq == Seq(1))
    val b = spark.sql(
      """SELECT n FROM
        |  (SELECT row_number() OVER (ORDER BY x) FROM VALUES (0) AS t(x))
        |  AS r(n)
        |GROUP BY n""".stripMargin).collect()
    assert(b.map(_.getInt(0)).toSeq == Seq(1))
  }

  test("window over grouped aggregate output (qp_misc_jiras.sql:~880, tbl6027)") {
    (1 to 500).map(i => (i, i % 100, i % 123)).toDF("i", "j", "k")
      .createOrReplaceTempView("tbl6027")
    val out = spark.sql(
      """SELECT j, sum(k) AS sk,
        |  row_number() OVER (PARTITION BY j ORDER BY sum(k)) AS rn
        |FROM tbl6027 GROUP BY j ORDER BY j LIMIT 10""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
    val expect = (1 to 500).groupBy(_ % 100).view
      .mapValues(_.map(_ % 123).sum.toLong).toMap
    assert(out.forall { case (j, sk, rn) => sk == expect(j) && rn == 1 })
    assert(out.map(_._1).toSeq == (0 to 9))
  }

  test("UNION ALL probe against UNION ALL IN-list (qp_misc_jiras.sql:420, tbl3183)") {
    Seq(1, 1).toDF("i").createOrReplaceTempView("tbl3183_t2")
    Seq(1, 1).toDF("i").createOrReplaceTempView("tbl3183_t3")
    val out = spark.sql(
      """SELECT i FROM (SELECT i FROM tbl3183_t2
        |               UNION ALL SELECT i FROM tbl3183_t3) tmpt
        |WHERE i IN (SELECT i FROM tbl3183_t2
        |            UNION ALL SELECT i FROM tbl3183_t3)""".stripMargin)
      .collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 1, 1, 1))
  }

  test("set-returning function beside * multiplies view rows (qp_misc_jiras.sql:662, tbl4255)") {
    // PG: SELECT generate_series(1,3), * FROM union_v → 3 rows per
    // view row; Spark spells the SRF as explode
    spark.sql("SELECT 1 AS value UNION ALL SELECT 2")
      .createOrReplaceTempView("tbl4255_union_v")
    val out = spark.sql(
      """SELECT explode(sequence(1, 3)) AS g, value
        |FROM tbl4255_union_v""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(out == (1 to 3).flatMap(g => Seq((g, 1), (g, 2))).toSet)
    assert(out.size == 6)
  }

  // ---- subselect_gp.sql ports: correlated-subquery families --------

  test("correlated > ALL and targetlist correlations (subselect_gp.out:35-55)") {
    Seq((1, 2), (2, 1), (4, 2)).toDF("x", "y")
      .createOrReplaceTempView("csq_t1")
    Seq((3, 2), (3, 2), (3, 2), (3, 2), (3, 1)).toDF("x", "y")
      .createOrReplaceTempView("csq_t2")
    val all = Graft.execute(spark,
      """SELECT * FROM csq_t1
        |WHERE csq_t1.x > ALL (SELECT csq_t2.x FROM csq_t2
        |                      WHERE csq_t2.y = csq_t1.y)""".stripMargin)
      .get.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(all == Seq((4, 2)))
    val tl = spark.sql(
      """SELECT csq_t1.x, (SELECT sum(bar.x) FROM csq_t1 bar
        |                  WHERE bar.x >= csq_t1.x) AS s
        |FROM csq_t1 ORDER BY csq_t1.x""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(tl == Seq((1, 7L), (2, 6L), (4, 4L)))
  }

  test("correlated scalar agg inside a derived table keeps its initplan (subselect_gp.out:490)") {
    (1 to 100).map(i => (i, i / 3, i % 2, 100 - i)).toDF("a", "b", "c", "d")
      .createOrReplaceTempView("csq_big")
    // plain correlated average: a > avg(a where t2.a = t1.d) → a in 51..99
    val direct = spark.sql(
      """SELECT count(*) FROM csq_big t1
        |WHERE a > (SELECT CAST(avg(a) AS INT) FROM csq_big t2
        |           WHERE t2.a = t1.d)""".stripMargin).head().getLong(0)
    assert(direct == 49)
    // the same through an extra derived-table level (MPP-14441 shape)
    val nested = spark.sql(
      """SELECT count(*) FROM csq_big t1
        |WHERE a > (SELECT x.b FROM
        |  (SELECT CAST(avg(a) AS INT) AS b FROM csq_big t2
        |   WHERE t2.a = t1.d) x)""".stripMargin).head().getLong(0)
    assert(nested == 49)
  }

  test("IN-subquery under OR stays disjunctive (subselect_gp.out:280-310)") {
    (1 to 20).toDF("x").createOrReplaceTempView("mrs_t1")
    val out = spark.sql(
      """SELECT * FROM mrs_t1
        |WHERE x IN (SELECT x - 95 FROM mrs_t1) OR x < 5
        |ORDER BY 1""".stripMargin).collect().map(_.getInt(0)).toSeq
    assert(out == Seq(1, 2, 3, 4))
    Seq((1, 2), (11, 22)).toDF("a", "b").createOrReplaceTempView("mrs_u1")
    Seq((1, 2), (11, 22), (33, 44)).toDF("a", "b")
      .createOrReplaceTempView("mrs_u2")
    val joined = spark.sql(
      """SELECT mrs_u1.a FROM mrs_u1 JOIN mrs_u2 ON mrs_u1.a = mrs_u2.a
        |WHERE mrs_u1.a IN (1, 11)
        |   OR mrs_u2.a IN (SELECT a FROM mrs_u1 WHERE a = 1)
        |ORDER BY 1""".stripMargin).collect().map(_.getInt(0)).toSeq
    assert(joined == Seq(1, 11))
  }

  // ---- qp_subquery.sql ports: tuple NOT IN null semantics ----------
  // fixtures from qp_subquery.sql:300-330; expected row sets pinned to
  // qp_subquery.out:820-1030 (the .out rows, not the sometimes-stale
  // inline comments)

  private def subqFixtures(): Unit = {
    Seq((1, 2), (3, 4), (5, 6)).toDF("a", "b").createOrReplaceTempView("tbl04")
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("tbl05")
    Seq((1, 2), (3, 4)).toDF("a", "b").createOrReplaceTempView("tbl06")
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("i3")
    Seq[(Option[Int], Option[Int])]((Some(1), Some(2)), (Some(3), Some(4)),
      (None, None)).toDF("a", "b").createOrReplaceTempView("tbl07")
    Seq[(Option[Int], Option[Int])]((Some(1), Some(2)), (Some(3), Some(4)),
      (None, None)).toDF("a", "b").createOrReplaceTempView("tbl08")
    Seq[(Option[Int], Option[Int])]((Some(1), Some(2)), (Some(5), None),
      (None, Some(8))).toDF("a", "b").createOrReplaceTempView("tbl09")
  }

  private def rows(sql: String): Set[(Int, Int)] =
    spark.sql(sql).collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  test("tuple NOT IN with non-null inner side anti-joins (qp_subquery.out:820-906)") {
    subqFixtures()
    // inner join keeps the inner side null-free
    assert(rows("""SELECT tbl04.* FROM tbl04 WHERE (a,b) NOT IN
      (SELECT tbl05.a, tbl05.b FROM tbl05, tbl06
       WHERE tbl05.a = tbl06.a AND tbl05.b < 10)""") == Set((3, 4), (5, 6)))
    // where-clause conditions imply non-nullability
    assert(rows("""SELECT tbl04.* FROM tbl04 WHERE (a,b) NOT IN
      (SELECT tbl05.a, tbl05.b FROM tbl05
       WHERE tbl05.a < 2 AND tbl05.b < 10)""") == Set((3, 4), (5, 6)))
    assert(rows("""SELECT tbl04.* FROM tbl04 WHERE (a,b) NOT IN
      (SELECT tbl07.a, tbl07.b FROM tbl07 FULL OUTER JOIN tbl08 USING (a)
       WHERE tbl07.a IS NOT NULL AND tbl07.b IS NOT NULL)""") == Set((5, 6)))
    // non-null constants and rewritten forms
    assert(rows("SELECT tbl04.* FROM tbl04 WHERE (a,b) NOT IN (SELECT 1, 2)")
      == Set((3, 4), (5, 6)))
    // PG writes `NOT IN (VALUES ...)`; Spark spells the table
    // constructor as a subquery
    assert(rows("""SELECT tbl04.* FROM tbl04
      WHERE (a,b) NOT IN (SELECT * FROM VALUES (1,2), (3,4))""")
      == Set((5, 6)))
    assert(rows("""SELECT tbl04.* FROM tbl04 WHERE (a,b) NOT IN
      (SELECT i3.a+2, i3.b+2 FROM i3)""") == Set((1, 2), (5, 6)))
    // multiple NOT IN conjuncts, and the NOT(x IN ... OR x IN ...) form
    assert(rows("""SELECT tbl04.* FROM tbl04
      WHERE (a,b) NOT IN (SELECT tbl06.a, tbl06.b FROM tbl06)
        AND (a,b) NOT IN (SELECT i3.a, i3.b FROM i3)""") == Set((5, 6)))
    assert(rows("""SELECT tbl04.* FROM tbl04
      WHERE NOT ((a,b) IN (SELECT tbl06.a, tbl06.b FROM tbl06)
              OR (a,b) IN (SELECT i3.a, i3.b FROM i3))""") == Set((5, 6)))
    assert(rows("""SELECT tbl04.* FROM tbl04 WHERE (a,b) NOT IN
      (SELECT 1, 2 UNION SELECT 3, 4)""") == Set((5, 6)))
  }

  test("tuple NOT IN with nullable inner tuples kills rows (qp_subquery.out:845-980)") {
    subqFixtures()
    // a fully-NULL inner tuple makes every NOT IN unknown → no rows
    assert(rows("""SELECT tbl04.* FROM tbl04 WHERE (a,b) NOT IN
      (SELECT tbl07.a, tbl07.b FROM tbl07, tbl08
       WHERE tbl07.a IS NOT DISTINCT FROM tbl08.a
         AND tbl07.b IS NOT DISTINCT FROM tbl08.b)""").isEmpty)
    assert(rows("""SELECT tbl04.* FROM tbl04 WHERE (a,b) NOT IN
      (SELECT tbl07.a, tbl07.b FROM tbl07 LEFT JOIN tbl08
       ON tbl07.a = tbl08.a AND tbl07.b = tbl08.b
       WHERE tbl07.a IS NULL AND tbl07.b IS NULL)""").isEmpty)
    assert(rows("""SELECT tbl04.* FROM tbl04 WHERE (a,b) NOT IN
      (SELECT i3.a, i3.b FROM i3
       UNION SELECT tbl07.a, tbl07.b FROM tbl07)""").isEmpty)
    assert(rows("""SELECT tbl04.* FROM tbl04 WHERE (a,b) NOT IN
      (SELECT i3.a, i3.b FROM i3
       UNION ALL SELECT tbl07.a, tbl07.b FROM tbl07)""").isEmpty)
    // PARTIALLY null inner tuples: a definite column mismatch still
    // rejects the tuple — (3,4) survives tbl09 = {(1,2),(5,∅),(∅,8)}
    assert(rows("""SELECT tbl04.* FROM tbl04 WHERE (a,b) NOT IN
      (SELECT tbl09.a, tbl09.b FROM tbl09)""") == Set((3, 4)))
    assert(rows("""SELECT tbl04.* FROM tbl04 WHERE (a,b) NOT IN
      (SELECT tbl09.a, tbl09.b FROM tbl09
       GROUP BY tbl09.a, tbl09.b)""") == Set((3, 4)))
    // single-column NOT IN over a filtered nullable column
    assert(rows("""SELECT tbl04.* FROM tbl04 WHERE a NOT IN
      (SELECT tbl09.a FROM tbl09 WHERE tbl09.b IS NULL)""")
      == Set((1, 2), (3, 4)))
    // OR of two NOT INs: the non-null branch saves (3,4) and (5,6)
    assert(rows("""SELECT tbl04.* FROM tbl04
      WHERE (a,b) NOT IN (SELECT i3.a, i3.b FROM i3)
         OR (a,b) NOT IN (SELECT tbl07.a, tbl07.b FROM tbl07)""")
      == Set((3, 4), (5, 6)))
    // (x,y) NOT IN {(1,∅)}: (1,2) unknown-killed, (3,4) survives on x
    Seq((1, 2), (3, 4)).toDF("x", "y").createOrReplaceTempView("tbl04xy")
    Seq[(Option[Int], Option[Int])]((Some(1), None)).toDF("x", "y")
      .createOrReplaceTempView("tbl10")
    assert(rows("""SELECT * FROM tbl04xy WHERE (x,y) NOT IN
      (SELECT x, y FROM tbl10)""") == Set((3, 4)))
    assert(rows("""SELECT * FROM tbl04xy WHERE (x,y) NOT IN
      (SELECT 1, y FROM tbl10)""") == Set((3, 4)))
    // empty inner side: everything passes, including the NULL-y row
    val t10 = spark.sql(
      "SELECT * FROM tbl10 WHERE y NOT IN (SELECT 1 WHERE false)").collect()
    assert(t10.length == 1 && t10(0).getInt(0) == 1 && t10(0).isNullAt(1))
  }

  test("correlated IN over expressions and tuple IN (qp_subquery.out:1-140)") {
    Seq((1, 2, Some(3.0)), (2, 3, Some(4.0)), (3, 4, Some(5.0)),
      (1, 1, Some(1.0)), (2, 2, Some(2.0)), (3, 3, Some(3.0)),
      (6, 7, Some(8.0)), (8, 9, None))
      .toDF("f1", "f2", "f3").createOrReplaceTempView("subselect_tbl1")
    // uncorrelated and nested IN
    assert(spark.sql("""SELECT f1 FROM subselect_tbl1
      WHERE f1 IN (SELECT f2 FROM subselect_tbl1)""").collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 1, 2, 2, 3, 3))
    assert(spark.sql("""SELECT f1 FROM subselect_tbl1
      WHERE f1 IN (SELECT f2 FROM subselect_tbl1
                   WHERE f2 IN (SELECT f1 FROM subselect_tbl1))""").collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 1, 2, 2, 3, 3))
    // tuple NOT IN with a NULL-filtered inner side
    assert(rows("""SELECT f1, f2 FROM subselect_tbl1
      WHERE (f1, f2) NOT IN (SELECT f2, CAST(f3 AS int) FROM subselect_tbl1
                             WHERE f3 IS NOT NULL)""")
      == Set((1, 2), (6, 7), (8, 9)))
    // correlated IN referencing the outer row in the select list
    assert(rows("""SELECT f1, CAST(f3 AS int) FROM subselect_tbl1 upper
      WHERE f3 IN (SELECT upper.f1 + f2 FROM subselect_tbl1
                   WHERE f2 = CAST(f3 AS int))""")
      == Set((1, 3), (2, 4), (3, 5), (6, 8)))
    // correlated IN through a cast comparison
    assert(rows("""SELECT f1, CAST(f3 AS int) FROM subselect_tbl1 upper
      WHERE f1 IN (SELECT f2 FROM subselect_tbl1
                   WHERE CAST(upper.f2 AS double) = f3)""")
      == Set((3, 5), (3, 3), (2, 4), (1, 1), (2, 2)))
    // tuple IN (positive form)
    assert(spark.sql("""SELECT f1 FROM subselect_tbl1
      WHERE (f1, f2) IN (SELECT f2, CAST(f3 AS int) FROM subselect_tbl1
                         WHERE f3 IS NOT NULL)""").collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 2, 3, 3))
  }

  test("EXISTS over NULL-keyed rows keeps/drops per key presence (qp_subquery.out:245-265)") {
    Seq[(Option[Int], Option[Int], String)](
      (Some(1), Some(4), "one"), (Some(2), Some(3), "two"),
      (Some(3), Some(2), "three"), (Some(4), Some(1), "four"),
      (Some(5), Some(0), "five"), (Some(6), Some(6), "six"),
      (Some(7), Some(7), "seven"), (Some(8), Some(8), "eight"),
      (Some(0), None, "zero"), (None, None, "null"), (None, Some(0), "zero"))
      .toDF("i", "j", "t").createOrReplaceTempView("join_tab1")
    Seq[(Option[Int], Option[Int])](
      (Some(1), Some(-1)), (Some(2), Some(2)), (Some(3), Some(-3)),
      (Some(2), Some(4)), (Some(5), Some(-5)), (Some(5), Some(-5)),
      (Some(0), None), (None, None), (None, Some(0)))
      .toDF("i", "k").createOrReplaceTempView("join_tab2")
    val ex = spark.sql("""SELECT t FROM join_tab1 WHERE EXISTS
      (SELECT * FROM join_tab2 WHERE join_tab1.i = join_tab2.i)""")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(ex == Seq("five", "one", "three", "two", "zero"))
    // NOT EXISTS keeps both NULL-keyed probe rows (no match possible)
    val nex = spark.sql("""SELECT t FROM join_tab1 WHERE NOT EXISTS
      (SELECT * FROM join_tab2 WHERE join_tab1.i = join_tab2.i)""")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(nex == Seq("eight", "four", "null", "seven", "six", "zero"))
  }
}
