package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Graft.execute — the utility.c-style statement router plus the
  * PgSql lexical rewrites: a migrated script's statements run
  * unmodified, each verb landing in the subsystem that implements it.
  */
class GraftSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def drop(names: String*): Unit = names.foreach { n =>
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

  test("PgSql rewrites: type aliases, regex/LIKE operators, literal safety") {
    import graft.operators.PgSql.rewrite
    assert(spark.sql(rewrite("SELECT '12'::int8 + 1")).head().getLong(0) == 13L)
    assert(spark.sql(rewrite("SELECT CAST('x' AS text)")).head().getString(0) == "x")
    assert(spark.sql(rewrite("SELECT 'abc' ~~ 'a%'")).head().getBoolean(0))
    assert(spark.sql(rewrite("SELECT 'abc' !~~ 'b%'")).head().getBoolean(0))
    assert(spark.sql(rewrite("SELECT 'abc' ~ 'b'")).head().getBoolean(0))
    assert(spark.sql(rewrite("SELECT 'abc' !~ 'z'")).head().getBoolean(0))
    assert(spark.sql(rewrite("SELECT 'ABC' ~* 'abc'")).head().getBoolean(0))
    assert(spark.sql(rewrite("SELECT 'ABC' !~* 'xyz'")).head().getBoolean(0))
    // a tilde or type name INSIDE a literal must survive untouched
    assert(spark.sql(rewrite("SELECT 'a~b' ~~ 'a~%'")).head().getBoolean(0))
    assert(spark.sql(rewrite("SELECT 'cast as text'")).head()
      .getString(0) == "cast as text")
    assert(rewrite("SELECT 'it''s ~ fine'") == "SELECT 'it''s ~ fine'")
    // ILIKE spellings (pg_operator.h ~~* / !~~*)
    assert(spark.sql(rewrite("SELECT 'ABC' ~~* 'a%'")).head().getBoolean(0))
    assert(spark.sql(rewrite("SELECT 'ABC' !~~* 'z%'")).head().getBoolean(0))
    // a literal ENDING in ~* must not be rewritten into RLIKE garbage
    assert(rewrite("SELECT 'x ~*'") == "SELECT 'x ~*'")
    assert(spark.sql(rewrite("SELECT 'x ~*'")).head().getString(0) == "x ~*")
    // ~* against a non-literal pattern fails loudly, not case-sensitively
    intercept[IllegalArgumentException] { rewrite("SELECT a ~* b FROM t") }
    // BETWEEN SYMMETRIC swaps reversed bounds (gram.y b_expr)
    assert(spark.sql(rewrite("SELECT 7 BETWEEN SYMMETRIC 10 AND 5"))
      .head().getBoolean(0))
    assert(!spark.sql(rewrite("SELECT 3 BETWEEN SYMMETRIC 10 AND 5"))
      .head().getBoolean(0))
    assert(spark.sql(rewrite("SELECT 7 NOT BETWEEN SYMMETRIC 3 AND 5"))
      .head().getBoolean(0))
    // inside a literal: untouched
    assert(rewrite("SELECT 'between symmetric 1 and 2'") ==
      "SELECT 'between symmetric 1 and 2'")
    // ARRAY[...] constructors flip their bracket pair only
    assert(spark.sql(rewrite("SELECT ARRAY[1, 2, 3]")).head()
      .getSeq[Int](0).toSeq == Seq(1, 2, 3))
    assert(spark.sql(rewrite("SELECT array [ 10, 20 ]")).head()
      .getSeq[Int](0).toSeq == Seq(10, 20))
    // nested constructors, literals with brackets, and subscripts
    assert(spark.sql(rewrite("SELECT ARRAY[ARRAY[1], ARRAY[2]]")).head()
      .getSeq[scala.collection.Seq[Int]](0).map(_.toSeq).toSeq
      == Seq(Seq(1), Seq(2)))
    assert(spark.sql(rewrite("SELECT ARRAY['a[b', 'c]d']")).head()
      .getSeq[String](0).toSeq == Seq("a[b", "c]d"))
    // PG subscripts are 1-based with NULL out-of-bounds IN BOTH
    // DIRECTIONS — below-lower-bound indexes (expr[-1], expr[0]) are
    // NULL too (arrayfuncs.c array_ref), where a bare try_element_at
    // would return the LAST element; the guard handles that, and a
    // map's non-numeric key try_casts to NULL so it takes the plain
    // ELSE arm
    assert(rewrite("SELECT m['k'] FROM t").contains(
      "ELSE try_element_at(m, 'k') END"))
    assert(rewrite("SELECT subarray[1] FROM t").contains(
      "ELSE try_element_at(subarray, CAST((1) AS INT)) END"))
    assert(spark.sql(rewrite("SELECT (ARRAY[10, 20])[2]")).head().getInt(0) == 20)
    assert(spark.sql(rewrite("SELECT (ARRAY[10])[3]")).head().isNullAt(0))
    assert(spark.sql(rewrite("SELECT (ARRAY[10, 20])[-1]")).head().isNullAt(0))
    assert(spark.sql(rewrite("SELECT (ARRAY[10, 20])[0]")).head().isNullAt(0))
    assert(spark.sql(rewrite("SELECT (ARRAY[ARRAY[1,2],ARRAY[3,4]])[2][1]"))
      .head().getInt(0) == 3)
  }

  test("FROM unnest WITH ORDINALITY rewrites to lateral posexplode") {
    import graft.operators.PgSql.rewrite
    // standalone FROM: plain subquery, 1-based BIGINT ordinality
    val r1 = spark.sql(rewrite(
      "SELECT v, o FROM unnest(ARRAY['a','b','c']) WITH ORDINALITY AS t(v, o)"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(r1 == Seq(("a", 1L), ("b", 2L), ("c", 3L)))
    // implicit-LATERAL comma form correlates with the left table
    spark.sql("CREATE OR REPLACE TEMP VIEW uo_t AS " +
      "SELECT * FROM VALUES (1, array(10, 20)), (2, array(30)) v(id, arr)")
    val r2 = spark.sql(rewrite(
      "SELECT id, e, o FROM uo_t, unnest(arr) WITH ORDINALITY AS u(e, o) ORDER BY id, o"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(r2 == Seq((1, 10, 1L), (1, 20, 2L), (2, 30, 1L)))
    // PG default names without a column list: (unnest, ordinality)
    val r3 = spark.sql(rewrite(
      "SELECT unnest, ordinality FROM unnest(ARRAY[7, 8]) WITH ORDINALITY AS u"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(r3 == Seq((7, 1L), (8, 2L)))
    // no ORDINALITY: alias names the COLUMN when no list (PG semantics)
    val r4 = spark.sql(rewrite(
      "SELECT x FROM unnest(ARRAY[1, 2]) AS x")).collect().map(_.getInt(0)).toSeq
    assert(r4 == Seq(1, 2))
    val r5 = spark.sql(rewrite(
      "SELECT id, e FROM uo_t, unnest(arr) AS u(e) WHERE e > 15 ORDER BY e"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(r5 == Seq((1, 20), (2, 30)))
    // SELECT-list unnest (SRF-in-targetlist) is NOT this rewrite's
    // business: the text must come through untouched
    assert(rewrite("SELECT a, unnest(arr) FROM t") ==
      "SELECT a, unnest(arr) FROM t")
    // inside a literal: untouched
    assert(rewrite("SELECT 'from unnest(x) as t'") ==
      "SELECT 'from unnest(x) as t'")
    // alias with no column list followed by a clause: the separator the
    // alias regex's \s* consumed must survive ('AS t WHERE', not 'AS tWHERE')
    val r6 = spark.sql(rewrite(
      "SELECT t FROM unnest(ARRAY[1, 5, 9]) AS t WHERE t > 1 ORDER BY t"))
      .collect().map(_.getInt(0)).toSeq
    assert(r6 == Seq(5, 9))
    // clause keywords are never mistaken for a bare alias: the
    // alias-less form synthesizes the FUNCTION NAME as alias (PG
    // names the SRF column after the function) and the clause survives
    assert(rewrite("SELECT * FROM unnest(a) OFFSET 5") ==
      "SELECT * FROM (SELECT col AS unnest FROM explode(a)) AS unnest OFFSET 5")
    assert(rewrite("SELECT * FROM unnest(a) EXCEPT SELECT * FROM b") ==
      "SELECT * FROM (SELECT col AS unnest FROM explode(a)) AS unnest " +
        "EXCEPT SELECT * FROM b")
  }

  test("CREATE INDEX clusters the layout; the clustered scan reads fewer rows") {
    Tables.register(spark, TestSpark.sf0001)
    drop("idx_t")
    spark.table("orders").select("o_orderkey", "o_custkey", "o_totalprice")
      .repartition(8).write.saveAsTable("idx_t")
    def scanned(): (Long, Long) = {
      val df = spark.table("idx_t").where(col("o_custkey").between(10, 20))
      val n = df.count()
      df.collect()
      val rows = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.map(_.metrics("numOutputRows").value).sum
      (n, rows)
    }
    val (nBefore, scannedBefore) = scanned()
    // btree-style single-column index -> range-clustered rewrite
    Graft.execute(spark, "CREATE INDEX idx_cust ON idx_t (o_custkey)")
    val (nAfter, scannedAfter) = scanned()
    assert(nBefore == nAfter && nAfter > 0)
    assert(scannedAfter * 2 <= scannedBefore,
      s"clustered scan read $scannedAfter vs $scannedBefore before — no win")
    val props = spark.sql("SHOW TBLPROPERTIES idx_t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("graft.index.idx_cust") == "range:o_custkey")
    // multi-column numeric -> Morton layout, recorded as zorder
    Graft.execute(spark,
      "CREATE INDEX idx_2d ON idx_t USING bitmap (o_custkey, o_totalprice)")
    val props2 = spark.sql("SHOW TBLPROPERTIES idx_t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props2("graft.index.idx_2d") == "zorder:o_custkey,o_totalprice")
    // CLUSTER re-runs the recorded index's rewrite (content preserved)
    val preCluster = spark.table("idx_t").orderBy("o_orderkey").collect().toSeq
    Graft.execute(spark, "CLUSTER idx_t USING idx_cust")
    assert(spark.table("idx_t").orderBy("o_orderkey").collect().toSeq
      == preCluster)
    // PG drop form (no ON clause) resolves through the registry
    Graft.execute(spark, "DROP INDEX idx_2d")
    val props3 = spark.sql("SHOW TBLPROPERTIES idx_t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(!props3.contains("graft.index.idx_2d"))
    drop("idx_t")
  }

  test("execute routes UPDATE and DELETE statements through Dml") {
    drop("route_dml")
    spark.range(10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      .write.saveAsTable("route_dml")
    Graft.execute(spark, "UPDATE route_dml SET v = v + 1000 WHERE k % 2 = 0")
    Graft.execute(spark, "DELETE FROM route_dml WHERE k >= 8")
    val rows = spark.table("route_dml").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.size == 8)
    assert(rows(0L) == 1000.0 && rows(1L) == 1.0 && rows(6L) == 1006.0)
    // old-row semantics through the statement form: swap assignment
    Graft.execute(spark, "UPDATE route_dml SET k = k + 100, v = k WHERE k = 7")
    val r7 = spark.table("route_dml").where(col("k") === 107L).head()
    assert(r7.getDouble(1) == 7.0) // v saw the OLD k
    // PG's bare ANALYZE form lands as CBO statistics
    Graft.execute(spark, "ANALYZE route_dml")
    assert(spark.sql("DESCRIBE EXTENDED route_dml k").collect()
      .exists(r => r.getString(0) == "distinct_count" && r.getString(1) != "NULL"))
    drop("route_dml")
  }

  test("statement splitting is quote-aware: commas, '=', WHERE inside literals") {
    drop("route_q")
    spark.range(4).selectExpr("id AS k", "CAST('' AS STRING) AS a",
      "CAST(0 AS BIGINT) AS b", "CAST(concat('w;v', CAST(id AS STRING)) AS STRING) AS c")
      .write.saveAsTable("route_q")
    // a comma and '=' inside a SET literal, a ';' inside the WHERE literal
    Graft.execute(spark,
      "UPDATE route_q SET a = 'x, y = z', b = 2 WHERE c = 'w;v1';")
    val rows = spark.table("route_q").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(rows(1L) == (("x, y = z", 2L)))
    assert(rows(0L) == (("", 0L)) && rows(2L) == (("", 0L)))
    // a WHERE inside a SET literal must not cut the statement early
    Graft.execute(spark,
      "UPDATE route_q SET a = 'no WHERE cut' WHERE k = 3")
    assert(spark.table("route_q").where(col("k") === 3L).head()
      .getString(1) == "no WHERE cut")
    // DELETE with ';' and quotes in the condition literal
    Graft.execute(spark, "DELETE FROM route_q WHERE c = 'w;v0'")
    assert(spark.table("route_q").count() == 3)
    // an unparseable DELETE tail fails loudly instead of deleting all
    intercept[IllegalArgumentException] {
      Graft.execute(spark, "DELETE FROM route_q nonsense tail")
    }
    assert(spark.table("route_q").count() == 3)
    drop("route_q")
  }

  test("compact PG datetime literals: '20081225130000'::timestamp forms") {
    val r = Graft.execute(spark,
      "SELECT '20081225130000'::timestamp AS a, " +
        "'20081225 130000'::timestamp AS b, " +
        "'20110521'::date AS c, date '20110521' AS d, " +
        "timestamp '20081225 130000' AS e").get.head()
    def day(v: Any) = v.toString.replace('T', ' ')
    assert(day(r.get(0)).startsWith("2008-12-25 13:00"))
    assert(day(r.get(1)).startsWith("2008-12-25 13:00"))
    assert(r.get(2).toString == "2011-05-21")
    assert(r.get(3).toString == "2011-05-21")
    assert(day(r.get(4)).startsWith("2008-12-25 13:00"))
  }

  test("execute routes cursor statements: DECLARE, FETCH, CLOSE") {
    Tables.register(spark, TestSpark.sf0001)
    val none = Graft.execute(spark,
      "DECLARE rc CURSOR FOR SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey;")
    assert(none.isEmpty)
    val first = Graft.execute(spark, "FETCH 10 FROM rc").get.collect()
    assert(first.length == 10 && first.head.getInt(0) == 0)
    val second = Graft.execute(spark, "FETCH 10 FROM rc").get.collect()
    assert(second.length == 10 && second.head.getInt(0) == 10)
    val rest = Graft.execute(spark, "FETCH ALL FROM rc").get.collect()
    assert(first.length + second.length + rest.length == 25)
    assert(Graft.execute(spark, "CLOSE rc;").isEmpty)
    intercept[IllegalArgumentException] {
      Graft.execute(spark, "FETCH 1 FROM rc")
    }
    // SCROLL / BINARY / WITHOUT HOLD keywords parse (gram.y
    // cursor_options); behavior stays forward-only
    Graft.execute(spark,
      "DECLARE sc SCROLL CURSOR WITHOUT HOLD FOR " +
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey")
    assert(Graft.execute(spark, "FETCH FORWARD 3 FROM sc").get
      .collect().length == 3)
    Graft.execute(spark, "CLOSE sc")
    // MOVE advances the portal without returning rows
    Graft.execute(spark,
      "DECLARE mv CURSOR FOR SELECT n_nationkey FROM nation ORDER BY n_nationkey")
    assert(Graft.execute(spark, "MOVE 20 FROM mv").isEmpty)
    val afterMove = Graft.execute(spark, "FETCH ALL FROM mv").get.collect()
    assert(afterMove.length == 5 && afterMove.head.getInt(0) == 20)
    Graft.execute(spark, "CLOSE mv")
  }

  test("EXPLAIN ANALYZE routes to instrumented metrics rows") {
    Tables.register(spark, TestSpark.sf0001)
    val m = Graft.execute(spark,
      "EXPLAIN ANALYZE SELECT n_regionkey, count(*) FROM nation GROUP BY 1")
      .get.collect()
    assert(m.nonEmpty)
    val cols = m.head.schema.fieldNames.toSet
    assert(cols.contains("operator") && cols.contains("metric"))
    // the scan's output-rows metric reflects the actual 25 nations
    assert(m.exists(r =>
      r.getAs[String]("metric").toLowerCase.contains("rows") &&
        r.getAs[Long]("value") == 25L),
      m.map(r => (r.getAs[String]("operator"), r.getAs[String]("metric"),
        r.getAs[Long]("value"))).mkString("; "))
    // plain EXPLAIN still falls through to Spark's own
    assert(Graft.execute(spark, "EXPLAIN SELECT 1").nonEmpty)
    // EXPLAIN (FORMAT JSON): [{"Plan": {...}}], machine-parseable
    val j = Graft.execute(spark,
      "EXPLAIN (FORMAT JSON) SELECT n_regionkey, count(*) FROM nation GROUP BY 1")
      .get.head().getString(0)
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(j)
    assert(tree.isArray && tree.get(0).has("Plan"))
    assert(tree.get(0).get("Plan").has("Node Type"))
    // ANALYZE adds runtime metrics to the nodes
    val ja = Graft.execute(spark,
      "EXPLAIN (ANALYZE, FORMAT JSON) SELECT count(*) FROM nation")
      .get.head().getString(0)
    val ta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(ja)
    def anyMetric(n: com.fasterxml.jackson.databind.JsonNode): Boolean = {
      val fields = n.fieldNames()
      var found = false
      while (fields.hasNext && !found) {
        val f = fields.next()
        if (f != "Node Type" && f != "Plans" && n.get(f).isNumber) found = true
      }
      found || (n.has("Plans") && {
        val it = n.get("Plans").elements()
        var f2 = false
        while (it.hasNext && !f2) f2 = anyMetric(it.next())
        f2
      })
    }
    assert(anyMetric(ta.get(0).get("Plan")))
    // text mode unchanged by the JSON path
    assert(Graft.execute(spark, "EXPLAIN (VERBOSE) SELECT 1").nonEmpty)
  }

  test("transaction verbs: BEGIN/COMMIT, live ROLLBACK, LOCK checks") {
    operators.Txn.reset(spark)
    drop("txn_t")
    spark.range(3).write.saveAsTable("txn_t")
    assert(Graft.execute(spark, "BEGIN;").isEmpty)
    assert(Graft.execute(spark, "START TRANSACTION").isEmpty) // nested: WARN
    Graft.execute(spark, "LOCK TABLE txn_t IN ACCESS EXCLUSIVE MODE")
    Graft.execute(spark, "DELETE FROM txn_t WHERE id = 0")
    assert(Graft.execute(spark, "COMMIT").isEmpty)
    assert(spark.table("txn_t").count() == 2)
    // ROLLBACK outside a transaction: accepted no-op (PG warns)
    assert(Graft.execute(spark, "ROLLBACK").isEmpty)
    // a real scope restores the deleted row (operators.Txn)
    Graft.execute(spark, "BEGIN")
    Graft.execute(spark, "DELETE FROM txn_t WHERE id = 1")
    assert(spark.table("txn_t").count() == 1)
    Graft.execute(spark, "ROLLBACK")
    assert(spark.table("txn_t").count() == 2)
    // SAVEPOINT stays a loud unsupported error
    intercept[UnsupportedOperationException] {
      Graft.execute(spark, "SAVEPOINT sp1")
    }
    intercept[Exception] { // LOCK on a missing table is a real error
      Graft.execute(spark, "LOCK TABLE no_such_table")
    }
    drop("txn_t")
  }

  test("execute routes PREPARE / EXECUTE / DEALLOCATE with \\$n substitution") {
    Tables.register(spark, TestSpark.sf0001)
    assert(Graft.execute(spark,
      "PREPARE topn (int) AS SELECT n_nationkey, n_name FROM nation " +
        "WHERE n_nationkey < $1 ORDER BY n_nationkey;").isEmpty)
    val r = Graft.execute(spark, "EXECUTE topn(3)").get.collect()
    assert(r.length == 3 && r.head.getInt(0) == 0)
    // a '$1' inside a string literal is data, not a parameter
    Graft.execute(spark,
      "PREPARE lit AS SELECT '$1 costs' AS s, $1 + 1 AS v")
    val l = Graft.execute(spark, "EXECUTE lit(41)").get.head()
    assert(l.getString(0) == "$1 costs" && l.getInt(1) == 42)
    // duplicate PREPARE fails; DEALLOCATE frees the name
    intercept[IllegalArgumentException] {
      Graft.execute(spark, "PREPARE topn AS SELECT 1")
    }
    Graft.execute(spark, "DEALLOCATE topn")
    intercept[IllegalArgumentException] {
      Graft.execute(spark, "EXECUTE topn(3)")
    }
    // a prepared DML statement routes through its own subsystem
    drop("prep_dml")
    spark.range(5).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      .write.saveAsTable("prep_dml")
    Graft.execute(spark, "PREPARE bump AS UPDATE prep_dml SET v = v + $1 WHERE k = $2")
    Graft.execute(spark, "EXECUTE bump(100, 3)")
    assert(spark.table("prep_dml").where(col("k") === 3L).head().getDouble(1) == 103.0)
    Graft.execute(spark, "DEALLOCATE ALL")
    drop("prep_dml")
  }

  test("execute routes SET / SHOW / RESET / TRUNCATE") {
    // PG spellings land in the session conf; SHOW returns PG's shape
    Graft.execute(spark, "SET application_name TO 'graft_test';")
    val shown = Graft.execute(spark, "SHOW application_name").get.head()
    assert(shown.getString(0) == "graft_test")
    Graft.execute(spark, "SET application_name = other")
    assert(Graft.execute(spark, "SHOW application_name").get.head()
      .getString(0) == "other")
    Graft.execute(spark, "RESET application_name")
    intercept[IllegalArgumentException] {
      Graft.execute(spark, "SHOW application_name")
    }
    // the mapped GUC actually changes engine behavior
    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    try {
      Graft.execute(spark, "SET TIME ZONE 'America/New_York'")
      assert(spark.conf.get("spark.sql.session.timeZone") == "America/New_York")
      assert(Graft.execute(spark, "SHOW timezone").get.head()
        .getString(0) == "America/New_York")
    } finally spark.conf.set("spark.sql.session.timeZone", tzBefore)
    // Spark's own SHOW forms still fall through the router
    assert(Graft.execute(spark, "SHOW TABLES").nonEmpty)
    // PG's bare TRUNCATE (no TABLE keyword), incl. a two-table list
    drop("tr_a", "tr_b")
    spark.range(4).write.saveAsTable("tr_a")
    spark.range(4).write.saveAsTable("tr_b")
    Graft.execute(spark, "TRUNCATE tr_a, tr_b")
    assert(spark.table("tr_a").count() == 0 && spark.table("tr_b").count() == 0)
    drop("tr_a", "tr_b")
  }

  test("COPY FROM/TO PROGRAM pipes through shell commands") {
    drop("cp_prog")
    spark.sql("CREATE TABLE cp_prog (k BIGINT, tag STRING) USING parquet")
    Graft.execute(spark,
      "COPY cp_prog FROM PROGRAM 'seq 0 9 | while read i; do echo \"$i,t$((i % 2))\"; done'")
    val rows = spark.table("cp_prog").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size == 10 && rows(3L) == "t1" && rows(8L) == "t0")
    // a malformed line fails the load (PG COPY default: no reject limit)
    intercept[graft.operators.Sreh.RejectLimitExceeded] {
      Graft.execute(spark, "COPY cp_prog FROM PROGRAM 'echo oops'")
    }
    // TO PROGRAM: rows stream into the command's stdin
    val outF = new java.io.File("target/cp_prog_out.txt").getAbsoluteFile
    if (outF.exists()) outF.delete()
    Graft.execute(spark,
      s"COPY (SELECT k, tag FROM cp_prog WHERE k < 3) TO PROGRAM 'sort > $outF'")
    val got = scala.io.Source.fromFile(outF, "UTF-8").getLines().toSeq
    assert(got == Seq("0,t0", "1,t1", "2,t0"))
    // a failing program fails the statement loudly (nonzero exit, or a
    // broken pipe when it quits mid-stream)
    intercept[Exception] {
      Graft.execute(spark, "COPY cp_prog TO PROGRAM 'exit 3'")
    }
    drop("cp_prog")
  }

  test("VACUUM ANALYZE runs both halves; bare VACUUM is rejected") {
    drop("vac_an")
    spark.range(50).selectExpr("id AS k", "CAST(id % 5 AS BIGINT) AS g")
      .repartition(8).write.saveAsTable("vac_an")
    def files() = new java.io.File("target/test-warehouse/vac_an")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files() == 8)
    Graft.execute(spark, "VACUUM ANALYZE vac_an")
    assert(files() == 1) // compacted
    assert(spark.sql("DESCRIBE EXTENDED vac_an g").collect() // and analyzed
      .exists(r => r.getString(0) == "distinct_count" && r.getString(1) != "NULL"))
    intercept[IllegalArgumentException] { Graft.execute(spark, "VACUUM") }
    intercept[IllegalArgumentException] { Graft.execute(spark, "VACUUM ANALYZE") }
    drop("vac_an")
  }

  test("VACUUM compacts small files, content identical, both layouts") {
    Tables.register(spark, TestSpark.sf0001)
    drop("vac_flat", "vac_part")
    // unpartitioned: 16 tiny files -> bin-packed
    spark.table("orders").select("o_orderkey", "o_totalprice")
      .repartition(16).write.saveAsTable("vac_flat")
    def files(n: String) = new java.io.File(s"target/test-warehouse/$n")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val before = spark.table("vac_flat").orderBy("o_orderkey").collect().toSeq
    assert(files("vac_flat") == 16)
    val n = graft.operators.Dml.vacuum(spark, "vac_flat")
    assert(n == before.length)
    assert(files("vac_flat") == 1) // well under the 128MB target
    assert(spark.table("vac_flat").orderBy("o_orderkey").collect().toSeq == before)
    // partitioned: one file per partition value after vacuum
    spark.table("orders")
      .select(col("o_orderkey"), col("o_orderstatus").as("p"))
      .repartition(8).write.partitionBy("p").saveAsTable("vac_part")
    val pBefore = spark.table("vac_part").orderBy("o_orderkey").collect().toSeq
    Graft.execute(spark, "VACUUM FULL vac_part") // routed statement form
    val pDirs = new java.io.File("target/test-warehouse/vac_part")
      .listFiles().filter(_.getName.startsWith("p="))
    assert(pDirs.nonEmpty)
    pDirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"${d.getName} not compacted to one file")
    }
    assert(spark.table("vac_part").orderBy("o_orderkey").collect().toSeq == pBefore)
    drop("vac_flat", "vac_part")
  }

  test("execute routes DDL, partition DDL, DML, COPY, and queries") {
    Tables.register(spark, TestSpark.sf0001)
    drop("route_t", "route_mv")
    // CREATE TABLE with Greengage physical-design clauses
    Graft.execute(spark,
      """CREATE TABLE route_t (k bigint, v double precision, p text)
        |DISTRIBUTED RANDOMLY PARTITION BY LIST (p)""".stripMargin)
    spark.range(20).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v",
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS p")
      .write.mode("append").insertInto("route_t")
    // partition maintenance routed to alterPartition
    Graft.execute(spark, "ALTER TABLE route_t TRUNCATE PARTITION FOR ('b')")
    assert(spark.table("route_t").count() == 10)
    // plain ALTER routed to alter
    Graft.execute(spark, "ALTER TABLE route_t ADD COLUMN note text")
    assert(spark.table("route_t").columns.contains("note"))
    // COPY TO / COPY FROM roundtrip
    val dir = java.nio.file.Files.createTempDirectory("graft_copy").toString
    Graft.execute(spark,
      s"COPY (SELECT k, v FROM route_t) TO '$dir/out' " +
        "WITH (HEADER, DELIMITER '|')")
    drop("route_copy")
    spark.sql("CREATE TABLE route_copy (k BIGINT, v DOUBLE) USING parquet")
    Graft.execute(spark,
      s"COPY route_copy FROM '$dir/out' WITH (HEADER, DELIMITER '|')")
    assert(spark.table("route_copy").count() == 10)
    // a query with PG-isms returns a DataFrame
    val q = Graft.execute(spark,
      "SELECT count(*)::int8 AS n FROM route_copy WHERE 'x' !~ 'z'")
    assert(q.get.head().getLong(0) == 10L)
    // matview + refresh
    Graft.execute(spark,
      "CREATE MATERIALIZED VIEW route_mv AS SELECT count(*) AS n FROM route_copy " +
        "DISTRIBUTED RANDOMLY")
    assert(spark.table("route_mv").head().getLong(0) == 10L)
    spark.table("route_copy").limit(5).write.mode("append")
      .insertInto("route_copy")
    Graft.execute(spark, "REFRESH MATERIALIZED VIEW route_mv")
    assert(spark.table("route_mv").head().getLong(0) == 15L)
    drop("route_t", "route_mv", "route_copy")
  }

  test("CREATE EXTERNAL TABLE: file://, gpfdist://, EXECUTE; writable INSERT routing") {
    import graft.operators.Sreh
    import graft.sources.FileDistServer
    val dir = new java.io.File("target/test-exttab")
    dir.mkdirs()
    // file:// readable, CSV options, LOG ERRORS + reject limit
    val f = new java.io.File(dir, "in.csv")
    val w = new java.io.PrintWriter(f, "UTF-8")
    try {
      w.println("1|a"); w.println("garbage"); w.println("2|b"); w.println("3|c")
    } finally w.close()
    Graft.execute(spark,
      s"""CREATE EXTERNAL TABLE ext_file (k int, tag text)
         |LOCATION ('file://localhost${f.getAbsolutePath}')
         |FORMAT 'CSV' (DELIMITER '|' NULL '')
         |LOG ERRORS SEGMENT REJECT LIMIT 2 ROWS;""".stripMargin)
    assert(spark.sql("SELECT SUM(k) FROM ext_file").head().getLong(0) == 6L)
    assert(spark.table("ext_file_errors").count() == 1)
    // without SEGMENT REJECT LIMIT one bad row fails the load (PG default)
    intercept[Sreh.RejectLimitExceeded] {
      Graft.execute(spark,
        s"""CREATE EXTERNAL TABLE ext_strict (k int, tag text)
           |LOCATION ('file://localhost${f.getAbsolutePath}')
           |FORMAT 'CSV' (DELIMITER '|')""".stripMargin)
    }
    // gpfdist:// readable (gpfdist speaks http; served per-segment slices)
    val g = new java.io.File(dir, "dist.txt")
    val wg = new java.io.PrintWriter(g, "UTF-8")
    try (0 until 12).foreach(i => wg.println(s"$i|t${i % 3}"))
    finally wg.close()
    FileDistServer.withServer(dir.getAbsolutePath) { srv =>
      val gpfdist = srv.url("dist.txt").replace("http://", "gpfdist://")
      Graft.execute(spark,
        s"""CREATE EXTERNAL TABLE ext_web (k int, tag text)
           |LOCATION ('$gpfdist') FORMAT 'TEXT' (DELIMITER '|')""".stripMargin)
      assert(spark.sql("SELECT SUM(k) FROM ext_web").head().getLong(0) == 66L)
      // WRITABLE + gpfdist → INSERT routes each partition as one POST
      Graft.execute(spark,
        s"""CREATE WRITABLE EXTERNAL TABLE ext_out (k int, tag text)
           |LOCATION ('${srv.url("out.txt").replace("http://", "gpfdist://")}')
           |FORMAT 'TEXT' (DELIMITER '|')""".stripMargin)
      Graft.execute(spark,
        "INSERT INTO ext_out SELECT k, tag FROM ext_web WHERE k < 3")
      val posted = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "out.txt").toPath), "UTF-8")
      assert(posted.split("\n").toSet == Set("0|t0", "1|t1", "2|t2"))
    }
    // EXECUTE readable: the command runs once per declared segment
    Graft.execute(spark,
      """CREATE EXTERNAL WEB TABLE ext_exec (i bigint)
        |EXECUTE 'seq 0 9' ON 2 FORMAT 'TEXT'""".stripMargin)
    assert(spark.sql("SELECT COUNT(*) AS n, SUM(i) AS s FROM ext_exec")
      .head().toSeq == Seq(20L, 90L))
    // WRITABLE EXECUTE: rows stream to the program's stdin
    val sink = new java.io.File(dir, "prog_out.txt").getAbsolutePath
    Graft.execute(spark,
      s"""CREATE WRITABLE EXTERNAL TABLE ext_prog (k int)
         |EXECUTE 'cat > $sink' FORMAT 'TEXT'""".stripMargin)
    Graft.execute(spark, "INSERT INTO ext_prog VALUES (7), (8)")
    val piped = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(sink)), "UTF-8")
    assert(piped.split("\n").toSet == Set("7", "8"))
    // DROP EXTERNAL TABLE unregisters both sides
    Graft.execute(spark, "DROP EXTERNAL TABLE ext_file")
    assert(!spark.catalog.tableExists("ext_file"))
    Graft.execute(spark, "DROP EXTERNAL TABLE ext_prog")
    intercept[IllegalArgumentException] {
      graft.operators.ExternalTable.insertInto(spark, "ext_prog",
        spark.sql("VALUES (1)"))
    }
  }

  test("CREATE EXTERNAL TABLE s3://: gpcloud config translation over a mock FS") {
    import graft.sources.{CloudLocation, LocalSchemeFileSystem}
    val dir = new java.io.File("target/test-s3ext").getAbsoluteFile
    dir.mkdirs()
    val data = new java.io.File(dir, "part1.csv")
    val w = new java.io.PrintWriter(data, "UTF-8")
    try { w.println("1|a"); w.println("garbage"); w.println("2|b"); w.println("3|c") }
    finally w.close()
    val conf = new java.io.File(dir, "s3.conf")
    val wc = new java.io.PrintWriter(conf, "UTF-8")
    try wc.print(
      """# gpcloud-style config (s3conf.cpp keys)
        |[default]
        |accessid = AKTESTID
        |secret = SECRETTEST
        |threadnum = 6
        |chunksize = 671088640
        |encryption = false
        |proxy = http://squid.local:3128
        |[other]
        |accessid = WRONGSECTION
        |""".stripMargin)
    finally wc.close()
    // no-network stand-in: s3a://bucket/<abs-path> resolves locally
    // through the full Hadoop FileSystem + file-source machinery
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.impl", classOf[LocalSchemeFileSystem].getName)
    // hadoop maps scheme s3a to the S3A committer factory by default;
    // the mock writes through the plain file committer
    hc.set("mapreduce.outputcommitter.factory.scheme.s3a", "")
    Graft.execute(spark,
      s"""CREATE EXTERNAL TABLE ext_s3 (k int, tag text)
         |LOCATION ('s3://s3-us-east-1.amazonaws.com/testbucket${data.getAbsolutePath}
         |  config=${conf.getAbsolutePath} region=us-east-1 section=default')
         |FORMAT 'CSV' (DELIMITER '|')
         |LOG ERRORS SEGMENT REJECT LIMIT 2 ROWS""".stripMargin)
    assert(spark.sql("SELECT SUM(k) FROM ext_s3").head().getLong(0) == 6L)
    assert(spark.table("ext_s3_errors").count() == 1)
    // every gpcloud option landed as its fs.s3a.* twin
    assert(hc.get("fs.s3a.access.key") == "AKTESTID")
    assert(hc.get("fs.s3a.secret.key") == "SECRETTEST")
    assert(hc.get("fs.s3a.endpoint") == "s3-us-east-1.amazonaws.com")
    assert(hc.get("fs.s3a.endpoint.region") == "us-east-1")
    assert(hc.get("fs.s3a.connection.ssl.enabled") == "false")
    assert(hc.get("fs.s3a.threads.max") == "6")
    assert(hc.get("fs.s3a.multipart.size") == "671088640")
    assert(hc.get("fs.s3a.proxy.host") == "squid.local")
    assert(hc.get("fs.s3a.proxy.port") == "3128")
    // per-bucket namespace too, so a second table's config can't
    // clobber this one's credentials
    assert(hc.get("fs.s3a.bucket.testbucket.access.key") == "AKTESTID")
    assert(hc.get("fs.s3a.bucket.testbucket.secret.key") == "SECRETTEST")
    // WRITABLE s3 table: INSERT streams through the same FS layer
    val outDir = new java.io.File(dir, "out")
    Graft.execute(spark,
      s"""CREATE WRITABLE EXTERNAL TABLE ext_s3_out (k int, tag text)
         |LOCATION ('s3://s3-us-east-1.amazonaws.com/testbucket${outDir.getAbsolutePath}')
         |FORMAT 'CSV' (DELIMITER '|')""".stripMargin)
    Graft.execute(spark, "INSERT INTO ext_s3_out SELECT k, tag FROM ext_s3 WHERE k < 3")
    val written = Option(outDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".csv"))
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines()).toSet
    assert(written == Set("1|a", "2|b"))
    // native Hadoop scheme passes through untranslated
    hc.set("fs.gs.impl", classOf[LocalSchemeFileSystem].getName)
    Graft.execute(spark,
      s"""CREATE EXTERNAL TABLE ext_gs (k int, tag text)
         |LOCATION ('gs://testbucket${data.getAbsolutePath}')
         |FORMAT 'CSV' (DELIMITER '|') SEGMENT REJECT LIMIT 2 ROWS""".stripMargin)
    assert(spark.sql("SELECT SUM(k) FROM ext_gs").head().getLong(0) == 6L)
    // translate() itself: bucket/prefix split and section selection
    val r = CloudLocation.translate(
      s"s3://edge.example.com:9000/bkt/pre/fix config=${conf.getAbsolutePath} section=other")
    assert(r.path == "s3a://bkt/pre/fix")
    assert(r.settings("fs.s3a.endpoint") == "edge.example.com:9000")
    assert(r.settings("fs.s3a.access.key") == "WRONGSECTION")
    assert(!r.settings.contains("fs.s3a.secret.key"))
    Graft.execute(spark, "DROP EXTERNAL TABLE ext_s3")
    Graft.execute(spark, "DROP EXTERNAL TABLE ext_gs")
    Graft.execute(spark, "DROP EXTERNAL TABLE ext_s3_out")
  }

  test("FORMAT 'CUSTOM' fixedwidth: trim, null token, rejects, preserve, write") {
    val dir = new java.io.File("target/test-fixedwidth").getAbsoluteFile
    dir.mkdirs()
    val f = new java.io.File(dir, "fw.txt")
    // layout: id 4 | name 8 | amt 6 (total 18)
    def line(id: String, name: String, amt: String) =
      id.padTo(4, ' ') + name.padTo(8, ' ') + amt.padTo(6, ' ')
    val rows = Seq(
      line("1", "alpha", "100"),
      line("2", "beta", "NA"),      // null token
      line("3", "gamma", "xx"),     // conversion failure → reject
      "shortline",                   // wrong length → reject
      line("4", "delta  x", "400")) // trailing-blank-significant name
    java.nio.file.Files.write(f.toPath, rows.mkString("\n").getBytes)
    Graft.execute(spark,
      s"""CREATE EXTERNAL TABLE ext_fw (id int, name text, amt bigint)
         |LOCATION ('file://localhost${f.getAbsolutePath}')
         |FORMAT 'CUSTOM' (formatter=fixedwidth_in, id='4', name='8',
         |  amt='6', null='NA')
         |LOG ERRORS SEGMENT REJECT LIMIT 5 ROWS""".stripMargin)
    val got = spark.sql("SELECT id, name, amt FROM ext_fw ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq == Seq((1, "alpha", 100L), (2, "beta", -1L),
      (4, "delta  x", 400L)))
    assert(spark.table("ext_fw_errors").count() == 2)
    // preserve_blanks='on' keeps each field's trailing blanks
    Graft.execute(spark,
      s"""CREATE EXTERNAL TABLE ext_fwp (id text, name text, amt text)
         |LOCATION ('file://localhost${f.getAbsolutePath}')
         |FORMAT 'CUSTOM' (formatter=fixedwidth_in, id='4', name='8',
         |  amt='6', preserve_blanks='on')
         |SEGMENT REJECT LIMIT 5 ROWS""".stripMargin)
    val p = spark.sql("SELECT name FROM ext_fwp WHERE id = '1   '")
      .head().getString(0)
    assert(p == "alpha   ")
    // fixedwidth_out: write side pads back to the declared widths
    val outDir = new java.io.File(dir, "out")
    Graft.execute(spark,
      s"""CREATE WRITABLE EXTERNAL TABLE ext_fw_out (id int, name text, amt bigint)
         |LOCATION ('file://localhost${outDir.getAbsolutePath}')
         |FORMAT 'CUSTOM' (formatter=fixedwidth_out, id='4', name='8',
         |  amt='6', null='NA')""".stripMargin)
    Graft.execute(spark,
      "INSERT INTO ext_fw_out SELECT id, name, amt FROM ext_fw WHERE id <= 2")
    val written = Option(outDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".txt"))
      .flatMap(o => scala.io.Source.fromFile(o, "UTF-8").getLines()).toSet
    assert(written == Set(line("1", "alpha", "100"), line("2", "beta", "NA")))
    Graft.execute(spark, "DROP EXTERNAL TABLE ext_fw")
    Graft.execute(spark, "DROP EXTERNAL TABLE ext_fwp")
    Graft.execute(spark, "DROP EXTERNAL TABLE ext_fw_out")
  }

  test("CREATE TYPE/DOMAIN: pg_dump replay with enum + domain enforcement") {
    drop("tickets")
    // the exact statement sequence a restored dump emits
    Seq(
      "CREATE TYPE status AS ENUM ('new', 'open', 'closed');",
      "CREATE TYPE addr AS (street text, zip int);",
      "CREATE DOMAIN posint AS int CHECK (VALUE > 0);",
      "COMMENT ON TYPE status IS 'ticket states';",
      "ALTER TYPE status OWNER TO admin;",
      "CREATE TABLE tickets (id int, st status NOT NULL, qty posint, loc addr);",
      "INSERT INTO tickets VALUES (1, 'new', 5, named_struct('street', 'a', 'zip', 7)), (2, 'open', 2, NULL);")
      .foreach(s => Graft.execute(spark, s))
    assert(spark.sql("SELECT COUNT(*), SUM(qty) FROM tickets").head().toSeq
      == Seq(2L, 7L))
    assert(spark.sql("SELECT loc.zip FROM tickets WHERE id = 1")
      .head().getInt(0) == 7)
    // invalid enum label → rejected BEFORE any write
    intercept[IllegalArgumentException](Graft.execute(spark,
      "INSERT INTO tickets VALUES (3, 'bogus', 1, NULL)"))
    // domain CHECK (VALUE > 0) enforced
    intercept[IllegalArgumentException](Graft.execute(spark,
      "INSERT INTO tickets VALUES (3, 'new', -4, NULL)"))
    assert(spark.sql("SELECT COUNT(*) FROM tickets").head().getLong(0) == 2L)
    // ALTER TYPE ADD VALUE unlocks the new label
    Graft.execute(spark, "ALTER TYPE status ADD VALUE 'wontfix' AFTER 'open'")
    Graft.execute(spark, "INSERT INTO tickets VALUES (3, 'wontfix', 1, NULL)")
    // explicit (reordered) column list maps the check to the right slot
    Graft.execute(spark, "INSERT INTO tickets (st, id) VALUES ('closed', 9)")
    intercept[IllegalArgumentException](Graft.execute(spark,
      "INSERT INTO tickets (st, id) VALUES ('nope', 10)"))
    assert(spark.sql("SELECT COUNT(*) FROM tickets").head().getLong(0) == 4L)
    // COPY FROM runs the same input checks (no struct col in csv)
    drop("tstat")
    Graft.execute(spark, "CREATE TABLE tstat (id int, st status)")
    val dir = new java.io.File("target/test-pgtypes"); dir.mkdirs()
    val good = new java.io.File(dir, "good.csv")
    java.nio.file.Files.write(good.toPath, "1,new\n2,closed\n".getBytes)
    Graft.execute(spark, s"COPY tstat FROM '${good.getAbsolutePath}'")
    assert(spark.sql("SELECT COUNT(*) FROM tstat").head().getLong(0) == 2L)
    val bad = new java.io.File(dir, "bad.csv")
    java.nio.file.Files.write(bad.toPath, "3,invalid_label\n".getBytes)
    intercept[IllegalArgumentException](Graft.execute(spark,
      s"COPY tstat FROM '${bad.getAbsolutePath}'"))
    assert(spark.sql("SELECT COUNT(*) FROM tstat").head().getLong(0) == 2L)
    // DROP TYPE unregisters; a later CREATE TYPE may reuse the name
    Graft.execute(spark, "DROP TYPE IF EXISTS status CASCADE")
    Graft.execute(spark, "DROP TYPE addr")
    Graft.execute(spark, "DROP DOMAIN posint")
    Graft.execute(spark, "CREATE TYPE status AS ENUM ('a')")
    Graft.execute(spark, "DROP TYPE status")
    drop("tickets"); drop("tstat")
  }

  test("text search dictionaries: dict_int, dict_xsyn, synonym vectors") {
    Tables.register(spark, TestSpark.sf0001)
    def lex(dict: String, token: String): Option[Seq[String]] = {
      val r = spark.sql(s"SELECT ts_lexize('$dict', '$token')").head()
      if (r.isNullAt(0)) None else Some(r.getSeq[String](0).toSeq)
    }
    // dict_int defaults: maxlen 6, trim (contrib/dict_int expected)
    assert(lex("intdict", "511673") == Some(Seq("511673")))
    assert(lex("intdict", "40865854") == Some(Seq("408658")))
    assert(lex("intdict", "09810106") == Some(Seq("098101")))
    assert(lex("intdict", "641439323669") == Some(Seq("641439")))
    // ALTER: shrink + reject
    Graft.execute(spark,
      "ALTER TEXT SEARCH DICTIONARY intdict (MAXLEN = 4, REJECTLONG = true)")
    assert(lex("intdict", "7778") == Some(Seq("7778")))
    assert(lex("intdict", "511673") == Some(Seq())) // recognized, discarded
    intercept[IllegalArgumentException](Graft.execute(spark,
      "ALTER TEXT SEARCH DICTIONARY intdict (MAXLEN = -214783648)"))
    Graft.execute(spark,
      "ALTER TEXT SEARCH DICTIONARY intdict (MAXLEN = 6, REJECTLONG = false)")
    // dict_xsyn: the sample rules file + all four option axes
    val dir = new java.io.File("target/test-tsdict"); dir.mkdirs()
    val rules = new java.io.File(dir, "xsyn_sample.rules")
    java.nio.file.Files.write(rules.toPath,
      "# sample rules\nsupernova sn sne 1987a\n".getBytes)
    def alterXsyn(o: String): Unit = Graft.execute(spark,
      s"ALTER TEXT SEARCH DICTIONARY xsyn (RULES='${rules.getAbsolutePath}', $o)")
    alterXsyn("KEEPORIG=true, MATCHORIG=true, KEEPSYNONYMS=true, MATCHSYNONYMS=false")
    assert(lex("xsyn", "supernova") == Some(Seq("supernova", "sn", "sne", "1987a")))
    assert(lex("xsyn", "sn").isEmpty && lex("xsyn", "grb").isEmpty)
    alterXsyn("KEEPORIG=false, MATCHORIG=true, KEEPSYNONYMS=true, MATCHSYNONYMS=false")
    assert(lex("xsyn", "supernova") == Some(Seq("sn", "sne", "1987a")))
    alterXsyn("KEEPORIG=true, MATCHORIG=true, KEEPSYNONYMS=true, MATCHSYNONYMS=true")
    assert(lex("xsyn", "sn") == Some(Seq("supernova", "sn", "sne", "1987a")))
    alterXsyn("KEEPORIG=false, MATCHORIG=true, KEEPSYNONYMS=true, MATCHSYNONYMS=true")
    assert(lex("xsyn", "sn") == Some(Seq("sn", "sne", "1987a")))
    alterXsyn("KEEPORIG=true, MATCHORIG=false, KEEPSYNONYMS=true, MATCHSYNONYMS=true")
    assert(lex("xsyn", "supernova").isEmpty) // orig no longer matches
    assert(lex("xsyn", "sne") == Some(Seq("supernova", "sn", "sne", "1987a")))
    // CREATE via template
    Graft.execute(spark,
      "CREATE TEXT SEARCH DICTIONARY shortnum (TEMPLATE = intdict_template, MAXLEN = 3)")
    assert(lex("shortnum", "12345") == Some(Seq("123")))
    // core synonym template: word → single synonym, case-insensitive
    val syn = new java.io.File(dir, "pg.syn")
    java.nio.file.Files.write(syn.toPath,
      "postgres pgsql\npostgresql pgsql\n".getBytes)
    Graft.execute(spark,
      s"CREATE TEXT SEARCH DICTIONARY pgdict (TEMPLATE = synonym, SYNONYMS = '${syn.getAbsolutePath}')")
    assert(lex("pgdict", "PostgreSQL") == Some(Seq("pgsql")))
    assert(lex("pgdict", "other").isEmpty)
    // built-in stem dictionaries respond to ts_lexize too
    assert(lex("english_stem", "stars") == Some(Seq("star")))
    assert(lex("simple", "Stars") == Some(Seq("stars")))
    // unknown dictionary is an error, configuration DDL is a no-op
    intercept[Exception](spark.sql("SELECT ts_lexize('nodict', 'x')").collect())
    Graft.execute(spark, "CREATE TEXT SEARCH CONFIGURATION mycfg (COPY = pg_catalog.english)")
    Graft.execute(spark, "DROP TEXT SEARCH DICTIONARY shortnum")
    Graft.execute(spark, "DROP TEXT SEARCH DICTIONARY pgdict")
  }

  test("thesaurus dictionary: longest match, '?' wildcard, '*' as-is (dict_thesaurus.c)") {
    val dir = new java.io.File("target/test-tsdict"); dir.mkdirs()
    val ths = new java.io.File(dir, "sample.ths")
    // the reference's thesaurus_sample.ths, verbatim semantics
    java.nio.file.Files.write(ths.toPath,
      ("one two three : *123\none two : *12\none : *1\ntwo : *2\n" +
        "supernovae stars : *sn\nsupernovae : *sn\n" +
        "booking tickets : order invitation cards\n" +
        "booking ? tickets : order invitation Cards\n").getBytes)
    Graft.execute(spark, "DROP TEXT SEARCH DICTIONARY IF EXISTS thes")
    Graft.execute(spark,
      s"CREATE TEXT SEARCH DICTIONARY thes (TEMPLATE = thesaurus, " +
        s"DictFile = '${ths.getAbsolutePath}', Dictionary = english_stem)")
    // ts_lexize single-token probe (tsdicts.out: {1})
    val one = spark.sql("SELECT ts_lexize('thes', 'one')").head()
    assert(one.getSeq[String](0).toSeq == Seq("1"))
    assert(spark.sql("SELECT ts_lexize('thes', 'booking')").head().isNullAt(0))
    def apply(words: String*): Seq[String] =
      spark.sql(s"SELECT ts_thesaurus_apply('thes', array(${
        words.map(w => s"'$w'").mkString(",")}))").head().getSeq[String](0).toSeq
    // longest match beats shorter prefixes (one two three > one two > one)
    assert(apply("one", "two", "one", "two", "three", "one") ==
      Seq("12", "123", "1"))
    // sample + input both normalize through the subdictionary
    // (Supernovae star ~ supernovae stars), stopwords drop, unmatched stem
    assert(apply("Supernovae", "star", "is", "very", "new", "star") ==
      Seq("sn", "new", "star"))
    // '?' matches exactly one stopword; '*'-less substitutes are stemmed
    assert(apply("booking", "a", "tickets") == Seq("order", "invit", "card"))
    assert(apply("booking", "tickets") == Seq("order", "invit", "card"))
    // '?' does NOT match a non-stopword (no bare "booking xyz tickets" rule)
    assert(apply("booking", "xyz", "tickets") == Seq("book", "xyz", "ticket"))
    // non-thesaurus dictionary through the apply function errors
    intercept[Exception](
      spark.sql("SELECT ts_thesaurus_apply('simple', array('x'))").collect())
    Graft.execute(spark, "DROP TEXT SEARCH DICTIONARY thes")
  }

  test("ispell dictionary: affix stripping + compound splitting (spell.c)") {
    val dir = new java.io.File("target/test-tsdict"); dir.mkdirs()
    // the reference's ispell_sample.{dict,affix} + hunspell_sample.affix
    // grammar, expected lexemes pinned from its tsdicts regress output
    val dict = new java.io.File(dir, "sample.dict")
    java.nio.file.Files.write(dict.toPath,
      ("book/GJUS\nbooking/SB\nfootballklubber\nfoot/ZS\nfootball/Z\n" +
        "ball/SZ\\\nklubber/Z\nsky/A\n").getBytes)
    val iaff = new java.io.File(dir, "sample.affix")
    java.nio.file.Files.write(iaff.toPath,
      ("compoundwords controlled Z\n\nprefixes\n\n" +
        "flag *B:\n\t.       >   RE\n\nflag U:\n    .       >   UN\n\n" +
        "suffixes\n\n" +
        "flag *J:\n\t[^E]    >   INGS\n\n" +
        "flag *G:\n\t[^E]    >   ING\n\n" +
        "flag *S:\n\t[^SXZHY]    >   S\n\n" +
        "flag *A:\n\t[^AEIOU]Y   >   -Y,IES\n\n" +
        "flag ~\\\\:\n\t[^Y]        >   Y\n").getBytes)
    val haff = new java.io.File(dir, "sample_hun.affix")
    java.nio.file.Files.write(haff.toPath,
      ("COMPOUNDFLAG Z\nONLYINCOMPOUND L\n\n" +
        "PFX B Y 1\nPFX B   0\tre\t.\n\nPFX U N 1\nPFX U   0\tun\t.\n\n" +
        "SFX J Y 1\nSFX J   0\tINGS\t[^E]\n\nSFX G Y 1\nSFX G   0\tING\t\t[^E]\n\n" +
        "SFX S Y 1\nSFX S   0\tS\t[^SXZHY]\n\nSFX A Y 1\nSFX A   Y\tIES\t[^AEIOU]Y\n\n" +
        "SFX \\ N 1\nSFX \\   0\tY/L\t[^Y]\n").getBytes)
    for ((name, aff) <- Seq(("isp", iaff), ("hunsp", haff))) {
      Graft.execute(spark, s"DROP TEXT SEARCH DICTIONARY IF EXISTS $name")
      Graft.execute(spark,
        s"CREATE TEXT SEARCH DICTIONARY $name (TEMPLATE = ispell, " +
          s"DictFile = '${dict.getAbsolutePath}', " +
          s"AffFile = '${aff.getAbsolutePath}')")
      def lex(w: String): Option[Seq[String]] = {
        val r = spark.sql(s"SELECT ts_lexize('$name', '$w')").head()
        if (r.isNullAt(0)) None else Some(r.getSeq[String](0).toSeq)
      }
      // pinned from the reference's tsdicts.out (identical for both
      // affix formats over the shared sample dict)
      assert(lex("skies") == Some(Seq("sky")), name)
      assert(lex("bookings") == Some(Seq("booking", "book")), name)
      assert(lex("booking") == Some(Seq("booking", "book")), name)
      assert(lex("foot") == Some(Seq("foot")), name)
      assert(lex("foots") == Some(Seq("foot")), name)
      assert(lex("rebookings") == Some(Seq("booking", "book")), name)
      assert(lex("rebooking") == Some(Seq("booking", "book")), name)
      assert(lex("rebook") == None, name)
      assert(lex("unbookings") == Some(Seq("book")), name)
      assert(lex("unbooking") == Some(Seq("book")), name)
      assert(lex("unbook") == Some(Seq("book")), name)
      assert(lex("footklubber") == Some(Seq("foot", "klubber")), name)
      assert(lex("footballklubber") == Some(Seq(
        "footballklubber", "foot", "ball", "klubber", "football",
        "klubber")), name)
      assert(lex("ballyklubber") == Some(Seq("ball", "klubber")), name)
      assert(lex("footballyklubber") ==
        Some(Seq("foot", "ball", "klubber")), name)
      Graft.execute(spark, s"DROP TEXT SEARCH DICTIONARY $name")
    }
  }

  test("quantified comparisons ANY/SOME/ALL: three-valued semantics (parse_expr.c sublinks)") {
    def b(sql: String): Option[Boolean] = {
      val r = Graft.execute(spark, sql).get.head()
      if (r.isNullAt(0)) None else Some(r.getBoolean(0))
    }
    val T = Some(true); val F = Some(false); val N = None
    // array rhs incl. PG '{...}' literals (qp_subquery.out:268-287)
    assert(b("SELECT 25 = ANY ('{1,2,3,4}')") == F)
    assert(b("SELECT 25 = ANY ('{1,2,25}')") == T)
    assert(b("SELECT 'abc' = ANY ('{abc,d,e}')") == T)
    assert(b("SELECT 3 < ALL (array(4, 5))") == T)
    assert(b("SELECT 3 < ALL (array(2, 5))") == F)
    // subquery rhs: witness decides even with NULLs present
    assert(b("SELECT 5 > ANY (SELECT * FROM VALUES (3), (NULL) t(v))") == T)
    assert(b("SELECT 5 > ANY (SELECT * FROM VALUES (7), (NULL) t(v))") == N)
    assert(b("SELECT 5 < ALL (SELECT * FROM VALUES (3), (20) t(v))") == F)
    assert(b("SELECT 5 < ALL (SELECT * FROM VALUES (10), (NULL) t(v))") == N)
    assert(b("SELECT 5 < ALL (SELECT * FROM VALUES (10), (20) t(v))") == T)
    // empty set: ALL vacuously true, ANY vacuously false (even NULL lhs)
    assert(b("SELECT 5 < ALL (SELECT * FROM VALUES (1) t(v) WHERE false)") == T)
    assert(b("SELECT 5 < ANY (SELECT * FROM VALUES (1) t(v) WHERE false)") == F)
    // NULL lhs over a nonempty set is unknown (lhs must be a simple
    // operand — a CAST(...) lhs is outside the lexical assist's scope)
    assert(b("SELECT v2 < ALL (SELECT * FROM VALUES (1) t(v)) " +
      "FROM VALUES (CAST(NULL AS INT)) s(v2)") == N)
    // = ALL / <> ANY via min-max witnesses
    assert(b("SELECT 5 = ALL (SELECT * FROM VALUES (5), (5) t(v))") == T)
    assert(b("SELECT 5 = ALL (SELECT * FROM VALUES (5), (6) t(v))") == F)
    assert(b("SELECT 5 = ALL (SELECT * FROM VALUES (5), (NULL) t(v))") == N)
    assert(b("SELECT 5 = ALL (SELECT * FROM VALUES (6), (NULL) t(v))") == F)
    assert(b("SELECT 5 <> ANY (SELECT * FROM VALUES (5), (5) t(v))") == F)
    assert(b("SELECT 5 <> ANY (SELECT * FROM VALUES (5), (6) t(v))") == T)
    assert(b("SELECT 5 <> ANY (SELECT * FROM VALUES (5), (NULL) t(v))") == N)
    // SOME is a synonym of ANY; = ANY is IN, <> ALL is NOT IN
    assert(b("SELECT 2 = SOME (SELECT * FROM VALUES (1), (2) t(v))") == T)
    assert(b("SELECT 3 <> ALL (SELECT * FROM VALUES (1), (2) t(v))") == T)
    assert(b("SELECT 2 <> ALL (SELECT * FROM VALUES (1), (2) t(v))") == F)
  }

  test("FETCH FIRST / OFFSET ROWS / LIMIT ALL / LIKE ANY spellings (gram.y limit_clause)") {
    def rows(sql: String): Seq[Int] =
      Graft.execute(spark, sql).get.collect().map(_.getInt(0)).toSeq
    val src = "FROM VALUES (1), (2), (3), (4), (5) t(v) ORDER BY v"
    assert(rows(s"SELECT v $src FETCH FIRST 2 ROWS ONLY") == Seq(1, 2))
    assert(rows(s"SELECT v $src FETCH NEXT 3 ROWS ONLY") == Seq(1, 2, 3))
    assert(rows(s"SELECT v $src FETCH FIRST ROW ONLY") == Seq(1))
    assert(rows(s"SELECT v $src OFFSET 3 ROWS") == Seq(4, 5))
    assert(rows(s"SELECT v $src OFFSET 2 ROWS FETCH NEXT 2 ROWS ONLY")
      == Seq(3, 4))
    assert(rows(s"SELECT v $src LIMIT ALL") == Seq(1, 2, 3, 4, 5))
    // row-locking clauses drop (no row locks under the staged swap)
    assert(rows(s"SELECT v $src FOR UPDATE") == Seq(1, 2, 3, 4, 5))
    assert(rows(s"SELECT v $src LIMIT 2 FOR SHARE SKIP LOCKED") == Seq(1, 2))
    assert(rows(s"SELECT v $src FOR NO KEY UPDATE OF t NOWAIT")
      == Seq(1, 2, 3, 4, 5))
    // LIKE/ILIKE quantifiers over arrays and subqueries
    def b(sql: String): Option[Boolean] = {
      val r = Graft.execute(spark, sql).get.head()
      if (r.isNullAt(0)) None else Some(r.getBoolean(0))
    }
    assert(b("SELECT 'foobar' LIKE ANY ('{foo%,xyz}')") == Some(true))
    assert(b("SELECT 'foobar' LIKE ALL ('{foo%,%bar}')") == Some(true))
    assert(b("SELECT 'foobar' NOT LIKE ALL ('{xyz%,%qux}')") == Some(true))
    assert(b("SELECT 'FooBar' ILIKE ANY ('{foo%,xyz}')") == Some(true))
    assert(b("SELECT 'foobar' LIKE ANY (SELECT * FROM VALUES ('z%'), ('foo%') t(p))")
      == Some(true))
    assert(b("SELECT 'foobar' LIKE ALL (SELECT * FROM VALUES ('z%'), ('foo%') t(p))")
      == Some(false))
  }

  test("row-constructor comparisons carry PG three-valued semantics (execExpr ROWCOMPARE)") {
    def b(sql: String): Option[Boolean] = {
      val r = Graft.execute(spark, sql).get.head()
      if (r.isNullAt(0)) None else Some(r.getBoolean(0))
    }
    val T = Some(true); val F = Some(false); val N = None
    assert(b("SELECT (1, 2) < (1, 3)") == T)
    assert(b("SELECT (1, 2) < (1, 2)") == F)
    assert(b("SELECT (2, 1) <= (2, 1)") == T)
    assert(b("SELECT (3, 2, 1) > (3, 1, 5)") == T)
    assert(b("SELECT ROW(1, 2) = ROW(1, 2)") == T)
    // a NULL in a deciding position is unknown — Spark's native struct
    // comparison would return a sort-order answer here
    assert(b("SELECT (1, v) < (1, 3) FROM VALUES (CAST(NULL AS INT)) t(v)") == N)
    assert(b("SELECT (1, v) = (1, 3) FROM VALUES (CAST(NULL AS INT)) t(v)") == N)
    // ... but an earlier decisive column wins despite the NULL
    assert(b("SELECT (1, v) < (2, 3) FROM VALUES (CAST(NULL AS INT)) t(v)") == T)
    assert(b("SELECT (1, v) <> (2, 3) FROM VALUES (CAST(NULL AS INT)) t(v)") == T)
    // function calls and scalar-subquery parens are not row constructors
    assert(b("SELECT greatest(1, 2) < 5") == T)
    assert(b("SELECT (SELECT 1) < (SELECT 2)") == T)
    // comments (line and nested block) don't confuse the masked scans
    assert(b("SELECT (1, 2) < (1, 3) -- trailing (unbalanced\n") == T)
    assert(b("SELECT /* (( */ 5 < ANY (SELECT * FROM VALUES (9) t(v)) /* ) */")
      == T)
    // a row-valued scalar subquery's select-list commas are NOT a row
    // constructor — the comparison must reach Spark untouched (where a
    // single-column form works; multi-column fails loudly)
    assert(b("SELECT (v) = (SELECT min(x) FROM VALUES (7), (9) t(x)) " +
      "FROM VALUES (7) s(v)") == T)
  }

  test("data-modifying CTEs: RETURNING as relation, pre-DML snapshot (with_clause.sql:116-122)") {
    drop("wcte_y")
    Graft.execute(spark, "CREATE TABLE wcte_y (m bigint)")
    Graft.execute(spark,
      "INSERT INTO wcte_y SELECT explode(sequence(1, 15))")
    // UPDATE ... RETURNING consumed as the CTE relation (the regress
    // query: all returned m land in [100, 1500])
    val r = Graft.execute(spark,
      """WITH t AS (UPDATE wcte_y SET m = m * 100 RETURNING *)
        |SELECT m BETWEEN 100 AND 1500 FROM t LIMIT 1""".stripMargin)
      .get.head()
    assert(r.getBoolean(0))
    // the update itself took effect for later statements
    val after = spark.table("wcte_y").collect().map(_.getLong(0)).sorted
    assert(after.toSeq == (1 to 15).map(_ * 100L))
    // same-snapshot rule: the main statement sees the PRE-DML table
    // image beside the CTE's RETURNING rows
    val snap = Graft.execute(spark,
      """WITH ins AS (INSERT INTO wcte_y VALUES (7) RETURNING m)
        |SELECT (SELECT count(*) FROM wcte_y) AS pre,
        |       (SELECT count(*) FROM ins) AS ret,
        |       (SELECT m FROM ins) AS newval""".stripMargin).get.head()
    assert(snap.getLong(0) == 15 && snap.getLong(1) == 1 &&
      snap.getLong(2) == 7L)
    assert(spark.table("wcte_y").count() == 16)
    // DELETE ... RETURNING with a column alias list, mixed with a
    // plain CTE in the same WITH
    val del = Graft.execute(spark,
      """WITH gone(g) AS (DELETE FROM wcte_y WHERE m <= 300 RETURNING m),
        |     keep AS (SELECT 1 AS one)
        |SELECT count(*), sum(g), max(one) FROM gone, keep""".stripMargin)
      .get.head()
    // deleted: 7, 100, 200, 300 → count 4, sum 607
    assert(del.getLong(0) == 4 && del.getLong(1) == 607L &&
      del.getInt(2) == 1)
    assert(spark.table("wcte_y").count() == 12)
    // a DML CTE reading a PRECEDING plain CTE: the plain CTE
    // materializes (pre-DML image) before the DML body routes
    val viaPlain = Graft.execute(spark,
      """WITH src AS (SELECT m + 1 AS m FROM wcte_y WHERE m = 400),
        |     ins AS (INSERT INTO wcte_y SELECT m FROM src RETURNING m)
        |SELECT m FROM ins""".stripMargin).get.head()
    assert(viaPlain.getLong(0) == 401L)
    assert(spark.table("wcte_y").count() == 13)
    // transitive: DML → plain s2 → plain s1
    val viaChain = Graft.execute(spark,
      """WITH s1 AS (SELECT max(m) AS mm FROM wcte_y),
        |     s2 AS (SELECT mm + 1 AS m FROM s1),
        |     ins AS (INSERT INTO wcte_y SELECT m FROM s2 RETURNING m)
        |SELECT m FROM ins""".stripMargin).get.head()
    assert(viaChain.getLong(0) == 1501L)
    // a schema-qualified DML target re-read by the main statement
    // fails LOUDLY (the pre-image snapshot cannot shadow `a.b`)
    val qerr = intercept[UnsupportedOperationException] {
      Graft.execute(spark,
        """WITH ins AS (INSERT INTO spark_catalog.default.wcte_y VALUES (9) RETURNING m)
          |SELECT count(*) FROM wcte_y""".stripMargin)
    }
    assert(qerr.getMessage.contains("schema-qualified"))
    // ... while public.-qualified targets normalize to the bare name
    // and keep the same-snapshot rule
    val pub = Graft.execute(spark,
      """WITH ins AS (INSERT INTO wcte_y VALUES (8) RETURNING m)
        |SELECT (SELECT count(*) FROM wcte_y) AS pre FROM ins""".stripMargin)
      .get.head()
    assert(pub.getLong(0) == 14)
    drop("wcte_y")
  }

  test("ARRAY(subquery) constructor collects with NULLs kept (parse_expr ARRAY_SUBLINK)") {
    def arr(sql: String): Seq[Any] = {
      val r = Graft.execute(spark, sql).get.head()
      r.getSeq[Any](0).toSeq
    }
    // subselect_gp.sql:138-141 — single-element collections
    assert(arr("SELECT ARRAY(SELECT 1)") == Seq(1))
    assert(arr("SELECT ARRAY(SELECT v FROM VALUES (3), (1), (2) t(v) ORDER BY v)")
      == Seq(1, 2, 3))
    // empty subquery → empty array (PG '{}'), not NULL
    assert(arr("SELECT ARRAY(SELECT v FROM VALUES (1) t(v) WHERE false)").isEmpty)
    // NULL elements survive (collect_list alone would drop them)
    assert(arr("SELECT ARRAY(SELECT v FROM VALUES (1), (NULL), (3) t(v) ORDER BY v NULLS LAST)")
      == Seq(1, 3, null))
    // array(expr, ...) function calls are untouched
    assert(arr("SELECT array(9, 8)") == Seq(9, 8))
  }

  test("FETCH FIRST n ROWS WITH TIES keeps the nth row's peers (PG 13 limit_clause)") {
    def vals(sql: String): Seq[Int] =
      Graft.execute(spark, sql).get.collect().map(_.getInt(0)).toSeq
    val src = "FROM VALUES (1), (2), (2), (3), (3), (4) t(v)"
    // ties of the 2nd row (both 2s) ride along
    assert(vals(s"SELECT v $src ORDER BY v FETCH FIRST 2 ROWS WITH TIES")
      == Seq(1, 2, 2))
    // a clean boundary behaves like LIMIT
    assert(vals(s"SELECT v $src ORDER BY v FETCH FIRST 1 ROW WITH TIES")
      == Seq(1))
    assert(vals(s"SELECT v $src ORDER BY v DESC FETCH NEXT 1 ROWS WITH TIES")
      == Seq(4))
    assert(vals(s"SELECT v $src ORDER BY v DESC FETCH FIRST 2 ROWS WITH TIES")
      == Seq(4, 3, 3))
    // ties already inside the window don't extend it (n=3 ends at a 2)
    assert(vals(s"SELECT v $src ORDER BY v FETCH FIRST 3 ROWS WITH TIES")
      == Seq(1, 2, 2))
    // ... but a boundary inside a peer group pulls the whole group
    val r = Graft.execute(spark,
      s"SELECT v, v * 10 AS w $src ORDER BY v FETCH FIRST 4 ROWS WITH TIES")
      .get
    assert(r.columns.toSeq == Seq("v", "w"))
    assert(r.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 2, 3, 3))
    // ordinal ORDER BY keys resolve to select-list columns: inside the
    // rank() window a bare 1 would be a CONSTANT (every row rank 1 →
    // all rows silently returned) because Spark's orderByOrdinal only
    // applies to top-level sorts
    assert(vals(s"SELECT v $src ORDER BY 1 FETCH FIRST 2 ROWS WITH TIES")
      == Seq(1, 2, 2))
    assert(vals(s"SELECT v $src ORDER BY 1 DESC FETCH FIRST 2 ROWS WITH TIES")
      == Seq(4, 3, 3))
    val ord = Graft.execute(spark,
      s"SELECT v * 10 AS w, v $src ORDER BY 2 DESC, 1 FETCH FIRST 2 ROWS WITH TIES")
      .get
    assert(ord.collect().map(_.getInt(1)).toSeq == Seq(4, 3, 3))
    // out-of-range ordinal fails loudly, not silently
    val e = intercept[Exception] {
      Graft.execute(spark, s"SELECT v $src ORDER BY 3 FETCH FIRST 2 ROWS WITH TIES")
    }
    assert(e.getMessage.contains("not in select list"))
  }

  test("EXTRACT epoch/dow/isodow/century/decade/millennium (timestamp.c date_part)") {
    def one(sql: String): Any = Graft.execute(spark, sql).get.head().get(0)
    assert(one("SELECT EXTRACT(EPOCH FROM TIMESTAMP '2020-01-01 00:00:00')")
      == 1577836800.0)
    assert(one("SELECT EXTRACT(EPOCH FROM TIMESTAMP '2020-01-01 00:00:00.5')")
      == 1577836800.5)
    assert(one("SELECT date_part('epoch', DATE '1970-01-02')") == 86400.0)
    // 2020-01-01 was a Wednesday: PG dow = 3 (0 = Sunday), isodow = 3
    assert(one("SELECT EXTRACT(DOW FROM DATE '2020-01-01')") == 3)
    assert(one("SELECT EXTRACT(DOW FROM DATE '2020-01-05')") == 0) // Sunday
    assert(one("SELECT EXTRACT(ISODOW FROM DATE '2020-01-05')") == 7)
    assert(one("SELECT EXTRACT(ISODOW FROM DATE '2020-01-06')") == 1) // Monday
    assert(one("SELECT EXTRACT(CENTURY FROM DATE '2001-01-01')") == 21L)
    assert(one("SELECT EXTRACT(CENTURY FROM DATE '2000-01-01')") == 20L)
    assert(one("SELECT EXTRACT(DECADE FROM DATE '2020-01-01')") == 202L)
    assert(one("SELECT EXTRACT(MILLENNIUM FROM DATE '2001-01-01')") == 3L)
    // untouched fields still pass through to Spark's native EXTRACT
    assert(one("SELECT EXTRACT(QUARTER FROM DATE '2020-05-01')") == 2)
    assert(one("SELECT EXTRACT(YEAR FROM DATE '2020-05-01')") == 2020)
  }

  test("PG misc builtins: quote_*, string_to_array, strpos, to_hex (quote.c/varlena.c)") {
    def one(sql: String): Any = {
      val r = Graft.execute(spark, sql).get.head()
      if (r.isNullAt(0)) null else r.get(0)
    }
    assert(one("SELECT quote_literal('it''s')") == "'it''s'")
    assert(one("SELECT quote_literal('a' || chr(92) || 'b')") == "E'a\\\\b'")
    assert(one("SELECT quote_literal(NULL)") == null)
    assert(one("SELECT quote_nullable(NULL)") == "NULL")
    assert(one("SELECT quote_nullable('x')") == "'x'")
    assert(one("SELECT quote_ident('simple_name')") == "simple_name")
    assert(one("SELECT quote_ident('weird name')") == "\"weird name\"")
    assert(one("SELECT quote_ident('MixedCase')") == "\"MixedCase\"")
    assert(one("SELECT string_to_array('a,b,c', ',')") ==
      scala.collection.immutable.ArraySeq("a", "b", "c"))
    assert(one("SELECT string_to_array('a.|b', '.|')") ==
      scala.collection.immutable.ArraySeq("a", "b")) // delim is literal
    assert(one("SELECT string_to_array('', ',')") ==
      scala.collection.immutable.ArraySeq.empty[String])
    assert(one("SELECT string_to_array('abc', NULL)") ==
      scala.collection.immutable.ArraySeq("a", "b", "c"))
    assert(one("SELECT array_to_string(array(1, 2, 3), '-')") == "1-2-3")
    assert(one("SELECT strpos('hello', 'll')") == 3)
    assert(one("SELECT strpos('hello', 'zz')") == 0)
    assert(one("SELECT to_hex(255)") == "ff")
    assert(one("SELECT length(gen_random_uuid())") == 36)
    assert(one("SELECT txid_current() > 0") == true)
  }

  test("array helpers, jsonb aliases, regex substring, age (arrayfuncs.c/varlena.c)") {
    def one(sql: String): Any = {
      val r = Graft.execute(spark, sql).get.head()
      if (r.isNullAt(0)) null else r.get(0)
    }
    assert(one("SELECT array_length(array(1,2,3), 1)") == 3)
    assert(one("SELECT array_length(array(), 1)") == null) // PG: NULL on empty
    assert(one("SELECT array_cat(array('a'), array('b'))") ==
      scala.collection.immutable.ArraySeq("a", "b"))
    assert(one("SELECT array_replace(array('x','y','x'), 'x', 'z')") ==
      scala.collection.immutable.ArraySeq("z", "y", "z"))
    assert(one("SELECT jsonb_array_length('[1,2,3]')") == 3)
    assert(one("SELECT jsonb_typeof('{\"a\":1}')") == "object")
    assert(one("SELECT jsonb_typeof('[1]')") == "array")
    assert(one("SELECT jsonb_typeof('3.14')") == "number")
    assert(one("SELECT json_typeof('true')") == "boolean")
    // regex substring: whole match, group-1 when declared, NULL on miss
    assert(one("SELECT substring('foo123bar' from '[0-9]+')") == "123")
    assert(one("SELECT substring('foo123bar' from 'o([0-9]+)b')") == "123")
    assert(one("SELECT substring('foobar' from '[0-9]+')") == null)
    // positional FROM/FOR stays native
    assert(one("SELECT substring('hello' from 2 for 3)") == "ell")
    // age(): two-arg symbolic difference, the age_pg parts contract
    // (years, months, days, ...) — 1 month 2 days here; one-arg is vs
    // current_date
    assert(one("SELECT age(TIMESTAMP '2020-02-03', TIMESTAMP '2020-01-01')")
      .toString == "[0,1,2,0,0,0]")
  }

  test("PG operator spellings: ^ # @ |/ ||/ @> <@ && (pg_operator.h)") {
    def one(sql: String): Any = Graft.execute(spark, sql).get.head().get(0)
    // ^ is POWER in PG; Spark's ^ is XOR — a silent wrong answer
    assert(one("SELECT 2 ^ 10") == 1024.0)
    assert(one("SELECT 2 ^ 2 ^ 3") == 64.0) // left-assoc: (2^2)^3
    assert(one("SELECT 17 # 5") == 20) // PG # IS xor
    assert(one("SELECT @ -5") == 5)
    assert(one("SELECT |/ 16.0") == 4.0)
    assert(one("SELECT ||/ 27.0") == 3.0)
    assert(one("SELECT array(1,2,3) @> array(2)") == true)
    assert(one("SELECT array(1,2,3) @> array(9)") == false)
    assert(one("SELECT array(1) <@ array(1,2)") == true)
    assert(one("SELECT array(1,2) && array(2,9)") == true)
    assert(one("SELECT array(1,2) && array(8,9)") == false)
    // unrewritable ^ operands fail loudly instead of XORing silently
    intercept[Exception](Graft.execute(spark, "SELECT (1+1) ^ (2+1)"))
  }

  test("dollar quoting, E-strings, bit strings (scan.l xdolq/xe/xb)") {
    def one(sql: String): Any = Graft.execute(spark, sql).get.head().get(0)
    assert(one("SELECT $$abc's$$") == "abc's")
    assert(one("SELECT $tag$x$y$tag$") == "x$y")
    assert(one("SELECT $$$$") == "")
    assert(one("SELECT E'a\\nb'") == "a\nb")
    assert(one("SELECT length(E'tab\\there')") == 8)
    assert(one("SELECT B'1010'") == "1010")
    // an E inside an identifier or literal is untouched
    assert(one("SELECT 'SIZE' || 'x'") == "SIZEx")
    assert(one("SELECT upper(case when true then 'e' end)") == "E")
  }

  test("array-typed casts and COLLATE clauses (gram.y Typename / a_expr COLLATE)") {
    def one(sql: String): Any = Graft.execute(spark, sql).get.head().get(0)
    assert(one("SELECT '{1,2,3}'::int[]") ==
      scala.collection.immutable.ArraySeq(1, 2, 3))
    assert(one("SELECT CAST('{1,2}' AS int[])") ==
      scala.collection.immutable.ArraySeq(1, 2))
    assert(one("SELECT '{a,b}'::text[]") ==
      scala.collection.immutable.ArraySeq("a", "b"))
    assert(one("SELECT '{}'::int8[]") ==
      scala.collection.immutable.ArraySeq.empty[Long])
    assert(one("SELECT array[1,2]::bigint[]") ==
      scala.collection.immutable.ArraySeq(1L, 2L))
    // array_in quoting rules (arrayfuncs.c ReadArrayStr): a
    // double-quoted element may contain commas; backslash escapes;
    // unquoted NULL is SQL NULL while quoted "NULL" is the string
    assert(one("SELECT '{\"a,b\",c}'::text[]") ==
      scala.collection.immutable.ArraySeq("a,b", "c"))
    assert(one("SELECT '{\"x\\\"y\",z}'::text[]") ==
      scala.collection.immutable.ArraySeq("x\"y", "z"))
    assert(one("SELECT '{\" a \",b}'::text[]") ==
      scala.collection.immutable.ArraySeq(" a ", "b"))
    assert(one("SELECT '{NULL,\"NULL\"}'::text[]") ==
      scala.collection.immutable.ArraySeq(null, "NULL"))
    // quantified comparison over the same literal honors the quoting
    assert(one("SELECT 'a,b' = ANY('{\"a,b\",c}'::text[])") == true)
    assert(one("SELECT 'b' = ANY('{\"a,b\",c}')") == false)
    assert(one("SELECT 'x' COLLATE \"C\" = 'x'") == true)
    assert(Graft.execute(spark,
      "SELECT v FROM VALUES ('b'), ('a') t(v) ORDER BY v COLLATE \"C\" LIMIT 1")
      .get.head().getString(0) == "a")
  }

  test("SELECT ... INTO routes to CTAS (gram.y into_clause; qp_misc_jiras tbl3183)") {
    drop("into_t1"); drop("into_t2"); drop("into_t3")
    Graft.execute(spark, "CREATE TABLE into_t1 (i int)")
    Graft.execute(spark, "INSERT INTO into_t1 VALUES (1), (1)")
    Graft.execute(spark, "SELECT * INTO into_t2 FROM into_t1")
    Graft.execute(spark, "SELECT i * 2 AS j INTO TEMP TABLE into_t3 FROM into_t1")
    assert(spark.table("into_t2").collect().map(_.getInt(0)).toSeq == Seq(1, 1))
    assert(spark.table("into_t3").collect().map(_.getInt(0)).sorted.toSeq
      == Seq(2, 2))
    // an IN-subquery's paren-depth hides nothing: INTO only at top level
    val n = Graft.execute(spark,
      """SELECT count(*) FROM into_t1
        |WHERE i IN (SELECT i FROM into_t2)""".stripMargin).get.head().getLong(0)
    assert(n == 2)
    drop("into_t1"); drop("into_t2"); drop("into_t3")
  }

  test("INSERT ... ON CONFLICT routes to the upsert/merge semantics") {
    drop("oc_t")
    Graft.execute(spark, "CREATE TABLE oc_t (k bigint, v float8, tag text)")
    Graft.execute(spark, "INSERT INTO oc_t VALUES (1, 1.0, 'a'), (2, 2.0, 'b')")
    // DO NOTHING: matched rows untouched, unmatched insert
    Graft.execute(spark,
      "INSERT INTO oc_t VALUES (2, 99.0, 'x'), (3, 3.0, 'c') ON CONFLICT (k) DO NOTHING")
    def row(k: Long) = spark.sql(s"SELECT v, tag FROM oc_t WHERE k = $k").head()
    assert(spark.table("oc_t").count() == 3)
    assert(row(2).getDouble(0) == 2.0 && row(2).getString(1) == "b")
    // DO UPDATE with excluded./table. qualification
    Graft.execute(spark,
      """INSERT INTO oc_t VALUES (3, 30.0, 'cc'), (4, 4.0, 'd')
        |ON CONFLICT (k) DO UPDATE SET v = excluded.v, tag = oc_t.tag""".stripMargin)
    assert(spark.table("oc_t").count() == 4)
    assert(row(3).getDouble(0) == 30.0 && row(3).getString(1) == "c")
    assert(row(4).getDouble(0) == 4.0 && row(4).getString(1) == "d")
    // explicit column list: unnamed columns insert as NULL
    Graft.execute(spark,
      "INSERT INTO oc_t (tag, k) VALUES ('e', 5) ON CONFLICT (k) DO NOTHING")
    assert(row(5).isNullAt(0) && row(5).getString(1) == "e")
    // missing conflict target is a loud error, not a silent insert
    intercept[IllegalArgumentException](Graft.execute(spark,
      "INSERT INTO oc_t VALUES (9, 9.0, 'z') ON CONFLICT DO NOTHING"))
    drop("oc_t")
  }

  test("DML RETURNING: INSERT/UPDATE/DELETE return the affected images") {
    drop("ret_t")
    Graft.execute(spark,
      "CREATE TABLE ret_t (k int, v text, amt float8) DISTRIBUTED RANDOMLY")
    // INSERT ... RETURNING: the NEW rows, expressions allowed
    val ins = Graft.execute(spark,
      "INSERT INTO ret_t VALUES (1, 'a', 10.0), (2, 'b', 20.0) " +
        "RETURNING k, v || '!' AS vx").get.collect()
    assert(ins.map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "a!"), (2, "b!")))
    // column-list form: missing columns are NULL in the returned image
    val ins2 = Graft.execute(spark,
      "INSERT INTO ret_t (k, v) VALUES (3, 'c') RETURNING k, amt").get.collect()
    assert(ins2.map(r => (r.getInt(0), r.isNullAt(1))).toSet == Set((3, true)))
    // UPDATE ... RETURNING sees the POST-update values
    val upd = Graft.execute(spark,
      "UPDATE ret_t SET amt = amt * 2 WHERE k <= 2 RETURNING k, amt")
      .get.collect()
    assert(upd.map(r => (r.getInt(0), r.getDouble(1))).toSet ==
      Set((1, 20.0), (2, 40.0)))
    assert(spark.sql("SELECT SUM(amt) FROM ret_t").head().getDouble(0) == 60.0)
    // DELETE ... RETURNING sees the OLD image; rows really go away
    val del = Graft.execute(spark,
      "DELETE FROM ret_t WHERE v = 'b' RETURNING k, v, amt").get.collect()
    assert(del.map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet ==
      Set((2, "b", 40.0)))
    assert(spark.table("ret_t").count() == 2)
    drop("ret_t")
  }

  test("TABLESAMPLE SYSTEM/BERNOULLI rewrites to percent sampling") {
    import graft.operators.PgSql.rewrite
    Tables.register(spark, TestSpark.sf0001)
    assert(rewrite("SELECT * FROM orders TABLESAMPLE SYSTEM (10)") ==
      "SELECT * FROM orders TABLESAMPLE (10 PERCENT)")
    val n = spark.sql(rewrite(
      "SELECT COUNT(*) FROM orders TABLESAMPLE BERNOULLI (50) REPEATABLE (42)"))
      .head().getLong(0)
    val total = spark.table("orders").count()
    assert(n > 0 && n < total)
    // literal safety: the word TABLESAMPLE inside a string survives
    assert(rewrite("SELECT 'TABLESAMPLE SYSTEM (10)'") ==
      "SELECT 'TABLESAMPLE SYSTEM (10)'")
  }

  test("script-compat verbs: GRANT/COMMENT no-ops, schema, sequence lifecycle") {
    // pg_dump boilerplate must pass through silently
    assert(Graft.execute(spark, "GRANT SELECT ON TABLE orders TO analyst").isEmpty)
    assert(Graft.execute(spark, "REVOKE ALL ON SCHEMA public FROM PUBLIC").isEmpty)
    assert(Graft.execute(spark, "COMMENT ON TABLE orders IS 'fact table'").isEmpty)
    assert(Graft.execute(spark, "CREATE ROLE etl LOGIN").isEmpty)
    assert(Graft.execute(spark,
      "ALTER DEFAULT PRIVILEGES IN SCHEMA public GRANT SELECT ON TABLES TO r").isEmpty)
    drop("own_t")
    Graft.execute(spark, "CREATE TABLE own_t (a int) DISTRIBUTED RANDOMLY")
    assert(Graft.execute(spark, "ALTER TABLE own_t OWNER TO etl").isEmpty)
    intercept[Exception] { // unknown table still surfaces loudly
      Graft.execute(spark, "ALTER TABLE no_such_t OWNER TO etl")
    }
    // CREATE SCHEMA ↔ database namespace
    Graft.execute(spark, "CREATE SCHEMA staging AUTHORIZATION etl")
    assert(spark.catalog.databaseExists("staging"))
    // sequence lifecycle: create → use → restart → drop
    Graft.execute(spark, "CREATE SEQUENCE seq_r11 START WITH 100")
    assert(graft.operators.GreengageDdl.nextBase("seq_r11") == 100L)
    Graft.execute(spark, "ALTER SEQUENCE seq_r11 RESTART WITH 7")
    assert(graft.operators.GreengageDdl.nextBase("seq_r11") == 7L)
    Graft.execute(spark, "DROP SEQUENCE IF EXISTS seq_r11")
    intercept[IllegalArgumentException] {
      graft.operators.GreengageDdl.nextBase("seq_r11")
    }
    drop("own_t")
  }

  test("CTE hints, regclass casts, timestamp readings") {
    import graft.operators.PgSql.rewrite
    Tables.register(spark, TestSpark.sf0001)
    // PG 12 materialization hints drop; the CTE still runs
    assert(spark.sql(rewrite(
      "WITH x AS MATERIALIZED (SELECT 1 AS a), " +
        "y AS NOT MATERIALIZED (SELECT 2 AS b) " +
        "SELECT a + b FROM x, y")).head().getInt(0) == 3)
    // regclass/oid degrade to text/bigint
    assert(spark.sql(rewrite("SELECT 'orders'::regclass")).head()
      .getString(0) == "orders")
    assert(spark.sql(rewrite("SELECT '42'::oid + 1")).head().getLong(0) == 43L)
    // transaction/statement timestamps are query-constant; the clock
    // reading is monotone against them
    val r = spark.sql(
      "SELECT transaction_timestamp() = statement_timestamp() AS same, " +
        "clock_timestamp() >= transaction_timestamp() AS ahead").head()
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("UPDATE ... FROM and DELETE ... USING route to join DML") {
    drop("jdml_t", "jdml_src")
    Graft.execute(spark,
      "CREATE TABLE jdml_t (k int, v text, amt float8) DISTRIBUTED RANDOMLY")
    spark.sql("INSERT INTO jdml_t VALUES " +
      "(1,'a',10.0),(2,'b',20.0),(3,'c',30.0),(4,'d',40.0)")
    Graft.execute(spark,
      "CREATE TABLE jdml_src (k int, bump float8) DISTRIBUTED RANDOMLY")
    spark.sql("INSERT INTO jdml_src VALUES (1, 5.0), (3, 7.0), (99, 1.0)")
    // join-update: assignments see the source through its alias
    Graft.execute(spark,
      "UPDATE jdml_t SET amt = amt + s.bump FROM jdml_src s " +
        "WHERE jdml_t.k = s.k")
    assert(spark.sql("SELECT k, amt FROM jdml_t ORDER BY k").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSeq ==
      Seq((1, 15.0), (2, 20.0), (3, 37.0), (4, 40.0)))
    // several matching source rows: the lexicographically smallest
    // source row wins, deterministically
    spark.sql("INSERT INTO jdml_src VALUES (2, 9.0), (2, 3.0)")
    Graft.execute(spark,
      "UPDATE jdml_t SET amt = s.bump FROM jdml_src s WHERE jdml_t.k = s.k " +
        "AND jdml_t.k = 2")
    assert(spark.sql("SELECT amt FROM jdml_t WHERE k = 2").head()
      .getDouble(0) == 3.0)
    // join-delete: ANY matching source row deletes — k=2 goes too
    // (its (2, 9.0) source row passes bump > 6 even though (2, 3.0)
    // was the update's pick)
    Graft.execute(spark,
      "DELETE FROM jdml_t USING jdml_src s " +
        "WHERE jdml_t.k = s.k AND s.bump > 6")
    assert(spark.sql("SELECT k FROM jdml_t ORDER BY k").collect()
      .map(_.getInt(0)).toSeq == Seq(1, 4))
    drop("jdml_t", "jdml_src")
  }

  test("COPY FROM with SREH reject limit; EXPLAIN option spellings") {
    drop("copy_sreh_t")
    Graft.execute(spark,
      "CREATE TABLE copy_sreh_t (k int, v text) DISTRIBUTED RANDOMLY")
    val dir = new java.io.File("target/test-copy-sreh")
    dir.mkdirs()
    val f = new java.io.File(dir, "in.csv")
    val w = new java.io.PrintWriter(f, "UTF-8")
    try {
      w.println("1|a"); w.println("junk_row"); w.println("2|NA"); w.println("3|c")
    } finally w.close()
    Graft.execute(spark,
      s"COPY copy_sreh_t FROM '${f.getAbsolutePath}' " +
        "WITH (DELIMITER '|', NULL 'NA') " +
        "LOG ERRORS SEGMENT REJECT LIMIT 2 ROWS")
    assert(spark.table("copy_sreh_t").count() == 3)
    // the NULL token applied under SREH; the bad row landed in the log
    assert(spark.sql(
      "SELECT COUNT(*) FROM copy_sreh_t WHERE v IS NULL").head().getLong(0) == 1)
    assert(spark.table("copy_sreh_t_errors").count() == 1)
    // over the limit → the load fails
    intercept[graft.operators.Sreh.RejectLimitExceeded] {
      Graft.execute(spark,
        s"COPY copy_sreh_t FROM '${f.getAbsolutePath}' " +
          "WITH (DELIMITER '|') SEGMENT REJECT LIMIT 0 ROWS")
    }
    // EXPLAIN (ANALYZE) routes to instrumented metrics; EXPLAIN (COSTS
    // OFF) falls back to Spark's plan rendering
    assert(Graft.execute(spark,
      "EXPLAIN (ANALYZE, COSTS OFF) SELECT COUNT(*) FROM copy_sreh_t")
      .get.count() > 0)
    val plan = Graft.execute(spark,
      "EXPLAIN (COSTS OFF) SELECT COUNT(*) FROM copy_sreh_t")
      .get.head().getString(0)
    assert(plan.contains("Aggregate"))
    drop("copy_sreh_t")
  }

  test("SELECT INTO table, CREATE TABLE LIKE, and plpgsql SELECT INTO var") {
    drop("sel_into_t", "like_t")
    Tables.register(spark, TestSpark.sf0001)
    // statement-level SELECT INTO = the pre-CTAS spelling
    Graft.execute(spark,
      "SELECT o_orderstatus, COUNT(*) AS n INTO sel_into_t " +
        "FROM orders GROUP BY o_orderstatus")
    assert(spark.table("sel_into_t").columns.toSeq ==
      Seq("o_orderstatus", "n"))
    assert(spark.table("sel_into_t").count() >= 2)
    // CREATE TABLE (LIKE t) copies the schema, plus extra columns
    Graft.execute(spark,
      "CREATE TABLE like_t (LIKE sel_into_t INCLUDING DEFAULTS, note text) " +
        "DISTRIBUTED RANDOMLY")
    assert(spark.table("like_t").columns.toSeq ==
      Seq("o_orderstatus", "n", "note"))
    // plpgsql SELECT ... INTO binds the first row's columns
    val n = graft.operators.PlDo.executeDo(spark,
      """DO $$
        |DECLARE total bigint; statuses bigint;
        |BEGIN
        |  SELECT SUM(n), COUNT(*) INTO total, statuses FROM sel_into_t;
        |  RAISE NOTICE 'total=% over %', total, statuses;
        |END $$;""".stripMargin)
    val expect = spark.table("orders").count()
    assert(n.head == s"NOTICE: total=$expect over " +
      spark.table("sel_into_t").count())
    drop("sel_into_t", "like_t")
  }

  test("pg_catalog compat: version(), pg_class/pg_tables/pg_attribute, segments") {
    Tables.register(spark, TestSpark.sf0001)
    val v = Graft.execute(spark, "SELECT version()").get.head().getString(0)
    assert(v.contains("graft") && v.contains("Spark"))
    assert(Graft.execute(spark, "SELECT current_schema()").get
      .head().getString(0) == "public")
    // temp-view fixtures surface as relkind 'v'
    val kinds = Graft.execute(spark,
      "SELECT relkind FROM pg_class WHERE relname = 'orders'").get.collect()
    assert(kinds.map(_.getString(0)).toSeq == Seq("v"))
    // a managed table lands in pg_tables — and the snapshot refreshes
    // on the next catalog-touching statement
    drop("cat_probe")
    Graft.execute(spark, "CREATE TABLE cat_probe (a int, b text) DISTRIBUTED RANDOMLY")
    assert(Graft.execute(spark,
      "SELECT COUNT(*) FROM pg_tables WHERE tablename = 'cat_probe'")
      .get.head().getLong(0) == 1)
    // attribute order and the 1-based attnum
    val attrs = Graft.execute(spark,
      "SELECT attname, attnum FROM pg_attribute WHERE relname = 'cat_probe' " +
        "ORDER BY attnum").get.collect()
    assert(attrs.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 1), ("b", 2)))
    // one primary row per segment plus the master entry
    val segs = Graft.execute(spark,
      "SELECT COUNT(*) FROM gp_segment_configuration WHERE content >= 0")
      .get.head().getLong(0)
    assert(segs == spark.conf.get("spark.sql.shuffle.partitions").toLong)
    drop("cat_probe")
  }

  test("DO blocks: variables, control flow, dynamic EXECUTE, FOR-over-query") {
    import graft.operators.PlDo
    drop("do_t")
    // control flow + dynamic DDL/DML + RAISE formatting
    val notices = PlDo.executeDo(spark,
      """DO $$
        |DECLARE total bigint := 0; label text;
        |BEGIN
        |  EXECUTE 'CREATE TABLE do_t (k int, v text)';
        |  FOR i IN 1..5 LOOP
        |    IF i % 2 = 0 THEN label := 'even'; ELSE label := 'odd'; END IF;
        |    INSERT INTO do_t VALUES (i, label);
        |    total := total + i;
        |  END LOOP;
        |  RAISE NOTICE 'inserted % rows, sum %', 5, total;
        |END $$;""".stripMargin)
    assert(notices == Seq("NOTICE: inserted 5 rows, sum 15"))
    assert(spark.table("do_t").count() == 5)
    assert(spark.sql("SELECT COUNT(*) FROM do_t WHERE v = 'even'")
      .head().getLong(0) == 2)
    // FOR over a query binds rec.col; EXECUTE INTO reads a scalar back
    val n2 = PlDo.executeDo(spark,
      """DO $$
        |DECLARE seen bigint;
        |BEGIN
        |  FOR r IN SELECT v, COUNT(*) AS c FROM do_t GROUP BY v ORDER BY v LOOP
        |    RAISE NOTICE '% -> %', r.v, r.c;
        |  END LOOP;
        |  EXECUTE 'SELECT COUNT(*) FROM do_t' INTO seen;
        |  IF seen <> 5 THEN RAISE EXCEPTION 'bad count %', seen; END IF;
        |END $$;""".stripMargin)
    assert(n2 == Seq("NOTICE: even -> 2", "NOTICE: odd -> 3"))
    // WHILE + EXIT WHEN + REVERSE range + string literal with keyword
    val n3 = PlDo.executeDo(spark,
      """DO $$
        |DECLARE i int := 0; acc text := '';
        |BEGIN
        |  WHILE true LOOP
        |    i := i + 1;
        |    EXIT WHEN i >= 3;
        |  END LOOP;
        |  FOR j IN REVERSE 3..1 LOOP
        |    acc := acc || CAST(j AS text);
        |  END LOOP;
        |  RAISE NOTICE 'i=% acc=% lit=%', i, acc, 'END IF; $$ inside';
        |END $$;""".stripMargin)
    assert(n3 == Seq("NOTICE: i=3 acc=321 lit=END IF; $$ inside"))
    // EXCEPTION WHEN OTHERS runs the handler
    val n4 = PlDo.executeDo(spark,
      """DO $$
        |BEGIN
        |  PERFORM CAST('nope' AS int);
        |  RAISE NOTICE 'unreachable';
        |EXCEPTION WHEN OTHERS THEN
        |  RAISE NOTICE 'caught';
        |END $$;""".stripMargin)
    assert(n4 == Seq("NOTICE: caught"))
    // RAISE EXCEPTION aborts
    intercept[RuntimeException] {
      PlDo.executeDo(spark, "DO $$ BEGIN RAISE EXCEPTION 'boom %', 7; END $$")
    }
    // procedures: CREATE once, CALL with evaluated args via the router
    Graft.execute(spark,
      """CREATE PROCEDURE bump(delta int, tag text) AS $$
        |BEGIN
        |  INSERT INTO do_t SELECT k + delta, tag FROM do_t WHERE v = 'odd';
        |END $$ LANGUAGE plpgsql;""".stripMargin)
    Graft.execute(spark, "CALL bump(100, 'bumped')")
    assert(spark.sql("SELECT COUNT(*) FROM do_t WHERE v = 'bumped' AND k > 100")
      .head().getLong(0) == 3)
    drop("do_t")
  }

  test("crosstab: positional, typed shorthands, hash variant (tablefunc.c)") {
    import graft.operators.Tablefunc
    // contrib/tablefunc/data/ct.data group1 slice, including the
    // NULL-rowid group; expected rows pinned to expected/tablefunc.out.
    spark.sql(
      """SELECT * FROM VALUES
        |  ('test1','att1','val1'),('test1','att2','val2'),
        |  ('test1','att3','val3'),('test1','att4','val4'),
        |  ('test2','att1','val5'),('test2','att2','val6'),
        |  ('test2','att3','val7'),('test2','att4','val8'),
        |  (CAST(NULL AS STRING),'att1','val9'),(NULL,'att2','val10'),
        |  (NULL,'att3','val11'),(NULL,'att4','val12')
        |  AS ct(rowid, attribute, val)""".stripMargin)
      .createOrReplaceTempView("ct")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().toSeq.map(_.toSeq)
        .sortBy(r => Option(r.head).map(_.toString).getOrElse("￿"))
    // crosstab3: (row_name, category_1..3) per tablefunc--1.1.sql's
    // tablefunc_crosstab_3 type — truncates the 4-value groups to 3
    val c3 = Graft.execute(spark,
      "SELECT * FROM crosstab3('SELECT rowid, attribute, val FROM ct ORDER BY 1,2')").get
    assert(c3.columns.toSeq == Seq("row_name", "category_1", "category_2", "category_3"))
    assert(rows(c3) == Seq(
      Seq("test1", "val1", "val2", "val3"),
      Seq("test2", "val5", "val6", "val7"),
      Seq(null, "val9", "val10", "val11")))
    // crosstab2: (row_name, category_1..2)
    val c2 = Graft.execute(spark,
      "SELECT * FROM crosstab2('SELECT rowid, attribute, val FROM ct ORDER BY 1,2')").get
    assert(c2.columns.toSeq == Seq("row_name", "category_1", "category_2"))
    assert(rows(c2) == Seq(
      Seq("test1", "val1", "val2"),
      Seq("test2", "val5", "val6"),
      Seq(null, "val9", "val10")))
    // generic form with AS c(...) — NULL-pads a filtered (short) group
    val cg = Graft.execute(spark,
      """SELECT * FROM crosstab(
        |  'SELECT rowid, attribute, val FROM ct
        |   WHERE attribute IN (''att2'',''att3'') OR rowid = ''test1''
        |   ORDER BY 1,2')
        |AS c(rowid text, att1 text, att2 text, att3 text, att4 text)"""
        .stripMargin).get
    assert(rows(cg) == Seq(
      Seq("test1", "val1", "val2", "val3", "val4"),
      Seq("test2", "val6", "val7", null, null),
      Seq(null, "val10", "val11", null, null)))
    // hash variant: categories pin positions, missing category -> NULL,
    // extra column (rowdt) carried through, declared types applied
    // (expected/tablefunc.out "hash based crosstab" block).
    spark.sql(
      """SELECT * FROM VALUES
        |  ('test1', TIMESTAMP_NTZ'2003-03-01 00:00:00','temperature','42'),
        |  ('test1', TIMESTAMP_NTZ'2003-03-01 00:00:00','test_result','PASS'),
        |  ('test1', TIMESTAMP_NTZ'2003-03-01 00:00:00','volts','2.6987'),
        |  ('test2', TIMESTAMP_NTZ'2003-03-02 00:00:00','temperature','53'),
        |  ('test2', TIMESTAMP_NTZ'2003-03-02 00:00:00','test_result','FAIL'),
        |  ('test2', TIMESTAMP_NTZ'2003-03-02 00:00:00','test_startdate','01 March 2003'),
        |  ('test2', TIMESTAMP_NTZ'2003-03-02 00:00:00','volts','3.1234')
        |  AS cth(rowid, rowdt, attribute, val)""".stripMargin)
      .createOrReplaceTempView("cth")
    val ch = Graft.execute(spark,
      """SELECT * FROM crosstab(
        |  'SELECT rowid, rowdt, attribute, val FROM cth ORDER BY 1',
        |  'SELECT DISTINCT attribute FROM cth ORDER BY 1')
        |AS c(rowid text, rowdt timestamp, temperature int4, test_result text,
        |     test_startdate text, volts float8)""".stripMargin).get
    assert(ch.schema("temperature").dataType.typeName == "integer")
    assert(ch.schema("volts").dataType.typeName == "double")
    val hr = rows(ch)
    assert(hr.map(r => (r.head, r(2), r(3), r(4), r(5))) == Seq(
      ("test1", 42, "PASS", null, 2.6987),
      ("test2", 53, "FAIL", "01 March 2003", 3.1234)))
    // category list out of sync with the source: extra source rows drop
    val sync = Graft.execute(spark,
      """SELECT * FROM crosstab(
        |  'SELECT rowid, attribute, val FROM cth ORDER BY 1',
        |  'SELECT DISTINCT attribute FROM cth
        |   WHERE attribute IN (''temperature'',''test_result'') ORDER BY 1')
        |AS c(rowid text, temperature int4, test_result text)""".stripMargin).get
    assert(rows(sync) == Seq(Seq("test1", 42, "PASS"), Seq("test2", 53, "FAIL")))
    // empty category list errors like tablefunc.c:668
    val err = intercept[Exception] {
      Graft.execute(spark,
        """SELECT * FROM crosstab(
          |  'SELECT rowid, attribute, val FROM cth ORDER BY 1',
          |  'SELECT DISTINCT attribute FROM cth WHERE attribute = ''a''')
          |AS c(rowid text, a text)""".stripMargin)
    }
    assert(err.getMessage.contains("at least one row"))
    // direct API: 3-column source contract enforced
    intercept[IllegalArgumentException] {
      Tablefunc.crosstab(spark.table("cth"), Seq(("r", "text"), ("a", "text")))
    }
    spark.catalog.dropTempView("ct")
    spark.catalog.dropTempView("cth")
  }

  test("multi-SRF hoist inside a parenthesized subselect lands the FROM inside") {
    import graft.operators.PgSql.rewrite
    // regression: the hoisted FROM item must splice BEFORE a closing
    // ')' that is the statement's final character (subselect_gp.sql's
    // CREATE TABLE t1 AS (SELECT generate_series.. AS i, .. AS j))
    val r = rewrite(
      "(SELECT generate_series(1, 5) AS i, generate_series(6, 10) AS j)")
    assert(r.trim.endsWith(")"), s"FROM spliced outside the subselect: $r")
    val got = spark.sql(s"SELECT * FROM $r ORDER BY i")
      .collect().map(x => (x.getInt(0), x.getInt(1))).toSeq
    assert(got == (1 to 5).map(i => (i, i + 5)))
    // end-to-end through the router, exactly the regressed statement shape
    drop("srf_paren_t1")
    Graft.execute(spark,
      "CREATE TABLE srf_paren_t1 AS (SELECT generate_series(1, 50) AS i, " +
        "generate_series(51, 100) AS j)")
    val t = spark.table("srf_paren_t1")
    assert(t.count() == 50)
    assert(t.where("j = i + 50").count() == 50)
    drop("srf_paren_t1")
    // unparenthesized form still works (no over-correction)
    val r2 = rewrite(
      "SELECT generate_series(1, 4) AS a, generate_series(1, 2) AS b")
    val z = spark.sql(r2).collect().map(x => (x.getInt(0), x.getInt(1))).toSeq
    assert(z.sorted == Seq((1, 1), (2, 2), (3, 1), (4, 2)).sorted)
  }
}
