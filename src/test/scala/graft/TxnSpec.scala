package graft

import org.scalatest.funsuite.AnyFunSuite

/** BEGIN/COMMIT/ROLLBACK table-state scopes (operators.Txn) and the
  * SRF-in-VALUES expansion (PgSql.srfInsertValues) the ported DML
  * suites rely on. Reference semantics: xact.c transaction blocks;
  * ExecProjectSet lockstep SRF expansion (PG ≥10). */
class TxnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ex(sql: String) = Graft.execute(spark, sql)
  private def rows(sql: String): Seq[Seq[Any]] =
    ex(sql).get.collect().toSeq.map(r => (0 until r.length).map(r.get).toList)

  test("ROLLBACK restores INSERT/UPDATE/DELETE on a touched table") {
    operators.Txn.reset(spark)
    ex("DROP TABLE IF EXISTS txn_t1")
    ex("CREATE TABLE txn_t1 (a INT, b TEXT)")
    ex("INSERT INTO txn_t1 VALUES (1, 'x'), (2, 'y')")
    ex("BEGIN")
    ex("INSERT INTO txn_t1 VALUES (3, 'z')")
    ex("UPDATE txn_t1 SET b = 'q' WHERE a = 1")
    ex("DELETE FROM txn_t1 WHERE a = 2")
    assert(rows("SELECT count(*) FROM txn_t1") == Seq(Seq(2L)))
    ex("ROLLBACK")
    assert(rows("SELECT a, b FROM txn_t1 ORDER BY a") ==
      Seq(Seq(1, "x"), Seq(2, "y")))
    ex("DROP TABLE txn_t1")
  }

  test("COMMIT keeps changes; snapshots are cleaned up") {
    operators.Txn.reset(spark)
    ex("DROP TABLE IF EXISTS txn_t2")
    ex("CREATE TABLE txn_t2 (a INT)")
    ex("BEGIN")
    ex("INSERT INTO txn_t2 VALUES (1), (2)")
    ex("COMMIT")
    assert(rows("SELECT count(*) FROM txn_t2") == Seq(Seq(2L)))
    assert(!spark.catalog.listTables("default").collect()
      .exists(_.name.startsWith("__txn_snap")))
    ex("DROP TABLE txn_t2")
  }

  test("ROLLBACK drops tables created inside the scope, restores TRUNCATE") {
    operators.Txn.reset(spark)
    ex("DROP TABLE IF EXISTS txn_t3")
    ex("DROP TABLE IF EXISTS txn_t4")
    ex("CREATE TABLE txn_t3 (a INT)")
    ex("INSERT INTO txn_t3 VALUES (7)")
    ex("BEGIN")
    ex("CREATE TABLE txn_t4 AS SELECT * FROM txn_t3")
    ex("TRUNCATE TABLE txn_t3")
    assert(rows("SELECT count(*) FROM txn_t3") == Seq(Seq(0L)))
    ex("ROLLBACK")
    assert(rows("SELECT a FROM txn_t3") == Seq(Seq(7)))
    assert(!spark.catalog.tableExists("txn_t4"))
    ex("DROP TABLE txn_t3")
  }

  test("ROLLBACK recreates a table dropped inside the scope") {
    operators.Txn.reset(spark)
    ex("DROP TABLE IF EXISTS txn_t5")
    ex("CREATE TABLE txn_t5 (a INT, b TEXT)")
    ex("INSERT INTO txn_t5 VALUES (1, 'k')")
    ex("BEGIN")
    ex("DROP TABLE txn_t5")
    assert(!spark.catalog.tableExists("txn_t5"))
    ex("ROLLBACK")
    assert(rows("SELECT a, b FROM txn_t5") == Seq(Seq(1, "k")))
    ex("DROP TABLE txn_t5")
  }

  test("SRF in INSERT VALUES: single call expands to N rows") {
    ex("DROP TABLE IF EXISTS txn_srf1")
    ex("CREATE TABLE txn_srf1 (a INT, b INT, c TEXT)")
    ex("INSERT INTO txn_srf1 VALUES(generate_series(1,10), NULL, 'text')")
    assert(rows("SELECT count(*), min(a), max(a) FROM txn_srf1") ==
      Seq(Seq(10L, 1, 10)))
    ex("DROP TABLE txn_srf1")
  }

  test("SRF in INSERT VALUES: lockstep zip pads the shorter with NULL") {
    ex("DROP TABLE IF EXISTS txn_srf2")
    ex("CREATE TABLE txn_srf2 (a INT, b INT, c TEXT)")
    ex("INSERT INTO txn_srf2 VALUES(generate_series(1,10), " +
      "generate_series(1,100), 'text')")
    // PG ≥10 ExecProjectSet: 100 rows, a NULL past 10
    assert(rows("SELECT count(*) FROM txn_srf2") == Seq(Seq(100L)))
    assert(rows("SELECT count(*) FROM txn_srf2 WHERE a IS NULL") ==
      Seq(Seq(90L)))
    ex("DROP TABLE txn_srf2")
  }

  test("SRF in INSERT VALUES: expression over the call + plain rows mix") {
    ex("DROP TABLE IF EXISTS txn_srf3")
    ex("CREATE TABLE txn_srf3 (a INT, b INT)")
    ex("INSERT INTO txn_srf3 VALUES(generate_series(1,3), " +
      "generate_series(1,3) * 10), (99, 100)")
    assert(rows("SELECT a, b FROM txn_srf3 ORDER BY a") ==
      Seq(Seq(1, 10), Seq(2, 20), Seq(3, 30), Seq(99, 100)))
    ex("DROP TABLE txn_srf3")
  }

  test("ROLLBACK restores a quoted/exotic table name") {
    operators.Txn.reset(spark)
    ex("DROP TABLE IF EXISTS \"TxnQuoted\"")
    ex("CREATE TABLE \"TxnQuoted\" (a INT)")
    ex("INSERT INTO \"TxnQuoted\" VALUES (1)")
    ex("BEGIN")
    ex("DELETE FROM \"TxnQuoted\" WHERE a = 1")
    ex("INSERT INTO \"TxnQuoted\" VALUES (7)")
    ex("ROLLBACK")
    assert(rows("SELECT a FROM \"TxnQuoted\"") == Seq(Seq(1)))
    ex("DROP TABLE \"TxnQuoted\"")
  }

  test("ROLLBACK restores DELETE ... USING (join-shaped delete)") {
    operators.Txn.reset(spark)
    ex("DROP TABLE IF EXISTS txn_du_t")
    ex("DROP TABLE IF EXISTS txn_du_s")
    ex("CREATE TABLE txn_du_t (a INT, b TEXT)")
    ex("CREATE TABLE txn_du_s (a INT)")
    ex("INSERT INTO txn_du_t VALUES (1, 'x'), (2, 'y'), (3, 'z')")
    ex("INSERT INTO txn_du_s VALUES (1), (3)")
    ex("BEGIN")
    ex("DELETE FROM txn_du_t USING txn_du_s WHERE txn_du_t.a = txn_du_s.a")
    assert(rows("SELECT a FROM txn_du_t") == Seq(Seq(2)))
    ex("ROLLBACK")
    assert(rows("SELECT a, b FROM txn_du_t ORDER BY a") ==
      Seq(Seq(1, "x"), Seq(2, "y"), Seq(3, "z")))
    // join-shaped USING list goes through deleteKeeping — same guarantee
    ex("BEGIN")
    ex("DELETE FROM txn_du_t USING txn_du_s s1 JOIN txn_du_s s2 ON s1.a = s2.a " +
      "WHERE txn_du_t.a = s1.a")
    assert(rows("SELECT a FROM txn_du_t") == Seq(Seq(2)))
    ex("ROLLBACK")
    assert(rows("SELECT count(*) FROM txn_du_t") == Seq(Seq(3L)))
    ex("DROP TABLE txn_du_t")
    ex("DROP TABLE txn_du_s")
  }

  test("first-touch snapshot of a partition-bounded DELETE copies only the region") {
    operators.Txn.reset(spark)
    ex("DROP TABLE IF EXISTS txn_part")
    ex("CREATE TABLE txn_part (v INT, k INT) " +
      "DISTRIBUTED BY (v) PARTITION BY LIST(k) " +
      "(PARTITION p1 VALUES(1), PARTITION p2 VALUES(2), " +
      "PARTITION p3 VALUES(3))")
    ex("INSERT INTO txn_part SELECT i, 1 + i % 3 FROM generate_series(1, 90) i")
    ex("BEGIN")
    ex("DELETE FROM txn_part WHERE k = 2")
    // the snapshot must be REGION-pruned: one recorded region, not a
    // full-table copy (at 100 TB this is one partition vs the table)
    val regions = operators.Txn.snapshotRegions
      .filter(_._1.endsWith("txn_part"))
    assert(regions.nonEmpty && regions.forall(_._2.isDefined),
      s"expected a pruned region snapshot, got $regions")
    ex("UPDATE txn_part SET v = v + 1000 WHERE k = 3")
    assert(operators.Txn.snapshotRegions
      .filter(_._1.endsWith("txn_part")).size == 2)
    ex("ROLLBACK")
    assert(rows("SELECT count(*) FROM txn_part") == Seq(Seq(90L)))
    assert(rows("SELECT count(*) FROM txn_part WHERE v > 1000") ==
      Seq(Seq(0L)))
    assert(rows("SELECT count(*) FROM txn_part WHERE k = 2") ==
      Seq(Seq(30L)))
    ex("DROP TABLE txn_part")
  }
}
