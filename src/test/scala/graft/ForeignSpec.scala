package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Foreign

/** ForeignScan (FDW) against a REAL JDBC endpoint: Derby in-memory,
  * which ships on the Spark classpath — no network, no external
  * process. Covers single scan, range-partitioned parallel scan, remote
  * query pushdown, and filter pushdown into the JDBC source.
  */
class ForeignSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val url = "jdbc:derby:memory:graft_fdw;create=true"

  private def seed(): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE ext_parts") catch { case _: Exception => }
      st.execute("CREATE TABLE ext_parts (id INT NOT NULL, name VARCHAR(64), qty INT)")
      val ps = conn.prepareStatement("INSERT INTO ext_parts VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"part_$i"); ps.setInt(3, i * 3)
        ps.addBatch()
      }
      ps.executeBatch()
      st.close()
    } finally conn.close()
  }

  test("foreign scan reads a JDBC table (single partition)") {
    seed()
    val df = Foreign.jdbcTable(spark, url, "ext_parts")
    assert(df.count() == 100)
    assert(df.rdd.getNumPartitions == 1)
  }

  test("range-partitioned parallel foreign scan returns identical data") {
    seed()
    val df = Foreign.jdbcTablePartitioned(spark, url, "ext_parts",
      "ID", lowerBound = 1, upperBound = 101, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    val single = Foreign.jdbcTable(spark, url, "ext_parts")
    assert(df.orderBy("ID").collect().toSeq ==
      single.orderBy("ID").collect().toSeq)
  }

  test("remote query + filter pushdown reach the foreign side") {
    seed()
    val q = Foreign.jdbcQuery(spark, url,
      "SELECT id, qty FROM ext_parts WHERE qty > 150")
    assert(q.count() == 50)
    // predicate on a jdbcTable pushes into the JDBC source
    val pushed = Foreign.jdbcTable(spark, url, "ext_parts").where("QTY > 270")
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("QTY"),
      "filter not pushed to the foreign side:\n" + plan)
    assert(pushed.count() == 10)
  }
}
