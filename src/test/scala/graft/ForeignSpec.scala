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

  test("writable external table: DSv2 sink writes per-partition text, round-trips") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    Tables.register(spark, TestSpark.sf0001)
    val dir = s"target/test-extsink/${System.nanoTime()}"
    val src = spark.table("nation")
      .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
        // a planted NULL must survive as the \N token
        when(col("n_regionkey") === 0, lit(null)).otherwise(col("n_regionkey"))
          .cast("long").as("rk"))
      .repartition(4)
    src.write.format("graft.sources.ExtSink").mode("append")
      .option("path", dir).option("delimiter", "|").save()
    // one file per partition, written in parallel — the gpfdist-writable
    // segmented layout
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".txt"))
    assert(files.length == 4, files.map(_.getName).mkString(","))
    val back = spark.read
      .option("sep", "|").option("nullValue", "\\N")
      .schema(StructType(Seq(StructField("n_nationkey", LongType),
        StructField("n_name", StringType), StructField("rk", LongType))))
      .csv(dir)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(canon(back) == canon(src) && back.count() == 25)
    assert(back.where(col("rk").isNull).count() > 0) // nulls round-tripped
    // overwrite mode truncates before the new files land
    src.limit(5).coalesce(1).write.format("graft.sources.ExtSink")
      .mode("overwrite").option("path", dir).option("delimiter", "|").save()
    assert(spark.read.option("sep", "|")
      .schema(back.schema).csv(dir).count() == 5)
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
