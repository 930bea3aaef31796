package graft

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
}
