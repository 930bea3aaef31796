package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GreengageDdl
import graft.operators.GreengageDdl._

/** The Greengage DDL translation layer (gram.y:4835-4851, :5241):
  * representative user DDL parses, creates real catalog tables, and the
  * physical design carries through — bucket-co-located joins, partition
  * pruning, replicated-as-broadcast.
  */
class DdlSpec extends AnyFunSuite {
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

  test("parse: distribution, partitioning, storage opts, type mapping") {
    val spec = GreengageDdl.parse(
      """CREATE TABLE sales_ddl (
        |  trans_id int,
        |  cust_id int8 NOT NULL,
        |  amount numeric(18,2) DEFAULT 0,
        |  region character varying(32),
        |  flag boolean,
        |  payload bytea,
        |  sale_ts timestamp,
        |  sale_date date,
        |  PRIMARY KEY (trans_id)
        |)
        |WITH (appendonly=true, orientation=column, compresstype=zstd)
        |DISTRIBUTED BY (cust_id)
        |PARTITION BY RANGE (sale_date)
        |( START (date '2024-01-01') INCLUSIVE
        |  END (date '2025-01-01') EXCLUSIVE
        |  EVERY (INTERVAL '1 month') );""".stripMargin)
    assert(spec.name == "sales_ddl")
    assert(spec.dist == HashDist(Seq("cust_id")))
    assert(spec.partitionCols == Seq("sale_date"))
    assert(spec.storageOpts("orientation") == "column")
    assert(spec.columns == Seq(
      "trans_id" -> "INT", "cust_id" -> "BIGINT", "amount" -> "DECIMAL(18,2)",
      "region" -> "STRING", "flag" -> "BOOLEAN", "payload" -> "BINARY",
      "sale_ts" -> "TIMESTAMP_NTZ", "sale_date" -> "DATE"))
  }

  test("DDL-created bucketed tables join without an exchange on the key") {
    Tables.register(spark, TestSpark.sf0001)
    drop("orders_ddl", "customer_ddl")
    GreengageDdl.execute(spark,
      """CREATE TABLE orders_ddl AS SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders DISTRIBUTED BY (o_custkey)""".stripMargin, buckets = 4)
    GreengageDdl.execute(spark,
      """CREATE TABLE customer_ddl AS SELECT c_custkey, c_name
        |FROM customer DISTRIBUTED BY (c_custkey)""".stripMargin, buckets = 4)
    val j = spark.sql(
      """SELECT /*+ MERGE(orders_ddl) */ c_custkey, COUNT(*) AS n
        |FROM orders_ddl JOIN customer_ddl ON o_custkey = c_custkey
        |GROUP BY c_custkey""".stripMargin)
    val p = j.queryExecution.executedPlan.toString
    val joinIdx = p.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, p)
    assert(!p.substring(joinIdx).contains("Exchange hashpartitioning(o_custkey"),
      "DDL-bucketed join still shuffles:\n" + p)
    assert(j.count() > 0)
  }

  test("DDL range partitioning becomes pruned hive-style partitions") {
    Tables.register(spark, TestSpark.sf0001)
    drop("orders_part_ddl")
    val spec = GreengageDdl.execute(spark,
      """CREATE TABLE orders_part_ddl (
        |  o_orderkey int8,
        |  o_totalprice float8,
        |  o_orderstatus text
        |)
        |DISTRIBUTED RANDOMLY
        |PARTITION BY LIST (o_orderstatus)
        |( PARTITION fulfilled VALUES ('F'),
        |  PARTITION open VALUES ('O'),
        |  PARTITION pending VALUES ('P') );""".stripMargin)
    assert(spec.partitionCols == Seq("o_orderstatus"))
    spark.table("orders")
      .selectExpr("o_orderkey", "o_totalprice", "o_orderstatus")
      .write.mode("append").insertInto("orders_part_ddl")
    val pruned = spark.table("orders_part_ddl").where("o_orderstatus = 'F'")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(o_orderstatus"), scan)
    assert(pruned.count() > 0)
  }

  test("CREATE MATERIALIZED VIEW + REFRESH re-runs the stored query") {
    Tables.register(spark, TestSpark.sf0001)
    drop("mv_totals", "mv_src")
    spark.table("orders").limit(50).write.saveAsTable("mv_src")
    GreengageDdl.execute(spark,
      """CREATE MATERIALIZED VIEW mv_totals AS
        |SELECT o_orderstatus, COUNT(*) AS n FROM mv_src GROUP BY o_orderstatus
        |DISTRIBUTED BY (o_orderstatus)""".stripMargin, buckets = 2)
    val before = spark.table("mv_totals").agg(org.apache.spark.sql.functions
      .sum("n")).head().getLong(0)
    assert(before == 50)
    // matview is a snapshot: growing the source doesn't change it...
    spark.table("orders").limit(30).write.mode("append").insertInto("mv_src")
    assert(spark.table("mv_totals").agg(org.apache.spark.sql.functions
      .sum("n")).head().getLong(0) == 50)
    // ...until REFRESH re-runs the stored defining query
    GreengageDdl.refreshMaterializedView(spark, "mv_totals")
    assert(spark.table("mv_totals").agg(org.apache.spark.sql.functions
      .sum("n")).head().getLong(0) == 80)
  }

  test("CREATE SEQUENCE + nextval: unique increasing ids above START") {
    Tables.register(spark, TestSpark.sf0001)
    GreengageDdl.createSequence("CREATE SEQUENCE order_seq START WITH 1000;")
    val ids = spark.table("nation").repartition(3)
      .withColumn("id", GreengageDdl.nextvalColumn("order_seq"))
      .select("id").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length) // unique
    assert(ids.forall(_ >= 1000L)) // at or above START
    intercept[IllegalArgumentException](GreengageDdl.nextvalColumn("nope"))
  }

  test("WITH (compresstype=zstd) drives the parquet codec on disk") {
    Tables.register(spark, TestSpark.sf0001)
    drop("nation_zstd")
    GreengageDdl.execute(spark,
      """CREATE TABLE nation_zstd
        |WITH (appendonly=true, orientation=column, compresstype=zstd)
        |AS SELECT n_nationkey, n_name FROM nation
        |DISTRIBUTED RANDOMLY""".stripMargin)
    val loc = new java.io.File("target/test-warehouse/nation_zstd")
    val files = Option(loc.listFiles()).getOrElse(Array.empty).map(_.getName)
    assert(files.exists(_.endsWith(".zstd.parquet")),
      s"no zstd parquet files in ${files.mkString(",")}")
    assert(spark.table("nation_zstd").count() == 25)
  }

  test("ALTER TABLE: ADD COLUMN (constraints stripped), RENAME TO, SET DISTRIBUTED") {
    Tables.register(spark, TestSpark.sf0001)
    drop("alter_t", "alter_t2")
    GreengageDdl.execute(spark,
      """CREATE TABLE alter_t AS SELECT n_nationkey, n_name FROM nation
        |DISTRIBUTED RANDOMLY""".stripMargin)
    GreengageDdl.alter(spark,
      "ALTER TABLE alter_t ADD COLUMN score numeric(10,2) DEFAULT 0 NOT NULL;")
    assert(spark.table("alter_t").schema("score").dataType.simpleString
      == "decimal(10,2)")
    GreengageDdl.alter(spark, "ALTER TABLE alter_t RENAME TO alter_t2")
    assert(spark.table("alter_t2").count() == 25)
    // SET DISTRIBUTED REPLICATED flips the policy readTable honors
    GreengageDdl.alter(spark, "ALTER TABLE alter_t2 SET DISTRIBUTED REPLICATED")
    val dim = GreengageDdl.readTable(spark, "alter_t2")
    val j = spark.table("customer").join(dim,
      spark.table("customer")("c_nationkey") === dim("n_nationkey"))
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    intercept[IllegalArgumentException](
      GreengageDdl.alter(spark, "ALTER TABLE alter_t2 OWNER TO someone"))
    drop("alter_t2")
  }

  test("UPDATE/DELETE: snapshot-rewrite DML with PG old-row semantics") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dml
    Tables.register(spark, TestSpark.sf0001)
    drop("dml_t")
    spark.table("nation")
      .selectExpr("CAST(n_nationkey AS BIGINT) AS k", "n_name AS name",
        "CAST(n_regionkey AS BIGINT) AS r")
      .write.saveAsTable("dml_t")
    // DELETE with a null-yielding predicate: NULL cond means not deleted
    assert(Dml.deleteWhere(spark, "dml_t",
      when(col("k") < 5, lit(true))) == 5)
    assert(spark.table("dml_t").count() == 20)
    // UPDATE: assignments read the OLD row (swap k and r must really swap)
    val updated = Dml.updateWhere(spark, "dml_t", col("r") === 2,
      Map("k" -> col("r"), "r" -> col("k")))
    assert(updated == spark.table("dml_t").where("k = 2").count())
    assert(spark.table("dml_t").where("r >= 5").count() == updated)
    // untouched rows intact
    assert(spark.table("dml_t").where("r < 5 AND k >= 5").count() == 20 - updated)
    drop("dml_t")
  }

  test("DML on a timestamp-partitioned table formats partition dirs like the writer") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dml
    drop("dml_ts_t")
    spark.range(40)
      .selectExpr("id AS k",
        "timestamp_micros(CAST(1704067200000000 + (id % 4) * 3600000000 AS BIGINT)) AS tp")
      .write.partitionBy("tp").saveAsTable("dml_ts_t")
    // hour buckets of 2024-01-01; dirs like tp=2024-01-01 01%3A00%3A00
    val n = Dml.deleteWhere(spark, "dml_ts_t",
      col("tp") === lit("2024-01-01 01:00:00").cast("timestamp") && col("k") < 20)
    assert(n == 5)
    assert(spark.table("dml_ts_t").count() == 35)
    assert(spark.table("dml_ts_t")
      .where(col("tp") === lit("2024-01-01 01:00:00").cast("timestamp")).count() == 5)
    // untouched hour partitions intact
    assert(spark.table("dml_ts_t")
      .where(col("tp") === lit("2024-01-01 02:00:00").cast("timestamp")).count() == 10)
    val up = Dml.updateWhere(spark, "dml_ts_t",
      col("tp") === lit("2024-01-01 00:00:00").cast("timestamp"),
      Map("k" -> (col("k") + 100L)))
    assert(up == 10)
    assert(spark.table("dml_ts_t").where("k >= 100").count() == 10)
    drop("dml_ts_t")
  }

  test("DML touched-partition scope stays bounded on many-partition tables") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dml
    drop("dml_many_t")
    // 120 single-column partitions — above any sane OR-tree size
    spark.range(1200).selectExpr("id AS k", "CAST(id % 120 AS INT) AS p")
      .repartition(4)
      .write.partitionBy("p").saveAsTable("dml_many_t")
    val t = spark.table("dml_many_t")
    val touched = t.where(col("k") % 2 === 0)
      .select("p").distinct().collect().toSeq
    assert(touched.size == 60) // even k ⇒ even p = id % 120
    // single partition column → ONE membership predicate, not an OR tree
    val scoped = Dml.touchedScope(spark, t, touched, Seq("p"))(t)
    val plan = scoped.queryExecution.optimizedPlan.toString
    assert(!plan.contains(" OR "), s"OR tree in many-partition scope:\n$plan")
    assert(plan.contains("IN ") || plan.toUpperCase.contains("INSET"),
      s"no IN/InSet membership predicate:\n$plan")
    assert(scoped.count() == 600) // the 60 even partitions' rows
    // multi-column wide sets fall back to a semi-join, not a giant tree
    val touched2 = t.where(col("k") < 600)
      .select("p", "k").distinct().collect().toSeq
    assert(touched2.size > 64)
    val scoped2 = Dml.touchedScope(spark, t, touched2, Seq("p", "k"))(t)
    val plan2 = scoped2.queryExecution.optimizedPlan.toString
    assert(plan2.toLowerCase.contains("join"), s"expected semi-join:\n$plan2")
    assert(scoped2.count() == 600)
    // and the statement itself stays correct across all partitions
    assert(Dml.deleteWhere(spark, "dml_many_t", col("k") % 2 === 0) == 600)
    assert(spark.table("dml_many_t").count() == 600)
    assert(spark.table("dml_many_t").where(col("k") % 2 === 0).count() == 0)
    drop("dml_many_t")
  }

  test("DML timestamp partition swap honors the SESSION time zone when the JVM default differs") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dml
    // session TZ is UTC (Tables.tune); shift the JVM default so a
    // JVM-zone rendering of collected timestamps would name directories
    // the writer never created
    val oldTz = java.util.TimeZone.getDefault
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("Asia/Kolkata"))
    try {
      drop("dml_tz_t")
      spark.range(40)
        .selectExpr("id AS k",
          "timestamp_micros(CAST(1704067200000000 + (id % 4) * 3600000000 AS BIGINT)) AS tp")
        .write.partitionBy("tp").saveAsTable("dml_tz_t")
      val n = Dml.deleteWhere(spark, "dml_tz_t",
        col("tp") === lit("2024-01-01 01:00:00").cast("timestamp") && col("k") < 20)
      assert(n == 5)
      assert(spark.table("dml_tz_t").count() == 35)
      // the touched partition was swapped (not deleted-and-lost)
      assert(spark.table("dml_tz_t")
        .where(col("tp") === lit("2024-01-01 01:00:00").cast("timestamp")).count() == 5)
      // untouched partitions intact
      assert(spark.table("dml_tz_t")
        .where(col("tp") === lit("2024-01-01 02:00:00").cast("timestamp")).count() == 10)
      drop("dml_tz_t")
    } finally java.util.TimeZone.setDefault(oldTz)
  }

  test("DML wide multi-column touched scope keeps NULL partition values in scope") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dml
    drop("dml_null_t")
    // two partition columns, q sometimes NULL; enough touched tuples to
    // force the semi-join fallback (> OrTreeMax) where a null-UNSAFE
    // join would silently drop the NULL-valued partitions from scope
    spark.range(280).selectExpr("id AS k", "CAST(id % 28 AS INT) AS p",
      "CASE WHEN id % 5 = 0 THEN NULL ELSE CAST(id % 3 AS INT) END AS q")
      .repartition(2)
      .write.partitionBy("p", "q").saveAsTable("dml_null_t")
    val t = spark.table("dml_null_t")
    val touched = t.where(col("k") < 140)
      .select("p", "q").distinct().collect().toSeq
    assert(touched.size > 64, s"fixture too small: ${touched.size} tuples")
    assert(touched.exists(_.isNullAt(1)), "no NULL partition tuple touched")
    // the semi-join scope must include the NULL-q partitions
    val scoped = Dml.touchedScope(spark, t, touched, Seq("p", "q"))(t)
    assert(scoped.where(col("q").isNull).count() > 0,
      "NULL partition rows missing from the semi-join scope")
    // end-to-end: NULL partitions' matching rows delete, survivors stay
    assert(Dml.deleteWhere(spark, "dml_null_t", col("k") < 140) == 140)
    assert(spark.table("dml_null_t").count() == 140)
    assert(spark.table("dml_null_t").where(col("q").isNull).count() == 28)
    assert(spark.table("dml_null_t").where(col("k") < 140).count() == 0)
    drop("dml_null_t")
  }

  test("DML on a partitioned table: pruned rewrite, untouched partitions byte-identical") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dml
    Tables.register(spark, TestSpark.sf0001)
    drop("dml_part_t")
    spark.table("nation")
      .selectExpr("CAST(n_nationkey AS BIGINT) AS k", "n_name AS name",
        "CAST(n_regionkey AS BIGINT) AS r")
      .write.partitionBy("r").saveAsTable("dml_part_t")
    def files(part: String): Map[String, (Long, Long)] = {
      val d = new java.io.File(s"target/test-warehouse/dml_part_t/$part")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val before0 = files("r=0")
    val before1 = files("r=1")
    assert(before0.nonEmpty && before1.nonEmpty)
    // pruned UPDATE: cond binds the partition column → only r=2 rewritten
    val n = Dml.updateWhere(spark, "dml_part_t", col("r") === 2,
      Map("name" -> concat(col("name"), lit("_x"))))
    assert(n == 5)
    assert(files("r=0") == before0, "r=0 files were rewritten by an r=2 UPDATE")
    assert(files("r=1") == before1, "r=1 files were rewritten by an r=2 UPDATE")
    assert(spark.table("dml_part_t").where(col("name").endsWith("_x")).count() == n)
    assert(spark.table("dml_part_t")
      .where(col("r") === 2 && !col("name").endsWith("_x")).count() == 0)
    // pruned DELETE of part of a partition
    val expectDel = spark.table("dml_part_t").where("r = 2 AND k < 10").count()
    assert(expectDel > 0)
    assert(Dml.deleteWhere(spark, "dml_part_t",
      col("r") === 2 && col("k") < 10) == expectDel)
    assert(files("r=0") == before0)
    // DELETE that empties a whole partition must not leave stale files
    val r4 = spark.table("dml_part_t").where("r = 4").count()
    assert(r4 > 0)
    assert(Dml.deleteWhere(spark, "dml_part_t", col("r") === 4) == r4)
    assert(spark.table("dml_part_t").where("r = 4").count() == 0)
    assert(files("r=0") == before0)
    // UPDATE assigning the partition column = split-update: rows move
    // between partitions, totals preserved
    val tot = spark.table("dml_part_t").count()
    val moved = spark.table("dml_part_t").where("r = 3").count()
    assert(Dml.updateWhere(spark, "dml_part_t", col("r") === 3,
      Map("r" -> lit(0L))) == moved)
    assert(spark.table("dml_part_t").where("r = 3").count() == 0)
    assert(spark.table("dml_part_t").count() == tot)
    drop("dml_part_t")
  }

  test("SQL functions: $10+ args and literal-aware substitution") {
    import graft.operators.SqlFunctions
    SqlFunctions.create(
      "CREATE FUNCTION sum11(a1 int, a2 int, a3 int, a4 int, a5 int, a6 int," +
        " a7 int, a8 int, a9 int, a10 int, a11 int) RETURNS int AS " +
        "'SELECT $1+$2+$3+$4+$5+$6+$7+$8+$9 + $10 * 100 + $11 * 1000' LANGUAGE SQL")
    try {
      // ascending one-at-a-time replacement would corrupt $10/$11 via $1
      assert(SqlFunctions.sql(spark,
        "SELECT sum11(1,2,3,4,5,6,7,8,9,10,11) AS v").head().getInt(0)
        == 45 + 10 * 100 + 11 * 1000)
    } finally SqlFunctions.drop("sum11")
    SqlFunctions.create(
      "CREATE FUNCTION lab(x int) RETURNS text AS " +
        "$$ SELECT 'it''s $1 x' || CAST(x AS STRING) $$ LANGUAGE SQL")
    try {
      // $n and parameter names inside ''-escaped literals stay literal
      assert(SqlFunctions.sql(spark, "SELECT lab(7) AS s").head().getString(0)
        == "it's $1 x7")
      // a ''-escaped literal containing a registered name is not expanded
      assert(SqlFunctions.sql(spark, "SELECT 'don''t lab(1)' AS s")
        .head().getString(0) == "don't lab(1)")
    } finally SqlFunctions.drop("lab")
    SqlFunctions.create(
      "CREATE FUNCTION badp(x int) RETURNS int AS 'SELECT $2' LANGUAGE SQL")
    try intercept[IllegalArgumentException](SqlFunctions.expand("SELECT badp(1)"))
    finally SqlFunctions.drop("badp")
  }

  test("setval repositions a sequence; nextval continues above it") {
    GreengageDdl.createSequence("CREATE SEQUENCE sv_seq START WITH 10")
    assert(GreengageDdl.nextBase("sv_seq") == 10L)
    assert(GreengageDdl.setval("sv_seq", 5000L) == 5000L)
    assert(GreengageDdl.nextBase("sv_seq") == 5001L)
    val ids = spark.range(0, 10).coalesce(1)
      .withColumn("id", GreengageDdl.nextvalColumn("sv_seq"))
      .select("id").collect().map(_.getLong(0))
    assert(ids.forall(_ > 5000L)) // strictly above the setval position
    intercept[IllegalArgumentException](GreengageDdl.setval("nope_seq", 1L))
  }

  test("column-level CHECK constraints strip like the other constraints") {
    val spec = GreengageDdl.parse(
      """CREATE TABLE chk_ddl (
        |  x int CHECK (x > 0),
        |  y int NOT NULL CHECK (y > 0) DEFAULT 1,
        |  z text
        |)""".stripMargin)
    assert(spec.columns == Seq("x" -> "INT", "y" -> "INT", "z" -> "STRING"))
  }

  test("nextval enforces the 2^11-partition block bound at runtime") {
    GreengageDdl.createSequence("CREATE SEQUENCE wide_seq")
    val wide = spark.range(0, 3000).repartition(2049)
      .withColumn("id", GreengageDdl.nextvalColumn("wide_seq"))
    val e = intercept[Exception](wide.select("id").collect())
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null && m.contains("nextval")), e.toString)
  }

  test("CREATE FUNCTION ... LANGUAGE SQL: registration, inlining, nesting") {
    import graft.operators.SqlFunctions
    SqlFunctions.create(
      "CREATE FUNCTION dbl(x int) RETURNS int AS 'SELECT x * 2' LANGUAGE SQL")
    SqlFunctions.create(
      "CREATE FUNCTION quad(x int) RETURNS int AS $$ SELECT dbl(dbl(x)) $$ LANGUAGE SQL")
    SqlFunctions.create(
      "CREATE FUNCTION addpos(a int, b int) RETURNS int AS 'SELECT $1 + $2' LANGUAGE SQL")
    try {
      assert(SqlFunctions.sql(spark, "SELECT quad(10) AS v").head().getInt(0) == 40)
      assert(SqlFunctions.sql(spark, "SELECT addpos(3, 4) AS v").head().getInt(0) == 7)
      // an argument whose text collides with another parameter name must
      // not be re-substituted (simultaneous expansion, no macro capture)
      assert(SqlFunctions.sql(spark, "SELECT addpos(1, 1 + 1) AS v")
        .head().getInt(0) == 3)
      // string literals are left alone
      assert(SqlFunctions.sql(spark, "SELECT 'dbl(9)' AS s").head().getString(0)
        == "dbl(9)")
      // arity mismatch is a registration-surface error, not silent SQL
      intercept[IllegalArgumentException](SqlFunctions.expand("SELECT dbl(1, 2)"))
      // recursion cannot converge and is rejected
      SqlFunctions.create(
        "CREATE FUNCTION rec(x int) RETURNS int AS 'SELECT rec(x)' LANGUAGE SQL")
      intercept[IllegalArgumentException](SqlFunctions.expand("SELECT rec(1)"))
    } finally Seq("dbl", "quad", "addpos", "rec").foreach(SqlFunctions.drop)
  }

  test("plpgsql subset: DECLARE/assign/IF ladders compile to one CASE expression") {
    import graft.operators.SqlFunctions
    SqlFunctions.create(
      """CREATE FUNCTION band(p float8) RETURNS text AS $$
        |DECLARE
        |  v float8 := p * 2;
        |BEGIN
        |  IF v > 600000 THEN
        |    RETURN 'high';
        |  ELSIF v > 300000 THEN
        |    RETURN 'mid';
        |  ELSE
        |    RETURN 'low';
        |  END IF;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin)
    try {
      // compiled to a CASE chain, not interpreted
      assert(SqlFunctions.expand("SELECT band(1.0) AS b").toUpperCase
        .contains("CASE WHEN"))
      assert(SqlFunctions.sql(spark, "SELECT band(400000.0) AS b")
        .head().getString(0) == "high")
      assert(SqlFunctions.sql(spark, "SELECT band(200000.0) AS b")
        .head().getString(0) == "mid")
      assert(SqlFunctions.sql(spark, "SELECT band(1.0) AS b")
        .head().getString(0) == "low")
    } finally SqlFunctions.drop("band")
    // sequential assignments chain SSA-style; nested IF; statements after
    // END IF are the implicit ELSE
    SqlFunctions.create(
      """CREATE FUNCTION cls(a int, b int) RETURNS int AS $$
        |DECLARE
        |  v int;
        |BEGIN
        |  v := a + b;
        |  v := v * v;
        |  IF v > 100 THEN
        |    IF a > b THEN RETURN 1; ELSE RETURN 2; END IF;
        |  END IF;
        |  RETURN 0;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin)
    try {
      assert(SqlFunctions.sql(spark, "SELECT cls(9, 3) AS c").head().getInt(0) == 1)
      assert(SqlFunctions.sql(spark, "SELECT cls(3, 9) AS c").head().getInt(0) == 2)
      assert(SqlFunctions.sql(spark, "SELECT cls(1, 2) AS c").head().getInt(0) == 0)
    } finally SqlFunctions.drop("cls")
    // keywords and ';' inside ''-escaped string literals survive
    SqlFunctions.create(
      """CREATE FUNCTION kw(x int) RETURNS text AS $$
        |BEGIN
        |  IF x > 0 THEN RETURN 'then; end if; it''s fine'; ELSE RETURN 'no'; END IF;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin)
    try assert(SqlFunctions.sql(spark, "SELECT kw(1) AS s").head().getString(0)
      == "then; end if; it's fine")
    finally SqlFunctions.drop("kw")
    // a body with no RETURN path is rejected at CREATE time
    intercept[IllegalArgumentException](SqlFunctions.create(
      "CREATE FUNCTION bad(x int) RETURNS int AS $$ BEGIN x := 1; END; $$ LANGUAGE plpgsql"))
  }

  test("SQL table functions: RETURNS TABLE/SETOF inline as derived tables") {
    import graft.operators.SqlFunctions
    Tables.register(spark, TestSpark.sf0001)
    SqlFunctions.create(
      """CREATE FUNCTION nations_of(rk bigint) RETURNS TABLE(n_nationkey bigint, n_name text) AS
        |$$ SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = rk $$
        |LANGUAGE SQL""".stripMargin)
    SqlFunctions.create(
      "CREATE FUNCTION region_keys() RETURNS SETOF bigint AS " +
        "'SELECT r_regionkey FROM region' LANGUAGE SQL")
    try {
      // FROM-clause inlining = parameterized view
      val rows = SqlFunctions.sql(spark,
        "SELECT * FROM nations_of(2) ORDER BY n_nationkey").collect()
      assert(rows.length ==
        spark.table("nation").where("n_regionkey = 2").count())
      // composes with joins and the scalar-function expansion fixpoint
      val joined = SqlFunctions.sql(spark,
        """SELECT count(*) AS n FROM nations_of(1) a
          |JOIN customer c ON c.c_nationkey = a.n_nationkey""".stripMargin)
        .head().getLong(0)
      assert(joined > 0)
      // a single-column SETOF also works as an IN subquery
      assert(SqlFunctions.sql(spark,
        "SELECT count(*) AS n FROM nation WHERE n_regionkey IN (SELECT * FROM region_keys())")
        .head().getLong(0) == 25)
    } finally Seq("nations_of", "region_keys").foreach(SqlFunctions.drop)
  }

  test("plpgsql EXCEPTION blocks: handler fires exactly on the raised class") {
    import graft.operators.SqlFunctions
    SqlFunctions.create(
      """CREATE FUNCTION safe_ratio(a bigint, b bigint) RETURNS double precision AS $$
        |BEGIN
        |  RETURN a / b;
        |EXCEPTION WHEN division_by_zero THEN
        |  RETURN -1.0;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin)
    SqlFunctions.create(
      """CREATE FUNCTION parse_or_zero(s text) RETURNS int AS $$
        |BEGIN
        |  RETURN CAST(s AS INT);
        |EXCEPTION WHEN others THEN
        |  RETURN 0;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin)
    // a WHILE that exceeds its budget RAISES — and OTHERS catches it,
    // exactly PG's raise-then-handle composition
    SqlFunctions.create(
      """CREATE FUNCTION spin_or_neg(n int) RETURNS int AS $$
        |DECLARE c int := 0;
        |BEGIN
        |  WHILE c < n LOOP
        |    c := c + 0;
        |  END LOOP;
        |  RETURN c;
        |EXCEPTION WHEN others THEN
        |  RETURN -1;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin)
    try {
      // compiled to the codegen try/catch expression, not an interpreter
      assert(SqlFunctions.expand("SELECT safe_ratio(10, 2) AS v").toLowerCase
        .contains("plpgsql_catch("))
      val r = SqlFunctions.sql(spark,
        "SELECT safe_ratio(10, 2) AS a, safe_ratio(7, 0) AS b").head()
      assert(r.getDouble(0) == 5.0)
      assert(r.getDouble(1) == -1.0) // ANSI bigint/0 raises → handler
      val p = SqlFunctions.sql(spark,
        "SELECT parse_or_zero('42') AS a, parse_or_zero('nope') AS b").head()
      assert(p.getInt(0) == 42 && p.getInt(1) == 0)
      val w = SqlFunctions.sql(spark,
        "SELECT spin_or_neg(0) AS a, spin_or_neg(5) AS b").head()
      assert(w.getInt(0) == 0 && w.getInt(1) == -1)
      // an unhandled class still propagates: division_by_zero handler
      // does not swallow a cast failure
      SqlFunctions.create(
        """CREATE FUNCTION wrongclass(s text) RETURNS int AS $$
          |BEGIN
          |  RETURN CAST(s AS INT);
          |EXCEPTION WHEN division_by_zero THEN
          |  RETURN -1;
          |END;
          |$$ LANGUAGE plpgsql""".stripMargin)
      intercept[Exception](
        SqlFunctions.sql(spark, "SELECT wrongclass('nope') AS v").head())
    } finally Seq("safe_ratio", "parse_or_zero", "spin_or_neg", "wrongclass")
      .foreach(SqlFunctions.drop)
    // unknown condition names rejected at CREATE
    intercept[IllegalArgumentException](SqlFunctions.create(
      """CREATE FUNCTION badc(x int) RETURNS int AS $$
        |BEGIN
        |  RETURN x;
        |EXCEPTION WHEN no_such_condition THEN
        |  RETURN 0;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin))
  }

  test("plpgsql bounded FOR loops compile to one aggregate(sequence()) expression") {
    import graft.operators.SqlFunctions
    // sum of squares, loop variable read in the body
    SqlFunctions.create(
      """CREATE FUNCTION sumsq(n int) RETURNS bigint AS $$
        |DECLARE s bigint := CAST(0 AS bigint);
        |BEGIN
        |  FOR i IN 1..n LOOP
        |    s := s + CAST(i AS bigint) * CAST(i AS bigint);
        |  END LOOP;
        |  RETURN s;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin)
    // REVERSE iterates DOWN from the first bound (order-sensitive state)
    SqlFunctions.create(
      """CREATE FUNCTION countdown(a int, b int) RETURNS text AS $$
        |DECLARE t text := '';
        |BEGIN
        |  FOR i IN REVERSE a..b LOOP
        |    t := t || CAST(i AS STRING);
        |  END LOOP;
        |  RETURN t;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin)
    // two loop-carried variables; later assignment sees the earlier one
    // from the SAME iteration (SSA within the merge lambda)
    SqlFunctions.create(
      """CREATE FUNCTION sched(p double, r double, m double, n int) RETURNS double AS $$
        |DECLARE bal double := p; tot double := 0.0;
        |BEGIN
        |  FOR i IN 1..n LOOP
        |    bal := bal * (1.0 + r) - m;
        |    tot := tot + bal;
        |  END LOOP;
        |  RETURN tot;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin)
    // BY step, and code after the loop still sees the loop result
    SqlFunctions.create(
      """CREATE FUNCTION stepsum(n int) RETURNS int AS $$
        |DECLARE s int := 0;
        |BEGIN
        |  FOR i IN 1..n BY 3 LOOP
        |    s := s + i;
        |  END LOOP;
        |  s := s * 10;
        |  RETURN s;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin)
    try {
      // compile shape: ONE higher-order aggregate over a sequence — no
      // interpreter, no UDF
      val expanded = SqlFunctions.expand("SELECT sumsq(5) AS v").toLowerCase
      assert(expanded.contains("aggregate(") && expanded.contains("sequence(") &&
        expanded.contains("named_struct("))
      assert(SqlFunctions.sql(spark, "SELECT sumsq(5) AS v").head().getLong(0) == 55L)
      // forward loop with lo > hi runs ZERO iterations (PG semantics)
      assert(SqlFunctions.sql(spark, "SELECT sumsq(0) AS v").head().getLong(0) == 0L)
      assert(SqlFunctions.sql(spark, "SELECT countdown(3, 1) AS v")
        .head().getString(0) == "321")
      // REVERSE with lo < hi runs zero iterations
      assert(SqlFunctions.sql(spark, "SELECT countdown(1, 3) AS v")
        .head().getString(0) == "")
      // 1000*(1.05) - 100 = 950; 950*1.05 - 100 = 897.5; tot = 1847.5
      assert(SqlFunctions.sql(spark, "SELECT sched(1000.0, 0.05, 100.0, 2) AS v")
        .head().getDouble(0) == 1847.5)
      // i ∈ {1,4,7,10} → 22, then *10 after the loop
      assert(SqlFunctions.sql(spark, "SELECT stepsum(10) AS v").head().getInt(0) == 220)
      // loops compose with the IF ladder (loop result read in conditions)
      SqlFunctions.create(
        """CREATE FUNCTION cls2(n int) RETURNS text AS $$
          |DECLARE s bigint := CAST(0 AS bigint);
          |BEGIN
          |  FOR i IN 1..n LOOP
          |    s := s + CAST(i AS bigint);
          |  END LOOP;
          |  IF s > 100 THEN RETURN 'big'; ELSE RETURN 'small'; END IF;
          |END;
          |$$ LANGUAGE plpgsql""".stripMargin)
      assert(SqlFunctions.sql(spark, "SELECT cls2(20) AS v").head().getString(0) == "big")
      assert(SqlFunctions.sql(spark, "SELECT cls2(5) AS v").head().getString(0) == "small")
    } finally Seq("sumsq", "countdown", "sched", "stepsum", "cls2")
      .foreach(SqlFunctions.drop)
    // WHILE: guarded fixed-length fold — exact while it terminates
    // within the budget, raises (never truncates) when it would not
    SqlFunctions.create(
      """CREATE FUNCTION dsum(b0 bigint) RETURNS bigint AS $$
        |DECLARE s bigint := CAST(0 AS bigint); b bigint := b0;
        |BEGIN
        |  WHILE b > 0 LOOP
        |    s := s + b;
        |    b := b - 3;
        |  END LOOP;
        |  RETURN s;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin)
    SqlFunctions.create(
      """CREATE FUNCTION newton(v double) RETURNS double AS $$
        |DECLARE x double := v;
        |BEGIN
        |  WHILE abs(x * x - v) > 0.000000001 LOOP
        |    x := (x + v / x) / 2.0;
        |  END LOOP;
        |  RETURN x;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin)
    SqlFunctions.create(
      """CREATE FUNCTION spins(n int) RETURNS int AS $$
        |DECLARE c int := 0;
        |BEGIN
        |  WHILE c < n LOOP
        |    c := c + 0;
        |  END LOOP;
        |  RETURN c;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin)
    try {
      // b = 10, 7, 4, 1 → 22
      assert(SqlFunctions.sql(spark, "SELECT dsum(10) AS v").head().getLong(0) == 22L)
      // cond false at entry = zero iterations
      assert(SqlFunctions.sql(spark, "SELECT dsum(0) AS v").head().getLong(0) == 0L)
      val r2 = SqlFunctions.sql(spark, "SELECT newton(2.0) AS v").head().getDouble(0)
      assert(math.abs(r2 - math.sqrt(2.0)) < 1e-9, s"newton(2) = $r2")
      // a loop still running at the budget raises — never a wrong answer
      val e = intercept[Exception](
        SqlFunctions.sql(spark, "SELECT spins(5) AS v").head())
      assert(e.getMessage != null && e.getMessage.contains("did not terminate") ||
        e.getCause != null && e.getCause.getMessage.contains("did not terminate"))
    } finally Seq("dsum", "newton", "spins").foreach(SqlFunctions.drop)

    // nested loops and undeclared loop-carried state are rejected at CREATE
    intercept[IllegalArgumentException](SqlFunctions.create(
      """CREATE FUNCTION bad1(n int) RETURNS int AS $$
        |DECLARE s int := 0;
        |BEGIN
        |  FOR i IN 1..n LOOP
        |    FOR j IN 1..n LOOP s := s + 1; END LOOP;
        |  END LOOP;
        |  RETURN s;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin))
    intercept[IllegalArgumentException](SqlFunctions.create(
      """CREATE FUNCTION bad2(n int) RETURNS int AS $$
        |BEGIN
        |  FOR i IN 1..n LOOP u := u + 1; END LOOP;
        |  RETURN u;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin))
  }

  test("MERGE: update/delete/insert classified by one join, staged swap") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dml
    drop("merge_t")
    spark.range(10)
      .selectExpr("id AS k", "CAST(id * 10 AS DOUBLE) AS v", "'old' AS tag")
      .write.saveAsTable("merge_t")
    val src = spark.range(5, 15).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    val r = Dml.merge(spark, "merge_t", src, Seq("k"),
      whenMatchedUpdate = Map("v" -> (col("t.v") + col("s.v")),
        "tag" -> lit("upd")),
      whenMatchedDeleteIf = Some(col("s.k") === 7))
    // matched k=5..9: one deleted (7), four updated; k=10..14 inserted
    assert(r == Dml.MergeResult(4, 1, 5))
    val rows = spark.table("merge_t").collect()
      .map(x => x.getLong(0) -> ((x.getDouble(1), x.getString(2)))).toMap
    assert(rows.size == 14)
    assert(!rows.contains(7L))
    assert(rows(5L) == ((55.0, "upd"))) // update sees OLD t.v plus s.v
    assert(rows(3L) == ((30.0, "old"))) // target-only untouched
    assert(rows(12L)._1 == 12.0 && rows(12L)._2 == null) // inserted by name
    // duplicate source keys are rejected up front, table intact
    val dup = spark.range(2).selectExpr("CAST(1 AS BIGINT) AS k",
      "CAST(id AS DOUBLE) AS v")
    intercept[IllegalArgumentException](
      Dml.merge(spark, "merge_t", dup, Seq("k")))
    assert(spark.table("merge_t").count() == 14)
    // no-insert form: source-only rows are ignored
    val r2 = Dml.merge(spark, "merge_t",
      spark.range(13, 20).selectExpr("id AS k", "CAST(0.0 AS DOUBLE) AS v"),
      Seq("k"), whenMatchedUpdate = Map("tag" -> lit("re")),
      insertNotMatched = false)
    assert(r2 == Dml.MergeResult(2, 0, 0)) // k=13,14 matched
    assert(spark.table("merge_t").count() == 14)
    // ON CONFLICT DO NOTHING: matched rows untouched, unmatched insert
    val r3 = Dml.upsert(spark, "merge_t",
      spark.range(14, 17).selectExpr("id AS k", "CAST(1.0 AS DOUBLE) AS v"),
      Seq("k"), doNothing = true)
    assert(r3 == Dml.MergeResult(0, 0, 2)) // 15, 16 inserted; 14 kept
    assert(spark.table("merge_t").where("k = 14").head().getDouble(1) == 14.0)
    assert(spark.table("merge_t").count() == 16)
    drop("merge_t")
  }

  test("MERGE dup-match check rides the counts aggregate (one fewer job)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import graft.operators.Dml
    drop("merge_jobs_t")
    def reset(): Unit = {
      drop("merge_jobs_t")
      spark.range(10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        .write.saveAsTable("merge_jobs_t")
    }
    val src = spark.range(5, 15)
      .selectExpr("id AS k", "CAST(id*2 AS DOUBLE) AS v")
    reset()
    Dml.merge(spark, "merge_jobs_t", src, Seq("k")) // warm codegen/cache paths
    reset()
    val n = new java.util.concurrent.atomic.AtomicInteger
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        n.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      Dml.merge(spark, "merge_jobs_t", src, Seq("k"))
      Thread.sleep(1500) // let the listener bus drain
    } finally spark.sparkContext.removeSparkListener(l)
    // measured at 9 with the duplicate-match check folded into the
    // counts aggregate (max per-key match count); the old separate
    // groupBy-count job made it 10 — this pins the fold
    assert(n.get() <= 9, s"MERGE spent ${n.get()} jobs — dup-check " +
      "regressed to a separate pass?")
    drop("merge_jobs_t")
  }

  test("MERGE caches only non-trivial sources (persist gate)") {
    import graft.operators.Dml
    import org.apache.spark.sql.functions._
    // trivial: range + projection — recompute is cheaper than a cache job
    val plain = spark.range(10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    assert(!Dml.nonTrivialSource(plain))
    assert(!Dml.nonTrivialSource(plain.where("k > 3")))
    // non-trivial: window (the CDC per-key-latest shape), aggregate, join
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("v").desc)
    assert(Dml.nonTrivialSource(
      plain.withColumn("rn", row_number().over(w)).where("rn = 1")))
    assert(Dml.nonTrivialSource(plain.groupBy("k").agg(max("v").as("v"))))
    assert(Dml.nonTrivialSource(plain.join(plain.select("k"), "k")))
    assert(Dml.nonTrivialSource(plain.dropDuplicates("k")))
  }

  test("MERGE pruning: touched-partition-only rewrite, hazard fallbacks") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dml
    drop("merge_pt")
    spark.range(40)
      .selectExpr("id AS k", "CAST(id % 4 AS INT) AS b", "CAST(id AS DOUBLE) AS v")
      .write.partitionBy("b").saveAsTable("merge_pt")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    def partFiles(b: Int): Map[String, Long] = {
      val d = new java.io.File(s"$wh/merge_pt/b=$b")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before = (0 to 3).map(partFiles)
    // source touches ONLY bucket 1 (keys include the partition column,
    // update does not assign it → prunable)
    val src = spark.range(2).selectExpr("1 + id * 4 AS k",
      "CAST(1 AS INT) AS b", "CAST(999 AS DOUBLE) AS v")
    val r = Dml.merge(spark, "merge_pt", src, Seq("k", "b"),
      whenMatchedUpdate = Map("v" -> col("s.v")))
    assert(r == Dml.MergeResult(2, 0, 0))
    // untouched partitions keep their exact files; the touched one moved
    val after = (0 to 3).map(partFiles)
    for (b <- Seq(0, 2, 3))
      assert(after(b) == before(b), s"partition b=$b was rewritten")
    assert(after(1) != before(1))
    assert(spark.table("merge_pt").where("k = 1")
      .select("v").head().getDouble(0) == 999.0)
    assert(spark.table("merge_pt").where("k = 2")
      .select("v").head().getDouble(0) == 2.0)
    assert(spark.table("merge_pt").count() == 40)
    // HAZARD: update assigns the partition column — a matched row moves
    // OUT of its source-touched partition. Pruning must disable itself
    // (fall back to the full staged rewrite) or the destination
    // partition would be replaced by only the moved rows.
    val destBefore = spark.table("merge_pt").where("b = 2").count()
    val src2 = spark.range(1).selectExpr("1 AS k", "CAST(1 AS INT) AS b",
      "CAST(-1 AS DOUBLE) AS v")
    Dml.merge(spark, "merge_pt", src2, Seq("k", "b"),
      whenMatchedUpdate = Map("b" -> lit(2), "v" -> col("s.v")))
    val moved = spark.table("merge_pt").where("k = 1")
      .select("b", "v").head()
    assert(moved.getInt(0) == 2 && moved.getDouble(1) == -1.0)
    assert(spark.table("merge_pt").where("b = 2").count() == destBefore + 1,
      "destination partition lost pre-existing rows")
    assert(spark.table("merge_pt").count() == 40)
    drop("merge_pt")

    // date-partitioned target: pruned path must render DATE literals in
    // ADD/DROP PARTITION specs (bare yyyy-MM-dd would be arithmetic)
    drop("merge_dt")
    spark.sql("""CREATE TABLE merge_dt (k BIGINT, v DOUBLE, d DATE)
                 USING parquet PARTITIONED BY (d)""")
    spark.sql("""INSERT INTO merge_dt VALUES
      (1, 1.0, DATE '2024-01-01'), (2, 2.0, DATE '2024-01-02')""")
    val src3 = spark.sql(
      """SELECT * FROM VALUES (1L, CAST(10.0 AS DOUBLE), DATE '2024-01-01'),
                              (3L, CAST(3.0 AS DOUBLE), DATE '2024-01-03')
         AS t(k, v, d)""")
    val r3 = Dml.merge(spark, "merge_dt", src3, Seq("k", "d"),
      whenMatchedUpdate = Map("v" -> col("s.v")))
    assert(r3 == Dml.MergeResult(1, 0, 1))
    val got = spark.table("merge_dt").collect()
      .map(x => x.getLong(0) -> ((x.getDouble(1), x.getDate(2).toString))).toMap
    assert(got == Map(1L -> ((10.0, "2024-01-01")),
      2L -> ((2.0, "2024-01-02")), 3L -> ((3.0, "2024-01-03"))))
    // delete-all of one date partition exercises the DROP PARTITION spec
    val r4 = Dml.merge(spark, "merge_dt",
      spark.sql("SELECT 2L AS k, DATE '2024-01-02' AS d"),
      Seq("k", "d"), whenMatchedDeleteIf = Some(lit(true)),
      insertNotMatched = false)
    assert(r4 == Dml.MergeResult(0, 1, 0))
    assert(spark.table("merge_dt").count() == 2)
    // string partition values with embedded quote/backslash re-parse
    drop("merge_st")
    spark.sql("""CREATE TABLE merge_st (k BIGINT, v DOUBLE, s STRING)
                 USING parquet PARTITIONED BY (s)""")
    spark.sql("""INSERT INTO merge_st VALUES (1, 1.0, "o'brien")""")
    val r5 = Dml.merge(spark, "merge_st",
      spark.sql("""SELECT 2L AS k, CAST(2.0 AS DOUBLE) AS v, "o'brien" AS s"""),
      Seq("k", "s"))
    assert(r5 == Dml.MergeResult(0, 0, 1))
    assert(spark.table("merge_st").where("k = 2").head().getString(2) == "o'brien")
    drop("merge_dt"); drop("merge_st")
  }

  test("plpgsql FOREACH and FOR-over-query fold arrays and collected records") {
    import org.apache.spark.sql.functions._
    import graft.operators.SqlFunctions
    Tables.register(spark, TestSpark.sf0001)
    // FOREACH v IN ARRAY: fold directly over the array value
    SqlFunctions.create(
      """CREATE FUNCTION wlen(t text) RETURNS bigint AS $$
        |DECLARE s bigint := CAST(0 AS bigint);
        |BEGIN
        |  FOREACH w IN ARRAY split(t, ' ') LOOP
        |    s := s + length(w);
        |  END LOOP;
        |  RETURN s;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin)
    // FOR rec IN <query>: accumulation over a correlated query's records
    SqlFunctions.create(
      """CREATE FUNCTION bigcnt(ck bigint) RETURNS bigint AS $$
        |DECLARE n bigint := CAST(0 AS bigint);
        |BEGIN
        |  FOR rec IN SELECT o_totalprice AS p FROM orders WHERE o_custkey = ck LOOP
        |    n := n + CASE WHEN rec.p > 150000.0 THEN 1 ELSE 0 END;
        |  END LOOP;
        |  RETURN n;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin)
    // ordered FOR-over-query: order-SENSITIVE accumulation (string build)
    SqlFunctions.create(
      """CREATE FUNCTION names(rk bigint) RETURNS text AS $$
        |DECLARE t text := '';
        |BEGIN
        |  FOR rec IN SELECT n_name AS nm FROM nation WHERE n_regionkey = rk ORDER BY nm DESC LOOP
        |    t := t || rec.nm || ',';
        |  END LOOP;
        |  RETURN t;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin)
    try {
      assert(SqlFunctions.sql(spark, "SELECT wlen('ab cde f') AS v")
        .head().getLong(0) == 6L)
      // the loop compiles to the set-oriented answer for every customer,
      // including those with zero orders (state keeps its pre-loop value)
      val got = SqlFunctions.sql(spark,
        "SELECT c_custkey AS k, bigcnt(c_custkey) AS n FROM customer")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = spark.table("orders")
        .where(col("o_totalprice") > 150000.0)
        .groupBy("o_custkey").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.nonEmpty && got.exists(_._2 > 0))
      got.foreach { case (k, n) =>
        assert(n == expect.getOrElse(k, 0L), s"custkey $k") }
      // DESC iteration order is observable in the built string
      val exp2 = spark.table("nation").where("n_regionkey = 2")
        .select("n_name").collect().map(_.getString(0))
        .sorted.reverse.mkString("", ",", ",")
      assert(SqlFunctions.sql(spark, "SELECT names(2) AS v")
        .head().getString(0) == exp2)
    } finally Seq("wlen", "bigcnt", "names").foreach(SqlFunctions.drop)
    // mixed ORDER BY directions and unaliased expressions are rejected
    intercept[IllegalArgumentException](SqlFunctions.create(
      """CREATE FUNCTION badq(rk bigint) RETURNS text AS $$
        |DECLARE t text := '';
        |BEGIN
        |  FOR r IN SELECT n_name AS a, n_nationkey AS b FROM nation ORDER BY a ASC, b DESC LOOP
        |    t := t || r.a;
        |  END LOOP;
        |  RETURN t;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin))
    intercept[IllegalArgumentException](SqlFunctions.create(
      """CREATE FUNCTION badq2(rk bigint) RETURNS text AS $$
        |DECLARE t text := '';
        |BEGIN
        |  FOR r IN SELECT n_name || 'x' FROM nation LOOP
        |    t := t || r.a;
        |  END LOOP;
        |  RETURN t;
        |END;
        |$$ LANGUAGE plpgsql""".stripMargin))
  }

  test("partition maintenance: ADD/DROP/TRUNCATE/EXCHANGE, SPLIT rejected") {
    drop("pm_t", "pm_stage")
    spark.sql("CREATE TABLE pm_t (k BIGINT, v DOUBLE, p STRING) " +
      "USING parquet PARTITIONED BY (p)")
    spark.range(30).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v",
      "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' " +
        "ELSE 'c' END AS p")
      .write.mode("append").insertInto("pm_t")
    // staging load for partition 'a': same column set, different rows
    spark.range(100, 104).selectExpr("id AS k", "CAST(0.5 AS DOUBLE) AS v",
        "'a' AS p")
      .write.saveAsTable("pm_stage")

    // EXCHANGE is a two-way swap: pm_t('a') <-> pm_stage
    GreengageDdl.alterPartition(spark,
      "ALTER TABLE pm_t EXCHANGE PARTITION FOR ('a') WITH TABLE pm_stage")
    assert(spark.table("pm_t").where("p = 'a'").count() == 4)
    assert(spark.table("pm_stage").count() == 10)
    assert(spark.table("pm_stage").where("k < 30 AND p = 'a'").count() == 10)

    // validation rejects rows outside the target partition
    intercept[IllegalArgumentException](GreengageDdl.alterPartition(spark,
      "ALTER TABLE pm_t EXCHANGE PARTITION FOR ('b') WITH TABLE pm_stage"))

    // TRUNCATE empties the partition but keeps it in the catalog
    GreengageDdl.alterPartition(spark,
      "ALTER TABLE pm_t TRUNCATE PARTITION FOR ('b')")
    assert(spark.table("pm_t").where("p = 'b'").count() == 0)
    assert(spark.sql("SHOW PARTITIONS pm_t").collect()
      .exists(_.getString(0) == "p=b"))

    // DROP removes partition + data
    GreengageDdl.alterPartition(spark,
      "ALTER TABLE pm_t DROP PARTITION FOR ('c')")
    assert(spark.table("pm_t").where("p = 'c'").count() == 0)
    assert(!spark.sql("SHOW PARTITIONS pm_t").collect()
      .exists(_.getString(0) == "p=c"))

    // ADD creates an empty partition
    GreengageDdl.alterPartition(spark,
      "ALTER TABLE pm_t ADD PARTITION FOR ('z')")
    assert(spark.sql("SHOW PARTITIONS pm_t").collect()
      .exists(_.getString(0) == "p=z"))

    // SPLIT/RENAME manage explicit bound lists — rejected with mapping note
    intercept[IllegalArgumentException](GreengageDdl.alterPartition(spark,
      "ALTER TABLE pm_t SPLIT PARTITION FOR ('a') AT ('m') " +
        "INTO (PARTITION x, PARTITION y)"))
    drop("pm_t", "pm_stage")
  }

  test("DISTRIBUTED REPLICATED reads back with the broadcast hint") {
    Tables.register(spark, TestSpark.sf0001)
    drop("nation_ddl")
    GreengageDdl.execute(spark,
      """CREATE TABLE nation_ddl AS SELECT n_nationkey, n_name FROM nation
        |DISTRIBUTED REPLICATED""".stripMargin)
    val dim = GreengageDdl.readTable(spark, "nation_ddl")
    val j = spark.table("customer").join(dim,
      spark.table("customer")("c_nationkey") === dim("n_nationkey"))
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "replicated table not broadcast:\n" + p)
    assert(j.count() > 0)
  }

  test("SET DISTRIBUTED BY physically rebuckets: co-located join, no exchange") {
    drop("redist_a", "redist_b", "redist_a__redist", "redist_b__redist")
    Tables.register(spark, TestSpark.sf0001)
    spark.table("orders").select("o_orderkey", "o_custkey", "o_totalprice")
      .write.saveAsTable("redist_a")
    spark.table("orders").select(col("o_orderkey").as("k"), col("o_orderstatus"))
      .write.saveAsTable("redist_b")
    GreengageDdl.alter(spark, "ALTER TABLE redist_a SET DISTRIBUTED BY (o_orderkey)")
    GreengageDdl.alter(spark, "ALTER TABLE redist_b SET DISTRIBUTED BY (k)")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("redist_a").join(spark.table("redist_b"),
        col("o_orderkey") === col("k"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(j.count() == spark.table("redist_a").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    // the recorded distribution property survives the rewrite
    val p = spark.sql("SHOW TBLPROPERTIES redist_a('graft.distribution')")
      .head().getString(1)
    assert(p == "hash:o_orderkey")
    drop("redist_a", "redist_b")
  }

  test("ALTER TABLE column surgery: DROP, RENAME, TYPE USING rewrite") {
    drop("surgery_t", "surgery_t__rewrite")
    GreengageDdl.execute(spark,
      "CREATE TABLE surgery_t (k int, v text, amt float8, junk text) " +
        "DISTRIBUTED RANDOMLY")
    spark.sql("INSERT INTO surgery_t VALUES (1, '10', 1.5, 'x'), (2, '20', 2.5, 'y')")
    GreengageDdl.alter(spark, "ALTER TABLE surgery_t DROP COLUMN junk")
    assert(spark.table("surgery_t").columns.toSeq == Seq("k", "v", "amt"))
    GreengageDdl.alter(spark, "ALTER TABLE surgery_t RENAME COLUMN amt TO price")
    assert(spark.table("surgery_t").columns.toSeq == Seq("k", "v", "price"))
    // TYPE with USING transforms while converting
    GreengageDdl.alter(spark,
      "ALTER TABLE surgery_t ALTER COLUMN v TYPE int8 USING v::int8 * 2")
    val rows = spark.sql("SELECT k, v, price FROM surgery_t ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1, 20L, 1.5), (2, 40L, 2.5)))
    // data and properties survive the rewrites
    assert(spark.sql("SHOW TBLPROPERTIES surgery_t('graft.distribution')")
      .head().getString(1) == "random")
    intercept[IllegalArgumentException] {
      GreengageDdl.alter(spark, "ALTER TABLE surgery_t DROP COLUMN no_such")
    }
    // constraint/default surgery: accepted no-ops, existence-checked
    GreengageDdl.alter(spark,
      "ALTER TABLE surgery_t ALTER COLUMN price SET DEFAULT 0.0")
    GreengageDdl.alter(spark,
      "ALTER TABLE surgery_t ADD CONSTRAINT pk PRIMARY KEY (k)")
    GreengageDdl.alter(spark, "ALTER TABLE surgery_t ALTER k SET NOT NULL")
    intercept[Exception] {
      GreengageDdl.alter(spark, "ALTER TABLE no_such_t ADD CONSTRAINT c CHECK (1=1)")
    }
    assert(spark.table("surgery_t").count() == 2)
    drop("surgery_t")
  }

  test("full-boilerplate Greengage DDL: ENCODING, SUBPARTITION, templates") {
    drop("boiler_t")
    val spec = GreengageDdl.parse(
      """CREATE TABLE boiler_t (
        |  sale_id bigint NOT NULL,
        |  region text DEFAULT 'emea' ENCODING (compresstype=zlib, blocksize=32768),
        |  channel varchar(8),
        |  amount numeric(12,2) ENCODING (compresstype=rle_type),
        |  sold date,
        |  COLUMN sale_id ENCODING (compresstype=none),
        |  PRIMARY KEY (sale_id)
        |) WITH (appendonly=true, orientation=column, compresstype=zstd)
        |DISTRIBUTED BY (sale_id)
        |PARTITION BY RANGE (sold)
        |SUBPARTITION BY LIST (region)
        |SUBPARTITION TEMPLATE (
        |  SUBPARTITION emea VALUES ('emea'),
        |  SUBPARTITION apac VALUES ('apac'),
        |  DEFAULT SUBPARTITION other)
        |(START (date '2020-01-01') INCLUSIVE
        | END (date '2022-01-01') EXCLUSIVE
        | EVERY (INTERVAL '1 month'))""".stripMargin)
    assert(spec.columns.map(_._1) ==
      Seq("sale_id", "region", "channel", "amount", "sold"))
    assert(spec.columns.toMap.apply("amount") == "DECIMAL(12,2)")
    // both partition levels become hive partition directory levels
    assert(spec.partitionCols == Seq("sold", "region"))
    assert(spec.dist == GreengageDdl.HashDist(Seq("sale_id")))
    // and the lowered DDL actually executes + accepts writes
    GreengageDdl.execute(spark, spec match { case _ => // re-lower from text
      """CREATE TABLE boiler_t (sale_id bigint, channel varchar(8),
        |  amount numeric(12,2), sold date, region text)
        |WITH (compresstype=zstd) DISTRIBUTED BY (sale_id)
        |PARTITION BY RANGE (sold) SUBPARTITION BY LIST (region)
        |(START (date '2020-01-01') END (date '2022-01-01'))""".stripMargin })
    spark.sql("INSERT INTO boiler_t VALUES " +
      "(1, 'web', 10.00, DATE '2020-05-01', 'emea')," +
      "(2, 'ret', 20.00, DATE '2020-05-01', 'apac')")
    assert(spark.table("boiler_t").count() == 2)
    drop("boiler_t")
  }
}
