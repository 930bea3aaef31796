package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.chaining._

import graft.operators.{GreengageDdl, PgSql}

/** Ports of the reference's partition-pruning regress suite
  * (`/root/reference/src/test/regress/sql/partition_pruning.sql`,
  * expected rows pinned to `expected/partition_pruning.out`). The
  * reference's explicit bound lists (START/END/EVERY, VALUES(...),
  * DEFAULT PARTITION) lower onto dynamic hive-style value directories
  * (see GreengageDdl), so the "partitions selected: N (out of M)"
  * EXPLAIN counts are asserted through the Spark analog: the number of
  * partition directories the FileSourceScan actually selects.
  */
class PartitionRegressSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def drop(names: String*): Unit =
    names.foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS $n")
      // a previously crashed run can leave an orphaned managed dir
      val dir = new java.io.File(s"target/test-warehouse/$n")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(dir)
      }
    }

  private def sql(s: String): DataFrame = spark.sql(PgSql.rewrite(s))

  /** insertInto is positional and hive layout moves partition columns
    * to the end of the schema — reorder by the table's physical order. */
  private def ins(name: String, df: DataFrame): Unit =
    df.select(spark.table(name).columns.map(col): _*)
      .write.mode("append").insertInto(name)

  /** Selected-partition count of every file scan in the plan — the
    * analog of the reference's `Partitions selected: N` EXPLAIN line
    * (plain filter+scan plans only; AQE never wraps an exchange-free
    * plan, so collect() sees the real scans). */
  private def selectedParts(df: DataFrame): Int = {
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map { s =>
      s.relation.location.listFiles(s.partitionFilters, s.dataFilters).length
    }.sum
  }

  private def partitionFiltersShown(df: DataFrame, col: String): Boolean =
    df.queryExecution.executedPlan.toString
      .contains(s"PartitionFilters: [isnotnull($col")

  // ---- pt_lt_tab: list(col2) five-way (partition_pruning.sql:21-55) ----

  private def mkPtLtTab(name: String, withDefaultRows: Boolean): Unit = {
    drop(name)
    GreengageDdl.execute(spark,
      s"""CREATE TABLE $name
         |( col1 int, col2 decimal, col3 text, col4 bool )
         |distributed by (col1)
         |partition by list(col2)
         |( partition part1 values(1,2,3,4,5,6,7,8,9,10),
         |  partition part2 values(11,12,13,14,15,16,17,18,19,20),
         |  partition part3 values(21,22,23,24,25,26,27,28,29,30),
         |  partition part4 values(31,32,33,34,35,36,37,38,39,40),
         |  partition part5 values(41,42,43,44,45,46,47,48,49,50)${
           if (withDefaultRows) ",\n  default partition def" else ""} )""".stripMargin,
      buckets = 2)
    // the INSERT ... generate_series blocks, one (lo,hi,col3,col4) each
    val blocks = Seq(
      (1, 3, "a", true), (4, 6, "b", true), (7, 10, "c", true),
      (11, 13, "e", true), (14, 16, "f", true), (17, 20, "g", true),
      (21, 23, "i", false), (24, 26, "k", false), (27, 30, "h", false),
      (31, 33, "m", false), (34, 36, "o", false), (37, 40, "n", false),
      (41, 43, "p", false), (44, 46, "s", false), (47, 50, "q", false)) ++
      (if (withDefaultRows)
        Seq((51, 53, "u", true), (54, 56, "x", true), (57, 60, "w", true))
      else Seq.empty)
    val rows = blocks.flatMap { case (lo, hi, c3, c4) =>
      (lo to hi).map(i => (Integer.valueOf(i), new java.math.BigDecimal(i),
        c3, java.lang.Boolean.valueOf(c4)))
    } ++ (if (withDefaultRows)
      // 3 all-NULL rows land in the default partition in the reference;
      // dynamically they land in the NULL partition directory
      Seq.fill(3)((null.asInstanceOf[Integer],
        null.asInstanceOf[java.math.BigDecimal], null, null))
    else Seq.empty)
    ins(name, rows.toDF("col1", "col2", "col3", "col4")
      .withColumn("col2", col("col2").cast("decimal(38,18)")))
  }

  private def pin(df: DataFrame): Seq[(Option[Int], Option[Int], String, Option[Boolean])] =
    df.collect().map { r =>
      (if (r.isNullAt(0)) None else Some(r.getInt(0)),
        if (r.isNullAt(1)) None else Some(r.getDecimal(1).intValue),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getBoolean(3)))
    }.toSeq

  private def expect(rows: (Int, Int, String, Boolean)*): Seq[(Option[Int], Option[Int], String, Option[Boolean])] =
    rows.map { case (a, b, c, d) => (Some(a), Some(b), c, Some(d)) }

  test("pt_lt_tab basic pruning family pins to partition_pruning.out:145-560") {
    mkPtLtTab("pt_lt_tab", withDefaultRows = false)
    def q(pred: String) = pin(sql(
      s"SELECT col1, col2, col3, col4 FROM pt_lt_tab WHERE $pred " +
        "ORDER BY col2,col3 LIMIT 5"))
    val first5 = expect((1, 1, "a", true), (2, 2, "a", true), (3, 3, "a", true),
      (4, 4, "b", true), (5, 5, "b", true))
    val from11 = expect((11, 11, "e", true), (12, 12, "e", true),
      (13, 13, "e", true), (14, 14, "f", true), (15, 15, "f", true))
    assert(q("col1 < 10") == first5)              // .out:145
    assert(q("col1 > 50").isEmpty)                // .out:~151
    assert(q("col1 <> 10") == first5)             // .out:237
    assert(q("col1 > 10 OR col1 = 25") == from11) // .out:311
    assert(q("col2 < 10") == expect((1, 1, "a", true), (2, 2, "a", true),
      (3, 3, "a", true), (4, 4, "b", true), (5, 5, "b", true)))
    assert(q("col2 <> 10") == first5)             // .out:478
    assert(q("col2 > 10 OR col2 = 50") == from11) // .out:550
    assert(q("col2 between 10 AND 25") == expect((10, 10, "c", true),
      (11, 11, "e", true), (12, 12, "e", true), (13, 13, "e", true),
      (14, 14, "f", true)))
    // pruning: a col2 (partition column) predicate reaches the scan as
    // a partition filter and selects a strict subset of the 50 dirs
    val pruned = spark.table("pt_lt_tab").where("col2 > 41")
    assert(partitionFiltersShown(pruned, "col2"))
    assert(selectedParts(pruned) == 9)
    assert(selectedParts(spark.table("pt_lt_tab")) == 50)
    // a non-partition (col1) predicate cannot prune — all 50 selected,
    // mirroring the reference's "scan all parts, filter inside" plans
    assert(selectedParts(spark.table("pt_lt_tab").where("col1 = 25")) == 50)
  }

  test("pt_lt_tab_df default partition + NULLs (partition_pruning.out:1648-1714)") {
    mkPtLtTab("pt_lt_tab_df", withDefaultRows = true)
    // .out:1648 — rows above the explicit bound lists live in the
    // default partition; dynamic value partitioning holds them the same
    val gt51 = pin(sql("SELECT col1, col2, col3, col4 FROM pt_lt_tab_df " +
      "WHERE col2 > 51 ORDER BY col2,col3 LIMIT 5"))
    assert(gt51 == expect((52, 52, "u", true), (53, 53, "u", true),
      (54, 54, "x", true), (55, 55, "x", true), (56, 56, "x", true)))
    // .out:1704 — the three all-NULL rows; NULL sorts into its own
    // partition directory and an IS NULL predicate prunes to just it
    val nulls = sql("SELECT col1, col2, col3, col4 FROM pt_lt_tab_df " +
      "WHERE col2 is NULL ORDER BY col2,col3 LIMIT 5")
    assert(pin(nulls) == Seq.fill(3)((None, None, null, None)))
    assert(selectedParts(spark.table("pt_lt_tab_df").where("col2 IS NULL")) == 1)
    // <> excludes the NULL rows (PG three-valued logic), .out:1503
    val ne = pin(sql("SELECT col1, col2, col3, col4 FROM pt_lt_tab_df " +
      "WHERE col2 <> 10 ORDER BY col2,col3 LIMIT 5"))
    assert(ne == expect((1, 1, "a", true), (2, 2, "a", true), (3, 3, "a", true),
      (4, 4, "b", true), (5, 5, "b", true)))
  }

  test("column surgery keeps the partition layout (partition_pruning.sql:380 DROP column)") {
    mkPtLtTab("pt_lt_surg", withDefaultRows = false)
    GreengageDdl.alter(spark, "ALTER TABLE pt_lt_surg DROP COLUMN col4")
    // .out:2023 — same rows minus the dropped column
    val out = sql("SELECT col2, col3 FROM pt_lt_surg WHERE col2 > 41 " +
      "ORDER BY col2,col3 LIMIT 5").collect()
      .map(r => (r.getDecimal(0).intValue, r.getString(1))).toSeq
    assert(out == Seq((42, "p"), (43, "p"), (44, "s"), (45, "s"), (46, "s")))
    // the rewrite MUST NOT lose the hive layout: pruning still fires
    val pruned = spark.table("pt_lt_surg").where("col2 > 41")
    assert(partitionFiltersShown(pruned, "col2"),
      "partition layout lost across ALTER DROP COLUMN rewrite")
    assert(selectedParts(pruned) == 9)
    // rename of a NON-partition column also keeps the layout
    GreengageDdl.alter(spark, "ALTER TABLE pt_lt_surg RENAME COLUMN col3 TO tag")
    val pruned2 = spark.table("pt_lt_surg").where("col2 > 41")
    assert(partitionFiltersShown(pruned2, "col2"))
    assert(spark.table("pt_lt_surg").columns.contains("tag"))
  }

  test("pt_complex three-level subpartitions prune on any level (partition_pruning.sql:387-400)") {
    drop("pt_complex")
    GreengageDdl.execute(spark,
      """CREATE TABLE pt_complex (i int, j int, k int, l int, m int) DISTRIBUTED BY (i)
        |PARTITION BY list(k)
        |  SUBPARTITION BY list(j) SUBPARTITION TEMPLATE (subpartition p11 values (1), subpartition p12 values(2))
        |  SUBPARTITION BY list(l, m) SUBPARTITION TEMPLATE (subpartition p11 values ((1,1)), subpartition p12 values((2,2)))
        |( partition p1 values(1), partition p2 values(2))""".stripMargin,
      buckets = 2)
    ins("pt_complex", Seq((1, 1, 1, 1, 1), (2, 2, 2, 2, 2))
      .toDF("i", "j", "k", "l", "m"))
    // .out:2086 — single row; j is a second-level partition column so
    // the scan selects exactly one of the two partition tuples
    val out = sql("SELECT i, j, k, l, m FROM pt_complex WHERE i = 1 AND j = 1")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(out.toSeq == Seq((1, 1, 1, 1, 1)))
    assert(selectedParts(spark.table("pt_complex").where("j = 1")) == 1)
    assert(selectedParts(spark.table("pt_complex")) == 2)
  }

  test("ds_2: pruning through casts of the partition column (partition_pruning.out:2374-2397)") {
    drop("ds_2")
    GreengageDdl.execute(spark,
      """CREATE TABLE ds_2
        |( month_id character varying(6),
        |  cust_group_acc numeric(10),
        |  mobile_no character varying(10),
        |  count_vas integer )
        |DISTRIBUTED BY (cust_group_acc, mobile_no)
        |PARTITION BY LIST(month_id)
        |( PARTITION p200800 VALUES('200800'), PARTITION p200801 VALUES('200801'),
        |  PARTITION p200802 VALUES('200802'), PARTITION p200803 VALUES('200803'),
        |  PARTITION p200804 VALUES('200804'), PARTITION p200805 VALUES('200805'),
        |  PARTITION p200806 VALUES('200806'), PARTITION p200807 VALUES('200807'),
        |  PARTITION p200808 VALUES('200808'), PARTITION p200809 VALUES('200809') )""".stripMargin,
      buckets = 2)
    (200800 to 200809).map(m => (m.toString,
        null.asInstanceOf[java.math.BigDecimal], null.asInstanceOf[String],
        null.asInstanceOf[Integer]))
      .toDF("month_id", "cust_group_acc", "mobile_no", "count_vas")
      .withColumn("cust_group_acc", col("cust_group_acc").cast("decimal(10,0)"))
      .pipe(df => ins("ds_2", df))
    def months(pred: String): Seq[String] =
      sql(s"SELECT month_id FROM ds_2 WHERE $pred ORDER BY month_id")
        .collect().map(_.getString(0)).toSeq
    assert(months("month_id::int in (200907, 1315)").isEmpty)          // .out:2374
    assert(months("month_id::int in (200808, 1315)") == Seq("200808")) // .out:2379
    assert(months("month_id::int in (200808, 200801)") ==
      Seq("200801", "200808"))                                         // .out:2385
    assert(months("month_id::int in (200808, 200801, 2008010)") ==
      Seq("200801", "200808"))                                         // .out:2392
  }

  test("partprune_foo range-partition pruning + selected-part counts (partition_pruning.sql:656-694)") {
    drop("partprune_foo")
    GreengageDdl.execute(spark,
      "create table partprune_foo(a int, b int, c int) partition by range (b) " +
        "(start (1) end (101) every (10))", buckets = 2)
    // insert ... generate_series(1,5), generate_series(1,100),
    // generate_series(1,10): PG zips SRFs to LCM length = 100
    ins("partprune_foo", (1 to 100).map(i => ((i - 1) % 5 + 1, i, (i - 1) % 10 + 1))
      .toDF("a", "b", "c"))
    def rows(pred: String) =
      sql(s"select a, b, c from partprune_foo where $pred")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(rows("b = 35") == Set((5, 35, 5)))                       // .out:2632
    assert(rows("b < 35").size == 34)                               // .out:2644
    assert(rows("b in (5, 6, 14, 23)") ==
      Set((4, 14, 4), (5, 5, 5), (1, 6, 6), (3, 23, 3)))            // .out:2689
    assert(rows("b = 150").isEmpty)                                 // .out:2769
    assert(rows("b = a*5") == Set((5, 25, 5)))                      // .out:2780
    // selected-parts analog at dynamic (per-value) granularity: the
    // reference's EVERY(10) buckets become 100 value directories
    val t = spark.table("partprune_foo")
    assert(selectedParts(t) == 100)
    assert(selectedParts(t.where("b = 35")) == 1)
    assert(selectedParts(t.where("b in (5, 6, 14, 23)")) == 4)
    assert(selectedParts(t.where("b = 150")) == 0)
    assert(selectedParts(t.where("b < 15 or b > 60")) == 54)
    // b = a*5 references a non-partition column: no static pruning,
    // matching the reference's full-scan expectation
    assert(selectedParts(t.where("b = a*5")) == 100)
  }

  test("bar: IS DISTINCT FROM across list partitions with a NULL bound (partition_pruning.sql:846-868)") {
    drop("bar_pp")
    GreengageDdl.execute(spark,
      """CREATE TABLE bar_pp (i INTEGER, j decimal)
        |partition by list (j)
        |subpartition by range (i) subpartition template (start(1) end(4) every(2))
        |(partition p1 values(0.2,2.8, NULL), partition p2 values(1.7,3.1),
        |partition p3 values(5.6), default partition other)""".stripMargin,
      buckets = 2)
    Seq(Some("0.2"), Some("1.7"), Some("2.1"), Some("5.6"), None)
      .map(j => (1, j.map(new java.math.BigDecimal(_)).orNull))
      .toDF("i", "j")
      .withColumn("j", col("j").cast("decimal(38,18)"))
      .pipe(df => ins("bar_pp", df))
    def js(pred: String): Seq[Option[Double]] =
      sql(s"select j from bar_pp where $pred").collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getDecimal(0).doubleValue))
        .toSeq.sortBy(_.getOrElse(-1.0))
    // 4 rows: everything but the 5.6 partition — including the NULL row
    // (IS DISTINCT FROM treats NULL as a comparable value, PG parity)
    assert(js("j is distinct from 5.6") ==
      Seq(None, Some(0.2), Some(1.7), Some(2.1)))
    // 4 rows: everything with a non-NULL j
    assert(js("j is distinct from NULL") ==
      Seq(Some(0.2), Some(1.7), Some(2.1), Some(5.6)))
  }

  test("DATE_PARTS 3-level default routing by partition tuple (partition_pruning.sql:696-780)") {
    drop("date_parts")
    GreengageDdl.execute(spark,
      """CREATE TABLE date_parts (id int, year int, month int, day int, region text)
        |DISTRIBUTED BY (id)
        |PARTITION BY RANGE (year)
        |    SUBPARTITION BY LIST (month)
        |       SUBPARTITION TEMPLATE (
        |        SUBPARTITION Q1 VALUES (1, 2, 3),
        |        SUBPARTITION Q2 VALUES (4 ,5 ,6),
        |        SUBPARTITION Q3 VALUES (7, 8, 9),
        |        SUBPARTITION Q4 VALUES (10, 11, 12),
        |        DEFAULT SUBPARTITION other_months )
        |        SUBPARTITION BY RANGE(day)
        |        SUBPARTITION TEMPLATE (
        |        START (1) END (31) EVERY (10),
        |        DEFAULT SUBPARTITION other_days)
        |( START (2002) END (2012) EVERY (4),
        |  DEFAULT PARTITION outlying_years )""".stripMargin, buckets = 2)
    // 10 years of daily rows + the six default-routing probes
    val base = (1 to 3650).map { i =>
      val dt = java.time.LocalDate.of(2002, 1, 1).plusDays(i)
      (i, dt.getYear, dt.getMonthValue, dt.getDayOfMonth, null.asInstanceOf[String])
    }
    val probes = Seq((-1, 2004, 11, 30), (-2, 1999, 11, 30), (-3, 2004, 20, 30),
      (-4, 2004, 10, 50), (-5, 1999, 20, 50), (-6, 2002, 20, 50))
      .map { case (a, b, c, d) => (a, b, c, d, null.asInstanceOf[String]) }
    ins("date_parts", (base ++ probes)
      .toDF("id", "year", "month", "day", "region").repartition(4))
    // the reference selects each probe from its named child table
    // (date_parts_1_prt_2_2_prt_q4_3_prt_4 etc.); the dynamic analog is
    // the partition tuple — each probe is alone in its directory
    for ((id, y, m, d, _) <- probes) {
      val part = spark.table("date_parts")
        .where(s"year = $y AND month = $m AND day = $d AND id < 0")
      assert(part.collect().map(_.getInt(0)).toSeq == Seq(id),
        s"probe $id not routed to ($y,$m,$d)")
    }
    // month-level pruning selects a strict subset of directories
    val t = spark.table("date_parts")
    val all = selectedParts(t)
    val q1 = selectedParts(t.where("month between 1 and 3"))
    assert(q1 < all && q1 > 0, s"month pruning did not narrow: $q1 of $all")
    assert(selectedParts(t.where("year = 1999 and month = 13")) == 0)
  }

  test("part_left/part_right: join over partitioned timestamps (partition_pruning.sql:884-940)") {
    drop("part_left", "part_right")
    GreengageDdl.execute(spark,
      """create table part_left (id int, pkey timestamp, d int)
        |distributed by (pkey)
        |partition by range (pkey)
        |(start ('2020-12-01 00:00:00'::timestamp)
        | end   ('2020-12-04 23:59:59'::timestamp)
        | every ('1 day'::interval))""".stripMargin, buckets = 2)
    GreengageDdl.execute(spark,
      """create table part_right (id int, pkey timestamp, d int)
        |distributed by (id)
        |partition by range (pkey)
        |(start ('2020-12-01 00:00:00'::timestamp)
        | end   ('2020-12-31 23:59:59'::timestamp)
        | every ('1 day'::interval))""".stripMargin, buckets = 2)
    def ts(s: String) = java.sql.Timestamp.valueOf(s).toLocalDateTime
    Seq((1, ts("2020-12-01 00:00:00"), 1), (1, ts("2020-12-02 13:00:00"), 2),
      (1, ts("2020-12-03 14:00:00"), 3)).toDF("id", "pkey", "d")
      .pipe(df => ins("part_left", df))
    Seq((1, ts("2020-12-01 12:00:00"), 1), (1, ts("2020-12-10 13:00:00"), 2),
      (1, ts("2020-12-20 14:00:00"), 3)).toDF("id", "pkey", "d")
      .pipe(df => ins("part_right", df))
    // .out:3459 — one row: (1, 2020-12-01 00:00:00)
    val out = sql(
      """select r.id, l.pkey from part_left l inner join part_right r
        |on (date_trunc('day', r.pkey) = l.pkey
        |    and r.pkey between '2020-12-01 00:00:00'::timestamp and
        |                       '2020-12-03 00:00:59'::timestamp)""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getAs[java.time.LocalDateTime](1).toString))
    assert(out.toSeq == Seq((1, "2020-12-01T00:00")))
  }
}
