package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** Window functions — reference ExecWindowAgg (nodeWindowAgg.c:1993),
  * ranking fns (windowfuncs.c:82-211), ROWS/RANGE frames incl. RANGE
  * value offsets (nodeWindowAgg.c:1543-1785). Every ORDER BY includes a
  * unique tiebreaker so lead/lag/first/last are deterministic.
  */
object WindowQueries {

  val queries: Map[String, QueryFn] = Map(

    // Named WINDOW clause (gram.y window_clause): one definition, two
    // over-references — both engines parse the same text.
    "q225_named_window" -> ((s, d) => sql(s, d,
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS running,
        |  ROW_NUMBER() OVER w AS rn
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
        .stripMargin)),

    // Ranking family with ties: rank vs dense_rank diverge on equal acctbal.
    "q60_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, d, "customer").select(
        col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"),
        ntile(4).over(w).as("quartile"))
    }),

    // lead/lag/first/last/nth (leadlag_common windowfuncs.c:39).
    "q61_window_leadlag" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_totalprice")).over(wf).as("first_price"),
        last(col("o_totalprice")).over(wf).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(wf).as("second_price"))
    }),

    // IGNORE NULLS variants of the value window functions
    // (windowfuncs.c leadlag_common's ignore-nulls path; SQL:2008
    // <null treatment>): NULLs planted on every third order key.
    "q173_window_ignore_nulls" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .withColumn("v", when(col("o_orderkey") % 3 =!= 0, col("o_totalprice")))
        .select(col("o_custkey"), col("o_orderkey"), col("v"),
          lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev_nn"),
          lead(col("v"), 1, null, ignoreNulls = true).over(w).as("next_nn"),
          first(col("v"), ignoreNulls = true).over(wf).as("first_nn"),
          last(col("v"), ignoreNulls = true).over(wf).as("last_nn"),
          nth_value(col("v"), 2, ignoreNulls = true).over(wf).as("second_nn"))
    }),

    // ROWS frame running/sliding aggregates. Note: the synthetic data has
    // duplicate (l_orderkey, l_linenumber) pairs, so the order key extends
    // to a full tiebreak — equal-in-all-keys rows are interchangeable.
    "q62_window_rows_frame" -> ((s, d) => {
      val w = Window.partitionBy("l_orderkey").orderBy(
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_partkey"), col("l_suppkey"))
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        sum(dec(col("l_quantity"))).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_qty"),
        sum(dec(col("l_quantity"))).over(w.rowsBetween(-2, Window.currentRow))
          .cast("double").as("sliding3_qty"),
        count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("running_n"))
    }),

    // RANGE frames with value offsets: numeric offset + interval offset
    // over a timestamp order key (the §2.5 RANGE-value-offset row).
    "q63_window_range_frame" -> ((s, d) => sql(s, d,
      """SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_total,
        |  COUNT(*) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL '30' DAY PRECEDING AND CURRENT ROW) AS n_last_30d
        |FROM orders""".stripMargin)),

    // Aggregates over unbounded partition windows + global window.
    "q64_window_agg_over" -> ((s, d) => {
      val wp = Window.partitionBy("l_returnflag")
      t(s, d, "lineitem")
        .where(col("l_orderkey") <= 1000)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"),
          sum(dec(col("l_quantity"))).over(wp).cast("double").as("flag_qty"),
          count(lit(1)).over(wp).as("flag_n"),
          (dec(col("l_quantity")).cast("double") * count(lit(1)).over(wp)).as("scaled"))
    })
  )

  val queriesExtra: Map[String, QueryFn] = Map(
    // Multiple windows over different partitionings in one projection —
    // the reference plans this as a Sequence of WindowAgg nodes
    // (nodeWindowAgg.c "multiple windows via Sequence of WindowAggs");
    // Spark stacks WindowExec operators the same way.
    "q65_window_multiwindow" -> ((s, d) => {
      val byCust = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val byStatus = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        row_number().over(byCust).as("nth_order_of_cust"),
        rank().over(byStatus).as("price_rank_in_status"),
        count(lit(1)).over(Window.partitionBy("o_custkey")).as("cust_orders"))
    }),

    // GROUPS frame mode (nodeWindowAgg.c FRAMEOPTION_GROUPS; SQL:2011):
    // Spark has no GROUPS frames, but GROUPS BETWEEN n PRECEDING AND m
    // FOLLOWING ≡ RANGE ±n/±m over the dense_rank of the order key —
    // peer groups become consecutive integers, so the value-offset RANGE
    // frame walks whole groups. Verified against DuckDB's native GROUPS.
    "q120_window_groups_frame" -> ((s, d) => {
      val qb = floor(col("l_quantity") / 10).cast("int")
      val wOrd = Window.partitionBy("l_orderkey").orderBy(col("qb"))
      val wG = Window.partitionBy("l_orderkey").orderBy(col("g"))
        .rangeBetween(-1, 1)
      t(s, d, "lineitem")
        .select(col("l_orderkey"), qb.as("qb"), col("l_extendedprice"))
        .withColumn("g", dense_rank().over(wOrd))
        .select(col("l_orderkey"), col("qb"),
          sum(dec(col("l_extendedprice"))).over(wG).cast("double").as("grp_sum"),
          count(lit(1)).over(wG).as("grp_n"))
    }),

    // Window aggregate FILTER clause (PG: agg FILTER (WHERE ...) OVER w;
    // parse_agg.c): Spark lacks FILTER on window functions — the rewrite
    // is the conditional-NULL argument, which every SQL aggregate
    // ignores. Verified against DuckDB's native window FILTER.
    "q126_window_filter" -> ((s, d) => sql(s, d,
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |           THEN CAST(o_totalprice AS DECIMAL(18,2)) END) OVER w
        |       AS DOUBLE) AS f_total,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) OVER w AS f_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)),

    // Calendar-spine gap filling with LOCF (generate_series scaffold +
    // IGNORE NULLS last_value — the PG time-series idiom the reference
    // runs via generate_series joins; nodeWindowAgg ignore-nulls path).
    "q125_gapfill_locf" -> ((s, d) => sql(s, d,
      """WITH days AS (
        |  SELECT explode(sequence(DATE'1997-01-01', DATE'1997-03-31',
        |                          interval 1 day)) AS d
        |), daily AS (
        |  SELECT o_orderstatus, CAST(o_orderdate AS DATE) AS d,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY 1, 2
        |), spine AS (
        |  SELECT st.o_orderstatus, days.d, daily.total
        |  FROM days CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) st
        |  LEFT JOIN daily ON daily.o_orderstatus = st.o_orderstatus
        |                 AND daily.d = days.d)
        |SELECT o_orderstatus, d,
        |  last_value(total, true) OVER (PARTITION BY o_orderstatus ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total_locf
        |FROM spine""".stripMargin)),

    // Frame EXCLUDE clauses (SQL:2011 EXCLUDE CURRENT ROW / GROUP /
    // TIES; nodeWindowAgg.c FRAMEOPTION_EXCLUDE_*): Spark lacks them,
    // but over a RANGE frame they are exact decimal arithmetic on the
    // inclusive frame — minus the current row, minus the peer group, or
    // peers-minus-self — with NULL guards where the exclusion empties
    // the frame. Verified against DuckDB's native EXCLUDE.
    "q121_window_exclude" -> ((s, d) => {
      val qb = floor(col("l_quantity") / 10).cast("int")
      val w = Window.partitionBy("l_orderkey").orderBy(col("qb"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val cur = dec(col("l_extendedprice"))
      val frameSum = sum(dec(col("l_extendedprice"))).over(w)
      val frameN = count(lit(1)).over(w)
      val peerSum = sum(dec(col("l_extendedprice")))
        .over(Window.partitionBy("l_orderkey", "qb"))
      val peerN = count(lit(1)).over(Window.partitionBy("l_orderkey", "qb"))
      t(s, d, "lineitem")
        .select(col("l_orderkey"), qb.as("qb"), col("l_extendedprice"))
        .select(col("l_orderkey"), col("qb"),
          when(frameN > 1, frameSum - cur).cast("double").as("excl_current"),
          when(frameN > peerN, frameSum - peerSum).cast("double").as("excl_group"),
          (frameSum - peerSum + cur).cast("double").as("excl_ties"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q225_named_window" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS running,
        |  ROW_NUMBER() OVER w AS rn
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
        .stripMargin,
    "q126_window_filter" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FILTER (WHERE o_orderstatus = 'F') OVER w AS DOUBLE) AS f_total,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') OVER w AS f_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q125_gapfill_locf" ->
      """WITH days AS (
        |  SELECT CAST(unnest(generate_series(DATE '1997-01-01', DATE '1997-03-31',
        |                                     INTERVAL 1 DAY)) AS DATE) AS d
        |), daily AS (
        |  SELECT o_orderstatus, CAST(o_orderdate AS DATE) AS d,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY 1, 2
        |), spine AS (
        |  SELECT st.o_orderstatus, days.d, daily.total
        |  FROM days CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) st
        |  LEFT JOIN daily ON daily.o_orderstatus = st.o_orderstatus
        |                 AND daily.d = days.d)
        |SELECT o_orderstatus, d,
        |  LAST_VALUE(total IGNORE NULLS) OVER (PARTITION BY o_orderstatus ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total_locf
        |FROM spine""".stripMargin,
    // DuckDB 1.0 implements neither GROUPS nor EXCLUDE, so the oracle
    // spells the identical dense_rank/frame-arithmetic construction in
    // SQL (engine parity); the rewrite's equivalence to the SQL:2011
    // semantics themselves is pinned by a hand-computed fixture in
    // ReferencePatternsSpec.
    "q120_window_groups_frame" ->
      """WITH b AS (SELECT l_orderkey, CAST(FLOOR(l_quantity / 10) AS INT) AS qb,
        |                  l_extendedprice FROM lineitem),
        |g AS (SELECT b.*, DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY qb) AS g
        |      FROM b)
        |SELECT l_orderkey, qb,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS grp_sum,
        |  COUNT(*) OVER w AS grp_n
        |FROM g
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY g
        |             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)""".stripMargin,
    "q121_window_exclude" ->
      """WITH b AS (SELECT l_orderkey, CAST(FLOOR(l_quantity / 10) AS INT) AS qb,
        |                  l_extendedprice FROM lineitem)
        |SELECT l_orderkey, qb,
        |  CASE WHEN COUNT(*) OVER wf > 1
        |       THEN CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER wf
        |                 - CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) END AS excl_current,
        |  CASE WHEN COUNT(*) OVER wf > COUNT(*) OVER wp
        |       THEN CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER wf
        |                 - SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER wp AS DOUBLE) END AS excl_group,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER wf
        |       - SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER wp
        |       + CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS excl_ties
        |FROM b
        |WINDOW wf AS (PARTITION BY l_orderkey ORDER BY qb
        |              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |       wp AS (PARTITION BY l_orderkey, qb)""".stripMargin,
    "q65_window_multiwindow" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |       ORDER BY o_orderdate ASC, o_orderkey ASC) AS INT) AS nth_order_of_cust,
        |  CAST(RANK() OVER (PARTITION BY o_orderstatus
        |       ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS price_rank_in_status,
        |  COUNT(*) OVER (PARTITION BY o_custkey) AS cust_orders
        |FROM orders""".stripMargin,
    "q60_window_rank" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS rn,
        |  CAST(RANK() OVER w AS INT) AS rnk,
        |  CAST(DENSE_RANK() OVER w AS INT) AS drnk,
        |  PERCENT_RANK() OVER w AS prnk,
        |  CUME_DIST() OVER w AS cdist,
        |  CAST(NTILE(4) OVER w AS INT) AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)""".stripMargin,
    "q61_window_leadlag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_totalprice, 1) OVER w AS next_price,
        |  FIRST_VALUE(o_totalprice) OVER wf AS first_price,
        |  LAST_VALUE(o_totalprice) OVER wf AS last_price,
        |  NTH_VALUE(o_totalprice, 2) OVER wf AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
        |       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "q173_window_ignore_nulls" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |  CASE WHEN o_orderkey % 3 <> 0 THEN o_totalprice END AS v FROM orders)
        |SELECT o_custkey, o_orderkey, v,
        |  LAG(v, 1 IGNORE NULLS) OVER w AS prev_nn,
        |  LEAD(v, 1 IGNORE NULLS) OVER w AS next_nn,
        |  FIRST_VALUE(v IGNORE NULLS) OVER wf AS first_nn,
        |  LAST_VALUE(v IGNORE NULLS) OVER wf AS last_nn,
        |  NTH_VALUE(v, 2 IGNORE NULLS) OVER wf AS second_nn
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
        |       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "q62_window_rows_frame" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w
        |       AS DOUBLE) AS running_qty,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (w2
        |       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sliding3_qty,
        |  COUNT(*) OVER w AS running_n
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey
        |             ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |       w2 AS (PARTITION BY l_orderkey
        |             ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey)""".stripMargin,
    "q63_window_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_total,
        |  COUNT(*) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL '30' DAY PRECEDING AND CURRENT ROW) AS n_last_30d
        |FROM orders""".stripMargin,
    "q64_window_agg_over" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_returnflag) AS DOUBLE) AS flag_qty,
        |  COUNT(*) OVER (PARTITION BY l_returnflag) AS flag_n,
        |  CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) *
        |    (COUNT(*) OVER (PARTITION BY l_returnflag)) AS scaled
        |FROM lineitem WHERE l_orderkey <= 1000""".stripMargin
  )
}
