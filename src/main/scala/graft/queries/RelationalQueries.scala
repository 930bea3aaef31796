package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.RecursiveCte
import Q._

/** The relational spine: scans, projection/filter, all join types,
  * aggregation (plain / DQA / grouping sets / ordered-set), set
  * operations, sort/limit, subqueries, recursive CTE.
  *
  * Each entry mirrors a reference executor node (cited per query); the
  * physical plan is left to Catalyst — 2-stage aggs, broadcast vs shuffle
  * joins, and pushdown all come from the declarative shape.
  */
object RelationalQueries {

  val queries: Map[String, QueryFn] = Map(

    // SeqScan → filter → 2-stage hash agg → sort. Reference ExecAgg
    // nodeAgg.c:1123 + two-stage distributed agg cdbgroup.c:1247.
    "q01_tpch_q1_agg" -> ((s, d) => {
      val l = t(s, d, "lineitem").where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      val disc = dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
      val charge = disc * (lit(1).cast("decimal(18,2)") + dec(col("l_tax")))
      l.groupBy("l_returnflag", "l_linestatus").agg(
        sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_extendedprice")).as("sum_base_price"),
        sum(disc).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Projection + filter (Result node, nodeResult.c:131); pushdown-friendly.
    "q02_filter_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .where(col("l_quantity") > 45 && col("l_discount") >= 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net"))),

    // ValuesScan (nodeValuesscan.c) → LocalRelation.
    "q03_values_scan" -> ((s, d) => {
      val df = s.createDataFrame(Seq(
        (1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", 3.5), (4, "delta", 4.5)))
        .toDF("id", "name", "score")
      df.where(col("score") > 2.0).select(col("id"), col("name"), col("score"))
    }),

    // FunctionScan / generate_series (pg_proc; SURVEY §2.1).
    "q04_generate_series" -> ((s, d) =>
      s.range(1, 1001).select(col("id"))
        .groupBy((col("id") % 7).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("total"),
          min(col("id")).as("lo"), max(col("id")).as("hi"))),

    // generate_series over timestamps and dates with INTERVAL steps
    // (pg_proc generate_series(timestamp, timestamp, interval) —
    // FunctionScan §2.1): sequence() with an interval step, exploded.
    "q168_series_ts" -> ((s, d) => sql(s, d,
      """SELECT CAST(ts AS STRING) AS tick, 'hourly6' AS kind,
        |       year(ts) AS yr, dayofmonth(ts) AS dom, hour(ts) AS hr
        |FROM (SELECT explode(sequence(TIMESTAMP '2024-01-01 00:00:00',
        |  TIMESTAMP '2024-01-05 00:00:00', INTERVAL 6 HOUR)) AS ts)
        |UNION ALL
        |SELECT CAST(dt AS STRING), 'weekly', year(dt), dayofmonth(dt), 0
        |FROM (SELECT explode(sequence(DATE '2024-01-01',
        |  DATE '2024-03-01', INTERVAL 7 DAY)) AS dt)""".stripMargin)),

    // Boolean + bitwise aggregate family (pg_proc bool_and/bool_or/
    // every, bit_and/bit_or/bit_xor over int — §2.4): straight 2-stage
    // hash aggregates, map-side partials.
    "q169_bool_bit_aggs" -> ((s, d) =>
      t(s, d, "orders").groupBy("o_orderstatus")
        .agg(expr("bool_and(o_totalprice > 1000.0)").as("all_gt1k"),
          expr("bool_or(o_orderpriority = '1-URGENT')").as("any_urgent"),
          expr("every(o_custkey > 0)").as("every_pos"),
          expr("bit_and(o_custkey & 255)").as("band"),
          expr("bit_or(o_custkey % 16)").as("bor"),
          expr("bit_xor(o_orderkey % 8)").as("bxor"),
          count(lit(1)).as("n"))),

    // contrib/tablefunc connectby('edges','keyid','parent','row1',0,'~'):
    // hierarchical traversal emitting (keyid, parent, level, branch
    // path), via the same distributed fixpoint as WITH RECURSIVE —
    // each frontier is one distributed join, the loop is driver-side
    // control flow only.
    "q170_connectby" -> ((s, d) => {
      graft.Tables.register(s, d)
      val edges = s.sql(
        """SELECT * FROM VALUES
          |  ('row2','row1'),('row3','row1'),('row4','row2'),('row5','row2'),
          |  ('row6','row4'),('row7','row3'),('row8','row6'),('row9','row5')
          |  AS t(keyid, parent)""".stripMargin)
      val seed = s.sql(
        "SELECT 'row1' AS keyid, CAST(NULL AS STRING) AS parent, " +
          "0 AS level, 'row1' AS branch")
      graft.operators.RecursiveCte.fixpoint(seed, f =>
        edges.as("e").join(f.as("p"), col("e.parent") === col("p.keyid"))
          .select(col("e.keyid"), col("e.parent"),
            (col("p.level") + 1).as("level"),
            concat(col("p.branch"), lit("~"), col("e.keyid")).as("branch")))
    }),

    // Shared CTE (ShareInputScan nodeShareInputScan.c) — one subtree, two consumers.
    "q05_cte_shared" -> ((s, d) => sql(s, d,
      """WITH t AS (SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_dec
        |           FROM orders GROUP BY o_custkey),
        |     thr AS (SELECT CAST(SUM(total_dec) AS DOUBLE)/COUNT(*) AS m FROM t)
        |SELECT t.o_custkey, CAST(t.total_dec AS DOUBLE) AS total
        |FROM t, thr WHERE CAST(t.total_dec AS DOUBLE) > thr.m""".stripMargin)),

    // SubqueryScan (nodeSubqueryscan.c) — nested DataFrame.
    "q06_subquery_scan" -> ((s, d) => {
      val sub = t(s, d, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_custkey"), col("o_totalprice"))
      sub.groupBy("o_custkey").agg(sumd(col("o_totalprice")).as("f_total"))
        .where(col("f_total") > 300000.0)
    }),

    // Repeat node (nodeRepeat.c) — emit each tuple N times via
    // explode(sequence) / posexplode.
    "q07_repeat" -> ((s, d) =>
      t(s, d, "nation").select(col("n_name"),
        explode(sequence(lit(0), lit(2))).as("i"))),

    // Material / ShareInputScan: one materialized subtree, two consumers
    // (persist + ReuseExchange analog of nodeMaterial.c / planshare.c).
    "q08_material_reuse" -> ((s, d) => {
      val base = t(s, d, "orders").groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("total"))
        .persist()
      base.select(col("o_orderstatus"), col("n").as("metric"), lit("count").as("kind"))
        .union(base.select(col("o_orderstatus"),
          col("total").cast("long").as("metric"), lit("total_floor").as("kind")))
    }),

    // Set-returning function / UDTF (RETURNS SETOF, nodeFunctionscan.c +
    // Generator expressions): posexplode over tokenized documents.
    "q55_udtf_posexplode" -> ((s, d) =>
      t(s, d, "documents").where(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))),

    // TABLE()-input function (nodeTableFunction.c, tablefuncapi.h) —
    // whole-table UDTF via typed mapPartitions; row-wise logic so the
    // result is partition-invariant.
    "q56_table_function" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      t(s, d, "customer").select(col("c_custkey"), col("c_name"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (k, name) =>
          val vowels = name.count("aeiouAEIOU".contains(_))
          (k, name.length, vowels)
        })
        .toDF("c_custkey", "name_len", "n_vowels")
    }),

    // Custom external protocol via DataSource V2 (ExternalScan custom
    // protocol, url.c:37 / contrib/extprotocol) — deterministic sequence
    // source with column pruning + split-per-partition reads.
    "q09_dsv2_scan" -> ((s, d) =>
      s.read.format("graft.sources.SeqSource")
        .option("start", "0").option("end", "10000").option("partitions", "8")
        .load()
        .groupBy((col("id") % 7).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("val")).as("sum_val"),
          countDistinct(col("tag")).as("n_tags"))),

    // Hash join inner (ExecHashJoin nodeHashjoin.c:512).
    "q10_join_inner" -> ((s, d) => {
      val rev = dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("c_mktsegment")
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_rows"))
    }),

    // Left outer join, NULL-preserving aggregation over the outer side.
    "q11_join_left" -> ((s, d) =>
      t(s, d, "customer").join(t(s, d, "orders"),
        col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          sumd(col("o_totalprice")).as("total_spent"))),

    // Right outer join (planner mirror of left; nodeHashjoin.c right-join paths).
    "q12_join_right" -> ((s, d) =>
      t(s, d, "orders").join(t(s, d, "customer"),
        col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_mktsegment")
        .agg(count(col("o_orderkey")).as("n_orders"), count(lit(1)).as("n_rows"))),

    // Full outer join with asymmetric sides (nodeMergejoin.c full-outer path).
    "q13_join_full" -> ((s, d) => {
      val a = t(s, d, "customer").where(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_acctbal"))
      val b = t(s, d, "orders").where(col("o_orderstatus") === "P")
        .groupBy("o_custkey").agg(count(lit(1)).as("n_p_orders"))
      a.join(b, col("c_custkey") === col("o_custkey"), "full")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_acctbal"), col("n_p_orders"))
    }),

    // Left semi join (HashJoin semi mode; cdbsubselect.c convert_EXPR_to_join).
    "q14_join_semi" -> ((s, d) =>
      t(s, d, "customer").join(t(s, d, "orders").where(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")),

    // Left anti join (HashJoin anti mode) — filtered right side so the
    // result is non-empty on the fixtures (every customer has orders).
    "q15_join_anti" -> ((s, d) =>
      t(s, d, "customer").join(
        t(s, d, "orders").where(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_acctbal")),

    // Null-aware NOT IN anti join (cdbsubselect.c:1465 convert_IN_to_antijoin):
    // part 1 has no NULLs in the subquery; part 2 injects one NULL, which
    // under SQL NOT IN semantics empties the result.
    "q16_notin_nullaware" -> ((s, d) => sql(s, d,
      """SELECT 'no_nulls' AS variant, c_custkey FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT 'with_nulls' AS variant, c_custkey FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_custkey END
        |   FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin)),

    // Star join with replicated small dims (TPC-H Q5 shape). Broadcast =
    // the reference's Motion BROADCAST / DISTRIBUTED REPLICATED
    // (nodeMotion.c, cdbpathlocus.h) — asserted in PlanSpec.
    "q17_join_broadcast_star" -> ((s, d) => {
      val rev = dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        // supplier scales with SF (unlike nation/region) — no broadcast
        // hint; AQE broadcasts it while small and shuffles at scale.
        .join(t(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
    }),

    // Cross join (NestLoop, nodeNestloop.c:366).
    "q18_cross_join" -> ((s, d) =>
      t(s, d, "nation").crossJoin(t(s, d, "region"))
        .select(col("n_name"), col("r_name"))),

    // Band (theta) join |x-y| < eps — planned as a quantized-bucket
    // equi-join (operators.BandJoin) instead of the BNLJ Spark would
    // pick: scales with both sides large, no broadcast requirement.
    // Reference analog: NestLoop/MergeJoin inequality bands.
    "q19_band_join" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_acctbal"))
      val sup = t(s, d, "supplier").select(col("s_suppkey"), col("s_acctbal"))
      graft.operators.BandJoin.bandJoin(c, sup, "c_acctbal", "s_acctbal", 1.0)
        .select(col("c_custkey"), col("s_suppkey"),
          (col("c_acctbal") - col("s_acctbal")).as("bal_diff"))
    }),

    // Multiple DISTINCT-qualified aggregates (3-phase DQA, cdbgroup.c:2146,
    // CXformSplitDQA.cpp) → Catalyst RewriteDistinctAggregates/Expand.
    "q20_dqa" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag").agg(
        countDistinct(col("l_partkey")).as("nd_parts"),
        countDistinct(col("l_suppkey")).as("nd_supps"),
        count(lit(1)).as("n_rows"),
        sumd(col("l_quantity")).as("sum_qty"))),

    // Aggregate FILTER (WHERE ...) clauses (gram.y filter_clause,
    // nodeAgg.c aggfilter) — the SQL:2003 spelling every migrated PG
    // report uses; compiles to conditional aggregation, one pass.
    "q241_agg_filter" -> ((s, d) => {
      graft.Tables.register(s, d)
      s.sql("""SELECT l_returnflag,
              |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
              |  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
              |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              |       FILTER (WHERE l_tax > 0.04) AS DOUBLE) AS taxed_price,
              |  COUNT(DISTINCT l_suppkey) FILTER (WHERE l_linestatus = 'F')
              |    AS nd_supp_f
              |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    }),

    // contrib/tablefunc crosstab(text) — positional category pivot
    // (tablefunc.c:349): values fill declared columns left-to-right in
    // category order; routed through Graft.execute's function-scan
    // rewrite onto one hash aggregation (collect_list bounded by the
    // category count).
    "q247_crosstab" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT * FROM crosstab(
          |  'SELECT o_orderpriority, o_orderstatus, count(*)
          |   FROM orders GROUP BY 1, 2 ORDER BY 1, 2')
          |AS c(priority text, s1 int4, s2 int4, s3 int4)""".stripMargin).get
    }),

    // contrib/tablefunc crosstab(text, text) — hash crosstab
    // (tablefunc.c:632): the category list pins column positions,
    // missing categories -> NULL, extra columns between rowid and
    // category carry through; maps to groupBy().pivot(cat, categories).
    "q248_crosstab_hash" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT * FROM crosstab(
          |  'SELECT o_orderpriority, length(o_orderpriority), o_orderstatus,
          |          count(*) FROM orders GROUP BY 1, 2, 3 ORDER BY 1',
          |  'SELECT DISTINCT o_orderstatus FROM orders ORDER BY 1')
          |AS c(priority text, plen int4, st_f int8, st_o int8, st_p int8)"""
          .stripMargin).get
    }),

    // generate_series through the SQL front door (int.c SRF): FROM
    // position with alias naming the column, plus PG's empty-set
    // direction guard — all codegen explode(sequence).
    "q265_generate_series_sql" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT g, g % 3 AS m, g / 4 AS b
          |FROM generate_series(1, 20) AS g
          |UNION ALL
          |SELECT g, g, g FROM generate_series(5, 1) AS g""".stripMargin).get
    }),

    // PG integer division (int4div): int / int TRUNCATES through the
    // front door (PgIntDiv analyzed-plan rewrite); an explicit float
    // cast keeps exact division.
    "q266_int_division" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT o_custkey / 100 AS bucket,
          |       o_custkey::float8 / 200 AS exact_half,
          |       count(*) AS n
          |FROM orders WHERE o_orderkey <= 64 GROUP BY 1, 2""".stripMargin).get
    }),

    // PG 1-based array subscripts (arrayfuncs.c): expr[i] through the
    // front door is try_element_at — 1-based, NULL out of bounds.
    "q267_subscript_1based" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT n_name,
          |  (string_to_array(n_name, 'A'))[1] AS first_piece,
          |  (string_to_array(n_name, 'A'))[99] AS oob
          |FROM nation""".stripMargin).get
    }),

    // information_schema compat views (upstream information_schema.sql
    // via PgCatalog snapshots): column introspection over the catalog.
    "q268_information_schema" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT table_name, column_name, ordinal_position
          |FROM information_schema.columns
          |WHERE table_name IN ('nation', 'region')""".stripMargin).get
    }),

    // FETCH FIRST ... WITH TIES with an ORDINAL order key (PG 13
    // limit_clause): the ordinal resolves to the select list — inside
    // the rank() window a bare integer would be a constant.
    "q269_with_ties_ordinal" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT o_orderpriority, o_orderkey FROM orders
          |WHERE o_orderkey <= 200
          |ORDER BY 1 FETCH FIRST 5 ROWS WITH TIES""".stripMargin).get
    }),

    // COMPLEX through the SQL front door (complex_type.c): typed
    // literal, constructor, field access, magnitude — all plain
    // struct<re,im> column algebra.
    "q270_complex_sql" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT o_orderkey,
          |  re(c) AS re, im(c) AS im,
          |  round(complex_abs(c), 6) AS mag,
          |  re(conj(c)) AS conj_re, im(conj(c)) AS conj_im,
          |  c = COMPLEX '3+4i' AS is_3_4
          |FROM (SELECT o_orderkey,
          |        complex(CAST(o_orderkey % 5 AS DOUBLE), 4) AS c
          |      FROM orders WHERE o_orderkey <= 100) t""".stripMargin).get
    }),

    // CREATE FUNCTION DEFAULT + VARIADIC parameter binding (gram.y
    // func_arg_with_default / funcapi.c): defaulted trailing args fill,
    // the variadic tail collects into one array argument.
    "q271_fn_default_variadic" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        "CREATE OR REPLACE FUNCTION gsum_q271(a int, b int DEFAULT 10) " +
          "RETURNS int AS 'SELECT a + b' LANGUAGE SQL")
      graft.Graft.execute(s,
        "CREATE OR REPLACE FUNCTION vmax_q271(VARIADIC nums int[]) " +
          "RETURNS int AS 'SELECT array_max(nums)' LANGUAGE SQL")
      graft.Graft.execute(s,
        """SELECT o_orderkey,
          |  gsum_q271(CAST(o_orderkey % 5 AS INT)) AS defaulted,
          |  gsum_q271(CAST(o_orderkey % 5 AS INT), 100) AS explicit,
          |  vmax_q271(CAST(o_orderkey % 3 AS INT), 7, 2) AS vmax
          |FROM orders WHERE o_orderkey <= 100""".stripMargin).get
    }),

    // PG decode(text, 'hex'|'base64') → bytea (encode.c), beside the
    // Oracle-style CASE decode both engines share.
    "q272_decode_bytea" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT n_name,
          |  CAST(decode(hex(n_name), 'hex') AS STRING) AS roundtrip,
          |  CAST(decode(base64(n_name), 'base64') AS STRING) AS roundtrip64
          |FROM nation""".stripMargin).get
    }),

    // EXPLAIN (FORMAT JSON): machine-parseable plan document (one row;
    // plan shape is engine-defined → rows-only check).
    "q273_explain_json" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        "EXPLAIN (FORMAT JSON) SELECT n_regionkey, count(*) " +
          "FROM nation GROUP BY 1").get
    }),

    // Hypothetical-set aggregates with DIRECT arguments
    // (orderedsetaggs.c hypothetical_rank_common): where would v rank
    // among the group's values — each form compiles to its defining
    // count, fully codegen.
    "q274_hypothetical_direct" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT
          |  rank(15) within group (order by o_orderkey) AS r,
          |  dense_rank(15) within group (order by o_orderkey) AS dr,
          |  percent_rank(15) within group (order by o_orderkey) AS pr,
          |  cume_dist(15) within group (order by o_orderkey) AS cd
          |FROM orders WHERE o_orderkey <= 100""".stripMargin).get
    }),

    // Multi-fraction ordered-set aggregates (percentile over a
    // fraction ARRAY): cont expands to native per-element calls, disc
    // compiles to its sorted-position definition (works on strings,
    // which Spark's numeric-only builtin cannot).
    "q275_percentile_array" -> ((s, d) => {
      graft.Tables.register(s, d)
      // the fraction ARRAYS are the capability under test; the result
      // arrays are stringified because the driver harness's pandas
      // compare cannot sort list-typed columns (r16 adjudication)
      graft.Graft.execute(s,
        """SELECT
          |  array_to_string(percentile_cont(array[0.25, 0.5, 0.75])
          |    within group (order by o_orderkey), ',') AS cont,
          |  array_to_string(percentile_disc(array[0.25, 0.5, 0.75])
          |    within group (order by o_orderpriority), ',') AS disc
          |FROM orders WHERE o_orderkey <= 1000""".stripMargin).get
    }),

    // SQL WINDOW clause (gram.y window_clause): named specs referenced
    // from any clause position, frame refinement `OVER (w ROWS ...)`,
    // and window-over-window definitions — all expanded inline.
    "q276_window_clause" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT o_orderkey, rank() OVER w AS rnk,
          |  count(*) OVER (w ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)
          |    AS near
          |FROM orders WHERE o_orderkey <= 100
          |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
          |ORDER BY rank() OVER w, o_orderkey""".stripMargin).get
    }),

    // Deferred JOIN ... ON nesting (gram.y joined_table is
    // right-recursive): `a left join b join c ON bc ON ab` groups as
    // `a left join (b join c ON bc) ON ab`.
    "q277_nested_join_on" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT n.n_name, r.r_name, c.c_custkey
          |FROM nation n
          |  LEFT JOIN region r
          |    JOIN customer c
          |    ON c.c_custkey % 5 = r.r_regionkey AND c.c_custkey <= 50
          |  ON r.r_regionkey = n.n_regionkey""".stripMargin).get
    }),

    // Aggregate-internal ORDER BY (gram.y agg_order): ordered
    // array_agg / string_agg through collect->sort->project (NULL
    // elements survive via struct wrapping — PG keeps them).
    "q278_ordered_agg_sql" -> ((s, d) => {
      graft.Tables.register(s, d)
      // ordered array_agg is the capability; stringified so the
      // driver's pandas compare can sort the column (r16 adjudication)
      graft.Graft.execute(s,
        """SELECT o_orderstatus,
          |  array_to_string(
          |    array_agg(o_orderkey ORDER BY o_orderkey DESC), ',')
          |    AS keys_desc,
          |  string_agg(CAST(o_orderkey AS STRING), '|'
          |             ORDER BY o_orderkey) AS keys_asc
          |FROM orders WHERE o_orderkey <= 200
          |GROUP BY o_orderstatus""".stripMargin).get
    }),

    // DML battery: SERIAL dense sequence defaults, INSERT DEFAULT
    // VALUES, DELETE with an alias and a JOIN-shaped USING list
    // (NOT EXISTS keep-rows swap).
    "q279_dml_serial_delete" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s, "DROP TABLE IF EXISTS t279")
      graft.Graft.execute(s, "CREATE TABLE t279 (id SERIAL, k INT, v TEXT)")
      graft.Graft.execute(s,
        "INSERT INTO t279 (k, v) VALUES (0, 'a'), (5, 'b'), (3, 'c'), (99, 'd')")
      graft.Graft.execute(s, "INSERT INTO t279 DEFAULT VALUES")
      graft.Graft.execute(s,
        """DELETE FROM t279 AS t
          |USING nation n JOIN region r ON n.n_regionkey = r.r_regionkey
          |WHERE t.k = n.n_nationkey AND r.r_regionkey = 0""".stripMargin)
      graft.Graft.execute(s, "SELECT id, k, v FROM t279").get
    }),

    // CREATE AGGREGATE over catalog transition functions
    // (create_aggregate.sql shapes): the sfunc/finalfunc pair resolves
    // to the builtin it reconstructs; the name is a pure alias.
    "q280_create_aggregate" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        "CREATE AGGREGATE myavg280 (sfunc = int4_avg_accum, " +
          "basetype = int4, stype = _int8, finalfunc = int8_avg)")
      graft.Graft.execute(s,
        "CREATE AGGREGATE mycnt280 (*) (sfunc = int8inc, stype = int8)")
      graft.Graft.execute(s,
        """SELECT o_orderstatus,
          |  myavg280(CAST(o_orderkey % 97 AS INT)) AS a,
          |  mycnt280(*) AS n
          |FROM orders WHERE o_orderkey <= 500
          |GROUP BY o_orderstatus""".stripMargin).get
    }),

    // Correlated SRFs in FROM: explicit LATERAL generate_series with a
    // correlated bound, and correlated single-row VALUES (both compile
    // to lateral subqueries).
    "q281_lateral_srf" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT n.n_nationkey, g.g, v.x
          |FROM nation n,
          |  lateral generate_series(1, CAST(n.n_nationkey % 3 AS INT)) g,
          |  lateral (values (upper(n.n_name))) v(x)""".stripMargin).get
    }),

    // format() + bool operator functions through the SQL front door
    // (varlena.c text_format, bool.c booleq): the format string
    // compiles driver-side into ONE codegen concat.
    "q282_format_fn" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT n_name,
          |  format('%s #%s is %L', n_name, n_nationkey, lower(n_name))
          |    AS described,
          |  booleq(n_nationkey % 2 = 0, true) AS is_even
          |FROM nation""".stripMargin).get
    }),

    // SRF repetition/arithmetic in the SELECT list (ExecProjectSet,
    // execSRF.c): identical-argument calls are ONE row source in PG's
    // LCM protocol — they hoist to a single shared LATERAL item.
    "q283_srf_select_hoist" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT generate_series(1, 12) AS g,
          |  generate_series(1, 12) * 3 AS g3,
          |  generate_series(1, 12) % 5 AS g5""".stripMargin).get
    }),

    // The canonical plpgsql SETOF shape (pl_exec.c
    // exec_stmt_return_next): `FOR r IN <q> LOOP RETURN NEXT r` — the
    // function IS the query, registered as a table function.
    "q284_plpgsql_setof" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """CREATE OR REPLACE FUNCTION evens284(lim INT) RETURNS SETOF INT
          |AS $$
          |BEGIN
          |  FOR r IN SELECT CAST(n_nationkey AS INT) AS k FROM nation
          |           WHERE n_nationkey % 2 = 0 AND n_nationkey <= lim
          |  LOOP RETURN NEXT r; END LOOP;
          |  RETURN;
          |END;
          |$$ LANGUAGE plpgsql""".stripMargin)
      graft.Graft.execute(s, "SELECT * FROM evens284(20)").get
    }),

    // plpgsql `SELECT ... INTO var` (pl_exec.c exec_stmt_execsql):
    // the scalar query binds the variable; the whole function still
    // inlines to one correlated-subquery expression for Catalyst.
    "q285_plpgsql_select_into" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """CREATE OR REPLACE FUNCTION natcnt285(rk INT) RETURNS BIGINT
          |AS $$
          |DECLARE c BIGINT;
          |BEGIN
          |  SELECT count(*) INTO c FROM nation WHERE n_regionkey = rk;
          |  RETURN c * 10;
          |END;
          |$$ LANGUAGE plpgsql""".stripMargin)
      graft.Graft.execute(s,
        """SELECT r_regionkey,
          |  natcnt285(CAST(r_regionkey AS INT)) AS cnt10
          |FROM region""".stripMargin).get
    }),

    // PG regex surface (regexp.c): replace-FIRST default vs 'g',
    // substring-regex, and the zero-length-match split rules.
    "q286_pg_regex" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT p_partkey,
          |  regexp_replace(p_name, '[aeiou]', '_') AS first_devowel,
          |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS all_devowel,
          |  substring(p_name, '([a-z]+)') AS first_word,
          |  array_to_string(regexp_split_to_array(p_name, ' +'), '|')
          |    AS toks
          |FROM part WHERE p_partkey <= 200""".stripMargin).get
    }),

    // GP timeseries interval_bound bucketing (timestamp.c:328 /
    // numeric.c:2335) — default epoch registration plus shift+reg.
    "q287_interval_bound" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT CAST(interval_bound(o_totalprice, 25000) AS BIGINT)
          |    AS bucket,
          |  CAST(interval_bound(o_totalprice, 25000, 1, 100) AS BIGINT)
          |    AS shifted,
          |  count(*) AS n
          |FROM orders GROUP BY 1, 2""".stripMargin).get
    }),

    // Array function family over text_to_array splits
    // (arrayfuncs.c/varlena.c): cardinality, array_length, 1-based
    // element access.
    "q288_array_funcs" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT p_partkey,
          |  cardinality(string_to_array(p_name, ' ')) AS n_tok,
          |  array_length(string_to_array(p_name, ' '), 1) AS len1,
          |  (string_to_array(p_name, ' '))[1] AS tok1
          |FROM part WHERE p_partkey <= 500""".stripMargin).get
    }),

    // BEGIN/ROLLBACK transaction scopes (xact.c via operators.Txn):
    // the rolled-back mutations leave no trace; COMMITted ones stay.
    "q289_txn_rollback" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s, "DROP TABLE IF EXISTS t289")
      graft.Graft.execute(s,
        """CREATE TABLE t289 AS
          |SELECT n_nationkey AS k, n_name AS nm, n_regionkey AS rk
          |FROM nation""".stripMargin)
      graft.Graft.execute(s, "BEGIN")
      graft.Graft.execute(s, "UPDATE t289 SET nm = 'GONE' WHERE rk = 1")
      graft.Graft.execute(s, "DELETE FROM t289 WHERE rk = 2")
      graft.Graft.execute(s, "INSERT INTO t289 VALUES (999, 'PHANTOM', 9)")
      graft.Graft.execute(s, "ROLLBACK")
      graft.Graft.execute(s, "BEGIN")
      graft.Graft.execute(s, "DELETE FROM t289 WHERE rk = 0")
      graft.Graft.execute(s, "COMMIT")
      graft.Graft.execute(s,
        "SELECT k, nm, rk FROM t289").get
    }),

    // GP grouping-sets composition (parse_agg.c expand_grouping_sets):
    // ROLLUP with composite/alias parts crossed with plain items —
    // every set unions the plain columns — plus multi-arg GROUPING
    // bits and GROUP_ID() numbering of duplicate sets (tle-reference
    // canonicalization; see PgSql.pgGroupingSets).
    "q290_grouping_sets_mix" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT o_orderstatus AS st, o_orderpriority AS pr,
          |  GROUPING(o_orderstatus, o_orderpriority) AS gbits,
          |  GROUP_ID() AS gid, count(*) AS n
          |FROM orders WHERE o_orderkey <= 2000
          |GROUP BY ROLLUP((st), (st, o_orderpriority), (pr)),
          |         o_orderstatus""".stripMargin).get
    }),

    // SRF inside INSERT..VALUES rows (transformInsertStmt +
    // ExecProjectSet lockstep zip, PG >= 10): the shorter series pads
    // NULL; expressions over the call expand per row.
    "q291_srf_values" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s, "DROP TABLE IF EXISTS t291")
      graft.Graft.execute(s, "CREATE TABLE t291 (a INT, b INT, c TEXT)")
      graft.Graft.execute(s,
        "INSERT INTO t291 VALUES (generate_series(1,5), " +
          "generate_series(1,8) * 10, 'z'), (100, 200, 'lit')")
      graft.Graft.execute(s, "SELECT a, b, c FROM t291").get
    }),

    // UPDATE .. FROM a from_list (gram.y from_clause on UPDATE): the
    // joined multi-table source drives the assignment per target row.
    "q292_update_from_list" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s, "DROP TABLE IF EXISTS t292")
      graft.Graft.execute(s,
        """CREATE TABLE t292 AS
          |SELECT n_nationkey AS k, n_name AS nm, n_regionkey AS rk
          |FROM nation""".stripMargin)
      graft.Graft.execute(s,
        """UPDATE t292 SET nm = r_name
          |FROM region reg, nation n2
          |WHERE t292.k = n2.n_nationkey
          |  AND n2.n_regionkey = reg.r_regionkey
          |  AND reg.r_regionkey = 3""".stripMargin)
      graft.Graft.execute(s, "SELECT k, nm, rk FROM t292").get
    }),

    // DROP DEFAULT PARTITION (cdbpartition.c): deletes exactly the
    // rows outside every declared bound — NULL keys included.
    "q293_default_partition_drop" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s, "DROP TABLE IF EXISTS t293")
      graft.Graft.execute(s,
        """CREATE TABLE t293 (a INT, b INT)
          |DISTRIBUTED BY (a)
          |PARTITION BY RANGE (b)
          |  (START (1) END (4) EVERY (1), DEFAULT PARTITION rest)""".stripMargin)
      graft.Graft.execute(s,
        "INSERT INTO t293 VALUES (generate_series(1,8), " +
          "generate_series(1,8)), (99, NULL)")
      graft.Graft.execute(s, "ALTER TABLE t293 DROP DEFAULT PARTITION")
      graft.Graft.execute(s, "SELECT a, b FROM t293").get
    }),

    // PG datetime arithmetic: date + interval is a TIMESTAMP for day,
    // month and sub-day units alike (timestamp.c date_pl_interval).
    "q294_date_interval_ts" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT o_orderkey,
          |  o_orderdate + interval '1 day' AS next_day,
          |  o_orderdate + interval '2 months' AS in_two_months,
          |  o_orderdate + interval '90 mins' AS late_start
          |FROM orders WHERE o_orderkey <= 100""".stripMargin).get
    }),

    // DISTINCT ON at the SQL front door (transformDistinctOnClause):
    // first row per key under the ORDER BY — the window rewrite
    // PgSql.distinctOn builds (q49 is the DataFrame twin).
    "q295_distinct_on_sql" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT DISTINCT ON (o_custkey)
          |  o_custkey, o_orderkey, o_totalprice
          |FROM orders WHERE o_orderkey <= 2000
          |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin).get
    }),

    // pg_partitions introspection (system_views.sql:763): the child
    // identities GP maintenance scripts read — declared name, rank,
    // bounds and boundary text per level-1 partition.
    "q296_pg_partitions" -> ((s, d) => {
      graft.Graft.execute(s, "DROP TABLE IF EXISTS t296")
      graft.Graft.execute(s,
        """CREATE TABLE t296 (id int, amt numeric(10,2))
          |PARTITION BY RANGE (id)
          |( PARTITION small START (0) END (100),
          |  PARTITION big START (100) END (200),
          |  DEFAULT PARTITION other )""".stripMargin)
      graft.Graft.execute(s,
        """SELECT tablename, partitionname, partitiontype,
          |  CAST(partitionrank AS BIGINT) AS rank,
          |  CAST(partitionposition AS BIGINT) AS pos,
          |  partitionrangestart AS range_start,
          |  partitionrangeend AS range_end,
          |  partitionisdefault AS is_default,
          |  partitionboundary AS boundary
          |FROM pg_partitions WHERE tablename = 't296'
          |ORDER BY pos""".stripMargin).get
    }),

    // pg_settings introspection (guc.c show_all_settings): SET values
    // surface through the catalog view clients read back
    "q297_pg_settings" -> ((s, d) => {
      graft.Graft.execute(s, "SET statement_timeout = 3600")
      graft.Graft.execute(s,
        """SELECT name, setting FROM pg_settings
          |WHERE name = 'statement_timeout'""".stripMargin).get
    }),

    // ROLLUP + grouping_id (plangroupext.c, gram.y:723).
    "q21_rollup" -> ((s, d) =>
      t(s, d, "lineitem").rollup("l_returnflag", "l_linestatus").agg(
        grouping_id().as("gid"), count(lit(1)).as("n"),
        sumd(col("l_quantity")).as("sum_qty"))),

    // CUBE + per-column grouping() flags.
    "q22_cube" -> ((s, d) =>
      t(s, d, "orders").cube("o_orderstatus", "o_orderpriority").agg(
        grouping(col("o_orderstatus")).as("g_status"),
        grouping(col("o_orderpriority")).as("g_prio"),
        count(lit(1)).as("n"),
        sumd(col("o_totalprice")).as("total"))),

    // Explicit GROUPING SETS.
    "q23_grouping_sets" -> ((s, d) => sql(s, d,
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)),

    // Ordered-set aggregates (orderedsetaggs.c:407,542; MEDIAN gram.y:14466).
    "q24_ordered_set" -> ((s, d) => sql(s, d,
      """SELECT l_returnflag,
        |       CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p50,
        |       CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p25,
        |       CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p75_disc,
        |       CAST(median(l_quantity) AS DOUBLE) AS med
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Hypothetical-set aggregates (ordered-set family, parse_agg.c):
    // rank/dense_rank/percent_rank/cume_dist of a hypothetical value v
    // WITHIN GROUP — spelled as their counting definitions (the portable
    // form; identical in the oracle).
    "q24b_hypothetical_set" -> ((s, d) => sql(s, d,
      """SELECT l_returnflag,
        |  1 + COUNT(*) FILTER (WHERE l_quantity < 25) AS h_rank,
        |  1 + COUNT(DISTINCT l_quantity) FILTER (WHERE l_quantity < 25) AS h_dense_rank,
        |  CAST(COUNT(*) FILTER (WHERE l_quantity < 25) AS DOUBLE)
        |    / COUNT(*) AS h_percent_rank,
        |  CAST(1 + COUNT(*) FILTER (WHERE l_quantity <= 25) AS DOUBLE)
        |    / (COUNT(*) + 1) AS h_cume_dist
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Deterministic MODE (most frequent, min-value tiebreak) — the
    // portable spelling of mode() WITHIN GROUP.
    "q25_mode_manual" -> ((s, d) => {
      val counts = t(s, d, "lineitem").groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag")
        .orderBy(col("cnt").desc, col("l_quantity").asc)
      counts.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt"))
    }),

    // Ordered array_agg / string_agg (array_userfuncs.c, gp_legacy_string_agg).
    // The aggregated array is still built (array_sort(collect_set(...))) but the
    // catalog output serializes it with array_join so the oracle compare can
    // hash it (raw ARRAY columns crash the driver's pandas sort).
    "q26_array_string_agg" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_linestatus").agg(
        array_join(array_sort(collect_set(col("l_returnflag"))), ",").as("flags"),
        concat_ws(",", array_sort(collect_set(col("l_returnflag")))).as("flags_csv"),
        countDistinct(col("l_returnflag")).as("n_flags"))),

    // array_agg(v ORDER BY other_col) — the SURVEY §7.3 pattern:
    // array_sort(collect_list(struct(sort_key, v))) then project v, since
    // collect_list order is otherwise nondeterministic. Serialized with
    // array_join, this is also general string_agg(v, sep ORDER BY k)
    // (varlena.c:427): the oracle is literally that spelling.
    "q26b_array_agg_ordered" -> ((s, d) =>
      t(s, d, "customer").groupBy("c_nationkey").agg(
        array_join(transform(
          array_sort(collect_list(struct(
            (col("c_acctbal") * -1).as("negbal"), col("c_name").as("name")))),
          e => e.getField("name")), "|").as("names_by_balance"),
        count(lit(1)).as("n"))),

    // string_agg(DISTINCT x, d ORDER BY x) — the PG ordered-distinct
    // aggregation (gram.y within_group_clause); Spark 4's listagg
    // WITHIN GROUP carries the same semantics.
    "q246_string_agg_distinct" -> ((s, d) => {
      graft.Tables.register(s, d)
      s.sql("""SELECT o_orderstatus,
              |  listagg(DISTINCT o_orderpriority, ',')
              |    WITHIN GROUP (ORDER BY o_orderpriority) AS priorities,
              |  COUNT(*) AS n
              |FROM orders GROUP BY o_orderstatus""".stripMargin)
    }),

    // PIVOT (utils/adt/pivot.c).
    "q27_pivot" -> ((s, d) =>
      t(s, d, "orders").join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").pivot("o_orderstatus", Seq("F", "O", "P")).count()
        .na.fill(0L, Seq("F", "O", "P"))),

    // Moment statistics via exact decimal sums (deterministic under any
    // partitioning — the distributed-agg analog of cdbgroup.c 2-stage).
    "q28_stats_manual" -> ((s, d) => {
      val q = dec(col("l_quantity"))
      val p = dec(col("l_extendedprice"))
      t(s, d, "lineitem").groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(q).cast("double").as("sx"),
        sum(q * q).cast("double").as("sxx"),
        sum(p).cast("double").as("sy"),
        sum(p * p).cast("double").as("syy"),
        sum(q * p).cast("double").as("sxy"))
        .select(col("l_returnflag"), col("n"),
          (col("sx") / col("n")).as("mean_qty"),
          ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("var_qty"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) /
            (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
              sqrt(col("syy") - col("sy") * col("sy") / col("n")))).as("corr_qty_price"))
    }),

    // Statistical / linear-regression aggregate family (pg_proc.h OIDs
    // 2818-2830: regr_count/avgx/avgy/sxx/syy/sxy/slope/intercept/r2,
    // covar_pop/samp, corr; accumulators in utils/adt/float.c
    // float8_regr_*). Computed from exact decimal sums through the PG
    // closed forms (same spelling as the oracle → bit-exact, same
    // convention as q28); ScalaTest pins Spark's builtin regr_*/covar_*
    // aggregates against these values. PG null semantics kept: slope and
    // r2 are NULL when Sxx = 0, r2 = 1 when only Syy = 0.
    "q137_regr_family" -> ((s, d) => {
      val x = dec(col("l_quantity"))
      val y = dec(col("l_extendedprice"))
      t(s, d, "lineitem").groupBy("l_returnflag").agg(
        count(lit(1)).cast("double").as("n"),
        sum(x).cast("double").as("sx"),
        sum(x * x).cast("double").as("sxx"),
        sum(y).cast("double").as("sy"),
        sum(y * y).cast("double").as("syy"),
        sum(x * y).cast("double").as("sxy"))
        .select(col("l_returnflag"),
          col("n").cast("long").as("regr_count"),
          (col("sx") / col("n")).as("regr_avgx"),
          (col("sy") / col("n")).as("regr_avgy"),
          (col("sxx") - col("sx") * col("sx") / col("n")).as("bsxx"),
          (col("syy") - col("sy") * col("sy") / col("n")).as("bsyy"),
          (col("sxy") - col("sx") * col("sy") / col("n")).as("bsxy"))
        .select(col("l_returnflag"), col("regr_count"),
          col("regr_avgx"), col("regr_avgy"),
          col("bsxx").as("regr_sxx"), col("bsyy").as("regr_syy"),
          col("bsxy").as("regr_sxy"),
          when(col("bsxx") =!= 0.0, col("bsxy") / col("bsxx")).as("regr_slope"),
          when(col("bsxx") =!= 0.0,
            col("regr_avgy") - (col("bsxy") / col("bsxx")) * col("regr_avgx"))
            .as("regr_intercept"),
          when(col("bsxx") === 0.0, lit(null).cast("double"))
            .when(col("bsyy") === 0.0, lit(1.0d))
            .otherwise(col("bsxy") * col("bsxy") / (col("bsxx") * col("bsyy")))
            .as("regr_r2"),
          (col("bsxy") / col("regr_count").cast("double")).as("covar_pop"),
          when(col("regr_count") > 1,
            col("bsxy") / (col("regr_count").cast("double") - 1.0d))
            .as("covar_samp"),
          when(col("bsxx") =!= 0.0 && col("bsyy") =!= 0.0,
            col("bsxy") / sqrt(col("bsxx") * col("bsyy"))).as("corr"))
    }),

    // User aggregate (CREATE AGGREGATE parity, pg_aggregate.h:33-61) —
    // typed Aggregator registered as "wavg".
    "q29_custom_agg_wavg" -> ((s, d) => sql(s, d,
      """SELECT l_returnflag, wavg(l_extendedprice, l_quantity) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // HLL distinct estimation (gp_hyperloglog.c) — approximate by design,
    // so no SQL oracle (rows-only check). Both the built-in HLL++ and the
    // mergeable Datasketches HLL binary-state aggregate (the exact
    // pg_aggregate combinefn analog for sketches).
    // The sketch aggregates and the exact DISTINCT run as SEPARATE
    // aggregations joined on the 3-row result: mixed in one agg, the
    // DQA rewrite keys the partial on (flag, partkey) and drags both
    // sketches' ~50-field merge state through a distinct-cardinality
    // hash table (measured 2.1 s vs 0.75 s at sf0.1). Two passes of a
    // cheap 2-col scan beat one pass with sketch state per distinct
    // key — at any scale. Same values, same columns.
    "q30_approx_distinct" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val sk = li.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("sketch_parts"))
      val ex = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      sk.join(ex, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("approx_parts"),
          col("sketch_parts"), col("exact_parts"))
    }),

    // Approx percentile sketch (GK) — the 100 TB path next to q24's exact
    // percentiles. With accuracy 1e6 the rank error n/accuracy < 1 at the
    // gate SF, so the sketch is provably rank-exact and the oracle
    // compares against DuckDB's exact discrete percentiles; sketch size
    // stays bounded by the ~50 distinct values, not the accuracy.
    "q30b_approx_percentile" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag").agg(
        expr("approx_percentile(l_quantity, 0.5, 1000000)").as("ap50"),
        expr("approx_percentile(l_quantity, 0.9, 1000000)").as("ap90"))),

    // TPC-H Q6 shape: tight-filter revenue aggregate (pushdown showcase).
    "q31_tpch_q6" -> ((s, d) =>
      t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"), count(lit(1)).as("n"))),

    // TPC-H Q12 shape (adapted: fixtures lack l_shipmode → classify by
    // order priority): conditional 2-way aggregation.
    "q32_priority_class" -> ((s, d) =>
      t(s, d, "orders").join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))),

    // TPC-H Q14 shape: promo revenue share (conditional numerator).
    "q33_tpch_q14" -> ((s, d) => {
      val rev = dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
      t(s, d, "lineitem").join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
        .agg(
          (lit(100.0) * sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
            sum(rev).cast("double")).as("promo_revenue_pct"))
    }),

    // TPC-H Q3 shape: shipping-priority top-10 (join + agg + top-k).
    "q34_tpch_q3" -> ((s, d) => {
      val rev = dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
      t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .where(col("o_orderdate") < lit("1997-03-15").cast("timestamp") &&
          col("l_shipdate") > lit("1997-03-15").cast("timestamp"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // SRFs in the SELECT list (execQual.c:1888 ExprMultipleResult): the
    // reference's historic protocol — sets cycle to their LCM per row
    // (lengths 1..3 against the constant-2 split give 2, 2, and 6
    // output rows). The oracle replays the modular indexing with
    // DuckDB's lcm().
    "q184_srf_targetlist" -> ((s, d) => {
      import graft.operators.Srf
      val base = t(s, d, "orders").where(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"),
          sequence(lit(1L), col("o_orderkey") % 3 + 1L).as("ser"),
          split(col("o_orderpriority"), "-").as("pr"))
      Srf.projectSetLcm(base, Seq("s1" -> col("ser"), "s2" -> col("pr")))
        .select(col("o_orderkey"), col("s1"), col("s2"))
    }),

    // TPC-H Q5: the 6-table local-supplier star — region/nation dims
    // broadcast, the c_nationkey = s_nationkey locality predicate rides
    // the supplier join.
    "q181_tpch_q5" -> ((s, d) => {
      val rev = dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"))
    }),

    // TPC-H Q10 (returned-item report, fixture columns): customers
    // ranked by revenue lost to returns in a quarter; total order via
    // the unique c_custkey tiebreak so the LIMIT boundary is exact.
    "q182_tpch_q10" -> ((s, d) => {
      val rev = dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp") &&
          col("l_returnflag") === "R")
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // TPC-H Q18 (large-volume customers): the >300-quantity orders via
    // a grouped HAVING semi-join, then the customer/orders detail with
    // the per-order quantity sum; o_orderkey tiebreaks the top-100.
    "q183_tpch_q18" -> ((s, d) => {
      val big = t(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .where(col("sum_qty") > 300.0)
        .select(col("l_orderkey").as("big_orderkey"))
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(big, col("o_orderkey") === col("big_orderkey"), "left_semi")
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // TPC-H Q4 (order priority checking): correlated EXISTS over
    // lineitem — plans as a left-semi join on (key, date) with the
    // non-equi part as join condition, no subquery re-execution.
    "q202_tpch_q4" -> ((s, d) =>
      t(s, d, "orders")
        .where(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        .join(t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))),

    // TPC-H Q7 (volume shipping): the two-nation self-join of nation —
    // both nation sides broadcast; the symmetric pair filter sits on
    // the joined result exactly as the spec writes it.
    "q203_tpch_q7" -> ((s, d) => {
      val rev = dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
      val n1 = t(s, d, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      t(s, d, "supplier")
        .join(t(s, d, "lineitem"), col("s_suppkey") === col("l_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .where(
          (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
            (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(rev).cast("double").as("revenue"))
    }),

    // TPC-H Q8 (national market share): nation's share of regional
    // revenue per year — conditional-sum over total-sum on one pass of
    // the 7-way join (never two scans), decimal sums, one double
    // division at the end.
    "q204_tpch_q8" -> ((s, d) => {
      val vol = dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
      val n1 = t(s, d, "nation") // customer side: restricts to the region
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
      val n2 = t(s, d, "nation") // supplier side: the market-share nation
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      t(s, d, "part")
        .join(t(s, d, "lineitem"), col("p_partkey") === col("l_partkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(n1, col("c_nationkey") === col("c_nk"))
        .join(n2, col("s_nationkey") === col("s_nk"))
        .join(t(s, d, "region"), col("c_rk") === col("r_regionkey"))
        .where(col("r_name") === "ASIA" && col("p_type") === "ECONOMY")
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_5", vol)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
            sum(vol).cast("double"), 6).as("mkt_share"))
    }),

    // TPC-H Q13 (customer order-count distribution): LEFT join so
    // order-less customers land in the c_count = 0 bucket, then the
    // distribution of distributions.
    "q205_tpch_q13" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))),

    // TPC-H Q17 (small-quantity-order revenue): the per-part average
    // as a grouped subquery joined back (Catalyst's decorrelation of
    // the spec's correlated scalar subquery). Quantities are whole
    // numbers and the 0.2·avg threshold is decimal-exact, so the
    // boundary comparison is deterministic.
    "q206_tpch_q17" -> ((s, d) => {
      val avgQ = t(s, d, "lineitem").groupBy(col("l_partkey").as("ap_key"))
        .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1)))
          .as("avg_qty")) // double ÷ count, the oracle's exact shape
      t(s, d, "lineitem")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .where(col("p_brand") === "Brand#23")
        .join(avgQ, col("l_partkey") === col("ap_key"))
        .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(round(sum(dec(col("l_extendedprice"))).cast("double") / 7.0, 2)
          .as("avg_yearly"))
    }),

    // TPC-H Q22 (global sales opportunity): above-average balances with
    // no orders — scalar aggregate broadcast + null-aware anti join,
    // with the average in exact decimal so the cut is deterministic.
    "q208_tpch_q22" -> ((s, d) => {
      val avgBal = t(s, d, "customer")
        .where(col("c_acctbal") > 0.0)
        .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)))
          .as("avg_bal")) // double ÷ count, the oracle's exact shape
      val recent = t(s, d, "orders")
        .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      t(s, d, "customer")
        .crossJoin(broadcast(avgBal))
        .where(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          sumd(col("c_acctbal")).as("totacctbal"))
    }),

    // TPC-H Q9 (product-type profit; adapted: the fixtures have no
    // partsupp, so supply cost is 0.6·p_retailprice·quantity): the
    // 5-table star grouped by nation/year. Revenue and cost stay
    // SEPARATE decimal sums combined as doubles at the end — a decimal
    // product of three factors would blow Spark's 38-digit cap and
    // round differently from the oracle.
    "q213_tpch_q9" -> ((s, d) => {
      val rev = dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
      val cost = dec(col("p_retailprice")) * dec(col("l_quantity"))
      t(s, d, "part").where(col("p_name").like("%gear%"))
        .join(t(s, d, "lineitem"), col("p_partkey") === col("l_partkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(round(sum(rev).cast("double") -
          lit(0.6) * sum(cost).cast("double"), 2).as("sum_profit"))
    }),

    // TPC-H Q11 (important stock; adapted: lineitem revenue stands in
    // for partsupp value): grouped value per part vs a scalar fraction
    // of the grand total — the total is a 1-row broadcast, never a
    // second scan shuffle.
    "q214_tpch_q11" -> ((s, d) => {
      val v = t(s, d, "lineitem")
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .where(col("n_name").isin("NATION_3", "NATION_7"))
        .groupBy(col("l_partkey").as("ps_partkey"))
        .agg(sum(dec(col("l_extendedprice"))).as("val"))
      val thr = v.agg((sum(col("val")).cast("double") * lit(0.0012)).as("thr"))
      v.crossJoin(broadcast(thr))
        .where(col("val").cast("double") > col("thr"))
        .select(col("ps_partkey"), col("val").cast("double").as("value"))
    }),

    // TPC-H Q15 (top supplier): quarterly revenue per supplier joined
    // against its own MAX — the decimal sums compare exactly, so the
    // argmax is deterministic; the 1-row max broadcasts.
    "q215_tpch_q15" -> ((s, d) => {
      val rev = dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
      val revenue = t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(rev).as("total_rev"))
      val top = revenue.agg(max(col("total_rev")).as("max_rev"))
      t(s, d, "supplier")
        .join(revenue, col("s_suppkey") === col("supplier_no"))
        .crossJoin(broadcast(top))
        .where(col("total_rev") === col("max_rev"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
    }),

    // TPC-H Q16 (parts/supplier relationship; adapted: lineitem pairs
    // stand in for partsupp, the complaint filter matches s_name): the
    // NOT IN supplier set is an anti join (s_suppkey is non-nullable,
    // so NOT IN ≡ anti), then COUNT(DISTINCT) per part attribute.
    "q216_tpch_q16" -> ((s, d) => {
      val excluded = t(s, d, "supplier")
        .where(col("s_name").like("%00000009%")).select(col("s_suppkey"))
      t(s, d, "lineitem")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .where(col("p_brand") =!= "Brand#12" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 7, 10, 14, 19, 25, 32))
        .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // TPC-H Q20 (potential part promotion; adapted: the availqty
    // threshold becomes a shipped-quantity HAVING over the year): the
    // inner grouped-HAVING feeds a semi join — the reference plans the
    // same nested-IN chain as a semijoin stack.
    "q217_tpch_q20" -> ((s, d) => {
      val qualified = t(s, d, "lineitem")
        .join(t(s, d, "part").where(col("p_name").like("%bolt%")),
          col("l_partkey") === col("p_partkey"))
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(dec(col("l_quantity"))).as("qty"))
        .where(col("qty") > lit(50).cast("decimal(18,2)"))
        .select(col("l_suppkey"))
      t(s, d, "supplier")
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .where(col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4"))
        .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
    }),

    // TPC-H Q19 shape (adapted to fixture columns): disjunction of
    // conjunctive band predicates across a join.
    "q35_disjunctive" -> ((s, d) => {
      val rev = dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
      t(s, d, "lineitem").join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
              col("l_quantity").between(20, 30)))
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n"))
    }),

    // TPC-H Q21 shape (adapted to fixture columns): EXISTS and
    // NOT EXISTS correlated against the SAME table — the suppliers who
    // were the only 'R'-flag line in a multi-supplier finished order.
    // Exercises semi + anti decorrelation stacked on one fact scan.
    "q122_tpch_q21_shape" -> ((s, d) => sql(s, d,
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name""".stripMargin)),

    // TPC-H Q2 shape (adapted: lineitem stands in for partsupp): the
    // minimum-cost supplier per part via a correlated scalar-agg
    // subquery in WHERE against the outer part key.
    "q123_tpch_q2_shape" -> ((s, d) => sql(s, d,
      """SELECT p_partkey, p_name, s_name, l_extendedprice
        |FROM part, supplier, lineitem
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND p_size < 10
        |  AND l_extendedprice = (SELECT MIN(l2.l_extendedprice)
        |                         FROM lineitem l2
        |                         WHERE l2.l_partkey = p_partkey)""".stripMargin)),

    // As-of join via the ordered-union + last_value window trick (SURVEY
    // §2.3: the reference runs these as inequality MergeJoins; the
    // oracle uses DuckDB's native ASOF JOIN — same semantics, tie at
    // equal timestamps takes the quote).
    "q36_asof_join" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val quotes = orders.where(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("k"), col("o_orderdate").as("tt"))
        .agg(max(dec(col("o_totalprice"))).cast("double").as("quote"))
        .select(col("k"), col("tt"), lit(0).as("kind"), col("quote"),
          lit(null).cast("long").as("o_orderkey"))
      val trades = orders.where(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("k"), col("o_orderdate").as("tt"),
          lit(1).as("kind"), lit(null).cast("double").as("quote"),
          col("o_orderkey"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("tt").asc, col("kind").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      quotes.unionByName(trades)
        .withColumn("asof_quote", last(col("quote"), ignoreNulls = true).over(w))
        .where(col("kind") === 1)
        .select(col("o_orderkey"), col("k").as("o_custkey"),
          col("tt").as("o_orderdate"), col("asof_quote"))
    }),

    // Aggregation over an empty input: SQL semantics (sum/avg/min → NULL,
    // count → 0) — a classic engine-parity trap.
    "q37_empty_agg" -> ((s, d) =>
      t(s, d, "lineitem").where(col("l_quantity") < 0)
        .agg(sumd(col("l_quantity")).as("s"), count(lit(1)).as("n"),
          min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"),
          countDistinct(col("l_partkey")).as("nd"))),

    // Top-k = TakeOrderedAndProject (Limit-over-Sort, nodeLimit.c:233).
    "q40_topk" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    // LIMIT/OFFSET over a total order.
    "q41_limit_offset" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(25).limit(50)
        .select("o_orderkey", "o_totalprice")),

    // DISTINCT (nodeUnique.c / nodeAgg hashed distinct).
    "q42_distinct" -> ((s, d) =>
      t(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct()),

    // UNION ALL (Append, nodeAppend.c:197).
    "q43_union_all" -> ((s, d) => {
      val a = t(s, d, "orders").where(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      val b = t(s, d, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      a.union(b).groupBy("custkey").agg(count(lit(1)).as("n"))
    }),

    // UNION with dedup (Agg over Append — cdbsetop.c strategy).
    "q44_union_distinct" -> ((s, d) => {
      val a = t(s, d, "customer").select(col("c_nationkey").as("nk"))
      val b = t(s, d, "supplier").select(col("s_nationkey").as("nk"))
      a.union(b).distinct()
    }),

    // INTERSECT (SetOp, nodeSetOp.c:195; ORCA CXformIntersect2Join).
    "q45_intersect" -> ((s, d) => {
      val a = t(s, d, "orders").where(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      val b = t(s, d, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      a.intersect(b)
    }),

    // EXCEPT.
    "q46_except" -> ((s, d) => {
      val a = t(s, d, "orders").where(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      val b = t(s, d, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      a.except(b)
    }),

    // INTERSECT ALL (multiset semantics).
    "q47_intersect_all" -> ((s, d) => {
      val a = t(s, d, "orders").where(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      val b = t(s, d, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      a.intersectAll(b).groupBy("custkey").agg(count(lit(1)).as("n"))
    }),

    // EXCEPT ALL.
    "q48_except_all" -> ((s, d) => {
      val a = t(s, d, "orders").where(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      val b = t(s, d, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      a.exceptAll(b).groupBy("custkey").agg(count(lit(1)).as("n"))
    }),

    // PG DISTINCT ON (k): first row per key under an order — emulated
    // with the row_number window (the standard Spark spelling).
    "q49_distinct_on" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    }),

    // agg FILTER (WHERE ...) — PG's per-aggregate predicate
    // (parse_agg.c); Spark SQL supports the clause natively.
    "q111_agg_filter" -> ((s, d) => sql(s, d,
      """SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |       FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_px,
        |  COUNT(*) FILTER (WHERE l_shipdate >= TIMESTAMP '1995-01-01') AS n_recent
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // GROUP BY ... HAVING (the post-aggregation filter; planner places it
    // above the final HashAggregate).
    "q112_having" -> ((s, d) =>
      t(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sumd(col("o_totalprice")).as("total"))
        .where(col("n_orders") >= 10 && col("total") > 1000000.0)),

    // Parameterized SQL — the PREPARE/BIND/EXECUTE surface (§3.2,
    // postgres.c extended protocol): named parameter markers bound at
    // execution, one prepared text reused across bindings.
    "q113_prepared" -> ((s, d) => {
      graft.Tables.register(s, d)
      val prepared =
        """SELECT o_orderstatus, COUNT(*) AS n
          |FROM orders WHERE o_totalprice > :minPrice
          |GROUP BY o_orderstatus""".stripMargin
      s.sql(prepared, Map("minPrice" -> 50000)) // second binding exercised in tests
    }),

    // Correlated EXISTS (cdbsubselect.c:547; Catalyst RewritePredicateSubquery).
    "q50_exists_correlated" -> ((s, d) => sql(s, d,
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin)),

    // IN subquery.
    "q51_in_subquery" -> ((s, d) => sql(s, d,
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)""".stripMargin)),

    // Scalar subquery in a predicate (deterministic via decimal mean).
    "q52_scalar_subquery" -> ((s, d) => sql(s, d,
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)
        |                   FROM customer)""".stripMargin)),

    // Correlated scalar AGGREGATE subquery (TPC-H Q2/Q17 shape;
    // CSubqueryHandler + CXformSubqJoin2Apply → de-correlated agg join).
    "q57_corr_scalar_agg" -> ((s, d) => sql(s, d,
      """SELECT p_partkey, p_brand,
        |  (SELECT CAST(MAX(l_quantity) AS DOUBLE) FROM lineitem
        |   WHERE l_partkey = p_partkey) AS max_qty,
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE l_partkey = p_partkey AND l_quantity > 25) AS n_bulk
        |FROM part WHERE p_size <= 5""".stripMargin)),

    // LATERAL correlated subquery (Apply → de-correlation; CXformInnerApply2InnerJoin).
    "q53_lateral_topn" -> ((s, d) => sql(s, d,
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_acctbal > 9500""".stripMargin)),

    // Quantified comparisons (parse_expr.c ANY_SUBLINK/ALL_SUBLINK):
    // Spark has only IN/EXISTS, so the engine rewrites op ANY/ALL
    // (subquery) into null-correct min/max scalar-aggregate CASE forms
    // (PgSql.quantified). The correlated > ALL decorrelates into
    // aggregated joins that MergeScalarSubqueries folds back into one
    // aggregate per order — the plan a hand-written rewrite would
    // produce. DuckDB runs the identical text natively.
    "q260_quantified_subqueries" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s,
        """SELECT 'corr_all' AS tag, o_orderpriority AS grp, count(*) AS n
          |FROM orders
          |WHERE o_totalprice > ALL (SELECT l_extendedprice FROM lineitem
          |                          WHERE l_orderkey = o_orderkey)
          |GROUP BY o_orderpriority
          |UNION ALL
          |SELECT 'any_grouped' AS tag, c_mktsegment AS grp, count(*) AS n
          |FROM customer
          |WHERE c_acctbal < ANY (SELECT max(c_acctbal) FROM customer
          |                       GROUP BY c_nationkey)
          |GROUP BY c_mktsegment""".stripMargin).get
    }),

    // Data-modifying CTE (wCTE; rewriteHandler.c): UPDATE ...
    // RETURNING consumed as the statement's relation, then the final
    // table state — the oracle replays both effects arithmetically
    // from the orders base table.
    "q261_dml_cte" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s, "DROP TABLE IF EXISTS wcte_q261")
      // orphaned managed locations from a crashed prior JVM are
      // cleared generically in GreengageDdl.clearOrphanLocation
      graft.Graft.execute(s, "CREATE TABLE wcte_q261 (k bigint, v float8)")
      graft.Graft.execute(s,
        """INSERT INTO wcte_q261
          |SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_orderkey % 37 = 0""".stripMargin)
      val returned = graft.Graft.execute(s,
        """WITH up AS (UPDATE wcte_q261 SET v = v * 2
          |            WHERE k % 2 = 0 RETURNING k, v)
          |SELECT 'returned' AS part, count(*) AS n,
          |  CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS s
          |FROM up""".stripMargin).get
      val finalState = s.sql(
        """SELECT 'final' AS part, count(*) AS n,
          |  CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS s
          |FROM wcte_q261""".stripMargin)
      returned.union(finalState)
    }),

    // Recursive CTE (RecursiveUnion nodeRecursiveunion.c) — driver-side
    // fixpoint, distributed per-iteration work. Hierarchy: nations →
    // regions (+100) → synthetic root 999.
    "q54_recursive_cte" -> ((s, d) => {
      val nation = t(s, d, "nation")
      val region = t(s, d, "region")
      val edges = nation.select(col("n_nationkey").as("child"),
        (col("n_regionkey") + 100).as("parent"))
        .union(region.select(col("r_regionkey") + 100, lit(999)))
        .localCheckpoint(true)
      val seed = s.createDataFrame(Seq((999, 0))).toDF("id", "depth")
      RecursiveCte.fixpoint(seed, frontier =>
        edges.join(frontier, col("parent") === col("id"))
          .select(col("child").as("id"), (col("depth") + 1).as("depth")))
    }),

    // WITH RECURSIVE ... UNION (dedup) semantics over a CYCLIC graph
    // (nodeRecursiveunion.c's hashed dedup path): the affine successor
    // v → 7v+3 mod 25 cycles, so UNION ALL would never terminate —
    // reachability from 0 converges only because seen rows leave the
    // frontier. Oracle = DuckDB's own recursive UNION.
    "q162_recursive_union" -> ((s, d) => {
      val edges = t(s, d, "nation").select(
        col("n_nationkey").cast("long").as("src"),
        ((col("n_nationkey") * 7 + 3) % 25).cast("long").as("dst"))
        .localCheckpoint(true)
      val seed = s.createDataFrame(Seq(Tuple1(0L))).toDF("v")
      RecursiveCte.fixpointDistinct(seed, frontier =>
        frontier.join(edges, col("v") === col("src"))
          .select(col("dst").as("v")))
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_tpch_q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${oSumd("l_quantity")} AS sum_qty,
         |  ${oSumd("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_price,
         |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |       l_extendedprice * (1.0 - l_discount) AS net
        |FROM lineitem WHERE l_quantity > 45 AND l_discount >= 0.05""".stripMargin,
    "q03_values_scan" ->
      """SELECT id, name, CAST(score AS DOUBLE) AS score
        |FROM (VALUES (1,'alpha',1.5),(2,'beta',2.5),(3,'gamma',3.5),(4,'delta',4.5))
        |     AS t(id, name, score)
        |WHERE score > 2.0""".stripMargin,
    "q04_generate_series" ->
      """SELECT id % 7 AS bucket, COUNT(*) AS n, CAST(SUM(id) AS BIGINT) AS total,
        |       MIN(id) AS lo, MAX(id) AS hi
        |FROM (SELECT UNNEST(generate_series(1, 1000)) AS id) GROUP BY 1""".stripMargin,
    "q05_cte_shared" ->
      """WITH t AS (SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_dec
        |           FROM orders GROUP BY o_custkey),
        |     thr AS (SELECT CAST(SUM(total_dec) AS DOUBLE)/COUNT(*) AS m FROM t)
        |SELECT t.o_custkey, CAST(t.total_dec AS DOUBLE) AS total
        |FROM t, thr WHERE CAST(t.total_dec AS DOUBLE) > thr.m""".stripMargin,
    "q06_subquery_scan" ->
      s"""SELECT o_custkey, f_total FROM (
         |  SELECT o_custkey, ${oSumd("o_totalprice")} AS f_total
         |  FROM (SELECT o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F') sub
         |  GROUP BY o_custkey)
         |WHERE f_total > 300000.0""".stripMargin,
    "q07_repeat" ->
      """SELECT n_name, CAST(u.i AS INT) AS i
        |FROM nation, UNNEST(range(3)) u(i)""".stripMargin,
    "q08_material_reuse" ->
      s"""WITH base AS (SELECT o_orderstatus, COUNT(*) AS n,
         |  ${oSumd("o_totalprice")} AS total FROM orders GROUP BY o_orderstatus)
         |SELECT o_orderstatus, n AS metric, 'count' AS kind FROM base
         |UNION ALL
         |SELECT o_orderstatus, CAST(FLOOR(total) AS BIGINT) AS metric, 'total_floor' AS kind FROM base""".stripMargin,
    "q55_udtf_posexplode" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents WHERE doc_id < 20)
        |SELECT doc_id, CAST(u.i AS INT) AS pos, words[CAST(u.i AS INT) + 1] AS word
        |FROM w, UNNEST(range(len(words))) u(i)""".stripMargin,
    "q56_table_function" ->
      """SELECT c_custkey, CAST(LENGTH(c_name) AS INT) AS name_len,
        |  CAST(LENGTH(c_name) - LENGTH(regexp_replace(c_name, '[aeiouAEIOU]', '', 'g')) AS INT) AS n_vowels
        |FROM customer""".stripMargin,
    "q09_dsv2_scan" ->
      """SELECT id % 7 AS bucket, COUNT(*) AS n,
        |       SUM(CAST(id AS DOUBLE) * CAST(0.5 AS DOUBLE)) AS sum_val,
        |       COUNT(DISTINCT 't' || CAST(id % 3 AS VARCHAR)) AS n_tags
        |FROM (SELECT UNNEST(generate_series(0, 9999)) AS id) GROUP BY 1""".stripMargin,
    // DuckDB's generate_series over DATE with INTERVAL yields
    // timestamps — cast back to DATE for the same text image
    "q168_series_ts" ->
      """SELECT CAST(g AS VARCHAR) AS tick, 'hourly6' AS kind,
        |  year(g) AS yr, CAST(day(g) AS INT) AS dom, CAST(hour(g) AS INT) AS hr
        |FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |  TIMESTAMP '2024-01-05 00:00:00', INTERVAL 6 HOUR) t(g)
        |UNION ALL
        |SELECT CAST(CAST(g AS DATE) AS VARCHAR), 'weekly',
        |  year(g), CAST(day(g) AS INT), 0
        |FROM generate_series(DATE '2024-01-01',
        |  DATE '2024-03-01', INTERVAL 7 DAY) t(g)""".stripMargin,
    "q169_bool_bit_aggs" ->
      """SELECT o_orderstatus,
        |  bool_and(o_totalprice > 1000.0) AS all_gt1k,
        |  bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
        |  bool_and(o_custkey > 0) AS every_pos,
        |  bit_and(o_custkey & 255) AS band,
        |  bit_or(o_custkey % 16) AS bor,
        |  bit_xor(o_orderkey % 8) AS bxor,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q170_connectby" ->
      """WITH RECURSIVE e(keyid, parent) AS (
        |  SELECT * FROM (VALUES
        |    ('row2','row1'),('row3','row1'),('row4','row2'),('row5','row2'),
        |    ('row6','row4'),('row7','row3'),('row8','row6'),('row9','row5'))
        |    v(keyid, parent)),
        |t(keyid, parent, level, branch) AS (
        |  SELECT 'row1', CAST(NULL AS VARCHAR), 0, 'row1'
        |  UNION ALL
        |  SELECT e.keyid, e.parent, t.level + 1, t.branch || '~' || e.keyid
        |  FROM e JOIN t ON e.parent = t.keyid)
        |SELECT keyid, parent, level, branch FROM t""".stripMargin,
    "q10_join_inner" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q11_join_left" ->
      s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
         |       ${oSumd("o_totalprice")} AS total_spent
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey""".stripMargin,
    "q12_join_right" ->
      """SELECT c_mktsegment, COUNT(o_orderkey) AS n_orders, COUNT(*) AS n_rows
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q13_join_full" ->
      """SELECT COALESCE(a.c_custkey, b.o_custkey) AS custkey, a.c_acctbal, b.n_p_orders
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000) a
        |FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_p_orders FROM orders
        |                 WHERE o_orderstatus = 'P' GROUP BY o_custkey) b
        |ON a.c_custkey = b.o_custkey""".stripMargin,
    "q14_join_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND o_orderstatus = 'F')""".stripMargin,
    "q15_join_anti" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin,
    "q16_notin_nullaware" ->
      """SELECT 'no_nulls' AS variant, c_custkey FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT 'with_nulls' AS variant, c_custkey FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_custkey END
        |   FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,
    "q17_join_broadcast_star" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q241_agg_filter" ->
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |       FILTER (WHERE l_tax > 0.04) AS DOUBLE) AS taxed_price,
        |  COUNT(DISTINCT l_suppkey) FILTER (WHERE l_linestatus = 'F')
        |    AS nd_supp_f
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q247_crosstab" ->
      """SELECT rowid AS priority,
        |  CAST(max(CASE WHEN pos = 1 THEN v END) AS INTEGER) AS s1,
        |  CAST(max(CASE WHEN pos = 2 THEN v END) AS INTEGER) AS s2,
        |  CAST(max(CASE WHEN pos = 3 THEN v END) AS INTEGER) AS s3
        |FROM (
        |  SELECT o_orderpriority AS rowid, cnt AS v,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_orderstatus) AS pos
        |  FROM (SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
        |        FROM orders GROUP BY 1, 2))
        |GROUP BY rowid""".stripMargin,
    "q248_crosstab_hash" ->
      """SELECT priority, plen,
        |  max(CASE WHEN st = 'F' THEN cnt END) AS st_f,
        |  max(CASE WHEN st = 'O' THEN cnt END) AS st_o,
        |  max(CASE WHEN st = 'P' THEN cnt END) AS st_p
        |FROM (SELECT o_orderpriority AS priority,
        |        CAST(length(o_orderpriority) AS INTEGER) AS plen,
        |        o_orderstatus AS st, count(*) AS cnt
        |      FROM orders GROUP BY 1, 2, 3)
        |GROUP BY priority, plen""".stripMargin,
    "q246_string_agg_distinct" ->
      """SELECT o_orderstatus,
        |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
        |    AS priorities,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q265_generate_series_sql" ->
      """SELECT CAST(gs AS BIGINT) AS g, CAST(gs % 3 AS BIGINT) AS m,
        |       CAST(gs // 4 AS DOUBLE) AS b
        |FROM generate_series(1, 20) t(gs)""".stripMargin,
    "q266_int_division" ->
      """SELECT CAST(o_custkey // 100 AS DOUBLE) AS bucket,
        |       CAST(o_custkey AS DOUBLE) / 200 AS exact_half,
        |       count(*) AS n
        |FROM orders WHERE o_orderkey <= 64 GROUP BY 1, 2""".stripMargin,
    "q267_subscript_1based" ->
      """SELECT n_name,
        |  string_split(n_name, 'A')[1] AS first_piece,
        |  string_split(n_name, 'A')[99] AS oob
        |FROM nation""".stripMargin,
    "q268_information_schema" ->
      """SELECT table_name, column_name,
        |  CAST(ordinal_position AS INT) AS ordinal_position
        |FROM information_schema.columns
        |WHERE table_name IN ('nation', 'region')""".stripMargin,
    "q269_with_ties_ordinal" ->
      """SELECT o_orderpriority, o_orderkey FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |         rank() OVER (ORDER BY o_orderpriority) AS r
        |  FROM orders WHERE o_orderkey <= 200) t
        |WHERE r <= 5""".stripMargin,
    "q270_complex_sql" ->
      """SELECT o_orderkey,
        |  CAST(o_orderkey % 5 AS DOUBLE) AS re,
        |  CAST(4 AS DOUBLE) AS im,
        |  ROUND(sqrt((o_orderkey % 5) * (o_orderkey % 5) + 16.0), 6) AS mag,
        |  CAST(o_orderkey % 5 AS DOUBLE) AS conj_re,
        |  CAST(-4 AS DOUBLE) AS conj_im,
        |  (o_orderkey % 5 = 3) AS is_3_4
        |FROM orders WHERE o_orderkey <= 100""".stripMargin,
    "q271_fn_default_variadic" ->
      """SELECT o_orderkey,
        |  CAST(o_orderkey % 5 + 10 AS INT) AS defaulted,
        |  CAST(o_orderkey % 5 + 100 AS INT) AS explicit,
        |  CAST(GREATEST(o_orderkey % 3, 7, 2) AS INT) AS vmax
        |FROM orders WHERE o_orderkey <= 100""".stripMargin,
    "q272_decode_bytea" ->
      "SELECT n_name, n_name AS roundtrip, n_name AS roundtrip64 FROM nation",
    "q274_hypothetical_direct" ->
      """SELECT
        |  1 + count(CASE WHEN o_orderkey < 15 THEN 1 END) AS r,
        |  1 + count(DISTINCT CASE WHEN o_orderkey < 15
        |                          THEN o_orderkey END) AS dr,
        |  CAST(count(CASE WHEN o_orderkey < 15 THEN 1 END) AS DOUBLE)
        |    / count(*) AS pr,
        |  CAST(1 + count(CASE WHEN o_orderkey <= 15 THEN 1 END) AS DOUBLE)
        |    / (count(*) + 1) AS cd
        |FROM orders WHERE o_orderkey <= 100""".stripMargin,
    "q275_percentile_array" ->
      """SELECT
        |  array_to_string(quantile_cont(o_orderkey, [0.25, 0.5, 0.75]),
        |                  ',') AS cont,
        |  array_to_string(quantile_disc(o_orderpriority,
        |                                [0.25, 0.5, 0.75]), ',') AS disc
        |FROM orders WHERE o_orderkey <= 1000""".stripMargin,
    "q276_window_clause" ->
      """SELECT o_orderkey,
        |  rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey)
        |    AS rnk,
        |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
        |                 ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS near
        |FROM orders WHERE o_orderkey <= 100""".stripMargin,
    "q277_nested_join_on" ->
      """SELECT n.n_name, r.r_name, c.c_custkey
        |FROM nation n
        |  LEFT JOIN (region r JOIN customer c
        |             ON c.c_custkey % 5 = r.r_regionkey
        |                AND c.c_custkey <= 50)
        |  ON r.r_regionkey = n.n_regionkey""".stripMargin,
    "q278_ordered_agg_sql" ->
      """SELECT o_orderstatus,
        |  array_to_string(
        |    array_agg(o_orderkey ORDER BY o_orderkey DESC), ',')
        |    AS keys_desc,
        |  string_agg(CAST(o_orderkey AS VARCHAR), '|'
        |             ORDER BY o_orderkey) AS keys_asc
        |FROM orders WHERE o_orderkey <= 200
        |GROUP BY o_orderstatus""".stripMargin,
    "q279_dml_serial_delete" ->
      """SELECT * FROM (VALUES (1, 0, 'a'), (2, 5, 'b'), (3, 3, 'c'),
        |                      (4, 99, 'd'),
        |                      (5, CAST(NULL AS INT), CAST(NULL AS VARCHAR)))
        |         t(id, k, v)
        |WHERE NOT EXISTS (SELECT 1 FROM nation n
        |                  JOIN region r ON n.n_regionkey = r.r_regionkey
        |                  WHERE t.k = n.n_nationkey
        |                    AND r.r_regionkey = 0)""".stripMargin,
    "q280_create_aggregate" ->
      """SELECT o_orderstatus,
        |  avg(o_orderkey % 97) AS a, count(*) AS n
        |FROM orders WHERE o_orderkey <= 500
        |GROUP BY o_orderstatus""".stripMargin,
    "q281_lateral_srf" ->
      """SELECT n.n_nationkey, g.g, upper(n.n_name) AS x
        |FROM nation n JOIN (SELECT CAST(range AS BIGINT) + 1 AS g
        |                    FROM range(3)) g
        |  ON g.g <= n.n_nationkey % 3""".stripMargin,
    "q282_format_fn" ->
      """SELECT n_name,
        |  n_name || ' #' || CAST(n_nationkey AS VARCHAR) || ' is '
        |    || '''' || lower(n_name) || '''' AS described,
        |  (n_nationkey % 2 = 0) = true AS is_even
        |FROM nation""".stripMargin,
    "q283_srf_select_hoist" ->
      """SELECT CAST(g AS BIGINT) AS g, CAST(g * 3 AS BIGINT) AS g3,
        |       CAST(g % 5 AS BIGINT) AS g5
        |FROM generate_series(1, 12) t(g)""".stripMargin,
    "q284_plpgsql_setof" ->
      """SELECT CAST(n_nationkey AS INT) AS k FROM nation
        |WHERE n_nationkey % 2 = 0 AND n_nationkey <= 20""".stripMargin,
    "q285_plpgsql_select_into" ->
      """SELECT r_regionkey,
        |  (SELECT count(*) * 10 FROM nation
        |   WHERE n_regionkey = r_regionkey) AS cnt10
        |FROM region""".stripMargin,
    "q286_pg_regex" ->
      """SELECT p_partkey,
        |  regexp_replace(p_name, '[aeiou]', '_') AS first_devowel,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS all_devowel,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |  array_to_string(string_split_regex(p_name, ' +'), '|') AS toks
        |FROM part WHERE p_partkey <= 200""".stripMargin,
    "q287_interval_bound" ->
      """SELECT CAST(floor(o_totalprice / 25000) * 25000 AS BIGINT)
        |    AS bucket,
        |  CAST(floor((o_totalprice - 100) / 25000) * 25000
        |       + 25000 + 100 AS BIGINT) AS shifted,
        |  count(*) AS n
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q288_array_funcs" ->
      """SELECT p_partkey,
        |  CAST(len(string_split(p_name, ' ')) AS INT) AS n_tok,
        |  CAST(len(string_split(p_name, ' ')) AS INT) AS len1,
        |  string_split(p_name, ' ')[1] AS tok1
        |FROM part WHERE p_partkey <= 500""".stripMargin,
    "q289_txn_rollback" ->
      """SELECT n_nationkey AS k, n_name AS nm, n_regionkey AS rk
        |FROM nation WHERE n_regionkey <> 0""".stripMargin,
    "q290_grouping_sets_mix" ->
      """SELECT st, pr, gbits, gid, n FROM (
        |  SELECT o_orderstatus AS st, CAST(NULL AS VARCHAR) AS pr,
        |         1 AS gbits, 0 AS gid, count(*) AS n
        |  FROM orders WHERE o_orderkey <= 2000 GROUP BY 1
        |  UNION ALL
        |  SELECT o_orderstatus, CAST(NULL AS VARCHAR), 1, 1, count(*)
        |  FROM orders WHERE o_orderkey <= 2000 GROUP BY 1
        |  UNION ALL
        |  SELECT o_orderstatus, o_orderpriority, 0, 0, count(*)
        |  FROM orders WHERE o_orderkey <= 2000 GROUP BY 1, 2
        |  UNION ALL
        |  SELECT o_orderstatus, o_orderpriority, 0, 1, count(*)
        |  FROM orders WHERE o_orderkey <= 2000 GROUP BY 1, 2) u""".stripMargin,
    "q291_srf_values" ->
      """SELECT CAST(CASE WHEN i <= 5 THEN i END AS INT) AS a,
        |       CAST(i * 10 AS INT) AS b, 'z' AS c
        |FROM range(1, 9) t(i)
        |UNION ALL SELECT 100, 200, 'lit'""".stripMargin,
    "q292_update_from_list" ->
      """SELECT n_nationkey AS k,
        |  CASE WHEN n_regionkey = 3
        |       THEN (SELECT r_name FROM region WHERE r_regionkey = 3)
        |       ELSE n_name END AS nm,
        |  n_regionkey AS rk
        |FROM nation""".stripMargin,
    "q293_default_partition_drop" ->
      """SELECT CAST(i AS INT) AS a, CAST(i AS INT) AS b
        |FROM range(1, 4) t(i)""".stripMargin,
    "q294_date_interval_ts" ->
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 1 DAY AS next_day,
        |  o_orderdate + INTERVAL 2 MONTH AS in_two_months,
        |  o_orderdate + INTERVAL 90 MINUTE AS late_start
        |FROM orders WHERE o_orderkey <= 100""".stripMargin,
    "q295_distinct_on_sql" ->
      """SELECT DISTINCT ON (o_custkey)
        |  o_custkey, o_orderkey, o_totalprice
        |FROM orders WHERE o_orderkey <= 2000
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "q296_pg_partitions" ->
      """SELECT * FROM (VALUES
        |  ('t296', 'other', 'range', CAST(NULL AS BIGINT),
        |   CAST(0 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |   true, 'DEFAULT PARTITION other'),
        |  ('t296', 'small', 'range', CAST(1 AS BIGINT), CAST(1 AS BIGINT),
        |   '0', '100', false, 'PARTITION small START (0) END (100)'),
        |  ('t296', 'big', 'range', CAST(2 AS BIGINT), CAST(2 AS BIGINT),
        |   '100', '200', false, 'PARTITION big START (100) END (200)'))
        |AS t(tablename, partitionname, partitiontype, "rank", pos,
        |     range_start, range_end, is_default, boundary)
        |ORDER BY pos""".stripMargin,
    "q297_pg_settings" ->
      "SELECT 'statement_timeout' AS name, '3600' AS setting",
    "q18_cross_join" -> "SELECT n_name, r_name FROM nation CROSS JOIN region",
    "q19_band_join" ->
      """SELECT c_custkey, s_suppkey, c_acctbal - s_acctbal AS bal_diff
        |FROM customer, supplier WHERE ABS(c_acctbal - s_acctbal) < 1.0""".stripMargin,
    "q20_dqa" ->
      s"""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_parts,
         |  COUNT(DISTINCT l_suppkey) AS nd_supps, COUNT(*) AS n_rows,
         |  ${oSumd("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q21_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  COUNT(*) AS n, ${oSumd("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q22_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         |  CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status,
         |  CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_prio,
         |  COUNT(*) AS n, ${oSumd("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q23_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,
    "q24b_hypothetical_set" ->
      """SELECT l_returnflag,
        |  1 + COUNT(*) FILTER (WHERE l_quantity < 25) AS h_rank,
        |  1 + COUNT(DISTINCT l_quantity) FILTER (WHERE l_quantity < 25) AS h_dense_rank,
        |  CAST(COUNT(*) FILTER (WHERE l_quantity < 25) AS DOUBLE)
        |    / COUNT(*) AS h_percent_rank,
        |  CAST(1 + COUNT(*) FILTER (WHERE l_quantity <= 25) AS DOUBLE)
        |    / (COUNT(*) + 1) AS h_cume_dist
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q24_ordered_set" ->
      """SELECT l_returnflag,
        |  CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p50,
        |  CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p25,
        |  CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p75_disc,
        |  CAST(median(l_quantity) AS DOUBLE) AS med
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q25_mode_manual" ->
      """SELECT l_returnflag, mode_qty, cnt FROM (
        |  SELECT l_returnflag, l_quantity AS mode_qty, COUNT(*) AS cnt,
        |         ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |                            ORDER BY COUNT(*) DESC, l_quantity ASC) AS rn
        |  FROM lineitem GROUP BY l_returnflag, l_quantity)
        |WHERE rn = 1""".stripMargin,
    "q26_array_string_agg" ->
      """SELECT l_linestatus,
        |  array_to_string(list_sort(list_distinct(list(l_returnflag))), ',') AS flags,
        |  string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag) AS flags_csv,
        |  COUNT(DISTINCT l_returnflag) AS n_flags
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q26b_array_agg_ordered" ->
      """SELECT c_nationkey,
        |  string_agg(c_name, '|' ORDER BY c_acctbal DESC, c_name) AS names_by_balance,
        |  COUNT(*) AS n
        |FROM customer GROUP BY c_nationkey""".stripMargin,
    "q27_pivot" ->
      """SELECT n_name,
        |  CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        |  CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
        |  CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS P
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q28_stats_manual" ->
      """WITH s AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n, sx / n AS mean_qty,
        |  (sxx - sx * sx / n) / (n - 1) AS var_qty,
        |  (sxy - sx * sy / n) / (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n)) AS corr_qty_price
        |FROM s""".stripMargin,
    "q137_regr_family" ->
      """WITH s AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag),
        |b AS (
        |  SELECT l_returnflag, CAST(n AS BIGINT) AS regr_count,
        |    sx / n AS regr_avgx, sy / n AS regr_avgy,
        |    sxx - sx * sx / n AS bsxx,
        |    syy - sy * sy / n AS bsyy,
        |    sxy - sx * sy / n AS bsxy
        |  FROM s)
        |SELECT l_returnflag, regr_count, regr_avgx, regr_avgy,
        |  bsxx AS regr_sxx, bsyy AS regr_syy, bsxy AS regr_sxy,
        |  CASE WHEN bsxx <> 0 THEN bsxy / bsxx END AS regr_slope,
        |  CASE WHEN bsxx <> 0 THEN regr_avgy - (bsxy / bsxx) * regr_avgx END AS regr_intercept,
        |  CASE WHEN bsxx = 0 THEN NULL WHEN bsyy = 0 THEN 1.0 ELSE bsxy * bsxy / (bsxx * bsyy) END AS regr_r2,
        |  bsxy / CAST(regr_count AS DOUBLE) AS covar_pop,
        |  CASE WHEN regr_count > 1 THEN bsxy / (CAST(regr_count AS DOUBLE) - 1.0) END AS covar_samp,
        |  CASE WHEN bsxx <> 0 AND bsyy <> 0 THEN bsxy / SQRT(bsxx * bsyy) END AS corr
        |FROM b""".stripMargin,
    "q29_custom_agg_wavg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6)) * CAST(l_quantity AS DECIMAL(12,6))) AS DOUBLE) /
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q30b_approx_percentile" ->
      """SELECT l_returnflag,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS ap50,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS ap90
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q31_tpch_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q32_priority_class" ->
      """SELECT CAST(DATE_PART('year', o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,
    "q33_tpch_q14" ->
      """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |  AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'""".stripMargin,
    "q34_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15' AND l_shipdate > TIMESTAMP '1997-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q184_srf_targetlist" ->
      """WITH b AS (SELECT o_orderkey, o_orderkey % 3 + 1 AS l1,
        |    string_split(o_orderpriority, '-') AS a2
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |v AS (SELECT o_orderkey, l1, a2, len(a2) AS l2 FROM b),
        |e AS (SELECT *, unnest(range(1, CAST(lcm(l1, l2) AS BIGINT) + 1)) AS i
        |  FROM v)
        |SELECT o_orderkey, CAST((i - 1) % l1 + 1 AS BIGINT) AS s1,
        |  a2[CAST((i - 1) % l2 + 1 AS INT)] AS s2
        |FROM e""".stripMargin,
    "q181_tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "q182_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "q183_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING SUM(l_quantity) > 300.0)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q202_tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    "q203_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3""".stripMargin,
    "q204_tpch_q8" ->
      """SELECT year(o_orderdate) AS o_year,
        |  ROUND(CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
        |    6) AS mkt_share
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |GROUP BY 1""".stripMargin,
    "q205_tpch_q13" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "q206_tpch_q17" ->
      """SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
        |  AS avg_yearly
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |JOIN (SELECT l_partkey AS ap_key,
        |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |      FROM lineitem GROUP BY l_partkey) a ON l_partkey = ap_key
        |WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avg_qty""".stripMargin,
    "q208_tpch_q22" ->
      """WITH a AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(*) AS avg_bal
        |    FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, a
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_nationkey""".stripMargin,
    "q213_tpch_q9" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    - 0.6 * CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_profit
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2""".stripMargin,
    "q214_tpch_q11" ->
      """WITH v AS (
        |  SELECT l_partkey AS ps_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_3','NATION_7') GROUP BY l_partkey)
        |SELECT ps_partkey, CAST(val AS DOUBLE) AS value
        |FROM v
        |WHERE CAST(val AS DOUBLE) > (SELECT CAST(SUM(val) AS DOUBLE) * 0.0012 FROM v)""".stripMargin,
    "q215_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)""".stripMargin,
    "q216_tpch_q16" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#12' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 7, 10, 14, 19, 25, 32)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_name LIKE '%00000009%')
        |GROUP BY 1, 2, 3""".stripMargin,
    "q217_tpch_q20" ->
      """SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        |    WHERE p_name LIKE '%bolt%'
        |      AND l_shipdate >= TIMESTAMP '1996-01-01'
        |      AND l_shipdate < TIMESTAMP '1997-01-01'
        |    GROUP BY l_suppkey
        |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50)""".stripMargin,
    "q35_disjunctive" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q122_tpch_q21_shape" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name""".stripMargin,
    "q123_tpch_q2_shape" ->
      """SELECT p_partkey, p_name, s_name, l_extendedprice
        |FROM part, supplier, lineitem
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND p_size < 10
        |  AND l_extendedprice = (SELECT MIN(l2.l_extendedprice)
        |                         FROM lineitem l2
        |                         WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q36_asof_join" ->
      """WITH quotes AS (
        |  SELECT o_custkey AS k, o_orderdate AS tt,
        |    CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS quote
        |  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1, 2),
        |trades AS (SELECT o_orderkey, o_custkey AS k, o_orderdate AS tt
        |           FROM orders WHERE o_orderstatus = 'O')
        |SELECT tr.o_orderkey, tr.k AS o_custkey, tr.tt AS o_orderdate,
        |       q.quote AS asof_quote
        |FROM trades tr ASOF LEFT JOIN quotes q
        |ON tr.k = q.k AND q.tt <= tr.tt""".stripMargin,
    "q37_empty_agg" ->
      """SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |       COUNT(*) AS n, MIN(l_quantity) AS mn, MAX(l_quantity) AS mx,
        |       COUNT(DISTINCT l_partkey) AS nd
        |FROM lineitem WHERE l_quantity < 0""".stripMargin,
    "q40_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q41_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50 OFFSET 25""".stripMargin,
    "q42_distinct" -> "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q43_union_all" ->
      """SELECT custkey, COUNT(*) AS n FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') GROUP BY custkey""".stripMargin,
    "q44_union_distinct" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey FROM supplier""".stripMargin,
    "q45_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q46_except" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q47_intersect_all" ->
      """SELECT custkey, COUNT(*) AS n FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') GROUP BY custkey""".stripMargin,
    "q48_except_all" ->
      """SELECT custkey, COUNT(*) AS n FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') GROUP BY custkey""".stripMargin,
    "q49_distinct_on" ->
      """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
        |FROM orders ORDER BY o_custkey, o_totalprice DESC, o_orderkey ASC""".stripMargin,
    "q111_agg_filter" ->
      """SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |       FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_px,
        |  COUNT(*) FILTER (WHERE l_shipdate >= TIMESTAMP '1995-01-01') AS n_recent
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q112_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) >= 10
        |   AND CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) > 1000000.0""".stripMargin,
    "q113_prepared" ->
      """SELECT o_orderstatus, COUNT(*) AS n
        |FROM orders WHERE o_totalprice > 50000
        |GROUP BY o_orderstatus""".stripMargin,
    "q50_exists_correlated" ->
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin,
    "q51_in_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)""".stripMargin,
    "q52_scalar_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)
        |                   FROM customer)""".stripMargin,
    "q261_dml_cte" ->
      """SELECT 'returned' AS part, count(*) AS n,
        |  CAST(sum(CAST(2 * o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
        |FROM orders
        |WHERE o_orderkey % 37 = 0 AND o_orderkey % 2 = 0
        |UNION ALL
        |SELECT 'final' AS part, count(*) AS n,
        |  CAST(sum(CAST(CASE WHEN o_orderkey % 2 = 0
        |                     THEN 2 * o_totalprice
        |                     ELSE o_totalprice END AS DECIMAL(18,2)))
        |       AS DOUBLE) AS s
        |FROM orders WHERE o_orderkey % 37 = 0""".stripMargin,
    "q260_quantified_subqueries" ->
      """SELECT 'corr_all' AS tag, o_orderpriority AS grp, count(*) AS n
        |FROM orders
        |WHERE o_totalprice > ALL (SELECT l_extendedprice FROM lineitem
        |                          WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority
        |UNION ALL
        |SELECT 'any_grouped' AS tag, c_mktsegment AS grp, count(*) AS n
        |FROM customer
        |WHERE c_acctbal < ANY (SELECT max(c_acctbal) FROM customer
        |                       GROUP BY c_nationkey)
        |GROUP BY c_mktsegment""".stripMargin,
    "q53_lateral_topn" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o ON true
        |WHERE c.c_acctbal > 9500""".stripMargin,
    "q57_corr_scalar_agg" ->
      """SELECT p_partkey, p_brand,
        |  (SELECT CAST(MAX(l_quantity) AS DOUBLE) FROM lineitem
        |   WHERE l_partkey = p_partkey) AS max_qty,
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE l_partkey = p_partkey AND l_quantity > 25) AS n_bulk
        |FROM part WHERE p_size <= 5""".stripMargin,
    "q54_recursive_cte" ->
      """WITH RECURSIVE edges AS (
        |  SELECT n_nationkey AS child, n_regionkey + 100 AS parent FROM nation
        |  UNION ALL SELECT r_regionkey + 100, 999 FROM region),
        |h(id, depth) AS (
        |  SELECT 999, 0
        |  UNION ALL
        |  SELECT e.child, h.depth + 1 FROM edges e JOIN h ON e.parent = h.id)
        |SELECT id, depth FROM h""".stripMargin,
    "q162_recursive_union" ->
      """WITH RECURSIVE r(v) AS (
        |  SELECT CAST(0 AS BIGINT)
        |  UNION
        |  SELECT e.dst FROM r
        |  JOIN (SELECT CAST(n_nationkey AS BIGINT) AS src,
        |               CAST((n_nationkey * 7 + 3) % 25 AS BIGINT) AS dst
        |        FROM nation) e ON e.src = r.v)
        |SELECT v FROM r""".stripMargin
  )
}
