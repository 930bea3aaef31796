package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import Q._

/** Scalar function surface (SURVEY §2.9; reference `src/backend/utils/adt/`,
  * ~2,900 pg_proc builtins mapped ~1:1 onto org.apache.spark.sql.functions)
  * plus the declared gap functions implemented as custom Catalyst
  * expressions: linear_interpolate (interpolate.c:234) and trigram
  * similarity (contrib/pg_trgm).
  */
object FunctionQueries {

  val queries: Map[String, QueryFn] = Map(

    // String family (varlena.c, oracle_compat.c).
    "q70_string_funcs" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        substring(col("p_name"), 1, 5).as("first5"),
        split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        translate(col("p_brand"), "#", "-").as("brand_tr"),
        instr(col("p_name"), "o").as("first_o"),
        reverse(col("p_brand")).as("brand_rev"),
        repeat(lit("ab"), 3).as("abx3"),
        length(col("p_name")).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))),

    // Date/time family (date.c, timestamp.c, datetime.c).
    "q71_datetime_funcs" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        expr("EXTRACT(DAYOFWEEK_ISO FROM o_orderdate)").cast("int").as("isodow"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).as("days_since"),
        (col("o_orderdate") + expr("INTERVAL '1' MONTH")).as("plus_month"),
        last_day(col("o_orderdate")).as("month_end"))),

    // JSON family (json.c, jsonfuncs.c) over events.props. json_tuple
    // streams ONE Jackson parse per row for all requested fields — a
    // measured 2× over the equivalent pruned from_json (0.26 s vs
    // 0.49 s at sf0.1); try_cast keeps from_json's null-on-malformed
    // semantics under ANSI mode.
    "q72_json_funcs" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_id"), json_tuple(col("props"), "k", "missing"))
        .select(
          col("event_id"),
          col("c0").as("k_str"),
          col("c0").try_cast("int").as("k_int"),
          col("c0").try_cast("int").as("k_typed"),
          col("c1").as("absent"))
    }),

    // Array family (arrayfuncs.c: unnest/slice/…; lambdas ≈ SRF pipelines).
    "q73_array_funcs" -> ((s, d) => {
      val words = split(col("text"), " ")
      t(s, d, "documents").select(
        col("doc_id"),
        size(words).as("n_words"),
        // serialized with array_join: raw ARRAY output crashes the driver's
        // pandas-based oracle compare, so catalog queries emit strings.
        array_join(slice(words, 1, 3), " ").as("first3"),
        array_contains(words, "data").as("has_data"),
        size(array_distinct(words)).as("n_uniq"),
        element_at(words, 2).as("second_word"),
        aggregate(words, lit(0), (acc, w) => acc + length(w)).as("total_chars"),
        size(filter(words, w => length(w) > 5)).as("n_long"),
        array_max(transform(words, w => length(w))).as("longest"))
    }),

    // Multi-dimensional arrays (PG arrays are N-D; SURVEY §1.2 maps them
    // to nested ArrayType): element access, array_dims (arrayfuncs.c:
    // 1654), [lo:hi][lo:hi] slicing with PG clamping, flatten-aggregate.
    "q73c_multidim_array" -> ((s, d) => {
      import graft.functions.PgArrays._
      graft.Tables.register(s, d)
      val base = s.sql(
        """SELECT id, m FROM VALUES
          |  (1, array(array(1, 2, 3), array(4, 5, 6), array(7, 8, 9))),
          |  (2, array(array(10, 11, 12), array(13, 14, 15),
          |      array(16, 17, 18))) AS t(id, m)""".stripMargin)
      def flat(c: Column) = array_join(flatten(c).cast("array<string>"), ",")
      base.select(col("id"),
        expr("m[0][1]").as("a12"), expr("m[1][0]").as("a21"),
        size(col("m")).as("n_rows_m"), size(expr("m[0]")).as("n_cols"),
        expr("aggregate(flatten(m), 0, (acc, x) -> acc + x)").as("total"),
        arrayDims(col("m"), 2).as("dims"),
        flat(slice2d(col("m"), 2, 3, 1, 2)).as("sub_flat"),
        arrayDims(slice2d(col("m"), 2, 3, 1, 2), 2).as("sub_dims"),
        // slice past the extent clamps, as PG array_get_slice
        flat(slice2d(col("m"), 2, 9, 2, 9)).as("clamped_flat"))
    }),

    // Map type functions (hstore analog, SURVEY §1.2) over parsed JSON.
    "q73b_map_funcs" -> ((s, d) => {
      val m = from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType))
      t(s, d, "events").select(
        col("event_id"),
        array_join(map_keys(m), ",").as("ks"),
        array_join(map_values(m).cast("array<string>"), ",").as("vs"),
        element_at(m, "k").as("k_val"),
        size(m).as("n_entries"))
    }),

    // Regex + fuzzy (regexp.c, contrib/fuzzystrmatch levenshtein).
    "q74_regex_funcs" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        col("p_name").rlike("^p").as("starts_p"),
        levenshtein(col("p_brand"), lit("Brand#13")).as("lev_to_13"))),

    // LIKE / ILIKE family + NULLIF/COALESCE (like.c, oracle_compat.c).
    "q74b_like_family" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        col("p_name").like("%copper%").as("has_copper"),
        col("p_name").ilike("%COPPER%").as("has_copper_ci"),
        (!col("p_type").like("PROMO%")).as("not_promo"),
        col("p_brand").like("Brand#1_").as("brand_1x"),
        nullif(col("p_size"), lit(1)).as("size_or_null"),
        coalesce(nullif(col("p_size"), lit(1)), lit(-1)).as("size_coalesced"))),

    // SIMILAR TO (regexp.c similar_escape): the SQL:1999 pattern
    // language translated to an anchored POSIX regex driver-side —
    // %→.*, _→., admitted metachars pass through, everything else is
    // literal — then matched by codegen RLIKE. DuckDB runs the same
    // patterns natively as the oracle.
    "q150_similar_to" -> ((s, d) => {
      import graft.functions.SimilarTo.similarTo
      t(s, d, "part").select(
        col("p_partkey"),
        similarTo(col("p_name"), "%(copper|steel)%").as("metal"),
        similarTo(col("p_type"), "(PROMO|STANDARD)%").as("promo_std"),
        similarTo(col("p_brand"), "Brand#[12]_").as("brand_12x"),
        similarTo(col("p_name"), "%burnished_____%").as("burn5"))
    }),

    // ts_stat (tsvector_op.c ts_stat_sql): per-lexeme document and
    // occurrence counts over the corpus — explode + one 2-stage agg.
    "q151_ts_stat" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(countDistinct(col("doc_id")).as("ndoc"),
          count(lit(1)).as("nentry"))),

    // tsvector utility ops (tsvector_op.c): strip / length / ts_delete.
    "q152_tsvector_ops" -> ((s, d) => {
      import graft.functions.Ranges._
      t(s, d, "documents")
        // tsvector construction sorts/groups every doc's lexemes —
        // CPU-bound work the 1-partition fixture scan would pin to one
        // core (same spread as q196/q142)
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("tsv", toTsVector(split(col("text"), " ")))
        .select(col("doc_id"),
          tsvLength(col("tsv")).as("n_lex"),
          // serialized: raw ARRAY output crashes the driver's pandas compare
          array_join(tsvStrip(col("tsv")), " ").as("lexemes"),
          size(tsDelete(col("tsv"), "data")).as("n_after_del"))
    }),

    // jsonb_set nested update (jsonfuncs.c:4161 setPath): replace a
    // nested scalar, replace / append-past-end an array element, and
    // create a missing top-level key — the oracle constructs each
    // expected document text from the base columns.
    "q163_jsonb_set" -> ((s, d) => {
      val j = concat(lit("{\"cust\":{\"key\":"), col("o_custkey"),
        lit(",\"seg\":\""), col("o_orderstatus"),
        lit("\"},\"tags\":[\"base\",\""), col("o_orderstatus"),
        lit("\"],\"prio\":\""), col("o_orderpriority"), lit("\"}"))
      t(s, d, "orders")
        // per-row parse + 4 set operations on a 1-partition scan:
        // spread first (same move as q142/q196)
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("doc", j)
        // all four independent sets share ONE document parse
        .withColumn("r", expr(
          """jsonb_set_all(doc,
            |  '{cust,seg}', '"Z"',
            |  '{tags,1}', '"upd"',
            |  '{tags,5}', '"app"',
            |  '{newkey}', CAST(o_custkey AS STRING))""".stripMargin))
        .select(col("o_orderkey"),
          element_at(col("r"), 1).as("set_nested"),
          element_at(col("r"), 2).as("set_elem"),
          element_at(col("r"), 3).as("append_elem"),
          element_at(col("r"), 4).as("create_key"))
    }),

    // jsonpath member/subscript access (utils/adt/jsonpath_exec.c
    // jsonb_path_query_first): the $.a.b[n] navigation subset via
    // Spark's codegen get_json_object; missing paths yield NULL.
    "q157_jsonpath" -> ((s, d) => {
      val j = concat(lit("{\"cust\":{\"key\":"), col("o_custkey"),
        lit(",\"tags\":[\"a\",\""), col("o_orderstatus"),
        lit("\"]},\"prio\":\""), col("o_orderpriority"), lit("\"}"))
      // ONE parse per row: four get_json_object calls each re-parse the
      // document (measured 1.6 s vs 0.8 s at sf0.1); from_json parses
      // once and the paths become struct field accesses. Values are
      // identical (verified exceptAll-empty over the full table): the
      // string-typed key reads the number token's text exactly like
      // get_json_object, and '$.missing' stays a REAL per-row lookup —
      // a schema field the document never carries, which from_json
      // resolves to NULL row by row (the missing-path semantics the
      // entry exercises).
      val sch = org.apache.spark.sql.types.StructType.fromDDL(
        "cust struct<key:string, tags:array<string>>, prio string, " +
          "missing string")
      t(s, d, "orders").withColumn("doc", j)
        .withColumn("p", from_json(col("doc"), sch))
        .select(col("o_orderkey"),
          col("p.cust.key").as("ckey"),
          element_at(col("p.cust.tags"), 2).as("tag2"),
          col("p.prio").as("prio"),
          col("p.missing").as("mis"))
    }),

    // row_to_json + json_agg (utils/adt/json.c row_to_json /
    // json_agg): per-row JSON from a struct, aggregated per group in a
    // deterministic (sorted) order — PG users write json_agg(... ORDER
    // BY ...) for the same reason.
    "q158_json_agg" -> ((s, d) =>
      t(s, d, "nation")
        .withColumn("rj", to_json(struct(col("n_nationkey").as("key"),
          col("n_name").as("name"))))
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"),
          concat(lit("["), array_join(sort_array(collect_list(col("rj"))), ","),
            lit("]")).as("members"))),

    // hstore surface (contrib/hstore): parse 'k=>v' text with
    // str_to_map, then -> / ? / akeys / avals / || (right wins) /
    // delete — all map builtins, codegen.
    "q159_hstore" -> ((s, d) => {
      import graft.functions.Jsonb
      t(s, d, "orders")
        // per-row map construction + 6 map ops on a 1-partition scan
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("h", expr(
          "str_to_map(concat('status=>', o_orderstatus, ',prio=>', " +
            "o_orderpriority, ',ck=>', o_custkey), ',', '=>')"))
        .select(col("o_orderkey"),
          element_at(col("h"), "prio").as("arrow_prio"),
          Jsonb.hasKey(col("h"), "status").as("has_status"),
          // serialized: raw ARRAY output crashes the driver's pandas compare
          array_join(map_keys(col("h")), ",").as("akeys"),
          array_join(map_values(col("h")), ",").as("avals"),
          element_at(Jsonb.concat(col("h"),
            map(lit("status"), lit("X"))), "status").as("merged_status"),
          size(Jsonb.removeKey(col("h"), "ck")).as("n_after_del"))
    }),

    // generate_subscripts / array_positions / array_fill
    // (arrayfuncs.c) over the nested N-d model of q73c.
    "q156_array_extras" -> ((s, d) => {
      import graft.functions.PgArrays._
      t(s, d, "orders")
        .withColumn("arr", array(col("o_orderstatus"),
          col("o_orderpriority"), col("o_orderstatus")))
        .withColumn("grid", arrayFill(col("o_custkey"), Seq(2, 3)))
        // serialized: raw ARRAY output crashes the driver's pandas compare
        .select(col("o_orderkey"),
          array_join(arrayPositions(col("arr"), col("o_orderstatus"))
            .cast("array<string>"), ",").as("pos_status"),
          array_join(generateSubscripts(col("grid"), 1)
            .cast("array<string>"), ",").as("subs1"),
          array_join(generateSubscripts(col("grid"), 2)
            .cast("array<string>"), ",").as("subs2"),
          array_join(flatten(col("grid")).cast("array<string>"), ",")
            .as("grid_flat"))
    }),

    // citext (contrib/citext): case-insensitive text via Spark 4
    // collations — a UTF8_LCASE-collated column groups and compares
    // case-insensitively at the ENGINE level (no lower() rewrite in
    // user queries, exactly citext's pitch). Mixed-case variants are
    // planted per row; the group representative is normalized with
    // upper() so output is deterministic. The oracle spells the same
    // semantics with explicit case folding.
    "q175_citext" -> ((s, d) =>
      t(s, d, "customer")
        .withColumn("seg", expr("collate(" +
          "CASE WHEN c_custkey % 2 = 0 THEN initcap(lower(c_mktsegment)) " +
          "ELSE c_mktsegment END, 'UTF8_LCASE')"))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"))
        .select(upper(col("seg")).as("seg_norm"), col("n"),
          (col("seg") === lit("bUiLdInG")).as("is_building"))),

    // ltree (contrib/ltree): materialized-path trees over the
    // region→nation hierarchy — nlevel/subpath/@>/lca plus lquery
    // matching with alternation and bounded star, all column algebra.
    "q176_ltree" -> ((s, d) => {
      import graft.functions.Ltree
      def label(c: Column) = lower(regexp_replace(c, " ", "_"))
      t(s, d, "nation").join(t(s, d, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"),
          concat(lit("world."), label(col("r_name")), lit("."),
            label(col("n_name"))).as("path"))
        .select(col("n_nationkey"), col("path"),
          Ltree.nlevel(col("path")).as("depth"),
          Ltree.subpath(col("path"), 1, 1).as("region_label"),
          Ltree.isAncestor(lit("world.asia"), col("path")).as("in_asia"),
          Ltree.isDescendant(col("path"), lit("world")).as("under_world"),
          Ltree.lca(col("path"), lit("world.asia.japan")).as("lca_jp"),
          Ltree.matches(col("path"), "world.*{1}.china|india").as("cn_in"),
          Ltree.matches(col("path"), "world.*").as("any_depth"))
    }),

    // Non-default lower bounds (arrayfuncs.c array_lower/array_upper):
    // a [-2:0] array built with array_fill's lb form — subscripts
    // translate by the bound, out-of-bounds reads are NULL, slices
    // clamp and re-base to 1, array_dims shows the real bounds.
    "q171_array_lower_bounds" -> ((s, d) => {
      import graft.functions.PgArrays._
      t(s, d, "orders")
        .withColumn("a", lbArray(array(col("o_orderstatus"),
          col("o_orderpriority"),
          concat(lit("c"), col("o_custkey"))), -2))
        .select(col("o_orderkey"),
          arrayLower(col("a")).as("lo"),
          arrayUpper(col("a")).as("hi"),
          lbDims(col("a")).as("dims"),
          lbSubscript(col("a"), lit(-2)).as("first_e"),
          lbSubscript(col("a"), lit(0)).as("last_e"),
          lbSubscript(col("a"), lit(1)).as("oob"),
          array_join(lbSlice(col("a"), lit(-1), lit(5)), ",").as("tail2"))
    }),

    // date_bin arbitrary-origin bucketing + width_bucket histograms
    // (timestamp.c timestamp_bin; numeric.c width_bucket_float8) — the
    // oracle spells the identical pmod/floor arithmetic.
    "q155_bin_bucket" -> ((s, d) => {
      import graft.functions.PgBin
      t(s, d, "events").select(
        col("event_id"),
        PgBin.dateBin(900, col("ts"),
          lit("2024-01-01 00:00:00").cast("timestamp")).cast("string")
          .as("bin15m"),
        PgBin.widthBucket(col("value"), 0.0, 100.0, 10).as("bucket"))
    }),

    // unaccent dictionary (contrib/unaccent) + fuzzystrmatch
    // levenshtein (contrib/fuzzystrmatch) — accents injected via
    // literals since the fixtures are ASCII; DuckDB strips the same
    // accents natively and ships levenshtein as the oracle.
    "q153_unaccent_fuzzy" -> ((s, d) => {
      import graft.functions.Unaccent.unaccent
      t(s, d, "part").select(
        col("p_partkey"),
        unaccent(concat(lit("café crème "), col("p_name"))).as("plain"),
        // diacritics only: PG's unaccent also folds ligatures (œ→oe,
        // ß→ss — asserted in ExpressionSpec) but ICU strip_accents does
        // not, so the oracle-checked row sticks to the agreed subset
        unaccent(lit("Ångström façade naïve ñandú")).as("fixed"),
        levenshtein(col("p_name"), col("p_type")).as("lev_nt"),
        levenshtein(col("p_brand"), lit("Brand#11")).as("lev_b"),
        // levenshtein_less_equal(a, b, max): the bounded variant early-
        // exits once the distance exceeds max (fuzzystrmatch's banded
        // DP) — Spark's threshold form returns -1 past the bound, PG
        // returns max+1; mapped here
        when(levenshtein(col("p_name"), col("p_type"), 10) === -1, 11)
          .otherwise(levenshtein(col("p_name"), col("p_type"), 10))
          .as("lev_le10"))
    }),

    // PG format()/quote_ident/quote_literal (varlena.c text_format):
    // the template is parsed driver-side into one concat expression;
    // %I quotes only when needed, %L maps NULL to the keyword NULL.
    "q154_pg_format" -> ((s, d) => {
      import graft.functions.PgFormat
      t(s, d, "nation").select(
        col("n_nationkey"),
        PgFormat.format("INSERT INTO %I (name, key) VALUES (%L, %s)",
          lower(col("n_name")), col("n_name"), col("n_nationkey")).as("stmt"),
        PgFormat.format("%1$s=%1$L ident=%I pct=100%%",
          col("n_name"), concat(col("n_name"), lit(" x"))).as("pos"),
        PgFormat.quoteIdent(col("n_name")).as("qi"),
        PgFormat.quoteLiteral(
          when(col("n_nationkey") % 2 === 0, col("n_name"))).as("ql"))
    }),

    // Crypto/encode (encode.c, pgcrypto, md5 in varlena.c).
    "q75_hash_funcs" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        md5(col("c_name").cast("binary")).as("md5_name"),
        sha2(col("c_name").cast("binary"), 256).as("sha256_name"),
        base64(col("c_name").cast("binary")).as("b64_name"))),

    // pgcrypto AES (contrib/pgcrypto/pgp-encrypt.c encrypt/decrypt):
    // Spark's aes_encrypt/aes_decrypt builtins. ECB here because it is
    // deterministic (same ciphertext both runs — GCM salts a random IV
    // per call, the right default for real data but unhashable); the
    // oracle asserts the roundtrip identity, plus a pinned ciphertext
    // digest computed from AES-128-ECB's definition on a known vector.
    "q143_aes_crypto" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        expr("CAST(aes_decrypt(aes_encrypt(c_name, '0123456789abcdef', 'ECB'), " +
          "'0123456789abcdef', 'ECB') AS STRING)").as("rt_name"),
        expr("CAST(aes_decrypt(unbase64(base64(aes_encrypt(c_mktsegment, " +
          "'0123456789abcdef0123456789abcdef', 'ECB'))), " +
          "'0123456789abcdef0123456789abcdef', 'ECB') AS STRING)").as("rt_seg"),
        expr("base64(aes_encrypt('fixed vector', '0123456789abcdef', 'ECB'))")
          .as("ct_fixed"))),

    // pgcrypto PGP symmetric family (contrib/pgcrypto/pgp-encrypt.c,
    // pgp-armor.c — RFC 4880): encryption draws a random salt+prefix
    // per call, so the catalog row asserts the roundtrip identities
    // (decrypt∘encrypt = id across text/bytea/option paths, dearmor∘
    // armor = id) plus the SYMKEY key id; the pinned reference vectors
    // (the armored messages from pgp-decrypt.sql) live in PgpSpec.
    "q249_pgp_sym" -> ((s, d) =>
      t(s, d, "nation").select(
        col("n_nationkey"),
        expr("pgp_sym_decrypt(pgp_sym_encrypt(n_name, 'k3y'), 'k3y')")
          .as("rt_text"),
        expr("CAST(pgp_sym_decrypt_bytea(pgp_sym_encrypt_bytea(" +
          "CAST(concat(n_name, '/', n_nationkey) AS BINARY), 'k3y'), 'k3y') " +
          "AS STRING)").as("rt_bytea"),
        expr("pgp_sym_decrypt(pgp_sym_encrypt(n_name, 'k3y', " +
          "'cipher-algo=aes256, compress-algo=2, s2k-digest-algo=sha256'), " +
          "'k3y')").as("rt_opts"),
        expr("CAST(dearmor(armor(CAST(n_name AS BINARY))) AS STRING)")
          .as("rt_armor"),
        expr("pgp_key_id(pgp_sym_encrypt(n_name, 'k3y'))").as("kid"))),

    // intarray ops (contrib/intarray/_int_tool.c, _int_op.c): sort +
    // adjacent uniq (the canonical dedup idiom — uniq alone keeps
    // non-adjacent repeats), idx, subarray, #, element removal keeping
    // duplicates, && overlap and @> containment. Collection outputs
    // serialized per the driver convention.
    "q193_intarray" -> ((s, d) => {
      import graft.functions.PgArrays
      val a = array((col("o_orderkey") % 5).cast("int"),
        (col("o_orderkey") % 7).cast("int"),
        (col("o_orderkey") % 5).cast("int"), lit(3).cast("int"))
      val b = array(lit(1).cast("int"), lit(3).cast("int"))
      t(s, d, "orders").select(col("o_orderkey"),
        array_join(PgArrays.adjacentUniq(a).cast("array<string>"), ",")
          .as("uniq_raw"),
        array_join(PgArrays.adjacentUniq(sort_array(a)).cast("array<string>"),
          ",").as("uniq_sorted"),
        array_position(a, (col("o_orderkey") % 7).cast("int")).cast("int")
          .as("idx7"),
        array_join(slice(a, 2, 2).cast("array<string>"), ",").as("sub"),
        size(a).as("card"),
        array_join(array_remove(a, 3).cast("array<string>"), ",")
          .as("minus3"),
        arrays_overlap(a, b).as("overlaps"),
        forall(b, x => array_contains(a, x)).as("contains_b"))
    }),

    // uuid-ossp name-based UUIDs (uuid-ossp.c:505, RFC 4122 §4.3):
    // stable ETL keys from md5(namespace bytes ++ name) with the
    // version/variant nibbles stamped. The catalog row uses an
    // ASCII-byte namespace so the oracle can replay the digest through
    // DuckDB's varchar md5; the real DNS-namespace vectors are pinned
    // in ExpressionSpec.
    "q192_uuid_v3" -> ((s, d) => {
      import graft.functions.UuidOssp
      val asciiNs = "graftnamespace00".getBytes("UTF-8")
        .map(b => f"$b%02x").mkString
      val nsUuid = s"${asciiNs.substring(0, 8)}-${asciiNs.substring(8, 12)}-" +
        s"${asciiNs.substring(12, 16)}-${asciiNs.substring(16, 20)}-" +
        asciiNs.substring(20)
      t(s, d, "customer").select(col("c_custkey"),
        UuidOssp.uuidV3(nsUuid, col("c_name")).as("v3"))
    }),

    // bytea byte-level surface (varlena.c:1878-2239 byteaoctetlen/
    // byteapos/byteaGetByte/byteaSetByte + encode.c): binary built from
    // known ASCII, so the oracle derives every byte from the source
    // string — char codes, aligned position, hex/base64 images.
    "q189_bytea" -> ((s, d) => {
      import graft.functions.Bytea
      val b = concat(col("o_orderstatus"), lit("-"), col("o_orderpriority"))
        .cast("binary")
      t(s, d, "orders").select(col("o_orderkey"),
        octet_length(b).as("olen"),
        Bytea.getByte(b, 0).as("b0"),
        Bytea.getByte(b, 2).as("b2"),
        hex(Bytea.setByte(b, 0, 0x58)).as("set0"),
        Bytea.bytePosition(b, lit("-").cast("binary")).as("dash_pos"),
        Bytea.bytePosition(b, lit("ZZ").cast("binary")).as("missing_pos"),
        hex(b).as("hx"),
        base64(b).as("b64"))
    }),

    // orafce Oracle-compat functions (gpcontrib/orafce/datefce.c:192-196
    // next_day/last_day/months_between/add_months; others.c nvl/nvl2):
    // every one maps onto a Spark builtin with matching semantics —
    // including Oracle's negative-position substr and the months_between
    // 31-day-month fraction rule, which the oracle re-derives.
    "q187_orafce" -> ((s, d) => sql(s, d,
      """SELECT o_orderkey,
        |  add_months(CAST(o_orderdate AS DATE), 3) AS am,
        |  last_day(CAST(o_orderdate AS DATE)) AS ld,
        |  next_day(CAST(o_orderdate AS DATE), 'MON') AS nd,
        |  round(months_between(TIMESTAMP '1997-06-15 00:00:00', o_orderdate), 4) AS mb,
        |  nvl(NULLIF(o_orderstatus, 'P'), 'PENDING') AS nv,
        |  nvl2(NULLIF(o_orderstatus, 'P'), 'SET', 'UNSET') AS nv2,
        |  CAST(instr(o_orderpriority, '-') AS INT) AS ins,
        |  substring(o_orderpriority, length(o_orderpriority) - 3, 3) AS sub
        |FROM orders""".stripMargin)),

    // contrib/earthdistance geo_distance (earthdistance.c:60-77): the
    // published half-angle formula on the 3958.747716-mile sphere, with
    // coordinates synthesized to sweep the >180-degree wrap branch.
    "q188_earthdistance" -> ((s, d) => {
      import graft.functions.EarthDistance
      val lon = (col("c_custkey") % 360 - 180).cast("double") + 0.5
      val lat = (col("c_custkey") % 180 - 90).cast("double") + 0.5
      t(s, d, "customer").select(col("c_custkey"),
        round(EarthDistance.geoDistance(lon, lat,
          lit(-74.0), lit(40.7)), 6).as("miles_to_nyc"))
    }),

    // fuzzystrmatch soundex/difference (contrib/fuzzystrmatch): codes
    // from Spark's builtin, positional difference 0..4; the oracle
    // carries codes from an INDEPENDENT soundex implementation pinned
    // against the published examples — builtin and re-derivation must
    // agree on the whole vocabulary.
    "q185_soundex" -> ((s, d) => {
      import graft.functions.Soundex
      val w = split(col("p_name"), " ")
      t(s, d, "part").select(col("p_partkey"),
        soundex(element_at(w, 1)).as("sx1"),
        soundex(element_at(w, 2)).as("sx2"),
        Soundex.difference(element_at(w, 1), element_at(w, 2)).as("diff"),
        Soundex.difference(element_at(w, 1), element_at(w, 1)).as("diff_self"))
    }),

    // inet/cidr operators (network.c:309-816): host/masklen/network/
    // broadcast/netmask/hostmask plus << and <<= containment, all as
    // bit-arithmetic column algebra over PG text addresses. The oracle
    // replays the same 32-bit arithmetic in SQL.
    "q180_inet" -> ((s, d) => {
      import graft.functions.Inet
      val ip = concat(lit("10."),
        (col("c_custkey") % 200).cast("string"), lit("."),
        (col("c_custkey") % 97).cast("string"), lit("."),
        (col("c_custkey") % 250).cast("string"), lit("/"),
        (lit(16) + col("c_custkey") % 16).cast("string"))
      val net = lit("10.42.0.0/16")
      t(s, d, "customer").select(col("c_custkey"),
        Inet.host(ip).as("host"),
        Inet.masklen(ip).as("mlen"),
        Inet.network(ip).as("network"),
        Inet.broadcast(ip).as("bcast"),
        Inet.netmask(ip).as("netmask"),
        Inet.hostmask(ip).as("hostmask"),
        Inet.containedInEq(ip, net).as("in_net"),
        Inet.containedIn(ip, net).as("in_net_strict"))
    }),

    // IPv6 inet/cidr (network.c is family-generic over ip_bits(); so is
    // InetOps): addresses built as 2001:db8:X::Y/mlen with mlen in
    // {32,48,64}, every operator exercised plus cross-family
    // containment. The oracle string-builds the inet_net_ntop output
    // shape per mask length — matching forces parse, 128-bit mask
    // algebra, zero-run compression, and family dispatch to all agree.
    "q195_inet6" -> ((s, d) => {
      import graft.functions.Inet
      val x = lower(hex((lit(1) + col("c_custkey") % 4000).cast("int")))
      val y = lower(hex((lit(1) + col("c_custkey") % 9).cast("int")))
      val mlen = (lit(32) + (col("c_custkey") % 3) * 16).cast("int")
      val ip = concat(lit("2001:db8:"), x, lit("::"), y,
        lit("/"), mlen.cast("string"))
      t(s, d, "customer").select(col("c_custkey"),
        Inet.host(ip).as("host"),
        Inet.masklen(ip).as("mlen"),
        Inet.family(ip).as("fam"),
        Inet.network(ip).as("network"),
        Inet.broadcast(ip).as("bcast"),
        Inet.netmask(ip).as("netmask"),
        Inet.hostmask(ip).as("hostmask"),
        Inet.containedInEq(ip, lit("2001:db8:7::/48")).as("in_net"),
        Inet.containedIn(ip, lit("2001:db8:7::/48")).as("in_net_strict"),
        Inet.containedInEq(lit("10.0.0.1"), lit("2001:db8::/32")).as("xfam"))
    }),

    // pgcrypto crypt()/gen_salt() (contrib/pgcrypto/pgcrypto.c:203,
    // crypt-md5.c): gen_salt draws a fresh random salt per row, so the
    // hash itself is unpinnable — the catalog row verifies the CONTRACT:
    // crypt(pw, stored) == stored for the right password, != for a
    // wrong one, plus a fixed-salt hash pinned against glibc crypt(3).
    // Runs on a deterministic 5% slice: MD5-crypt is key stretching —
    // 1000 MD5 rounds per call BY DESIGN, and this row does three calls
    // per row. The per-row cost is the algorithm's contract, not
    // overhead; the slice keeps the bench bounded (same device as q142).
    "q167_pgcrypto_crypt" -> ((s, d) =>
      t(s, d, "customer").where(col("c_custkey") % 20 === 0)
        .withColumn("h", expr("crypt(c_name, gen_salt('md5'))"))
        .select(col("c_custkey"),
          (expr("crypt(c_name, h)") === col("h")).as("matches"),
          (expr("crypt(concat(c_name, 'x'), h)") === col("h")).as("wrong_pw"),
          expr("crypt('password', '$1$saltsalt$')").as("pinned"))),

    // pgcrypto bcrypt (px-crypt.c:86-110 scheme dispatch,
    // crypt-blowfish.c): gen_salt('bf') + the same roundtrip contract as
    // q167, with the pinned column the published OpenBSD/jBCrypt cost-6
    // test vector. 2^6 eksblowfish key schedules per call BY DESIGN
    // (the scheme's work factor, ~6 ms) — the slice keeps it bounded.
    "q196_bcrypt" -> ((s, d) =>
      t(s, d, "customer").where(col("c_custkey") % 100 === 0)
        // ~6 ms of eksblowfish key schedule per crypt call BY DESIGN:
        // the work is CPU-bound, but the sliced rows arrive in the
        // scan's 1-2 partitions, idling every other core. Spread them
        // cluster-wide first — the tiny-row shuffle is noise next to
        // the crypt cost at any scale.
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("h", expr("crypt(c_name, gen_salt('bf'))"))
        .select(col("c_custkey"),
          (expr("crypt(c_name, h)") === col("h")).as("matches"),
          (expr("crypt(concat(c_name, 'x'), h)") === col("h")).as("wrong_pw"),
          expr("crypt('', '$2a$06$DCq7YPn5Rq63x1Lad4cll.')").as("pinned"))),

    // PG JSON constructor spellings (json.c json_build_object/_array,
    // jsonb_pretty, json_strip_nulls, the json_array_elements SRF):
    // built text is the engine's compact normal form; explicit nulls
    // are KEPT (ignoreNullFields off) so strip_nulls has work to do.
    "q228_json_builders" -> ((s, d) =>
      t(s, d, "nation").select(col("n_nationkey"),
        expr("json_build_object('name', n_name, 'region', n_regionkey)")
          .as("obj"),
        expr("json_build_array(n_nationkey, n_regionkey)").as("arr"),
        expr("jsonb_pretty(json_build_object('k', n_nationkey))").as("pp"),
        expr("json_strip_nulls(json_build_object('a', n_name, " +
          "'b', nullif(n_name, n_name)))").as("stripped"),
        expr("json_array_elements(json_build_array(n_nationkey, n_regionkey))")
          .as("elem"))),

    // PG string SRFs + null counters (text_to_table, regexp_split_*,
    // num_nulls/num_nonnulls, quote_nullable, starts_with): the SRF
    // explodes one row per '-'-part; the scalar columns ride along.
    "q221_string_srf" -> ((s, d) =>
      t(s, d, "orders").where(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey"),
          expr("string_to_table(o_orderpriority, '-')").as("word"),
          expr("array_join(regexp_split_to_array(o_orderpriority, '[AEIOU]+'), '_')")
            .as("consonants"),
          expr("num_nulls(NULLIF(o_orderstatus, 'O'), o_orderpriority)").as("nn"),
          expr("num_nonnulls(NULLIF(o_orderstatus, 'O'), o_orderpriority)").as("nnn"),
          expr("quote_nullable(NULLIF(o_orderstatus, 'F'))").as("qn"),
          expr("CASE WHEN starts_with(o_orderpriority, '1') THEN 1 ELSE 0 END")
            .as("sw"))),

    // pgcrypto DES + extended-DES crypt (px-crypt.c scheme-table
    // fallback row + the '_' BSDi scheme, crypt-des.c): the same
    // roundtrip contract as q167/q196, with pinned columns from
    // libcrypt known-answer vectors for both schemes.
    "q218_crypt_des" -> ((s, d) =>
      t(s, d, "customer").where(col("c_custkey") % 50 === 0)
        // crypt kernels on a 1-partition slice — spread like q196
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("hd", expr("crypt(c_name, gen_salt('des'))"))
        .withColumn("hx", expr("crypt(c_name, gen_salt('xdes'))"))
        .select(col("c_custkey"),
          (expr("crypt(c_name, hd)") === col("hd")).as("des_matches"),
          (expr("crypt(concat(c_name, 'x'), hx)") === col("hx")).as("xdes_wrong_pw"),
          expr("crypt('password', 'ab')").as("pinned_des"),
          expr("crypt('password', '_J9..SALT')").as("pinned_xdes"))),

    // XML type + XPath surface (utils/adt/xml.c:57-148 xmlelement /
    // xpath; contrib xml2): documents are built per row, then values
    // extracted back — string, typed scalar, boolean predicate, and
    // node-set list. The oracle derives the same values from the base
    // columns, so extraction must invert construction exactly. One
    // xpath_all call parses each document ONCE and evaluates every
    // XPath against the same DOM tree (Spark's xpath_* builtins would
    // re-parse per call); per-row constant, embarrassingly parallel,
    // no shuffle. Runs on a deterministic 5% slice to keep the bench
    // bounded — the cost per row is identical at any scale.
    "q142_xml_xpath" -> ((s, d) =>
      t(s, d, "orders").where(col("o_orderkey") % 20 === 0)
        // DOM parse + 5 XPath evals ≈ 0.2 ms/row: CPU-bound work that
        // the sliced scan otherwise leaves on 1-2 cores (same spread
        // as q196_bcrypt; the narrow-row shuffle is noise)
        .repartition(s.sparkContext.defaultParallelism)
        .select(
        col("o_orderkey"),
        concat(lit("<order id=\""), col("o_orderkey"),
          lit("\"><status>"), col("o_orderstatus"),
          lit("</status><priority>"), col("o_orderpriority"),
          lit("</priority><cust key=\""), col("o_custkey"),
          lit("\"/></order>")).as("x"))
        .withColumn("f", expr(
          "xpath_all(x, '/order/status', '/order/priority/text()', " +
            "'/order/cust/@key', '/order[@id>10000]', '/order/*/text()')"))
        .select(col("o_orderkey"),
          element_at(col("f.c0"), 1).as("status"),
          element_at(col("f.c1"), 1).as("priority"),
          element_at(col("f.c2"), 1).cast("long").as("cust"),
          (size(col("f.c3")) > 0).as("big_id"),
          // serialized: raw ARRAY crashes the driver's pandas compare
          array_join(col("f.c4"), ",").as("texts"))),

    // Oracle-style DECODE (gram.y:15219) — Spark decode() builtin; the
    // oracle spells it as the equivalent CASE.
    "q76_decode_case" -> ((s, d) =>
      t(s, d, "orders")
        .select(expr(
          "decode(o_orderstatus, 'F', 'finished', 'O', 'open', 'P', 'pending', 'other')")
          .as("status_name"))
        .groupBy("status_name").agg(count(lit(1)).as("n"))),

    // linear_interpolate gap-fill (interpolate.c:234) — custom
    // RuntimeReplaceable expression; interpolates value at ts+30s between
    // consecutive events per user.
    "q77_interpolate" -> ((s, d) => sql(s, d,
      """SELECT event_id, user_id,
        |  linear_interpolate(
        |    CAST(unix_micros(ts) AS DOUBLE) + 30e6,
        |    CAST(unix_micros(ts) AS DOUBLE), value,
        |    CAST(unix_micros(LEAD(ts) OVER w) AS DOUBLE),
        |    LEAD(value) OVER w) AS interp_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),

    // Range-type operators (rangetypes.c): [lo,hi) contains/overlaps/
    // intersection over acctbal bands.
    "q38_range_ops" -> ((s, d) => {
      import graft.functions.Ranges._
      val c = t(s, d, "customer")
      val lo = col("c_acctbal") - 100.0
      val hi = col("c_acctbal") + 100.0
      c.select(col("c_custkey"),
        containsElem(lo, hi, lit(5000.0)).as("holds_5k"),
        overlaps(lo, hi, lit(0.0), lit(500.0)).as("near_zero"),
        adjacent(lo, hi, hi, hi + 200.0).as("adj"),
        intersect(lo, hi, lit(4000.0), lit(6000.0)).getField("lo").as("ix_lo"))
    }),

    // tsvector-style full-text match + rank (tsvector.c/tsrank.c).
    "q39_text_search" -> ((s, d) => {
      import graft.functions.Ranges._
      val words = split(col("text"), " ")
      t(s, d, "documents")
        .where(tsMatch(words, Seq("data", "query")))
        .select(col("doc_id"),
          round(tsRank(words, Seq("data", "query")), 6).as("rank"))
    }),

    // tsquery phrase search (tsquery.c phrase operator / tsquery_phrase
    // _distance): `a <-> b` ordered adjacency, `a <N> b` exact distance,
    // composing with the boolean grammar at PG precedence. Positional
    // compile over the word array — no UDF.
    "q148_ts_phrase" -> ((s, d) => {
      import graft.functions.Ranges._
      t(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"),
          tsMatchQuery(col("words"), "data <-> query").as("adj_dq"),
          tsMatchQuery(col("words"), "hash <2> join").as("near_hj"),
          tsMatchQuery(col("words"),
            "scan & (data <-> query | query <-> data)").as("mix"))
    }),

    // ts_rewrite synonym/thesaurus expansion (tsquery_rewrite.c):
    // 'retrieval' is not in the corpus vocabulary, so the literal query
    // matches nothing; the rewrite rule expands it to 'query | scan'
    // and the rewritten query matches. The second rule shows the
    // commutative subtree match ('join & hash' finds target
    // 'hash & join') rewriting a boolean AND into a phrase query.
    "q165_ts_rewrite" -> ((s, d) => {
      import graft.functions.Ranges._
      t(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"),
          tsMatchQuery(col("words"), "data & retrieval").as("lit_match"),
          tsMatchRewritten(col("words"), "data & retrieval",
            Seq("retrieval" -> "(query | scan)")).as("rew_match"),
          tsMatchRewritten(col("words"), "join & hash",
            Seq("hash & join" -> "hash <-> join")).as("rew_phrase"))
    }),

    // tsquery constructors (to_tsany.c plainto/phraseto, wparser.c
    // websearch): free text -> tsquery through the english dictionary,
    // then compiled positionally. The document side stems EVERY word in
    // place (no filter), so lexeme positions equal original token
    // positions — which is what makes phraseto's stopword-gap distances
    // (`valu <2> tabl` from "value of tables") line up, exactly PG's
    // tsvector position accounting.
    "q178_tsquery_construct" -> ((s, d) => {
      import graft.functions.{Ranges, TsLexize}
      t(s, d, "documents")
        .withColumn("st", transform(split(col("text"), " "),
          x => call_function("porter_stem", lower(x))))
        .select(col("doc_id"),
          Ranges.tsMatchQuery(col("st"),
            TsLexize.plaintoTsquery("the merges of data")) // merg & data
            .as("plain"),
          Ranges.tsMatchQuery(col("st"),
            TsLexize.phrasetoTsquery("value of tables")) // valu <2> tabl
            .as("phrase_gap"),
          Ranges.tsMatchQuery(col("st"),
            TsLexize.websearchToTsquery("\"data query\" OR scan -merges"))
            .as("web")) // data <-> queri | scan & !(merg)
    }),

    // Stemmed text search through the `english` configuration
    // (snowball/dict_snowball.c + stopwords/english.stop): lowercase →
    // drop stopwords → Porter-stem, then match/rank on stems — the
    // inflected query terms "querying"/"merges" stem to the same
    // lexemes as the document words "query"/"merge". The lexize chain
    // is one declarative pass; the stem is a codegen expression.
    "q145_ts_stemmed" -> ((s, d) => {
      import graft.functions.{Ranges, TsLexize}
      val stems = TsLexize.stemTerms(Seq("querying", "merges")) // queri, merg
      t(s, d, "documents")
        .withColumn("lexed", TsLexize.lexize(split(col("text"), " ")))
        .where(Ranges.tsMatch(col("lexed"), stems))
        // serialized: raw ARRAY output crashes the driver's pandas compare
        .select(col("doc_id"), array_join(col("lexed"), " ").as("lexed"),
          round(Ranges.tsRank(col("lexed"), stems), 6).as("rank"))
    }),

    // Stemmed text search through the `german` configuration
    // (snowball/german.sbl + stopwords/german.stop): the second
    // snowball language through the SAME lexize chain — synthetic
    // German sentences built from a closed vocabulary by doc_id
    // arithmetic, stopwords dropped, snowball-German stems matched
    // (query "häusern"/"laufen" stem to the same lexemes as the
    // document words "häuser"/"laufen").
    "q197_ts_german" -> ((s, d) => {
      import graft.functions.{Ranges, TsLexize}
      val vocab = Seq("häuser", "kinder", "laufen", "bezeichnung",
        "schönheit", "aufeinander", "geheimnisse", "kleinste",
        "widerlich", "möglichkeit", "verstehen", "straße")
      val va = array(vocab.map(lit): _*)
      def pick(idx: org.apache.spark.sql.Column) =
        element_at(va, (idx % 12).cast("int") + 1)
      val text = concat_ws(" ",
        pick(col("doc_id")), lit("und"),
        pick(col("doc_id") + 2), lit("die"),
        pick(col("doc_id") * 7 + 3))
      val stems = TsLexize.stemTerms(Seq("häusern", "laufen"), "german")
      t(s, d, "documents")
        .select(col("doc_id"), text.as("text"))
        .withColumn("lexed",
          TsLexize.lexize(split(col("text"), " "), "german"))
        .where(Ranges.tsMatch(col("lexed"), stems))
        .select(col("doc_id"), array_join(col("lexed"), " ").as("lexed"))
    }),

    // Stemmed text search through the `french` configuration — third
    // snowball language through the same lexize chain (q197's German
    // pattern; query "chapeaux"/"chanterions" stem to the lexemes of
    // "chapeaux"/"chanter"-family document words).
    "q212_ts_french" -> ((s, d) => {
      import graft.functions.{Ranges, TsLexize}
      val vocab = Seq("chapeaux", "chanterions", "majestueux",
        "continuellement", "sensibilité", "finissions", "animaux",
        "jouer", "évidemment", "aimables", "volontairement", "yeux")
      val va = array(vocab.map(lit): _*)
      def pick(idx: org.apache.spark.sql.Column) =
        element_at(va, (idx % 12).cast("int") + 1)
      val text = concat_ws(" ",
        pick(col("doc_id")), lit("et"),
        pick(col("doc_id") + 2), lit("la"),
        pick(col("doc_id") * 7 + 3))
      val stems = TsLexize.stemTerms(Seq("chapeaux", "chanterions"), "french")
      t(s, d, "documents")
        .select(col("doc_id"), text.as("text"))
        .withColumn("lexed",
          TsLexize.lexize(split(col("text"), " "), "french"))
        .where(Ranges.tsMatch(col("lexed"), stems))
        .select(col("doc_id"), array_join(col("lexed"), " ").as("lexed"))
    }),

    // Fourth snowball language through the same lexize chain (q197
    // German / q212 French pattern): query "canciones"/"trabajando"
    // stem to the lexemes of the same families in document text.
    "q230_ts_spanish" -> ((s, d) => {
      import graft.functions.{Ranges, TsLexize}
      val vocab = Seq("canciones", "trabajando", "importancia",
        "rápidamente", "agradables", "guerra", "lógico", "niños",
        "vayan", "diciéndoselo", "sensibilidad", "cantaremos")
      val va = array(vocab.map(lit): _*)
      def pick(idx: org.apache.spark.sql.Column) =
        element_at(va, (idx % 12).cast("int") + 1)
      val text = concat_ws(" ",
        pick(col("doc_id")), lit("y"),
        pick(col("doc_id") + 2), lit("las"),
        pick(col("doc_id") * 7 + 3))
      val stems = TsLexize.stemTerms(Seq("canciones", "trabajando"), "spanish")
      t(s, d, "documents")
        .select(col("doc_id"), text.as("text"))
        .withColumn("lexed",
          TsLexize.lexize(split(col("text"), " "), "spanish"))
        .where(Ranges.tsMatch(col("lexed"), stems))
        .select(col("doc_id"), array_join(col("lexed"), " ").as("lexed"))
    }),

    // Fifth snowball language (Cyrillic) through the same lexize chain
    // (q197/q212/q230 convention) — stemmer suffix tables cross-checked
    // against the compiled stem_UTF_8_russian.c.
    "q236_ts_russian" -> ((s, d) => {
      import graft.functions.{Ranges, TsLexize}
      val vocab = Seq("книги", "бегала", "читавшийся", "возможность",
        "деревянный", "начинается", "линии", "прочитав", "красивейший",
        "важная", "делать", "осеннюю")
      val va = array(vocab.map(lit): _*)
      def pick(idx: org.apache.spark.sql.Column) =
        element_at(va, (idx % 12).cast("int") + 1)
      val text = concat_ws(" ",
        pick(col("doc_id")), lit("и"),
        pick(col("doc_id") + 2), lit("не"),
        pick(col("doc_id") * 7 + 3))
      val stems = TsLexize.stemTerms(Seq("книги", "бегала"), "russian")
      t(s, d, "documents")
        .select(col("doc_id"), text.as("text"))
        .withColumn("lexed",
          TsLexize.lexize(split(col("text"), " "), "russian"))
        .where(Ranges.tsMatch(col("lexed"), stems))
        .select(col("doc_id"), array_join(col("lexed"), " ").as("lexed"))
    }),

    // Sixth snowball language through the same lexize chain — includes
    // nasalized suffix handling (aça~o) and the ç → c finale.
    "q237_ts_portuguese" -> ((s, d) => {
      import graft.functions.{Ranges, TsLexize}
      val vocab = Seq("gatos", "meninas", "desenvolvimento", "felizmente",
        "referência", "bandeira", "organização", "cantando", "falaríamos",
        "antigamente", "administrativas", "abraço")
      val va = array(vocab.map(lit): _*)
      def pick(idx: org.apache.spark.sql.Column) =
        element_at(va, (idx % 12).cast("int") + 1)
      val text = concat_ws(" ",
        pick(col("doc_id")), lit("as"),
        pick(col("doc_id") + 2), lit("não"),
        pick(col("doc_id") * 7 + 3))
      val stems = TsLexize.stemTerms(
        Seq("referência", "organização"), "portuguese")
      t(s, d, "documents")
        .select(col("doc_id"), text.as("text"))
        .withColumn("lexed",
          TsLexize.lexize(split(col("text"), " "), "portuguese"))
        .where(Ranges.tsMatch(col("lexed"), stems))
        .select(col("doc_id"), array_join(col("lexed"), " ").as("lexed"))
    }),

    // Eighth snowball language — y/i consonant marking, clamped R1,
    // kk/dd/tt and vowel-pair undoubling. Verified against ~26
    // hand-traced vectors from the published Snowball Dutch
    // description (ExpressionSpec).
    "q245_ts_dutch" -> ((s, d) => {
      import graft.functions.{Ranges, TsLexize}
      val vocab = Seq("lichamelijkheden", "opheldering", "vrouwen",
        "huizen", "bakken", "aandeel", "onzichtbare", "gemeente",
        "jongens", "draaien", "uitbarsting", "voortdurend")
      val va = array(vocab.map(lit): _*)
      def pick(idx: org.apache.spark.sql.Column) =
        element_at(va, (idx % 12).cast("int") + 1)
      val text = concat_ws(" ",
        pick(col("doc_id")), lit("de"),
        pick(col("doc_id") + 2), lit("het"),
        pick(col("doc_id") * 7 + 3))
      val stems = TsLexize.stemTerms(
        Seq("lichamelijkheden", "vrouwen"), "dutch")
      t(s, d, "documents")
        .select(col("doc_id"), text.as("text"))
        .withColumn("lexed",
          TsLexize.lexize(split(col("text"), " "), "dutch"))
        .where(Ranges.tsMatch(col("lexed"), stems))
        .select(col("doc_id"), array_join(col("lexed"), " ").as("lexed"))
    }),

    // Seventh snowball language — includes the qU/intervocalic-I
    // prelude and the attached-pronoun step 0.
    "q239_ts_italian" -> ((s, d) => {
      import graft.functions.{Ranges, TsLexize}
      val vocab = Seq("abbandonata", "cantando", "felicità",
        "organizzazione", "mangiarlo", "allenamento", "rapidamente",
        "psicologia", "luoghi", "amiche", "violenza", "nazione")
      val va = array(vocab.map(lit): _*)
      def pick(idx: org.apache.spark.sql.Column) =
        element_at(va, (idx % 12).cast("int") + 1)
      val text = concat_ws(" ",
        pick(col("doc_id")), lit("le"),
        pick(col("doc_id") + 2), lit("non"),
        pick(col("doc_id") * 7 + 3))
      val stems = TsLexize.stemTerms(
        Seq("abbandonata", "cantando"), "italian")
      t(s, d, "documents")
        .select(col("doc_id"), text.as("text"))
        .withColumn("lexed",
          TsLexize.lexize(split(col("text"), " "), "italian"))
        .where(Ranges.tsMatch(col("lexed"), stems))
        .select(col("doc_id"), array_join(col("lexed"), " ").as("lexed"))
    }),

    // Tenth/eleventh/twelfth snowball languages — the Scandinavian
    // trio (stem_UTF_8_danish/norwegian/swedish.c), differential-
    // tested bit-identical against the compiled reference stemmers
    // over ~1200-1400 words each (ScandinavianStemSpec).
    "q251_ts_danish" -> ((s, d) => {
      import graft.functions.{Ranges, TsLexize}
      val vocab = Seq("indtagelse", "undersøgelse", "betjeningen",
        "hurtigste", "billederne", "vennerne", "følelserne",
        "danskerne", "løbende", "smukkeste", "vinduet", "katten")
      val va = array(vocab.map(lit): _*)
      def pick(idx: org.apache.spark.sql.Column) =
        element_at(va, (idx % 12).cast("int") + 1)
      val text = concat_ws(" ",
        pick(col("doc_id")), lit("og"),
        pick(col("doc_id") + 2), lit("det"),
        pick(col("doc_id") * 7 + 3))
      val stems = TsLexize.stemTerms(
        Seq("indtagelse", "undersøgelse"), "danish")
      t(s, d, "documents")
        .select(col("doc_id"), text.as("text"))
        .withColumn("lexed",
          TsLexize.lexize(split(col("text"), " "), "danish"))
        .where(Ranges.tsMatch(col("lexed"), stems))
        .select(col("doc_id"), array_join(col("lexed"), " ").as("lexed"))
    }),

    "q252_ts_norwegian" -> ((s, d) => {
      import graft.functions.{Ranges, TsLexize}
      val vocab = Seq("havnedistriktene", "erobringen", "tilhørighet",
        "reserverte", "bygdelagsungdommen", "bildene", "vennene",
        "løpende", "raskest", "vakrest", "nordmennene", "følelsene")
      val va = array(vocab.map(lit): _*)
      def pick(idx: org.apache.spark.sql.Column) =
        element_at(va, (idx % 12).cast("int") + 1)
      val text = concat_ws(" ",
        pick(col("doc_id")), lit("og"),
        pick(col("doc_id") + 2), lit("det"),
        pick(col("doc_id") * 7 + 3))
      val stems = TsLexize.stemTerms(
        Seq("havnedistriktene", "erobringen"), "norwegian")
      t(s, d, "documents")
        .select(col("doc_id"), text.as("text"))
        .withColumn("lexed",
          TsLexize.lexize(split(col("text"), " "), "norwegian"))
        .where(Ranges.tsMatch(col("lexed"), stems))
        .select(col("doc_id"), array_join(col("lexed"), " ").as("lexed"))
    }),

    "q253_ts_swedish" -> ((s, d) => {
      import graft.functions.{Ranges, TsLexize}
      val vocab = Seq("jordbruksgrödorna", "intäkterna", "följare",
        "klockan", "meningsfullt", "verksamheterna", "bilderna",
        "vännerna", "springande", "snabbast", "vackrast", "känslorna")
      val va = array(vocab.map(lit): _*)
      def pick(idx: org.apache.spark.sql.Column) =
        element_at(va, (idx % 12).cast("int") + 1)
      val text = concat_ws(" ",
        pick(col("doc_id")), lit("och"),
        pick(col("doc_id") + 2), lit("det"),
        pick(col("doc_id") * 7 + 3))
      val stems = TsLexize.stemTerms(
        Seq("jordbruksgrödorna", "intäkterna"), "swedish")
      t(s, d, "documents")
        .select(col("doc_id"), text.as("text"))
        .withColumn("lexed",
          TsLexize.lexize(split(col("text"), " "), "swedish"))
        .where(Ranges.tsMatch(col("lexed"), stems))
        .select(col("doc_id"), array_join(col("lexed"), " ").as("lexed"))
    }),

    // Thirteenth/fourteenth snowball languages — Finnish and Hungarian,
    // the two structurally hardest in the reference's libstemmer
    // (Finnish: particle/possessive/case/tidy chain with the VI/LONG
    // among-fallbacks; Hungarian: digraph-aware R1). Differential-
    // tested bit-identical over 7.6k/10.3k words (ScandinavianStemSpec).
    "q255_ts_finnish" -> ((s, d) => {
      import graft.functions.{Ranges, TsLexize}
      val vocab = Seq("taloissa", "kirjastossa", "opiskelijat",
        "kaupungissa", "yliopistossa", "tutkimuksissa", "kysymyksiin",
        "opettajien", "nopeasti", "kauniisti", "ikkunoissa", "lapsille")
      val va = array(vocab.map(lit): _*)
      def pick(idx: org.apache.spark.sql.Column) =
        element_at(va, (idx % 12).cast("int") + 1)
      val text = concat_ws(" ",
        pick(col("doc_id")), lit("ja"),
        pick(col("doc_id") + 2), lit("on"),
        pick(col("doc_id") * 7 + 3))
      val stems = TsLexize.stemTerms(
        Seq("taloissa", "kirjastossa"), "finnish")
      t(s, d, "documents")
        .select(col("doc_id"), text.as("text"))
        .withColumn("lexed",
          TsLexize.lexize(split(col("text"), " "), "finnish"))
        .where(Ranges.tsMatch(col("lexed"), stems))
        .select(col("doc_id"), array_join(col("lexed"), " ").as("lexed"))
    }),

    "q256_ts_hungarian" -> ((s, d) => {
      import graft.functions.{Ranges, TsLexize}
      val vocab = Seq("asztalok", "emberek", "házakban", "kutyáknak",
        "iskolában", "tanárok", "könyveket", "ablakon", "autóval",
        "városokban", "országok", "leveleket")
      val va = array(vocab.map(lit): _*)
      def pick(idx: org.apache.spark.sql.Column) =
        element_at(va, (idx % 12).cast("int") + 1)
      val text = concat_ws(" ",
        pick(col("doc_id")), lit("és"),
        pick(col("doc_id") + 2), lit("nem"),
        pick(col("doc_id") * 7 + 3))
      val stems = TsLexize.stemTerms(
        Seq("asztalok", "emberek"), "hungarian")
      t(s, d, "documents")
        .select(col("doc_id"), text.as("text"))
        .withColumn("lexed",
          TsLexize.lexize(split(col("text"), " "), "hungarian"))
        .where(Ranges.tsMatch(col("lexed"), stems))
        .select(col("doc_id"), array_join(col("lexed"), " ").as("lexed"))
    }),

    // Fifteenth snowball language — Romanian (the Romance RV/R1/R2
    // shape with the U/I prelude; no stopword file in the reference,
    // so the lexize chain is stem-only). Differential-tested over
    // 14.4k words (ScandinavianStemSpec).
    "q257_ts_romanian" -> ((s, d) => {
      import graft.functions.{Ranges, TsLexize}
      val vocab = Seq("lucrurile", "frumoasa", "copilului", "cartea",
        "oraşele", "muntelui", "florile", "prietenii", "şcolile",
        "cuvintele", "naţiunea", "călătorii")
      val va = array(vocab.map(lit): _*)
      def pick(idx: org.apache.spark.sql.Column) =
        element_at(va, (idx % 12).cast("int") + 1)
      val text = concat_ws(" ",
        pick(col("doc_id")), pick(col("doc_id") + 2),
        pick(col("doc_id") * 7 + 3))
      val stems = TsLexize.stemTerms(
        Seq("lucrurile", "frumoasa"), "romanian")
      t(s, d, "documents")
        .select(col("doc_id"), text.as("text"))
        .withColumn("lexed",
          TsLexize.lexize(split(col("text"), " "), "romanian"))
        .where(Ranges.tsMatch(col("lexed"), stems))
        .select(col("doc_id"), array_join(col("lexed"), " ").as("lexed"))
    }),

    // Sixteenth (and final reference-shipped) snowball language —
    // Turkish: no R1/R2 regions, backward suffix chains under
    // vowel-harmony and optional-letter checks, final-consonant
    // devoicing and harmony-matched vowel append. Differential-tested
    // bit-identical to the compiled reference stemmer over 62k
    // generated words (pinned vectors in ExpressionSpec).
    "q258_ts_turkish" -> ((s, d) => {
      import graft.functions.{Ranges, TsLexize}
      val vocab = Seq("kitapları", "evlerinden", "çocukların",
        "okullarda", "öğretmenler", "arabamla", "şehirden",
        "günlerde", "arkadaşımız", "sorularına", "cevapları",
        "denizlerde")
      val va = array(vocab.map(lit): _*)
      def pick(idx: org.apache.spark.sql.Column) =
        element_at(va, (idx % 12).cast("int") + 1)
      val text = concat_ws(" ",
        pick(col("doc_id")), pick(col("doc_id") + 2),
        pick(col("doc_id") * 7 + 3))
      val stems = TsLexize.stemTerms(
        Seq("kitapları", "evlerinden"), "turkish")
      t(s, d, "documents")
        .select(col("doc_id"), text.as("text"))
        .withColumn("lexed",
          TsLexize.lexize(split(col("text"), " "), "turkish"))
        .where(Ranges.tsMatch(col("lexed"), stems))
        .select(col("doc_id"), array_join(col("lexed"), " ").as("lexed"))
    }),

    // ispell dictionary template (spell.c + dict_ispell.c): affix
    // stripping with cross-product prefix+suffix combination and
    // controlled compound splitting, over the reference's own sample
    // grammar. The oracle pins the tsdicts.out lexeme streams as
    // literals — nothing is recomputed on the DuckDB side.
    "q259_ts_ispell" -> ((s, d) => {
      graft.Tables.register(s, d)
      val dir = new java.io.File("target/tsdict_demo").getAbsoluteFile
      dir.mkdirs()
      val dict = new java.io.File(dir, "ispell_demo.dict")
      java.nio.file.Files.write(dict.toPath,
        ("book/GJUS\nbooking/SB\nfootballklubber\nfoot/ZS\nfootball/Z\n" +
          "ball/SZ\\\nklubber/Z\nsky/A\n").getBytes)
      val aff = new java.io.File(dir, "ispell_demo.affix")
      java.nio.file.Files.write(aff.toPath,
        ("compoundwords controlled Z\nprefixes\n" +
          "flag *B:\n\t. > RE\nflag U:\n\t. > UN\n" +
          "suffixes\n" +
          "flag *J:\n\t[^E] > INGS\nflag *G:\n\t[^E] > ING\n" +
          "flag *S:\n\t[^SXZHY] > S\nflag *A:\n\t[^AEIOU]Y > -Y,IES\n" +
          "flag ~\\\\:\n\t[^Y] > Y\n").getBytes)
      graft.Graft.execute(s, "DROP TEXT SEARCH DICTIONARY IF EXISTS isp_demo")
      graft.Graft.execute(s,
        s"CREATE TEXT SEARCH DICTIONARY isp_demo (TEMPLATE = ispell, " +
          s"DictFile = '${dict.getAbsolutePath}', " +
          s"AffFile = '${aff.getAbsolutePath}')")
      val vocab = Seq("skies", "bookings", "rebookings", "unbookings",
        "foots", "rebook", "footklubber", "footballklubber",
        "ballyklubber", "footballyklubber")
      val va = array(vocab.map(lit): _*)
      t(s, d, "documents")
        .select(col("doc_id"),
          element_at(va, (col("doc_id") % 10).cast("int") + 1).as("word"))
        .withColumn("lexemes",
          coalesce(array_join(call_function("ts_lexize",
            lit("isp_demo"), col("word")), " "), lit("∅")))
        .select(col("doc_id"), col("word"), col("lexemes"))
    }),

    // ts_headline through the stemming dictionary: covers computed on
    // stems, snippet shows the original inflected words, marked when
    // their stem matches a query stem.
    "q146_ts_headline_stemmed" -> ((s, d) => {
      import graft.functions.Ranges._
      val stems = graft.functions.TsLexize.stemTerms(Seq("querying", "merges"))
      t(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .withColumn("st", transform(col("words"),
          x => call_function("porter_stem", lower(x))))
        .where(tsMatch(col("st"), stems))
        .withColumn("m", mergedPositions(col("st"), stems(0), stems(1)))
        .withColumn("best", bestCover(col("m")))
        .select(col("doc_id"),
          tsHeadlineStemmed(col("words"), col("st"), col("best"), stems,
            maxWords = 10).as("headline"))
    }),

    // ts_rank_cd cover-density ranking (tsrank.c calc_rank_cd): minimal
    // query covers scored by width — proximity-sensitive, unlike the
    // frequency-only ts_rank.
    "q124_ts_rank_cd" -> ((s, d) => {
      import graft.functions.Ranges._
      t(s, d, "documents")
        // words as a real column: termPositions' position-probe lambda
        // references the word array per ELEMENT, so an inline split
        // expression re-tokenizes the text O(len) times per doc —
        // O(len²) per row (measured 2.2 s vs 0.3 s at sf0.1). Aliased
        // once, CollapseProject keeps it materialized (non-cheap,
        // multiply-referenced). Same row set, same values.
        .withColumn("words", split(col("text"), " "))
        .where(tsMatch(col("words"), Seq("data", "query")))
        // merged positions as a real column: inlining it into the fold
        // re-evaluates the merge per element (O(len²) per doc)
        .withColumn("m", mergedPositions(col("words"), "data", "query"))
        .select(col("doc_id"), round(tsRankCdOf(col("m")), 6).as("rank_cd"))
    }),

    // ts_headline (wparser_def.c prsd_headline, pg_proc.h:4694): the
    // best cover — shortest span, earliest on ties — opens a MaxWords
    // snippet window with the query terms marked StartSel/StopSel.
    "q132_ts_headline" -> ((s, d) => {
      import graft.functions.Ranges._
      val w = split(col("text"), " ")
      t(s, d, "documents")
        .where(tsMatch(w, Seq("data", "query")))
        .withColumn("words", w)
        // each derived array is its OWN column before a lambda reads it
        .withColumn("m", mergedPositions(col("words"), "data", "query"))
        .withColumn("best", bestCover(col("m")))
        .select(col("doc_id"),
          tsHeadlineOf(col("words"), col("best"), Seq("data", "query"),
            maxWords = 10).as("headline"))
    }),

    // jsonb operator family ? @> || - (jsonb_op.c) over parsed flat
    // objects: existence, containment, concat (right wins), deletion.
    "q127_jsonb_ops" -> ((s, d) => {
      import graft.functions.Jsonb
      val j = concat(lit("{\"status\":\""), col("o_orderstatus"),
        lit("\",\"prio\":\""), col("o_orderpriority"), lit("\"}"))
      t(s, d, "orders")
        // per-row JSON parse + map ops over a 1-partition scan: spread
        // first (same move as q142/q196)
        .repartition(s.sparkContext.defaultParallelism)
        // parse ONCE into real columns — every later reference to an
        // inline from_json expr would re-parse the document
        .withColumn("m", from_json(j, org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))
        .withColumn("cat", Jsonb.concat(col("m"),
          map(lit("clerk"), concat(lit("c_"), col("o_custkey")),
            lit("status"), lit("X")))) // status collides: right wins
        .select(
          col("o_orderkey"),
          Jsonb.hasKey(col("m"), "prio").as("has_prio"),
          Jsonb.hasAllKeys(col("m"), Seq("status", "prio")).as("has_both"),
          Jsonb.containsAll(col("m"), Map("status" -> "F", "prio" -> "1-URGENT"))
            .as("is_urgent_f"),
          element_at(col("cat"), "status").as("status_after_concat"),
          element_at(col("cat"), "clerk").as("clerk"),
          size(Jsonb.removeKey(col("m"), "prio")).as("n_after_del"))
    }),

    // jsonb recursive containment @> (jsonb_util.c:965
    // JsonbDeepContains) over a NESTED document: object recursion,
    // array element containment, numeric equality, empty-object needle.
    // The oracle hand-evaluates each needle against the doc's fields.
    "q135_jsonb_contains" -> ((s, d) => {
      import graft.functions.Jsonb
      val j = concat(lit("{\"cust\":{\"key\":"), col("o_custkey"),
        lit(",\"seg\":\""), col("o_orderstatus"),
        lit("\"},\"tags\":[\"base\",\""), col("o_orderstatus"),
        lit("\"],\"prio\":\""), col("o_orderpriority"), lit("\"}"))
      t(s, d, "orders")
        // 6 containment probes re-parse each document per row on a
        // 1-partition scan — spread first
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("doc", j)
        .select(col("o_orderkey"),
          Jsonb.containsDeep(col("doc"), """{"cust":{"seg":"F"}}""")
            .as("seg_f"),
          Jsonb.containsDeep(col("doc"),
            """{"prio":"1-URGENT","cust":{"seg":"O"}}""").as("urgent_open"),
          Jsonb.containsDeep(col("doc"), """{"cust":{"seg":"F","x":1}}""")
            .as("missing_key"),
          Jsonb.containsDeep(col("doc"), """{"cust":{}}""").as("empty_obj"),
          Jsonb.containsDeep(col("doc"), """{"tags":["F"]}""").as("tag_f"),
          Jsonb.containsDeep(col("doc"), """{"cust":{"key":7}}""").as("key7"))
    }),

    // json_each-style object-to-rows expansion (jsonfuncs.c:1325):
    // explode a JSON object into one row per key/value pair. The object
    // is built from order columns (3 keys/row); key order follows the
    // document, as PG json_each does.
    "q109_json_each" -> ((s, d) => {
      val j = concat(lit("{\"status\":\""), col("o_orderstatus"),
        lit("\",\"prio\":\""), col("o_orderpriority"),
        lit("\",\"key\":\""), col("o_orderkey").cast("string"), lit("\"}"))
      val m = from_json(j, org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))
      t(s, d, "orders")
        .select(col("o_orderkey"), explode(m).as(Seq("key", "value")))
    }),

    // Math/numeric function family (float.c, int8.c, numeric.c:
    // width_bucket, trunc/round/sign/mod/gcd, power/sqrt/exp/ln with
    // round-6 for the libm-vs-JVM ulp).
    "q114_math_funcs" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        expr("width_bucket(p_retailprice, 900, 2000, 10)").as("price_bucket"),
        floor(col("p_retailprice")).as("fl"),
        ceil(col("p_retailprice")).as("ce"),
        factorial(pmod(col("p_size"), lit(10))).as("fact"),
        signum(col("p_retailprice") - 1500.0).cast("int").as("sgn"),
        pmod(col("p_partkey"), lit(7)).as("m7"),
        expr("p_partkey & 15").as("band"),
        shiftleft(col("p_size"), 2).as("shl2"),
        round(sqrt(col("p_retailprice")), 6).as("sq"),
        round(pow(col("p_size").cast("double"), 2.0), 6).as("sz2"),
        round(exp(col("p_size").cast("double") / 50.0), 6).as("ex"),
        round(log(col("p_retailprice")), 6).as("lnp"))),

    // tsquery boolean operators (tsquery.c): AND/OR/NOT/parens/prefix.
    "q39b_tsquery_bool" -> ((s, d) => {
      import graft.functions.Ranges._
      val words = split(col("text"), " ")
      t(s, d, "documents")
        .where(tsMatchQuery(words, "(data | sql) & !error & quer:*"))
        .select(col("doc_id"), size(words).as("n_words"))
    }),

    // SQL-language CREATE FUNCTION (pg_proc LANGUAGE SQL; inlined as
    // expression macros the way inline_function does) — a user's
    // `CREATE FUNCTION f(x) AS 'SELECT ...' LANGUAGE SQL` runs as-is,
    // including one SQL function calling another.
    "q119_sql_function" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.operators.SqlFunctions.create(
        """CREATE FUNCTION disc_price(p float8, d float8) RETURNS float8
          |AS 'SELECT p * (1 - d)' LANGUAGE SQL""".stripMargin)
      graft.operators.SqlFunctions.create(
        """CREATE OR REPLACE FUNCTION taxed_price(p float8, d float8, t float8)
          |RETURNS float8 AS $$ SELECT disc_price(p, d) * (1 + t) $$
          |LANGUAGE SQL""".stripMargin)
      graft.operators.SqlFunctions.sql(s,
        """SELECT l_orderkey, l_linenumber,
          |       taxed_price(l_extendedprice, l_discount, l_tax) AS px
          |FROM lineitem WHERE l_quantity > 45""".stripMargin)
    }),

    // plpgsql-subset function (src/pl/plpgsql; pl_exec.c exec_stmt_if):
    // DECLARE + IF/ELSIF/ELSE RETURN compiled to ONE CASE expression and
    // inlined at the call site — no interpreter, plain codegen. p * 2 is
    // exact in doubles, so the band edges are deterministic.
    "q134_plpgsql" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.operators.SqlFunctions.create(
        """CREATE OR REPLACE FUNCTION order_band(p float8) RETURNS text AS $$
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
      graft.operators.SqlFunctions.sql(s,
        "SELECT o_orderkey, order_band(o_totalprice) AS band FROM orders")
    }),

    // plpgsql bounded FOR loop (pl_exec.c:1423 exec_stmt_fori): a
    // 12-payment amortization schedule — two loop-carried variables and
    // the loop index read in the body — compiled to ONE
    // aggregate(sequence(1,12), state-struct, merge) expression and
    // inlined per row. No interpreter, no UDF; the oracle is the same
    // recurrence unrolled, so the IEEE double op order is identical.
    "q141_plpgsql_loop" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.operators.SqlFunctions.create(
        """CREATE OR REPLACE FUNCTION sched_total(p double precision) RETURNS double precision AS $$
          |DECLARE
          |  bal double precision := p;
          |  tot double precision := 0.0;
          |BEGIN
          |  FOR i IN 1..12 LOOP
          |    bal := bal * (1.0 + 0.005) - p / 12.0;
          |    tot := tot + bal * i;
          |  END LOOP;
          |  RETURN tot;
          |END;
          |$$ LANGUAGE plpgsql""".stripMargin)
      graft.operators.SqlFunctions.sql(s,
        "SELECT o_orderkey, sched_total(o_totalprice) AS sched FROM orders")
    }),

    // plpgsql WHILE loop (pl_exec.c exec_stmt_while): data-dependent
    // trip count (b0, b0-3, ... while > 0) compiled to a guarded
    // fixed-budget fold — exact for every terminating row, raising
    // (never truncating) past the budget. Oracle = the arithmetic
    // series closed form, all-integer.
    "q149_plpgsql_while" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.operators.SqlFunctions.create(
        """CREATE OR REPLACE FUNCTION decay_sum(b0 bigint) RETURNS bigint AS $$
          |DECLARE s bigint := CAST(0 AS bigint); b bigint := b0;
          |BEGIN
          |  WHILE b > 0 LOOP
          |    s := s + b;
          |    b := b - 3;
          |  END LOOP;
          |  RETURN s;
          |END;
          |$$ LANGUAGE plpgsql""".stripMargin)
      graft.operators.SqlFunctions.sql(s,
        "SELECT o_orderkey, decay_sum(o_custkey % 50) AS dsum FROM orders")
    }),

    // plpgsql set-oriented loops (pl_exec.c:1435-1445 exec_stmt_fors /
    // exec_stmt_foreach_a): FOREACH folds over the ARRAY value itself;
    // FOR rec IN <query> collects the query's records inside a scalar
    // subquery and folds the accumulation body over them — the
    // correlated form decorrelates into a join + aggregate under
    // Catalyst, exactly the set-oriented plan the loop denotes. The
    // ordered variant shows iteration order in the built string.
    "q164_plpgsql_set_loops" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.operators.SqlFunctions.create(
        """CREATE OR REPLACE FUNCTION word_chars(t text) RETURNS bigint AS $$
          |DECLARE n bigint := CAST(0 AS bigint);
          |BEGIN
          |  FOREACH w IN ARRAY split(t, ' ') LOOP
          |    n := n + length(w);
          |  END LOOP;
          |  RETURN n;
          |END;
          |$$ LANGUAGE plpgsql""".stripMargin)
      graft.operators.SqlFunctions.create(
        """CREATE OR REPLACE FUNCTION big_orders(ck bigint) RETURNS bigint AS $$
          |DECLARE n bigint := CAST(0 AS bigint);
          |BEGIN
          |  FOR rec IN SELECT o_totalprice AS p FROM orders WHERE o_custkey = ck LOOP
          |    n := n + CASE WHEN rec.p > 150000.0 THEN 1 ELSE 0 END;
          |  END LOOP;
          |  RETURN n;
          |END;
          |$$ LANGUAGE plpgsql""".stripMargin)
      graft.operators.SqlFunctions.create(
        """CREATE OR REPLACE FUNCTION prio_str(ck bigint) RETURNS text AS $$
          |DECLARE t text := '';
          |BEGIN
          |  FOR rec IN SELECT o_orderpriority AS pr FROM orders WHERE o_custkey = ck ORDER BY pr LOOP
          |    t := t || substr(rec.pr, 1, 1);
          |  END LOOP;
          |  RETURN t;
          |END;
          |$$ LANGUAGE plpgsql""".stripMargin)
      graft.operators.SqlFunctions.sql(s,
        """SELECT c_custkey,
          |  word_chars(replace(c_name, '#', ' ')) AS name_chars,
          |  big_orders(c_custkey) AS n_big,
          |  prio_str(c_custkey) AS prios
          |FROM customer""".stripMargin)
    }),

    // SQL table function (clauses.c inline_set_returning_function):
    // RETURNS TABLE inlines at the FROM-clause call site as a
    // parameterized view — one declarative plan, joins compose.
    "q161_sql_table_fn" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.operators.SqlFunctions.create(
        """CREATE OR REPLACE FUNCTION urgent_orders(pr text) RETURNS TABLE(o_orderkey bigint, o_custkey bigint) AS
          |$$ SELECT o_orderkey, o_custkey FROM orders WHERE o_orderpriority = pr $$
          |LANGUAGE SQL""".stripMargin)
      graft.operators.SqlFunctions.sql(s,
        """SELECT c.c_mktsegment, count(*) AS n
          |FROM urgent_orders('1-URGENT') u
          |JOIN customer c ON c.c_custkey = u.o_custkey
          |GROUP BY c.c_mktsegment""".stripMargin)
    }),

    // plpgsql EXCEPTION blocks (pl_exec.c exec_stmt_block PG_CATCH):
    // the body runs inside a codegen try/catch expression; the handler
    // fires exactly when the body raises the handled class — ANSI
    // bigint division by zero for the ratio, a cast failure for the
    // parse. The oracle spells the same semantics as CASE guards.
    "q160_plpgsql_exception" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.operators.SqlFunctions.create(
        """CREATE OR REPLACE FUNCTION safe_share(a bigint, b bigint) RETURNS double precision AS $$
          |BEGIN
          |  RETURN a / b;
          |EXCEPTION WHEN division_by_zero THEN
          |  RETURN -1.0;
          |END;
          |$$ LANGUAGE plpgsql""".stripMargin)
      graft.operators.SqlFunctions.create(
        """CREATE OR REPLACE FUNCTION parse_first(s text) RETURNS int AS $$
          |BEGIN
          |  RETURN CAST(s AS INT);
          |EXCEPTION WHEN others THEN
          |  RETURN 0;
          |END;
          |$$ LANGUAGE plpgsql""".stripMargin)
      graft.operators.SqlFunctions.sql(s,
        """SELECT o_orderkey,
          |  safe_share(o_orderkey, o_custkey % 5) AS ratio,
          |  parse_first(CASE WHEN o_orderkey % 2 = 0
          |              THEN substr(o_orderpriority, 1, 1)
          |              ELSE o_orderpriority END) AS pfx
          |FROM orders""".stripMargin)
    }),

    // Scalar UDF registration surface (CREATE FUNCTION, src/pl/*) +
    // to_char-style numeric formatting (formatting.c).
    "q79_udf_scalar" -> ((s, d) => {
      graft.Tables.register(s, d)
      s.udf.register("acct_norm", (x: Double) => x * 2.0 + 1.0)
      s.sql("""SELECT c_custkey, acct_norm(c_acctbal) AS norm_bal,
              |       format_string('%.2f', c_acctbal) AS fmt_bal
              |FROM customer""".stripMargin)
    }),

    // Trigram similarity (contrib/pg_trgm) — custom codegen expression.
    "q78_trgm_similarity" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"), col("p_name"),
        expr("similarity(p_name, 'promo burnished copper')").as("sim"))
        .where(col("sim") > 0.05)),

    // age() symbolic timestamp difference (timestamp.c:4205) — custom
    // borrow-chain expression, field parity with DuckDB's age().
    "q105_age_pg" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        expr("age_pg(ts, TIMESTAMP '2024-01-15 08:30:00')").as("a"))
        .select(col("event_id"),
          col("a.years").as("y"), col("a.months").as("mo"),
          col("a.days").as("d"), col("a.hours").as("h"),
          col("a.mins").as("mi"), col("a.us").as("us"))),

    // to_char date/time DCH templates (formatting.c:35-100) — custom
    // template engine; oracle via DuckDB strftime equivalents.
    "q108_to_char_dt" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        expr("to_char_dt(ts, 'YYYY-MM-DD HH24:MI:SS')").as("iso"),
        expr("to_char_dt(ts, 'FMMonth')").as("mname"),
        expr("to_char_dt(ts, 'Dy')").as("dow"),
        expr("to_char_dt(ts, 'Q')").as("qtr"),
        expr("to_char_dt(ts, 'HH12:MI PM')").as("twelve"),
        expr("to_char_dt(ts, 'DDD')").as("doy"),
        expr("to_char_dt(ts, 'IW')").as("isow"),
        expr("to_char_dt(ts, '\"day \"DD\" of \"Mon')").as("lit"))),

    // to_number / format-string to_date/to_timestamp (formatting.c:43
    // numeric_to_number; formatting.c:914 do_to_timestamp) — the parsing
    // inverses of to_char_pg/to_char_dt, same template machinery
    // reversed. Inputs are constructed exactly (integer-derived text /
    // to_char_dt output), so parse must invert construction: numeric
    // text→double is correctly rounded on both engines, and the date
    // roundtrips go through a month-name template and a full DCH
    // timestamp template at second resolution.
    "q144_to_number_date" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        expr("to_number_pg(concat('$', CAST(event_id % 100000 AS STRING), '.', " +
          "lpad(CAST(user_id % 100 AS STRING), 2, '0')), '$999,999.99')").as("num"),
        expr("to_number_pg(concat(CAST(user_id AS STRING), " +
          "CASE WHEN event_id % 2 = 0 THEN '-' ELSE ' ' END), '999999MI')").as("mi_num"),
        expr("to_date_pg(to_char_dt(ts, 'DD Mon YYYY'), 'DD Mon YYYY')").as("d"),
        expr("CAST(to_timestamp_pg(to_char_dt(ts, 'YYYY-MM-DD HH24:MI:SS'), " +
          "'YYYY-MM-DD HH24:MI:SS') AS STRING)").as("ts_rt"))),

    // justify_days/hours/interval (timestamp.c:3436) over a synthetic
    // (months, days, micros) interval derived from event columns; the
    // oracle mirrors PG's C truncated-division arithmetic in SQL.
    "q106_justify" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        (col("event_id") % 5).cast("int").as("m"),
        ((col("event_id") % 97) - 20).cast("int").as("dd"),
        (((col("event_id") % 2000) - 500) * lit(3600000000L)).as("usv"))
        .select(col("event_id"),
          expr("justify_days(m, dd, usv)").as("jd"),
          expr("justify_hours(m, dd, usv)").as("jh"),
          expr("justify_interval(m, dd, usv)").as("ji"))
        .select(col("event_id"),
          col("jd.months").as("jd_m"), col("jd.days").as("jd_d"),
          col("jh.days").as("jh_d"), col("jh.us").as("jh_us"),
          col("ji.months").as("ji_m"), col("ji.days").as("ji_d"),
          col("ji.us").as("ji_us"))),

    // Weighted tsvector ranking (tsvector_op.c:231 setweight; tsrank.c
    // calc_rank_or with the {0.1,0.2,0.4,1.0} D/C/B/A weight vector and
    // the RANK_NORM_UNIQ/LOGUNIQ 0x08/0x10 norms; calc_rank_cd harmonic
    // Cpos). Documents are labeled positionally — first 2 words A
    // (title), next 2 B (lead), rest D (body) — the single-pass
    // equivalent of setweight(title,'A') || setweight(lead,'B') || body.
    // Every derived array is materialized as its own column before any
    // fold references it (lambda re-eval rule).
    "q131_ts_rank_weighted" -> ((s, d) => {
      import graft.functions.Ranges._
      val inv = lit(1.64493406685d)
      t(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .where(tsMatch(col("words"), Seq("data", "query")))
        .withColumn("tsv", toTsVectorLabeled(col("words"),
          i => when(i <= 2, 3).when(i <= 4, 2).otherwise(0)))
        .withColumn("wa1", termWeights(col("tsv"), "data"))
        .withColumn("wa2", termWeights(col("tsv"), "query"))
        .withColumn("m", mergedPositionsW(col("tsv"), "data", "query"))
        .withColumn("base",
          (tsRankOrTermOf(col("wa1")) / inv + tsRankOrTermOf(col("wa2")) / inv)
            / lit(2.0d))
        .withColumn("uniq", size(array_distinct(col("words"))))
        .select(col("doc_id"),
          round(col("base"), 6).as("rank_w"),
          round(tsRankNorm(col("base"), 8, size(col("words")), col("uniq")), 6)
            .as("rank_uniq"),
          round(tsRankNorm(col("base"), 16, size(col("words")), col("uniq")), 6)
            .as("rank_loguniq"),
          round(tsRankCdWOf(col("m")), 6).as("rank_cd_w"))
    }),

    // Complex-number type (reference utils/adt/complex_type.c — a
    // Greengage builtin type; SURVEY §1.2 struct<re,im> mapping). Flat
    // double columns (not structs) so the driver's column-sorted value
    // hash sees plain scalars; every op is the reference's exact
    // expression shape, spelled identically in the oracle → bit-exact.
    // arg/exp/ln/sqrt (libm-vs-JVM last-ulp territory) are pinned by
    // tolerance tests in SvecComplexSpec instead.
    "q138_complex" -> ((s, d) => {
      import graft.functions.ComplexType._
      val z1 = cplx(col("l_quantity"), col("l_discount"))
      val z2 = cplx(col("l_tax") + lit(1.0d), lit(2.0d))
      val dp = dotProduct(array(z1, z2), array(z2, z1))
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        re(add(z1, z2)).as("add_re"), im(add(z1, z2)).as("add_im"),
        re(sub(z1, z2)).as("sub_re"), im(sub(z1, z2)).as("sub_im"),
        re(mul(z1, z2)).as("mul_re"), im(mul(z1, z2)).as("mul_im"),
        re(div(z1, z2)).as("div_re"), im(div(z1, z2)).as("div_im"),
        im(conj(z1)).as("conj_im"),
        mag(z1).as("mag1"),
        re(dp).as("dot_re"), im(dp).as("dot_im"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q138_complex" ->
      """WITH c AS (SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS DOUBLE) AS a, CAST(l_discount AS DOUBLE) AS b,
        |  CAST(l_tax AS DOUBLE) + 1.0 AS cr, CAST(2.0 AS DOUBLE) AS ci
        |FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  a + cr AS add_re, b + ci AS add_im,
        |  a - cr AS sub_re, b - ci AS sub_im,
        |  a * cr - b * ci AS mul_re, a * ci + b * cr AS mul_im,
        |  (a * cr + b * ci) / (cr * cr + ci * ci) AS div_re,
        |  (b * cr - a * ci) / (cr * cr + ci * ci) AS div_im,
        |  -b AS conj_im,
        |  SQRT(a * a + b * b) AS mag1,
        |  (a * cr - b * ci) + (cr * a - ci * b) AS dot_re,
        |  (a * ci + b * cr) + (cr * b + ci * a) AS dot_im
        |FROM c""".stripMargin,
    "q105_age_pg" ->
      """SELECT event_id,
        |  CAST(date_part('year', a) AS INT) AS y,
        |  CAST(date_part('month', a) AS INT) AS mo,
        |  CAST(date_part('day', a) AS INT) AS d,
        |  CAST(date_part('hour', a) AS INT) AS h,
        |  CAST(date_part('minute', a) AS INT) AS mi,
        |  CAST(date_part('microsecond', a) AS BIGINT) AS us
        |FROM (SELECT event_id,
        |        age(CAST(ts AS TIMESTAMP), TIMESTAMP '2024-01-15 08:30:00') AS a
        |      FROM events) t""".stripMargin,
    "q108_to_char_dt" ->
      """SELECT event_id,
        |  strftime(t, '%Y-%m-%d %H:%M:%S') AS iso,
        |  strftime(t, '%B') AS mname,
        |  strftime(t, '%a') AS dow,
        |  CAST(quarter(t) AS VARCHAR) AS qtr,
        |  strftime(t, '%I:%M %p') AS twelve,
        |  strftime(t, '%j') AS doy,
        |  lpad(CAST(weekofyear(t) AS VARCHAR), 2, '0') AS isow,
        |  'day ' || strftime(t, '%d') || ' of ' ||
        |    strftime(t, '%b') AS lit
        |FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS t FROM events) s""".stripMargin,
    // the oracle derives the same values directly: text→double CASTs
    // are correctly rounded in both engines, so bits match
    "q144_to_number_date" ->
      """SELECT event_id,
        |  CAST(CAST(event_id % 100000 AS VARCHAR) || '.' ||
        |       lpad(CAST(user_id % 100 AS VARCHAR), 2, '0') AS DOUBLE) AS num,
        |  CAST(user_id AS DOUBLE) *
        |    (CASE WHEN event_id % 2 = 0 THEN -1 ELSE 1 END) AS mi_num,
        |  CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        |  CAST(date_trunc('second', CAST(ts AS TIMESTAMP)) AS VARCHAR) AS ts_rt
        |FROM events""".stripMargin,
    "q106_justify" ->
      """WITH base AS (
        |  SELECT event_id,
        |    CAST(event_id % 5 AS INT) AS m,
        |    CAST((event_id % 97) - 20 AS INT) AS dd,
        |    CAST(((event_id % 2000) - 500) * 3600000000 AS BIGINT) AS usv
        |  FROM events),
        |jd0 AS (SELECT event_id,
        |    m + CAST((dd - (dd % 30)) / 30 AS INT) AS m2,
        |    CAST(dd % 30 AS INT) AS d2 FROM base),
        |jd AS (SELECT event_id,
        |    CASE WHEN m2 > 0 AND d2 < 0 THEN m2 - 1
        |         WHEN m2 < 0 AND d2 > 0 THEN m2 + 1 ELSE m2 END AS jd_m,
        |    CASE WHEN m2 > 0 AND d2 < 0 THEN d2 + 30
        |         WHEN m2 < 0 AND d2 > 0 THEN d2 - 30 ELSE d2 END AS jd_d
        |  FROM jd0),
        |jh0 AS (SELECT event_id,
        |    dd + CAST((usv - (usv % 86400000000)) / 86400000000 AS INT) AS d2,
        |    usv % 86400000000 AS us2 FROM base),
        |jh AS (SELECT event_id,
        |    CASE WHEN d2 > 0 AND us2 < 0 THEN d2 - 1
        |         WHEN d2 < 0 AND us2 > 0 THEN d2 + 1 ELSE d2 END AS jh_d,
        |    CASE WHEN d2 > 0 AND us2 < 0 THEN us2 + 86400000000
        |         WHEN d2 < 0 AND us2 > 0 THEN us2 - 86400000000 ELSE us2 END AS jh_us
        |  FROM jh0),
        |ji1 AS (SELECT event_id,
        |    m + CAST((d2 - (d2 % 30)) / 30 AS INT) AS m2,
        |    CAST(d2 % 30 AS INT) AS d3, us2
        |  FROM (SELECT event_id, m,
        |          dd + CAST((usv - (usv % 86400000000)) / 86400000000 AS INT) AS d2,
        |          usv % 86400000000 AS us2 FROM base) t),
        |ji2 AS (SELECT event_id,
        |    CASE WHEN m2 > 0 AND (d3 < 0 OR (d3 = 0 AND us2 < 0)) THEN m2 - 1
        |         WHEN m2 < 0 AND (d3 > 0 OR (d3 = 0 AND us2 > 0)) THEN m2 + 1
        |         ELSE m2 END AS ji_m,
        |    CASE WHEN m2 > 0 AND (d3 < 0 OR (d3 = 0 AND us2 < 0)) THEN d3 + 30
        |         WHEN m2 < 0 AND (d3 > 0 OR (d3 = 0 AND us2 > 0)) THEN d3 - 30
        |         ELSE d3 END AS d4,
        |    us2 FROM ji1),
        |ji AS (SELECT event_id, ji_m,
        |    CASE WHEN d4 > 0 AND us2 < 0 THEN d4 - 1
        |         WHEN d4 < 0 AND us2 > 0 THEN d4 + 1 ELSE d4 END AS ji_d,
        |    CASE WHEN d4 > 0 AND us2 < 0 THEN us2 + 86400000000
        |         WHEN d4 < 0 AND us2 > 0 THEN us2 - 86400000000 ELSE us2 END AS ji_us
        |  FROM ji2)
        |SELECT base.event_id, jd_m, jd_d, jh_d, jh_us, ji_m, ji_d, ji_us
        |FROM base JOIN jd USING (event_id) JOIN jh USING (event_id)
        |JOIN ji USING (event_id)""".stripMargin,
    "q70_string_funcs" ->
      """SELECT p_partkey,
        |  UPPER(p_name) AS uname, LOWER(p_brand) AS lbrand,
        |  SUBSTR(p_name, 1, 5) AS first5,
        |  SPLIT_PART(p_type, ' ', 1) AS type_head,
        |  LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |  TRANSLATE(p_brand, '#', '-') AS brand_tr,
        |  CAST(INSTR(p_name, 'o') AS INT) AS first_o,
        |  REVERSE(p_brand) AS brand_rev,
        |  REPEAT('ab', 3) AS abx3,
        |  CAST(LENGTH(p_name) AS INT) AS name_len,
        |  CONCAT_WS('|', p_brand, p_type) AS brand_type
        |FROM part""".stripMargin,
    "q71_datetime_funcs" ->
      """SELECT o_orderkey,
        |  CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(DATE_PART('year', o_orderdate) AS INT) AS yr,
        |  CAST(DATE_PART('month', o_orderdate) AS INT) AS mo,
        |  CAST(DATE_PART('day', o_orderdate) AS INT) AS dom,
        |  CAST(DATE_PART('isodow', o_orderdate) AS INT) AS isodow,
        |  CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since,
        |  o_orderdate + INTERVAL '1' MONTH AS plus_month,
        |  CAST(LAST_DAY(o_orderdate) AS DATE) AS month_end
        |FROM orders""".stripMargin,
    "q72_json_funcs" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
        |  json_extract_string(props, '$.missing') AS absent
        |FROM events""".stripMargin,
    "q73_array_funcs" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words, text FROM documents)
        |SELECT doc_id,
        |  CAST(len(words) AS INT) AS n_words,
        |  array_to_string(words[1:3], ' ') AS first3,
        |  list_contains(words, 'data') AS has_data,
        |  CAST(len(list_distinct(words)) AS INT) AS n_uniq,
        |  words[2] AS second_word,
        |  CAST(list_sum(list_transform(words, w -> length(w))) AS INT) AS total_chars,
        |  CAST(len(list_filter(words, w -> length(w) > 5)) AS INT) AS n_long,
        |  CAST(list_max(list_transform(words, w -> length(w))) AS INT) AS longest
        |FROM w""".stripMargin,
    "q73c_multidim_array" ->
      """SELECT id,
        |  m[1][2] AS a12, m[2][1] AS a21,
        |  CAST(len(m) AS INT) AS n_rows_m, CAST(len(m[1]) AS INT) AS n_cols,
        |  CAST(list_sum(flatten(m)) AS INT) AS total,
        |  '[1:' || len(m) || '][1:' || len(m[1]) || ']' AS dims,
        |  array_to_string(flatten(list_transform(m[2:3], r -> r[1:2])), ',')
        |    AS sub_flat,
        |  '[1:' || len(m[2:3]) || '][1:' || len(m[2][1:2]) || ']' AS sub_dims,
        |  array_to_string(flatten(list_transform(m[2:9], r -> r[2:9])), ',')
        |    AS clamped_flat
        |FROM (VALUES (1, [[1, 2, 3], [4, 5, 6], [7, 8, 9]]),
        |             (2, [[10, 11, 12], [13, 14, 15], [16, 17, 18]])) AS t(id, m)""".stripMargin,
    "q73b_map_funcs" ->
      """SELECT event_id,
        |  array_to_string(json_keys(props), ',') AS ks,
        |  array_to_string([CAST(json_extract_string(props, '$.k') AS INT)], ',') AS vs,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        |  CAST(len(json_keys(props)) AS INT) AS n_entries
        |FROM events""".stripMargin,
    "q74_regex_funcs" ->
      """SELECT p_partkey,
        |  regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  regexp_matches(p_name, '^p') AS starts_p,
        |  CAST(levenshtein(p_brand, 'Brand#13') AS INT) AS lev_to_13
        |FROM part""".stripMargin,
    "q74b_like_family" ->
      """SELECT p_partkey,
        |  p_name LIKE '%copper%' AS has_copper,
        |  p_name ILIKE '%COPPER%' AS has_copper_ci,
        |  NOT (p_type LIKE 'PROMO%') AS not_promo,
        |  p_brand LIKE 'Brand#1_' AS brand_1x,
        |  NULLIF(p_size, 1) AS size_or_null,
        |  COALESCE(NULLIF(p_size, 1), -1) AS size_coalesced
        |FROM part""".stripMargin,
    // DuckDB's SIMILAR TO takes a raw regex (not the SQL:1999 pattern
    // language), so the oracle spells the hand-translated equivalent of
    // each pattern — an independent derivation of the same semantics
    "q150_similar_to" ->
      """SELECT p_partkey,
        |  regexp_full_match(p_name, '.*(copper|steel).*') AS metal,
        |  regexp_full_match(p_type, '(PROMO|STANDARD).*') AS promo_std,
        |  regexp_full_match(p_brand, 'Brand#[12].') AS brand_12x,
        |  regexp_full_match(p_name, '.*burnished.{5}.*') AS burn5
        |FROM part""".stripMargin,
    "q151_ts_stat" ->
      """SELECT word, COUNT(DISTINCT doc_id) AS ndoc, COUNT(*) AS nentry
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |      FROM documents) w
        |GROUP BY word""".stripMargin,
    "q152_tsvector_ops" ->
      """SELECT doc_id,
        |  len(list_distinct(words)) AS n_lex,
        |  array_to_string(list_sort(list_distinct(words)), ' ') AS lexemes,
        |  len(words) - len(list_filter(words, x -> x = 'data')) AS n_after_del
        |FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) w""".stripMargin,
    "q163_jsonb_set" ->
      """SELECT o_orderkey,
        |  '{"cust":{"key":' || o_custkey || ',"seg":"Z"},"tags":["base","' ||
        |    o_orderstatus || '"],"prio":"' || o_orderpriority || '"}' AS set_nested,
        |  '{"cust":{"key":' || o_custkey || ',"seg":"' || o_orderstatus ||
        |    '"},"tags":["base","upd"],"prio":"' || o_orderpriority || '"}' AS set_elem,
        |  '{"cust":{"key":' || o_custkey || ',"seg":"' || o_orderstatus ||
        |    '"},"tags":["base","' || o_orderstatus || '","app"],"prio":"' ||
        |    o_orderpriority || '"}' AS append_elem,
        |  '{"cust":{"key":' || o_custkey || ',"seg":"' || o_orderstatus ||
        |    '"},"tags":["base","' || o_orderstatus || '"],"prio":"' ||
        |    o_orderpriority || '","newkey":' || o_custkey || '}' AS create_key
        |FROM orders""".stripMargin,
    "q157_jsonpath" ->
      """SELECT o_orderkey,
        |  CAST(o_custkey AS VARCHAR) AS ckey,
        |  o_orderstatus AS tag2,
        |  o_orderpriority AS prio,
        |  CAST(NULL AS VARCHAR) AS mis
        |FROM orders""".stripMargin,
    // string_agg ORDER BY the row-json text = the same lexicographic
    // order sort_array uses on the Spark side
    "q158_json_agg" ->
      """SELECT n_regionkey, COUNT(*) AS n,
        |  '[' || string_agg(
        |    '{"key":' || CAST(n_nationkey AS VARCHAR) || ',"name":"' || n_name || '"}',
        |    ',' ORDER BY
        |    '{"key":' || CAST(n_nationkey AS VARCHAR) || ',"name":"' || n_name || '"}')
        |  || ']' AS members
        |FROM nation GROUP BY n_regionkey""".stripMargin,
    "q159_hstore" ->
      """SELECT o_orderkey,
        |  o_orderpriority AS arrow_prio,
        |  TRUE AS has_status,
        |  'status,prio,ck' AS akeys,
        |  o_orderstatus || ',' || o_orderpriority || ',' ||
        |    CAST(o_custkey AS VARCHAR) AS avals,
        |  'X' AS merged_status,
        |  2 AS n_after_del
        |FROM orders""".stripMargin,
    "q156_array_extras" ->
      """SELECT o_orderkey,
        |  array_to_string(list_transform(list_filter(range(1, 4), i ->
        |    [o_orderstatus, o_orderpriority, o_orderstatus][CAST(i AS INT)]
        |      = o_orderstatus), x -> CAST(x AS VARCHAR)), ',') AS pos_status,
        |  '1,2' AS subs1,
        |  '1,2,3' AS subs2,
        |  array_to_string([o_custkey, o_custkey, o_custkey,
        |    o_custkey, o_custkey, o_custkey], ',') AS grid_flat
        |FROM orders""".stripMargin,
    // explicit case folding spells the collation semantics
    "q175_citext" ->
      """SELECT upper(c_mktsegment) AS seg_norm, COUNT(*) AS n,
        |  (upper(c_mktsegment) = 'BUILDING') AS is_building
        |FROM customer GROUP BY 1""".stripMargin,
    // prefix algebra over the same constructed paths
    "q176_ltree" ->
      """WITH p AS (SELECT n_nationkey,
        |  'world.' || lower(replace(r_name, ' ', '_')) || '.' ||
        |  lower(replace(n_name, ' ', '_')) AS path,
        |  lower(replace(r_name, ' ', '_')) AS rl,
        |  lower(replace(n_name, ' ', '_')) AS nl
        |  FROM nation JOIN region ON n_regionkey = r_regionkey)
        |SELECT n_nationkey, path, 3 AS depth, rl AS region_label,
        |  (rl = 'asia') AS in_asia,
        |  TRUE AS under_world,
        |  CASE WHEN rl = 'asia' AND nl = 'japan' THEN path
        |       WHEN rl = 'asia' THEN 'world.asia'
        |       ELSE 'world' END AS lca_jp,
        |  (nl = 'china' OR nl = 'india') AS cn_in,
        |  TRUE AS any_depth
        |FROM p""".stripMargin,
    // the [-2:0] array's bound arithmetic spelled as constants
    "q171_array_lower_bounds" ->
      """SELECT o_orderkey, -2 AS lo, 0 AS hi, '[-2:0]' AS dims,
        |  o_orderstatus AS first_e,
        |  'c' || CAST(o_custkey AS VARCHAR) AS last_e,
        |  CAST(NULL AS VARCHAR) AS oob,
        |  o_orderpriority || ',c' || CAST(o_custkey AS VARCHAR) AS tail2
        |FROM orders""".stripMargin,
    // ((a % b) + b) % b spells Spark's pmod, so the grid arithmetic is
    // bit-identical; width_bucket's CASE mirrors the float8 formula
    "q155_bin_bucket" ->
      """SELECT event_id,
        |  CAST(make_timestamp(epoch_us(CAST(ts AS TIMESTAMP)) -
        |    ((epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(TIMESTAMP '2024-01-01'))
        |      % 900000000 + 900000000) % 900000000) AS VARCHAR) AS bin15m,
        |  CASE WHEN value < 0.0 THEN 0 WHEN value >= 100.0 THEN 11
        |       ELSE CAST(FLOOR((value - 0.0) / 100.0 * 10) + 1 AS INT) END AS bucket
        |FROM events""".stripMargin,
    "q153_unaccent_fuzzy" ->
      """SELECT p_partkey,
        |  strip_accents('café crème ' || p_name) AS plain,
        |  strip_accents('Ångström façade naïve ñandú') AS fixed,
        |  levenshtein(p_name, p_type) AS lev_nt,
        |  levenshtein(p_brand, 'Brand#11') AS lev_b,
        |  CASE WHEN levenshtein(p_name, p_type) > 10 THEN 11
        |       ELSE levenshtein(p_name, p_type) END AS lev_le10
        |FROM part""".stripMargin,
    // the same quoting rules spelled by hand: %I quotes unless the
    // identifier is already lower-case-safe, %L maps NULL to NULL
    "q154_pg_format" ->
      """SELECT n_nationkey,
        |  'INSERT INTO ' ||
        |  (CASE WHEN regexp_full_match(lower(n_name), '[a-z_][a-z0-9_]*')
        |        THEN lower(n_name)
        |        ELSE '"' || replace(lower(n_name), '"', '""') || '"' END) ||
        |  ' (name, key) VALUES (' ||
        |  '''' || replace(n_name, '''', '''''') || '''' || ', ' ||
        |  CAST(n_nationkey AS VARCHAR) || ')' AS stmt,
        |  n_name || '=' || '''' || replace(n_name, '''', '''''') || '''' ||
        |  ' ident=' || '"' || replace(n_name || ' x', '"', '""') || '"' ||
        |  ' pct=100%' AS pos,
        |  (CASE WHEN regexp_full_match(n_name, '[a-z_][a-z0-9_]*')
        |        THEN n_name
        |        ELSE '"' || replace(n_name, '"', '""') || '"' END) AS qi,
        |  (CASE WHEN n_nationkey % 2 = 0
        |        THEN '''' || replace(n_name, '''', '''''') || ''''
        |        ELSE 'NULL' END) AS ql
        |FROM nation""".stripMargin,
    "q75_hash_funcs" ->
      """SELECT c_custkey,
        |  md5(c_name) AS md5_name,
        |  sha256(c_name) AS sha256_name,
        |  to_base64(encode(c_name)) AS b64_name
        |FROM customer""".stripMargin,
    // roundtrip identity + a ciphertext pinned from AES-128-ECB's
    // definition (openssl enc -aes-128-ecb on the same key/plaintext)
    "q143_aes_crypto" ->
      """SELECT c_custkey, c_name AS rt_name, c_mktsegment AS rt_seg,
        |  '6zfc4HkP35/OR2AYopIk/w==' AS ct_fixed
        |FROM customer""".stripMargin,
    "q249_pgp_sym" ->
      """SELECT n_nationkey, n_name AS rt_text, n_name || '/' || n_nationkey AS rt_bytea,
        |  n_name AS rt_opts, n_name AS rt_armor, 'SYMKEY' AS kid
        |FROM nation""".stripMargin,
    // the contract columns are constants; the pinned hash is glibc's
    // crypt(3) output for the same (password, salt)
    "q193_intarray" ->
      """WITH b AS (SELECT o_orderkey,
        |    [CAST(o_orderkey % 5 AS INT), CAST(o_orderkey % 7 AS INT),
        |     CAST(o_orderkey % 5 AS INT), 3] AS a FROM orders)
        |SELECT o_orderkey,
        |  array_to_string(list_filter(a, (x, i) -> i = 1 OR x IS DISTINCT FROM a[i - 1]), ',')
        |    AS uniq_raw,
        |  array_to_string(list_filter(list_sort(a),
        |    (x, i) -> i = 1 OR x IS DISTINCT FROM list_sort(a)[i - 1]), ',')
        |    AS uniq_sorted,
        |  CAST(list_position(a, CAST(o_orderkey % 7 AS INT)) AS INT) AS idx7,
        |  array_to_string(list_slice(a, 2, 3), ',') AS sub,
        |  CAST(len(a) AS INT) AS card,
        |  COALESCE(array_to_string(list_filter(a, x -> x <> 3), ','), '')
        |    AS minus3,
        |  len(list_intersect(a, [1, 3])) > 0 AS overlaps,
        |  list_contains(a, 1) AND list_contains(a, 3) AS contains_b
        |FROM b""".stripMargin,
    "q192_uuid_v3" ->
      """WITH h AS (SELECT c_custkey,
        |    md5('graftnamespace00' || c_name) AS h FROM customer)
        |SELECT c_custkey,
        |  substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-3' ||
        |  substr(h, 14, 3) || '-' ||
        |  substr('0123456789abcdef',
        |    (((strpos('0123456789abcdef', substr(h, 17, 1)) - 1) & 3) | 8) + 1,
        |    1) ||
        |  substr(h, 18, 3) || '-' || substr(h, 21, 12) AS v3
        |FROM h""".stripMargin,
    "q189_bytea" ->
      """WITH b AS (SELECT o_orderkey,
        |    o_orderstatus || '-' || o_orderpriority AS s FROM orders)
        |SELECT o_orderkey,
        |  CAST(length(s) AS INT) AS olen,
        |  CAST(ascii(substr(s, 1, 1)) AS INT) AS b0,
        |  CAST(ascii(substr(s, 3, 1)) AS INT) AS b2,
        |  hex('X' || substr(s, 2)) AS set0,
        |  CAST(strpos(s, '-') AS INT) AS dash_pos,
        |  CAST(strpos(s, 'ZZ') AS INT) AS missing_pos,
        |  hex(s) AS hx,
        |  to_base64(CAST(s AS BLOB)) AS b64
        |FROM b""".stripMargin,
    // months_between re-derived per Oracle's rule: integer months when
    // the day-of-month matches (or both are month ends), else a
    // 31-day-month fraction. next_day spelled from DuckDB's dayofweek.
    "q187_orafce" ->
      """WITH b AS (SELECT o_orderkey, o_orderstatus, o_orderpriority,
        |    CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT o_orderkey,
        |  CAST(d + INTERVAL 3 MONTH AS DATE) AS am,
        |  last_day(d) AS ld,
        |  CAST(d + to_days(CAST(((1 - dayofweek(d) + 6) % 7) + 1 AS INT))
        |    AS DATE) AS nd,
        |  ROUND((1997 - year(d)) * 12 + (6 - month(d)) +
        |    CASE WHEN day(d) = 15 THEN 0.0
        |         ELSE (15 - day(d)) / 31.0 END, 4) AS mb,
        |  COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS nv,
        |  CASE WHEN NULLIF(o_orderstatus, 'P') IS NOT NULL
        |       THEN 'SET' ELSE 'UNSET' END AS nv2,
        |  CAST(strpos(o_orderpriority, '-') AS INT) AS ins,
        |  substr(o_orderpriority, -4, 3) AS sub
        |FROM b""".stripMargin,
    "q188_earthdistance" ->
      """WITH b AS (SELECT c_custkey,
        |    CAST(c_custkey % 360 - 180 AS DOUBLE) + 0.5 AS lon,
        |    CAST(c_custkey % 180 - 90 AS DOUBLE) + 0.5 AS lat
        |  FROM customer),
        |r AS (SELECT c_custkey,
        |    radians(lon) AS l1, radians(lat) AS t1,
        |    radians(-74.0) AS l2, radians(40.7) AS t2 FROM b),
        |h AS (SELECT c_custkey, t1, t2,
        |    CASE WHEN abs(l1 - l2) > pi() THEN 2 * pi() - abs(l1 - l2)
        |         ELSE abs(l1 - l2) END AS longdiff FROM r),
        |s AS (SELECT c_custkey,
        |    sqrt(sin(abs(t1 - t2) / 2) * sin(abs(t1 - t2) / 2) +
        |      cos(t1) * cos(t2) * sin(longdiff / 2) * sin(longdiff / 2))
        |      AS sino FROM h)
        |SELECT c_custkey,
        |  ROUND(2 * 3958.747716 * asin(LEAST(sino, 1.0)), 6) AS miles_to_nyc
        |FROM s""".stripMargin,
    "q185_soundex" -> {
      import graft.functions.Soundex.soundexRef
      val vocab = Seq("anvil", "blue", "bolt", "cold", "gear", "gizmo",
        "hot", "large", "new", "old", "plate", "red", "ring", "rod",
        "small", "widget")
      def cases(v: String) = vocab.map(w =>
        s"WHEN $v = '$w' THEN '${soundexRef(w)}'").mkString(" ")
      s"""WITH b AS (SELECT p_partkey,
         |    string_split(p_name, ' ')[1] AS w1,
         |    string_split(p_name, ' ')[2] AS w2
         |  FROM part),
         |c AS (SELECT p_partkey,
         |    CASE ${cases("w1")} END AS sx1,
         |    CASE ${cases("w2")} END AS sx2 FROM b)
         |SELECT p_partkey, sx1, sx2,
         |  CAST((CASE WHEN substr(sx1,1,1) = substr(sx2,1,1) THEN 1 ELSE 0 END)
         |     + (CASE WHEN substr(sx1,2,1) = substr(sx2,2,1) THEN 1 ELSE 0 END)
         |     + (CASE WHEN substr(sx1,3,1) = substr(sx2,3,1) THEN 1 ELSE 0 END)
         |     + (CASE WHEN substr(sx1,4,1) = substr(sx2,4,1) THEN 1 ELSE 0 END)
         |    AS INT) AS diff,
         |  CAST(4 AS INT) AS diff_self
         |FROM c""".stripMargin
    },
    "q180_inet" ->
      """WITH b AS (SELECT c_custkey,
        |    c_custkey % 200 AS o2, c_custkey % 97 AS o3, c_custkey % 250 AS o4,
        |    16 + c_custkey % 16 AS mlen FROM customer),
        |v AS (SELECT *,
        |    ((10 * 256 + o2) * 256 + o3) * 256 + o4 AS ipl,
        |    ((4294967295 << (32 - mlen)) & 4294967295) AS mask
        |  FROM b)
        |SELECT c_custkey,
        |  '10.' || o2 || '.' || o3 || '.' || o4 AS host,
        |  CAST(mlen AS INT) AS mlen,
        |  ((ipl & mask) >> 24) || '.' || (((ipl & mask) >> 16) & 255) || '.'
        |    || (((ipl & mask) >> 8) & 255) || '.' || ((ipl & mask) & 255)
        |    || '/' || mlen AS network,
        |  ((ipl | (4294967295 - mask)) >> 24) || '.'
        |    || (((ipl | (4294967295 - mask)) >> 16) & 255) || '.'
        |    || (((ipl | (4294967295 - mask)) >> 8) & 255) || '.'
        |    || ((ipl | (4294967295 - mask)) & 255) || '/' || mlen AS bcast,
        |  (mask >> 24) || '.' || ((mask >> 16) & 255) || '.'
        |    || ((mask >> 8) & 255) || '.' || (mask & 255) AS netmask,
        |  ((4294967295 - mask) >> 24) || '.'
        |    || (((4294967295 - mask) >> 16) & 255) || '.'
        |    || (((4294967295 - mask) >> 8) & 255) || '.'
        |    || ((4294967295 - mask) & 255) AS hostmask,
        |  (16 <= mlen AND (ipl & 4294901760) = 170524672) AS in_net,
        |  (16 < mlen AND (ipl & 4294901760) = 170524672) AS in_net_strict
        |FROM v""".stripMargin,
    // inet_net_ntop output shapes per mask length, string-built
    "q195_inet6" ->
      """WITH b AS (SELECT c_custkey,
        |    lower(to_hex(CAST(1 + c_custkey % 4000 AS INT))) AS x,
        |    lower(to_hex(CAST(1 + c_custkey % 9 AS INT))) AS y,
        |    CAST(32 + (c_custkey % 3) * 16 AS INT) AS mlen
        |  FROM customer)
        |SELECT c_custkey,
        |  '2001:db8:' || x || '::' || y AS host,
        |  mlen, CAST(6 AS INT) AS fam,
        |  CASE mlen WHEN 32 THEN '2001:db8::/32'
        |            WHEN 48 THEN '2001:db8:' || x || '::/48'
        |            ELSE '2001:db8:' || x || '::/64' END AS network,
        |  CASE mlen
        |    WHEN 32 THEN '2001:db8:ffff:ffff:ffff:ffff:ffff:ffff/32'
        |    WHEN 48 THEN '2001:db8:' || x || ':ffff:ffff:ffff:ffff:ffff/48'
        |    ELSE '2001:db8:' || x || ':0:ffff:ffff:ffff:ffff/64' END AS bcast,
        |  CASE mlen WHEN 32 THEN 'ffff:ffff::'
        |            WHEN 48 THEN 'ffff:ffff:ffff::'
        |            ELSE 'ffff:ffff:ffff:ffff::' END AS netmask,
        |  CASE mlen WHEN 32 THEN '::ffff:ffff:ffff:ffff:ffff:ffff'
        |            WHEN 48 THEN '::ffff:ffff:ffff:ffff:ffff'
        |            ELSE '::ffff:ffff:ffff:ffff' END AS hostmask,
        |  (x = '7' AND mlen >= 48) AS in_net,
        |  (x = '7' AND mlen > 48) AS in_net_strict,
        |  FALSE AS xfam
        |FROM b""".stripMargin,
    "q167_pgcrypto_crypt" ->
      """SELECT c_custkey, TRUE AS matches, FALSE AS wrong_pw,
        |  '$1$saltsalt$qjXMvbEw8oaL.CzflDtaK/' AS pinned
        |FROM customer WHERE c_custkey % 20 = 0""".stripMargin,
    "q196_bcrypt" ->
      """SELECT c_custkey, TRUE AS matches, FALSE AS wrong_pw,
        |  '$2a$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s.' AS pinned
        |FROM customer WHERE c_custkey % 100 = 0""".stripMargin,
    "q218_crypt_des" ->
      """SELECT c_custkey, TRUE AS des_matches, FALSE AS xdes_wrong_pw,
        |  'abJnggxhB/yWI' AS pinned_des,
        |  '_J9..SALT3cfudkaV5sE' AS pinned_xdes
        |FROM customer WHERE c_custkey % 50 = 0""".stripMargin,
    // expected JSON text replayed by string construction (DuckDB's own
    // json functions format differently); chr(10) = the pretty newlines
    "q228_json_builders" ->
      """SELECT n_nationkey,
        |  '{"name":"' || n_name || '","region":' || n_regionkey || '}' AS obj,
        |  '[' || n_nationkey || ',' || n_regionkey || ']' AS arr,
        |  '{' || chr(10) || '    "k": ' || n_nationkey || chr(10) || '}' AS pp,
        |  '{"a":"' || n_name || '"}' AS stripped,
        |  unnest([CAST(n_nationkey AS VARCHAR), CAST(n_regionkey AS VARCHAR)])
        |    AS elem
        |FROM nation""".stripMargin,
    "q221_string_srf" ->
      """SELECT o_orderkey, unnest(str_split(o_orderpriority, '-')) AS word,
        |  array_to_string(regexp_split_to_array(o_orderpriority, '[AEIOU]+'), '_')
        |    AS consonants,
        |  (CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN 1 ELSE 0 END +
        |   CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nn,
        |  (CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN 0 ELSE 1 END +
        |   CASE WHEN o_orderpriority IS NULL THEN 0 ELSE 1 END) AS nnn,
        |  CASE WHEN NULLIF(o_orderstatus, 'F') IS NULL THEN 'NULL'
        |       ELSE '''' || replace(NULLIF(o_orderstatus, 'F'), '''', '''''') || ''''
        |  END AS qn,
        |  CASE WHEN starts_with(o_orderpriority, '1') THEN 1 ELSE 0 END AS sw
        |FROM orders WHERE o_orderkey % 20 = 0""".stripMargin,
    // xpath extraction must invert the row's XML construction
    "q142_xml_xpath" ->
      """SELECT o_orderkey, o_orderstatus AS status, o_orderpriority AS priority,
        |  o_custkey AS cust, (o_orderkey > 10000) AS big_id,
        |  o_orderstatus || ',' || o_orderpriority AS texts
        |FROM orders WHERE o_orderkey % 20 = 0""".stripMargin,
    "q76_decode_case" ->
      """SELECT CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
        |            WHEN 'P' THEN 'pending' ELSE 'other' END AS status_name,
        |       COUNT(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,
    "q77_interpolate" ->
      // interpolate.c shape: p = (x-x0)/(x1-x0), then y0 + p*(y1-y0)
      // — the SAME association order as the engine expression, so the
      // doubles agree bit-for-bit; equal abscissas are NULL (x != x0
      // here, so eq_abscissas can never hold)
      """SELECT event_id, user_id,
        |  CASE WHEN CAST(epoch_us(LEAD(CAST(ts AS TIMESTAMP)) OVER w) AS DOUBLE)
        |            = CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE)
        |       THEN NULL
        |       ELSE value +
        |            ((CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE) + 30e6
        |              - CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE)) /
        |             (CAST(epoch_us(LEAD(CAST(ts AS TIMESTAMP)) OVER w) AS DOUBLE)
        |              - CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE))) *
        |            (LEAD(value) OVER w - value)
        |  END AS interp_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)""".stripMargin,
    "q38_range_ops" ->
      """SELECT c_custkey,
        |  (5000.0 >= c_acctbal - 100.0 AND 5000.0 < c_acctbal + 100.0) AS holds_5k,
        |  (c_acctbal - 100.0 < 500.0 AND 0.0 < c_acctbal + 100.0) AS near_zero,
        |  (c_acctbal + 100.0 = c_acctbal + 100.0
        |   OR c_acctbal + 100.0 + 200.0 = c_acctbal - 100.0) AS adj,
        |  CASE WHEN c_acctbal - 100.0 < 6000.0 AND 4000.0 < c_acctbal + 100.0
        |       THEN GREATEST(c_acctbal - 100.0, 4000.0) END AS ix_lo
        |FROM customer""".stripMargin,
    "q39_text_search" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |f AS (SELECT doc_id, words,
        |  len(list_filter(words, x -> x = 'data')) AS f1,
        |  len(list_filter(words, x -> x = 'query')) AS f2 FROM w)
        |SELECT doc_id,
        |  ROUND((
        |    (CASE WHEN f1 > 0 THEN list_sum(list_transform(range(1, f1 + 1),
        |       j -> CAST(0.1 AS DOUBLE) / CAST(j * j AS DOUBLE))) ELSE 0.0 END) +
        |    (CASE WHEN f2 > 0 THEN list_sum(list_transform(range(1, f2 + 1),
        |       j -> CAST(0.1 AS DOUBLE) / CAST(j * j AS DOUBLE))) ELSE 0.0 END)
        |  ) / CAST(1.64493406685 AS DOUBLE) / CAST(2 AS DOUBLE), 6) AS rank
        |FROM f
        |WHERE list_contains(words, 'data') AND list_contains(words, 'query')""".stripMargin,
    "q109_json_each" ->
      """WITH j AS (SELECT o_orderkey,
        |  '{"status":"' || o_orderstatus || '","prio":"' || o_orderpriority ||
        |  '","key":"' || CAST(o_orderkey AS VARCHAR) || '"}' AS obj FROM orders)
        |SELECT o_orderkey, k.key,
        |  json_extract_string(obj, '$.' || k.key) AS value
        |FROM j, unnest(json_keys(obj)) AS k(key)""".stripMargin,
    "q114_math_funcs" ->
      """SELECT p_partkey,
        |  CASE WHEN p_retailprice < 900 THEN 0
        |       WHEN p_retailprice >= 2000 THEN 11
        |       ELSE 1 + CAST(FLOOR((p_retailprice - 900) / 110.0) AS INT)
        |  END AS price_bucket,
        |  CAST(FLOOR(p_retailprice) AS BIGINT) AS fl,
        |  CAST(CEIL(p_retailprice) AS BIGINT) AS ce,
        |  CAST(factorial(CAST(p_size % 10 AS INT)) AS BIGINT) AS fact,
        |  CAST(sign(p_retailprice - 1500.0) AS INT) AS sgn,
        |  p_partkey % 7 AS m7,
        |  p_partkey & 15 AS band,
        |  CAST(p_size << 2 AS INT) AS shl2,
        |  ROUND(sqrt(p_retailprice), 6) AS sq,
        |  ROUND(pow(CAST(p_size AS DOUBLE), 2.0), 6) AS sz2,
        |  ROUND(exp(CAST(p_size AS DOUBLE) / 50.0), 6) AS ex,
        |  ROUND(ln(p_retailprice), 6) AS lnp
        |FROM part""".stripMargin,
    "q39b_tsquery_bool" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        |SELECT doc_id, CAST(len(words) AS INT) AS n_words
        |FROM w
        |WHERE (list_contains(words, 'data') OR list_contains(words, 'sql'))
        |  AND NOT list_contains(words, 'error')
        |  AND len(list_filter(words, x -> x LIKE 'quer%')) > 0""".stripMargin,
    "q127_jsonb_ops" ->
      """WITH j AS (SELECT o_orderkey, o_custkey,
        |  '{"status":"' || o_orderstatus || '","prio":"' || o_orderpriority || '"}' AS obj
        |  FROM orders)
        |SELECT o_orderkey,
        |  json_extract(obj, '$.prio') IS NOT NULL AS has_prio,
        |  (json_extract(obj, '$.status') IS NOT NULL
        |   AND json_extract(obj, '$.prio') IS NOT NULL) AS has_both,
        |  (json_extract_string(obj, '$.status') = 'F'
        |   AND json_extract_string(obj, '$.prio') = '1-URGENT') AS is_urgent_f,
        |  'X' AS status_after_concat,
        |  'c_' || CAST(o_custkey AS VARCHAR) AS clerk,
        |  1 AS n_after_del
        |FROM j""".stripMargin,
    // merged [pos, term] lists sort identically to Spark's struct
    // sort_array (pos first), and each adjacent unlike-term pair is one
    // PG cover contributing 0.1/(q-p)
    "q124_ts_rank_cd" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |p AS (SELECT doc_id, words,
        |  list_sort(list_concat(
        |    list_transform(list_filter(range(1, len(words) + 1),
        |      i -> words[CAST(i AS INT)] = 'data'), x -> [CAST(x AS INT), 1]),
        |    list_transform(list_filter(range(1, len(words) + 1),
        |      i -> words[CAST(i AS INT)] = 'query'), x -> [CAST(x AS INT), 2]))) AS m
        |  FROM w)
        |SELECT doc_id,
        |  ROUND(list_sum(list_transform(range(1, len(m)), i ->
        |    CASE WHEN m[CAST(i AS INT)][2] <> m[CAST(i AS INT) + 1][2]
        |         THEN CAST(0.1 AS DOUBLE) /
        |              CAST(m[CAST(i AS INT) + 1][1] - m[CAST(i AS INT)][1] AS DOUBLE)
        |         ELSE CAST(0.0 AS DOUBLE) END)), 6) AS rank_cd
        |FROM p
        |WHERE list_contains(words, 'data') AND list_contains(words, 'query')""".stripMargin,
    // best cover = min over adjacent unlike pairs of span*100000+start
    // (one bigint carries both ordering keys); window start..start+9,
    // query terms wrapped <b></b> — same construction as the Spark side
    "q132_ts_headline" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents
        |  WHERE list_contains(string_split(text, ' '), 'data')
        |    AND list_contains(string_split(text, ' '), 'query')),
        |p AS (SELECT doc_id, words,
        |  list_sort(list_concat(
        |    list_transform(list_filter(range(1, len(words) + 1),
        |      i -> words[CAST(i AS INT)] = 'data'), x -> [CAST(x AS INT), 1]),
        |    list_transform(list_filter(range(1, len(words) + 1),
        |      i -> words[CAST(i AS INT)] = 'query'), x -> [CAST(x AS INT), 2]))) AS m
        |  FROM w),
        |b AS (SELECT doc_id, words,
        |  list_min(list_filter(list_transform(range(1, len(m)), i ->
        |    CASE WHEN m[CAST(i AS INT)][2] <> m[CAST(i AS INT) + 1][2]
        |         THEN CAST(m[CAST(i AS INT) + 1][1] - m[CAST(i AS INT)][1] AS BIGINT)
        |              * 100000 + m[CAST(i AS INT)][1]
        |         ELSE NULL END), x -> x IS NOT NULL)) AS best
        |  FROM p),
        |h AS (SELECT doc_id, words,
        |  CAST(coalesce(best % 100000, 1) AS INT) AS hstart FROM b)
        |SELECT doc_id,
        |  array_to_string(list_transform(
        |    list_slice(words, hstart, LEAST(len(words), hstart + 9)),
        |    x -> CASE WHEN x = 'data' OR x = 'query'
        |              THEN '<b>' || x || '</b>' ELSE x END), ' ') AS headline
        |FROM h""".stripMargin,
    // the expanded boolean/phrase queries spelled literally — an
    // independent derivation of what the rewrite must produce
    "q165_ts_rewrite" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        |SELECT doc_id,
        |  (list_contains(words, 'data') AND list_contains(words, 'retrieval'))
        |    AS lit_match,
        |  (list_contains(words, 'data') AND
        |   (list_contains(words, 'query') OR list_contains(words, 'scan')))
        |    AS rew_match,
        |  len(list_filter(range(1, len(words) + 1), i ->
        |    words[CAST(i AS INT)] = 'hash' AND
        |    words[CAST(i AS INT) + 1] = 'join')) > 0 AS rew_phrase
        |FROM w""".stripMargin,

    // independent spelling of the constructed queries: the oracle stems
    // via the closed-vocabulary CASE chain (see q145's note) and spells
    // each constructor's OUTPUT as literal boolean/positional SQL
    "q178_tsquery_construct" -> {
      import graft.functions.PorterStemmer
      val vocab = Seq("a", "agg", "batch", "big", "column", "customer",
        "data", "dup", "fast", "filter", "group", "hash", "join", "key",
        "line", "merge", "order", "part", "query", "row", "scan", "slow",
        "small", "sort", "spark", "stream", "table", "the", "value",
        "vector", "window")
      val cases = vocab.map(w =>
        s"WHEN x = '$w' THEN '${PorterStemmer.stem(w)}'").mkString(" ")
      s"""WITH w AS (SELECT doc_id,
         |  list_transform(string_split(text, ' '),
         |    x -> CASE $cases ELSE lower(x) END) AS st
         |  FROM documents)
         |SELECT doc_id,
         |  (list_contains(st, 'merg') AND list_contains(st, 'data')) AS plain,
         |  len(list_filter(range(1, len(st) + 1), i ->
         |    st[CAST(i AS INT)] = 'valu' AND
         |    st[CAST(i AS INT) + 2] = 'tabl')) > 0 AS phrase_gap,
         |  (len(list_filter(range(1, len(st) + 1), i ->
         |     st[CAST(i AS INT)] = 'data' AND
         |     st[CAST(i AS INT) + 1] = 'queri')) > 0 OR
         |   (list_contains(st, 'scan') AND NOT list_contains(st, 'merg')))
         |    AS web
         |FROM w""".stripMargin
    },

    // out-of-range list indexes yield NULL in DuckDB, which list_filter
    // drops — so no explicit end-bound is needed on the position range
    "q148_ts_phrase" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        |SELECT doc_id,
        |  len(list_filter(range(1, len(words) + 1), i ->
        |    words[CAST(i AS INT)] = 'data' AND
        |    words[CAST(i AS INT) + 1] = 'query')) > 0 AS adj_dq,
        |  len(list_filter(range(1, len(words) + 1), i ->
        |    words[CAST(i AS INT)] = 'hash' AND
        |    words[CAST(i AS INT) + 2] = 'join')) > 0 AS near_hj,
        |  list_contains(words, 'scan') AND (
        |    len(list_filter(range(1, len(words) + 1), i ->
        |      words[CAST(i AS INT)] = 'data' AND
        |      words[CAST(i AS INT) + 1] = 'query')) > 0 OR
        |    len(list_filter(range(1, len(words) + 1), i ->
        |      words[CAST(i AS INT)] = 'query' AND
        |      words[CAST(i AS INT) + 1] = 'data')) > 0) AS mix
        |FROM w""".stripMargin,
    // The documents fixture has a CLOSED 31-word vocabulary, so the
    // oracle carries the dictionary as an explicit word→stem CASE chain
    // (generated from the same Porter implementation the engine runs —
    // the stemmer itself is pinned independently against the published
    // algorithm's examples in ExpressionSpec; this oracle checks the
    // lexize/match/rank/headline pipeline end-to-end in DuckDB).
    "q145_ts_stemmed" -> {
      import graft.functions.{PorterStemmer, TsLexize}
      val stop = TsLexize.englishStopwords.map(w => s"'$w'").mkString(", ")
      val vocab = Seq("a", "agg", "batch", "big", "column", "customer",
        "data", "dup", "fast", "filter", "group", "hash", "join", "key",
        "line", "merge", "order", "part", "query", "row", "scan", "slow",
        "small", "sort", "spark", "stream", "table", "the", "value",
        "vector", "window")
      val cases = vocab.map(w =>
        s"WHEN x = '$w' THEN '${PorterStemmer.stem(w)}'").mkString(" ")
      s"""WITH w AS (SELECT doc_id,
         |  list_transform(list_filter(string_split(text, ' '),
         |      x -> lower(x) NOT IN ($stop)),
         |    x -> CASE $cases ELSE lower(x) END) AS lexed
         |  FROM documents),
         |f AS (SELECT doc_id, lexed,
         |  len(list_filter(lexed, x -> x = 'queri')) AS f1,
         |  len(list_filter(lexed, x -> x = 'merg')) AS f2 FROM w)
         |SELECT doc_id, array_to_string(lexed, ' ') AS lexed,
         |  ROUND((
         |    (CASE WHEN f1 > 0 THEN list_sum(list_transform(range(1, f1 + 1),
         |       j -> CAST(0.1 AS DOUBLE) / CAST(j * j AS DOUBLE))) ELSE 0.0 END) +
         |    (CASE WHEN f2 > 0 THEN list_sum(list_transform(range(1, f2 + 1),
         |       j -> CAST(0.1 AS DOUBLE) / CAST(j * j AS DOUBLE))) ELSE 0.0 END)
         |  ) / CAST(1.64493406685 AS DOUBLE) / CAST(2 AS DOUBLE), 6) AS rank
         |FROM f
         |WHERE list_contains(lexed, 'queri') AND list_contains(lexed, 'merg')""".stripMargin
    },
    // same convention as q145: the oracle carries the closed vocabulary
    // as its engine-generated stem list (the stemmer itself is pinned
    // against hand-derived published-algorithm examples in
    // ExpressionSpec); stopword fillers never reach the lexemes
    "q197_ts_german" -> {
      import graft.functions.GermanStemmer
      val vocab = Seq("häuser", "kinder", "laufen", "bezeichnung",
        "schönheit", "aufeinander", "geheimnisse", "kleinste",
        "widerlich", "möglichkeit", "verstehen", "straße")
      val stems = vocab.map(w => s"'${GermanStemmer.stem(w)}'").mkString(", ")
      s"""WITH b AS (SELECT doc_id,
         |    [$stems][CAST(1 + doc_id % 12 AS INT)] AS s1,
         |    [$stems][CAST(1 + (doc_id + 2) % 12 AS INT)] AS s2,
         |    [$stems][CAST(1 + (doc_id * 7 + 3) % 12 AS INT)] AS s3
         |  FROM documents)
         |SELECT doc_id, s1 || ' ' || s2 || ' ' || s3 AS lexed
         |FROM b
         |WHERE (s1 = 'haus' OR s2 = 'haus' OR s3 = 'haus')
         |  AND (s1 = 'lauf' OR s2 = 'lauf' OR s3 = 'lauf')""".stripMargin
    },
    // same engine-generated-stem convention as q197/q212
    "q230_ts_spanish" -> {
      import graft.functions.SpanishStemmer
      val vocab = Seq("canciones", "trabajando", "importancia",
        "rápidamente", "agradables", "guerra", "lógico", "niños",
        "vayan", "diciéndoselo", "sensibilidad", "cantaremos")
      val stems = vocab.map(w => s"'${SpanishStemmer.stem(w)}'").mkString(", ")
      s"""WITH b AS (SELECT doc_id,
         |    [$stems][CAST(1 + doc_id % 12 AS INT)] AS s1,
         |    [$stems][CAST(1 + (doc_id + 2) % 12 AS INT)] AS s2,
         |    [$stems][CAST(1 + (doc_id * 7 + 3) % 12 AS INT)] AS s3
         |  FROM documents)
         |SELECT doc_id, s1 || ' ' || s2 || ' ' || s3 AS lexed
         |FROM b
         |WHERE (s1 = 'cancion' OR s2 = 'cancion' OR s3 = 'cancion')
         |  AND (s1 = 'trabaj' OR s2 = 'trabaj' OR s3 = 'trabaj')""".stripMargin
    },
    // same engine-generated-stem convention as q197
    "q212_ts_french" -> {
      import graft.functions.FrenchStemmer
      val vocab = Seq("chapeaux", "chanterions", "majestueux",
        "continuellement", "sensibilité", "finissions", "animaux",
        "jouer", "évidemment", "aimables", "volontairement", "yeux")
      val stems = vocab.map(w => s"'${FrenchStemmer.stem(w)}'").mkString(", ")
      s"""WITH b AS (SELECT doc_id,
         |    [$stems][CAST(1 + doc_id % 12 AS INT)] AS s1,
         |    [$stems][CAST(1 + (doc_id + 2) % 12 AS INT)] AS s2,
         |    [$stems][CAST(1 + (doc_id * 7 + 3) % 12 AS INT)] AS s3
         |  FROM documents)
         |SELECT doc_id, s1 || ' ' || s2 || ' ' || s3 AS lexed
         |FROM b
         |WHERE (s1 = 'chapeau' OR s2 = 'chapeau' OR s3 = 'chapeau')
         |  AND (s1 = 'chant' OR s2 = 'chant' OR s3 = 'chant')""".stripMargin
    },
    // same engine-generated-stem convention as q197/q212/q230
    "q236_ts_russian" -> {
      import graft.functions.RussianStemmer
      val vocab = Seq("книги", "бегала", "читавшийся", "возможность",
        "деревянный", "начинается", "линии", "прочитав", "красивейший",
        "важная", "делать", "осеннюю")
      val stems = vocab.map(w => s"'${RussianStemmer.stem(w)}'").mkString(", ")
      s"""WITH b AS (SELECT doc_id,
         |    [$stems][CAST(1 + doc_id % 12 AS INT)] AS s1,
         |    [$stems][CAST(1 + (doc_id + 2) % 12 AS INT)] AS s2,
         |    [$stems][CAST(1 + (doc_id * 7 + 3) % 12 AS INT)] AS s3
         |  FROM documents)
         |SELECT doc_id, s1 || ' ' || s2 || ' ' || s3 AS lexed
         |FROM b
         |WHERE (s1 = 'книг' OR s2 = 'книг' OR s3 = 'книг')
         |  AND (s1 = 'бега' OR s2 = 'бега' OR s3 = 'бега')""".stripMargin
    },
    // same engine-generated-stem convention as q197/q212/q230/q236
    "q237_ts_portuguese" -> {
      import graft.functions.PortugueseStemmer
      val vocab = Seq("gatos", "meninas", "desenvolvimento", "felizmente",
        "referência", "bandeira", "organização", "cantando", "falaríamos",
        "antigamente", "administrativas", "abraço")
      val stems = vocab.map(w => s"'${PortugueseStemmer.stem(w)}'").mkString(", ")
      s"""WITH b AS (SELECT doc_id,
         |    [$stems][CAST(1 + doc_id % 12 AS INT)] AS s1,
         |    [$stems][CAST(1 + (doc_id + 2) % 12 AS INT)] AS s2,
         |    [$stems][CAST(1 + (doc_id * 7 + 3) % 12 AS INT)] AS s3
         |  FROM documents)
         |SELECT doc_id, s1 || ' ' || s2 || ' ' || s3 AS lexed
         |FROM b
         |WHERE (s1 = 'referent' OR s2 = 'referent' OR s3 = 'referent')
         |  AND (s1 = 'organiz' OR s2 = 'organiz' OR s3 = 'organiz')""".stripMargin
    },
    "q245_ts_dutch" -> {
      import graft.functions.DutchStemmer
      val vocab = Seq("lichamelijkheden", "opheldering", "vrouwen",
        "huizen", "bakken", "aandeel", "onzichtbare", "gemeente",
        "jongens", "draaien", "uitbarsting", "voortdurend")
      val stems = vocab.map(w => s"'${DutchStemmer.stem(w)}'").mkString(", ")
      val q1 = DutchStemmer.stem("lichamelijkheden")
      val q2 = DutchStemmer.stem("vrouwen")
      s"""WITH b AS (SELECT doc_id,
         |    [$stems][CAST(1 + doc_id % 12 AS INT)] AS s1,
         |    [$stems][CAST(1 + (doc_id + 2) % 12 AS INT)] AS s2,
         |    [$stems][CAST(1 + (doc_id * 7 + 3) % 12 AS INT)] AS s3
         |  FROM documents)
         |SELECT doc_id, s1 || ' ' || s2 || ' ' || s3 AS lexed
         |FROM b
         |WHERE (s1 = '$q1' OR s2 = '$q1' OR s3 = '$q1')
         |  AND (s1 = '$q2' OR s2 = '$q2' OR s3 = '$q2')""".stripMargin
    },
    // same engine-generated-stem convention as the other languages
    "q239_ts_italian" -> {
      import graft.functions.ItalianStemmer
      val vocab = Seq("abbandonata", "cantando", "felicità",
        "organizzazione", "mangiarlo", "allenamento", "rapidamente",
        "psicologia", "luoghi", "amiche", "violenza", "nazione")
      val stems = vocab.map(w => s"'${ItalianStemmer.stem(w)}'").mkString(", ")
      s"""WITH b AS (SELECT doc_id,
         |    [$stems][CAST(1 + doc_id % 12 AS INT)] AS s1,
         |    [$stems][CAST(1 + (doc_id + 2) % 12 AS INT)] AS s2,
         |    [$stems][CAST(1 + (doc_id * 7 + 3) % 12 AS INT)] AS s3
         |  FROM documents)
         |SELECT doc_id, s1 || ' ' || s2 || ' ' || s3 AS lexed
         |FROM b
         |WHERE (s1 = 'abbandon' OR s2 = 'abbandon' OR s3 = 'abbandon')
         |  AND (s1 = 'cant' OR s2 = 'cant' OR s3 = 'cant')""".stripMargin
    },
    // same engine-generated-stem convention as the other languages;
    // the stemmers themselves are pinned bit-identical to the compiled
    // reference in ScandinavianStemSpec
    "q251_ts_danish" -> {
      import graft.functions.DanishStemmer
      val vocab = Seq("indtagelse", "undersøgelse", "betjeningen",
        "hurtigste", "billederne", "vennerne", "følelserne",
        "danskerne", "løbende", "smukkeste", "vinduet", "katten")
      val stems = vocab.map(w => s"'${DanishStemmer.stem(w)}'").mkString(", ")
      val q1 = DanishStemmer.stem("indtagelse")
      val q2 = DanishStemmer.stem("undersøgelse")
      s"""WITH b AS (SELECT doc_id,
         |    [$stems][CAST(1 + doc_id % 12 AS INT)] AS s1,
         |    [$stems][CAST(1 + (doc_id + 2) % 12 AS INT)] AS s2,
         |    [$stems][CAST(1 + (doc_id * 7 + 3) % 12 AS INT)] AS s3
         |  FROM documents)
         |SELECT doc_id, s1 || ' ' || s2 || ' ' || s3 AS lexed
         |FROM b
         |WHERE (s1 = '$q1' OR s2 = '$q1' OR s3 = '$q1')
         |  AND (s1 = '$q2' OR s2 = '$q2' OR s3 = '$q2')""".stripMargin
    },
    "q252_ts_norwegian" -> {
      import graft.functions.NorwegianStemmer
      val vocab = Seq("havnedistriktene", "erobringen", "tilhørighet",
        "reserverte", "bygdelagsungdommen", "bildene", "vennene",
        "løpende", "raskest", "vakrest", "nordmennene", "følelsene")
      val stems = vocab.map(w => s"'${NorwegianStemmer.stem(w)}'").mkString(", ")
      val q1 = NorwegianStemmer.stem("havnedistriktene")
      val q2 = NorwegianStemmer.stem("erobringen")
      s"""WITH b AS (SELECT doc_id,
         |    [$stems][CAST(1 + doc_id % 12 AS INT)] AS s1,
         |    [$stems][CAST(1 + (doc_id + 2) % 12 AS INT)] AS s2,
         |    [$stems][CAST(1 + (doc_id * 7 + 3) % 12 AS INT)] AS s3
         |  FROM documents)
         |SELECT doc_id, s1 || ' ' || s2 || ' ' || s3 AS lexed
         |FROM b
         |WHERE (s1 = '$q1' OR s2 = '$q1' OR s3 = '$q1')
         |  AND (s1 = '$q2' OR s2 = '$q2' OR s3 = '$q2')""".stripMargin
    },
    "q253_ts_swedish" -> {
      import graft.functions.SwedishStemmer
      val vocab = Seq("jordbruksgrödorna", "intäkterna", "följare",
        "klockan", "meningsfullt", "verksamheterna", "bilderna",
        "vännerna", "springande", "snabbast", "vackrast", "känslorna")
      val stems = vocab.map(w => s"'${SwedishStemmer.stem(w)}'").mkString(", ")
      val q1 = SwedishStemmer.stem("jordbruksgrödorna")
      val q2 = SwedishStemmer.stem("intäkterna")
      s"""WITH b AS (SELECT doc_id,
         |    [$stems][CAST(1 + doc_id % 12 AS INT)] AS s1,
         |    [$stems][CAST(1 + (doc_id + 2) % 12 AS INT)] AS s2,
         |    [$stems][CAST(1 + (doc_id * 7 + 3) % 12 AS INT)] AS s3
         |  FROM documents)
         |SELECT doc_id, s1 || ' ' || s2 || ' ' || s3 AS lexed
         |FROM b
         |WHERE (s1 = '$q1' OR s2 = '$q1' OR s3 = '$q1')
         |  AND (s1 = '$q2' OR s2 = '$q2' OR s3 = '$q2')""".stripMargin
    },
    "q255_ts_finnish" -> {
      import graft.functions.FinnishStemmer
      val vocab = Seq("taloissa", "kirjastossa", "opiskelijat",
        "kaupungissa", "yliopistossa", "tutkimuksissa", "kysymyksiin",
        "opettajien", "nopeasti", "kauniisti", "ikkunoissa", "lapsille")
      val stems = vocab.map(w => s"'${FinnishStemmer.stem(w)}'").mkString(", ")
      val q1 = FinnishStemmer.stem("taloissa")
      val q2 = FinnishStemmer.stem("kirjastossa")
      s"""WITH b AS (SELECT doc_id,
         |    [$stems][CAST(1 + doc_id % 12 AS INT)] AS s1,
         |    [$stems][CAST(1 + (doc_id + 2) % 12 AS INT)] AS s2,
         |    [$stems][CAST(1 + (doc_id * 7 + 3) % 12 AS INT)] AS s3
         |  FROM documents)
         |SELECT doc_id, s1 || ' ' || s2 || ' ' || s3 AS lexed
         |FROM b
         |WHERE (s1 = '$q1' OR s2 = '$q1' OR s3 = '$q1')
         |  AND (s1 = '$q2' OR s2 = '$q2' OR s3 = '$q2')""".stripMargin
    },
    "q256_ts_hungarian" -> {
      import graft.functions.HungarianStemmer
      val vocab = Seq("asztalok", "emberek", "házakban", "kutyáknak",
        "iskolában", "tanárok", "könyveket", "ablakon", "autóval",
        "városokban", "országok", "leveleket")
      val stems = vocab.map(w => s"'${HungarianStemmer.stem(w)}'").mkString(", ")
      val q1 = HungarianStemmer.stem("asztalok")
      val q2 = HungarianStemmer.stem("emberek")
      s"""WITH b AS (SELECT doc_id,
         |    [$stems][CAST(1 + doc_id % 12 AS INT)] AS s1,
         |    [$stems][CAST(1 + (doc_id + 2) % 12 AS INT)] AS s2,
         |    [$stems][CAST(1 + (doc_id * 7 + 3) % 12 AS INT)] AS s3
         |  FROM documents)
         |SELECT doc_id, s1 || ' ' || s2 || ' ' || s3 AS lexed
         |FROM b
         |WHERE (s1 = '$q1' OR s2 = '$q1' OR s3 = '$q1')
         |  AND (s1 = '$q2' OR s2 = '$q2' OR s3 = '$q2')""".stripMargin
    },
    "q257_ts_romanian" -> {
      import graft.functions.RomanianStemmer
      val vocab = Seq("lucrurile", "frumoasa", "copilului", "cartea",
        "oraşele", "muntelui", "florile", "prietenii", "şcolile",
        "cuvintele", "naţiunea", "călătorii")
      val stems = vocab.map(w => s"'${RomanianStemmer.stem(w)}'").mkString(", ")
      val q1 = RomanianStemmer.stem("lucrurile")
      val q2 = RomanianStemmer.stem("frumoasa")
      s"""WITH b AS (SELECT doc_id,
         |    [$stems][CAST(1 + doc_id % 12 AS INT)] AS s1,
         |    [$stems][CAST(1 + (doc_id + 2) % 12 AS INT)] AS s2,
         |    [$stems][CAST(1 + (doc_id * 7 + 3) % 12 AS INT)] AS s3
         |  FROM documents)
         |SELECT doc_id, s1 || ' ' || s2 || ' ' || s3 AS lexed
         |FROM b
         |WHERE (s1 = '$q1' OR s2 = '$q1' OR s3 = '$q1')
         |  AND (s1 = '$q2' OR s2 = '$q2' OR s3 = '$q2')""".stripMargin
    },
    "q258_ts_turkish" -> {
      import graft.functions.TurkishStemmer
      val vocab = Seq("kitapları", "evlerinden", "çocukların",
        "okullarda", "öğretmenler", "arabamla", "şehirden",
        "günlerde", "arkadaşımız", "sorularına", "cevapları",
        "denizlerde")
      val stems = vocab.map(w => s"'${TurkishStemmer.stem(w)}'").mkString(", ")
      val q1 = TurkishStemmer.stem("kitapları")
      val q2 = TurkishStemmer.stem("evlerinden")
      s"""WITH b AS (SELECT doc_id,
         |    [$stems][CAST(1 + doc_id % 12 AS INT)] AS s1,
         |    [$stems][CAST(1 + (doc_id + 2) % 12 AS INT)] AS s2,
         |    [$stems][CAST(1 + (doc_id * 7 + 3) % 12 AS INT)] AS s3
         |  FROM documents)
         |SELECT doc_id, s1 || ' ' || s2 || ' ' || s3 AS lexed
         |FROM b
         |WHERE (s1 = '$q1' OR s2 = '$q1' OR s3 = '$q1')
         |  AND (s1 = '$q2' OR s2 = '$q2' OR s3 = '$q2')""".stripMargin
    },
    "q259_ts_ispell" -> {
      // lexeme streams pinned verbatim from the reference's tsdicts.out
      val pinned = Seq(
        "skies" -> "sky",
        "bookings" -> "booking book",
        "rebookings" -> "booking book",
        "unbookings" -> "book",
        "foots" -> "foot",
        "rebook" -> "∅",
        "footklubber" -> "foot klubber",
        "footballklubber" -> "footballklubber foot ball klubber football klubber",
        "ballyklubber" -> "ball klubber",
        "footballyklubber" -> "foot ball klubber")
      val words = pinned.map(p => s"'${p._1}'").mkString(", ")
      val lexs = pinned.map(p => s"'${p._2}'").mkString(", ")
      s"""SELECT doc_id,
         |  [$words][CAST(doc_id % 10 AS INT) + 1] AS word,
         |  [$lexs][CAST(doc_id % 10 AS INT) + 1] AS lexemes
         |FROM documents""".stripMargin
    },
    "q146_ts_headline_stemmed" -> {
      import graft.functions.PorterStemmer
      val vocab = Seq("a", "agg", "batch", "big", "column", "customer",
        "data", "dup", "fast", "filter", "group", "hash", "join", "key",
        "line", "merge", "order", "part", "query", "row", "scan", "slow",
        "small", "sort", "spark", "stream", "table", "the", "value",
        "vector", "window")
      val cases = vocab.map(w =>
        s"WHEN x = '$w' THEN '${PorterStemmer.stem(w)}'").mkString(" ")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words,
         |  list_transform(string_split(text, ' '),
         |    x -> CASE $cases ELSE lower(x) END) AS st
         |  FROM documents),
         |f AS (SELECT * FROM w
         |  WHERE list_contains(st, 'queri') AND list_contains(st, 'merg')),
         |p AS (SELECT doc_id, words, st,
         |  list_sort(list_concat(
         |    list_transform(list_filter(range(1, len(st) + 1),
         |      i -> st[CAST(i AS INT)] = 'queri'), x -> [CAST(x AS INT), 1]),
         |    list_transform(list_filter(range(1, len(st) + 1),
         |      i -> st[CAST(i AS INT)] = 'merg'), x -> [CAST(x AS INT), 2]))) AS m
         |  FROM f),
         |b AS (SELECT doc_id, words, st,
         |  list_min(list_filter(list_transform(range(1, len(m)), i ->
         |    CASE WHEN m[CAST(i AS INT)][2] <> m[CAST(i AS INT) + 1][2]
         |         THEN CAST(m[CAST(i AS INT) + 1][1] - m[CAST(i AS INT)][1] AS BIGINT)
         |              * 100000 + m[CAST(i AS INT)][1]
         |         ELSE NULL END), x -> x IS NOT NULL)) AS best
         |  FROM p),
         |h AS (SELECT doc_id, words, st,
         |  CAST(coalesce(best % 100000, 1) AS INT) AS hstart FROM b)
         |SELECT doc_id,
         |  array_to_string(list_transform(
         |    range(hstart, LEAST(len(words), hstart + 9) + 1),
         |    i -> CASE WHEN st[CAST(i AS INT)] IN ('queri', 'merg')
         |              THEN '<b>' || words[CAST(i AS INT)] || '</b>'
         |              ELSE words[CAST(i AS INT)] END), ' ') AS headline
         |FROM h""".stripMargin
    },
    // each needle hand-evaluated against the generated document shape
    "q135_jsonb_contains" ->
      """SELECT o_orderkey,
        |  (o_orderstatus = 'F') AS seg_f,
        |  (o_orderpriority = '1-URGENT' AND o_orderstatus = 'O') AS urgent_open,
        |  FALSE AS missing_key,
        |  TRUE AS empty_obj,
        |  (o_orderstatus = 'F') AS tag_f,
        |  (o_custkey = 7) AS key7
        |FROM orders""".stripMargin,
    // the FOR-loop recurrence unrolled to the same IEEE double op order
    // the compiled aggregate() executes, so values are bit-identical
    "q141_plpgsql_loop" -> {
      var bal = "(CAST(((o_totalprice)) AS DOUBLE))"
      var tot = "(CAST((0.0) AS DOUBLE))"
      for (i <- 1 to 12) {
        bal = s"(($bal) * (1.0 + 0.005) - (o_totalprice) / 12.0)"
        tot = s"(($tot) + ($bal) * $i)"
      }
      s"SELECT o_orderkey, $tot AS sched FROM orders"
    },

    // FOREACH = per-word length sum; FOR-over-query = the set-oriented
    // spelling of each accumulation (count / ordered string_agg) — with
    // COALESCE for customers whose loop runs zero times
    "q164_plpgsql_set_loops" ->
      """SELECT c_custkey,
        |  CAST(list_sum(list_transform(
        |    string_split(replace(c_name, '#', ' '), ' '),
        |    w -> length(w))) AS BIGINT) AS name_chars,
        |  (SELECT COUNT(CASE WHEN o_totalprice > 150000.0 THEN 1 END)
        |   FROM orders WHERE o_custkey = c_custkey) AS n_big,
        |  COALESCE((SELECT string_agg(substr(o_orderpriority, 1, 1), ''
        |      ORDER BY o_orderpriority)
        |    FROM orders WHERE o_custkey = c_custkey), '') AS prios
        |FROM customer""".stripMargin,

    "q161_sql_table_fn" ->
      """SELECT c.c_mktsegment, count(*) AS n
        |FROM (SELECT o_orderkey, o_custkey FROM orders
        |      WHERE o_orderpriority = '1-URGENT') u
        |JOIN customer c ON c.c_custkey = u.o_custkey
        |GROUP BY c.c_mktsegment""".stripMargin,
    "q160_plpgsql_exception" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_custkey % 5 = 0 THEN -1.0
        |       ELSE CAST(o_orderkey AS DOUBLE) / CAST(o_custkey % 5 AS DOUBLE)
        |  END AS ratio,
        |  CASE WHEN o_orderkey % 2 = 0
        |       THEN CAST(substr(o_orderpriority, 1, 1) AS INT)
        |       ELSE 0 END AS pfx
        |FROM orders""".stripMargin,
    // n = ceil(b0/3) terms of b0, b0-3, ...: s = n·b0 − 3·n(n−1)/2,
    // all-integer (the // products are even, so the division is exact)
    "q149_plpgsql_while" ->
      """WITH b AS (SELECT o_orderkey, o_custkey % 50 AS b0 FROM orders),
        |n AS (SELECT o_orderkey, b0,
        |        CASE WHEN b0 > 0 THEN (b0 + 2) // 3 ELSE 0 END AS n FROM b)
        |SELECT o_orderkey, n * b0 - 3 * ((n * (n - 1)) // 2) AS dsum
        |FROM n""".stripMargin,

    // the CASE chain the plpgsql compiler emits, with its exact
    // parenthesization (* 2 is exact in doubles either way)
    "q134_plpgsql" ->
      """SELECT o_orderkey,
        |  CASE WHEN ((o_totalprice) * 2) > 600000 THEN 'high'
        |       WHEN ((o_totalprice) * 2) > 300000 THEN 'mid'
        |       ELSE 'low' END AS band
        |FROM orders""".stripMargin,
    // same parenthesization the macro expansion emits, so the IEEE
    // double arithmetic is shape-identical on both engines
    "q119_sql_function" ->
      """SELECT l_orderkey, l_linenumber,
        |  (((l_extendedprice) * (1 - (l_discount))) * (1 + (l_tax))) AS px
        |FROM lineitem WHERE l_quantity > 45""".stripMargin,
    "q79_udf_scalar" ->
      """SELECT c_custkey, c_acctbal * 2.0 + 1.0 AS norm_bal,
        |       printf('%.2f', c_acctbal) AS fmt_bal
        |FROM customer""".stripMargin,
    "q78_trgm_similarity" ->
      """WITH g AS (
        |  SELECT p_partkey, p_name,
        |    list_distinct(list_transform(
        |      range(1, length('  ' || lower(p_name) || ' ') - 1),
        |      i -> substr('  ' || lower(p_name) || ' ', CAST(i AS INT), 3))) AS ga,
        |    list_distinct(list_transform(
        |      range(1, length('  promo burnished copper ') - 1),
        |      i -> substr('  promo burnished copper ', CAST(i AS INT), 3))) AS gb
        |  FROM part)
        |SELECT p_partkey, p_name,
        |  CAST(len(list_filter(ga, x -> list_contains(gb, x))) AS DOUBLE) /
        |  CAST(len(ga) + len(gb) - len(list_filter(ga, x -> list_contains(gb, x))) AS DOUBLE) AS sim
        |FROM g
        |WHERE CAST(len(list_filter(ga, x -> list_contains(gb, x))) AS DOUBLE) /
        |      CAST(len(ga) + len(gb) - len(list_filter(ga, x -> list_contains(gb, x))) AS DOUBLE) > 0.05""".stripMargin,
    // weighted calc_rank_or spelled with the same double shapes as the
    // Spark expression: per-position weight 1.0/0.4/0.1 (A/B/D), per-term
    // (wjm + Σ w_j/j² - wjm/jm²)/π²6, /2 terms; norms /uniq and
    // /log2(uniq+1); cd = harmonic-mean Cpos over adjacent unlike pairs
    "q131_ts_rank_weighted" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
        |  WHERE list_contains(string_split(text, ' '), 'data')
        |    AND list_contains(string_split(text, ' '), 'query')),
        |f AS (SELECT doc_id, words,
        |  list_transform(list_filter(range(1, len(words) + 1),
        |      i -> words[CAST(i AS INT)] = 'data'),
        |    p -> CASE WHEN p <= 2 THEN CAST(1.0 AS DOUBLE)
        |              WHEN p <= 4 THEN CAST(0.4 AS DOUBLE)
        |              ELSE CAST(0.1 AS DOUBLE) END) AS wa1,
        |  list_transform(list_filter(range(1, len(words) + 1),
        |      i -> words[CAST(i AS INT)] = 'query'),
        |    p -> CASE WHEN p <= 2 THEN CAST(1.0 AS DOUBLE)
        |              WHEN p <= 4 THEN CAST(0.4 AS DOUBLE)
        |              ELSE CAST(0.1 AS DOUBLE) END) AS wa2,
        |  list_sort(list_concat(
        |    list_transform(list_filter(range(1, len(words) + 1),
        |        i -> words[CAST(i AS INT)] = 'data'),
        |      p -> {'pos': CAST(p AS INT), 'trm': 1,
        |            'w': CASE WHEN p <= 2 THEN CAST(1.0 AS DOUBLE)
        |                      WHEN p <= 4 THEN CAST(0.4 AS DOUBLE)
        |                      ELSE CAST(0.1 AS DOUBLE) END}),
        |    list_transform(list_filter(range(1, len(words) + 1),
        |        i -> words[CAST(i AS INT)] = 'query'),
        |      p -> {'pos': CAST(p AS INT), 'trm': 2,
        |            'w': CASE WHEN p <= 2 THEN CAST(1.0 AS DOUBLE)
        |                      WHEN p <= 4 THEN CAST(0.4 AS DOUBLE)
        |                      ELSE CAST(0.1 AS DOUBLE) END}))) AS m
        |  FROM w),
        |c AS (SELECT doc_id, words, m,
        |  ((CASE WHEN len(wa1) > 0 THEN
        |      list_max(wa1)
        |      + list_sum(list_transform(range(1, len(wa1) + 1),
        |          j -> wa1[CAST(j AS INT)] / CAST(j * j AS DOUBLE)))
        |      - list_max(wa1) / CAST(list_position(wa1, list_max(wa1))
        |                             * list_position(wa1, list_max(wa1)) AS DOUBLE)
        |    ELSE CAST(0.0 AS DOUBLE) END) / CAST(1.64493406685 AS DOUBLE)
        |   + (CASE WHEN len(wa2) > 0 THEN
        |      list_max(wa2)
        |      + list_sum(list_transform(range(1, len(wa2) + 1),
        |          j -> wa2[CAST(j AS INT)] / CAST(j * j AS DOUBLE)))
        |      - list_max(wa2) / CAST(list_position(wa2, list_max(wa2))
        |                             * list_position(wa2, list_max(wa2)) AS DOUBLE)
        |    ELSE CAST(0.0 AS DOUBLE) END) / CAST(1.64493406685 AS DOUBLE))
        |  / CAST(2.0 AS DOUBLE) AS base,
        |  len(list_distinct(words)) AS uniq
        |  FROM f)
        |SELECT doc_id,
        |  ROUND(base, 6) AS rank_w,
        |  ROUND(base / CAST(uniq AS DOUBLE), 6) AS rank_uniq,
        |  ROUND(base / (ln(CAST(uniq AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |                / CAST(0.6931471805599453 AS DOUBLE)), 6) AS rank_loguniq,
        |  ROUND(CASE WHEN len(m) >= 2 THEN list_sum(list_transform(range(1, len(m)),
        |    i -> CASE WHEN m[CAST(i AS INT)].trm <> m[CAST(i AS INT) + 1].trm
        |         THEN (CAST(2.0 AS DOUBLE)
        |               / (CAST(1.0 AS DOUBLE) / m[CAST(i AS INT)].w
        |                  + CAST(1.0 AS DOUBLE) / m[CAST(i AS INT) + 1].w))
        |              / CAST(m[CAST(i AS INT) + 1].pos - m[CAST(i AS INT)].pos AS DOUBLE)
        |         ELSE CAST(0.0 AS DOUBLE) END))
        |    ELSE CAST(0.0 AS DOUBLE) END, 6) AS rank_cd_w
        |FROM c""".stripMargin
  )
}
