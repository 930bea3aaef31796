package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Dedup, Knn, Sreh, TextAnalysis}
import graft.streaming.Streams
import Q._

/** Training-data pipeline + streaming + external-load operators.
  * Dedup/KNN designs are the 100 TB scale paths (banded LSH / bucketed
  * ANN — never all-pairs); text metrics are exact-arithmetic and
  * oracle-checked.
  */
object PipelineQueries {

  val queries: Map[String, QueryFn] = Map(

    // Exact dedup groups (hash-groupBy; linear, shuffle on content hash).
    "q80_dedup_exact" -> ((s, d) =>
      Dedup.exactGroups(t(s, d, "documents"))),

    // MinHash+LSH near-dup pairs, verified at jaccard >= 0.8 on word
    // 3-gram shingles. Oracle computes the exact all-pairs answer (fine
    // at sf0.01); LSH recall at 0.8 is ~1-4e-8, so the verified output
    // equals the exact answer.
    "q81_neardup_lsh" -> ((s, d) =>
      Dedup.nearDupPairs(t(s, d, "documents"), threshold = 0.8)),

    // End-to-end dedup: LSH pairs → connected components (min-label
    // propagation) → canonical keeper per cluster.
    "q100_dedup_components" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.nearDupPairs(docs, threshold = 0.8)
      Dedup.connectedComponents(pairs, docs.select(col("doc_id").as("id")))
        .select(col("id").as("doc_id"), col("component"),
          (col("id") === col("component")).as("is_keeper"))
    }),

    // Segment-level exact dedup (Lee et al. 2022 / RefinedWeb line
    // dedup): 3-word segments, drop every segment text appearing in >=2
    // DISTINCT docs (cross-corpus boilerplate), reassemble survivors in
    // order. The oracle replays the identical segmentation in SQL.
    "q242_segment_dedup" -> ((s, d) =>
      Dedup.segmentDedup(t(s, d, "documents"),
        wordsPerSegment = 3, minDocFreq = 2)),

    // SemDeDup (Abbas et al. 2023): k-means clusters over embeddings,
    // within-cluster cosine >= threshold linked, one representative
    // (min id) kept per semantic group. Threshold 0.4 sits at the
    // ~99.95th percentile of this synthetic corpus's pairwise cosine
    // (near-random vectors; real corpora use ~0.95+), so the dedup
    // path actually fires. rows-only: cluster geometry is
    // engine-defined; planted-duplicate behavior asserted in
    // OperatorSpec.
    "q243_semdedup" -> ((s, d) =>
      Dedup.semanticDedup(t(s, d, "embeddings"), threshold = 0.4)),

    // Naive Bayes domain classifier (the GPT-3 quality-filter /
    // CCNet fastText shape): train on the `source` label, score the
    // same corpus map-side, output the confusion matrix. rows-only:
    // float log-prob argmax is engine-defined; planted-vocab accuracy
    // is asserted in OperatorSpec.
    "q244_nb_classifier" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val model = TextAnalysis.nbTrain(docs, "source")
      TextAnalysis.withNbPrediction(docs, model)
        .groupBy("source", "pred_label").agg(count(lit(1)).as("n"))
    }),

    // Model-based quality filtering (DCLM / FineWeb-Edu / GPT-3 filter
    // shape): NB classifier trained on good/bad seed sets gates the
    // corpus, stacked on the heuristic token floor. Planted fixture:
    // disjoint vocabulary pools keyed off doc_id make every decision
    // exactly replayable in the oracle — docs 0 mod 3 carry the
    // educational pool (kept), 1 mod 3 the spam pool (dropped by the
    // classifier), 2 mod 3 are unseen-vocab two-token stubs (prior
    // tie -> 'bad' by the documented label-asc tie-break, and dropped
    // by the token floor regardless). Mixed-vocabulary separation is
    // asserted in OperatorSpec.
    "q254_quality_filter" -> ((s, d) => {
      val goodPool = Seq("study", "analysis", "theory", "evidence")
      val badPool = Seq("pills", "prize", "clickbait", "jackpot")
      def pick(pool: Seq[String]) =
        element_at(array(pool.map(lit): _*), (col("doc_id") % 4).cast("int") + 1)
      val docs = t(s, d, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(lit("the rigorous "), pick(goodPool),
            lit(" examines careful "), pick(goodPool.reverse),
            lit(" with method")))
          .when(col("doc_id") % 3 === 1,
            concat(lit("buy cheap "), pick(badPool),
              lit(" click free "), pick(badPool.reverse),
              lit(" now money")))
          .otherwise(lit("zqx wvt")).as("text"))
      val good = s.sql(
        """SELECT stack(3,
          |  'the rigorous study examines careful analysis with method',
          |  'rigorous theory examines careful evidence with method',
          |  'the study of analysis and theory examines evidence') AS text"""
          .stripMargin)
      val bad = s.sql(
        """SELECT stack(3,
          |  'buy cheap pills click free prize now money',
          |  'cheap clickbait click free jackpot now buy money',
          |  'buy pills prize clickbait jackpot free now') AS text"""
          .stripMargin)
      TextAnalysis.qualityClassifierFilter(docs, good, bad, minTokens = 5)
        .select(col("doc_id"), col("quality_label"), col("keep"))
    }),

    // SimHash near-dup candidates via pigeonhole block join (rows-only:
    // the 64-bit fingerprint is engine-defined).
    "q82_simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), maxDist = 3)),

    // Winnowed rolling-hash fingerprint candidates (rows-only:
    // engine-defined hash; consistency vs jaccard tested in OperatorSpec).
    "q103_winnow_pairs" -> ((s, d) =>
      Dedup.winnowPairs(t(s, d, "documents"))),

    // Canonical-fingerprint (sorted distinct token set) dedup.
    "q83_fingerprint" -> ((s, d) =>
      Dedup.withFingerprint(t(s, d, "documents"))
        .select("doc_id", "fingerprint")),

    // Per-language corpus stats.
    "q84_lang_stats" -> ((s, d) =>
      t(s, d, "documents").groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"))),

    // Quality scoring (deterministic int-ratio features).
    "q85_quality_score" -> ((s, d) =>
      TextAnalysis.withQuality(t(s, d, "documents"))
        .select("doc_id", "n_tokens", "avg_token_len", "punct_ratio",
          "stopword_ratio", "quality_score")),

    // Repetition signals (Gopher/MassiveText boilerplate rules):
    // most-frequent-word fraction + duplicate bigram/trigram fractions.
    "q179_repetition_signals" -> ((s, d) =>
      // n-gram expansion + counting is map-heavy; spread the
      // 1-partition fixture scan first (same move as q142/q196)
      TextAnalysis.repetitionSignals(t(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism))
        .select(col("doc_id"), round(col("top_word_frac"), 6).as("top_word_frac"),
          round(col("dup_bigram_frac"), 6).as("dup_bigram_frac"),
          round(col("dup_trigram_frac"), 6).as("dup_trigram_frac"))),

    // TF-IDF term weights (tf, df exact longs; idf = ln(N/df) rounded to
    // 6 decimals on both sides — JVM Math.log and libm differ by 1 ulp).
    "q110_tfidf" -> ((s, d) =>
      graft.operators.TextAnalysis.tfidf(t(s, d, "documents"))
        .where(length(col("term")) > 3 && col("tf") >= 2)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          round(col("tfidf"), 6).as("tfidf"))),

    // Heuristic language-ID confusion counts (rows-only: heuristic is
    // engine-defined; accuracy asserted in ScalaTest).
    "q86_lang_id" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("lang"), expr("lang_id(text)").as("predicted"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))),

    // Token counting (whitespace).
    "q87_token_count" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))),

    // Deterministic train/val/test split: first 16 bits of md5(doc_id)
    // as a fraction — reproducible across engines/cluster sizes by
    // construction, which the oracle proves by recomputing the same
    // hash arithmetic in DuckDB.
    "q198_split" -> ((s, d) =>
      TextAnalysis.deterministicSplit(t(s, d, "documents"))
        .select(col("doc_id"), col("split"))),

    // Concat-and-chunk context packing (shard-local prefix sums — the
    // 100 TB-safe layout; see TextAnalysis.contextPack).
    "q199_pack_contexts" -> ((s, d) =>
      TextAnalysis.contextPack(t(s, d, "documents"))),

    // Deterministic weighted domain mixing: per-language keep
    // probabilities applied via the md5-fraction trick — the oracle
    // replays the same hash arithmetic, so the exact kept set matches.
    "q209_weighted_sample" -> ((s, d) =>
      TextAnalysis.weightedSample(t(s, d, "documents"), "lang",
        Map("en" -> 0.9, "fr" -> 0.5, "es" -> 0.25, "de" -> 0.1,
          "zh" -> 0.05))
        .select(col("doc_id"), col("lang"))),

    // Benchmark decontamination (the published 13-gram collision
    // recipe): training docs sharing any word 13-gram with the
    // benchmark slice. Engine joins on xxhash64 of the gram (narrow
    // shuffle rows); the oracle joins on the gram text itself — equal
    // results absent a 64-bit hash collision.
    "q210_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      TextAnalysis.contaminationPairs(
        docs, docs.where(col("doc_id") % 37 === 0), n = 13)
    }),

    // PII scrubbing: emails/IPs/phones injected deterministically from
    // doc_id (both engines build the identical input), then redacted to
    // typed placeholders by the same regex chain.
    "q200_pii_scrub" -> ((s, d) => {
      val injected = concat(
        col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com from 10."), (col("doc_id") % 256).cast("string"),
        lit(".0.1 call +1-555-"), (lit(1000) + col("doc_id") % 9000).cast("string"))
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.piiScrub(injected).as("scrubbed"))
    }),

    // Brute-force cosine top-k (exact baseline; broadcast query side).
    "q88_knn_brute" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Knn.bruteForceTopK(emb, emb.where(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cos_sim"),
          col("rnk").cast("int").as("rnk"))
    }),

    // Sign-LSH bucketed ANN (scale path; recall<1 → rows-only, quality
    // asserted against brute force in ScalaTest).
    "q89_knn_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Knn.lshTopK(emb, emb.where(col("vec_id") < 10), k = 5)
    }),

    // IVF-bucketed ANN with 2 Lloyd iterations of spherical k-means
    // (rows-only; recall vs brute force in OperatorSpec).
    "q101_knn_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Knn.ivfTopK(emb, emb.where(col("vec_id") < 10), k = 5, trainIters = 2)
    }),

    // Product-quantization ANN: corpus encoded once to m-byte codes,
    // queries scored via ADC table lookups, refine·k candidates
    // re-ranked exactly (rows-only; recall vs brute in OperatorSpec).
    "q129_knn_pq" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Knn.pqTopK(emb, emb.where(col("vec_id") < 10), k = 5,
        codes = 32, trainIters = 1, refine = 8)
    }),

    // IVFADC: coarse IVF cells × residual-PQ codes — each query ADC-scans
    // only its probed cells' code lists, then refine·k exact re-rank
    // (rows-only; recall + scanned-fraction asserts in OperatorSpec).
    "q133_knn_ivfadc" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Knn.ivfadcTopK(emb, emb.where(col("vec_id") < 10), k = 5,
        codes = 32, trainIters = 1, refine = 8)
    }),

    // IVFADC build-once / probe-many lifecycle (CREATE INDEX analog):
    // the inverted file persists partitioned by cell, the probe reloads
    // the codebooks and scans ONLY its probed cells' directories via
    // partition pruning (PlanSpec asserts the pruned scan; OperatorSpec
    // asserts probe == one-shot ivfadcTopK, so recall is unchanged).
    // Rows-only like the other ANN entries.
    "q147_knn_ivfadc_index" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val path = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_ivfadc_index").toString
      Knn.buildIvfadcIndex(emb, path, nCentroids = 16,
        codes = 32, trainIters = 1)
      Knn.probeIvfadc(Knn.loadIvfadcIndex(s, path), emb,
        emb.where(col("vec_id") < 10), k = 5, refine = 8)
    }),

    // Embedding-cosine near-dup pairs (LSH self-join + exact verify;
    // rows-only — recall < 1 by construction, quality in OperatorSpec).
    "q104_dedup_embed" -> ((s, d) =>
      Dedup.embedNearDupPairs(t(s, d, "embeddings"), threshold = 0.4)),

    // Per-vector L2 norms (sequential-fold double arithmetic).
    "q90_embed_norms" -> ((s, d) =>
      t(s, d, "embeddings").select(
        col("vec_id"), col("label"),
        Knn.norm2(col("embedding")).as("l2_norm"))),

    // Structured Streaming tumbling window (real streaming exec via
    // AvailableNow; SURVEY §2.10 capability superset).
    "q91_stream_tumbling" -> ((s, d) => {
      graft.Tables.register(s, d)
      Streams.tumblingCounts(s, d)
    }),

    // Streaming sliding window (1 h window, 30 min slide).
    "q96_stream_sliding" -> ((s, d) => {
      graft.Tables.register(s, d)
      Streams.slidingCounts(s, d)
    }),

    // Streaming session windows per user (10 min gap).
    "q92_stream_session" -> ((s, d) => {
      graft.Tables.register(s, d)
      Streams.sessionized(s, d)
    }),

    // Arbitrary stateful streaming (mapGroupsWithState running counts).
    "q102_stream_stateful" -> ((s, d) => {
      graft.Tables.register(s, d)
      Streams.statefulCounts(s, d)
    }),

    // Streaming dedup with watermark-bounded state over a unioned stream.
    "q98_stream_dedup" -> ((s, d) => {
      graft.Tables.register(s, d)
      Streams.dedupCounts(s, d)
    }),

    // Stream–stream watermarked interval join: click↔purchase within
    // 30 min per user, both sides real event streams.
    "q118_stream_stream_join" -> ((s, d) => {
      graft.Tables.register(s, d)
      Streams.streamStreamJoin(s, d)
    }),

    // Full-outer watermarked stream-stream join: unmatched rows on BOTH
    // sides null-extend on watermark expiry; flush batches make the
    // bounded run exact vs the batch full-outer interval join.
    "q136_stream_full_outer" -> ((s, d) => {
      graft.Tables.register(s, d)
      Streams.streamStreamFullOuterJoin(s, d)
    }),

    // Stream–static broadcast join + aggregation.
    "q99_stream_static_join" -> ((s, d) => {
      graft.Tables.register(s, d)
      Streams.streamStaticJoin(s, d)
    }),

    // Custom-state sessionization via typed grouped iteration
    // (mapGroups-family) — same semantics as q92's session_window, same
    // gaps-and-islands oracle.
    "q97_sessionize_custom" -> ((s, d) =>
      graft.streaming.Sessionize.byGroups(t(s, d, "events"), 10).toDF()
        .select(col("s_start").cast("timestamp_ntz").as("s_start"),
          col("s_end").cast("timestamp_ntz").as("s_end"),
          col("user_id"), col("n_events"))),

    // SREH: PERMISSIVE CSV load with reject limit. The CSV is generated
    // deterministically into the build dir; the oracle reads the same
    // file with DuckDB read_csv(ignore_errors) so well-formed-row
    // filtering is verified exactly.
    "q93_sreh_csv" -> ((s, d) => {
      val dir = new java.io.File("target/sreh_demo")
      dir.mkdirs()
      val f = new java.io.File(dir, "input.csv")
      val rows = (1 to 100).map { i =>
        if (i % 10 == 0) s"$i,broken_row_no_second_field"
        else s"$i,name_$i,${i * 1.5}"
      }
      java.nio.file.Files.write(f.toPath, String.join("\n", rows: _*).getBytes)
      val schema = StructType(Seq(
        StructField("id", IntegerType), StructField("name", StringType),
        StructField("score", DoubleType)))
      Sreh.readCsv(s, f.getAbsolutePath, schema, rejectLimit = 20).good
    }),

    // CREATE EXTERNAL TABLE DDL end-to-end (gram.y CreateExternalStmt →
    // the statement router): the file:// protocol form with CSV options,
    // LOG ERRORS, and a reject limit — querying the view the DDL
    // registers, exactly how a migrated load script does. The oracle
    // reads the same file with DuckDB's permissive CSV reader.
    "q219_external_ddl" -> ((s, d) => {
      val dir = new java.io.File("target/ext_ddl_demo")
      dir.mkdirs()
      val f = new java.io.File(dir, "load.csv")
      val rows = (0 until 200).map { i =>
        if (i % 50 == 17) s"broken_$i" else s"$i|v${i % 7}|${i * 3}"
      }
      java.nio.file.Files.write(f.toPath, rows.mkString("\n").getBytes)
      graft.Graft.execute(s,
        s"""CREATE EXTERNAL TABLE ext_catalog_demo (id int, tag text, amt bigint)
           |LOCATION ('file://localhost${f.getAbsolutePath}')
           |FORMAT 'CSV' (DELIMITER '|' NULL '')
           |LOG ERRORS SEGMENT REJECT LIMIT 10 ROWS""".stripMargin)
      s.sql("""SELECT tag, COUNT(*) AS n, SUM(amt) AS amt_sum, SUM(id) AS id_sum
              |FROM ext_catalog_demo GROUP BY tag""".stripMargin)
    }),

    // s3:// external table (gpcontrib/gpcloud): the gpcloud URL +
    // config-file options translate to fs.s3a.* settings and the scan
    // runs through the Hadoop FS + SREH layer. No connector jars or
    // network in this container, so the s3a scheme is backed by the
    // local-mapping mock FS — the DDL routing, config translation,
    // bucket/prefix split, and permissive parse are all the real path.
    "q231_s3_external" -> ((s, d) => {
      val dir = new java.io.File("target/s3_ext_demo").getAbsoluteFile
      dir.mkdirs()
      val f = new java.io.File(dir, "load.csv")
      val rows = (0 until 300).map { i =>
        if (i % 60 == 13) s"corrupt_$i" else s"$i|b${i % 5}|${i * 7}"
      }
      java.nio.file.Files.write(f.toPath, rows.mkString("\n").getBytes)
      val conf = new java.io.File(dir, "s3.conf")
      java.nio.file.Files.write(conf.toPath,
        "[default]\naccessid = AKDEMO\nsecret = SKDEMO\nencryption = true\n".getBytes)
      s.sparkContext.hadoopConfiguration.set("fs.s3a.impl",
        classOf[graft.sources.LocalSchemeFileSystem].getName)
      graft.Graft.execute(s, "DROP EXTERNAL TABLE IF EXISTS ext_s3_demo")
      graft.Graft.execute(s,
        s"""CREATE EXTERNAL TABLE ext_s3_demo (id int, tag text, amt bigint)
           |LOCATION ('s3://s3-us-west-2.amazonaws.com/graftbkt${f.getAbsolutePath}
           |  config=${conf.getAbsolutePath} region=us-west-2')
           |FORMAT 'CSV' (DELIMITER '|' NULL '')
           |LOG ERRORS SEGMENT REJECT LIMIT 10 ROWS""".stripMargin)
      s.sql("""SELECT tag, COUNT(*) AS n, SUM(amt) AS amt_sum, SUM(id) AS id_sum
              |FROM ext_s3_demo GROUP BY tag""".stripMargin)
    }),

    // Fixed-width CUSTOM formatter (contrib/formatter_fixedwidth): the
    // mainframe-ETL ingest form. The oracle replays the same slicing in
    // SQL (substr/rtrim/try_cast over whole lines), so trim, null-token
    // and reject semantics are verified value-exact.
    "q232_fixedwidth" -> ((s, d) => {
      val dir = new java.io.File("target/fw_demo").getAbsoluteFile
      dir.mkdirs()
      val f = new java.io.File(dir, "load.txt")
      def pad(v: String, w: Int) = v.padTo(w, ' ')
      val rows = (0 until 200).map { i =>
        val amt = if (i % 25 == 9) "bad" else if (i % 10 == 3) "NA"
          else String.valueOf(i * 7)
        pad(String.valueOf(i), 5) + pad(s"name_${i % 6}", 10) + pad(amt, 8)
      } :+ "too_short"
      java.nio.file.Files.write(f.toPath, rows.mkString("\n").getBytes)
      graft.Graft.execute(s, "DROP EXTERNAL TABLE IF EXISTS ext_fw_demo")
      graft.Graft.execute(s,
        s"""CREATE EXTERNAL TABLE ext_fw_demo (id int, name text, amt bigint)
           |LOCATION ('file://localhost${f.getAbsolutePath}')
           |FORMAT 'CUSTOM' (formatter=fixedwidth_in, id='5', name='10',
           |  amt='8', null='NA')
           |LOG ERRORS SEGMENT REJECT LIMIT 20 ROWS""".stripMargin)
      s.sql("""SELECT name, COUNT(*) AS n, COUNT(amt) AS n_amt,
              |  SUM(amt) AS amt_sum, SUM(id) AS id_sum
              |FROM ext_fw_demo GROUP BY name""".stripMargin)
    }),

    // CREATE TYPE / CREATE DOMAIN routing (typecmds.c DefineEnum): the
    // pg_dump replay sequence — enum maps to STRING + insert-time label
    // check, domain to its base type + CHECK. Oracle replays the final
    // table contents declaratively.
    "q233_create_type" -> ((s, d) => {
      // a fresh session's in-memory catalog doesn't know the table from
      // a prior run, so DROP alone leaves the managed location behind
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(wh, "pgtype_demo"))
      for (stmt <- Seq(
        "DROP TABLE IF EXISTS pgtype_demo",
        "DROP TYPE IF EXISTS mood",
        "DROP DOMAIN IF EXISTS rating",
        "CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')",
        "CREATE DOMAIN rating AS int CHECK (VALUE BETWEEN 1 AND 10)",
        "CREATE TABLE pgtype_demo (id int, m mood, r rating)",
        """INSERT INTO pgtype_demo VALUES (1, 'sad', 3), (2, 'ok', 5),
           (3, 'happy', 9), (4, 'ok', 7), (5, NULL, NULL)"""))
        graft.Graft.execute(s, stmt)
      s.sql("""SELECT m, COUNT(*) AS n, SUM(r) AS r_sum
              |FROM pgtype_demo GROUP BY m""".stripMargin)
    }),

    // Streaming CDC apply: foreachBatch + guarded MERGE — the final
    // table is the global latest event per user regardless of batch
    // slicing; the oracle takes the same argmax declaratively.
    "q229_stream_cdc" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.streaming.Streams.cdcApply(s, d)
    }),

    // Specialized text-search dictionaries (contrib/dict_int,
    // contrib/dict_xsyn): intdict trims integer tokens distributed over
    // events, xsyn expands synonym groups; both through CREATE TEXT
    // SEARCH DICTIONARY DDL + ts_lexize. The oracle replays the trim as
    // substring and the groups as CASE.
    "q235_ts_dictionary" -> ((s, d) => {
      graft.Tables.register(s, d)
      val dir = new java.io.File("target/tsdict_demo").getAbsoluteFile
      dir.mkdirs()
      val rules = new java.io.File(dir, "demo.rules")
      java.nio.file.Files.write(rules.toPath,
        "spark cluster engine\nparquet columnar\n".getBytes)
      graft.Graft.execute(s, "DROP TEXT SEARCH DICTIONARY IF EXISTS demo_int")
      graft.Graft.execute(s, "DROP TEXT SEARCH DICTIONARY IF EXISTS demo_xsyn")
      graft.Graft.execute(s,
        "CREATE TEXT SEARCH DICTIONARY demo_int (TEMPLATE = intdict_template, MAXLEN = 4)")
      graft.Graft.execute(s,
        s"""CREATE TEXT SEARCH DICTIONARY demo_xsyn (TEMPLATE = xsyn_template,
           |RULES = '${rules.getAbsolutePath}', MATCHSYNONYMS = true)""".stripMargin)
      s.sql("""
        |SELECT lexed, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT array_join(ts_lexize('demo_int',
        |    CAST(event_id % 100000 AS STRING)), '') AS lexed FROM events)
        |GROUP BY lexed
        |UNION ALL
        |SELECT concat(w, '=', coalesce(
        |  array_join(ts_lexize('demo_xsyn', w), ' '), 'none')) AS lexed,
        |  CAST(1 AS BIGINT) AS n
        |FROM VALUES ('spark'), ('cluster'), ('parquet'), ('unknown') t(w)
        |""".stripMargin)
    }),

    // Thesaurus dictionary (src/backend/tsearch/dict_thesaurus.c):
    // multi-word sample phrases replaced by substitute lexemes with
    // longest-match scanning, '?' stopword wildcards and '*' as-is
    // substitutes; samples/inputs normalized through the english_stem
    // subdictionary. The fixture is the reference's own
    // thesaurus_sample.ths and the expected lexeme streams are pinned
    // from its tsdicts regress output (minus the synonym-dict step its
    // configuration chains in front).
    "q250_ts_thesaurus" -> ((s, d) => {
      graft.Tables.register(s, d)
      val dir = new java.io.File("target/tsdict_demo").getAbsoluteFile
      dir.mkdirs()
      val ths = new java.io.File(dir, "demo.ths")
      java.nio.file.Files.write(ths.toPath,
        ("# reference thesaurus_sample.ths content\n" +
          "one two three : *123\none two : *12\none : *1\ntwo : *2\n" +
          "supernovae stars : *sn\nsupernovae : *sn\n" +
          "booking tickets : order invitation cards\n" +
          "booking ? tickets : order invitation Cards\n").getBytes)
      graft.Graft.execute(s, "DROP TEXT SEARCH DICTIONARY IF EXISTS thes_demo")
      graft.Graft.execute(s,
        s"""CREATE TEXT SEARCH DICTIONARY thes_demo (TEMPLATE = thesaurus,
           |DictFile = '${ths.getAbsolutePath}', Dictionary = english_stem)"""
          .stripMargin)
      s.sql("""
        |SELECT id,
        |  array_join(ts_thesaurus_apply('thes_demo',
        |    filter(split(lower(phrase), '[^a-z0-9]+'), w -> w != '')),
        |    ' ') AS lexemes,
        |  coalesce(array_join(ts_lexize('thes_demo', probe), ' '), '∅')
        |    AS single
        |FROM VALUES
        |  (1, 'one postgres one two one two three one', 'one'),
        |  (2, 'Supernovae star is very new star and usually called supernovae (abbreviation SN)', 'two'),
        |  (3, 'Booking tickets is looking like a booking a tickets', 'booking')
        |  t(id, phrase, probe)
        |""".stripMargin)
    }),

    // Domain-blocklist filtering (C4/RefinedWeb shape): deterministic
    // synthetic URLs over documents, a blocklist carrying both an exact
    // host and a registrable parent domain (which must catch its
    // subdomains), exploded-suffix broadcast semi join. The oracle
    // replays the blocking predicate directly from the URL structure.
    "q240_domain_filter" -> ((s, d) => {
      graft.Tables.register(s, d)
      val docs = s.table("documents").select(col("doc_id"), col("source"))
        .withColumn("url", concat(lit("https://"),
          when(col("doc_id") % 5 === 0, lit("www.")).otherwise(lit("")),
          col("source"), lit(".example"), (col("doc_id") % 3).cast("string"),
          lit(".com/page/"), col("doc_id").cast("string")))
      val bl = s.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row("example1.com"),
          org.apache.spark.sql.Row("src4.example2.com")),
        StructType(Seq(StructField("domain", StringType))))
      TextAnalysis.domainBlocklistFilter(docs, "url", bl)
        .groupBy("source").agg(count(lit(1)).as("n"),
          sum(col("doc_id")).as("id_sum"))
    }),

    // Deterministic global shuffle (training-data epoch ordering): one
    // keyed repartition + local sort, never a global ORDER BY. The
    // oracle recomputes the md5 shuffle key per row — hash-exact means
    // the permutation is the declared pure function of (id, seed) and
    // no row was lost or duplicated by the exchange.
    "q238_shuffle" -> ((s, d) => {
      graft.Tables.register(s, d)
      TextAnalysis.deterministicShuffle(
        s.table("documents").select("doc_id"), seed = 7L)
        .select(col("doc_id"), col("shuffle_key"))
    }),

    // Salted hot-key join (AggregateWithSkew.mdp): a planted hot key —
    // every third order rerouted to customer 1 — joined through
    // Skew.saltedJoin. The oracle is the UNSALTED join: salting must be
    // result-identical, only the physical fan-out differs (plan assert
    // in PlanSpec).
    "q234_salted_join" -> ((s, d) => {
      graft.Tables.register(s, d)
      val large = s.table("orders").select(
        when(col("o_orderkey") % 3 === 0, lit(1L))
          .otherwise(col("o_custkey")).as("c_custkey"),
        col("o_totalprice"))
      val dim = s.table("customer").select("c_custkey", "c_mktsegment")
      graft.operators.Skew
        .saltedJoin(large, dim, "c_custkey", 8, Seq(col("o_totalprice")))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), Q.sumd(col("o_totalprice")).as("total"))
    }),

    // gp_toolkit skew diagnostics (gp_skew_coefficients): rows per
    // segment under the distribution key + the coefficient of
    // variation. A modulo segment function here so DuckDB can replay
    // it — the murmur variant is the same aggregation.
    "q227_skew_report" -> ((s, d) =>
      graft.operators.Distribution.skewReportBy(
        t(s, d, "orders"), pmod(col("o_custkey"), lit(32)))),

    // UPDATE ... FROM + DELETE ... USING (PG's join DML, gram.y
    // from_clause/using_clause): prices bumped by the matching rich
    // customer's balance, then poor customers' orders join-deleted; the
    // oracle replays both joins declaratively. The update join key is
    // unique (customer PK), so the multi-match pick rule never fires.
    "q226_join_dml" -> ((s, d) => {
      graft.Tables.register(s, d)
      s.sql("DROP TABLE IF EXISTS jdml_orders_rt")
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(wh, "jdml_orders_rt"))
      s.table("orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .write.saveAsTable("jdml_orders_rt")
      s.table("customer").where(col("c_acctbal") > 9000.0)
        .select("c_custkey", "c_acctbal")
        .createOrReplaceTempView("jdml_rich_cust")
      s.table("customer").where(col("c_acctbal") < 100.0)
        .select("c_custkey")
        .createOrReplaceTempView("jdml_poor_cust")
      graft.Graft.execute(s,
        "UPDATE jdml_orders_rt SET o_totalprice = o_totalprice + rc.c_acctbal " +
          "FROM jdml_rich_cust rc WHERE jdml_orders_rt.o_custkey = rc.c_custkey")
      graft.Graft.execute(s,
        "DELETE FROM jdml_orders_rt USING jdml_poor_cust pc " +
          "WHERE jdml_orders_rt.o_custkey = pc.c_custkey")
      s.table("jdml_orders_rt").groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("total"))
    }),

    // Perplexity quality filter (CCNet-shape, self-contained trigram
    // LM): train on the English slice, score every document — other
    // languages and garbled text surface as high perplexity. Model
    // floats are engine-defined → rows-only; the separation assertions
    // live in OperatorSpec.
    "q224_perplexity_filter" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val model = graft.operators.TextAnalysis.charLmTrain(
        docs.where(col("lang") === "en"))
      graft.operators.TextAnalysis.withPerplexity(docs, model)
        .select(col("doc_id"), col("lang"),
          round(col("perplexity"), 3).as("ppl"))
    }),

    // BPE tokenizer training + encoding (the published subword-merge
    // algorithm): ONE distributed word-count aggregation feeds a
    // driver-side merge loop over the bounded dictionary — the scale
    // shape production BPE trainers use — then the learned table
    // tokenizes the corpus per-row. Engine-defined output (no SQL
    // oracle can replay the merge recursion): rows-only here, the
    // known-answer + determinism assertions live in OperatorSpec.
    "q223_bpe_tokenize" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val merges = graft.operators.TextAnalysis.bpeTrain(docs, numMerges = 80)
      graft.operators.TextAnalysis.withBpeTokens(docs, merges)
        .select(col("doc_id"), size(col("bpe_tokens")).as("n_bpe"),
          col("n_chars"))
    }),

    // Bloom-filter decontamination (the at-scale variant of the exact
    // n-gram path): a bloom over the "benchmark" texts broadcasts to
    // the corpus scan, clean rows pass map-side, bloom-positives do
    // the exact anti join — same answer as NOT IN, no corpus shuffle.
    "q222_bloom_decontam" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val bench = docs.where(col("doc_id") % 13 === 0).select(col("text"))
      graft.operators.Dedup.bloomAntiJoin(docs, "text", bench, "text",
          expectedItems = 10000L)
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),

    // DO anonymous block end-to-end (ExecuteDoStmt → the PlDo
    // statement interpreter): procedural driver-side control flow
    // around distributed statements — a staging table built by dynamic
    // EXECUTE, filled by a FOR-over-query loop whose per-group INSERT
    // ... SELECT statements are whole distributed jobs. The oracle
    // re-derives the same rows declaratively.
    "q220_plpgsql_do" -> ((s, d) => {
      graft.Tables.register(s, d)
      graft.Graft.execute(s, "DROP TABLE IF EXISTS do_catalog_out")
      // a previous JVM's warehouse dir survives DROP (the table is no
      // longer in this session's in-memory catalog) — clear it
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(wh, "do_catalog_out"))
      graft.operators.PlDo.executeDo(s,
        """DO $$
          |DECLARE hi bigint;
          |BEGIN
          |  EXECUTE 'CREATE TABLE do_catalog_out (status text, bucket text, n bigint)';
          |  EXECUTE 'SELECT MAX(o_custkey) FROM orders' INTO hi;
          |  FOR r IN SELECT o_orderstatus AS st, COUNT(*) AS c FROM orders
          |           GROUP BY o_orderstatus LOOP
          |    IF r.c > 5000 THEN
          |      INSERT INTO do_catalog_out SELECT o_orderstatus, 'big', COUNT(*)
          |      FROM orders WHERE o_orderstatus = r.st AND o_custkey < hi / 2
          |      GROUP BY o_orderstatus;
          |    ELSE
          |      INSERT INTO do_catalog_out VALUES (r.st, 'small', r.c);
          |    END IF;
          |  END LOOP;
          |END $$;""".stripMargin)
      s.table("do_catalog_out")
    }),

    // execute: external protocol (url.c:37-47 dispatch, fileam.c:518):
    // a shell command runs once per segment with GRAFT_SEGMENT_ID set
    // (the reference exports GP_SEGMENT_ID the same way), its stdout
    // streamed and parsed as pipe-delimited text under the SREH reject
    // limit — two lines per segment are deliberately malformed and land
    // in the error log. The oracle re-derives the command's
    // deterministic output arithmetic in SQL.
    "q166_exec_source" -> ((s, d) => {
      val cmd = "j=0; while [ $j -lt 25 ]; do " +
        "if [ $((j % 10)) -eq 7 ]; then echo \"bad_line_${GRAFT_SEGMENT_ID}_${j}\"; " +
        "else echo \"$((GRAFT_SEGMENT_ID * 25 + j))|t$((j % 3))\"; fi; " +
        "j=$((j+1)); done"
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("tag", StringType)))
      val res = graft.sources.ExecSource.readCsv(s, cmd, schema,
        partitions = 4, rejectLimit = 10)
      res.good.groupBy("tag")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
    }),

    // gpfdist:// HTTP external table (url.c:37-47 dispatch → url_curl.c
    // segment-identifying headers; server src/bin/gpfdist/gpfdist.c):
    // write a deterministic pipe-delimited fixture, serve it over HTTP
    // with the gpfdist-equivalent FileDistServer, and load it through
    // WebSource with 4 segments — each segment GETs its disjoint
    // round-robin slice keyed by the X-GRAFT-SEGMENT-ID header, so the
    // union is exactly the file; malformed lines land in the SREH error
    // log. The oracle reads the same file bytes directly. The aggregate
    // is localCheckpoint'ed eagerly so the returned frame outlives the
    // server (matching "stop gpfdist after the load completes").
    "q194_web_external" -> ((s, d) => {
      val dir = new java.io.File("target/web_demo")
      dir.mkdirs()
      val f = new java.io.File(dir, "input.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try {
        (0 until 120).foreach { k =>
          if (k % 10 == 7) w.println(s"bad_line_$k")
          else w.println(s"$k|t${k % 3}")
        }
      } finally w.close()
      graft.sources.FileDistServer.withServer(dir.getAbsolutePath) { srv =>
        val schema = StructType(Seq(
          StructField("k", LongType), StructField("tag", StringType)))
        val res = graft.sources.WebSource.readCsv(s, Seq(srv.url("input.txt")),
          schema, partitions = 4, rejectLimit = 20)
        res.good.groupBy("tag")
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
          .localCheckpoint(true)
      }
    }),

    // Writable gpfdist external table (url_curl.c POST upload): each
    // partition streams its rows as one chunked POST to the
    // FileDistServer, which appends under a lock; the roundtrip reads
    // the uploaded file back and aggregates — the oracle aggregates
    // the source directly, so the upload must be lossless.
    "q201_web_writable" -> ((s, d) => {
      val dir = new java.io.File("target/web_write")
      dir.mkdirs()
      val f = new java.io.File(dir, "out.txt")
      if (f.exists()) f.delete() // POST appends; start clean each run
      graft.sources.FileDistServer.withServer(dir.getAbsolutePath) { srv =>
        graft.sources.WebSink.writeCsv(
          t(s, d, "orders").where(col("o_orderkey") % 100 === 0)
            .select(col("o_orderkey"), col("o_orderstatus")),
          srv.url("out.txt"))
      }
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_orderstatus", StringType)))
      s.read.schema(schema).option("sep", "|").csv(f.getAbsolutePath)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_k"))
    }),

    // Multimodal columns: REAL encoded payloads (ImageIO PNG/BMP/GIF +
    // 16-bit PCM WAV) decoded back through the actual codecs in one
    // batched mapPartitions pass; the oracle recomputes every dimension
    // and exact per-channel pixel/sample sum from doc_id arithmetic, so
    // a fake decode cannot pass.
    "q95_multimodal" -> ((s, d) => {
      val blobs = graft.operators.Multimodal.synthesizeMedia(t(s, d, "documents"))
      graft.operators.Multimodal.decodeMedia(blobs).toDF()
    }),

    // Image resize (training-pipeline "resize to model input"): REAL
    // ImageIO decode → deterministic nearest-neighbor remap → lossless
    // PNG re-encode → REAL re-decode to exact pixel sums. The oracle
    // recomputes the resized sums arithmetically: a target pixel is the
    // forced-white source (0,0) iff x*w/64 = 0 and y*h/48 = 0, so the
    // white count is ceil(64/w)*ceil(48/h) and the rest is solid fill.
    "q262_image_resize" -> ((s, d) => {
      val blobs = graft.operators.Multimodal.synthesizeMedia(
        t(s, d, "documents").where(col("doc_id") % 10 < 5))
      graft.operators.Multimodal.decodeMedia(
        graft.operators.Multimodal.resizeImages(blobs, 64, 48)).toDF()
        .select("id", "width", "height", "sum_r", "sum_g", "sum_b")
    }),

    // Audio resample to a fixed model-input length: real RIFF walk →
    // nearest-neighbor 16-bit PCM remap → WAV re-encode → real
    // re-decode to the exact sample sum. The oracle replays the
    // resampled signal arithmetically: sample i of the output is
    // source sample i*n/512 (integer division).
    "q263_audio_resample" -> ((s, d) => {
      val blobs = graft.operators.Multimodal.synthesizeMedia(
        t(s, d, "documents").where(col("doc_id") % 10 < 5))
      graft.operators.Multimodal.decodeMedia(
        graft.operators.Multimodal.resampleAudio(blobs, 512)).toDF()
        .select("id", "n_px", "sum_r")
    }),

    // URL canonicalization + URL-level dedup (C4/RefinedWeb/FineWeb):
    // deterministic messy URLs (mixed-case www hosts, default ports,
    // tracking params, fragments) whose canonical form the oracle
    // computes directly from doc_id arithmetic — the normalizer must
    // strip every decoration exactly to match.
    "q264_url_dedup" -> ((s, d) => {
      graft.Tables.register(s, d)
      val id = col("doc_id")
      val scheme = when(id % 2 === 0, lit("http")).otherwise(lit("https"))
      val host = concat(
        when(id % 7 === 0, lit("WWW.Site")).otherwise(lit("site")),
        (id % 3).cast("string"), lit(".example.com"))
      val port = when(id % 11 === 0,
        when(id % 2 === 0, lit(":80")).otherwise(lit(":443")))
        .otherwise(lit(""))
      val qs = when(id % 3 === 0,
        concat(lit("?utm_source=x&q="), (id % 5).cast("string")))
        .otherwise(concat(lit("?q="), (id % 5).cast("string")))
      val frag = when(id % 5 === 0, lit("#frag")).otherwise(lit(""))
      val url = concat(scheme, lit("://"), host, port, lit("/p/"),
        (id % 100).cast("string"), qs, frag)
      graft.operators.TextAnalysis.urlDedup(
        s.table("documents").select(id, url.as("url")), "url")
    }),

    // Video frame sampling: GVID containers of REAL BMP frames; every
    // 3rd frame is decoded through the actual codec (others skipped by
    // length, never decoded) — the strided-decode pattern of a video
    // training pipeline. The oracle recomputes every sampled frame's
    // exact per-channel pixel sums from doc_id arithmetic.
    "q211_video_frames" -> ((s, d) => {
      val blobs = graft.operators.Multimodal.synthesizeVideo(
        t(s, d, "documents").where(col("doc_id") % 20 === 0))
      graft.operators.Multimodal.sampleVideoFrames(blobs, stride = 3).toDF()
    }),

    // COPY TO/FROM roundtrip (commands/copy.c): write CSV, read it back,
    // aggregate — oracle aggregates the source table directly, so the
    // roundtrip must be lossless.
    "q94_copy_roundtrip" -> ((s, d) => {
      val out = "target/copy_demo"
      t(s, d, "lineitem")
        .where(col("l_quantity") > 40)
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
        .write.mode("overwrite").option("header", "true").csv(out)
      val schema = StructType(Seq(
        StructField("l_orderkey", LongType), StructField("l_quantity", DoubleType),
        StructField("l_extendedprice", DoubleType), StructField("l_returnflag", StringType)))
      s.read.option("header", "true").schema(schema).csv(out)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"),
          sumd(col("l_extendedprice")).as("sum_price"))
    }),

    // COPY ... WITH (DELIMITER '|', NULL 'NA', HEADER) — the Greengage
    // COPY option surface (copy.c): pipe-delimited export with an
    // explicit null token, read back with the same options; nulls
    // planted via NULLIF must survive the roundtrip.
    "q117_copy_options" -> ((s, d) => {
      val out = "target/copy_opts_demo"
      t(s, d, "customer")
        .select(col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
          col("c_acctbal"))
        .write.mode("overwrite")
        .option("header", "true").option("sep", "|").option("nullValue", "NA")
        .csv(out)
      val schema = StructType(Seq(
        StructField("c_custkey", LongType), StructField("seg", StringType),
        StructField("c_acctbal", DoubleType)))
      s.read.option("header", "true").option("sep", "|").option("nullValue", "NA")
        .schema(schema).csv(out)
        .groupBy("seg")
        .agg(count(lit(1)).as("n"), sumd(col("c_acctbal")).as("bal"))
    }),

    // WRITABLE external table (gpfdist-writable analog): the DSv2 batch
    // sink streams each partition to its own delimited text file, the
    // CSV reader loads it back, and the oracle aggregates the source —
    // the write path must be lossless (Double.toString round-trips
    // exactly; NULLs travel as \N).
    "q128_writable_external" -> ((s, d) => {
      val out = "target/ext_sink_demo"
      t(s, d, "supplier")
        .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
          col("s_acctbal"))
        .repartition(4)
        .write.format("graft.sources.ExtSink").mode("overwrite")
        .option("path", out).option("delimiter", "|").save()
      val schema = StructType(Seq(
        StructField("s_suppkey", LongType), StructField("s_name", StringType),
        StructField("s_acctbal", DoubleType)))
      s.read.option("sep", "|").option("nullValue", "\\N").schema(schema)
        .csv(out)
        .agg(count(lit(1)).as("n"), sumd(col("s_acctbal")).as("bal"),
          sum(length(col("s_name"))).as("name_chars"))
    }),

    // ForeignScan/FDW roundtrip (nodeForeignscan.c): dim shipped to a
    // REAL in-JVM JDBC endpoint (Derby in-memory), read back as a
    // foreign table, aggregated — oracle aggregates the source, so the
    // foreign roundtrip must be lossless.
    "q115_foreign_jdbc" -> ((s, d) => {
      val url = "jdbc:derby:memory:graft_q115;create=true"
      t(s, d, "nation").write.mode("overwrite")
        .jdbc(url, "nation_ext", new java.util.Properties())
      graft.sources.Foreign.jdbcTable(s, url, "nation_ext")
        .toDF("n_nationkey", "n_name", "n_regionkey") // derby case-folds names
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n_nations"),
          sum(length(col("n_name"))).as("name_chars"))
    }),

    // UPDATE/DELETE via snapshot rewrite (heapam.c analog): delete the
    // 'P' orders, raise big orders' price, aggregate — the oracle
    // replays the same DML as SQL over the source, so the rewrite must
    // be lossless and must apply old-row semantics.
    "q130_dml" -> ((s, d) => {
      graft.Tables.register(s, d)
      s.sql("DROP TABLE IF EXISTS dml_orders_rt")
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(wh, "dml_orders_rt"))
      s.table("orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.saveAsTable("dml_orders_rt")
      graft.operators.Dml.deleteWhere(s, "dml_orders_rt",
        col("o_orderstatus") === "P")
      graft.operators.Dml.updateWhere(s, "dml_orders_rt",
        col("o_totalprice") > 200000.0,
        Map("o_totalprice" -> (col("o_totalprice") + lit(1000.0d))))
      s.table("dml_orders_rt").groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("total"))
    }),

    // MERGE (SQL:2003 / PG 15 verb over the same ModifyTable machinery):
    // urgent thirds get a price bump, matched 'P' rows are deleted,
    // unmatched synthetic source rows insert with NULL non-source
    // columns — the oracle replays the same three-way split in SQL.
    "q172_merge" -> ((s, d) => {
      graft.Tables.register(s, d)
      s.sql("DROP TABLE IF EXISTS merge_orders_rt")
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(wh, "merge_orders_rt"))
      s.table("orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.saveAsTable("merge_orders_rt")
      val src = s.table("orders").where(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), lit(500.0d).as("bump"))
        .unionByName(s.table("orders").where(col("o_orderkey") % 1000 === 0)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            lit(0.0d).as("bump")))
      graft.operators.Dml.merge(s, "merge_orders_rt", src, Seq("o_orderkey"),
        whenMatchedUpdate = Map(
          "o_totalprice" -> (col("t.o_totalprice") + col("s.bump"))),
        whenMatchedDeleteIf = Some(col("t.o_orderstatus") === "P"))
      s.table("merge_orders_rt").groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("total"))
    }),

    // INSERT ... ON CONFLICT (key) DO UPDATE (PG 9.5 upsert): matched
    // rows take the source's values wholesale, unmatched insert — the
    // MERGE special case, replayed by the oracle in SQL.
    "q174_upsert" -> ((s, d) => {
      graft.Tables.register(s, d)
      s.sql("DROP TABLE IF EXISTS upsert_cust_rt")
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(wh, "upsert_cust_rt"))
      s.table("customer").select("c_custkey", "c_mktsegment", "c_acctbal")
        .write.saveAsTable("upsert_cust_rt")
      val src = s.table("customer").where(col("c_custkey") % 5 === 0)
        .select(col("c_custkey"), lit("UPSERTED").as("c_mktsegment"),
          (col("c_acctbal") + 1000.0d).as("c_acctbal"))
        .unionByName(s.table("customer").where(col("c_custkey") % 500 === 0)
          .select((col("c_custkey") + 10000000L).as("c_custkey"),
            lit("NEWROW").as("c_mktsegment"), lit(0.0d).as("c_acctbal")))
      graft.operators.Dml.upsert(s, "upsert_cust_rt", src, Seq("c_custkey"))
      s.table("upsert_cust_rt").groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sumd(col("c_acctbal")).as("bal"))
    }),

    // Matryoshka-style truncated retrieval (Kusupati et al., NeurIPS
    // 2022: nested-prefix embeddings let retrieval run on a dimension
    // budget): exact top-5 on the 16-dim prefix vs the full 64 dims,
    // reported as per-query overlap — the quality/cost tradeoff a
    // dimension-adaptive ANN pipeline measures before committing to a
    // prefix length. Both sides deterministic (cos desc, id tiebreak),
    // so the overlap is exact and the oracle replays it.
    "q191_mrl_truncated" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val t16 = emb.withColumn("embedding", slice(col("embedding"), 1, 16))
      val full = Knn.bruteForceTopK(emb, emb.where(col("vec_id") < 10), k = 5)
      val trunc = Knn.bruteForceTopK(t16, t16.where(col("vec_id") < 10), k = 5)
      full.alias("f").join(trunc.alias("t"),
          col("f.query_id") === col("t.query_id") &&
            col("f.neighbor_id") === col("t.neighbor_id"), "left_outer")
        .groupBy(col("f.query_id").as("query_id"))
        .agg(count(col("t.neighbor_id")).as("n_overlap"))
    }),

    // Windowed audio energy (training-pipeline level/silence signals):
    // exact per-window sum-of-squares + peak over the REAL PCM bytes;
    // the oracle replays the synthesis arithmetic per window.
    "q190_audio_energy" -> ((s, d) => {
      val media = graft.operators.Multimodal.synthesizeMedia(
        t(s, d, "documents"))
      graft.operators.Multimodal.audioWindows(media, windowSamples = 400)
        .toDF()
        .select(col("id"), col("win"), col("n"), col("sum_sq"), col("peak"),
          round(sqrt(col("sum_sq").cast("double") / col("n").cast("double")), 6)
            .as("rms"))
    }),

    // Z-order clustering (the btree/bitmap-index replacement, SURVEY §2
    // index row): orders clustered on the (o_custkey, o_totalprice)
    // Morton key, then a 2-d box query — the layout must be lossless
    // (oracle runs the same box over the source), and ZOrderSpec
    // asserts the row-group pruning win the layout exists for.
    "q186_zorder" -> ((s, d) => {
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
      val path = s"$wh/zorder_orders_rt"
      graft.operators.ZOrder.writeZOrdered(
        t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        path, Seq("o_custkey", "o_totalprice"))
      s.read.parquet(path)
        .where(col("o_custkey").between(100, 300) &&
          col("o_totalprice") < 150000.0)
        .groupBy((col("o_custkey") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("total"))
    }),

    // Partition maintenance (gram.y:3343 alter_table_partition_cmd):
    // a LIST-partitioned table gets the full ETL verb set — EXCHANGE
    // swaps a staged load with the '1-URGENT' partition (both
    // directions), TRUNCATE empties '5-LOW', DROP removes
    // '4-NOT SPECIFIED', ADD creates an empty partition. The oracle
    // replays the verbs as set algebra over the source, and aggregates
    // BOTH sides of the exchange — so the two-way swap must be lossless.
    "q177_partition_maint" -> ((s, d) => {
      graft.Tables.register(s, d)
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      for (tbl <- Seq("pmaint_orders_rt", "pmaint_stage_rt")) {
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        rm(new java.io.File(wh, tbl))
      }
      graft.operators.GreengageDdl.execute(s,
        """CREATE TABLE pmaint_orders_rt (
          |  o_orderkey bigint, o_totalprice double precision,
          |  o_orderpriority text)
          |DISTRIBUTED RANDOMLY
          |PARTITION BY LIST (o_orderpriority)""".stripMargin)
      s.sql("INSERT INTO pmaint_orders_rt " +
        "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders")
      s.table("orders").where(col("o_orderpriority") === "1-URGENT")
        .select((col("o_orderkey") + 50000000L).as("o_orderkey"),
          (col("o_totalprice") + 10000.0d).as("o_totalprice"),
          col("o_orderpriority"))
        .write.saveAsTable("pmaint_stage_rt")
      import graft.operators.GreengageDdl.alterPartition
      alterPartition(s, "ALTER TABLE pmaint_orders_rt EXCHANGE PARTITION " +
        "FOR ('1-URGENT') WITH TABLE pmaint_stage_rt")
      alterPartition(s,
        "ALTER TABLE pmaint_orders_rt TRUNCATE PARTITION FOR ('5-LOW')")
      alterPartition(s,
        "ALTER TABLE pmaint_orders_rt DROP PARTITION FOR ('4-NOT SPECIFIED')")
      alterPartition(s,
        "ALTER TABLE pmaint_orders_rt ADD PARTITION FOR ('9-EMPTY')")
      val tAgg = s.table("pmaint_orders_rt").groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("total"))
        .select(lit("t").as("src"), col("o_orderpriority"), col("n"),
          col("total"))
      val sAgg = s.table("pmaint_stage_rt").groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("total"))
        .select(lit("s").as("src"), col("o_orderpriority"), col("n"),
          col("total"))
      tAgg.unionByName(sAgg)
    }),

    // Greengage DDL surface (gram.y:4835): user DDL text -> bucketed
    // catalog table -> query it; oracle aggregates the source directly,
    // so the DDL round-trip must be lossless.
    "q107_ddl_roundtrip" -> ((s, d) => {
      graft.Tables.register(s, d)
      s.sql("DROP TABLE IF EXISTS ddl_orders_rt")
      // a fresh session's in-memory catalog doesn't know the table from a
      // prior run, so DROP alone leaves the managed location behind
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(wh, "ddl_orders_rt"))
      graft.operators.GreengageDdl.execute(s,
        """CREATE TABLE ddl_orders_rt AS
          |SELECT o_custkey, o_totalprice, o_orderstatus FROM orders
          |DISTRIBUTED BY (o_custkey)""".stripMargin, buckets = 8)
      s.table("ddl_orders_rt").groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("total"))
    }),

    // Sparse vector (gpcontrib/gp_sparse_vector: RLE svec type +
    // operators/norms + the gp_extract_feature_histogram featurizer).
    // Each document is featurized over a fixed 12-term dictionary into an
    // RLE svec; every measure below is computed RUN-DIRECT on the sparse
    // form (no dense materialization — SparseData.c's run-at-a-time
    // loops). Counts are small integers, so the run folds are exact and
    // hash-exact vs the oracle's per-term list arithmetic. dim pins the
    // RLE bookkeeping: Σ cnt must equal the dictionary size.
    "q139_svec" -> ((s, d) => {
      import graft.functions.Svec._
      val dict = Seq("join", "hash", "row", "batch", "scan", "column",
        "filter", "table", "vector", "stream", "spark", "query")
      t(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        // each derived array is its own column before the next references
        // it inside a lambda (re-eval rule, as in q131)
        .withColumn("dense", featureCounts(dict, col("words")))
        .withColumn("bs", boundaries(col("dense")))
        .withColumn("sv", compressOf(col("dense"), col("bs")))
        .select(col("doc_id"),
          dimension(col("sv")).as("dim"),
          countNonzero(col("sv")).as("nnz"),
          vecSum(col("sv")).as("vsum"),
          l1norm(col("sv")).as("l1"),
          l2norm(col("sv")).as("l2"),
          vecSum(scalarMult(col("sv"), lit(3.0d))).as("vsum_x3"))
    }),

    // Materialized view lifecycle (reference commands/matview.c; gram.y
    // CREATE/REFRESH MATERIALIZED VIEW). The matview is created over a
    // low-quantity seed subset, the rest of lineitem is loaded afterwards,
    // and REFRESH re-runs the stored defining query — so the final
    // content equals the full-table aggregate ONLY if refresh really
    // re-executed (the initial snapshot covers ~half the rows).
    "q140_matview" -> ((s, d) => {
      graft.Tables.register(s, d)
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      Seq("mv_src", "mv_rev").foreach { tbl =>
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        rm(new java.io.File(wh, tbl))
      }
      s.sql("""CREATE TABLE mv_src USING parquet AS
              |SELECT * FROM lineitem WHERE l_quantity <= 25""".stripMargin)
      graft.operators.GreengageDdl.execute(s,
        """CREATE MATERIALIZED VIEW mv_rev AS
          |SELECT l_returnflag, COUNT(*) AS n,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          |FROM mv_src GROUP BY l_returnflag
          |DISTRIBUTED RANDOMLY""".stripMargin)
      s.sql("INSERT INTO mv_src SELECT * FROM lineitem WHERE l_quantity > 25")
      graft.operators.GreengageDdl.refreshMaterializedView(s, "mv_rev")
      s.table("mv_rev")
    })
  )

  private val shingleSql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |sh AS (SELECT doc_id,
      |  CASE WHEN len(words) >= 3 THEN
      |    list_distinct(list_transform(range(1, len(words) - 1),
      |      i -> words[CAST(i AS INT)] || ' ' || words[CAST(i AS INT)+1] || ' ' || words[CAST(i AS INT)+2]))
      |  ELSE [array_to_string(words, ' ')] END AS s
      |  FROM w)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q80_dedup_exact" ->
      """SELECT md5(text) AS content_hash, COUNT(*) AS n_copies,
        |       MIN(doc_id) AS keeper_id
        |FROM documents GROUP BY 1""".stripMargin,
    "q81_neardup_lsh" ->
      s"""$shingleSql
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(len(list_filter(a.s, g -> list_contains(b.s, g))) AS DOUBLE) /
         |  CAST(len(a.s) + len(b.s) - len(list_filter(a.s, g -> list_contains(b.s, g))) AS DOUBLE) AS jaccard
         |FROM sh a, sh b
         |WHERE a.doc_id < b.doc_id
         |  AND CAST(len(list_filter(a.s, g -> list_contains(b.s, g))) AS DOUBLE) /
         |      CAST(len(a.s) + len(b.s) - len(list_filter(a.s, g -> list_contains(b.s, g))) AS DOUBLE) >= 0.8""".stripMargin,
    "q100_dedup_components" ->
      s"""${shingleSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |jac AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM sh a, sh b
         |  WHERE a.doc_id < b.doc_id
         |    AND CAST(len(list_filter(a.s, g -> list_contains(b.s, g))) AS DOUBLE) /
         |        CAST(len(a.s) + len(b.s) - len(list_filter(a.s, g -> list_contains(b.s, g))) AS DOUBLE) >= 0.8),
         |edges AS (SELECT a, b FROM jac UNION SELECT b, a FROM jac),
         |reach(src, dst) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
         |SELECT src AS doc_id, MIN(dst) AS component,
         |       (MIN(dst) = src) AS is_keeper
         |FROM reach GROUP BY src""".stripMargin,
    "q83_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
        |FROM documents""".stripMargin,
    "q84_lang_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_chars,
        |  CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY lang""".stripMargin,
    "q179_repetition_signals" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |g AS (
        |  SELECT doc_id, 1 AS n, unnest(words) AS gram FROM w
        |  UNION ALL
        |  SELECT doc_id, 2, unnest(CASE WHEN len(words) >= 2 THEN
        |    list_transform(range(1, len(words)), i ->
        |      words[CAST(i AS INT)] || ' ' || words[CAST(i AS INT) + 1])
        |    ELSE [] END) FROM w
        |  UNION ALL
        |  SELECT doc_id, 3, unnest(CASE WHEN len(words) >= 3 THEN
        |    list_transform(range(1, len(words) - 1), i ->
        |      words[CAST(i AS INT)] || ' ' || words[CAST(i AS INT) + 1]
        |        || ' ' || words[CAST(i AS INT) + 2])
        |    ELSE [] END) FROM w),
        |c AS (SELECT doc_id, n, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2, 3),
        |a AS (SELECT doc_id, n, SUM(cnt) AS total, MAX(cnt) AS maxc,
        |  COUNT(*) AS dist FROM c GROUP BY 1, 2)
        |SELECT doc_id,
        |  ROUND(CAST(MAX(CASE WHEN n = 1 THEN maxc END) AS DOUBLE)
        |    / CAST(MAX(CASE WHEN n = 1 THEN total END) AS DOUBLE), 6)
        |    AS top_word_frac,
        |  ROUND(COALESCE(1.0 - CAST(MAX(CASE WHEN n = 2 THEN dist END) AS DOUBLE)
        |    / CAST(MAX(CASE WHEN n = 2 THEN total END) AS DOUBLE), 0.0), 6)
        |    AS dup_bigram_frac,
        |  ROUND(COALESCE(1.0 - CAST(MAX(CASE WHEN n = 3 THEN dist END) AS DOUBLE)
        |    / CAST(MAX(CASE WHEN n = 3 THEN total END) AS DOUBLE), 0.0), 6)
        |    AS dup_trigram_frac
        |FROM a GROUP BY doc_id""".stripMargin,
    "q110_tfidf" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY doc_id, term),
        |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY term),
        |nn AS (SELECT COUNT(*) AS n FROM documents)
        |SELECT doc_id, term, tf, df,
        |  ROUND(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tfidf
        |FROM tf JOIN dfreq USING (term), nn
        |WHERE length(term) > 3 AND tf >= 2""".stripMargin,
    // planted disjoint-vocabulary fixture: every decision replayable
    // from doc_id alone (prior ties documented label-asc -> 'bad')
    "q254_quality_filter" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'good' ELSE 'bad' END
        |    AS quality_label,
        |  (doc_id % 3 = 0) AS keep
        |FROM documents""".stripMargin,
    "q85_quality_score" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        |    length(text) AS n_chars_x,
        |    length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g')) AS n_punct,
        |    len(list_filter(string_split(text,' '), x -> x = 'the'))
        |      + len(list_filter(string_split(text,' '), x -> x = 'and'))
        |      + len(list_filter(string_split(text,' '), x -> x = 'of'))
        |      + len(list_filter(string_split(text,' '), x -> x = 'to'))
        |      + len(list_filter(string_split(text,' '), x -> x = 'a'))
        |      + len(list_filter(string_split(text,' '), x -> x = 'in'))
        |      + len(list_filter(string_split(text,' '), x -> x = 'is'))
        |      + len(list_filter(string_split(text,' '), x -> x = 'that'))
        |      + len(list_filter(string_split(text,' '), x -> x = 'with'))
        |      + len(list_filter(string_split(text,' '), x -> x = 'for')) AS n_stop
        |  FROM documents)
        |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
        |  CASE WHEN n_tokens > 0 THEN CAST(n_chars_x AS DOUBLE)/CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS avg_token_len,
        |  CASE WHEN n_chars_x > 0 THEN CAST(n_punct AS DOUBLE)/CAST(n_chars_x AS DOUBLE) ELSE 0.0 END AS punct_ratio,
        |  CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS stopword_ratio,
        |  LEAST(1.0, CAST(n_tokens AS DOUBLE)/400.0) * 0.4
        |    + (CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) ELSE 0.0 END) * 2.0
        |    + (1.0 - CASE WHEN n_chars_x > 0 THEN CAST(n_punct AS DOUBLE)/CAST(n_chars_x AS DOUBLE) ELSE 0.0 END) * 0.2 AS quality_score
        |FROM f""".stripMargin,
    "q87_token_count" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS INT) AS n_tokens
        |FROM documents""".stripMargin,
    "q198_split" ->
      """SELECT doc_id,
        |  CASE WHEN h < 0.9 THEN 'train'
        |       WHEN h < 0.95 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
        |    / 65536.0 AS h
        |  FROM documents)""".stripMargin,
    "q199_pack_contexts" ->
      """WITH b AS (SELECT doc_id, CAST(doc_id % 32 AS INT) AS shard,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |      AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY shard
        |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM b)
        |SELECT doc_id, shard, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS chunk_first,
        |  CAST(CASE WHEN n_tokens > 0 THEN (cum - 1) // 512
        |       ELSE (cum - n_tokens) // 512 END AS BIGINT) AS chunk_last
        |FROM c""".stripMargin,
    "q211_video_frames" ->
      """WITH v AS (SELECT doc_id, CAST(4 + doc_id % 9 AS INT) AS n,
        |    CAST(16 + doc_id % 16 AS INT) AS w, CAST(8 + doc_id % 8 AS INT) AS h
        |  FROM documents WHERE doc_id % 20 = 0),
        |f AS (SELECT doc_id, w, h,
        |    CAST(unnest(range(0, n, 3)) AS INT) AS frame_idx FROM v)
        |SELECT doc_id AS id, frame_idx, w AS width, h AS height,
        |  CAST(((doc_id * 3 + frame_idx * 17) % 251) * w * h AS BIGINT) AS sum_r,
        |  CAST(((doc_id * 7 + frame_idx * 29) % 251) * w * h AS BIGINT) AS sum_g,
        |  CAST(((doc_id * 13 + frame_idx * 41) % 251) * w * h AS BIGINT) AS sum_b
        |FROM f""".stripMargin,
    "q209_weighted_sample" ->
      """SELECT doc_id, lang
        |FROM (SELECT doc_id, lang,
        |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
        |    / 65536.0 AS h
        |  FROM documents)
        |WHERE h < CASE lang WHEN 'en' THEN 0.9 WHEN 'fr' THEN 0.5
        |  WHEN 'es' THEN 0.25 WHEN 'de' THEN 0.1 WHEN 'zh' THEN 0.05
        |  ELSE 0.0 END""".stripMargin,
    "q210_decontaminate" ->
      """WITH w AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 11),
        |    i -> array_to_string(ws[CAST(i AS INT):CAST(i + 12 AS INT)], ' ')))
        |    AS gram
        |  FROM w WHERE len(ws) >= 13)
        |SELECT DISTINCT t.doc_id AS train_id, b.doc_id AS bench_id
        |FROM g t JOIN g b USING (gram)
        |WHERE b.doc_id % 37 = 0""".stripMargin,
    "q200_pii_scrub" ->
      """SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
        |  text || ' contact user' || doc_id || '@example.com from 10.'
        |    || (doc_id % 256) || '.0.1 call +1-555-' || (1000 + doc_id % 9000),
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |  '\+\d[\d-]{7,14}\d', '<PHONE>', 'g') AS scrubbed
        |FROM documents""".stripMargin,
    "q88_knn_brute" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
        |s AS (
        |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(q.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)))
        |    / (SQRT(list_sum(list_transform(range(1, 65),
        |         i -> CAST(q.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(q.embedding[CAST(i AS INT)] AS DOUBLE))))
        |     * SQRT(list_sum(list_transform(range(1, 65),
        |         i -> CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)))))
        |    AS cos_sim
        |  FROM q, embeddings e WHERE q.vec_id <> e.vec_id)
        |SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS INT) AS rnk FROM (
        |  SELECT query_id, neighbor_id, cos_sim,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
        |  FROM s)
        |WHERE rnk <= 5""".stripMargin,
    "q90_embed_norms" ->
      """SELECT vec_id, label,
        |  SQRT(list_sum(list_transform(range(1, 65),
        |    i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE) * CAST(embedding[CAST(i AS INT)] AS DOUBLE)))) AS l2_norm
        |FROM embeddings""".stripMargin,
    "q91_stream_tumbling" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS w_start,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q96_stream_sliding" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events),
        |w AS (SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS w_start FROM e
        |      UNION ALL
        |      SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE FROM e)
        |SELECT w_start, COUNT(*) AS n_events FROM w GROUP BY w_start""".stripMargin,
    "q92_stream_session" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |m AS (SELECT user_id, ts,
        |  CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) < INTERVAL 10 MINUTE
        |       THEN 0 ELSE 1 END AS new_s FROM e),
        |g AS (SELECT user_id, ts,
        |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT MIN(ts) AS s_start, MAX(ts) + INTERVAL 10 MINUTE AS s_end,
        |       user_id, COUNT(*) AS n_events
        |FROM g GROUP BY user_id, sid""".stripMargin,
    "q102_stream_stateful" ->
      """SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id""",
    "q98_stream_dedup" ->
      """SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
        |FROM events GROUP BY event_type""".stripMargin,
    "q118_stream_stream_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                 CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT c.event_id AS c_id, p.event_id AS p_id, c.user_id,
        |       c.ts AS c_ts, p.ts AS p_ts
        |FROM e c JOIN e p ON c.user_id = p.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE""".stripMargin,
    "q136_stream_full_outer" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                 CAST(ts AS TIMESTAMP) AS ts FROM events),
        |c AS (SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
        |      FROM e WHERE event_type = 'purchase')
        |SELECT c_id, p_id, COALESCE(c_user, p_user) AS user_id, c_ts, p_ts
        |FROM c FULL JOIN p ON c_user = p_user
        |  AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTE""".stripMargin,
    "q99_stream_static_join" ->
      """WITH dim(event_type, category) AS (VALUES
        |  ('click','engagement'), ('view','engagement'),
        |  ('purchase','revenue'), ('signup','growth'), ('error','ops'))
        |SELECT category, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events JOIN dim USING (event_type)
        |GROUP BY category""".stripMargin,
    "q97_sessionize_custom" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |m AS (SELECT user_id, ts,
        |  CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) < INTERVAL 10 MINUTE
        |       THEN 0 ELSE 1 END AS new_s FROM e),
        |g AS (SELECT user_id, ts,
        |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT MIN(ts) AS s_start, MAX(ts) + INTERVAL 10 MINUTE AS s_end,
        |       user_id, COUNT(*) AS n_events
        |FROM g GROUP BY user_id, sid""".stripMargin,
    "q264_url_dedup" ->
      """WITH c AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
        |  || '://site' || CAST(doc_id % 3 AS VARCHAR) || '.example.com/p/'
        |  || CAST(doc_id % 100 AS VARCHAR) || '?q=' || CAST(doc_id % 5 AS VARCHAR)
        |  AS canonical_url
        |FROM documents)
        |SELECT canonical_url, count(*) AS n_docs, min(doc_id) AS keep_id
        |FROM c GROUP BY canonical_url""".stripMargin,
    "q263_audio_resample" ->
      """SELECT doc_id AS id, CAST(512 AS BIGINT) AS n_px,
        |  CAST(list_sum(list_transform(range(0, 512),
        |    i -> (doc_id + 37 * ((i * (800 + doc_id % 256)) // 512))
        |         % 2003 - 1001)) AS BIGINT) AS sum_r
        |FROM documents WHERE doc_id % 10 < 5 AND doc_id % 4 = 3""".stripMargin,
    "q262_image_resize" ->
      """WITH m AS (SELECT doc_id AS id,
        |  16 + doc_id % 64 AS w, 16 + doc_id % 48 AS h,
        |  doc_id % 251 AS r, (doc_id * 7) % 251 AS g, (doc_id * 13) % 251 AS b
        |FROM documents WHERE doc_id % 10 < 5 AND doc_id % 4 <> 3),
        |n AS (SELECT *,
        |  ((64 + w - 1) // w) * ((48 + h - 1) // h) AS nw FROM m)
        |SELECT id, CAST(64 AS INTEGER) AS width, CAST(48 AS INTEGER) AS height,
        |  CAST((64*48 - nw) * r + nw * 255 AS BIGINT) AS sum_r,
        |  CAST((64*48 - nw) * g + nw * 255 AS BIGINT) AS sum_g,
        |  CAST((64*48 - nw) * b + nw * 255 AS BIGINT) AS sum_b
        |FROM n""".stripMargin,
    "q95_multimodal" ->
      """WITH m AS (SELECT doc_id AS id, doc_id % 4 AS fmt,
        |  16 + doc_id % 64 AS w, 16 + doc_id % 48 AS h,
        |  doc_id % 251 AS r, (doc_id * 7) % 251 AS g, (doc_id * 13) % 251 AS b,
        |  800 + doc_id % 256 AS ns
        |FROM documents)
        |SELECT id,
        |  CASE fmt WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' WHEN 2 THEN 'gif'
        |           ELSE 'wav' END AS format,
        |  CAST(CASE WHEN fmt = 3 THEN ns ELSE w END AS INTEGER) AS width,
        |  CAST(CASE WHEN fmt = 3 THEN 1 ELSE h END AS INTEGER) AS height,
        |  CAST(CASE WHEN fmt = 3 THEN 1 ELSE 3 END AS INTEGER) AS channels,
        |  CAST(CASE WHEN fmt = 3 THEN ns ELSE w * h END AS BIGINT) AS n_px,
        |  CAST(CASE WHEN fmt = 3
        |       THEN list_sum(list_transform(range(0, ns), i -> (id + 37 * i) % 2003 - 1001))
        |       ELSE r * (w * h - 1) + 255 END AS BIGINT) AS sum_r,
        |  CAST(CASE WHEN fmt = 3 THEN 0 ELSE g * (w * h - 1) + 255 END AS BIGINT) AS sum_g,
        |  CAST(CASE WHEN fmt = 3 THEN 0 ELSE b * (w * h - 1) + 255 END AS BIGINT) AS sum_b
        |FROM m""".stripMargin,
    // the CDC loop's fixpoint, declaratively: latest event per user
    // with the full (ts, event_id) tiebreak
    "q229_stream_cdc" ->
      """WITH latest AS (
        |  SELECT user_id, event_type AS last_type, value AS last_value,
        |    event_id AS last_event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, last_type, last_value, last_event_id
        |FROM latest WHERE rn = 1""".stripMargin,
    // per-segment counts are exact ints; the coefficient rounds to 4dp
    "q227_skew_report" ->
      """WITH seg AS (SELECT o_custkey % 32 AS segment, COUNT(*) AS n
        |             FROM orders GROUP BY 1)
        |SELECT ROUND(stddev_pop(n) / avg(n) * 100.0, 4) AS skew_coeff_pct,
        |  MIN(n) AS min_rows, MAX(n) AS max_rows, COUNT(*) AS segments_hit
        |FROM seg""".stripMargin,
    // the join DML replayed declaratively: LEFT JOIN applies the
    // update where matched, NOT IN applies the delete
    "q226_join_dml" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN c.c_custkey IS NOT NULL
        |         THEN o_totalprice + c.c_acctbal ELSE o_totalprice END AS p
        |  FROM orders LEFT JOIN
        |    (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000.0) c
        |    ON o_custkey = c.c_custkey),
        |del AS (SELECT * FROM upd WHERE o_custkey NOT IN
        |        (SELECT c_custkey FROM customer WHERE c_acctbal < 100.0))
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM del GROUP BY 1""".stripMargin,
    // bloom pruning is exact after candidate verification → plain NOT IN
    "q222_bloom_decontam" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE text NOT IN (SELECT text FROM documents WHERE doc_id % 13 = 0)""".stripMargin,
    // declarative image of the DO block's procedural loop: big groups
    // re-counted under the custkey cut, small groups passed through
    "q220_plpgsql_do" ->
      """WITH g AS (SELECT o_orderstatus AS st, COUNT(*) AS c
        |           FROM orders GROUP BY 1),
        |     hi AS (SELECT MAX(o_custkey) AS h FROM orders)
        |SELECT st AS status, 'big' AS bucket,
        |  (SELECT COUNT(*) FROM orders, hi
        |   -- PG int division truncates (int8div): the engine is
        |   -- faithful to it, so the oracle floors the positive ratio
        |   WHERE o_orderstatus = st
        |     AND o_custkey < CAST(FLOOR(h / 2.0) AS BIGINT)) AS n
        |FROM g WHERE c > 5000
        |UNION ALL
        |SELECT st AS status, 'small' AS bucket, c AS n
        |FROM g WHERE c <= 5000""".stripMargin,
    // the same file the DDL's file:// LOCATION points at; DuckDB's
    // ignore_errors drops the malformed rows the reject limit tolerated
    // (integer SUMs cast to BIGINT — DuckDB's HUGEINT would land as
    // float64 in the driver's compare)
    "q219_external_ddl" -> {
      val p = new java.io.File("target/ext_ddl_demo/load.csv").getAbsolutePath
      s"""SELECT tag, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS amt_sum,
         |  CAST(SUM(id) AS BIGINT) AS id_sum
         |FROM read_csv('$p', header=false, delim='|',
         |  columns={'id': 'INTEGER', 'tag': 'VARCHAR', 'amt': 'BIGINT'},
         |  ignore_errors=true)
         |GROUP BY tag""".stripMargin
    },
    "q231_s3_external" -> {
      val p = new java.io.File("target/s3_ext_demo/load.csv").getAbsolutePath
      s"""SELECT tag, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS amt_sum,
         |  CAST(SUM(id) AS BIGINT) AS id_sum
         |FROM read_csv('$p', header=false, delim='|',
         |  columns={'id': 'INTEGER', 'tag': 'VARCHAR', 'amt': 'BIGINT'},
         |  ignore_errors=true)
         |GROUP BY tag""".stripMargin
    },
    "q232_fixedwidth" -> {
      // replay the fixed-width slicing declaratively over raw lines:
      // a row is good iff its length matches the layout and every
      // non-string field either carries the null token or converts
      val p = new java.io.File("target/fw_demo/load.txt").getAbsolutePath
      s"""WITH l AS (SELECT line FROM read_csv('$p', header=false,
         |  delim='|', quote='', columns={'line': 'VARCHAR'})),
         |f AS (SELECT try_cast(rtrim(substr(line, 1, 5)) AS INTEGER) AS id,
         |             rtrim(substr(line, 6, 10)) AS name,
         |             rtrim(substr(line, 16, 8)) AS amt_raw,
         |             length(line) AS len FROM l)
         |SELECT name, COUNT(*) AS n,
         |  COUNT(try_cast(amt_raw AS BIGINT)) AS n_amt,
         |  CAST(SUM(try_cast(amt_raw AS BIGINT)) AS BIGINT) AS amt_sum,
         |  CAST(SUM(id) AS BIGINT) AS id_sum
         |FROM f
         |WHERE len = 23 AND id IS NOT NULL
         |  AND (amt_raw = 'NA' OR try_cast(amt_raw AS BIGINT) IS NOT NULL)
         |GROUP BY name""".stripMargin
    },
    "q233_create_type" ->
      """SELECT m, COUNT(*) AS n, CAST(SUM(r) AS BIGINT) AS r_sum
        |FROM (VALUES (1, 'sad', 3), (2, 'ok', 5), (3, 'happy', 9),
        |             (4, 'ok', 7), (5, NULL, NULL)) t(id, m, r)
        |GROUP BY m""".stripMargin,
    // kept = host suffix not on the blocklist: example1.com blocks every
    // doc_id%3=1 host; src4.example2.com blocks src4's doc_id%3=2 hosts
    "q240_domain_filter" ->
      """SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM documents
        |WHERE NOT (doc_id % 3 = 1
        |           OR (source = 'src4' AND doc_id % 3 = 2))
        |GROUP BY source""".stripMargin,
    "q238_shuffle" ->
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':7') AS shuffle_key
        |FROM documents""".stripMargin,
    // identical segmentation in SQL: 3-word chunks by word position,
    // chunks repeated across >=2 distinct docs removed, survivors
    // re-joined in order (docs losing every chunk keep an empty text)
    "q242_segment_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
        |         generate_subscripts(string_split(text, ' '), 1) AS wpos
        |  FROM documents),
        |seg AS (
        |  SELECT doc_id, (wpos-1)//3 AS spos,
        |         string_agg(word, ' ' ORDER BY wpos) AS segment
        |  FROM w GROUP BY doc_id, (wpos-1)//3),
        |dup AS (SELECT segment FROM seg GROUP BY segment
        |        HAVING COUNT(DISTINCT doc_id) >= 2),
        |kept AS (SELECT s.* FROM seg s ANTI JOIN dup d USING (segment)),
        |r AS (SELECT doc_id, string_agg(segment, ' ' ORDER BY spos) AS clean_text,
        |             COUNT(*) AS n_kept FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, COUNT(*) AS n_seg FROM seg GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text,
        |       CAST(tot.n_seg - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
        |FROM documents d JOIN tot USING (doc_id) LEFT JOIN r USING (doc_id)""".stripMargin,
    "q235_ts_dictionary" ->
      """SELECT substring(CAST(event_id % 100000 AS VARCHAR), 1, 4) AS lexed,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1
        |UNION ALL
        |SELECT w || '=' || CASE w
        |    WHEN 'spark' THEN 'spark cluster engine'
        |    WHEN 'cluster' THEN 'spark cluster engine'
        |    WHEN 'parquet' THEN 'parquet columnar'
        |    ELSE 'none' END AS lexed,
        |  CAST(1 AS BIGINT) AS n
        |FROM (VALUES ('spark'), ('cluster'), ('parquet'), ('unknown')) t(w)""".stripMargin,
    // expected lexeme streams pinned from the reference's tsdicts.out
    "q250_ts_thesaurus" ->
      """SELECT * FROM (VALUES
        |  (1, '1 postgr 12 123 1', '1'),
        |  (2, 'sn new star usual call sn abbrevi sn', '2'),
        |  (3, 'order invit card look like order invit card', '∅'))
        |  t(id, lexemes, single)""".stripMargin,
    // the UNSALTED join: salting must not change a single value
    "q234_salted_join" -> s"""
      |SELECT c_mktsegment, COUNT(*) AS n, ${oSumd("o_totalprice")} AS total
      |FROM (SELECT CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE o_custkey END
      |             AS k, o_totalprice FROM orders) o
      |JOIN customer ON customer.c_custkey = o.k
      |GROUP BY c_mktsegment""".stripMargin,
    "q93_sreh_csv" -> {
      // same absolute path the Spark side writes (both resolve against
      // this JVM's CWD); rows with the wrong field count are the rejects
      // on both engines
      val p = new java.io.File("target/sreh_demo/input.csv").getAbsolutePath
      s"""SELECT id, name, score
         |FROM read_csv('$p', header=false,
         |  columns={'id': 'INTEGER', 'name': 'VARCHAR', 'score': 'DOUBLE'},
         |  ignore_errors=true)""".stripMargin
    },
    // the execute: command's output re-derived arithmetically: segment
    // i emits k = i*25 + j for j in [0,25), j % 10 == 7 lines malformed
    "q201_web_writable" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_k
        |FROM orders WHERE o_orderkey % 100 = 0
        |GROUP BY o_orderstatus""".stripMargin,
    // same bytes the load streamed over HTTP (absolute path resolves
    // against this JVM's CWD, as q93); bad lines fail the BIGINT parse
    // and are ignore_errors-dropped, mirroring the SREH reject log
    "q194_web_external" -> {
      val p = new java.io.File("target/web_demo/input.txt").getAbsolutePath
      s"""SELECT tag, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
         |FROM read_csv('$p', header=false, delim='|',
         |  columns={'k': 'BIGINT', 'tag': 'VARCHAR'},
         |  ignore_errors=true)
         |GROUP BY tag""".stripMargin
    },
    "q166_exec_source" ->
      """SELECT 't' || CAST(j % 3 AS VARCHAR) AS tag, COUNT(*) AS n,
        |       CAST(SUM(i * 25 + j) AS BIGINT) AS sum_k
        |FROM (SELECT CAST(x // 25 AS BIGINT) AS i, CAST(x % 25 AS BIGINT) AS j
        |      FROM range(0, 100) t(x)) g
        |WHERE j % 10 <> 7
        |GROUP BY 1""".stripMargin,
    "q94_copy_roundtrip" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${oSumd("l_quantity")} AS sum_qty,
         |  ${oSumd("l_extendedprice")} AS sum_price
         |FROM lineitem WHERE l_quantity > 40 GROUP BY l_returnflag""".stripMargin,
    "q107_ddl_roundtrip" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n, ${oSumd("o_totalprice")} AS total
         |FROM orders GROUP BY o_orderstatus""".stripMargin,
    // the upsert replayed: matched rows take the source's values
    "q174_upsert" ->
      s"""WITH t AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
         |src AS (SELECT c_custkey, 'UPSERTED' AS c_mktsegment,
         |          c_acctbal + 1000.0 AS c_acctbal
         |        FROM customer WHERE c_custkey % 5 = 0
         |        UNION ALL
         |        SELECT c_custkey + 10000000, 'NEWROW', 0.0
         |        FROM customer WHERE c_custkey % 500 = 0),
         |up AS (
         |  SELECT t.c_custkey,
         |    CASE WHEN src.c_custkey IS NOT NULL
         |         THEN src.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment,
         |    CASE WHEN src.c_custkey IS NOT NULL
         |         THEN src.c_acctbal ELSE t.c_acctbal END AS c_acctbal
         |  FROM t LEFT JOIN src ON t.c_custkey = src.c_custkey
         |  UNION ALL
         |  SELECT src.c_custkey, src.c_mktsegment, src.c_acctbal
         |  FROM src LEFT JOIN t ON t.c_custkey = src.c_custkey
         |  WHERE t.c_custkey IS NULL)
         |SELECT c_mktsegment, COUNT(*) AS n, ${oSumd("c_acctbal")} AS bal
         |FROM up GROUP BY c_mktsegment""".stripMargin,
    // the MERGE three-way split replayed in SQL: matched rows update
    // (or delete when 'P'), unmatched source rows insert NULL-padded
    "q172_merge" ->
      s"""WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
         |src AS (SELECT o_orderkey, 500.0 AS bump FROM orders
         |        WHERE o_orderkey % 3 = 0
         |        UNION ALL
         |        SELECT o_orderkey + 100000000, 0.0 FROM orders
         |        WHERE o_orderkey % 1000 = 0),
         |merged AS (
         |  SELECT t.o_orderkey, t.o_orderstatus,
         |    CASE WHEN src.o_orderkey IS NOT NULL
         |         THEN t.o_totalprice + src.bump
         |         ELSE t.o_totalprice END AS o_totalprice
         |  FROM t LEFT JOIN src ON t.o_orderkey = src.o_orderkey
         |  WHERE NOT (src.o_orderkey IS NOT NULL AND t.o_orderstatus = 'P')
         |  UNION ALL
         |  SELECT src.o_orderkey, CAST(NULL AS VARCHAR),
         |    CAST(NULL AS DOUBLE)
         |  FROM src LEFT JOIN t ON t.o_orderkey = src.o_orderkey
         |  WHERE t.o_orderkey IS NULL)
         |SELECT o_orderstatus, COUNT(*) AS n, ${oSumd("o_totalprice")} AS total
         |FROM merged GROUP BY o_orderstatus""".stripMargin,
    "q139_svec" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |c AS (SELECT doc_id, [
        |  CAST(len(list_filter(words, x -> x = 'join')) AS DOUBLE),
        |  CAST(len(list_filter(words, x -> x = 'hash')) AS DOUBLE),
        |  CAST(len(list_filter(words, x -> x = 'row')) AS DOUBLE),
        |  CAST(len(list_filter(words, x -> x = 'batch')) AS DOUBLE),
        |  CAST(len(list_filter(words, x -> x = 'scan')) AS DOUBLE),
        |  CAST(len(list_filter(words, x -> x = 'column')) AS DOUBLE),
        |  CAST(len(list_filter(words, x -> x = 'filter')) AS DOUBLE),
        |  CAST(len(list_filter(words, x -> x = 'table')) AS DOUBLE),
        |  CAST(len(list_filter(words, x -> x = 'vector')) AS DOUBLE),
        |  CAST(len(list_filter(words, x -> x = 'stream')) AS DOUBLE),
        |  CAST(len(list_filter(words, x -> x = 'spark')) AS DOUBLE),
        |  CAST(len(list_filter(words, x -> x = 'query')) AS DOUBLE)] AS cnts
        |FROM w)
        |SELECT doc_id,
        |  CAST(len(cnts) AS INT) AS dim,
        |  CAST(len(list_filter(cnts, v -> v <> 0)) AS INT) AS nnz,
        |  list_sum(cnts) AS vsum,
        |  list_sum(list_transform(cnts, v -> abs(v))) AS l1,
        |  SQRT(list_sum(list_transform(cnts, v -> v * v))) AS l2,
        |  list_sum(list_transform(cnts, v -> v * 3.0)) AS vsum_x3
        |FROM c""".stripMargin,
    "q140_matview" ->
      s"""SELECT l_returnflag, COUNT(*) AS n, ${oSumd("l_extendedprice")} AS revenue
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q191_mrl_truncated" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
        |sf AS (
        |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(q.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)))
        |    / (SQRT(list_sum(list_transform(range(1, 65),
        |         i -> CAST(q.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(q.embedding[CAST(i AS INT)] AS DOUBLE))))
        |     * SQRT(list_sum(list_transform(range(1, 65),
        |         i -> CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)))))
        |    AS cos_sim
        |  FROM q, embeddings e WHERE q.vec_id <> e.vec_id),
        |st AS (
        |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |    list_sum(list_transform(range(1, 17),
        |      i -> CAST(q.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)))
        |    / (SQRT(list_sum(list_transform(range(1, 17),
        |         i -> CAST(q.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(q.embedding[CAST(i AS INT)] AS DOUBLE))))
        |     * SQRT(list_sum(list_transform(range(1, 17),
        |         i -> CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)))))
        |    AS cos_sim
        |  FROM q, embeddings e WHERE q.vec_id <> e.vec_id),
        |tf AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
        |  FROM sf) WHERE rnk <= 5),
        |tt AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
        |  FROM st) WHERE rnk <= 5)
        |SELECT tf.query_id, COUNT(tt.neighbor_id) AS n_overlap
        |FROM tf LEFT JOIN tt
        |  ON tf.query_id = tt.query_id AND tf.neighbor_id = tt.neighbor_id
        |GROUP BY tf.query_id""".stripMargin,
    "q190_audio_energy" ->
      """WITH w AS (SELECT doc_id AS id, 800 + doc_id % 256 AS ns
        |  FROM documents WHERE doc_id % 4 = 3),
        |e AS (SELECT id, ns,
        |    unnest(range(0, CAST(ceil(ns / 400.0) AS BIGINT))) AS win FROM w),
        |s AS (SELECT id, CAST(win AS INT) AS win,
        |    CAST(LEAST(ns, (win + 1) * 400) - win * 400 AS INT) AS n,
        |    list_transform(range(win * 400, LEAST(ns, (win + 1) * 400)),
        |      i -> (id + 37 * i) % 2003 - 1001) AS samples
        |  FROM e)
        |SELECT id, win, n,
        |  CAST(list_sum(list_transform(samples, x -> x * x)) AS BIGINT)
        |    AS sum_sq,
        |  CAST(list_max(list_transform(samples, x -> abs(x))) AS INT) AS peak,
        |  ROUND(sqrt(CAST(list_sum(list_transform(samples, x -> x * x))
        |    AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS rms
        |FROM s""".stripMargin,
    "q186_zorder" ->
      s"""SELECT o_custkey % 10 AS bucket, COUNT(*) AS n,
         |  ${oSumd("o_totalprice")} AS total
         |FROM orders
         |WHERE o_custkey BETWEEN 100 AND 300 AND o_totalprice < 150000.0
         |GROUP BY o_custkey % 10""".stripMargin,
    "q177_partition_maint" ->
      s"""WITH base AS (
         |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders),
         |incoming AS (
         |  SELECT o_orderkey + 50000000 AS o_orderkey,
         |    o_totalprice + 10000.0 AS o_totalprice, o_orderpriority
         |  FROM base WHERE o_orderpriority = '1-URGENT'),
         |after_t AS (
         |  SELECT * FROM base
         |  WHERE o_orderpriority IN ('2-HIGH', '3-MEDIUM')
         |  UNION ALL SELECT * FROM incoming)
         |SELECT 't' AS src, o_orderpriority, COUNT(*) AS n,
         |  ${oSumd("o_totalprice")} AS total
         |FROM after_t GROUP BY o_orderpriority
         |UNION ALL
         |SELECT 's' AS src, o_orderpriority, COUNT(*) AS n,
         |  ${oSumd("o_totalprice")} AS total
         |FROM base WHERE o_orderpriority = '1-URGENT'
         |GROUP BY o_orderpriority""".stripMargin,
    "q130_dml" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n,
         |  ${oSumd("CASE WHEN o_totalprice > 200000.0 THEN o_totalprice + 1000.0 ELSE o_totalprice END")} AS total
         |FROM orders WHERE o_orderstatus <> 'P'
         |GROUP BY o_orderstatus""".stripMargin,
    "q128_writable_external" ->
      s"""SELECT COUNT(*) AS n, ${oSumd("s_acctbal")} AS bal,
         |  CAST(SUM(length(s_name)) AS BIGINT) AS name_chars
         |FROM supplier""".stripMargin,
    "q115_foreign_jdbc" ->
      """SELECT n_regionkey, COUNT(*) AS n_nations,
        |  CAST(SUM(length(n_name)) AS BIGINT) AS name_chars
        |FROM nation GROUP BY n_regionkey""".stripMargin,
    "q117_copy_options" ->
      s"""SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg,
         |  COUNT(*) AS n, ${oSumd("c_acctbal")} AS bal
         |FROM customer GROUP BY NULLIF(c_mktsegment, 'BUILDING')""".stripMargin
  )
}
