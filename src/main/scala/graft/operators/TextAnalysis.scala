package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality operators for the training-data pipeline: token counts,
  * quality scoring, language stats. All arithmetic is int-ratio → double
  * (deterministic, oracle-reproducible); everything is codegen'd
  * built-ins over the `documents` table.
  */
object TextAnalysis {

  /** Whitespace token count (BPE-ish superset available via the regex in
    * tokensBpeish). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Crude BPE-flavored tokenizer: word pieces + digits + punctuation as
    * separate tokens. */
  def tokensBpeish(text: Column): Column =
    filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
      t => length(t) > 0 && t =!= lit(" "))

  private val enStop =
    Seq("the", "and", "of", "to", "a", "in", "is", "that", "with", "for")

  /** Deterministic quality features + a fixed-weight score. All
    * components are expressible in ANSI SQL (see the oracle). */
  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // ALL four features in ONE byte-level codegen pass (the previous
    // three regex passes — token split, punct regexp_replace, stopword
    // regexp_count — each re-walked the document; regex automata also
    // cost per-char dispatch that a straight byte scan doesn't)
    val qf = org.apache.spark.sql.graft.GraftInternals.exprColumn(
      graft.functions.QualityFeatures(
        org.apache.spark.sql.graft.GraftInternals.columnExpr(col(textCol))))
    val docs1 = docs.withColumn("__qf", qf)
    val chars = col("__qf.n_chars")
    val toks = col("__qf.n_tokens")
    val punct = col("__qf.n_punct")
    val stopHits = col("__qf.n_stop")
    docs1
      .withColumn("n_chars_m", chars)
      .withColumn("n_tokens", toks)
      .withColumn("avg_token_len",
        when(toks > 0, chars.cast("double") / toks.cast("double")).otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(chars > 0, punct.cast("double") / chars.cast("double")).otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(toks > 0, stopHits.cast("double") / toks.cast("double")).otherwise(lit(0.0)))
      .withColumn("quality_score",
        least(lit(1.0), col("n_tokens").cast("double") / lit(400.0)) * lit(0.4)
          + col("stopword_ratio") * lit(2.0)
          + (lit(1.0) - col("punct_ratio")) * lit(0.2))
      .drop("__qf")
  }

  /** Repetition signals for training-data filtering (the published
    * Gopher/MassiveText quality rules — Rae et al. 2021, table A1:
    * documents dominated by a few words or by repeated n-grams are
    * boilerplate): per document, the most-frequent-word fraction and
    * the duplicate bigram/trigram occurrence fractions. One explode of
    * tagged n-grams → one fine-grained (doc, n, gram) count (map-side
    * combined, no skew: the key space grows with the corpus) → two
    * doc-keyed aggregations. Linear, shuffle-bounded; ratios are
    * BIGINT-derived double divisions, so the oracle reproduces them
    * bit-exactly. */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    // n-grams via an exploded position index + row-level element_at +
    // stack — every step is whole-stage codegen. (Measured: a
    // higher-order transform building tagged structs ran ~7x slower —
    // HOFs evaluate interpreted per element — and a posexplode +
    // window-lead variant paid an extra sort shuffle, 2.4x slower.)
    val counts = docs
      .select(col(idCol), split(col(textCol), " ").as("ws"))
      .select(col(idCol), col("ws"),
        explode(sequence(lit(1), size(col("ws")))).as("i"))
      .select(col(idCol), expr(
        "stack(3, 1, element_at(ws, i)," +
          " 2, CASE WHEN i + 1 <= size(ws)" +
          "      THEN concat(element_at(ws, i), ' ', element_at(ws, i + 1))" +
          "      END," +
          " 3, CASE WHEN i + 2 <= size(ws)" +
          "      THEN concat(element_at(ws, i), ' ', element_at(ws, i + 1)," +
          "                  ' ', element_at(ws, i + 2)) END) AS (n, gram)"))
      .where(col("gram").isNotNull)
      .groupBy(col(idCol), col("n"), col("gram"))
      .count()
    counts.groupBy(col(idCol), col("n"))
      .agg(sum("count").as("total"), max("count").as("maxc"),
        count(lit(1)).as("dist"))
      .groupBy(col(idCol))
      .agg(
        max(when(col("n") === 1, col("maxc"))).as("max1"),
        max(when(col("n") === 1, col("total"))).as("tot1"),
        max(when(col("n") === 2, col("dist"))).as("dist2"),
        max(when(col("n") === 2, col("total"))).as("tot2"),
        max(when(col("n") === 3, col("dist"))).as("dist3"),
        max(when(col("n") === 3, col("total"))).as("tot3"))
      .select(col(idCol),
        (col("max1").cast("double") / col("tot1").cast("double"))
          .as("top_word_frac"),
        coalesce(lit(1.0) -
          col("dist2").cast("double") / col("tot2").cast("double"), lit(0.0))
          .as("dup_bigram_frac"),
        coalesce(lit(1.0) -
          col("dist3").cast("double") / col("tot3").cast("double"), lit(0.0))
          .as("dup_trigram_frac"))
  }

  /** TF-IDF term weights per document: tf from a (doc, term) count,
    * document frequency from a distinct-doc count per term, idf =
    * ln(N/df) with the corpus size N riding the plan as a broadcast
    * 1-row aggregate (no driver action). The term-keyed df join is the
    * standard vocabulary shuffle; all counts are exact longs so only the
    * final ln/multiply is floating point (same expression shape as the
    * oracle). */
  def tfidf(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val words = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("term"))
    val tf = words.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfreq = words.groupBy("term").agg(countDistinct(idCol).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        (col("tf") * log(col("n").cast("double") / col("df"))).as("tfidf"))
  }

  /** Deterministic train/val/test assignment: the first 16 bits of
    * md5(id) as a fraction. Reproducible across runs, engines, cluster
    * sizes, and re-shuffles — no RNG, no ordering dependence, which is
    * the property a 100 TB corpus split actually needs (a seeded
    * `rand()` changes with partitioning; a key hash never does). Pure
    * codegen per-row arithmetic, no shuffle. */
  def deterministicSplit(docs: DataFrame, idCol: String = "doc_id",
                         trainFrac: Double = 0.9,
                         valFrac: Double = 0.05): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("double") / 65536.0
    docs.withColumn("split",
      when(h < trainFrac, lit("train"))
        .when(h < trainFrac + valFrac, lit("val"))
        .otherwise(lit("test")))
  }

  /** Domain-blocklist filtering — the C4/RefinedWeb-style URL filter
    * that drops documents whose source host (or any registrable parent
    * domain: blocking `example.com` also blocks `ads.example.com`)
    * appears on a blocklist. Scale shape: host extraction and suffix
    * generation are pure codegen (`parse_url`/`split`/`transform`);
    * matching EXPLODES each host into its ≤ depth domain suffixes and
    * broadcast-semi-joins the blocklist — an equi-join on bounded
    * fan-out, never a nested-loop `array_contains` probe against a
    * million-domain list. Returns the surviving documents. */
  def domainBlocklistFilter(docs: DataFrame, urlCol: String,
                            blocklist: DataFrame, // one `domain` column
                            idCol: String = "doc_id"): DataFrame = {
    val host = regexp_replace(
      lower(parse_url(col(urlCol), lit("HOST"))), "^www\\.", "")
    val parts = split(host, "\\.")
    val suffixes = transform(
      sequence(lit(1), size(parts)),
      i => array_join(slice(parts, -i, i), "."))
    val bl = broadcast(
      blocklist.select(lower(col("domain")).as("__blocked")).distinct())
    val blockedIds = docs
      .select(col(idCol), explode(suffixes).as("__suffix"))
      .join(bl, col("__suffix") === col("__blocked"), "left_semi")
      .select(idCol).distinct()
    docs.join(blockedIds, Seq(idCol), "left_anti")
  }

  /** URL canonicalization — the dedup key of C4/RefinedWeb/FineWeb
    * URL-level deduplication: lowercase scheme + host, strip a
    * leading `www.`, default ports (:80/:443), the fragment, and
    * tracking parameters (utm_*, fbclid, gclid, ref), tidying the
    * query separators the removals leave behind, and dropping a
    * slash-only path. A pure codegen regexp chain — no UDF, no
    * shuffle; at corpus scale this runs inside the scan's projection. */
  def urlNormalize(url: Column): Column = {
    val headRe = "^([a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*)(.*)$"
    val head0 = lower(regexp_extract(url, headRe, 1))
    val head = regexp_replace(
      regexp_replace(head0, "^(https?://)www\\.", "$1"),
      ":(80|443)$", "")
    val rest0 = regexp_extract(url, headRe, 2)
    val noFrag = regexp_replace(rest0, "#.*$", "")
    val noTrack = regexp_replace(noFrag,
      "(?:utm_[a-zA-Z]+|fbclid|gclid|ref)=[^&#]*&?", "")
    val tidy = regexp_replace(regexp_replace(noTrack, "[?&]$", ""),
      "\\?&", "?")
    val path = regexp_replace(tidy, "^/$", "")
    concat(head, path)
  }

  /** URL-level exact deduplication: canonicalize, hash-group, keep the
    * smallest id per canonical URL (the deterministic representative).
    * One shuffle on the canonical key. */
  def urlDedup(docs: DataFrame, urlCol: String,
               idCol: String = "doc_id"): DataFrame = {
    docs.withColumn("__canon", urlNormalize(col(urlCol)))
      .groupBy("__canon")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
      .withColumnRenamed("__canon", "canonical_url")
  }

  /** Deterministic global shuffle — the training-data ordering step
    * (every epoch of LLM pretraining consumes the corpus in a
    * pseudo-random but REPRODUCIBLE order). The shuffle key is a pure
    * hash of (id, seed): same inputs + seed → identical partition
    * assignment and in-partition order on any cluster size, and a new
    * seed is a fresh permutation. Scale shape: ONE keyed repartition +
    * sortWithinPartitions — a global ORDER BY would range-partition and
    * sample-scan the corpus twice; hash-bucketing + local sort gives
    * the same statistical shuffle with one pass, which is the plan you
    * want at 100 TB. */
  def deterministicShuffle(docs: DataFrame, idCol: String = "doc_id",
                           seed: Long = 42L,
                           numPartitions: Int = 0): DataFrame = {
    val key = md5(concat(col(idCol).cast("string"), lit(":" + seed)))
    val keyed = docs.withColumn("shuffle_key", key)
    val parts =
      if (numPartitions > 0) numPartitions
      else docs.sparkSession.sessionState.conf.numShufflePartitions
    keyed.repartition(parts, col("shuffle_key"))
      .sortWithinPartitions("shuffle_key")
  }

  /** Concat-and-chunk context packing: documents are laid end-to-end in
    * id order and cut every `capacity` tokens (the standard LLM
    * pretraining packing; a document may straddle two chunks —
    * `chunk_first`/`chunk_last` give its span). Packing is SHARD-LOCAL
    * (`id % shards`): the running sum is a window per shard, so at
    * 100 TB the prefix-sum never serializes through one partition —
    * chunk ids are (shard, chunk) pairs, exactly how a real corpus is
    * packed per input shard. */
  def contextPack(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", capacity: Int = 512,
                  shards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy(idCol)
    docs
      .withColumn("shard", (col(idCol) % shards).cast("int"))
      .withColumn("n_tokens", tokenCount(col(textCol)).cast("bigint"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("shard"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $capacity").as("chunk_first"),
        when(col("n_tokens") > 0, expr(s"(cum - 1) div $capacity"))
          .otherwise(expr(s"(cum - n_tokens) div $capacity"))
          .as("chunk_last"))
  }

  /** Deterministic weighted subsampling for domain mixing: keep a row
    * iff its md5-fraction is below the weight of its group (language,
    * source, quality band...). The same hash trick as
    * [[deterministicSplit]] — reproducible under any partitioning, and
    * upweighting a domain later keeps every previously-kept row (the
    * kept set grows monotonically with the weight), which makes mixture
    * experiments diffable. Weights broadcast as a literal CASE — no
    * join, no shuffle, pure codegen. */
  def weightedSample(docs: DataFrame, groupCol: String,
                     weights: Map[String, Double], idCol: String = "doc_id",
                     defaultWeight: Double = 0.0): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("double") / 65536.0
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (k, v)) =>
      when(col(groupCol) === k, lit(v)).otherwise(acc)
    }
    docs.where(h < w)
  }

  /** Benchmark decontamination: flag training documents sharing any
    * word `n`-gram with a held-out/benchmark set (the published GPT-3
    * appendix-C recipe: 13-gram collision). Both sides explode to
    * (gram-hash, id) and meet in an equi-join — never all-pairs; the
    * gram space grows with the corpus and has no skew concentration
    * (hash keys), so the shuffle scales linearly at 100 TB. Returns
    * distinct (train id, benchmark id) collision pairs. */
  def contaminationPairs(train: DataFrame, bench: DataFrame, n: Int = 13,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    // explode positions, then hash each gram with plain codegen
    // expressions (slice/concat_ws/xxhash64) — no interpreted lambdas
    def grams(df: DataFrame, outId: String): DataFrame = df
      .select(col(idCol).as(outId),
        split(trim(lower(col(textCol))), "\\s+").as("w"))
      .where(size(col("w")) >= n)
      .select(col(outId), col("w"),
        explode(sequence(lit(1), size(col("w")) - (n - 1))).as("i"))
      .select(col(outId),
        xxhash64(concat_ws(" ", slice(col("w"), col("i"), lit(n)))).as("g"))
      .distinct()
    grams(train, "train_id")
      .join(grams(bench, "bench_id"), "g")
      .select("train_id", "bench_id").distinct()
  }

  /** PII redaction for training text: email, IPv4, and international
    * phone patterns → typed placeholders. One codegen regexp_replace
    * chain; the patterns are written in the Java-regex ∩ RE2 dialect so
    * the oracle replays them verbatim. */
  /** Train a character-trigram language model for perplexity-based
    * quality filtering (the CCNet-style filter, Wenzek et al. 2020 —
    * there an external KenLM; here a self-contained Katz-less add-one
    * model so the whole pipeline stays in-engine). Distributed shape:
    * ONE shuffle to count trigrams over the reference corpus, the
    * model truncated to `maxNgrams` most-frequent entries (a bounded
    * broadcast, like every dictionary here), scoring then per-row.
    * Returns (trigram → count, bigram-context → count, vocabSize). */
  def charLmTrain(reference: DataFrame, textCol: String = "text",
                  maxNgrams: Int = 500000):
      (Map[String, Long], Map[String, Long], Int) = {
    // explode positions + substr — whole-stage codegen end to end (an
    // array-HOF build of the n-grams evaluates interpreted, measured
    // ~4× slower at sf0.1)
    val tri = reference
      .select(regexp_replace(lower(col(textCol)), "[^\\p{L}\\p{N}]+", " ")
        .as("norm"))
      .select(col("norm"), explode(sequence(lit(1),
        greatest(length(col("norm")) - 2, lit(0)))).as("p"))
      .select(expr("substr(norm, p, 3)").as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("g").asc).limit(maxNgrams)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val trigrams = tri.toMap
    val contexts = tri.groupBy(_._1.substring(0, 2))
      .map { case (ctx, gs) => (ctx, gs.map(_._2).sum) }
    val vocab = tri.map(_._1.substring(2)).distinct.length.max(1)
    (trigrams, contexts, vocab)
  }

  /** `charNgrams(text, n)`: normalized character n-grams (lowercased,
    * runs of non-alphanumerics collapsed to one space) as a column.
    * HOF-built (interpreted) — used on the one-shot training side
    * only; the per-row scorer is a plain closure. */
  def charNgrams(text: Column, n: Int): Column = {
    val norm = regexp_replace(lower(text), "[^\\p{L}\\p{N}]+", " ")
    transform(
      sequence(lit(1), greatest(length(norm) - (n - 1), lit(0))),
      i => norm.substr(i, lit(n)))
  }

  /** Score documents by add-one-smoothed trigram perplexity against a
    * trained model: low = looks like the reference corpus, high =
    * boilerplate/garbled/other-language. Per-row work against the
    * broadcast counts; no shuffle. */
  private val lmBroadcasts = new java.util.WeakHashMap[
    (Map[String, Long], Map[String, Long], Int),
    org.apache.spark.broadcast.Broadcast[
      (Map[String, Long], Map[String, Long], Int)]]()

  def withPerplexity(docs: DataFrame,
                     model: (Map[String, Long], Map[String, Long], Int),
                     textCol: String = "text",
                     out: String = "perplexity"): DataFrame = {
    // broadcast the LM once; a closure-captured map would be serialized
    // into EVERY stage's task binary (~tens of MB re-shipped per stage
    // on a real cluster). One broadcast per model identity: repeated
    // scoring calls with the same model reuse the same blocks instead of
    // accumulating one broadcast per call for the life of the context
    // (block count is bounded by distinct trained models, not calls).
    val bc = lmBroadcasts.synchronized {
      Option(lmBroadcasts.get(model)).getOrElse {
        val b = docs.sparkSession.sparkContext.broadcast(model)
        lmBroadcasts.put(model, b)
        b
      }
    }
    val score = udf { (text: String) =>
      if (text == null) Double.MaxValue
      else {
        val (trigrams, contexts, vocab) = bc.value
        val norm = text.toLowerCase.replaceAll("[^\\p{L}\\p{N}]+", " ")
        var logp = 0.0
        var n = 0
        var i = 0
        while (i + 3 <= norm.length) {
          val g = norm.substring(i, i + 3)
          val ctx = g.substring(0, 2)
          val num = trigrams.getOrElse(g, 0L) + 1.0
          val den = contexts.getOrElse(ctx, 0L) + vocab.toDouble
          logp += math.log(num / den)
          n += 1
          i += 1
        }
        if (n == 0) Double.MaxValue else math.exp(-logp / n)
      }
    }
    docs.withColumn(out, score(col(textCol)))
  }

  /** Train a BPE merge table (Sennrich et al. 2016, the published
    * subword algorithm) over a corpus. Scale shape is the one real BPE
    * trainers use: the corpus contributes exactly ONE distributed
    * word-frequency aggregation (unique words are bounded by the
    * language, not the corpus — `maxDict` caps the tail), and the
    * merge loop then runs on the driver over that dictionary, each
    * round a pair-count + merge over ≤ maxDict short arrays. Returns
    * merges in rank order. Deterministic: ties break on (count desc,
    * pair lexicographic asc), so the same corpus always yields the
    * same vocabulary. */
  def bpeTrain(docs: DataFrame, textCol: String = "text",
               numMerges: Int = 200, maxDict: Int = 200000): Seq[(String, String)] = {
    val words = docs
      .select(explode(split(lower(col(textCol)), "[^\\p{L}\\p{N}]+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(maxDict)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var dict: Array[(Array[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toArray :+ EndOfWord, c) }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- dict; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + c
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        dict = dict.map { case (syms, c) => (mergePair(syms, best), c) }
        round += 1
      }
    }
    merges.result()
  }

  val EndOfWord = "</w>"

  private def mergePair(syms: Array[String],
                        pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Greedy BPE encode of one word against a rank table: repeatedly
    * merge the lowest-rank adjacent pair (the published encode loop). */
  def bpeEncodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = word.map(_.toString).toArray :+ EndOfWord
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else syms = mergePair(syms, (syms(bestAt), syms(bestAt + 1)))
    }
    syms
  }

  /** Tokenize a text column with a trained merge table: one array of
    * subword tokens per row. The ranks map ships once per executor in
    * the closure — per-row work only, no shuffle. */
  def withBpeTokens(docs: DataFrame, merges: Seq[(String, String)],
                    textCol: String = "text",
                    out: String = "bpe_tokens"): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val enc = udf { (text: String) =>
      if (text == null) Array.empty[String]
      else "[^\\p{L}\\p{N}]+".r.split(text.toLowerCase)
        .filter(_.nonEmpty)
        .flatMap(w => bpeEncodeWord(w, ranks))
    }
    docs.withColumn(out, enc(col(textCol)))
  }

  /** Multinomial Naive Bayes text classifier — the in-engine stand-in
    * for the linear quality/domain classifiers of pretraining pipelines
    * (GPT-3's logistic-regression quality filter, CCNet's fastText
    * language/domain scorer): train on a labeled seed set, score the
    * corpus map-side. Self-contained counting model so the whole loop
    * stays distributed and deterministic.
    *
    * Scale shape: training is TWO bounded aggregations — a global
    * vocabulary count truncated to `maxVocab` (language-bounded, like
    * the BPE dictionary) and a (label × vocab-token) count — plus a
    * per-label doc count; all collects are model-sized, never
    * corpus-sized. Scoring broadcasts the model once (cached per model
    * identity, same discipline as the trigram LM) and is a per-row UDF
    * — no shuffle, no join.
    *
    * Deterministic: vocab ties break (count desc, token asc); argmax
    * ties break on label asc; per-document token order fixes the
    * float-sum order. */
  final case class NbModel(labels: Array[String],
                           logPrior: Map[String, Double],
                           logProb: Map[(String, String), Double],
                           logUnseen: Map[String, Double],
                           vocab: Set[String])

  def nbTrain(docs: DataFrame, labelCol: String, textCol: String = "text",
              maxVocab: Int = 65536): NbModel = {
    val toks = docs
      .select(col(labelCol).as("__lbl"),
        explode(split(lower(col(textCol)), "[^\\p{L}\\p{N}]+")).as("__tok"))
      .where(length(col("__tok")) > 0)
    val vocab = toks.groupBy("__tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("__tok").asc).limit(maxVocab)
      .collect().map(_.getString(0)).toSet
    // restrict to the vocab BEFORE collecting, so the driver fetch is
    // bounded by labels × maxVocab, not the corpus's raw token space
    val vocabDf = broadcast(docs.sparkSession
      .createDataFrame(vocab.toSeq.map(Tuple1(_))).toDF("__tok"))
    val pairCounts = toks.join(vocabDf, Seq("__tok"), "left_semi")
      .groupBy("__lbl", "__tok").agg(count(lit(1)).as("c"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val docCounts = docs.groupBy(col(labelCol).as("__lbl"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val totalDocs = docCounts.values.sum.toDouble
    val labels = docCounts.keys.toArray.sorted
    val tokTotals = pairCounts.groupBy(_._1._1)
      .map { case (l, xs) => (l, xs.map(_._2).sum) }
    val v = vocab.size.max(1).toDouble
    val logProb = pairCounts.map { case ((l, t), c) =>
      ((l, t), math.log((c + 1.0) / (tokTotals.getOrElse(l, 0L) + v)))
    }.toMap
    val logUnseen = labels.map(l =>
      (l, math.log(1.0 / (tokTotals.getOrElse(l, 0L) + v)))).toMap
    val logPrior = docCounts.map { case (l, n) =>
      (l, math.log(n / totalDocs))
    }
    NbModel(labels, logPrior, logProb, logUnseen, vocab)
  }

  private val nbBroadcasts = new java.util.WeakHashMap[
    NbModel, org.apache.spark.broadcast.Broadcast[NbModel]]()

  def withNbPrediction(docs: DataFrame, model: NbModel,
                       textCol: String = "text",
                       out: String = "pred_label"): DataFrame = {
    val bc = nbBroadcasts.synchronized {
      Option(nbBroadcasts.get(model)).getOrElse {
        val b = docs.sparkSession.sparkContext.broadcast(model)
        nbBroadcasts.put(model, b)
        b
      }
    }
    val predict = udf { (text: String) =>
      val m = bc.value
      if (m.labels.isEmpty) null
      else {
        val toks =
          if (text == null) Array.empty[String]
          else "[^\\p{L}\\p{N}]+".r.split(text.toLowerCase).filter(_.nonEmpty)
        var best: String = null
        var bestScore = Double.NegativeInfinity
        for (l <- m.labels) { // labels sorted asc: first max wins ties
          var s = m.logPrior.getOrElse(l, Double.NegativeInfinity)
          val unseen = m.logUnseen(l)
          for (t <- toks) s += m.logProb.getOrElse((l, t), unseen)
          if (s > bestScore) { bestScore = s; best = l }
        }
        best
      }
    }
    docs.withColumn(out, predict(col(textCol)))
  }

  /** Model-based quality filtering, the DCLM / FineWeb-Edu shape
    * (Li et al. 2024 "DataComp-LM" §4.4, Penedo et al. 2024: a small
    * classifier trained on a curated seed set gates the corpus; GPT-3's
    * quality filter is the same recipe with logistic regression):
    * train the in-engine multinomial NB on `goodSeed` vs `badSeed`,
    * score the corpus map-side, and keep documents the model votes
    * good AND that clear the heuristic floor (token count + the q85
    * quality score) — classifier and heuristics compose, mirroring how
    * production pipelines stack fastText scores on Gopher rules.
    *
    * Scale shape: seed sets are curation-sized (bounded); training is
    * nbTrain's two bounded aggregations; scoring is one broadcast +
    * per-row UDF and the heuristic columns are codegen expressions —
    * the corpus is touched in a single map-side pass, no shuffle, no
    * join. */
  def qualityClassifierFilter(docs: DataFrame, goodSeed: DataFrame,
                              badSeed: DataFrame, textCol: String = "text",
                              minTokens: Int = 5,
                              minQuality: Double = 0.0): DataFrame = {
    val seed = goodSeed.select(col(textCol)).withColumn("__lbl", lit("good"))
      .unionByName(badSeed.select(col(textCol)).withColumn("__lbl", lit("bad")))
    val model = nbTrain(seed, "__lbl", textCol)
    val scored = withQuality(
      withNbPrediction(docs, model, textCol, "quality_label"), textCol)
    scored.withColumn("keep",
      col("quality_label") === "good" &&
        col("n_tokens") >= minTokens &&
        col("quality_score") >= minQuality)
  }

  def piiScrub(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val phone = "\\+\\d[\\d-]{7,14}\\d"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        ip, "<IP>"),
      phone, "<PHONE>")
  }
}
