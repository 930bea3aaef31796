package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for the training-data pipeline.
  *
  * All variants are pure DataFrame pipelines built from codegen'd
  * built-ins — no UDFs, no driver-side loops, no crossJoin. The LSH path
  * bounds candidate-pair generation by band-bucket size, which is what
  * makes it viable at 100 TB (an all-pairs join is quadratic and is
  * deliberately absent here).
  *
  * Capability analog: the reference has no near-dup operator; closest is
  * trigram similarity in `contrib/pg_trgm` (used there for fuzzy match).
  * We provide exact, fingerprint, minhash-LSH, and simhash dedup.
  */
object Dedup {

  /** Ensure a CPU-heavy map stage sees at least cluster-wide
    * parallelism: fixture-sized single-file scans arrive in 1-2
    * partitions and would pin the per-row kernels (shingling, minhash,
    * winnowing, simhash, centroid assignment) to as many cores. A
    * no-op whenever the input is already at least as wide as the
    * cluster — at 100 TB the scan is, so nothing extra is shuffled. */
  private def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Distinct word k-gram shingles per document (JVM kernel — the HOF
    * slide/distinct formulation evaluates interpreted). Documents shorter
    * than k words contribute a single whole-text shingle. */
  def withShingles(docs: DataFrame, textCol: String = "text", k: Int = 3,
                   out: String = "shingles"): DataFrame =
    docs.withColumn(out, call_function("word_shingles", col(textCol), lit(k)))

  /** MinHash signature via the codegen'd MinHashSig kernel: shingle bytes
    * hashed once (xxh64), then numHashes splitmix64 permutations in a
    * tight JVM loop (an expression-level formulation runs interpreted per
    * row and dominated the bench). */
  def withMinhash(shingled: DataFrame, numHashes: Int = 128,
                  shinglesCol: String = "shingles",
                  out: String = "minhash"): DataFrame =
    shingled.withColumn(out,
      call_function("minhash_sig", col(shinglesCol), lit(numHashes)))

  /** Banded-LSH candidate pairs + exact-jaccard verification.
    *
    * bands=32 × rows=4 over 128 hashes → collision prob at jaccard j is
    * 1-(1-j^4)^32: ≈1.0 at j=0.9, 0.99998 at j=0.7, 0.086 at j=0.2 — so
    * candidate generation is sharply bounded while recall at the 0.8
    * threshold is effectively 1. Candidate count is Σ bucket^2 over band
    * buckets, never |docs|^2.
    *
    * Returns (a_id, b_id, jaccard) for verified pairs with
    * jaccard >= threshold, a_id < b_id.
    */
  def nearDupPairs(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", k: Int = 3,
                   numHashes: Int = 128, bands: Int = 32,
                   threshold: Double = 0.8): DataFrame = {
    val rows = numHashes / bands
    // Cache the signature table: the bucket self-join and both
    // verification joins read it (at scale you materialize signatures
    // once, not per consumer). The cache is RELEASED before returning —
    // materializeReleasing runs the whole pipeline with the cache hot,
    // checkpoints the (small) verified-pairs result, and unpersists; a
    // persist with no paired release pins every call's signature table
    // for the session lifetime, which is a scale-killer.
    val sig = withMinhash(withShingles(
      spread(docs.select(col(idCol), col(textCol))), textCol, k), numHashes)
      .select(col(idCol), col("shingles"), col("minhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Band keys fold the band index into one 64-bit join key. Only
    // (id, bkey) rows flow through the bucket self-join — the shingle
    // arrays are re-joined AFTER candidate dedup, so the wide payload
    // never rides the big shuffle (at 100 TB the banded table is the
    // dominant shuffle; keep it to 16 bytes/row).
    val banded = sig.select(col(idCol),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        j => xxhash64(j, slice(col("minhash"), j * rows + 1, lit(rows)))))
        .as("bkey"))

    val cand = banded.select(col("bkey"), col(idCol).as("a_id"))
      .join(banded.select(col("bkey"), col(idCol).as("b_id")), Seq("bkey"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")

    val shOnly = sig.select(col(idCol), col("shingles"))
    val pairs = cand
      .join(shOnly.select(col(idCol).as("a_id"), col("shingles").as("a_sh")), "a_id")
      .join(shOnly.select(col(idCol).as("b_id"), col("shingles").as("b_sh")), "b_id")
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))).cast("double")).as("jaccard"))
      .where(col("jaccard") >= threshold)
    materializeReleasing(pairs, sig)
  }

  /** Run `result` to completion while `cached` frames are hot, hand back
    * the materialized result, and RELEASE the caches. localCheckpoint
    * keeps the caches' lazy columnar fill (they populate during the one
    * consuming job, not in a separate eager pass) while the result's
    * blocks are reference-managed — the ContextCleaner drops them when
    * the returned frame goes out of scope — so nothing stays pinned in
    * the CacheManager after the operator returns. */
  private def materializeReleasing(result: DataFrame,
                                   cached: DataFrame*): DataFrame =
    try result.localCheckpoint(true)
    finally cached.foreach { c => c.unpersist(); () }

  /** Connected components over near-dup pairs via min-label propagation —
    * the scalable way to turn pairwise matches into dedup clusters (each
    * iteration is one distributed join; converges in O(cluster diameter)
    * rounds; labels are monotone non-increasing so convergence is
    * detected by an exact sum). Returns (id, component) where component =
    * min doc id reachable. */
  def connectedComponents(pairs: DataFrame, vertices: DataFrame,
                          idCol: String = "id",
                          maxIterations: Int = 50): DataFrame = {
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id"), col("a_id")))
      .localCheckpoint(true)
    // materialize + component-sum in ONE job per round (the eager
    // checkpoint's own pass carries the fold) — the loop is
    // job-floor-bound, and the separate agg job doubled its round-trips
    def checkpointSum(df: DataFrame): (DataFrame, Long) =
      org.apache.spark.sql.graft.GraftInternals
        .localCheckpointWithLongAgg(df, (acc, r) => acc + r.getLong(1))
    var (labels, sum) = checkpointSum(
      vertices.select(col(idCol).as("id"), col(idCol).as("component")))
    var i = 0
    var converged = false
    while (i < maxIterations && !converged) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min("component").as("nbr_min"))
      val (next, nextSum) = checkpointSum(
        labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
          .select(labels("id"),
            least(labels("component"), coalesce(col("nbr_min"), labels("component")))
              .as("component")))
      converged = nextSum == sum
      labels = next
      sum = nextSum
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(s"components did not converge in $maxIterations rounds")
    labels
  }

  /** Exact duplicate groups by content hash: one row per distinct text,
    * with occurrence count and the keeper (min id). */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper_id"))

  /** Bloom-filter decontamination: remove from `big` every row whose
    * key appears in `small` — EXACT semantics, but the corpus never
    * shuffles. A bloom filter over `small`'s keys (10 bits/key ≈ 1%
    * FPP, capped at 128 MiB) broadcasts to the scan; rows the filter
    * rules out pass map-side, and only the bloom-positive candidates
    * (true hits + ~1% false positives) run the exact anti join. Two
    * cheap scans of the corpus replace a corpus-wide shuffle — the
    * right trade at 100 TB, where the benchmark/blocklist side is
    * millions of keys and the corpus side is billions of rows. */
  def bloomAntiJoin(big: DataFrame, bigKey: String,
                    small: DataFrame, smallKey: String,
                    expectedItems: Long = 4000000L): DataFrame = {
    val bits = math.min(expectedItems * 10L, 8L * (1L << 27))
    // the filter materializes on the driver once and ships to tasks as
    // a plan constant — exactly how Spark's InjectRuntimeFilter
    // executes its scalar-subquery bloom (might_contain requires a
    // constant filter operand)
    val bytes = small.agg(call_function("bloom_filter_agg",
        xxhash64(col(smallKey)), lit(expectedItems), lit(bits)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val probe = call_function("might_contain", lit(bytes), xxhash64(col(bigKey)))
    val clean = big.where(!probe)
    val candidates = big.where(probe)
    val smallKeys = small.select(col(smallKey).as("__sk")).distinct()
    clean.unionByName(
      candidates.join(smallKeys, col(bigKey) === col("__sk"), "left_anti"))
  }

  /** Canonical-fingerprint dedup: md5 over the sorted distinct token set
    * — catches token-permutation/duplication near-dups exactly. */
  def withFingerprint(docs: DataFrame, textCol: String = "text",
                      out: String = "fingerprint"): DataFrame =
    docs.withColumn(out,
      md5(concat_ws(" ", array_sort(array_distinct(split(col(textCol), " "))))))

  /** Embedding-cosine near-dup pairs: multi-table sign-LSH self-join on
    * (table, bucket) — both sides exploded, no broadcast, no crossJoin —
    * then exact cosine verification at the threshold. The last member of
    * the dedup family (exact / fingerprint / minhash / simhash /
    * embedding-cosine). Recall < 1 by construction (rows-only oracle).
    */
  def embedNearDupPairs(vectors: DataFrame, threshold: Double,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        nTables: Int = 8, nPlanes: Int = 10,
                        dim: Int = 64, seed: Long = 42L): DataFrame = {
    val buckets = call_function("lsh_buckets", col(vecCol),
      lit(nTables), lit(nPlanes), lit(dim), lit(seed))
    val hashed = vectors.select(col(idCol), col(vecCol),
      posexplode(buckets).as(Seq("tbl", "bucket")))
    val l = hashed.select(col("tbl"), col("bucket"),
      col(idCol).as("a_id"), col(vecCol).as("av"))
    val r = hashed.select(col("tbl"), col("bucket"),
      col(idCol).as("b_id"), col(vecCol).as("bv"))
    l.join(r, Seq("tbl", "bucket"))
      .where(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"),
        graft.operators.Knn.cosine(col("av"), col("bv")).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Winnowing-fingerprint near-dup candidates: docs sharing >= minShared
    * winnowed rolling-hash fingerprints. Candidates via equi-join on
    * exploded fingerprints (bounded by fingerprint bucket sizes — same
    * scale posture as the band join). */
  def winnowPairs(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", k: Int = 12, w: Int = 8,
                  minShared: Int = 5, maxDocFreq: Int = 100): DataFrame = {
    // cached for its three consumers (df count + both join sides) and
    // released before returning — see materializeReleasing
    val fps = spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        explode(array_distinct(
          call_function("winnow", col(textCol), lit(k), lit(w)))).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Stop-fingerprint filtering: drop fingerprints appearing in more
    // than maxDocFreq docs (boilerplate phrases). At scale this bounds
    // the worst self-join bucket to maxDocFreq² — without it one common
    // phrase makes the join quadratic in corpus size.
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDocFreq).select("fp")
    val filtered = fps.join(rare, Seq("fp"))
    val pairs = filtered.select(col("fp"), col(idCol).as("a_id"))
      .join(filtered.select(col("fp"), col(idCol).as("b_id")), Seq("fp"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
    materializeReleasing(pairs, fps)
  }

  /** SimHash near-dup candidate pairs at Hamming distance <= maxDist,
    * found scalably by the block trick: split the 64-bit simhash into
    * (maxDist+1) blocks — any pair within maxDist must agree on at least
    * one full block (pigeonhole), so candidates come from equi-joins on
    * block values, never an all-pairs scan.
    */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", maxDist: Int = 3): DataFrame = {
    val nBlocks = maxDist + 1
    val width = 64 / nBlocks
    val withSig = docs.select(col(idCol), col(textCol))
      .withColumn("sig", expr(s"simhash64($textCol)"))
    val blockStructs = (0 until nBlocks).map { b =>
      struct(lit(b).as("blk"),
        shiftrightunsigned(col("sig"), b * width).bitwiseAND(
          lit((1L << width) - 1)).as("bval"))
    }
    val blocked = withSig.select(col(idCol), col("sig"),
      explode(array(blockStructs: _*)).as("p"))
      .select(col(idCol), col("sig"), col("p.blk"), col("p.bval"))
    val l = blocked.select(col("blk"), col("bval"),
      col(idCol).as("a_id"), col("sig").as("a_sig"))
    val r = blocked.select(col("blk"), col("bval"),
      col(idCol).as("b_id"), col("sig").as("b_sig"))
    l.join(r, Seq("blk", "bval")).where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).as("hamming"))
      .where(col("hamming") <= maxDist)
      .dropDuplicates("a_id", "b_id")
  }

  /** Segment-level exact dedup — the "paragraph/line dedup" pass of
    * modern pretraining pipelines (Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better"; RefinedWeb's
    * line-level boilerplate removal): split each document into
    * segments, drop every segment whose exact text appears in >=
    * minDocFreq DISTINCT documents (cross-corpus boilerplate:
    * navigation chrome, license headers, cookie banners), and
    * reassemble each document from its surviving segments in order.
    *
    * Segmentation is delimiter-based when the corpus has newlines
    * (`delimiter = "\n"`); for single-line corpora a fixed
    * words-per-segment window applies (`wordsPerSegment`). Both are
    * computed per-row with codegen HOFs (split/slice/array_join) — the
    * corpus is never shuffled to segment it.
    *
    * Scale shape: ONE explode (rows ∝ total segments), one count
    * shuffle keyed on segment text, one LEFT ANTI join back (shuffle
    * keyed on segment — the duplicate set is corpus-sized in the worst
    * case, so no broadcast), one reassembly shuffle keyed on doc id.
    * All joins are equi-joins; nothing is quadratic, nothing collects.
    */
  def segmentDedup(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text",
                   delimiter: String = "",
                   wordsPerSegment: Int = 3,
                   minDocFreq: Int = 2): DataFrame = {
    val segsCol: Column =
      if (delimiter.nonEmpty) split(col(textCol), java.util.regex.Pattern.quote(delimiter))
      else {
        val words = split(col(textCol), " ")
        val nseg = ceil(size(words).cast("double") / lit(wordsPerSegment.toDouble)).cast("int")
        transform(sequence(lit(0), greatest(nseg, lit(1)) - 1),
          i => array_join(
            slice(words, i * wordsPerSegment + 1, lit(wordsPerSegment)), " "))
      }
    val glue = if (delimiter.nonEmpty) delimiter else " "
    // exploded segments feed two consumers (the doc-frequency count and
    // the anti-join's probe side) — cache so the per-row segmentation
    // runs once, not per consumer; sized ∝ total segments, the same set
    // both passes must read anyway. Released before returning — see
    // materializeReleasing
    val seg = spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), posexplode(segsCol).as(Seq("spos", "segment")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = seg.groupBy("segment")
      .agg(count_distinct(col(idCol)).as("__ndocs"))
      .where(col("__ndocs") >= minDocFreq)
      .select("segment")
    val kept = seg.join(dup, Seq("segment"), "left_anti")
    val perDoc = kept.groupBy(col(idCol))
      .agg(
        concat_ws(glue,
          transform(array_sort(collect_list(struct(col("spos"), col("segment")))),
            s => s("segment"))).as("clean_text"),
        count(lit(1)).as("__n_kept"))
    // per-doc segment count from the CACHED seg (max 0-based position
    // + 1 ≡ size(segsCol); every doc yields >= 1 segment row) — the
    // docs-side respelling re-ran the whole segmentation just to size
    // the arrays
    val out = seg
      .groupBy(col(idCol))
      .agg((max(col("spos")) + 1).cast("long").as("__n_seg"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("__n_seg") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"))
    materializeReleasing(out, seg)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication over document embeddings. Cluster the embedding
    * space with k-means, compare vectors ONLY within their cluster
    * (the paper's move that makes semantic dedup sub-quadratic), link
    * pairs above the cosine threshold, and keep one representative
    * (the min id) per connected semantic-duplicate group.
    *
    * Returns one row per vector: (idCol, cluster, component, keep) —
    * `keep = false` marks semantic duplicates to drop; survivors are
    * the `keep = true` rows.
    *
    * Scale shape: centroid training is sample-bounded
    * ([[graft.operators.Knn.kmeansCentroids]] — Lloyd passes over a
    * <= 200k-row seeded sample, k·dim floats on the driver); cluster
    * assignment is a map-side codegen kernel (`best_centroid`, no
    * join); the pair join is an equi-join on cluster id, so candidate
    * count is Σ |cluster|² — bounded by cluster granularity, never
    * |corpus|². Two guards keep that bound real at corpus scale:
    * k grows with the corpus (k >= n / maxClusterRows, capped at 4096
    * so the shipped centroid table stays bounded), and any cluster
    * that STILL exceeds maxClusterRows (skew, degenerate centroids) is
    * sub-bucketed by multi-table sign-LSH — pairs then join on
    * (cluster, table, bucket), the same move [[embedNearDupPairs]]
    * makes, so one hot cluster can no longer degenerate toward
    * all-pairs. Grouping is min-label propagation
    * ([[connectedComponents]]), one join per round, O(diameter)
    * rounds. */
  def semanticDedup(vectors: DataFrame, threshold: Double = 0.96,
                    nClusters: Int = 16, iters: Int = 3,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    dim: Int = 64, maxClusterRows: Long = 100000L,
                    subTables: Int = 4): DataFrame = {
    val n = vectors.count()
    val k = math.min(4096L, math.max(nClusters.toLong,
      n / math.max(1L, maxClusterRows) + 1)).toInt
    val (cids, cents) =
      Knn.kmeansCentroids(vectors, k, iters, idCol, vecCol, dim,
        totalHint = n) // row count known — skip kmeans' own count pass
    // assignment feeds four consumers (the hot-cluster count, both
    // pair-join sides, the final labeling join) — cache so the
    // best_centroid scan runs once; released before returning — see
    // materializeReleasing
    val assigned = vectors
      .withColumn("cluster", call_function("best_centroid", col(vecCol),
        typedLit(cids.toSeq), typedLit(cents.map(_.toSeq).toSeq)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = semanticCandidates(assigned, maxClusterRows, subTables,
      idCol, vecCol, dim)
    val pairs = cand
      .select(col("a_id"), col("b_id"),
        Knn.cosine(col("av"), col("bv")).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
    val comp =
      connectedComponents(pairs, vectors.select(col(idCol).as("id")), "id")
    val out = assigned.join(comp, assigned(idCol) === comp("id"))
      .select(col(idCol), col("cluster"), col("component"),
        (col(idCol) === col("component")).as("keep"))
    materializeReleasing(out, assigned)
  }

  /** Candidate pairs for [[semanticDedup]]: rows of clusters within the
    * row cap pair on cluster id alone; rows of oversized clusters carry
    * a multi-table sign-LSH sub-bucket key so their pair count is
    * Σ |bucket|² instead of |cluster|². Plane count is sized so the
    * hottest cluster's expected bucket lands near the cap. Recall within
    * an oversized cluster follows the LSH-table trade (subTables chances
    * for a near pair to share a bucket) — the exact posture
    * [[embedNearDupPairs]] already documents. */
  private[graft] def semanticCandidates(assigned: DataFrame,
                                        maxClusterRows: Long, subTables: Int,
                                        idCol: String, vecCol: String,
                                        dim: Int): DataFrame = {
    // one row per cluster (<= 4096), only the oversized ones collected
    val hot = assigned.groupBy("cluster").agg(count(lit(1)).as("n"))
      .where(col("n") > maxClusterRows)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (hot.isEmpty) {
      val l = assigned.select(col("cluster"),
        col(idCol).as("a_id"), col(vecCol).as("av"))
      val r = assigned.select(col("cluster"),
        col(idCol).as("b_id"), col(vecCol).as("bv"))
      l.join(r, Seq("cluster")).where(col("a_id") < col("b_id"))
    } else {
      // candidate volume across tables is ~ subTables/2^planes of the
      // cluster's all-pairs — fold the table count into the plane count
      // so the UNION of the tables' candidates still lands near the cap
      val planes = math.min(20, math.max(1,
        math.ceil(math.log(hot.map(_._2).max.toDouble * subTables /
          math.max(1L, maxClusterRows)) / math.log(2.0)).toInt))
      val hotIds = hot.map(_._1).toSeq
      val cool = assigned.where(!col("cluster").isin(hotIds: _*))
        .select(col("cluster"), lit(-1).as("tbl"), lit(0L).as("bucket"),
          col(idCol), col(vecCol))
      val sub = assigned.where(col("cluster").isin(hotIds: _*))
        .select(col("cluster"), col(idCol), col(vecCol),
          posexplode(call_function("lsh_buckets", col(vecCol),
            lit(subTables), lit(planes), lit(dim), lit(9173L)))
            .as(Seq("tbl", "bucket")))
        .select(col("cluster"), col("tbl"), col("bucket").cast("long")
          .as("bucket"), col(idCol), col(vecCol))
      val keyed = cool.unionByName(sub)
      val l = keyed.select(col("cluster"), col("tbl"), col("bucket"),
        col(idCol).as("a_id"), col(vecCol).as("av"))
      val r = keyed.select(col("cluster"), col("tbl"), col("bucket"),
        col(idCol).as("b_id"), col(vecCol).as("bv"))
      l.join(r, Seq("cluster", "tbl", "bucket"))
        .where(col("a_id") < col("b_id"))
        .dropDuplicates("a_id", "b_id")
    }
  }
}
