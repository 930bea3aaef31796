package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (ARRAY<FLOAT>). Reference analog: `gpcontrib/gp_sparse_vector`
  * (svec dot products); here re-expressed as Spark-native higher-order
  * functions so the arithmetic stays in whole-stage codegen.
  */
object Knn {

  /** Sequential-fold dot product in double precision. Deterministic
    * (left-to-right) — bit-stable across partitionings. Runs as the
    * codegen'd VecDot kernel (HOF lambdas evaluate interpreted). */
  def dotd(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def norm2(a: Column): Column = sqrt(call_function("vec_dot", a, a))

  def cosine(a: Column, b: Column): Column = dotd(a, b) / (norm2(a) * norm2(b))

  /** The partial top-k kernel encodes (id, id, score) as Dataset[(Long,
    * Long, Double)], so id columns must be BIGINT. Checked eagerly here —
    * otherwise a non-Long id surfaces as an opaque encoder error deep in
    * rankTopK. Map string/int ids to a surrogate long first. */
  private def requireLongId(df: DataFrame, idCol: String, side: String): Unit = {
    val dt = df.schema(idCol).dataType
    require(dt == org.apache.spark.sql.types.LongType,
      s"Knn $side id column '$idCol' must be BIGINT (got ${dt.simpleString}); " +
        "map other id types to a surrogate long first")
  }

  /** Exact brute-force top-k cosine neighbors of each query vector.
    * The query side is broadcast (small — this is the "give me neighbors
    * of these N items" shape); the corpus is streamed once, so cost is
    * O(|Q|·N) with no shuffle of the corpus. The final top-k per query
    * is a partial TakeOrdered per partition then k·|Q| rows to merge.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    requireLongId(corpus, idCol, "corpus")
    requireLongId(queries, idCol, "queries")
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos_sim"))
    rankTopK(scored, k)
  }

  /** Map-side partial top-k: bounded per-query heaps per partition before
    * the rank window — the partial-aggregate step of a distributed top-k.
    * Without it the window funnels every scored row of a query onto one
    * reducer (per-query skew at corpus scale). Rows evicted map-side can
    * never be in the global top-k, so results are unchanged. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val partial = scored.select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].mapPartitions { it =>
      val ord = Ordering.by[(Long, Long, Double), (Double, Long)](
        t => (-t._3, t._2)) // best first: cos desc, id asc
      val heaps = scala.collection.mutable.Map.empty[
        Long, scala.collection.mutable.PriorityQueue[(Long, Long, Double)]]
      it.foreach { row =>
        // Scala PQ is a max-heap: under ord (best = smallest tuple) the
        // head is the WORST retained row — the eviction candidate
        val h = heaps.getOrElseUpdate(row._1,
          scala.collection.mutable.PriorityQueue.empty(ord))
        if (h.size < k) h.enqueue(row)
        else if (ord.lt(row, h.head)) { h.dequeue(); h.enqueue(row) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }.toDF("query_id", "neighbor_id", "cos_sim")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    partial.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** Lloyd's k-means over the embedding column, for IVF cell quality.
    * Per iteration: cell assignment is the same broadcast-argmax
    * projection ivfTopK uses (no join/window/corpus shuffle), and new
    * centroids are per-cell per-dimension means via ONE 2-stage hash
    * aggregate (`dim` sum aggregates + count — map-side partials, k rows
    * to the driver). Assignment maximizes the dot product and the update
    * is the cell mean — the spherical-k-means variant that matches
    * cosine retrieval. Seeded from the lowest-id vectors, deterministic
    * given the corpus. Returns (cellIds, centroidMatrix) driver-side —
    * O(k·dim), the MLlib KMeansModel shape. */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      dim: Int = 64,
                      maxTrainRows: Long = 200000L,
                      totalHint: Long = -1L)
      : (Array[Long], Array[Array[Double]]) = {
    // above the threshold, train on a bounded deterministic sample
    // (seeded Bernoulli): centroid quality needs a representative set,
    // not the corpus — the standard IVF training recipe — so Lloyd
    // iterations stop scaling with corpus size. The sample is persisted
    // for the loop (iters passes over ≤ maxTrainRows rows, not N).
    // totalHint lets a caller that already counted skip the count job.
    val total = if (totalHint >= 0) totalHint else corpus.count()
    val sampled = total > maxTrainRows
    val train =
      if (sampled)
        corpus.sample(withReplacement = false,
          maxTrainRows.toDouble / total, seed = 42L).persist()
      else corpus
    try {
      val seedRows = train.orderBy(col(idCol).asc).limit(k)
        .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
        .collect()
      var cids = seedRows.map(_.getLong(0))
      var cents = seedRows.map(_.getSeq[Double](1).toArray)
      var it = 0
      while (it < iters) {
        val sums = (0 until dim).map(i =>
          sum(element_at(col(vecCol), i + 1).cast("double")).as(s"s$i"))
        val rows = train
          .withColumn("cid", call_function("best_centroid", col(vecCol),
            typedLit(cids.toSeq), typedLit(cents.map(_.toSeq).toSeq)))
          .groupBy("cid")
          .agg(count(lit(1)).as("n"), sums: _*)
          .collect() // k rows of (cid, n, dim sums) — bounded, not data-scale
        val byCid = rows.map(r => r.getLong(0) ->
          (r.getLong(1), Array.tabulate(dim)(i => r.getDouble(2 + i)))).toMap
        cents = cids.zip(cents).map { case (cid, old) =>
          byCid.get(cid) match {
            case Some((n, s)) if n > 0 => s.map(_ / n)
            case _ => old // empty cell keeps its previous centroid
          }
        }
        it += 1
      }
      (cids, cents)
    } finally if (sampled) { train.unpersist(); () }
  }

  /** All m per-subspace PQ codebooks trained together in fused passes:
    * ONE seed collect (the k lowest-id rows carry every book's seed
    * slice) and ONE aggregate job per Lloyd iteration for all books —
    * the per-book [[kmeansCentroids]] loop paid (count + seed + iters)
    * driver round-trips × m, which dominated the PQ/IVFADC entries'
    * wall time (the data per job is tiny; the job floor is not).
    * Same algorithm per book: lowest-id seeds, argmax-dot assignment
    * (`best_centroid`, per-book constants), cell-mean update, empty
    * cells keep their centroid. `train` must already be bounded
    * (callers persist a ≤maxTrainRows projection). */
  private def pqCodebooks(train: DataFrame, m: Int, dsub: Int, codes: Int,
                          iters: Int, idCol: String, vecCol: String)
      : Array[(Array[Long], Array[Array[Double]])] = {
    val seedRows = train.orderBy(col(idCol).asc).limit(codes)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
    val books = Array.tabulate(m) { b =>
      (seedRows.map(_.getLong(0)),
        seedRows.map(_.getSeq[Double](1).slice(b * dsub, (b + 1) * dsub).toArray))
    }
    var it = 0
    while (it < iters) {
      // (book, cid, subvector) exploded rows → one 2-stage hash agg for
      // every book's cell sums; m·codes groups to the driver
      val parts = (0 until m).map { b =>
        val (cids, cents) = books(b)
        val sub = slice(col(vecCol), b * dsub + 1, dsub)
        struct(lit(b).as("b"),
          call_function("best_centroid", sub,
            typedLit(cids.toSeq), typedLit(cents.map(_.toSeq).toSeq)).as("cid"),
          sub.as("sub"))
      }
      val sums = (0 until dsub).map(i =>
        sum(element_at(col("sub"), i + 1).cast("double")).as(s"s$i"))
      val rows = train
        .select(explode(array(parts: _*)).as("e"))
        .select(col("e.b").as("b"), col("e.cid").as("cid"), col("e.sub").as("sub"))
        .groupBy("b", "cid")
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
      val byKey = rows.map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), Array.tabulate(dsub)(i => r.getDouble(3 + i)))).toMap
      for (b <- 0 until m) {
        val (cids, cents) = books(b)
        books(b) = (cids, cids.zip(cents).map { case (cid, old) =>
          byKey.get((b, cid)) match {
            case Some((n, s)) if n > 0 => s.map(_ / n)
            case _ => old
          }
        })
      }
      it += 1
    }
    books
  }

  /** IVF-style ANN: partition the corpus into Voronoi cells around a
    * centroid set (trainIters=0: deterministic lowest-id seeds;
    * trainIters>0: Lloyd-refined via [[kmeansCentroids]]), assign each
    * vector to its best cell once, and have each query probe only its
    * nProbe closest cells. Scanning cost per query ≈ nProbe/nCentroids
    * of the corpus — the classic IVF trade; recall measured against
    * brute force in OperatorSpec.
    *
    * Cell assignment is a single narrow projection: the centroid set is
    * O(nCentroids·dim), collected once to the driver (the MLlib
    * KMeansModel pattern) and shipped with the serialized plan inside the
    * `best_centroid` codegen kernel. No corpus×centroids join, no
    * per-vector window — the corpus is never shuffled for assignment. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id",
              vecCol: String = "embedding",
              trainIters: Int = 0): DataFrame = {
    requireLongId(corpus, idCol, "corpus")
    requireLongId(queries, idCol, "queries")
    val (cids, cents) =
      kmeansCentroids(corpus, nCentroids, trainIters, idCol, vecCol)
    val cidsLit = typedLit(cids.toSeq)
    val centsLit = typedLit(cents.map(_.toSeq).toSeq)
    val assigned = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cid",
        call_function("best_centroid", col("cv"), cidsLit, centsLit))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("cid", explode(
        call_function("top_centroids", col("qv"), lit(nProbe), cidsLit, centsLit)))
    // Each corpus vector lives in exactly one cell and each query probes
    // distinct cells, so (query_id, neighbor_id) pairs are already unique —
    // no dedup shuffle needed (unlike lshTopK's multi-table candidates).
    val scored = broadcast(probes).join(assigned, Seq("cid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos_sim"))
    rankTopK(scored, k)
  }

  /** Product-quantization ANN (the IVFADC code path of Jégou et al.,
    * "Product Quantization for Nearest Neighbor Search", TPAMI 2011 —
    * here the flat-ADC variant): the unit-normalized vector is split
    * into `m` subvectors, each subspace gets its own `codes`-centroid
    * k-means codebook, and the corpus is encoded ONCE into an
    * m-byte-equivalent code array. Queries never touch the original
    * vectors: each query precomputes an m×codes table of subspace dot
    * products (asymmetric distance), and scoring a corpus vector is m
    * table lookups on its codes.
    *
    * THE 100 TB story is memory: dim=64 float32 vectors are 256 B; the
    * codes are m small ints — a ~30× smaller scan set, with the
    * codebooks (m·codes·dsub doubles) broadcast. Encode is one narrow
    * projection per corpus row (no shuffle); training collects only
    * k-row aggregates per Lloyd step. The ADC pass nominates refine·k
    * candidates per query and only those re-rank against the original
    * vectors (the standard ADC+refine pipeline). Recall < 1 by
    * construction — measured against brute force in OperatorSpec.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 8, codes: Int = 16, dim: Int = 64, trainIters: Int = 2,
             refine: Int = 4,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    requireLongId(corpus, idCol, "corpus")
    requireLongId(queries, idCol, "queries")
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    // unit-normalize so ADC dot products approximate cosine. The norm is
    // materialized as its own column first: referencing it inside the
    // transform lambda would re-run the O(dim) dot per ELEMENT.
    def unitized(df: DataFrame, vc: String): DataFrame = df
      .withColumn("__nrm", norm2(col(vc)))
      .withColumn("__unit",
        transform(col(vc), x => (x.cast("double") / col("__nrm")).cast("float")))
      .drop("__nrm")
    // cache the unitized projection for the duration of training: every
    // Lloyd step re-reads it, and without the cache each re-read
    // re-scans the corpus and re-normalizes. Bounded like
    // kmeansCentroids: past the threshold, train on a deterministic
    // seeded sample — one count + one sample decision for ALL books.
    val cn = unitized(corpus, vecCol)
    val trainSrc =
      boundedTrain(cn.select(col(idCol), col("__unit")), idCol).persist()
    // per-subspace codebooks via the fused all-books Lloyd loop
    // (seeded lowest-id, deterministic)
    val books: Array[(Array[Long], Array[Array[Double]])] =
      try pqCodebooks(trainSrc, m, dsub, codes, trainIters, idCol, "__unit")
      finally trainSrc.unpersist()
    // encode: one projection — per block, nearest sub-centroid's index
    val codeCol = array(Array.tabulate(m) { b =>
      val (cids, cents) = books(b)
      (array_position(typedLit(cids.toSeq),
        call_function("best_centroid", slice(col("__unit"), b * dsub + 1, dsub),
          typedLit(cids.toSeq), typedLit(cents.map(_.toSeq).toSeq))) - 1)
        .cast("int")
    }: _*)
    val encoded = cn.select(col(idCol).as("neighbor_id"), codeCol.as("__codes"))
    // query side: flat m×codes ADC table of subspace dots, materialized
    // BEFORE the join so it is computed once per query, not per pair
    val qn = unitized(queries, vecCol)
    val adcCol = concat(Array.tabulate(m) { b =>
      val (_, cents) = books(b)
      val qsub = slice(col("__unit"), b * dsub + 1, dsub)
      array(cents.indices.map(c =>
        call_function("vec_dot", qsub,
          typedLit(cents(c).map(_.toFloat).toSeq))): _*)
    }: _*)
    val q = broadcast(qn.select(col(idCol).as("query_id"), adcCol.as("__adc")))
    // ADC score = m table lookups; approximates cosine of the unit forms
    val scored = q.join(encoded, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0d), (acc, b) =>
          acc + element_at(col("__adc"),
            (b * codes + element_at(col("__codes"), b + 1) + 1).cast("int")))
          .as("cos_sim"))
    // standard ADC+refine: the quantized scan nominates refine·k
    // candidates, and only THOSE (a k-proportional set, not the corpus)
    // are re-scored exactly against the original vectors
    val cand = rankTopK(scored, k * refine).select("query_id", "neighbor_id")
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
        Seq("query_id"))
    // candidates (refine·k per query) broadcast against ONE corpus scan —
    // the corpus is never shuffled for the re-rank either
    val withVecs = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(broadcast(cand), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos_sim"))
    rankTopK(withVecs, k)
  }

  /** Driver-side IVFADC model: coarse centroids + shared residual PQ
    * codebooks — O(nCentroids·dim + m·codes·dsub) doubles, the
    * KMeansModel shape; ships with the plan inside codegen kernels. */
  final case class IvfadcModel(cids: Array[Long], cents: Array[Array[Double]],
                               books: Array[(Array[Long], Array[Array[Double]])],
                               m: Int, codes: Int, dim: Int) {
    def nCentroids: Int = cids.length
  }

  private def unitized(df: DataFrame, vc: String): DataFrame = df
    .withColumn("__nrm", norm2(col(vc)))
    .withColumn("__unit",
      transform(col(vc), x => (x.cast("double") / col("__nrm")).cast("float")))
    .drop("__nrm")

  /** Bound a training projection to kmeansCentroids' row threshold with
    * the same deterministic seeded sample — applied ONCE per training
    * set rather than once per codebook. */
  private def boundedTrain(df: DataFrame, idCol: String,
                           maxTrainRows: Long = 200000L): DataFrame = {
    val total = df.count()
    if (total > maxTrainRows)
      df.sample(withReplacement = false, maxTrainRows.toDouble / total,
        seed = 42L)
    else df
  }

  /** Assignment + residual columns for an already-unitized corpus. The
    * residual is its own materialized column (a lambda reading a derived
    * column would recompute it per element). */
  private def withResidual(cn: DataFrame, model: IvfadcModel): DataFrame = {
    val cidsLit = typedLit(model.cids.toSeq)
    val centsLit = typedLit(model.cents.map(_.toSeq).toSeq)
    cn.withColumn("cid",
        call_function("best_centroid", col("__unit"), cidsLit, centsLit))
      .withColumn("__cent",
        element_at(centsLit, array_position(cidsLit, col("cid")).cast("int")))
      .withColumn("__res",
        zip_with(col("__unit"), col("__cent"),
          (x, c) => (x.cast("double") - c).cast("float")))
  }

  /** Train the IVFADC quantizers (Jégou et al. §IV): a coarse quantizer
    * over unit vectors (cosine cells) and per-subspace codebooks on the
    * RESIDUAL (unit vector − cell centroid), shared across cells as in
    * the paper's single-residual-quantizer variant. Same Lloyd loop as
    * [[ivfTopK]]/[[pqTopK]]; past [[kmeansCentroids]]'s row threshold
    * training runs on a bounded sample — the model is driver-sized
    * either way. */
  def trainIvfadc(corpus: DataFrame, nCentroids: Int = 16, m: Int = 8,
                  codes: Int = 16, dim: Int = 64, trainIters: Int = 2,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): IvfadcModel = {
    requireLongId(corpus, idCol, "corpus")
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val cn = unitized(corpus, vecCol)
    val (cids, cents) =
      kmeansCentroids(cn, nCentroids, trainIters, idCol, "__unit", dim)
    val pre = IvfadcModel(cids, cents, Array.empty, m, codes, dim)
    // cache the residual projection for training: each Lloyd step
    // would otherwise recompute assignment + residual from the raw
    // corpus. Bounded once for all books, like pqTopK's trainSrc.
    val resDf = boundedTrain(
      withResidual(cn, pre).select(col(idCol), col("__res")), idCol).persist()
    val books: Array[(Array[Long], Array[Array[Double]])] =
      try pqCodebooks(resDf, m, dsub, codes, trainIters, idCol, "__res")
      finally resDf.unpersist()
    IvfadcModel(cids, cents, books, m, codes, dim)
  }

  /** The inverted file: (neighbor_id, cid, codes) per corpus vector —
    * ONE narrow projection, no shuffle; the only thing the ADC pass
    * ever scans. */
  def encodeIvfadc(corpus: DataFrame, model: IvfadcModel,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val dsub = model.dim / model.m
    val assigned = withResidual(unitized(corpus, vecCol), model)
    val codeCol = array(Array.tabulate(model.m) { b =>
      val (bcids, bcents) = model.books(b)
      (array_position(typedLit(bcids.toSeq),
        call_function("best_centroid", slice(col("__res"), b * dsub + 1, dsub),
          typedLit(bcids.toSeq), typedLit(bcents.map(_.toSeq).toSeq))) - 1)
        .cast("int")
    }: _*)
    assigned.select(col(idCol).as("neighbor_id"), col("cid"),
      codeCol.as("codes"))
  }

  /** ADC scan + exact refine over an inverted file (in-memory or read
    * back from a persisted index): per query an m×codes residual table
    * and one coarse dot per probed CELL, per scanned row m table
    * lookups; the top refine·k candidates re-rank exactly against the
    * original vectors. */
  private def adcScan(encoded: DataFrame, model: IvfadcModel,
                      corpus: DataFrame, queries: DataFrame, k: Int,
                      nProbe: Int, refine: Int, idCol: String,
                      vecCol: String): DataFrame = {
    val dsub = model.dim / model.m
    val cidsLit = typedLit(model.cids.toSeq)
    val centsLit = typedLit(model.cents.map(_.toSeq).toSeq)
    // query side: residual ADC table + per-probed-cell coarse dot, both
    // materialized BEFORE the join (once per query, not per pair)
    val qn = unitized(queries, vecCol)
    val adcCol = concat(Array.tabulate(model.m) { b =>
      val (_, bcents) = model.books(b)
      val qsub = slice(col("__unit"), b * dsub + 1, dsub)
      array(bcents.indices.map(c =>
        call_function("vec_dot", qsub,
          typedLit(bcents(c).map(_.toFloat).toSeq))): _*)
    }: _*)
    val probes = qn
      .select(col(idCol).as("query_id"), col("__unit"), adcCol.as("__adc"))
      .withColumn("cid", explode(call_function("top_centroids",
        col("__unit"), lit(nProbe), cidsLit, centsLit)))
      .withColumn("__coarse", call_function("vec_dot", col("__unit"),
        element_at(centsLit, array_position(cidsLit, col("cid")).cast("int"))))
      .drop("__unit")
    // equi-join on cid = only probed cells are scanned; per-pair cost is
    // the m-lookup fold
    val scored = broadcast(probes).join(encoded, Seq("cid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (col("__coarse") +
          aggregate(sequence(lit(0), lit(model.m - 1)), lit(0.0d), (acc, b) =>
            acc + element_at(col("__adc"),
              (b * model.codes + element_at(col("codes"), b + 1) + 1).cast("int"))))
          .as("cos_sim"))
    val cand = rankTopK(scored, k * refine).select("query_id", "neighbor_id")
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
        Seq("query_id"))
    val withVecs = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(broadcast(cand), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos_sim"))
    rankTopK(withVecs, k)
  }

  /** IVFADC (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011, §IV — the composition [[ivfTopK]] and
    * [[pqTopK]] each implement half of): a coarse IVF quantizer routes
    * every corpus vector to one cell, PQ codebooks are trained on the
    * RESIDUAL (unit vector − cell centroid), and each query ADC-scans
    * ONLY its nProbe probed cells' code lists:
    *
    *   `q·v ≈ q·c(v) + Σ_b adc[b][code_b(v − c(v))]`
    *
    * — the coarse term is one dot per probed CELL (not per row), and the
    * per-row work is m table lookups. This is the genuine 100 TB ANN
    * shape: the scan set is ~nProbe/nCentroids of the corpus (the factor
    * flat ADC lacks) AND each scanned row is a few bytes of codes, not a
    * dim-float vector (the factor plain IVF lacks). Recall < 1 by
    * construction — measured against brute force and flat PQ, with the
    * scanned fraction, in OperatorSpec. One-shot in-memory composition
    * of [[trainIvfadc]] → [[encodeIvfadc]] → ADC scan; for the
    * build-once / probe-many lifecycle use [[buildIvfadcIndex]] +
    * [[probeIvfadc]]. */
  def ivfadcTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 nCentroids: Int = 16, nProbe: Int = 4,
                 m: Int = 8, codes: Int = 16, dim: Int = 64,
                 trainIters: Int = 2, refine: Int = 4,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    requireLongId(queries, idCol, "queries")
    val model =
      trainIvfadc(corpus, nCentroids, m, codes, dim, trainIters, idCol, vecCol)
    val encoded = encodeIvfadc(corpus, model, idCol, vecCol)
    adcScan(encoded, model, corpus, queries, k, nProbe, refine, idCol, vecCol)
  }

  /** Persisted-index handle: the inverted file lives at
    * `<path>/inverted` PARTITIONED BY cid (one directory per cell), the
    * codebooks at `<path>/codebooks`. */
  final case class IvfadcIndex(path: String, model: IvfadcModel) {
    def invertedPath: String = path + "/inverted"
  }

  /** Build-once half of the index lifecycle (the reference's
    * CREATE INDEX analog): train, encode, and WRITE the inverted file
    * partitioned by `cid` — so a later probe prunes to its probed
    * cells' directories at the SCAN, never reading the rest of the
    * corpus' codes — plus the codebooks as a small sibling parquet so
    * the index reloads without retraining. */
  def buildIvfadcIndex(corpus: DataFrame, path: String,
                       nCentroids: Int = 16, m: Int = 8, codes: Int = 16,
                       dim: Int = 64, trainIters: Int = 2,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): IvfadcIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val model =
      trainIvfadc(corpus, nCentroids, m, codes, dim, trainIters, idCol, vecCol)
    encodeIvfadc(corpus, model, idCol, vecCol)
      .write.mode("overwrite").partitionBy("cid")
      .parquet(path + "/inverted")
    val bookRows =
      model.cids.indices.map(i =>
        ("coarse", -1, i, model.cids(i), model.cents(i).toSeq)) ++
      model.books.zipWithIndex.flatMap { case ((bcids, bcents), b) =>
        bcids.indices.map(j => ("book", b, j, bcids(j), bcents(j).toSeq))
      }
    bookRows.toDF("kind", "blk", "pos", "cid", "vec")
      .coalesce(1).write.mode("overwrite").parquet(path + "/codebooks")
    IvfadcIndex(path, model)
  }

  /** Reload a persisted index's model (no retraining, no corpus scan —
    * the codebooks parquet is O(model) bytes). */
  def loadIvfadcIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String): IvfadcIndex = {
    val rows = spark.read.parquet(path + "/codebooks").collect()
    val coarse = rows.filter(_.getString(0) == "coarse").sortBy(_.getInt(2))
    val cids = coarse.map(_.getLong(3))
    val cents = coarse.map(_.getSeq[Double](4).toArray)
    val bookRows = rows.filter(_.getString(0) == "book")
    val m = if (bookRows.isEmpty) 0 else bookRows.map(_.getInt(1)).max + 1
    val books = Array.tabulate(m) { b =>
      val br = bookRows.filter(_.getInt(1) == b).sortBy(_.getInt(2))
      (br.map(_.getLong(3)), br.map(_.getSeq[Double](4).toArray))
    }
    val codes = if (m == 0) 0 else books(0)._1.length
    val dim = cents.headOption.map(_.length).getOrElse(0)
    IvfadcIndex(path, IvfadcModel(cids, cents, books, m, codes, dim))
  }

  /** Probe-many half of the lifecycle: the probed cell set is computed
    * driver-side (bounded by nCentroids values, NOT corpus-scale) and
    * pushed into the inverted-file read as a partition filter, so the
    * scan touches ONLY the probed cells' directories — at 100 TB the
    * unprobed ~1−nProbe/nCentroids of the code lists are never opened.
    * Scoring is the same ADC + exact-refine pass as [[ivfadcTopK]];
    * with the same parameters the results are identical (training is
    * deterministic), asserted in OperatorSpec, and the pruned scan
    * shape in PlanSpec. */
  def probeIvfadc(index: IvfadcIndex, corpus: DataFrame, queries: DataFrame,
                  k: Int, nProbe: Int = 4, refine: Int = 4,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    requireLongId(queries, idCol, "queries")
    val spark = queries.sparkSession
    val model = index.model
    val cidsLit = typedLit(model.cids.toSeq)
    val centsLit = typedLit(model.cents.map(_.toSeq).toSeq)
    val probedCells = unitized(queries, vecCol)
      .select(explode(call_function("top_centroids", col("__unit"),
        lit(nProbe), cidsLit, centsLit)).as("cid"))
      .distinct().collect().map(_.getLong(0))
    val encoded = spark.read.parquet(index.invertedPath)
      .where(col("cid").isin(probedCells: _*))
    adcScan(encoded, model, corpus, queries, k, nProbe, refine, idCol, vecCol)
  }

  /** Multi-table sign-LSH ANN: L independent tables of nPlanes random
    * hyperplanes each. The corpus is hashed once per table (L rows per
    * vector — linear); each query probes its bucket plus all Hamming-1
    * neighbors in every table. Candidates per query ≈
    * L·(nPlanes+1)·N/2^nPlanes — a tunable, sublinear fraction of the
    * corpus; the 100 TB scale path (recall < 1 by construction; measured
    * against brute force in OperatorSpec).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nTables: Int = 8, nPlanes: Int = 8, dim: Int = 64,
              seed: Long = 42L, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    requireLongId(corpus, idCol, "corpus")
    requireLongId(queries, idCol, "queries")
    def buckets(vec: Column): Column = call_function("lsh_buckets",
      vec, lit(nTables), lit(nPlanes), lit(dim), lit(seed))
    // corpus: one (tbl, bucket) row per table — posexplode index = table id
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .select(col("neighbor_id"), col("cv"),
        posexplode(buckets(col("cv"))).as(Seq("tbl", "bucket")))
    // queries: own bucket + all hamming-1 probes per table
    val probeMasks = array((lit(0) +: (0 until nPlanes).map(j => lit(1 << j))): _*)
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        posexplode(buckets(col("qv"))).as(Seq("tbl", "qbucket")))
      .select(col("query_id"), col("qv"), col("tbl"),
        explode(transform(probeMasks, m => col("qbucket").bitwiseXOR(m))).as("bucket")))
    val scored = q.join(c, Seq("tbl", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos_sim"))
    rankTopK(scored, k)
  }
}
