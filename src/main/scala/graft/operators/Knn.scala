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

  /** Exact brute-force top-k cosine neighbors of each query vector.
    * The query side is broadcast (small — this is the "give me neighbors
    * of these N items" shape); the corpus is streamed once, so cost is
    * O(|Q|·N) with no shuffle of the corpus. The final top-k per query
    * is a partial TakeOrdered per partition then k·|Q| rows to merge.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
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

  /** IVF-style ANN: partition the corpus into Voronoi cells around a
    * deterministic centroid set (lowest ids — a real deployment samples/
    * k-means them), assign each vector to its best cell once, and have
    * each query probe only its nProbe closest cells. Scanning cost per
    * query ≈ nProbe/nCentroids of the corpus — the classic IVF trade;
    * recall measured against brute force in OperatorSpec. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val cents = broadcast(
      corpus.orderBy(col(idCol).asc).limit(nCentroids)
        .select(col(idCol).as("cid"), col(vecCol).as("centroid")))
    val wBest = Window.partitionBy("neighbor_id")
      .orderBy(col("cscore").desc, col("cid").asc)
    val assigned = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(cents, expr("true"))
      .select(col("neighbor_id"), col("cv"), col("cid"),
        dotd(col("cv"), col("centroid")).as("cscore"))
      .withColumn("rn", row_number().over(wBest)).where(col("rn") === 1)
      .select("cid", "neighbor_id", "cv")
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("qscore").desc, col("cid").asc)
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .join(cents, expr("true"))
      .select(col("query_id"), col("qv"), col("cid"),
        dotd(col("qv"), col("centroid")).as("qscore"))
      .withColumn("rn", row_number().over(wProbe)).where(col("rn") <= nProbe)
      .select("query_id", "qv", "cid")
    val scored = broadcast(probes).join(assigned, Seq("cid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos_sim"))
    rankTopK(scored, k)
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
