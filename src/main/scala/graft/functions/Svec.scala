package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse vector (`svec`) surface — reference
  * `gpcontrib/gp_sparse_vector/` (SparseData.c RLE storage; operator/
  * function catalog in `gp_sparse_vector--1.0.1.sql:45-113`). The
  * reference stores a float8 vector as run-length-encoded (count, value)
  * pairs so long zero runs cost bytes instead of 8·n, and implements
  * vector arithmetic, norms and a document-featurizer over that format.
  *
  * Spark-native model: `array<struct<cnt:int, v:double>>`, position order.
  * The RLE struct is what lands in parquet (the storage win the extension
  * exists for); run-direct operations (norms, sums, scaling — everything
  * below marked "run-direct") never materialize the dense form, mirroring
  * SparseData.c's run-at-a-time loops. Elementwise binary ops go through
  * `zip_with` on the dense form inside one codegen expression — aligned
  * run-merge is what SparseData's op_sdata_by_sdata does natively; the
  * dense zip is the idiomatic-Spark equivalent and stays in whole-stage
  * codegen (no UDF).
  *
  * Lambda rule (same as [[Ranges]]): a DERIVED array referenced inside a
  * lambda re-evaluates per element — materialize intermediate arrays with
  * `.withColumn` before folding over them ([[boundaries]]/[[compressOf]]
  * split exists for exactly this).
  */
object Svec {

  private val svecType = "array<struct<cnt:int,v:double>>"

  /** 1-based positions where a new run starts (i = 1 or d[i] ≠ d[i-1]).
    * NaN-free contract (NaN ≠ NaN would split every element into its own
    * run — harmless, but not canonical RLE). Empty input → empty result
    * (the when-guard keeps sequence(1, 0) out of the evaluated branch, so
    * materializing boundaries as its own column is safe for any input). */
  def boundaries(dense: Column): Column =
    when(size(dense) > 0,
      filter(sequence(lit(1), greatest(size(dense), lit(1))), i =>
        i === 1 || element_at(dense, i) =!= element_at(dense, i - 1)))
      .otherwise(array().cast("array<int>"))

  /** RLE-encode over already-materialized boundaries (svec_in / the
    * float8[]::svec cast, SparseData.c makeSparseDataFromDouble). */
  def compressOf(dense: Column, bs: Column): Column = {
    val nb = size(bs)
    when(size(dense) > 0,
      transform(sequence(lit(1), nb), k =>
        struct(
          (when(k < nb, element_at(bs, k + 1))
            .otherwise(size(dense) + 1) - element_at(bs, k)).cast("int").as("cnt"),
          element_at(dense, element_at(bs, k)).as("v"))))
      .otherwise(array().cast(svecType))
  }

  /** One-shot compress. Fine for modest vectors; for wide vectors
    * materialize [[boundaries]] first (lambda re-eval rule). */
  def compress(dense: Column): Column = compressOf(dense, boundaries(dense))

  /** Dense float8[] image (svec_out / ::float8[] cast). */
  def decompress(sv: Column): Column =
    flatten(transform(sv, r => array_repeat(r.getField("v"), r.getField("cnt"))))

  // ---- run-direct (never materialize the dense vector) ----

  /** Logical dimension Σ cnt (svec dimension(), SparseData totalCount). */
  def dimension(sv: Column): Column =
    aggregate(sv, lit(0), (acc, r) => acc + r.getField("cnt"))

  /** `vec_sum` (svec_summate): Σ cnt·v. */
  def vecSum(sv: Column): Column =
    aggregate(sv, lit(0.0d), (acc, r) =>
      acc + r.getField("cnt").cast("double") * r.getField("v"))

  /** `l1norm` (svec_l1norm): Σ cnt·|v|. */
  def l1norm(sv: Column): Column =
    aggregate(sv, lit(0.0d), (acc, r) =>
      acc + r.getField("cnt").cast("double") * abs(r.getField("v")))

  /** `l2norm` (svec_l2norm): √(Σ cnt·v²). */
  def l2norm(sv: Column): Column =
    sqrt(aggregate(sv, lit(0.0d), (acc, r) =>
      acc + r.getField("cnt").cast("double") * r.getField("v") * r.getField("v")))

  /** `vec_count_nonzero` / legacy `count_vec` semantics for one vector:
    * number of nonzero entries. */
  def countNonzero(sv: Column): Column =
    aggregate(sv, lit(0), (acc, r) =>
      acc + when(r.getField("v") =!= 0.0d, r.getField("cnt")).otherwise(lit(0)))

  /** Scalar ops stay RLE (operators.c svec ⊕ float8): runs keep their
    * shape — adjacent runs that become equal (e.g. ×0) are not re-merged,
    * which decompresses identically; [[canonical]] re-merges if needed. */
  def scalarMult(sv: Column, k: Column): Column =
    transform(sv, r => struct(r.getField("cnt").as("cnt"),
      (r.getField("v") * k).as("v")))

  def scalarAdd(sv: Column, k: Column): Column =
    transform(sv, r => struct(r.getField("cnt").as("cnt"),
      (r.getField("v") + k).as("v")))

  /** `pow(svec, k)` elementwise on runs (svec_pow). */
  def svecPow(sv: Column, k: Column): Column =
    transform(sv, r => struct(r.getField("cnt").as("cnt"),
      pow(r.getField("v"), k).as("v")))

  /** `log(svec)` elementwise natural log on runs (svec_log). */
  def svecLog(sv: Column): Column =
    transform(sv, r => struct(r.getField("cnt").as("cnt"),
      log(r.getField("v")).as("v")))

  /** Canonical RLE form: decompress + recompress merges equal-valued
    * adjacent runs (what svec_eq compares through). */
  def canonical(sv: Column): Column = compress(decompress(sv))

  /** `svec_eq`: value equality through the canonical form. */
  def svecEq(a: Column, b: Column): Column = canonical(a) === canonical(b)

  // ---- elementwise binary ops (dense zip inside one codegen expr) ----

  /** `svec_plus` (a + b). Returns the DENSE result; wrap in [[compress]]
    * when storing. A true NULL when logical dimensions differ (the
    * reference errors on dimension mismatch, operators.c check_dimension
    * — null is the declarative analog; a bare zip_with would instead pad
    * with null ELEMENTS, which compress() would RLE-encode into a
    * malformed svec). */
  def plusDense(a: Column, b: Column): Column = zipDense(a, b, _ + _)

  def minusDense(a: Column, b: Column): Column = zipDense(a, b, _ - _)

  def multDense(a: Column, b: Column): Column = zipDense(a, b, _ * _)

  def divDense(a: Column, b: Column): Column = zipDense(a, b, _ / _)

  private def zipDense(a: Column, b: Column,
                       f: (Column, Column) => Column): Column = {
    val da = decompress(a)
    val db = decompress(b)
    when(size(da) === size(db), zip_with(da, db, f))
  }

  /** `dot` / `%*%` (svec_dot): Σ aᵢ·bᵢ, sequential fold — same order as
    * the oracle's list_sum, so results are bit-stable. For dense FLOAT
    * embedding columns prefer [[graft.functions.GraftVec]]'s codegen
    * kernels; this variant is the double-precision svec contract. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(decompress(a), decompress(b), (x, y) => x * y),
      lit(0.0d), (acc, p) => acc + p)

  // ---- document featurizer + cross-row aggregate ----

  /** `gp_extract_feature_histogram(dictionary, words)` (gp_sfv.c): counts
    * of each dictionary term in the document, as an svec over the
    * dictionary's index space. Row-local API parity: O(|dict|·|words|)
    * per row with a literal dictionary — right for bounded feature
    * dictionaries shipped with the query (the reference broadcasts the
    * dictionary array the same way). The 100 TB doc-term path is the
    * explode → groupBy pipeline ([[graft.operators.TextAnalysis.tfidf]]);
    * this function is the fixed-dictionary featurizer built on top of the
    * same tokenization. */
  def extractFeatureHistogram(dict: Seq[String], words: Column): Column =
    compress(featureCounts(dict, words))

  /** Dense per-dictionary-term counts — [[extractFeatureHistogram]]'s
    * first half. Materialize this (and [[boundaries]] of it) as their own
    * columns before compressing when the vector is wide. */
  def featureCounts(dict: Seq[String], words: Column): Column =
    transform(array(dict.map(lit): _*),
      d => size(filter(words, w => w === d)).cast("double"))

  /** `CREATE AGGREGATE sum(svec)` (gp_sparse_vector--1.0.1.sql:284):
    * elementwise sum of svecs across rows, per group — the doc-term
    * accumulation pattern. Shuffles by (group, position): scales linearly
    * in nonzero positions, never collects a vector to the driver. Returns
    * one row per group with the DENSE summed vector (positions absent in
    * every input row contribute 0). */
  def sumVecRows(df: DataFrame, keyCols: Seq[String], svecCol: Column): DataFrame = {
    val keys = keyCols.map(col)
    // posexplode_outer keeps a (pos=null) row for empty vectors, so a
    // group whose vectors are ALL empty still yields one output row (with
    // an empty vec) — the reference aggregate returns a row per group.
    // The when() inside collect_list nulls those marker rows out, and
    // collect_list drops nulls.
    df.select(keys :+ posexplode_outer(decompress(svecCol)).as(Seq("pos", "v")): _*)
      .groupBy(keys :+ col("pos"): _*).agg(sum(col("v")).as("s"))
      .groupBy(keys: _*)
      .agg(array_sort(collect_list(
        when(col("pos").isNotNull, struct(col("pos"), col("s"))))).as("pv"))
      .select(keys :+ transform(col("pv"), e => e.getField("s")).as("vec"): _*)
  }
}
