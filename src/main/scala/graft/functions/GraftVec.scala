package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** JVM kernels for vector/minhash hot loops. Spark's higher-order
  * functions (zip_with/aggregate lambdas) evaluate interpreted per row —
  * fine for control queries, ruinous for numeric kernels (they dominated
  * the sf0.1 bench). These expressions run tight JVM loops and stay
  * inside whole-stage codegen via static calls.
  */
object GraftVec {

  /** Sequential-fold dot product, bit-identical to
    * aggregate(zip_with(a,b,(x,y)=>double(x)*double(y)), 0.0, +) —
    * KNN oracle parity depends on this exact fold order. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  // Deterministic plane matrices for sign-LSH, cached per parameter set
  // (literal plane arrays inlined in codegen overflow Janino's 64 KB
  // method limit at nTables*nPlanes*dim scale).
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  private def planesFor(nTables: Int, nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    planeCache.computeIfAbsent(s"$nTables:$nPlanes:$dim:$seed", _ => {
      val rnd = new java.util.Random(seed)
      Array.fill(nTables * nPlanes, dim)(rnd.nextGaussian())
    })

  /** All per-table sign-LSH buckets of a vector in one call:
    * out[t] = Σ_j (dot(v, plane[t*nPlanes+j]) >= 0) << j. */
  def lshBuckets(vec: ArrayData, vecFloat: Boolean, nTables: Int,
                 nPlanes: Int, dim: Int, seed: Long): ArrayData = {
    val ps = planesFor(nTables, nPlanes, dim, seed)
    val n = math.min(vec.numElements(), dim)
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (vecFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val out = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0
      var j = 0
      while (j < nPlanes) {
        val p = ps(t * nPlanes + j)
        var s = 0.0
        var k = 0
        while (k < n) { s += v(k) * p(k); k += 1 }
        if (s >= 0) bucket |= (1 << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  private def dotCentroid(vec: ArrayData, vecFloat: Boolean, cent: Array[Double]): Double = {
    val n = math.min(vec.numElements(), cent.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (vecFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      s += x * cent(i)
      i += 1
    }
    s
  }

  /** Argmax-dot centroid id (ties: lowest id) — IVF cell assignment as a
    * single projection over a plan-shipped centroid matrix. Replaces the
    * corpus×centroids join + per-vector window (a 16N-row shuffle at scale)
    * with zero joins and zero shuffles. */
  def bestCentroid(vec: ArrayData, vecFloat: Boolean,
                   cids: Array[Long], cents: Array[Array[Double]]): Long = {
    var best = Double.NegativeInfinity
    var bestId = Long.MaxValue
    var t = 0
    while (t < cents.length) {
      val s = dotCentroid(vec, vecFloat, cents(t))
      if (s > best || (s == best && cids(t) < bestId)) { best = s; bestId = cids(t) }
      t += 1
    }
    bestId
  }

  /** Top-nProbe centroid ids by dot score (desc, id asc) — the query-side
    * probe list, same ordering contract as [[bestCentroid]]. */
  def topCentroids(vec: ArrayData, vecFloat: Boolean,
                   cids: Array[Long], cents: Array[Array[Double]],
                   nProbe: Int): ArrayData = {
    val n = cents.length
    val scores = new Array[Double](n)
    var t = 0
    while (t < n) { scores(t) = dotCentroid(vec, vecFloat, cents(t)); t += 1 }
    val idx = Array.range(0, n).sortBy(i => (-scores(i), cids(i)))
    val k = math.min(nProbe, n)
    val out = new Array[Long](k)
    var j = 0
    while (j < k) { out(j) = cids(idx(j)); j += 1 }
    new GenericArrayData(out)
  }

  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature over a shingle array: base = xxh64(shingle bytes),
    * sig[i] = min over shingles of splitmix64(base ^ mix(i)). Pure JVM
    * (Long arithmetic wraps — no ANSI overflow concerns outside SQL). */
  def minhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val m = shingles.numElements()
    val bases = new Array[Long](m)
    var j = 0
    while (j < m) {
      val s = shingles.getUTF8String(j)
      bases(j) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      j += 1
    }
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val mixI = splitmix64(i.toLong)
      var best = Long.MaxValue
      var k = 0
      while (k < m) {
        val h = splitmix64(bases(k) ^ mixI)
        if (h < best) best = h
        k += 1
      }
      sig(i) = best
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Word k-gram shingling in one JVM pass (split + slide + distinct).
  * Semantics identical to the SQL-oracle formulation: split on single
  * space (empties preserved), k-grams joined by one space, distinct;
  * texts shorter than k words yield one whole-text shingle. */
object GraftShingle {
  def shingles(text: org.apache.spark.unsafe.types.UTF8String, k: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < k)
      return new GenericArrayData(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString(words.mkString(" "))))
    val seen = new java.util.LinkedHashSet[String](words.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + k <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) {
      out(n) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      n += 1
    }
    new GenericArrayData(out)
  }
}

/** `word_shingles(text, k)` — distinct word k-grams. */
case class WordShingles(child: Expression, k: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(v: Any): Any =
    GraftShingle.shingles(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftShingle.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** `vec_dot(a, b)` — codegen'd sequential dot product over
  * ARRAY<FLOAT>/ARRAY<DOUBLE>. */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.GraftVec.dot($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** `lsh_buckets(vec)` — all multi-table sign-LSH bucket keys for a vector
  * (engine-internal). */
case class LshBuckets(child: Expression, nTables: Int, nPlanes: Int,
                      dim: Int, seed: Long)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(v: Any): Any =
    GraftVec.lshBuckets(v.asInstanceOf[ArrayData], isFloat, nTables, nPlanes, dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftVec.lshBuckets($c, $isFloat, $nTables, $nPlanes, $dim, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

/** `best_centroid(vec, cids, centroids)` — IVF cell assignment: argmax-dot
  * centroid id over a driver-resident centroid set (the MLlib KMeansModel
  * pattern — O(nCentroids·dim) data shipped with the serialized plan, not
  * joined). Codegen passes the matrix via addReferenceObj so Janino never
  * sees it inline. */
case class BestCentroid(child: Expression, cids: Array[Long],
                        cents: Array[Array[Double]])
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "best_centroid"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def compute(v: ArrayData): Long =
    GraftVec.bestCentroid(v, isFloat, cids, cents)

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bestCentroid", this, classOf[BestCentroid].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BestCentroid =
    copy(child = newChild)
}

/** `top_centroids(vec, nProbe, cids, centroids)` — the query-side IVF probe
  * list (nProbe best cells, score desc / id asc). */
case class TopCentroids(child: Expression, nProbe: Int, cids: Array[Long],
                        cents: Array[Array[Double]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "top_centroids"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def compute(v: ArrayData): ArrayData =
    GraftVec.topCentroids(v, isFloat, cids, cents, nProbe)

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topCentroids", this, classOf[TopCentroids].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TopCentroids =
    copy(child = newChild)
}

/** `minhash_sig(shingles, n)` — MinHash signature array (engine-internal;
  * LSH bucketing only, so no SQL-oracle parity requirement). */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(v: Any): Any =
    GraftVec.minhashSig(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftVec.minhashSig($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
