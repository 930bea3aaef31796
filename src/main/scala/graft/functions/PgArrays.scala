package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PG multi-dimensional array surface (reference
  * `src/backend/utils/adt/arrayfuncs.c`): N-d arrays map to nested
  * Spark ArrayType (SURVEY §1.2); PG requires rectangular N-d arrays,
  * so the first element's extent is THE extent of its dimension.
  */
object PgArrays {

  /** PG `array_dims(anyarray)` (arrayfuncs.c:1654): the `[lo:hi]` text
    * per dimension. Arrays built by ARRAY[...] have lower bound 1 — the
    * only lower bound this engine's nested model produces. NULL for an
    * empty array, as in PG. */
  def arrayDims(m: Column, ndims: Int): Column = {
    val sizes = (0 until ndims).map { d =>
      var cur: Column = m
      (0 until d).foreach(_ => cur = element_at(cur, 1))
      size(cur)
    }
    when(size(m) > 0,
      concat(sizes.flatMap(s =>
        Seq(lit("[1:"), s.cast("string"), lit("]"))): _*))
  }

  /** PG `generate_subscripts(anyarray, dim)` (arrayfuncs.c
    * generate_subscripts): the 1-based subscript range of one
    * dimension, as an array to explode (lower bound is always 1 in
    * this engine's nested model). Empty array → empty range. */
  def generateSubscripts(m: Column, dim: Int): Column = {
    var cur: Column = m
    // try_element_at: descending past an empty outer array must yield
    // the empty range, not ANSI INVALID_ARRAY_INDEX (the descent sits in
    // the when() CONDITION, which is always evaluated)
    (1 until dim).foreach(_ => cur = try_element_at(cur, lit(1)))
    when(size(cur) > 0, sequence(lit(1), size(cur)))
      .otherwise(array().cast("array<int>"))
  }

  /** PG `array_positions(anyarray, elem)` (arrayfuncs.c
    * array_positions): 1-based positions of every occurrence. */
  def arrayPositions(m: Column, elem: Column): Column =
    filter(when(size(m) > 0, sequence(lit(1), size(m)))
      .otherwise(array().cast("array<int>")),
      i => element_at(m, i) <=> elem)

  /** PG `array_fill(value, ARRAY[n])` / `ARRAY[m, n]` (arrayfuncs.c
    * array_fill): a rectangular array of copies. */
  def arrayFill(value: Column, dims: Seq[Int]): Column =
    dims.foldRight(value)((n, inner) => array_repeat(inner, n))

  /** intarray `uniq(int[])` (contrib/intarray/_int_tool.c): ADJACENT
    * duplicate removal — `uniq(sort(a))` is the canonical full-dedup
    * idiom, but uniq alone keeps non-adjacent repeats, unlike Spark's
    * array_distinct. A codegen-native expression (was a
    * filter-over-sequence HOF pair — interpreted, ~3× slower). */
  def adjacentUniq(a: Column): Column = call_function("adjacent_uniq", a)

  /** Runtime of [[AdjacentUniq]] — called from generated code. Adjacent
    * nulls collapse (null-safe-equal semantics, matching the previous
    * `<=>` formulation; PG intarray itself rejects nulls). */
  def adjacentUniqData(
      a: org.apache.spark.sql.catalyst.util.ArrayData
  ): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = a.numElements()
    if (n <= 1) return a
    val out = new Array[Any](n)
    var k = 0
    var prevNull = false
    var prev = 0
    var i = 0
    while (i < n) {
      val isNull = a.isNullAt(i)
      val v = if (isNull) 0 else a.getInt(i)
      if (i == 0 || isNull != prevNull || (!isNull && v != prev)) {
        out(k) = if (isNull) null else java.lang.Integer.valueOf(v)
        k += 1
      }
      prevNull = isNull; prev = v
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], k))
  }

  // ------------------------------------------------------------------
  // Non-default lower bounds (arrayfuncs.c array_lower/array_upper,
  // array_set_slice bounds bookkeeping): PG arrays carry per-dimension
  // lower bounds; `array_fill(v, ARRAY[n], ARRAY[lo])` and slice
  // assignment produce them. The Spark carrier is struct('lb', 'data'):
  // subscripts translate by lb, out-of-bounds reads yield NULL (PG
  // subscript semantics), and slices re-base to lower bound 1 exactly
  // as PG slice expressions do. All plain codegen column algebra.
  // ------------------------------------------------------------------

  /** Wrap a 1-based array as one with logical lower bound `lb`. */
  def lbArray(data: Column, lb: Int): Column =
    struct(lit(lb).as("lb"), data.as("data"))

  /** PG `array_fill(value, ARRAY[n], ARRAY[lo])`. */
  def arrayFillLb(value: Column, n: Int, lb: Int): Column =
    lbArray(array_repeat(value, n), lb)

  /** PG `array_lower(a, 1)` — NULL for an empty array, as in PG. */
  def arrayLower(a: Column): Column =
    when(size(a.getField("data")) > 0, a.getField("lb"))

  /** PG `array_upper(a, 1)`. */
  def arrayUpper(a: Column): Column =
    when(size(a.getField("data")) > 0,
      a.getField("lb") + size(a.getField("data")) - 1)

  /** PG `a[i]` honoring the lower bound: out-of-bounds → NULL (never an
    * ANSI index error — the element_at only evaluates in-bounds). */
  def lbSubscript(a: Column, i: Column): Column = {
    val data = a.getField("data")
    val idx = i - a.getField("lb") + 1
    when(idx >= 1 && idx <= size(data), element_at(data, idx))
  }

  /** PG `a[lo:hi]` honoring the lower bound: clamped to the extent,
    * inverted ranges empty; the result re-bases to lower bound 1 (PG
    * slice expressions do the same). */
  def lbSlice(a: Column, lo: Column, hi: Column): Column = {
    val data = a.getField("data")
    val lb = a.getField("lb")
    val loC = greatest(lo, lb)
    val hiC = least(hi, lb + size(data) - 1)
    slice(data, loC - lb + 1, greatest(hiC - loC + 1, lit(0)))
  }

  /** PG `array_dims(a)` text with the real bounds, e.g. `[-2:0]`. */
  def lbDims(a: Column): Column =
    when(size(a.getField("data")) > 0,
      concat(lit("["), arrayLower(a).cast("string"), lit(":"),
        arrayUpper(a).cast("string"), lit("]")))

  /** PG 2-d slice `m[rlo:rhi][clo:chi]` (arrayfuncs.c array_get_slice):
    * 1-based inclusive bounds on every dimension, clamped to the array's
    * extent — slicing past the end returns what exists, an inverted
    * range yields an empty array. */
  def slice2d(m: Column, rlo: Int, rhi: Int, clo: Int, chi: Int): Column =
    transform(slice(m, rlo, math.max(0, rhi - rlo + 1)),
      row => slice(row, clo, math.max(0, chi - clo + 1)))
}

/** intarray `uniq(int[])` as a codegen-native unary expression (kept
  * out of the HOF path: a per-row filter-over-sequence lambda pair
  * evaluates interpreted and breaks whole-stage codegen). */
case class AdjacentUniq(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: org.apache.spark.sql.types.DataType = child.dataType
  override def prettyName: String = "adjacent_uniq"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"adjacent_uniq expects array<int> (intarray), got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    PgArrays.adjacentUniqData(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PgArrays.adjacentUniqData($c)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): AdjacentUniq =
    copy(child = newChild)
}
