package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the Spark-native stand-in for the
  * reference's secondary access methods (`src/backend/access/nbtree/`,
  * `bitmap/bitmap.c`): where a Greengage user creates a btree or bitmap
  * index to make selective multi-column range lookups cheap, the
  * lakehouse equivalent is LAYOUT — cluster the parquet files on an
  * interleaved-bit key so every row group is a small hyper-rectangle in
  * the clustered dimensions, and the engine's ordinary min/max row-group
  * pruning (the pushed-filter machinery the scans already use) skips
  * everything outside the query box. No index structure to maintain, no
  * per-query lookup — the data IS the index.
  *
  * [[zorderValue]] builds the Morton key as a pure codegen expression:
  * each dimension is min/max-normalized to `bits` levels (one tiny
  * 1-row aggregate computes the ranges), then the bit planes are
  * interleaved with shift/or — a static expression tree, no UDF. At
  * write time `repartitionByRange(zval)` + `sortWithinPartitions(zval)`
  * gives globally range-clustered files whose row groups are tight
  * boxes. Linear cost: one pass to write, the same pass any CTAS pays.
  */
object ZOrder {

  /** Morton interleave of already-normalized [0, 2^bits) long columns:
    * bit i of dimension j lands at position i*k + j. */
  private[graft] def interleave(dims: Seq[Column], bits: Int): Column = {
    val k = dims.length
    val terms = for {
      i <- 0 until bits
      (d, j) <- dims.zipWithIndex
    } yield shiftleft(shiftright(d, i).bitwiseAND(1L), i * k + j)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Normalize a numeric column to [0, 2^bits) given its range. */
  private def normalize(c: Column, min: Double, max: Double,
                        bits: Int): Column = {
    val span = max - min
    if (span <= 0) lit(0L)
    else least(
      ((c.cast("double") - lit(min)) / lit(span) * lit((1L << bits) - 1))
        .cast("long"),
      lit((1L << bits) - 1))
  }

  /** The Morton key for `cols` over `df`'s value ranges. `bits` levels
    * per dimension (16 bits x up to 4 dims stays in a long). */
  def zorderValue(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.nonEmpty && cols.length * bits <= 63,
      s"${cols.length} dims x $bits bits must fit in a long")
    val rangeCols = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val agg = df.agg(rangeCols.head, rangeCols.tail: _*)
      .head() // 1-row range aggregate — the only non-lazy step
    val dims = cols.zipWithIndex.map { case (c, i) =>
      // empty table / all-NULL column: min/max are NULL — that dimension
      // carries no order, so its key contribution is a constant 0
      if (agg.isNullAt(2 * i) || agg.isNullAt(2 * i + 1)) lit(0L)
      else normalize(col(c), agg.getDouble(2 * i), agg.getDouble(2 * i + 1), bits)
    }
    interleave(dims, bits)
  }

  /** Write `df` clustered on the Morton key of `cols`: range-partition
    * by the key (`files` output files ≈ `files` key ranges), sort within
    * each, drop the key. Readers need nothing special — min/max
    * row-group pruning on the clustered columns does the skipping. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    files: Int = 8, bits: Int = 16): Unit =
    df.withColumn("__z", zorderValue(df, cols, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
