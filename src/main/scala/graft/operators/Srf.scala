package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set-returning functions in the SELECT list (reference
  * `src/backend/executor/execQual.c:1888,2046` — `ExprMultipleResult`
  * targetlist protocol): a query like `SELECT k, generate_series(1,n),
  * unnest(arr) FROM t` expands each input row by its SRF outputs. The
  * reference implements the historic PG protocol: every SRF restarts
  * when it is exhausted until all are exhausted SIMULTANEOUSLY — the
  * row count is the least common multiple of the set sizes, and any
  * empty set makes the whole row vanish. PG 10 replaced this with
  * zip-to-longest, NULL-padding the shorter sets (nodeProjectSet.c
  * upstream); both are offered, the reference's protocol as
  * [[projectSetLcm]] and the modern one as [[projectSetZip]].
  *
  * Each SRF arrives as an ARRAY column (the materialized set — how
  * Spark's own explode lineage models sets). The rewrite is one
  * `explode(sequence(1, n))` per input row plus modular/bounded
  * indexing — a single generator in the plan, no shuffle, and the
  * expansion factor is exactly PG's. Lengths are per row; LCM is
  * computed with a bounded Euclid fold (32 steps bounds any pair of
  * 64-bit lengths), all inside codegen-able expressions.
  */
object Srf {

  /** gcd by a 32-step Euclid fold (terminates: fixpoint once y = 0). */
  private def gcd(a: Column, b: Column): Column =
    aggregate(sequence(lit(1), lit(32)),
      struct(a.cast("long").as("x"), b.cast("long").as("y")),
      (acc, _) => when(acc.getField("y") === 0L, acc)
        .otherwise(struct(acc.getField("y").as("x"),
          pmod(acc.getField("x"), acc.getField("y")).as("y"))))
      .getField("x")

  /** lcm; 0 if either side is 0 (an empty set annihilates the row
    * under the reference protocol). Exact: gcd divides l1. */
  private def lcm(l1: Column, l2: Column): Column =
    when(l1 === 0L || l2 === 0L, lit(0L))
      .otherwise((l1.cast("double") / gcd(l1, l2) * l2.cast("double"))
        .cast("long"))

  /** The reference's targetlist protocol: expand to LCM of the set
    * sizes, cycling each set; any empty set -> zero rows for that
    * input row. `srfs` maps output column name -> array column. */
  def projectSetLcm(df: DataFrame, srfs: Seq[(String, Column)]): DataFrame = {
    require(srfs.nonEmpty, "projectSet needs at least one SRF column")
    val arrd = srfs.zipWithIndex.foldLeft(df) { case (acc, ((_, c), i)) =>
      acc.withColumn(s"__srf$i", c)
    }
    val lens = srfs.indices.map(i => size(col(s"__srf$i")).cast("long"))
    val n = lens.reduce(lcm)
    val exploded = arrd
      .withColumn("__i", explode(when(n > 0L, sequence(lit(1L), n))))
    val out = srfs.zipWithIndex.map { case ((name, _), i) =>
      element_at(col(s"__srf$i"),
        (pmod(col("__i") - 1L, lens(i)) + 1L).cast("int")).as(name)
    }
    val keep = df.columns.map(col).toIndexedSeq
    exploded.select(keep ++ out: _*)
  }

  /** PG 10+ / nodeProjectSet semantics: expand to the LONGEST set,
    * NULL-padding exhausted ones; all-empty -> zero rows. */
  def projectSetZip(df: DataFrame, srfs: Seq[(String, Column)]): DataFrame = {
    require(srfs.nonEmpty, "projectSet needs at least one SRF column")
    val arrd = srfs.zipWithIndex.foldLeft(df) { case (acc, ((_, c), i)) =>
      acc.withColumn(s"__srf$i", c)
    }
    val n = srfs.indices.map(i => size(col(s"__srf$i")).cast("long"))
      .reduce(greatest(_, _))
    val exploded = arrd
      .withColumn("__i", explode(when(n > 0L, sequence(lit(1L), n))))
    val out = srfs.zipWithIndex.map { case ((name, _), i) =>
      try_element_at(col(s"__srf$i"), col("__i").cast("int")).as(name)
    }
    val keep = df.columns.map(col).toIndexedSeq
    exploded.select(keep ++ out: _*)
  }
}
