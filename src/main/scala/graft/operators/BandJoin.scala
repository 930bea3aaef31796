package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band (interval) join |lx - rx| < eps as a quantized-bucket equi-join.
  *
  * The reference runs band predicates on NestLoop/MergeJoin inequality
  * scans (`nodeNestloop.c`, `nodeMergejoin.c` "equi + inequality bands");
  * Spark's default is BroadcastNestedLoopJoin — O(|L|·|R|) and needs a
  * broadcastable side. Quantizing to eps-width buckets makes it an
  * equi-join: any pair with |lx-rx| < eps lands within one bucket of each
  * other, so the right side is expanded to its 3 adjacent buckets and the
  * exact predicate re-checked. Cost: 3× right-side rows through a hash
  * join — scales to any size on both sides, skew-bounded by bucket
  * population.
  */
object BandJoin {

  def bandJoin(left: DataFrame, right: DataFrame,
               leftVal: String, rightVal: String, eps: Double,
               joinType: String = "inner"): DataFrame = {
    require(eps > 0, "eps must be positive")
    // The right side is exploded into 3 bucket copies, so join types that
    // emit unmatched RIGHT rows would triplicate them. Left-preserving
    // types are sound (unmatched left rows appear once).
    require(Set("inner", "left", "leftouter", "left_outer", "leftsemi",
      "left_semi", "leftanti", "left_anti")
      .contains(joinType.toLowerCase.replace(" ", "")),
      s"bandJoin supports inner/left joins only (got '$joinType'): " +
        "right/full outer would emit exploded unmatched right rows")
    val lb = left.withColumn("__band",
      floor(col(leftVal) / eps).cast("long"))
    val rb = right
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__band", col("__off") + floor(col(rightVal) / eps).cast("long"))
      .drop("__off")
    lb.join(rb,
      lb("__band") === rb("__band") &&
        abs(col(leftVal) - col(rightVal)) < eps,
      joinType)
      .drop("__band")
  }
}
