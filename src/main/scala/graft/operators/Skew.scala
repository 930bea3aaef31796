package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual complement to AQE's runtime
  * skew-join splitting (reference analog: ORCA's skew-aware plans,
  * `gporca/data/dxl/minidump/BroadcastSkewedHashjoin.mdp`,
  * `AggregateWithSkew.mdp`).
  *
  * At 100 TB a single hot key (null user_id, empty document, default
  * enum) can pin one reducer for hours. Salting fans a hot key across
  * `saltFactor` reducers:
  *  - aggregation: two-stage — partial agg on (key, salt), final on key;
  *  - join: replicate the small side once per salt value (explode), salt
  *    the large side randomly-but-deterministically, join on (key, salt).
  */
object Skew {

  /** Deterministic pseudo-random salt derived from the whole row of
    * `entropy` columns (no rand(): results stay reproducible and
    * partition-invariant). */
  def saltCol(saltFactor: Int, entropy: Column*): Column =
    pmod(xxhash64(entropy: _*), lit(saltFactor)).cast("int")

  /** Two-stage skew-safe aggregation: sums/counts computed per
    * (key, salt) then combined per key. Provide the partial aggregates
    * as (alias → partial expr, alias → final expr-over-partials). */
  def saltedCountSum(df: DataFrame, keyCols: Seq[String], sumCol: Column,
                     saltFactor: Int, entropy: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(saltFactor, entropy: _*))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(sumCol).as("__s"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("s"))
  }

  /** Skew-safe equi-join of a large (skewed) side with a small side:
    * small side exploded `saltFactor`×, large side salted, join key
    * becomes (key, salt) — hot keys spread over saltFactor reducers. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int, entropy: Seq[Column],
                 joinType: String = "inner"): DataFrame = {
    // The small side is exploded saltFactor times, so join types that emit
    // unmatched SMALL-side rows would duplicate them saltFactor×. The
    // large (salted) side is preserved exactly once per row.
    require(Set("inner", "left", "leftouter", "left_outer", "leftsemi",
      "left_semi", "leftanti", "left_anti")
      .contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left joins only (got '$joinType'): " +
        "right/full outer would emit exploded unmatched small-side rows")
    val saltedLarge = large.withColumn("__salt", saltCol(saltFactor, entropy: _*))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLarge.join(explodedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
