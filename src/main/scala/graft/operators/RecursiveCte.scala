package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Recursive-CTE fixpoint evaluation — the one relational feature with no
  * Spark primitive (reference `src/backend/executor/nodeRecursiveunion.c`:
  * a work-table loop). The loop itself is driver-side control flow only;
  * every iteration's data stays distributed. Each frontier is persisted
  * and lineage is cut with localCheckpoint so plan depth stays O(1)
  * across iterations (else the DAG grows linearly and planning blows up
  * long before data size matters).
  */
object RecursiveCte {

  /** UNION ALL semantics (WITH RECURSIVE ... UNION ALL): iterate
    * `step(frontier)` until it yields no rows; result is seed plus every
    * frontier produced. `step` must be monotone-terminating (as in SQL).
    */
  /** Materialize + count in ONE job (the eager checkpoint's own
    * materializing pass carries the count) — each fixpoint round used
    * to pay two driver round-trips, checkpoint then count. */
  private def checkpointCount(df: DataFrame): (DataFrame, Long) =
    org.apache.spark.sql.graft.GraftInternals
      .localCheckpointWithLongAgg(df, (acc, _) => acc + 1L)

  def fixpoint(seed: DataFrame, step: DataFrame => DataFrame,
               maxIterations: Int = 200): DataFrame = {
    var (frontier, n) = checkpointCount(seed)
    var acc = frontier
    var i = 0
    while (i < maxIterations && n > 0) {
      val (f2, n2) = checkpointCount(step(frontier))
      frontier = f2
      n = n2
      if (n > 0) acc = acc.union(frontier)
      i += 1
    }
    // failure = frontier still non-empty when the loop budget ran out;
    // a frontier that empties exactly on the last iteration has converged
    if (n > 0)
      throw new IllegalStateException(
        s"recursive fixpoint did not converge in $maxIterations iterations")
    acc
  }

  /** UNION (dedup) semantics: rows already seen are removed from the
    * frontier each round, guaranteeing termination on cyclic graphs. */
  def fixpointDistinct(seed: DataFrame, step: DataFrame => DataFrame,
                       maxIterations: Int = 200): DataFrame = {
    var (seed0, n) = checkpointCount(seed.distinct())
    var acc = seed0
    var frontier = acc
    var i = 0
    while (i < maxIterations && n > 0) {
      val (f2, n2) =
        checkpointCount(step(frontier).distinct().exceptAll(acc))
      frontier = f2
      n = n2
      // plain union: every frontier is individually checkpointed, so
      // acc is a flat union of materialized blocks — re-checkpointing
      // the WHOLE accumulator each round re-wrote O(total) rows per
      // round for no recompute saving
      if (n > 0) acc = acc.union(frontier)
      i += 1
    }
    if (n > 0)
      throw new IllegalStateException(
        s"recursive fixpoint did not converge in $maxIterations iterations")
    acc
  }
}
