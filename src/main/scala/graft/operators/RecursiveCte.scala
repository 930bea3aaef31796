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
  def fixpoint(seed: DataFrame, step: DataFrame => DataFrame,
               maxIterations: Int = 200): DataFrame = {
    var frontier = seed.localCheckpoint(true)
    var acc = frontier
    // one count per round instead of two isEmpty probes (each probe is
    // a driver round-trip; the loop runs O(depth) rounds)
    var n = frontier.count()
    var i = 0
    while (i < maxIterations && n > 0) {
      frontier = step(frontier).localCheckpoint(true)
      n = frontier.count()
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
    var acc = seed.distinct().localCheckpoint(true)
    var frontier = acc
    // one count per round (over the just-checkpointed frontier) instead
    // of two isEmpty probes — each probe is a driver round-trip and the
    // loop runs O(depth) rounds
    var n = frontier.count()
    var i = 0
    while (i < maxIterations && n > 0) {
      frontier = step(frontier).distinct().exceptAll(acc).localCheckpoint(true)
      n = frontier.count()
      if (n > 0) acc = acc.union(frontier).localCheckpoint(true)
      i += 1
    }
    if (n > 0)
      throw new IllegalStateException(
        s"recursive fixpoint did not converge in $maxIterations iterations")
    acc
  }
}
