package graft.operators

import org.apache.spark.sql.DataFrame

/** WITH RECURSIVE as a driver-side fixpoint loop — the Spark mapping of the
  * reference's operator_recursive_cte / operator_cte_scan pipeline-restart
  * machinery (/root/reference components/physical_plan/operators/
  * operator_recursive_cte.cpp; pipeline reset at operator.hpp:222-233).
  *
  * Each iteration is one distributed Spark job over the previous delta;
  * `localCheckpoint` truncates lineage so the plan doesn't grow with the
  * iteration count (the classic iterative-Spark failure mode), and the
  * UNION-semantics variant keeps only the frontier (`delta except acc`) so
  * work per iteration is proportional to newly discovered rows — BFS-style
  * scaling, not re-derivation of the whole closure.
  */
object RecursiveCte {

  /** UNION semantics (dedup across iterations): seed ∪ step(seed) ∪ … until
    * no new rows. `step` must be monotone (pure function of its input). */
  def fixpoint(seed: DataFrame, step: DataFrame => DataFrame,
               maxIterations: Int = 100): DataFrame = {
    var acc = seed.distinct().localCheckpoint()
    var delta = acc
    var deltaCount = delta.count()
    var i = 0
    while (i < maxIterations && deltaCount > 0) {
      // only the frontier is checkpointed per iteration; acc stays a
      // shallow union of already-materialized deltas, so per-iteration
      // work is O(frontier), not O(closure). One job per iteration: the
      // count() materializes the lazy checkpoint and doubles as the
      // emptiness test. Re-checkpoint acc rarely to bound union fan-in.
      // except() already returns distinct rows — no pre-distinct shuffle
      delta = step(delta).except(acc).localCheckpoint(false)
      deltaCount = delta.count()
      if (deltaCount > 0) {
        acc = acc.union(delta)
        if (i % 8 == 7) acc = acc.localCheckpoint()
      }
      i += 1
    }
    require(i < maxIterations || deltaCount == 0,
      s"recursive CTE did not converge in $maxIterations iterations")
    acc
  }

  /** UNION ALL semantics: accumulate every produced row; terminates when
    * `step` yields an empty frame. */
  def fixpointAll(seed: DataFrame, step: DataFrame => DataFrame,
                  maxIterations: Int = 100): DataFrame = {
    var acc = seed.localCheckpoint()
    var delta = acc
    var deltaCount = delta.count()
    var i = 0
    while (i < maxIterations && deltaCount > 0) {
      delta = step(delta).localCheckpoint(false)
      deltaCount = delta.count()
      if (deltaCount > 0) {
        acc = acc.union(delta)
        if (i % 8 == 7) acc = acc.localCheckpoint()
      }
      i += 1
    }
    require(i < maxIterations || deltaCount == 0,
      s"recursive CTE did not converge in $maxIterations iterations")
    acc
  }
}
