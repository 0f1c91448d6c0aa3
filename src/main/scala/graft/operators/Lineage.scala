package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lineage-graph closure — the dbt DAG primitive behind `state:modified+`
  * selective rebuilds, impact analysis ("what breaks if this source
  * changes"), and erasure propagation planning. Frontier-expansion BFS
  * over (parent, child) edges: each round joins the frontier to the edge
  * list, anti-joins what's already reached, and stops at an empty
  * frontier — O(diameter) rounds, and each round's exchanges carry node
  * ids only. Same checkpoint hygiene as [[PageRank]]/Clusters: rounds are
  * lineage-cut and superseded frames freed eagerly, so a deep DAG holds
  * two node-frames in storage, not one per level.
  *
  * A dbt project's graph is metadata-sized (thousands of nodes) — this
  * shape exists because the SAME closure runs over data-scale graphs
  * (erasure across fact tables keyed by lineage, derived-corpus
  * dependency sweeps), where a driver-side BFS would not.
  */
object Lineage {

  /** All nodes reachable from `seeds` (INCLUDING the seeds) following
    * parent→child edges. `edges` columns: (parent, child); `seeds`: one
    * column of node ids.
    */
  def downstreamClosure(edges: DataFrame, seeds: DataFrame,
      maxRounds: Int = 30): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1: $maxRounds")
    val e = edges.select(col(edges.columns(0)).as("parent"),
      col(edges.columns(1)).as("child")).localCheckpoint()
    var reached: DataFrame = null
    var frontier: DataFrame = null
    var round = 0
    var done = false
    // Everything after the edge checkpoint — INCLUDING the seeds
    // checkpoint and the initial isEmpty probe, both Spark jobs — runs
    // inside the cleanup scope, so any failure frees every live
    // localCheckpoint (invisible to clearCache; leaks for the session's
    // life otherwise — the PageRank/Clusters discipline).
    try {
      reached = seeds.select(col(seeds.columns.head).as("node"))
        .distinct().localCheckpoint()
      frontier = reached
      done = e.isEmpty
      while (!done && round < maxRounds) {
        val next = e
          .join(frontier.withColumnRenamed("node", "parent"), "parent")
          .select(col("child").as("node")).distinct()
          .join(reached, Seq("node"), "left_anti")
          .localCheckpoint()
        // next is materialized, so the old frontier can never be read
        // again — free it and take ownership of next IMMEDIATELY (before
        // even the isEmpty probe), so any later failure leaves exactly
        // frontier/reached/e live, all freed by the catch below. The old
        // orderings leaked next's blocks when the union checkpoint (or
        // the probe itself) threw.
        if (!(frontier eq reached)) freeCheckpoint(frontier)
        frontier = next
        if (next.isEmpty) {
          done = true // frontier (= next) is freed after the loop
        } else {
          val grown = reached.unionByName(next).localCheckpoint()
          freeCheckpoint(reached)
          reached = grown
        }
        round += 1
      }
      if (!done)
        throw new IllegalStateException(
          s"downstreamClosure did not converge in $maxRounds rounds — " +
            "graph deeper than the bound (raise maxRounds)")
    } catch { case t: Throwable =>
      if (frontier != null && !(frontier eq reached)) freeCheckpoint(frontier)
      if (reached != null) freeCheckpoint(reached)
      freeCheckpoint(e)
      throw t
    }
    if (!(frontier eq reached)) freeCheckpoint(frontier)
    freeCheckpoint(e)
    graft.core.ScopedStorage.registerCheckpoint(reached)
    reached
  }

  private def freeCheckpoint(df: DataFrame): Unit =
    graft.core.ScopedStorage.freeCheckpoint(df) // one shared contract
}
