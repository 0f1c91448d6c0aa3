package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step that
  * turns pairwise dedup output (a ~ b, b ~ c) into whole duplicate CLUSTERS
  * (keep one of {a, b, c}), without which transitive duplicates survive
  * pairwise removal.
  *
  * Algorithm: distributed min-label propagation. Every node starts labeled
  * with its own id; each round every node adopts the minimum label among
  * itself and its neighbors; at a fixed point each component is uniformly
  * labeled with its minimum member id (a canonical, deterministic cluster
  * id). Each round is one equi-join of the edge list with the current
  * labels plus one min-aggregation — all shuffle-partitioned by node id, no
  * per-component state ever gathers on one task (unlike a groupBy-component
  * formulation, a hot 100M-member cluster stays spread across the cluster;
  * only its LABEL converges).
  *
  * Rounds needed = the graph diameter, and near-dup graphs are
  * short-diameter by construction (members of a dup cluster all link to
  * shared content); the classic escape for adversarial long chains is the
  * large-star/small-star rewrite (Kiveris et al., "Connected Components in
  * MapReduce and Beyond"), which squares away the diameter — not needed for
  * dedup-shaped graphs. Per round the labels frame is localCheckpoint()ed:
  * iterative plans otherwise stack the full lineage (Catalyst re-optimizes
  * a 2^rounds tree) — the standard Spark iterative-algorithm idiom; on a
  * real cluster with an HDFS checkpoint dir, `checkpoint()` adds
  * executor-loss resilience. Convergence is detected by the monotonically
  * decreasing label sum, one tiny aggregate per round — no extra join.
  */
object Clusters {

  /** Cluster assignment for every node in `pairs` (columns (id_a, id_b), one
    * undirected edge per row): returns (id, cluster) where cluster = the
    * minimum id reachable from the node. Nodes absent from `pairs`
    * (singletons) are absent from the output — union them back with
    * cluster = id if the caller wants total coverage.
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 30): DataFrame = {
    val half = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val edges = half
      .unionByName(half.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint()
    // Exact decimal sum: a wrapped long sum could (astronomically rarely)
    // alias two different label states; null when the graph is empty.
    def labelSum(df: DataFrame): BigDecimal = {
      val v = df.agg(sum(col("cluster").cast("decimal(38,0)"))).head().get(0)
      if (v == null) BigDecimal(0) else BigDecimal(v.toString)
    }
    var lastSum = labelSum(labels)

    var round = 0
    // Probe the checkpointed edges, not `pairs`: isEmpty on the raw input
    // would re-run the (possibly expensive) upstream pair pipeline.
    var converged = edges.isEmpty
    while (!converged && round < maxRounds) {
      val fromNbrs = edges.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("cluster")).as("__nbr"))
      // Every node has ≥1 neighbor (it came from an edge), so the join is
      // inner; least() keeps the node's own label when it is the minimum.
      labels = labels.join(fromNbrs, "id")
        .select(col("id"), least(col("cluster"), col("__nbr")).as("cluster"))
        .localCheckpoint()
      val s = labelSum(labels)
      converged = s == lastSum
      lastSum = s
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    labels
  }

  /** Pairwise near-dup output → one surviving id per duplicate cluster: the
    * cluster's canonical (minimum) id. Singleton docs never enter `pairs`
    * and are implicitly survivors.
    */
  def survivors(pairs: DataFrame): DataFrame =
    connectedComponents(pairs).select(col("cluster").as("id")).distinct()
}
