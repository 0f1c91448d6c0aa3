package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.ScopedStorage

/** Deterministic integer PageRank over an edge list — the iterative-join
  * graph operator next to connected components ([[graft.dedup.Clusters]]):
  * link-graph authority weighting is a standard web-corpus curation signal
  * (harmonic/PageRank centrality is how Common-Crawl-derived corpora rank
  * domains for crawl priority and quality weighting).
  *
  * Determinism: ranks live in integer MICRO-units (1.0 ≡ 1,000,000), every
  * per-iteration step is integer arithmetic — contribution = rank div
  * outdeg, damping = (num·sum) div den — so a fixed iteration count
  * produces bit-identical ranks on any engine, any partitioning (floats
  * would drift per addition order; a declarative replay in another SQL
  * engine could never hash-match). The classic 0.15/0.85 damping becomes
  * the exact rational 15/100 | 85/100. Nodes with no out-edges contribute
  * nothing (their mass evaporates — the "no dangling redistribution"
  * PageRank variant; callers wanting the stochastic-matrix variant
  * symmetrize their graph first, which also guarantees outdeg ≥ 1).
  *
  * Scale shape per iteration: one equi-join of ranks to the static
  * adjacency frame on src, one map-side-combinable SUM per dst, one left
  * join back to the node list. The adjacency frame — (src, dst, outdeg),
  * with the outdeg join folded in ONCE up front — is persisted
  * hash-partitioned AND sorted on src, so every iteration's sort-merge
  * join reuses that layout outright: the big static side pays ZERO
  * exchanges and ZERO sorts per round, and only (node, rank) — 16 bytes —
  * rides the exchanges that remain (measured at 64× sf0.1: 38.4M edges ×
  * 5 rounds stopped re-shuffling ~3 GB). localCheckpoint cannot provide
  * this: under AQE it records UnknownPartitioning, which is why the
  * static side is cached (partitioning- and ordering-preserving through
  * InMemoryTableScan) while the EVOLVING ranks frame stays lineage-cut
  * via localCheckpoint with superseded rounds freed eagerly (two rank
  * frames live at any time, not k), the [[graft.dedup.Clusters]]
  * discipline. Skew: a mega-in-degree node (every real web graph has one)
  * concentrates its SUM — partial aggregation collapses it map-side
  * before the exchange, so the hot dst never funnels raw edges into one
  * reducer. The static pre-partitioning does forgo AQE's skew-split on
  * the adjacency side of the join — the deliberate trade for zero
  * per-round exchanges; a pathological out-degree hub (the only key that
  * could overfill one static partition) is bounded by construction in
  * the dedup pipelines that feed this (per-bucket pair caps) and absent
  * under replication (ids shift per replica).
  */
object PageRank {

  /** One row per node appearing as a source: (`node`, `rank`) after
    * `iterations` synchronous steps from a uniform `unit` start.
    * rank_{i+1}(v) = (unit·dampNum′) + dampNum·Σ_{u→v}(rank_i(u) div
    * outdeg(u)) div dampDen, with dampNum′ = (dampDen − dampNum)/dampDen
    * applied as ((dampDen − dampNum)·unit) div dampDen. Edges are
    * deduplicated; self-loops are dropped (a self-loop only feeds a node
    * its own mass and makes outdeg lie about external flow).
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, unit: Long = 1000000L,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"bad damping $dampNum/$dampDen")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    // The static per-iteration join input, built ONCE: outdeg folded in
    // (one fewer join per round), hash-partitioned AND sorted on the join
    // key, then CACHED — InMemoryTableScan preserves both properties, so
    // every round's sort-merge join consumes this side with no exchange
    // and no sort. The partition count is pinned (repartition with an
    // explicit N) because an AQE-coalesced exchange would report a
    // partitioning the later joins cannot reuse — same reason this is
    // persist, not localCheckpoint (a checkpoint under AQE records
    // UnknownPartitioning).
    val nPart = e.sparkSession.sessionState.conf.numShufflePartitions
    val adj = e.join(outdeg, "src")
      .repartition(nPart, col("src"))
      .sortWithinPartitions(col("src"))
      .persist()
    adj.count() // materialize before freeing the checkpoint it reads
    val baseRank = ((dampDen - dampNum) * unit) / dampDen
    var ranks = e.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(unit))
      .localCheckpoint()
    freeCheckpoint(e)
    var i = 0
    while (i < iterations) {
      // Round 1 is algebraically special: every rank is still the uniform
      // `unit` start, so joining the rank frame in would only re-derive a
      // constant — the full-graph round's rank exchange + probe of the
      // whole cached adjacency collapses to one aggregation over it (the
      // same trim as Clusters' identity-frontier round; see the ×64
      // attribution in SCALE.md round 16).
      val contrib =
        (if (i == 0) adj.withColumn("rank", lit(unit))
         else adj.join(ranks.withColumnRenamed("node", "src"), "src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("rank div __deg")).as("__in"))
      // Probe the JOINED per-round shape (round ≥ 2), not the specialized
      // first round — the spec pins the static side's exchange placement.
      if (i > 0) graft.core.PlanProbe.offer("pagerank_contrib", contrib)
      val prev = ranks
      ranks = prev.select(col("node"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(baseRank) +
            expr(s"($dampNum * coalesce(__in, 0L)) div $dampDen")).as("rank"))
        .localCheckpoint()
      freeCheckpoint(prev)
      i += 1
    }
    // Cached blocks release through the cache manager directly — unlike
    // checkpoint blocks they need no scoped registry. (The cached plan's
    // lineage nominally reaches e's freed checkpoint, but MEMORY_AND_DISK
    // spills rather than evicts-to-recompute, so the only way to lose a
    // block is executor loss — the failure class local checkpoints never
    // survived either.)
    adj.unpersist(blocking = false)
    // The returned frame reads its own checkpoint blocks — harness-scoped
    // release, never a leak (the r08 lesson, same as Clusters' labels).
    ScopedStorage.registerCheckpoint(ranks)
    ranks
  }

  private def freeCheckpoint(df: DataFrame): Unit =
    graft.core.ScopedStorage.freeCheckpoint(df) // one shared contract
}
