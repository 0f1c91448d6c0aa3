package graft.core

import org.apache.spark.sql.DataFrame

/** Test-only capture of INTERNAL per-iteration plans.
  *
  * The iterative graph operators ([[graft.operators.PageRank]],
  * [[graft.dedup.Clusters]]) materialize every round through a
  * localCheckpoint, so the frame a caller gets back is a bare checkpoint
  * scan — the per-round join shape (the thing whose exchange placement the
  * specs need to pin, e.g. "the static cached side is never re-shuffled or
  * re-sorted") is invisible from outside. Operators offer the first
  * JOINED iteration's un-checkpointed frame here — round 2 for the
  * iterative graph ops, whose round 1 is algebraically specialized to a
  * join-free aggregation (identity labels / uniform ranks) and is not
  * the shape the pins guard; a run that converges in a single round
  * therefore offers nothing. A spec enables capture, runs the operator
  * (with enough rounds to reach the joined shape), and asserts on the
  * captured frame's physical plan.
  *
  * Same cost contract as [[Failpoints]]: production traffic pays a single
  * volatile read per offer site and nothing is retained unless a spec
  * enabled capture.
  */
object PlanProbe {

  @volatile private var enabled = false
  private val captured =
    new scala.collection.concurrent.TrieMap[String, String]()

  def enable(): Unit = { captured.clear(); enabled = true }

  def disable(): Unit = { enabled = false; captured.clear() }

  /** Record `df`'s physical plan under `point` if capture is on; only the
    * FIRST offer per point wins (specs pin the first OFFERED iteration —
    * later joined rounds share its shape by construction). The plan STRING is taken
    * eagerly, here: a DataFrame's queryExecution is lazy, and by the time
    * a spec inspects it the operator has already unpersisted its cached
    * static frames and the session confs have been restored — a deferred
    * plan would silently describe a different (cache-less) query.
    */
  def offer(point: String, df: => DataFrame): Unit =
    if (enabled && !captured.contains(point))
      captured.putIfAbsent(point, df.queryExecution.executedPlan.toString)

  def get(point: String): Option[String] = captured.get(point)
}
