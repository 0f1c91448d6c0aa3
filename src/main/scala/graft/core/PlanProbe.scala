package graft.core

import org.apache.spark.sql.DataFrame

/** Test-only capture of INTERNAL per-iteration plans.
  *
  * The iterative graph operators ([[graft.operators.PageRank]],
  * [[graft.dedup.Clusters]]) materialize every round through a
  * localCheckpoint, so the frame a caller gets back is a bare checkpoint
  * scan — the per-round join shape (the thing whose exchange placement the
  * specs need to pin, e.g. "the static cached side is never re-shuffled or
  * re-sorted") is invisible from outside. Operators offer the FIRST
  * iteration's un-checkpointed frame here; a spec enables capture, runs
  * the operator, and asserts on the captured frame's physical plan.
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
    * FIRST offer per point wins (specs pin the first iteration — later
    * rounds share its shape by construction). The plan STRING is taken
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
