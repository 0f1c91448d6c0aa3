package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Gate-scoped executor-storage registry: every frame an operator pins in
  * executor storage — `persist()`ed caches AND `localCheckpoint()` blocks —
  * is registered here and released deterministically by the harness between
  * queries ([[releaseAll]], called by Bench/Verify next to
  * `spark.catalog.clearCache()`).
  *
  * Why a registry at all: `clearCache()` only frees CATALOG-tracked caches.
  * Local-checkpoint RDDs are persisted outside the catalog's tracking, so
  * without explicit release every checkpointed frame an operator returns
  * (connected-component labels, TF-IDF doc-term tables, line-dedup
  * position maps, …) pins a full copy in executor storage for the life of
  * the RDD object — across a 130-gate suite that accumulation is exactly
  * the storage-pool pressure that turns a memory cliff into a 5× bench
  * (r08 postmortem). The ContextCleaner does eventually GC-collect them,
  * but "eventually, under driver GC pressure" is not a storage bound.
  *
  * STRONG references, same reasoning as the former Dedup-local registry: a
  * weak/soft ref can be cleared while the persisted blocks are still
  * pinned, silently skipping the deterministic release this exists for.
  * The queue is bounded: past [[MaxScoped]] entries the oldest frame is
  * released on insert, so a caller that never releases still cannot
  * accumulate unbounded storage (a dropped PERSIST recomputes from lineage;
  * a dropped lazy checkpoint re-materializes on next use — correctness is
  * unaffected either way, only a recompute is risked).
  *
  * Release safety contract: call [[releaseAll]] only BETWEEN queries, after
  * the previous query's result is materialized (counted / written). A
  * local checkpoint truncates lineage, so re-executing a released
  * checkpointed frame fails by design — the harness boundary is the one
  * point where nothing can re-read the round's working state.
  */
object ScopedStorage {
  private val MaxScoped = 512
  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register an already-pinned frame for end-of-gate release. */
  def register(df: DataFrame): DataFrame = {
    frames.add(df)
    while (frames.size > MaxScoped) {
      val oldest = frames.poll()
      if (oldest != null) free(oldest)
    }
    df
  }

  /** Persist (MEMORY_AND_DISK — spills, keeps lineage) + register. */
  def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    register(df)
  }

  /** `localCheckpoint(eager)` + register the checkpointed frame, so the
    * blocks a returned iterative/multi-consumer result pins are freed at
    * the gate boundary instead of leaking until driver GC.
    */
  def checkpoint(df: DataFrame, eager: Boolean = true): DataFrame =
    register(df.localCheckpoint(eager))

  /** Free one frame's storage: the catalog cache entry if it has one, and
    * any local-checkpoint blocks its (analyzed) plan reads. Safe on frames
    * that are neither — both paths no-op.
    */
  private def free(df: DataFrame): Unit = {
    try {
      df.unpersist(blocking = false)
      df.queryExecution.analyzed.collectLeaves().foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    } catch {
      // A stopped session cannot unpersist — releasing on teardown paths
      // must never mask the query's own outcome.
      case _: Throwable => ()
    }
  }

  /** `df.scopedCheckpoint(eager)` syntax for chained plans — a
    * localCheckpoint whose blocks the harness frees at the gate boundary.
    */
  implicit final class Ops(private val df: DataFrame) extends AnyVal {
    def scopedCheckpoint(eager: Boolean = true): DataFrame =
      ScopedStorage.checkpoint(df, eager)
  }

  /** Release every registered frame (asynchronous eviction). Returns the
    * number released. Call between gates, after materializing results.
    */
  def releaseAll(): Int = {
    var released = 0
    var df = frames.poll()
    while (df != null) {
      free(df)
      released += 1
      df = frames.poll()
    }
    released
  }
}
