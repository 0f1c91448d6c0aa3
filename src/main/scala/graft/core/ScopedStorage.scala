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
  * The queue is bounded, and overflow eviction is KIND-AWARE:
  *   - an evicted PERSIST is unpersisted (lineage kept — a re-executed
  *     plan recomputes; only a recompute is risked);
  *   - an evicted CHECKPOINT is dropped from the queue WITHOUT freeing its
  *     blocks — a local checkpoint truncates lineage, so freeing blocks a
  *     same-gate consumer may still read would fail that consumer with
  *     "checkpoint block not found". Dropping the strong reference instead
  *     restores exactly the pre-registry behavior for that frame: the
  *     ContextCleaner reclaims the blocks once the caller's own reference
  *     dies. So a pathological gate (or a library user who never calls
  *     [[releaseAll]]) degrades to bounded-queue + GC reclamation, never
  *     to a correctness failure.
  *
  * Release safety contract: call [[releaseAll]] only BETWEEN queries, after
  * the previous query's result is materialized (counted / written). A
  * local checkpoint truncates lineage, so re-executing a released
  * checkpointed frame fails by design — the harness boundary is the one
  * point where nothing can re-read the round's working state.
  */
object ScopedStorage {
  private val MaxScoped = 512
  private final case class Entry(df: DataFrame, isCheckpoint: Boolean)
  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[Entry]()

  private def add(e: Entry): Unit = {
    frames.add(e)
    while (frames.size > MaxScoped) {
      val oldest = frames.poll()
      // Kind-aware overflow eviction — see the scaladoc. Only persists are
      // actively freed; checkpoints just lose their strong reference.
      if (oldest != null && !oldest.isCheckpoint) free(oldest, blocking = false)
    }
  }

  /** Register an already-persisted (catalog-tracked) frame. */
  def register(df: DataFrame): DataFrame = { add(Entry(df, isCheckpoint = false)); df }

  /** Register an already-checkpointed frame (blocks outside the catalog). */
  def registerCheckpoint(df: DataFrame): DataFrame = { add(Entry(df, isCheckpoint = true)); df }

  /** Free a locally-checkpointed frame's storage blocks mid-computation.
    * Safe ONLY once nothing can read the frame again: a local checkpoint
    * truncates lineage, so after unpersist the data is unrecoverable by
    * design — exactly the deterministic release an iterative round loop
    * needs (bounded storage) and the catalog cache manager cannot provide
    * (checkpoint RDDs are persisted outside its tracking). The unpersist
    * must target the checkpointed LogicalRDD LEAF — `df.rdd` would wrap a
    * NEW deserialization RDD and free nothing. One definition for every
    * iterative operator (CC, PageRank, lineage closure), so a fix to this
    * contract lands once.
    */
  def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
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
    registerCheckpoint(df.localCheckpoint(eager))

  /** `df.scopedCheckpoint(eager)` syntax for chained plans — a
    * localCheckpoint whose blocks the harness frees at the gate boundary.
    */
  implicit final class Ops(private val df: DataFrame) extends AnyVal {
    def scopedCheckpoint(eager: Boolean = true): DataFrame =
      ScopedStorage.checkpoint(df, eager)
  }

  /** Free one frame's storage: the catalog cache entry if it has one, and
    * any local-checkpoint blocks its (analyzed) plan reads. Safe on frames
    * that are neither — both paths no-op.
    */
  private def free(e: Entry, blocking: Boolean): Unit = {
    try {
      e.df.unpersist(blocking)
      if (e.isCheckpoint)
        e.df.queryExecution.analyzed.collectLeaves().foreach {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(blocking)
          case _ => ()
        }
    } catch {
      // A stopped session cannot unpersist — releasing on teardown paths
      // must never mask the query's own outcome.
      case _: Throwable => ()
    }
  }

  /** Release every registered frame. Returns the number released. Call
    * between gates, after materializing results. `blocking = true` waits
    * for block eviction — use it when a storage measurement follows, so
    * in-flight async eviction can't masquerade as a leak.
    */
  def releaseAll(blocking: Boolean = false): Int = {
    var released = 0
    var e = frames.poll()
    while (e != null) {
      free(e, blocking)
      released += 1
      e = frames.poll()
    }
    released
  }
}
