package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval containment join: match each left row's point (event time,
  * position, price) to every right-side interval [start, end] on the same
  * key that contains it — events-in-session, reading-in-calibration-window,
  * trade-in-auction-phase. Plain Spark expresses this only as a non-equi
  * join condition, which the optimizer can execute solely as a (broadcast)
  * nested-loop — O(|left| × |right|) per key and a driver OOM once the
  * right side outgrows the broadcast threshold.
  *
  * Spark-first scale shape: BUCKETIZE the range dimension. Each interval
  * explodes into the `bucketWidthSec`-wide time buckets it overlaps; each
  * point lives in exactly ONE bucket, so an equi-join on (key, bucket)
  * finds every containing interval — and finds each (point, interval) pair
  * exactly once (the pair meets only in the point's own bucket), so no
  * dedup pass is needed — followed by the exact containment filter. Cost:
  * one hash shuffle of each side on (key, bucket); the interval side is
  * replicated ⌈span/width⌉ times, so pick a width near the typical
  * interval length (replication ≈ 2×) — the classic interval-bucketing
  * trade-off, same as the as-of join's tolerance bucketing
  * ([[AsofJoin]]). A hot key no longer funnels one task: its rows spread
  * across its time buckets.
  *
  * Intervals with end < start are dropped (empty by containment
  * semantics); boundaries are inclusive on both ends. Right-side non-key
  * columns whose names collide with a left column come back suffixed
  * `_range`.
  */
object RangeJoin {

  /** @param keyCols        equi-join key, present on both sides
    * @param pointCol       left point column (timestamp or numeric seconds)
    * @param startCol       right interval start (inclusive)
    * @param endCol         right interval end (inclusive)
    * @param bucketWidthSec bucket width in seconds — tune toward the
    *                       typical interval span
    * @param joinType       "inner" (default) or "left" (left rows with no
    *                       containing interval survive with null right
    *                       columns)
    * @param maxBucketsPerInterval fail-fast guard: an interval spanning
    *                       more buckets than this (an open-ended SCD
    *                       sentinel like end = 9999-12-31, or a width
    *                       picked far too small) raises a clear error
    *                       instead of exploding one row into millions and
    *                       OOMing the job — silent truncation would
    *                       silently lose matches, so the guard throws
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      pointCol: String, startCol: String, endCol: String,
      bucketWidthSec: Long, joinType: String = "inner",
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    require(Set("inner", "left")(joinType),
      s"joinType must be inner|left, got '$joinType'")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    // floor() keeps bucketing monotone for pre-epoch values too.
    def bucket(c: Column): Column =
      floor(c.cast("long").cast("double") / lit(bucketWidthSec)).cast("long")
    val l = left.withColumn("__bkt", bucket(col(pointCol)))
    // The guard passes intervals spanning UP TO maxBucketsPerInterval
    // buckets (bucket(end) - bucket(start) < max) and fires at max+1 —
    // the message states the actual bound.
    val errMsg = s"rangeJoin: interval spans more than " +
      s"$maxBucketsPerInterval buckets of ${bucketWidthSec}s - raise " +
      "bucketWidthSec, cap the interval end, or raise maxBucketsPerInterval"
    val r = right
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bkt", explode(
        when(bucket(col(endCol)) - bucket(col(startCol))
            < lit(maxBucketsPerInterval.toLong),
          sequence(bucket(col(startCol)), bucket(col(endCol))))
          .otherwise(raise_error(lit(errMsg)).cast("array<bigint>"))))
    // Right-side non-key columns that collide with a left column name are
    // suffixed `_range` (AsofJoin precedent) — emitting two columns with
    // one name would make the result ambiguous to every downstream select.
    val leftNames = left.columns.toSet
    l.join(r,
        keyCols.map(k => l(k) === r(k))
          .reduce(_ && _) && l("__bkt") === r("__bkt") &&
          l(pointCol) >= r(startCol) && l(pointCol) <= r(endCol),
        joinType)
      .select(left.columns.map(l(_)) ++
        right.columns.filterNot(keyCols.contains).map { c =>
          if (leftNames(c)) r(c).as(c + "_range") else r(c)
        }: _*)
  }
}
