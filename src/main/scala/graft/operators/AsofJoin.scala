package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the single right row with
  * the greatest timestamp ≤ the left row's timestamp within the same key —
  * the point-in-time lookup every event pipeline needs (last view before a
  * click, last price before a trade) that plain equi-joins can't express.
  *
  * Spark-first shape: NOT a range join (whose candidate set is
  * O(left × right-per-key) before the per-row top-1 prunes it) but the
  * union-merge formulation — tag both sides, union, and run ONE window pass
  * per key ordered by time, propagating the most recent right-side payload
  * with `last(ignoreNulls)`. Cost at any scale: a single hash shuffle of
  * left+right on the key and a per-key sort — the same exchange a
  * sessionizer pays, with nothing quadratic anywhere. Each side's payload
  * rides that one exchange once, as a struct; `last` over the running frame
  * is O(1) per row.
  *
  * Ordering contract: at equal timestamps the right row is visible to the
  * left row (≤, not <); among right rows tied on (key, ts) the one with the
  * greatest `tieBreak` wins (pass a unique column for a deterministic
  * result). An optional `toleranceSec` nulls out matches older than the
  * given age, after the merge — equivalent to joining within
  * [ts - tolerance, ts], since only the newest candidate can win either way.
  *
  * Skew: with no tolerance, one hot key funnels its rows through one sort
  * task — inherent to per-key ordered semantics (same as sessionization).
  * With `toleranceSec` set, the window is partitioned by (key, time bucket)
  * instead: buckets are `tolerance` wide, every candidate for a left row in
  * bucket b (right ts ∈ [ts − tol, ts]) lies in bucket b−1 or b, so right
  * rows are duplicated into their next bucket (one extra copy of the
  * fixed-width payload) and each partition's sort is bounded by the key's
  * rows per tolerance window, not its whole history. The result is
  * EXACTLY the unbucketed output: a cross-bucket "winner" a partition
  * misses is necessarily older than the tolerance, so the age filter
  * would null it anyway.
  */
object AsofJoin {

  /** @param keyCols       equi-join key, present on both sides
    * @param leftTsCol     left event-time column
    * @param rightTsCol    right event-time column
    * @param rightValCols  right columns to attach (each appears in the
    *                      output as `<name><suffix>`; the right timestamp is
    *                      always attached as `<rightTsCol><suffix>`)
    * @param tieBreak      right-side tie order at equal (key, ts) — greatest
    *                      wins; pass a unique id for determinism
    * @param toleranceSec  max allowed age (leftTs - rightTs) in seconds;
    *                      older matches become NULL
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTsCol: String, rightTsCol: String, rightValCols: Seq[String],
      tieBreak: Seq[String] = Nil, suffix: String = "_asof",
      toleranceSec: Option[Long] = None): DataFrame = {
    val payloadCols = (rightTsCol +: rightValCols).distinct
    val rPayload = struct(payloadCols.map(col): _*)
    val rvType = right.select(rPayload.as("__rv")).schema("__rv").dataType
    // A zero-field struct is illegal; a constant tie is equivalent to none.
    val rTie = if (tieBreak.isEmpty) lit(0) else struct(tieBreak.map(col): _*)
    val tieType = right.select(rTie.as("__tie")).schema("__tie").dataType
    val lPayload = struct(left.columns.map(col).toSeq: _*)
    val lrType = left.select(lPayload.as("__lr")).schema("__lr").dataType

    val keyC = keyCols.map(col)
    val r0 = right.select(keyC :+ col(rightTsCol).as("__ts") :+
      lit(0).as("__side") :+ rTie.as("__tie") :+
      rPayload.as("__rv") :+ lit(null).cast(lrType).as("__lr"): _*)
    val l0 = left.select(keyC :+ col(leftTsCol).as("__ts") :+
      lit(1).as("__side") :+ lit(null).cast(tieType).as("__tie") :+
      lit(null).cast(rvType).as("__rv") :+ lPayload.as("__lr"): _*)

    // Tolerance-bounded: partition by (key, tolerance-wide time bucket) —
    // see the skew note. floor() keeps bucketing monotone for pre-epoch
    // timestamps too.
    val (r, l, partKeys) = toleranceSec match {
      case Some(tol) =>
        def bucket(c: Column) =
          floor(c.cast("long").cast("double") / lit(tol)).cast("long")
        val rb = r0.withColumn("__bkt", bucket(col("__ts")))
        (rb.unionByName(rb.withColumn("__bkt", col("__bkt") + 1)),
          l0.withColumn("__bkt", bucket(col("__ts"))),
          keyC :+ col("__bkt"))
      case None => (r0, l0, keyC)
    }

    // Right (0) sorts before left (1) at equal ts ⇒ "≤" visibility; among
    // tied right rows the greatest __tie sorts last, so last() picks it.
    val w = Window.partitionBy(partKeys: _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    val merged = r.unionByName(l)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val aged = toleranceSec match {
      case Some(tol) => merged.withColumn("__match",
        when(col("__ts").cast("long") -
          col("__match").getField(rightTsCol).cast("long") <= tol,
          col("__match")))
      case None => merged
    }
    val out = left.columns.map(c => col("__lr").getField(c).as(c)).toSeq ++
      payloadCols.map(c => col("__match").getField(c).as(c + suffix))
    aged.select(out: _*)
  }
}
