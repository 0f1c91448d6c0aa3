package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the single closest right row within
  * the same key — the point-in-time lookup every event pipeline needs (last
  * view before a click, next fill after an order, closest sensor reading)
  * that plain equi-joins can't express. Three directions:
  *
  *  - `backward` (default): greatest right ts ≤ left ts;
  *  - `forward`: smallest right ts ≥ left ts;
  *  - `nearest`: whichever of the two is closer in |Δts| (ties → backward).
  *
  * Spark-first shape: NOT a range join (whose candidate set is
  * O(left × right-per-key) before the per-row top-1 prunes it) but the
  * union-merge formulation — tag both sides, union, and run ONE window pass
  * per key ordered by time, propagating the most recent right-side payload
  * with `last(ignoreNulls)`. `forward` is the same pass with the time order
  * REVERSED (walking down descending timestamps, the last right row seen is
  * the next one at or after the current left row); `nearest` runs both
  * window passes over the SAME union — one exchange, two sorts — and picks
  * the closer candidate per row. Cost at any scale: a single hash shuffle
  * of left+right on the key and one (or two, for nearest) per-key sorts —
  * the same exchange a sessionizer pays, with nothing quadratic anywhere.
  * Each side's payload rides that one exchange once, as a struct; `last`
  * over the running frame is O(1) per row.
  *
  * Ordering contract: at equal timestamps the right row is visible to the
  * left row in every direction (≤ / ≥ / distance 0); among right rows tied
  * on (key, ts) the one with the greatest `tieBreak` wins (pass a unique
  * column for a deterministic result). An optional `toleranceSec` nulls out
  * matches farther than the given age, after the merge — equivalent to
  * joining within the tolerance range, since only the closest candidate can
  * win either way.
  *
  * Skew: with no tolerance, one hot key funnels its rows through one sort
  * task — inherent to per-key ordered semantics (same as sessionization).
  * With `toleranceSec` set, the window is partitioned by (key, time bucket)
  * instead: buckets are `tolerance` wide, every candidate for a left row in
  * bucket b lies within one bucket of b (behind for backward, ahead for
  * forward, both for nearest), so right rows are duplicated into the
  * adjacent bucket(s) the direction needs (one or two extra copies of the
  * fixed-width payload) and each partition's sort is bounded by the key's
  * rows per tolerance window, not its whole history. The result is EXACTLY
  * the unbucketed output: a cross-bucket "winner" a partition misses is
  * necessarily farther than the tolerance, so the age filter would null it
  * anyway.
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
    * @param toleranceSec  max allowed |leftTs - rightTs| in seconds; farther
    *                      matches become NULL
    * @param direction     "backward" (right ts ≤ left ts), "forward"
    *                      (right ts ≥ left ts), or "nearest" (closer of the
    *                      two; equidistant ties resolve backward)
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTsCol: String, rightTsCol: String, rightValCols: Seq[String],
      tieBreak: Seq[String] = Nil, suffix: String = "_asof",
      toleranceSec: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    val (needBack, needFwd) = direction match {
      case "backward" => (true, false)
      case "forward"  => (false, true)
      case _          => (true, true)
    }
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
    // timestamps too. Backward candidates live one bucket BEHIND the left
    // row, forward candidates one bucket AHEAD; right rows are replicated
    // into exactly the adjacent buckets the direction consults.
    toleranceSec.foreach(tol => require(tol > 0,
      s"toleranceSec must be positive, got $tol — zero divides the bucket " +
        "id into Infinity/NaN and funnels every key through one partition"))
    val (r, l, partKeys) = toleranceSec match {
      case Some(tol) =>
        def bucket(c: Column) =
          floor(c.cast("long").cast("double") / lit(tol)).cast("long")
        val rb = r0.withColumn("__bkt", bucket(col("__ts")))
        val copies = Seq(rb) ++
          (if (needBack) Seq(rb.withColumn("__bkt", col("__bkt") + 1)) else Nil) ++
          (if (needFwd) Seq(rb.withColumn("__bkt", col("__bkt") - 1)) else Nil)
        (copies.reduce(_.unionByName(_)),
          l0.withColumn("__bkt", bucket(col("__ts"))),
          keyC :+ col("__bkt"))
      case None => (r0, l0, keyC)
    }

    // Right (0) sorts before left (1) at equal ts ⇒ equal-ts visibility in
    // both directions; among tied right rows the greatest __tie sorts last,
    // so last() picks it. The forward pass is the same frame walked in
    // DESCENDING time order: the last right row seen is the next at-or-after.
    def pass(ts: Column) = {
      val w = Window.partitionBy(partKeys: _*)
        .orderBy(ts, col("__side").asc, col("__tie").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, 0)
      last(col("__rv"), ignoreNulls = true).over(w)
    }
    val unioned = r.unionByName(l)
    val withMatches = unioned
      .withColumn("__back", if (needBack) pass(col("__ts").asc) else lit(null).cast(rvType))
      .withColumn("__fwd", if (needFwd) pass(col("__ts").desc) else lit(null).cast(rvType))
      .filter(col("__side") === 1)

    // Per-direction age validity, then pick. Nearest compares the two valid
    // distances; the equidistant tie resolves backward. Distances are
    // computed on DOUBLE seconds (exact sub-second), not truncated longs —
    // candidates are selected by full-precision ordering, and a truncated
    // distance could attach the farther of the two or mis-cut a tolerance
    // boundary by up to a second.
    def dist(m: Column) =
      abs(col("__ts").cast("double") - m.getField(rightTsCol).cast("double"))
    def valid(m: Column) = toleranceSec match {
      case Some(tol) => when(dist(m) <= tol, m)
      case None      => m
    }
    val backV = valid(col("__back"))
    val fwdV = valid(col("__fwd"))
    val matched = direction match {
      case "backward" => withMatches.withColumn("__match", backV)
      case "forward"  => withMatches.withColumn("__match", fwdV)
      case _ => withMatches.withColumn("__match",
        when(backV.isNull, fwdV)
          .when(fwdV.isNull, backV)
          .when(dist(fwdV) < dist(backV), fwdV)
          .otherwise(backV))
    }
    val out = left.columns.map(c => col("__lr").getField(c).as(c)).toSeq ++
      payloadCols.map(c => col("__match").getField(c).as(c + suffix))
    matched.select(out: _*)
  }
}
