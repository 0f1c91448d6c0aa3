package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.ScopedStorage.Ops

/** Reusable event-analytics operators, extracted from the driver-gate plans
  * in [[graft.queries.EventQueries]] so a library user can run them on any
  * event frame (the gates pin the exact semantics against the DuckDB oracle;
  * RandomizedSpec pins each operator against a plain-Scala reference on
  * random data — two independent checks of the same body).
  *
  * The reference treats event analytics as plain batch SQL over an events
  * table (SURVEY §1; reference `impl.py` submits user SQL verbatim) — these
  * operators are the composed shapes a warehouse user writes by hand, each
  * arranged so the plan scales: aggregations are map-side combinable,
  * fan-outs are bounded and scan-local, and no step needs a non-equi join
  * or a window over an unbounded partition.
  *
  * Column-name contract (library API): OUTPUT columns are part of each
  * operator's documented result shape (`session_idx`, `t1..tk`,
  * `n_step1..k`, `cohort_day`/`day_offset`, `h`/`n`/`is_gap`,
  * `d`/`dau`/`wau`, quantile labels, `clipped`, `rank`) — a caller's
  * input frame must not already contain the outputs it asks for,
  * exactly like any SQL projection.
  * INTERNAL working columns are `__graft_`-prefixed so they can never
  * collide with (or silently capture) a caller's own columns.
  */
object EventAnalytics {

  /** Batch sessionization. The precise break contract (shared with the
    * streaming twin [[graft.streaming.EventStreams.sessionize]] and the
    * oracle): a session breaks when the FLOOR-SECOND gap between
    * consecutive events strictly exceeds `gapSec` — integer arithmetic on
    * floored epoch seconds, the only gap definition every engine replays
    * bit-for-bit. lag + conditional cumsum over a per-entity window; one
    * shuffle on the entity key.
    *
    * Output: one row per (entity, session_idx) with n_events,
    * session_start, session_end.
    */
  def sessionize(ev: DataFrame, entityCol: String, tsCol: String,
      tieCol: String, gapSec: Long = 1800L): DataFrame = {
    require(gapSec >= 0, s"negative session gap: $gapSec")
    val byEntity = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
    val newSession = when(
      col(tsCol).cast("long") - lag(col(tsCol).cast("long"), 1).over(byEntity)
        > gapSec, 1
    ).otherwise(0)
    ev.withColumn("__graft_new_s", newSession)
      .withColumn("session_idx",
        sum(col("__graft_new_s"))
          .over(byEntity.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(entityCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
  }

  /** Sequential funnel: per entity, the FIRST qualifying timestamp of each
    * step strictly after the previous step's timestamp (the
    * ordered-sequence semantics a 2-step min/max trick cannot express).
    * A chain of conditional-min aggregations joined back per entity — each
    * link is one map-side-combined agg + one per-entity join; no window,
    * no self-join explosion. Only entities that completed step 1 appear;
    * columns `t1..tk` are null past the drop-off point.
    */
  def funnelSteps(ev: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps needs at least one step")
    val first = ev.filter(col(typeCol) === steps.head)
      .groupBy(col(entityCol)).agg(min(col(tsCol)).as("t1"))
    val completed = steps.zipWithIndex.tail.foldLeft(List(first)) {
      case (acc, (step, i)) =>
        val prev = acc.head
        val cur = ev.filter(col(typeCol) === step)
          .join(prev.select(col(entityCol), col(s"t$i")), Seq(entityCol))
          .filter(col(tsCol) > col(s"t$i"))
          .groupBy(col(entityCol)).agg(min(col(tsCol)).as(s"t${i + 1}"))
        cur :: acc
    }.reverse
    completed.tail.foldLeft(completed.head) { (joined, stepDf) =>
      joined.join(stepDf, Seq(entityCol), "left")
    }
  }

  /** Per-step completion counts over [[funnelSteps]]: `n_step1..n_stepk`. */
  def funnelCounts(ev: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    val perEntity = funnelSteps(ev, entityCol, typeCol, tsCol, steps)
    val aggs = steps.indices.map { i =>
      if (i == 0) count(lit(1)).as("n_step1")
      else count(col(s"t${i + 1}")).as(s"n_step${i + 1}")
    }
    perEntity.agg(aggs.head, aggs.tail: _*)
  }

  /** Cohort retention: entities grouped by their FIRST event's day; for
    * each day-offset ≤ `maxOffsetDays`, how many of the cohort came back.
    * Join-reuse-shaped: the per-entity cohort table derives from the same
    * (entity, day) distinct frame the activity side uses, so one
    * aggregation subtree feeds both sides of the self-join (the distinct
    * frame is checkpointed once). Exact DATE math.
    *
    * Output: (cohort_day, day_offset, n_users).
    */
  def retention(ev: DataFrame, entityCol: String, tsCol: String,
      maxOffsetDays: Int = 7): DataFrame = {
    require(maxOffsetDays >= 0, s"negative retention horizon: $maxOffsetDays")
    val ud = ev.select(col(entityCol), to_date(col(tsCol)).as("__graft_d"))
      .distinct()
      .scopedCheckpoint(false) // feeds the cohort min AND the activity side
    val cohort = ud.groupBy(entityCol)
      .agg(min(col("__graft_d")).as("cohort_day"))
    ud.join(cohort, Seq(entityCol))
      .select(col("cohort_day"),
        datediff(col("__graft_d"), col("cohort_day")).as("day_offset"))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Time-series gap fill: each key's hourly count series densified over
    * its own [min hour, max hour] span — missing hours surface as explicit
    * zero rows (the resample/fill step before any windowed trend or
    * anomaly math). The spine is generated per key from the span endpoints
    * (one row per key → sequence/explode is metadata-sized) and left-joins
    * the observed counts.
    *
    * Output: (keyCol, h, n, is_gap).
    */
  def gapFillHourly(ev: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    // The spine↔hourly join key is __graft_-prefixed like every internal
    // working column: `h` is part of the documented OUTPUT shape, but an
    // input column named `h` must not be captured by the join (it is only
    // exposed in the final projection).
    val hourly = ev
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("__graft_h"))
      .agg(count(lit(1)).as("__graft_cnt"))
    val spine = hourly.groupBy(col(keyCol))
      .agg(min(col("__graft_h")).as("__graft_h0"),
        max(col("__graft_h")).as("__graft_h1"))
      .select(col(keyCol),
        explode(sequence(col("__graft_h0"), col("__graft_h1"),
          expr("interval 1 hour"))).as("__graft_h"))
    spine.join(hourly, Seq(keyCol, "__graft_h"), "left")
      .select(col(keyCol), col("__graft_h").as("h"),
        coalesce(col("__graft_cnt"), lit(0L)).as("n"),
        col("__graft_cnt").isNull.as("is_gap"))
  }

  /** Rolling active entities: per observed day, the daily distinct count
    * (`dau`) plus the rolling `windowDays`-day distinct count (`wau`). The
    * scalable formulation: each (day, entity) activity row EXPLODES into
    * the ≤windowDays report days it contributes to and the rolling
    * distinct becomes a plain per-day aggregation — a non-equi range join
    * of a day spine against the activity frame (the obvious SQL) would
    * nested-loop-scan |days| × |activity|, and a window over an
    * entity-bitmap needs state no engine shares. The ×windowDays fan-out
    * is the price, paid scan-local on narrow rows. Only observed days are
    * reported.
    */
  def activeUsers(ev: DataFrame, entityCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    // windowDays == 0 would make sequence() emit a DESCENDING day range,
    // silently attributing activity to PAST days instead of failing.
    require(windowDays >= 1, s"rolling window must cover >= 1 day: $windowDays")
    val ud = ev
      .select(to_date(col(tsCol)).as("d"), col(entityCol)).distinct()
      .scopedCheckpoint(false) // feeds DAU, the spine, and the fan-out
    val days = ud.select(col("d")).distinct()
    val dau = ud.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val contrib = ud
      .select(explode(sequence(col("d"), date_add(col("d"), windowDays - 1)))
        .as("d"), col(entityCol))
      .distinct()
    val wau = contrib.join(days, Seq("d"), "left_semi")
      .groupBy(col("d")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("d"))
  }

  /** Winsorization: clip a value column into each group's
    * [low, high] quantile bounds, where both bounds are SELECTED elements
    * ([[Quantiles.groupQuantiles]] discrete ranks `floor(p·(n−1))+1`) —
    * no interpolation, so every engine picks the identical bit pattern.
    * Null values are excluded (they have no rank and nothing to clip).
    *
    * `low`/`high` are (label, numerator, denominator) rank fractions; the
    * output keeps the input columns and adds the two bound columns (named
    * by their labels) plus `clipped`.
    */
  def winsorize(ev: DataFrame, groupCol: String, valCol: String,
      tieCol: String,
      low: (String, Int, Int) = ("p01", 1, 100),
      high: (String, Int, Int) = ("p99", 99, 100)): DataFrame = {
    val bounds = Quantiles
      .groupQuantiles(ev, groupCol, valCol, tieCol, Seq(low, high))
      .select(col(groupCol), col(low._1), col(high._1))
    ev.filter(col(valCol).isNotNull)
      .join(bounds, Seq(groupCol))
      .withColumn("clipped",
        least(greatest(col(valCol), col(low._1)), col(high._1)))
  }

  /** Per-bucket trending leaderboard: rank groups by volume inside each
    * time bucket, keep the top k. The rank partition holds one bucket's
    * GROUP COUNTS (bounded by group cardinality), not its events — no hot
    * funnel. Tie-break on the group value keeps the cut total-ordered.
    *
    * Output: (bucket `d`, groupCol, n, rank ≤ k).
    */
  def trending(ev: DataFrame, groupCol: String, bucket: Column, k: Int = 3)
      : DataFrame = {
    require(k >= 1, s"leaderboard depth must be >= 1: $k")
    val daily = ev
      .groupBy(bucket.as("d"), col(groupCol))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("d"))
      .orderBy(col("n").desc, col(groupCol))
    daily.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
