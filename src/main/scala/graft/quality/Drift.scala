package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution drift between a baseline and a current slice — PSI
  * (population stability index), the standard production monitor for
  * "did this feed's value distribution move": Σ over fixed bins of
  * (p_b − q_b)·ln(p_b/q_b), with the conventional read of < 0.1 stable,
  * 0.1–0.25 drifting, > 0.25 shifted.
  *
  * Determinism discipline: bins are the EXPLICIT single-op IEEE bucket
  * arithmetic of [[Profiler.histogram]] over the BASELINE's per-group
  * range (current values clamp into it — mass beyond the old range lands
  * in the edge bins, which is exactly the drift signal); both
  * distributions Laplace-smooth (+1 per bin) so no bin is empty; and
  * each bin's PSI term quantizes to integer MICRO-units before an exact
  * integer sum (the BM25/UnigramLm discipline — ln differs in the last
  * ulp across engines, so the sum must never see raw doubles). Every
  * term is ≥ 0 ((p−q) and ln(p/q) share sign), so the half-away-from-
  * zero rounding edge never changes sign.
  *
  * Scale shape: one aggregation per side for bin counts (map-side
  * combined, value column pruned), a bucket spine of group-cardinality ×
  * nBins rows (metadata-sized), one join of two bin-count frames — no
  * full-data exchange anywhere.
  */
object Drift {

  /** One row per group: (groupCols..., n_base, n_cur, psi_micro, psi,
    * drifted) with `drifted` = psi > 0.1.
    */
  def psi(baseline: DataFrame, current: DataFrame, valueCol: String,
      groupCols: Seq[String], nBins: Int): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2: $nBins")
    require(groupCols.nonEmpty, "psi needs at least one group column")
    val gcols = groupCols.map(col)
    val base = baseline.filter(col(valueCol).isNotNull)
    val cur = current.filter(col(valueCol).isNotNull)
    // Bucket ranges come from the baseline — but a group present ONLY in
    // the current slice (a brand-new population, the strongest possible
    // drift) must still get a row: a baseline-only range spine would
    // silently drop its rows and a monitor would read "stable". New
    // groups fall back to their CURRENT range (baseline counts are all
    // zero there; the Laplace smoothing keeps every term defined) and are
    // flagged drifted unconditionally via n_base = 0.
    val baseRanges = base.groupBy(gcols: _*)
      .agg(min(col(valueCol)).as("__blo"), max(col(valueCol)).as("__bhi"))
    val curRanges = cur.groupBy(gcols: _*)
      .agg(min(col(valueCol)).as("__clo"), max(col(valueCol)).as("__chi"))
    val ranges = baseRanges.join(curRanges, groupCols, "full_outer")
      .select((gcols :+ coalesce(col("__blo"), col("__clo")).as("lo") :+
        coalesce(col("__bhi"), col("__chi")).as("hi")): _*)
    def bucketed(df: DataFrame, out: String): DataFrame = {
      val raw = floor(((col(valueCol) - col("lo")) * lit(nBins)) /
        (col("hi") - col("lo")))
      // Constant baseline (hi == lo) has no range to scale into — bucket
      // by EQUALITY with the constant: matches in bin 0, departures in
      // the far edge bin. Mapping everything to bin 0 (the old rule) made
      // any shift away from a constant baseline report psi = 0.
      val b = when(col("hi") === col("lo"),
          when(col(valueCol) === col("lo"), lit(0L)).otherwise(lit(nBins - 1L)))
        .otherwise(greatest(lit(0L), least(lit(nBins - 1L), raw)))
      df.join(ranges, groupCols)
        .withColumn("__b", b)
        .groupBy((gcols :+ col("__b")): _*)
        .agg(count(lit(1)).as(out))
    }
    val spine = ranges.select(
      (gcols :+ explode(sequence(lit(0L), lit(nBins - 1L))).as("__b")): _*)
    val joined = spine
      .join(bucketed(base, "__cb"), groupCols :+ "__b", "left")
      .join(bucketed(cur, "__cc"), groupCols :+ "__b", "left")
      .withColumn("__cb", coalesce(col("__cb"), lit(0L)))
      .withColumn("__cc", coalesce(col("__cc"), lit(0L)))
    val totals = joined.groupBy(gcols: _*)
      .agg(sum(col("__cb")).as("__nb"), sum(col("__cc")).as("__nc"))
    val p = (col("__cb") + lit(1L)).cast("double") /
      (col("__nb") + lit(nBins.toLong)).cast("double")
    val q = (col("__cc") + lit(1L)).cast("double") /
      (col("__nc") + lit(nBins.toLong)).cast("double")
    joined.join(totals, groupCols)
      .withColumn("__term",
        round(((p - q) * log(p / q)) * lit(1e6), 0).cast("long"))
      .groupBy(gcols: _*)
      .agg(max(col("__nb")).as("n_base"), max(col("__nc")).as("n_cur"),
        sum(col("__term")).as("psi_micro"))
      .withColumn("psi", col("psi_micro").cast("double") / lit(1e6))
      .withColumn("drifted",
        col("psi_micro") > lit(100000L) || col("n_base") === lit(0L))
  }
}
