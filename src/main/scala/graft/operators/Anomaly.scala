package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection — median/MAD flags, the
  * distribution-drift screen a pipeline runs over its numeric telemetry
  * (latency, event values, token counts) before trusting a batch. Median
  * and MAD (median absolute deviation) are chosen over mean/stddev
  * deliberately: both are SELECTED elements (discrete type-1 quantiles via
  * [[Quantiles]]), so the whole rule is deterministic across engines and
  * partitionings — mean/stddev would accumulate float error in
  * partition-order-dependent ways, and one ULP of variance drift moves
  * borderline flags. The only arithmetic beyond selection is
  * `abs(x − med)` and `dev > k·mad` — single IEEE ops with bit-identical
  * results on any engine evaluating the same expression.
  *
  * Scale shape: two exact-quantile passes (each: one shuffle on the group
  * key + in-partition sort over narrow (group, value, tie) rows) and two
  * joins against one-row-per-group frames (AQE broadcasts them). The
  * deviation frame is recomputed for the final join rather than
  * checkpointed — at 100 TB a full-data checkpoint costs more storage than
  * the second scan costs time; per-key fan-out keys are the intended use
  * (the low-cardinality-funnel caveat of [[Quantiles]] applies verbatim).
  */
object Anomaly {

  /** Row-level flags: input rows (non-null `valueCol` only) plus `__med`,
    * `__mad`, `__dev`, and `is_outlier` = `__dev > k·__mad`. With MAD = 0
    * (over half the group identical) any deviation at all is an outlier —
    * the standard degenerate-MAD behavior, worth knowing when k-gating.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val med = Quantiles
      .groupQuantiles(df, groupCol, valueCol, tieCol, Seq(("__med", 1, 2)))
      .select(col(groupCol), col("__med"))
    val dev = df.filter(col(valueCol).isNotNull)
      .join(med, Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
    val mad = Quantiles
      .groupQuantiles(dev, groupCol, "__dev", tieCol, Seq(("__mad", 1, 2)))
      .select(col(groupCol), col("__mad"))
    dev.join(mad, Seq(groupCol))
      .withColumn("is_outlier", col("__dev") > lit(k) * col("__mad"))
  }
}
