package graft.quality

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source freshness evaluation — `dbt source freshness` semantics (the
  * adapter inherits dbt-core's default collect_freshness macro: `select
  * max(loaded_at_field), current_timestamp()`; the reference pins the
  * clock macro at adapters.sql:194-196). Age = snapshot time − max
  * loaded-at; status escalates pass → warn → error as the age crosses
  * the configured thresholds — the staleness circuit-breaker run before
  * trusting a source in a build.
  *
  * The clock is INJECTED (a Timestamp argument, never wall-clock inside
  * the plan) so evaluations are deterministic and replayable; age is
  * integer seconds (both engines truncate the epoch the same way).
  *
  * Scale shape: a single max() aggregation per group — map-side
  * combined, one tiny result row per source (or per group for the
  * per-partition variant dbt cannot express); nothing else scans.
  */
object SourceFreshness {

  /** Per-group freshness: (groupCols..., max_loaded_at, age_s, status).
    * With `groupCols` empty, one global row (dbt's per-source shape —
    * the grouped form is the per-partition generalization that catches a
    * single stalled shard hiding behind a fresh global max).
    */
  def evaluate(df: DataFrame, loadedAtCol: String, now: Timestamp,
      warnAfterS: Long, errorAfterS: Long,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(warnAfterS >= 0 && errorAfterS >= warnAfterS,
      s"thresholds must satisfy 0 <= warn ($warnAfterS) <= error ($errorAfterS)")
    val maxAt = max(col(loadedAtCol)).as("max_loaded_at")
    val grouped =
      if (groupCols.isEmpty) df.agg(maxAt)
      else df.groupBy(groupCols.map(col): _*).agg(maxAt)
    val age = (lit(now).cast("long") -
      col("max_loaded_at").cast("long")).as("age_s")
    grouped.select(groupCols.map(col) :+ col("max_loaded_at") :+ age: _*)
      .withColumn("status",
        when(col("max_loaded_at").isNull, lit("error")) // no rows ever loaded
          .when(col("age_s") > errorAfterS, lit("error"))
          .when(col("age_s") > warnAfterS, lit("warn"))
          .otherwise(lit("pass")))
  }
}
