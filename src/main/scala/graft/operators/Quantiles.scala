package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group discrete quantiles — the distribution statistics a
  * pipeline reports next to its profiles (latency p99s, token-count
  * medians, value-distribution drift checks). DISCRETE quantiles by
  * deliberate choice: the selected value is an actual element of the
  * group — ascending rank floor(p·(n−1))+1, i.e. the LOWER value of the
  * type-7 index bracket (NOT Hyndman–Fan type-1, whose rank is
  * ceil(p·n): one element higher for most (p, n); this operator's
  * contract is the exact rank formula stated here) — computed with pure
  * INTEGER arithmetic (p as a rational num/den, index = num·(n−1) div
  * den), so there is no interpolation and no floating-point boundary for
  * engines or partitionings to disagree on. Interpolating quantiles
  * differ between implementations exactly at the half-way products; a
  * selected element cannot.
  *
  * Scale shape: one shuffle on the group key, one in-partition sort (any
  * exact quantile needs the sort), a rank + per-group count in the same
  * window pass, then the group-level aggregation collapses to one row per
  * group — only (group, value, rank) rides the exchange. LOW-CARDINALITY
  * group keys funnel each group through one task — that is inherent to
  * exact ranks; at 100 TB use the sketch path instead
  * (`approx_percentile` is one map-side-combinable pass with no per-group
  * funnel) and reserve this operator for per-key distributions where the
  * key fans out (user, domain, shard).
  */
object Quantiles {

  /** One row per group: `n_rows` plus one column per requested quantile.
    * `quantiles` = (outputName, numerator, denominator) with 0 ≤ p ≤ 1;
    * e.g. ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100). Null values
    * are excluded (a null sorts but cannot be "the p99"); ties on the
    * value column are broken by `tieCol` so the rank — though not the
    * selected VALUE, which ties make identical anyway — is total-ordered.
    */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, quantiles: Seq[(String, Int, Int)]): DataFrame = {
    require(quantiles.nonEmpty, "no quantiles requested")
    quantiles.foreach { case (n, num, den) =>
      require(den > 0 && num >= 0 && num <= den, s"bad quantile $n: $num/$den")
    }
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(tieCol).asc)
    val ranked = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol), col(tieCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val aggs = count(lit(1)).as("n_rows") +:
      quantiles.map { case (name, num, den) =>
        // floor(num·(n−1)/den) + 1. The long division goes through a
        // double quotient (Spark's `/` on longs), but the floor is still
        // EXACT: the numerator is an exact double below 2^53 and the true
        // quotient is a rational with denominator ≤ den, so it is either
        // an integer (whose division rounds to itself) or at least 1/den
        // away from one — far beyond rounding distance. The cast
        // truncates toward zero = floor for these non-negative values.
        val idx = (lit(num.toLong) * (col("__n") - 1)) / lit(den.toLong)
        max(when(col("__rn") === (idx.cast("long") + 1), col(valueCol)))
          .as(name)
      }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
