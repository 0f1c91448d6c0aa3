package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiler — the audit/documentation statistics a
  * warehouse surfaces next to its catalog snapshot (dbt's docs pages,
  * Glue crawler table stats): per column, the row count, null count,
  * distinct count, and min/max rendered as strings so heterogeneous
  * columns stack into one tall frame.
  *
  * Scale shape: ONE aggregation job over the table computes every
  * column's statistics together (count/nulls/min/max are plain
  * accumulators; the distinct counts expand — Spark rewrites multiple
  * DISTINCT aggregates into a single Expand + two-stage aggregate, so
  * the table is still scanned once). The per-column rows come from
  * unpivoting the single 1-row aggregate on the driver side of the
  * plan — no second scan, no per-column job. For genuinely wide tables
  * at 100 TB, `approxDistinct = true` swaps exact distinct counts for
  * HyperLogLog sketches (map-side combinable, no Expand multiplication
  * of the scan) — the profile then costs one narrow pass regardless of
  * column count.
  */
object Profiler {

  /** Profile `columns` of `df` (default: all). Returns one row per
    * column: (column, n_rows, n_nulls, n_distinct, min_value,
    * max_value) — min/max as strings ('' for all-null columns so the
    * frame stays null-free and hash-stable). `n_distinct` counts
    * non-null distinct values, exact unless `approxDistinct`.
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil,
      approxDistinct: Boolean = false): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "profile of zero columns")
    // Names are spliced into the stack() selectExpr below — quote or
    // backtick characters would silently corrupt that SQL, so refuse
    // them up front rather than profile the wrong thing.
    cols.find(c => c.contains("'") || c.contains("`")).foreach { c =>
      throw new IllegalArgumentException(
        s"profile cannot quote column name '$c' (contains ' or `)")
    }
    val aggs: Seq[Column] = cols.flatMap { c =>
      // Backticked: a bare col(c) would parse a dotted name ("a.b", legal
      // and common from JSON ingestion) as struct-field access.
      val v = col(s"`$c`")
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(when(v.isNull, 1)).as(s"__nn_$c"),
        (if (approxDistinct) approx_count_distinct(v) else countDistinct(v))
          .as(s"__nd_$c"),
        coalesce(min(v).cast("string"), lit("")).as(s"__mn_$c"),
        coalesce(max(v).cast("string"), lit("")).as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // Unpivot the 1-row aggregate into (column, stats...) rows with a
    // stack expression — metadata-plane reshaping of one row.
    val stackArgs = cols.map { c =>
      s"'$c', `__n_$c`, `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value)")
  }

  /** Per-group fixed-bin histogram of `valueCol`: one row per occupied
    * (group, bucket) with the bucket's count plus the group's (lo, hi)
    * range — the value-distribution profile next to [[profile]]'s
    * scalars and [[graft.operators.Quantiles]]'s ranks. Empty buckets
    * are omitted (densify client-side; emitting them would need a
    * per-group bucket spine for no analytical gain).
    *
    * Bucketing is the EXPLICIT expression
    * `least(nBins−1, floor(((v − lo) · nBins) / (hi − lo)))` rather than
    * a library width_bucket: each step is a single IEEE double op, so any
    * engine evaluating the same expression bit-agrees on every boundary
    * value — width_bucket implementations differ exactly there. A
    * constant group (hi = lo) puts all rows in bucket 0. Nulls are
    * excluded. Scale shape: one aggregation for the per-group ranges,
    * one join back against a one-row-per-group frame (AQE broadcasts it
    * while it fits; a forced broadcast would OOM the driver on
    * per-user-grade cardinalities), one map-side-combined count — the
    * value column never rides an exchange.
    */
  def histogram(df: DataFrame, valueCol: String, nBins: Int,
      groupCols: Seq[String]): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1: $nBins")
    require(groupCols.nonEmpty, "histogram needs at least one group column")
    val rows = df.filter(col(valueCol).isNotNull)
    val ranges = rows.groupBy(groupCols.map(col): _*)
      .agg(min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
    val bucket = when(col("hi") === col("lo"), lit(0L))
      .otherwise(least(lit(nBins - 1L),
        floor(((col(valueCol) - col("lo")) * lit(nBins)) /
          (col("hi") - col("lo")))))
    rows.join(ranges, groupCols)
      .withColumn("bucket", bucket)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("n"), max(col("lo")).as("lo"),
        max(col("hi")).as("hi"))
  }
}
