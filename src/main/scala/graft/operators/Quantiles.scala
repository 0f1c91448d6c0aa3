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
      .withColumn("__graft_rn", row_number().over(w))
      .withColumn("__graft_n",
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
        val idx = (lit(num.toLong) * (col("__graft_n") - 1)) / lit(den.toLong)
        max(when(col("__graft_rn") === (idx.cast("long") + 1), col(valueCol)))
          .as(name)
      }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** The SKETCH path this object's scaladoc routes 100 TB low-cardinality
    * keys to: per-group `approx_percentile` (Greenwald–Khanna) — ONE
    * map-side-combinable aggregation pass, no window, no per-group funnel:
    * each task folds its partition into a bounded sketch and only sketches
    * ride the exchange, so a 3-key groupBy over 100 TB is as parallel as
    * the scan. The price is the sketch's error contract: the returned
    * element's RANK is within n/accuracy of the target rank (it is always
    * an actual element of the group, like the exact path — GK retains
    * samples). Merge order across partitions can steer WHICH in-tolerance
    * element is returned, so callers needing run-to-run bit-stability must
    * assert the rank bound (see [[rankWithin]]), not the value.
    *
    * Output matches [[groupQuantiles]] exactly — one row per group,
    * `n_rows` (non-null values) plus one column per requested quantile —
    * INCLUDING the group set: null values are filtered before grouping, so
    * a group whose values are all null is absent here just like on the
    * exact path (a caller following the scaladoc's 100 TB routing between
    * the two paths must see the same groups), while a NULL group KEY with
    * non-null values is a real group on both.
    */
  def approxGroupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      quantiles: Seq[(String, Int, Int)], accuracy: Int = 10000): DataFrame = {
    require(quantiles.nonEmpty, "no quantiles requested")
    require(accuracy >= 1, s"accuracy must be positive: $accuracy")
    quantiles.foreach { case (n, num, den) =>
      require(den > 0 && num >= 0 && num <= den, s"bad quantile $n: $num/$den")
    }
    val aggs = count(col(valueCol)).as("n_rows") +:
      quantiles.map { case (name, num, den) =>
        percentile_approx(col(valueCol), lit(num.toDouble / den),
          lit(accuracy)).as(name)
      }
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Rank-error check for a sketch-quantile frame: given the
    * [[approxGroupQuantiles]] output and the source rows, one boolean per
    * quantile and group — TRUE iff the returned element's feasible rank
    * interval [|{v < q}|+1, |{v <= q}|] lies within `floor(n/accuracy)+1`
    * ranks of the target rank `p·n`. Pure integer arithmetic (the target
    * comparison is cross-multiplied by the quantile's denominator), so the
    * verdict is deterministic even though the sketch's returned element is
    * merge-order-dependent — this is the CONTRACT surface a correctness
    * gate can hash. One extra pass over the source (a broadcast join
    * against the groups-sized quantile frame + a map-side-combined agg).
    *
    * Output: (groupCol, n_rows, <name>_ok per quantile) — plus, with
    * `pinValues = true`, one `<name>_val` column per quantile: the sketch's
    * returned element WHEN the whole rank-tolerance window
    * [p·n − tol, p·n + tol] (clamped to [1, n]) provably contains a single
    * distinct value, else NULL. Distinct values' feasible-rank intervals
    * partition [1, n], so "the returned element's interval covers the
    * window" (checked from the same |{v<q}| / |{v≤q}| counters, pure
    * integer arithmetic) holds iff the window is single-valued — and then
    * ANY element within tolerance IS that value, making the pinned column
    * deterministic and oracle-replayable even though the sketch's choice
    * among in-tolerance elements is merge-order-dependent: an exact engine
    * derives the identical column from order statistics at the window's
    * two clamped ends (equal ⇒ that value, else NULL). A sketch that
    * returns an out-of-tolerance element fails `<name>_ok` on the same
    * row, so the NULL/value split can never silently mask a breach.
    */
  def rankWithin(df: DataFrame, approx: DataFrame, groupCol: String,
      valueCol: String, quantiles: Seq[(String, Int, Int)],
      accuracy: Int, pinValues: Boolean = false): DataFrame = {
    // Null-SAFE group equality: a NULL group key is a real group on both
    // quantile paths (groupBy keeps it), and a plain equi-join would
    // silently drop it from the verdict frame.
    val approxG = approx.withColumnRenamed(groupCol, "__graft_g")
    val joined = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol))
      .join(broadcast(approxG), col(groupCol) <=> col("__graft_g"))
      .drop("__graft_g")
    val counters = quantiles.flatMap { case (name, _, _) => Seq(
      sum(when(col(valueCol) < col(name), 1L).otherwise(0L))
        .as(s"__graft_lo_$name"),
      sum(when(col(valueCol) <= col(name), 1L).otherwise(0L))
        .as(s"__graft_hi_$name"))
    }
    val nRows = first(col("n_rows")).as("n_rows")
    // The sketch's returned elements are constant per group (they ride in
    // on the broadcast approx frame), so first() is deterministic — they
    // must survive the aggregation for the pinned-value projection below.
    val carried =
      if (pinValues) quantiles.map { case (name, _, _) =>
        first(col(name)).as(name) }
      else Nil
    val counted = joined.groupBy(col(groupCol))
      .agg(nRows, (counters ++ carried): _*)
    val checks = quantiles.map { case (name, num, den) =>
      val tol = (col("n_rows") / lit(accuracy.toLong)).cast("long") + lit(1L)
      val target = lit(num.toLong) * col("n_rows") // target rank ×den
      (((col(s"__graft_lo_$name") + 1 - tol) * den <= target) &&
        ((col(s"__graft_hi_$name") + tol) * den >= target)).as(s"${name}_ok")
    }
    // Pinned values (see scaladoc): window ends as integer ranks —
    // rmin = max(1, ceil((num·n − tol·den)/den)), rmax = min(n,
    // floor((num·n + tol·den)/den)) — via the same exact-floor long
    // division the exact path uses (numerators are exact doubles below
    // 2^53; the quotient is a rational with denominator ≤ den, so the
    // truncating cast is an exact floor). The ceil goes through
    // floor((x + den − 1)/den) on a numerator clamped ≥ den, keeping
    // everything non-negative so truncation = floor.
    val pins = if (!pinValues) Nil else quantiles.map { case (name, num, den) =>
      val tol = (col("n_rows") / lit(accuracy.toLong)).cast("long") + lit(1L)
      val lo = lit(num.toLong) * col("n_rows") - tol * lit(den.toLong)
      val rmin = ((greatest(lo, lit(den.toLong)) + lit(den.toLong - 1)) /
        lit(den.toLong)).cast("long")
      val rmax = least(((lit(num.toLong) * col("n_rows") +
        tol * lit(den.toLong)) / lit(den.toLong)).cast("long"),
        col("n_rows"))
      when(col(s"__graft_lo_$name") + 1 <= rmin &&
        col(s"__graft_hi_$name") >= rmax, col(name)).as(s"${name}_val")
    }
    counted.select(col(groupCol) +: col("n_rows") +: (checks ++ pins): _*)
  }

  /** Value-interval form of the sketch contract (r16 verdict item 3 —
    * the thinnest-oracle class closed for near-continuous values): per
    * group and quantile, the EXACT order statistics at the two clamped
    * ends of the rank-tolerance window — `<name>_lo` at rank
    * rmin = max(1, ceil((p·n − tol)/1)) and `<name>_hi` at rank
    * rmax = min(n, floor(p·n + tol)), tol = floor(n/accuracy)+1, the
    * identical integer arithmetic as [[rankWithin]]'s pins — plus
    * `<name>_ok` = the sketch's returned element BETWEEN the two. An
    * exact engine replays `_lo`/`_hi` from its own order statistics, so
    * a correctness gate hashes REAL replayed values instead of taking
    * the rank contract's word for it; `_ok` is equivalent to
    * [[rankWithin]]'s counter check (for an element q: q ≥ v_lo ⟺
    * |{x ≤ q}| ≥ rmin and q ≤ v_hi ⟺ |{x < q}| + 1 ≤ rmax — the same
    * inequalities cross-multiplied, with the [1, n] clamps vacuous for
    * an element), and stays merge-order-free: every conforming sketch
    * choice lands inside the window by definition.
    *
    * Plan shape: computing true order statistics requires a per-group
    * rank (one shuffle + in-partition sort — the exact path's funnel),
    * so this is the VERIFICATION surface for gates and audits; the
    * production sketch path ([[approxGroupQuantiles]]) stays one
    * map-side-combinable pass with no Window. Output: (groupCol,
    * n_rows, then per quantile `<name>_lo`, `<name>_hi`, `<name>_ok`).
    */
  def boundsWithin(df: DataFrame, approx: DataFrame, groupCol: String,
      valueCol: String, quantiles: Seq[(String, Int, Int)],
      accuracy: Int): DataFrame = {
    require(quantiles.nonEmpty, "no quantiles requested")
    require(accuracy >= 1, s"accuracy must be positive: $accuracy")
    quantiles.foreach { case (n, num, den) =>
      require(den > 0 && num >= 0 && num <= den, s"bad quantile $n: $num/$den")
    }
    // No tie-break column: ties share the VALUE, and only values are
    // selected — rank assignment among tied rows cannot change the
    // selected element (the property the exact oracle relies on too).
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol).asc)
    val ranked = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol))
      .withColumn("__graft_rn", row_number().over(w))
      .withColumn("__graft_n",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val n = col("__graft_n")
    val aggs = max(n).as("n_rows") +:
      quantiles.flatMap { case (name, num, den) =>
        // Same exact-floor long division as rankWithin's pins (numerators
        // are exact doubles below 2^53; quotients are rationals with
        // denominator ≤ den, so the truncating cast is an exact floor on
        // these non-negative values).
        val tol = (n / lit(accuracy.toLong)).cast("long") + lit(1L)
        val lo = lit(num.toLong) * n - tol * lit(den.toLong)
        val rmin = ((greatest(lo, lit(den.toLong)) + lit(den.toLong - 1)) /
          lit(den.toLong)).cast("long")
        val rmax = least(((lit(num.toLong) * n + tol * lit(den.toLong)) /
          lit(den.toLong)).cast("long"), n)
        Seq(
          max(when(col("__graft_rn") === rmin, col(valueCol)))
            .as(s"${name}_lo"),
          max(when(col("__graft_rn") === rmax, col(valueCol)))
            .as(s"${name}_hi"))
      }
    val bounds = ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    // Null-SAFE group join against the sketch frame (a NULL group key is
    // a real group on both sides); both frames descend from the same
    // null-filtered groupBy, so the group sets are identical.
    val approxG = approx.drop("n_rows")
      .withColumnRenamed(groupCol, "__graft_g")
    val joined = bounds.join(broadcast(approxG),
      col(groupCol) <=> col("__graft_g")).drop("__graft_g")
    val out = quantiles.flatMap { case (name, _, _) => Seq(
      col(s"${name}_lo"), col(s"${name}_hi"),
      col(name).between(col(s"${name}_lo"), col(s"${name}_hi"))
        .as(s"${name}_ok"))
    }
    joined.select(col(groupCol) +: col("n_rows") +: out: _*)
  }
}
