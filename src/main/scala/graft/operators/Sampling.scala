package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, repartition-stable sampling for training-data pipelines.
  *
  * `DataFrame.sample()` draws per-partition, so its output changes whenever
  * the input's partitioning changes (a re-read at different parallelism, an
  * AQE re-plan, a task retry under non-deterministic upstream order). A
  * 100 TB corpus pipeline needs the opposite contract: the SAME rows are
  * selected on every run, on any cluster shape, and train/valid/test splits
  * never leak across re-runs. These operators derive membership purely from
  * a per-row key, so selection is a scan-local codegen'd filter — no
  * shuffle, no RNG state, pushdown-friendly.
  *
  * The bucket is the first 32 bits of `md5("<key>:<salt>")` — the classic
  * content-addressed holdout trick. md5 (unlike multiplicative hashing,
  * which is linear in the key and turns consecutive ids into a lattice)
  * decorrelates both key structure and salts, and exists verbatim in
  * every mainstream engine, which keeps every gate below independently
  * recomputable by the DuckDB oracle (xxhash64 would be ~2× cheaper per
  * row but exists only on the Spark side; the md5 cost is scan-local and
  * codegen'd either way).
  *
  * Null-key contract (uniform across all three operators): a null key has
  * no bucket, so the row is never a member of any sample or split —
  * [[hashSample]] and [[mixture]] exclude the row, and [[withSplit]]
  * assigns a NULL split label (it must not drop rows, and silently filing
  * null-keyed rows under the last label would leak them into the eval
  * split). Filter or repair null keys upstream if they carry data.
  */
object Sampling {
  /** Bucket space: first 8 hex chars of the md5 = 32 bits. */
  val Space = 4294967296L

  /** The bucket expression: deterministic in `key` and `salt` alone.
    * Integer keys render identically as strings in any engine, so the
    * hashed bytes — and therefore membership — are engine-independent.
    */
  def hashBucket(key: Column, salt: Long): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 8),
      16, 10).cast("long")

  /** Bucket-space threshold for a keep fraction (public so oracle SQL and
    * specs can interpolate the exact same literal the filter compares to).
    */
  def threshold(fraction: Double): Long =
    math.round(fraction * Space)

  /** Keep ~`fraction` of rows, chosen deterministically by `keyCol`.
    * Different `salt` values draw statistically independent samples. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
      salt: Long = 0L): DataFrame =
    df.filter(hashBucket(col(keyCol), salt) < lit(threshold(fraction)))

  /** Per-ROW weighted sampling (importance / quality-weighted
    * downsampling): keep each row with probability equal to its own
    * `weightCol` value in [0, 1] — e.g. acceptance ∝ a quality score, the
    * soft alternative to a hard threshold cut. Deterministic in
    * (key, salt) like every sampler here: keep iff
    * bucket(key) < round(weight · Space), so weight ≥ 1 always keeps,
    * weight ≤ 0 (or null) always drops, and membership is reproducible on
    * any engine and any partitioning. Scan-local, no shuffle.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      salt: Long = 0L): DataFrame =
    df.filter(col(keyCol).isNotNull &&
      hashBucket(col(keyCol), salt) <
        round(coalesce(col(weightCol), lit(0.0)) * Space).cast("long"))

  /** Weighted corpus mixture (data mixing): per-group keep rates in one
    * scan-local pass — e.g. downsample boilerplate-heavy sources while
    * keeping rare languages at full rate. Groups absent from `rates` use
    * `defaultRate`. No shuffle: the per-row threshold is a CASE chain.
    */
  def mixture(df: DataFrame, keyCol: String, groupCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: Long = 0L): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(
      lit(threshold(defaultRate)): Column) { case (acc, (g, r)) =>
        when(col(groupCol) === g, lit(threshold(r))).otherwise(acc)
      }
    df.filter(hashBucket(col(keyCol), salt) < thr)
  }

  /** Rebalance the corpus toward TARGET class shares by downsampling
    * only (the "make the mix 40% en / 20% de / ..." curation op): the
    * largest feasible output size S satisfies S·share_c ≤ n_c for every
    * targeted class, so S = min_c ⌊n_c / share_c⌋, and each class keeps
    * rate_c = S·share_c / n_c — the binding (scarcest-relative) class
    * keeps everything, every other class downsamples to proportion.
    * Classes absent from `targetShares` are dropped (their target share
    * is zero). Membership is the usual content-addressed hash draw, so
    * achieved counts are binomially close to S·share_c, deterministic,
    * and engine-replayable: the derivation is three exact steps
    * (integer class counts → one float division+floor per class → one
    * float multiply-divide per rate) an external engine reproduces
    * operation-for-operation.
    *
    * Scale shape: one map-side-combined class-count aggregation (C
    * rows, collected — metadata plane), then a scan-local filter; no
    * shuffle of the data rows, no window.
    */
  def rebalance(df: DataFrame, keyCol: String, classCol: String,
      targetShares: Map[String, Double], salt: Long = 0L): DataFrame = {
    require(targetShares.nonEmpty, "no target shares")
    targetShares.foreach { case (c, s) =>
      require(s > 0.0 && s <= 1.0, s"share for '$c' must be in (0, 1], got $s")
    }
    val total = targetShares.values.sum
    require(math.abs(total - 1.0) < 1e-9,
      s"target shares must sum to 1, got $total")
    // get(0).toString, not getString: a non-string class column (int lang
    // ids) matches isin via coercion but would ClassCastException here.
    val counts = df.filter(col(classCol).isin(targetShares.keys.toSeq: _*))
      .groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    // A targeted class with zero rows forces S = 0 (no output can honor
    // its positive share) — surface that loudly instead of returning an
    // empty frame from a typo'd class name.
    targetShares.keys.find(c => counts.getOrElse(c, 0L) == 0L).foreach { c =>
      throw new IllegalArgumentException(
        s"target class '$c' has no rows — no output size can honor its share")
    }
    val s = targetShares.map { case (c, share) =>
      math.floor(counts(c) / share).toLong
    }.min
    val rates = targetShares.map { case (c, share) =>
      c -> (s * share / counts(c))
    }
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(-1L): Column) {
      case (acc, (c, r)) =>
        when(col(classCol) === c, lit(threshold(math.min(r, 1.0)))).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), salt) < thr)
  }

  /** Exact-count per-group sampling (eval-set construction: "k docs per
    * language"): keeps, per group, the k rows with the SMALLEST
    * content-addressed bucket — deterministic, repartition-stable, and
    * engine-recomputable (the same md5 ordering as every operator here; an
    * external engine reproduces the selection as
    * `row_number() OVER (PARTITION BY group ORDER BY bucket, key) <= k`),
    * and statistically uniform within the group because the md5 order is
    * uncorrelated with any data order.
    *
    * Scale shape: that row_number window is exactly what this does NOT
    * run — a window partitioned by group funnels each group through one
    * task's sort, and "k per language" over a 100 TB corpus means
    * corpus-sized partitions. Instead a bounded first-k-by-(bucket, key)
    * collector ([[graft.functions.CollectMinK]] — size-k heap state,
    * map-side combined, a group spanning P partitions ships ≤ P·k entries)
    * picks the winning keys on one aggregation, and a semi-join (tiny
    * build side: k × groups keys, broadcastable) pulls the full rows back
    * scan-locally. Ties are impossible: (bucket, key) falls back to the
    * key, a total order. Rows with a null key are never selected (see the
    * null-key contract above); keys are assumed unique per row, as
    * everywhere in this module.
    */
  def stratified(df: DataFrame, keyCol: String, groupCol: String, k: Int,
      salt: Long = 0L): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val selected = df
      .filter(col(keyCol).isNotNull)
      .select(col(groupCol).as("__g"),
        struct(hashBucket(col(keyCol), salt).as("b"), col(keyCol).as("k")).as("__m"))
      .groupBy("__g")
      .agg(graft.functions.GraftFunctions.collectMinK(col("__m"), k).as("__ks"))
      .select(explode(col("__ks").getField("k")).as(keyCol))
    df.join(selected, Seq(keyCol), "left_semi")
  }

  /** Top-k rows per group by SCORE — the "keep the k best documents per
    * source" selection (quality-score cuts, per-language caps). Same
    * scale shape as [[stratified]], which picks k at RANDOM: a bounded
    * first-k collector on ONE aggregation (size-k heap state, map-side
    * combined, ≤ P·k entries shipped for a group spanning P partitions)
    * elects the winning keys, and a broadcastable semi-join pulls the
    * full rows back scan-locally — never a `row_number` window, whose
    * per-group sort funnels a 100 TB group through one task. Ordering is
    * (score desc, key asc) — the key tiebreak makes selection total and
    * run-independent. Rows with a null key or null score are never
    * selected (a null score has no rank; the module's null-key contract).
    */
  def topKByGroup(df: DataFrame, keyCol: String, groupCol: String,
      scoreCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val selected = df
      .filter(col(keyCol).isNotNull && col(scoreCol).isNotNull)
      .select(col(groupCol).as("__g"),
        struct((-col(scoreCol)).as("ns"), col(keyCol).as("k")).as("__m"))
      .groupBy("__g")
      .agg(graft.functions.GraftFunctions.collectMinK(col("__m"), k).as("__ks"))
      .select(explode(col("__ks").getField("k")).as(keyCol))
    df.join(selected, Seq(keyCol), "left_semi")
  }

  /** Token-budget mixture (data mixing by VOLUME, not row count): keep
    * ~`budgets(source)` tokens per source — the way training mixtures are
    * actually specified ("300B tokens of web, 50B of code"). Two passes:
    * (1) per-source token totals — one map-side-combined aggregation whose
    * result is source-cardinality-sized and broadcasts; (2) a scan-local
    * filter at rate min(1, budget/total) with the same content-addressed
    * membership as [[mixture]]. The realized token count concentrates
    * tightly around the budget (hash membership is independent of token
    * length up to the doc-length distribution), which is the scalable
    * contract — an EXACT running-sum cutoff would need a per-source
    * ordered window, a single-task sort funnel at corpus scale. Sources
    * absent from `budgets` keep everything; rows with a null group or a
    * null key are excluded (the module's null-key contract).
    */
  def tokenBudgetMixture(df: DataFrame, keyCol: String, groupCol: String,
      tokenCol: String, budgets: Map[String, Long],
      salt: Long = 0L): DataFrame = {
    val budgetCol = budgets.toSeq.sortBy(_._1).foldLeft(
      lit(null).cast("long"): Column) { case (acc, (g, b)) =>
        when(col("__g") === g, lit(b)).otherwise(acc)
      }
    // sum() over an all-NULL token column is NULL; left alone that would
    // null the threshold and silently drop the whole source — coalesce to
    // 0, which is <= any budget, so a source with no measurable volume is
    // kept whole (consistent with the uncapped path).
    val rates = df.groupBy(col(groupCol).as("__g"))
      .agg(coalesce(sum(col(tokenCol)), lit(0L)).as("__tot"))
      .select(col("__g"),
        when(budgetCol.isNull || col("__tot") <= budgetCol, lit(Space))
          .otherwise(round(budgetCol.cast("double") / col("__tot") * Space)
            .cast("long")).as("__thr"))
    df.join(broadcast(rates), col(groupCol) === col("__g"))
      .filter(hashBucket(col(keyCol), salt) < col("__thr"))
      .drop("__g", "__thr")
  }

  /** Temperature-flattened mixture (the T5/UniMax α-sampling rule, the
    * way multilingual/multi-source training mixes are specified when the
    * per-source budgets aren't hand-written): target share per source
    * q_s ∝ tot_s^α — α = 1 reproduces natural proportions, α → 0
    * approaches uniform, 0.3–0.7 is the usual "boost the tail without
    * drowning the head" band — realized against a `totalBudget` of tokens
    * as keep rate min(1, q_s·budget / tot_s).
    *
    * Same two-pass scale shape as [[tokenBudgetMixture]]: one map-side-
    * combined per-source total (source-cardinality-sized, broadcasts), a
    * tiny second aggregation for the weight normalizer, then a scan-local
    * content-addressed filter — no per-row shuffle anywhere. Single pass,
    * no redistribution: a head source capped at rate 1 does NOT push its
    * unused budget to the tail (the iterative water-filling refinement
    * trades determinism for little at training scale), so realized volume
    * is ≤ budget when any source saturates. Zero-volume sources are kept
    * whole (nothing to cap — the [[tokenBudgetMixture]] contract); null
    * group/key rows are excluded per the module contract.
    */
  def temperatureMixture(df: DataFrame, keyCol: String, groupCol: String,
      tokenCol: String, totalBudget: Long, alpha: Double,
      salt: Long = 0L): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(totalBudget > 0L, s"totalBudget must be positive, got $totalBudget")
    val tots = df.groupBy(col(groupCol).as("__g"))
      .agg(coalesce(sum(col(tokenCol)), lit(0L)).as("__tot"))
    val weights = tots.withColumn("__w",
      pow(col("__tot").cast("double"), lit(alpha)))
    val wsum = weights.agg(sum(col("__w")).as("__wsum"))
    // Threshold arithmetic is plain left-associative double math so the
    // DuckDB oracle can replay it token-for-token:
    //   round(w / wsum * budget / tot * Space), capped at Space.
    val rates = weights.crossJoin(wsum)
      .select(col("__g"),
        when(col("__tot") === 0L, lit(Space))
          .otherwise(least(lit(Space),
            round(col("__w") / col("__wsum") * lit(totalBudget.toDouble)
              / col("__tot") * lit(Space.toDouble)).cast("long"))).as("__thr"))
    df.join(broadcast(rates), col(groupCol) === col("__g"))
      .filter(hashBucket(col(keyCol), salt) < col("__thr"))
      .drop("__g", "__thr")
  }

  /** Disjoint train/valid/test assignment: each key lands in exactly one
    * split (cumulative bucket ranges), so membership never leaks between
    * splits across runs or engine versions. `fractions` are (label, share)
    * in order; shares must sum to ≤ 1 — rows past the last boundary get the
    * final label (so (train .8)(valid .1)(test .1) is exhaustive). A null
    * key gets a NULL split label (see the null-key contract above).
    */
  def withSplit(df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)], salt: Long = 0L,
      splitCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty, "at least one split label required")
    fractions.foreach { case (l, f) =>
      require(f > 0.0, s"split share for '$l' must be positive, got $f")
    }
    require(fractions.map(_._2).sum <= 1.0 + 1e-9,
      s"split shares must sum to <= 1, got ${fractions.map(_._2).sum} " +
        "(an oversumming boundary silently empties the trailing splits)")
    val bucket = hashBucket(col(keyCol), salt)
    val bounds = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
    val expr = fractions.init.zip(bounds.tail.init).foldRight(
      lit(fractions.last._1): Column) { case (((label, _), hi), acc) =>
        when(bucket < lit(threshold(hi)), lit(label)).otherwise(acc)
      }
    df.withColumn(splitCol, when(bucket.isNotNull, expr))
  }

  /** Multi-epoch repetition schedule — the quality-aware "repeat good
    * data" mixing step (scaling-law practice: high-quality sources run
    * several epochs while bulk crawl runs a fraction of one). Each row is
    * replicated once per training epoch it participates in: a row with
    * `epochsCol` = e appears in epochs 1..⌊e⌋ unconditionally and in the
    * final partial epoch ⌈e⌉ by content-addressed draw at rate e − ⌊e⌋
    * (the same md5-bucket primitive as every sampler here, salted with
    * the epoch index so the partial-epoch subset is its own independent
    * deterministic draw). e ≤ 0 or null drops the row; e = 2.0 yields
    * exactly two instances. Scan-local: one explode against a row-local
    * sequence — no shuffle, no join; downstream shuffling sees `epoch` as
    * an ordinary column.
    */
  def epochRepeat(df: DataFrame, keyCol: String, epochsCol: Column,
      epochOut: String = "epoch", salt: Long = 0L): DataFrame = {
    val full = floor(epochsCol).cast("long")
    val frac = epochsCol - floor(epochsCol)
    val nInstances = full + when(frac > 0, lit(1L)).otherwise(lit(0L))
    df.withColumn("__n_inst", when(epochsCol.isNotNull && epochsCol > 0,
        nInstances).otherwise(lit(0L)))
      .withColumn("__full", full)
      .withColumn("__frac_thr", round(frac * Space).cast("long"))
      .withColumn(epochOut,
        // sequence(1, 0) would generate a DESCENDING [1, 0] — rows with
        // zero instances need an explicit empty array, not a backwards
        // range.
        explode(when(col("__n_inst") >= 1,
          sequence(lit(1L), col("__n_inst")))
          .otherwise(array().cast("array<bigint>"))))
      .filter(col(epochOut) <= col("__full") ||
        hashBucket(concat(col(keyCol).cast("string"), lit("#"),
          col(epochOut).cast("string")), salt) < col("__frac_thr"))
      .drop("__n_inst", "__full", "__frac_thr")
  }
}
