package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data pipelines: lay documents out as
  * one contiguous token stream per shard and derive which fixed-length
  * training sequences each document occupies (the GPT-style "concatenate
  * and chunk" packing contract — a document may straddle a sequence
  * boundary and then spans consecutive sequence ids).
  *
  * Determinism is the whole point: the layout must be identical on every
  * run, every cluster shape, and every engine, or a resumed/sharded
  * training job reads different data than the one it resumed from. Both
  * the shard assignment and the within-shard order derive from the same
  * content-addressed md5 bucket as [[Sampling]] (never from input order,
  * which changes under AQE re-plans and task retries), so the layout IS
  * ALSO the deterministic global shuffle training pipelines need —
  * documents land in hash-random order, decorrelated from any crawl /
  * source / time order in the input.
  *
  * Scale shape: one hash-partitioned window per shard — the only shuffle —
  * whose partition sizes the caller controls directly with `nShards`
  * (corpus_tokens / nShards tokens per sort partition; at 100 TB pick
  * nShards in the tens of thousands and each shard sorts a few GB). No
  * global sort, no single-task funnel, no driver-side state. An EXACT
  * greedy bin-packer ("close the pack when the next doc would overflow")
  * is deliberately not offered: its pack ids are a sequential recurrence
  * over the shard (each boundary depends on every prior row), which
  * serializes at scale and wastes the tail of every pack; the contiguous
  * layout wastes nothing and is what sequence-packed pretraining actually
  * consumes.
  */
object Packing {
  /** Assign each row its position in the packed layout. Adds:
    *   - `shard`  — which of `nShards` independent streams the doc joins
    *   - `off`    — the doc's first token offset within its shard stream
    *   - `seq_first` / `seq_last` — the range of `seqLen`-sized training
    *     sequences the doc's tokens land in (inclusive; equal when the doc
    *     fits inside one sequence)
    *
    * `tokenCol` is the doc's token count; null counts as 0 (the doc is a
    * zero-width marker at its offset, `seq_last` = `seq_first`). Null keys
    * are excluded per the [[Sampling]] module contract — a null key has no
    * bucket, so it has no deterministic place in any layout. Keys must be
    * unique (they address documents) — the layout's ordering tie-break and
    * the position join-back both assume it, and a duplicate key fails the
    * job with a raise_error naming the key (checked for free on the
    * layout sort — see the in-code guard).
    *
    * Plan shape: the per-shard window SORT runs over NARROW rows only —
    * (key, token count), ~16 bytes — and the computed positions join back
    * to the caller's payload by key (hash exchange + hash join; the
    * position side is the build side, so the payload is never sorted).
    * Windowing the payload frame directly would push every column —
    * including full document text — through the shard exchange AND its
    * sort buffer: at 100 TB a full-text sort per shard is the scale-killer
    * (and at bench scale it was the r08 `pipe_clean_pack` memory cliff),
    * while a 16-byte-row sort is trivial. Callers that project the payload
    * away (layout-summary queries) lose nothing: column pruning reduces
    * the join's payload side to the key column.
    */
  def packSequences(df: DataFrame, keyCol: String, tokenCol: String,
      seqLen: Long, nShards: Int, salt: Long = 0L): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val bucket = Sampling.hashBucket(col(keyCol), salt)
    val toks = coalesce(col(tokenCol).cast("long"), lit(0L))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__bkt"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // Duplicate-key guard, enforced ON the layout sort for free: duplicate
    // keys share a bucket and shard, so they are ADJACENT in the window
    // order — one lag() over the same (partition, sort) detects every
    // duplicate with no extra exchange. It must fail loudly: with the
    // join-back below, k copies of a key would silently become k² output
    // rows (the old windowed form returned k rows with arbitrary tie
    // order — also wrong, just quieter).
    // (`raise_error` is NullType; it must sit INSIDE a typed CASE branch —
    // wrapped in a null-test it constant-folds away, since a NullType
    // value is provably null.)
    val wRow = Window.partitionBy(col("shard")).orderBy(col("__bkt"), col(keyCol))
    val positions = df.select(col(keyCol), col(tokenCol))
      .filter(col(keyCol).isNotNull)
      .withColumn("__bkt", bucket)
      .withColumn("shard", pmod(col("__bkt"), lit(nShards.toLong)).cast("int"))
      .withColumn("__guard",
        when(lag(col(keyCol), 1).over(wRow) === col(keyCol),
          raise_error(concat(
            lit(s"packSequences: duplicate key in '$keyCol': "),
            col(keyCol).cast("string"))).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("off", coalesce(sum(toks).over(w), lit(0L)))
      .withColumn("seq_first", floor(col("off") / lit(seqLen)).cast("long"))
      .withColumn("seq_last",
        floor((col("off") + greatest(toks, lit(1L)) - lit(1L)) / lit(seqLen))
          .cast("long"))
      .select(col(keyCol).as("__key"), col("__guard"), col("shard"),
        col("off"), col("seq_first"), col("seq_last"))
    guardedJoinBack(df, positions, keyCol)
  }

  /** Join layout positions back to the payload with the duplicate-key
    * guard fused into the JOIN CONDITION — the one place column pruning
    * can never reach. Folding the guard into an output column (the first
    * implementation) left a hole: an action reading none of the layout
    * columns — `.count()` after a dup-key bug, say — pruned the guard and
    * REPORTED THE k²-INFLATED CARDINALITY silently. A join predicate must
    * be evaluated for every candidate row regardless of what the action
    * projects, so `__guard = 0` (data-dependent through the raise_error
    * branch, hence never constant-folded) forces the check on every code
    * path that touches the result.
    *
    * SHUFFLE_HASH (not the default sort-merge) so the payload side is
    * hash-exchanged but never SORTED by key — a key sort of the payload
    * would reintroduce exactly the full-text sort the narrow window
    * avoids. AQE still upgrades to broadcast when positions fit.
    */
  private def guardedJoinBack(df: DataFrame, positions: DataFrame,
      keyCol: String): DataFrame = {
    val payload = df.filter(col(keyCol).isNotNull)
    payload.join(positions.hint("SHUFFLE_HASH"),
        payload(keyCol) === positions("__key") &&
          positions("__guard") === lit(0L))
      .drop("__key", "__guard")
  }

  /** Length-bucketed batch assignment — the padding-efficiency complement
    * to [[packSequences]]: where packing CONCATENATES documents into fixed
    * sequences (pretraining), bucketed batching GROUPS whole documents of
    * similar length into batches so each batch pads only to its bucket's
    * ceiling (the standard fine-tuning / batch-inference layout; naive
    * batching pads every row to the batch max and can waste most of the
    * compute). Adds:
    *   - `shard`      — one of `nShards` independent streams (same
    *                    content-addressed bucket as [[packSequences]])
    *   - `len_bucket` — power-of-2 length class: the smallest b with
    *                    2^b ≥ tokens (0 for tokens ≤ 1)
    *   - `padded_len` — 2^len_bucket, what every row in the bucket pads to
    *   - `batch_idx`  — batch number within (shard, len_bucket); each
    *                    batch holds max(1, batchTokens / padded_len) rows,
    *                    so a batch's padded cost never exceeds
    *                    `batchTokens` (except a single oversized doc,
    *                    which gets a batch alone rather than being
    *                    silently dropped)
    *
    * The bucket exponent is integer arithmetic on BOTH engines —
    * `length(bin(tokens − 1))` (bit length), never `ceil(log2(…))`, whose
    * float result lands on either side of an integer at exact powers of
    * two depending on the engine's libm. Determinism, null-key exclusion,
    * the duplicate-key guard, and the narrow-window/join-back plan shape
    * (only (key, tokens) rides the window sort) all follow the
    * [[packSequences]] contract.
    */
  def lengthBuckets(df: DataFrame, keyCol: String, tokenCol: String,
      batchTokens: Long, nShards: Int, salt: Long = 0L): DataFrame = {
    require(batchTokens > 0, s"batchTokens must be positive, got $batchTokens")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val bucket = Sampling.hashBucket(col(keyCol), salt)
    val toks = coalesce(col(tokenCol).cast("long"), lit(0L))
    val lenBucket = when(toks <= 1, lit(0))
      .otherwise(length(bin(toks - 1))).cast("int")
    val w = Window.partitionBy(col("shard"), col("len_bucket"))
      .orderBy(col("__bkt"), col(keyCol))
    // The duplicate-key guard CANNOT ride the batch window here: that
    // window is partitioned by (shard, len_bucket), and duplicate keys
    // with different token counts land in DIFFERENT length buckets — never
    // adjacent, never caught, k² join-back fan-out with conflicting bucket
    // assignments. The guard gets its own shard-partitioned window (the
    // packSequences geometry, where same key ⇒ same bucket ⇒ same shard ⇒
    // adjacent under (__bkt, key) order). That is one extra exchange —
    // of 16-byte (key, tokens) rows only, the price of a guard that
    // actually holds.
    val wGuard = Window.partitionBy(col("shard"))
      .orderBy(col("__bkt"), col(keyCol))
    val positions = df.select(col(keyCol), col(tokenCol))
      .filter(col(keyCol).isNotNull)
      .withColumn("__bkt", bucket)
      .withColumn("shard", pmod(col("__bkt"), lit(nShards.toLong)).cast("int"))
      .withColumn("__dup_guard",
        when(lag(col(keyCol), 1).over(wGuard) === col(keyCol),
          raise_error(concat(
            lit(s"lengthBuckets: duplicate key in '$keyCol': "),
            col(keyCol).cast("string"))).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("len_bucket", lenBucket)
      // pow(2, b) is exact in a double for every feasible bucket (b ≤ 62).
      .withColumn("padded_len", pow(lit(2.0), col("len_bucket")).cast("long"))
      // Integer division on BOTH engines (SQL DIV here, // in the DuckDB
      // oracle) — Long/Long `/` evaluates in Double, which rounds for
      // quotients past 2^53 and would diverge batch ids between engines.
      .withColumn("__rows_per_batch",
        greatest(expr(s"CAST($batchTokens AS BIGINT) div padded_len"),
          lit(1L)))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("batch_idx", expr("(__rn - 1) div __rows_per_batch"))
      .select(col(keyCol).as("__key"), col("__dup_guard").as("__guard"),
        col("shard"), col("len_bucket"), col("padded_len"), col("batch_idx"))
    // Guard fused into the join condition — see guardedJoinBack for why an
    // output-column guard is prunable and this is not.
    guardedJoinBack(df, positions, keyCol)
  }
}
