package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Two-pass distributed heavy hitters over the token stream — the
  * "frequent n-grams / vocabulary head without a full token shuffle"
  * primitive (boilerplate detection, stopword discovery, vocab cuts all
  * start here). A naive top-k is `explode → groupBy(token) → top-k`:
  * at 100 TB the exchange carries every token occurrence. This operator
  * bounds that:
  *
  *   Pass 1 — Misra–Gries per PARTITION (`mapPartitions`, bounded
  *   `capacity` counters regardless of partition size): any token whose
  *   true partition frequency exceeds n_p/(capacity+1) survives as a
  *   candidate; the union of per-partition survivors (≤ capacity ×
  *   partitions rows, tokens only) is the complete candidate set for any
  *   global frequency above n/(capacity+1) — a standard MG merge bound.
  *
  *   Pass 2 — EXACT recount of candidates only: the token stream filters
  *   against the broadcast candidate set before anything exchanges, so
  *   the groupBy aggregates ≤ capacity × partitions distinct keys while
  *   every non-candidate token dies scan-local. The output is therefore
  *   the TRUE top-k by exact count (ties broken token-asc) whenever the
  *   k-th true frequency clears the MG retention bound — which the caller
  *   guarantees by sizing `capacity` ≥ vocabulary-head size (the gate
  *   sizes it above the corpus vocabulary, making retention total).
  *
  * Exactness of the final counts is what makes the operator
  * oracle-checkable: the sketch only SELECTS, it never reports its own
  * (lower-bound) counters.
  */
object HeavyHitters {

  /** Per-partition Misra–Gries summary: returns the surviving keys. */
  private[graft] def misraGries(tokens: Iterator[String],
      capacity: Int): Iterator[String] = {
    val counters = mutable.HashMap.empty[String, Long]
    tokens.foreach { t =>
      counters.get(t) match {
        case Some(c) => counters.update(t, c + 1)
        case None =>
          if (counters.size < capacity) counters.update(t, 1L)
          else {
            // Decrement-all step; drop zeros. Amortized O(1) per token:
            // each decrement sweep pays for the capacity insertions that
            // preceded it.
            val dead = mutable.ArrayBuffer.empty[String]
            counters.mapValuesInPlace((_, c) => c - 1)
            counters.foreach { case (k, c) => if (c == 0) dead += k }
            dead.foreach(counters.remove)
          }
      }
    }
    counters.keysIterator
  }

  /** Pass 1 alone: the distinct per-partition MG survivors — a bounded
    * (token)-frame. Exposed because the candidate pass COMPOSES: a
    * rolling/streaming ingestion can union each batch's candidates into a
    * persisted set (pigeonhole: a token globally above n/(capacity+1)
    * must be above the same ratio in at least one batch, so the union
    * retains every global heavy hitter) and pay the exact recount once at
    * read time — the same accumulate-then-settle shape as the dedup
    * ledger.
    */
  def candidates(docs: DataFrame, textCol: String,
      capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1: $capacity")
    candidatesFromTokens(docs
      .select(TextAnalysis.tokens(col(textCol)).as("__toks"))
      .filter(col("__toks").isNotNull), capacity)
  }

  /** Exact recount of `cands` tokens only, true top-k among them. The
    * caller-supplied candidate frame is normalized here (single column
    * named `token`, distinct); the internal paths pass
    * [[candidatesFromTokens]] output, which is already in that form.
    */
  def recount(docs: DataFrame, textCol: String, cands: DataFrame,
      k: Int): DataFrame =
    recountFromTokens(docs
      .select(TextAnalysis.tokens(col(textCol)).as("__toks")),
      cands.select(col(cands.columns.head).as("token")).distinct(), k)

  /** Both passes over a pre-built `__toks` array frame — the single
    * definition all four entry points share (a fix to the empty-token
    * filter or the tie-break must land exactly once).
    */
  private def candidatesFromTokens(tokenized: DataFrame,
      capacity: Int): DataFrame =
    tokenized
      .mapPartitions { rows =>
        misraGries(
          rows.flatMap(_.getSeq[String](0).iterator.filter(_.nonEmpty)),
          capacity)
      }(org.apache.spark.sql.Encoders.STRING)
      .toDF("token").distinct()

  /** `cands` contract: one `token` column, already distinct (the
    * [[candidatesFromTokens]] output shape) — no re-normalization here,
    * so the internal paths don't plan a redundant dedup exchange.
    */
  private def recountFromTokens(tokenized: DataFrame, cands: DataFrame,
      k: Int): DataFrame =
    tokenized
      .select(explode(col("__toks")).as("token"))
      .filter(col("token") =!= "")
      .join(broadcast(cands), Seq("token"), "left_semi")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** (token, n) for the exact top `k` whitespace tokens of `textCol`,
    * ordered (n desc, token asc). `capacity` is the per-partition counter
    * budget — size it comfortably above the expected head (k ≪ capacity);
    * the MG bound only guarantees candidates with global frequency
    * > n/(capacity+1), and a too-small capacity silently degrades top-k
    * completeness (the classic sketch trade-off, made explicit here).
    */
  def topTokens(docs: DataFrame, textCol: String, k: Int,
      capacity: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(capacity >= k, s"capacity $capacity must be >= k $k")
    // The candidate and recount passes both start from the tokenized
    // corpus — share ONE tokenization via a scoped persist (spills,
    // freed at the harness boundary) instead of tokenizing twice. The
    // two passes over the tokens themselves are inherent to exactness;
    // at full corpus scale where persisting a token-array copy is worse
    // than re-tokenizing, call candidates()/recount() directly — they
    // keep the recompute-each-pass shape.
    val tokenized = graft.core.ScopedStorage.persist(docs
      .select(TextAnalysis.tokens(col(textCol)).as("__toks"))
      .filter(col("__toks").isNotNull))
    recountFromTokens(tokenized,
      candidatesFromTokens(tokenized, capacity), k)
  }

  /** Exact top-k word n-grams via the same two-pass sketch — the
    * boilerplate-phrase miner ("click here to", cookie banners, footer
    * text): phrase frequency is what the span-dedup and C4 policies act
    * on, and at corpus scale the n-gram stream is n× the token stream,
    * which makes the bounded-candidate pass MORE valuable, not less.
    * Same retention bound, over the n-gram vocabulary.
    */
  def topGrams(docs: DataFrame, textCol: String, n: Int, k: Int,
      capacity: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(k >= 1, s"k must be >= 1: $k")
    require(capacity >= k, s"capacity $capacity must be >= k $k")
    // grams[i] = toks[i..i+n-1] space-joined — scan-local higher-order
    // array functions, no explode until after the candidate filter. The
    // short-doc case needs the explicit empty branch: sequence(1, 0)
    // generates a DESCENDING [1, 0], not an empty range.
    // Shared gram-array frame for both passes (same trade-off note as
    // [[topTokens]]): one tokenize+gram computation, scoped-persisted.
    val tokenized = graft.core.ScopedStorage.persist(docs
      .withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .select(expr(
        s"CASE WHEN size(__toks) >= $n THEN " +
          s"transform(sequence(1, size(__toks) - ${n - 1}), " +
          s"i -> array_join(slice(__toks, i, $n), ' ')) " +
          "ELSE CAST(array() AS array<string>) END").as("__toks"))
      .filter(col("__toks").isNotNull))
    recountFromTokens(tokenized,
      candidatesFromTokens(tokenized, capacity), k)
      .select(col("token").as("gram"), col("n"))
  }
}
