package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.ScopedStorage.Ops

/** Unigram language-model fluency scoring — the scalable stand-in for the
  * CCNet / Gopher perplexity filter (they score documents with a KenLM
  * n-gram model trained on a clean corpus; the operator SHAPE — train a
  * model from token statistics, score every document by mean token
  * log-probability, threshold the tails — is identical at order 1, and
  * order 1 is what a SQL-replayable oracle can verify term-for-term).
  * Low-probability tails are gibberish/noise; suspiciously high means
  * boilerplate repetition of frequent tokens.
  *
  * Scale shape: one map-side-combined (term, count) aggregation (the only
  * corpus-wide shuffle — vocabulary-sized output), a bounded TakeOrdered
  * for the top-`vocabSize` model table (broadcast to the scorers), and a
  * scan-side broadcast join + one aggregation by doc for the scores. Per-
  * term log-probabilities are quantized to micro-nats (×1e6, rounded to
  * long) BEFORE the per-document sum, so the sum is exact integer
  * arithmetic — no float-accumulation order dependence between runs,
  * partitionings, or engines; the division back to a mean happens once per
  * doc on exact operands.
  */
object UnigramLm {

  /** Score each document by mean token log-probability under the corpus's
    * own unigram distribution. Returns (idCol, n_tokens, avg_logprob).
    *
    * Tokens are lowercased whitespace tokens. The model keeps the
    * `vocabSize` most frequent terms (count desc, term asc — total order);
    * out-of-vocabulary tokens score `log(oovDiscount / N)` (a sub-single-
    * count probability, N = total corpus tokens) — the floor that makes
    * rare-garbage documents sink instead of erroring.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 50000, oovDiscount: Double = 0.5): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(oovDiscount > 0.0 && oovDiscount <= 1.0,
      s"oovDiscount must be in (0, 1], got $oovDiscount")
    // Blank/whitespace-only docs are omitted like NULL-text docs: split of
    // blank text yields the single token "" — which would enter the model
    // as a high-count 'term', inflate N, and score blank docs as fluent.
    // (Split of trimmed NON-blank text never yields an empty token.)
    val toks = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).as("__id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("__t"))
    val cnt = toks.groupBy("__t").agg(count(lit(1)).as("__c"))
      .scopedCheckpoint(false) // shared by the total and the vocab cut
    // Metadata-plane scalar (one row), like the mixture thresholds. An
    // empty corpus sums to NULL → treat as 1 so the floor arithmetic
    // stays finite (the output is empty regardless — no tokens to score).
    val total = Option(cnt.agg(sum(col("__c"))).first().get(0))
      .map(_.asInstanceOf[Long]).filter(_ > 0L).getOrElse(1L)
    val microLp = (p: org.apache.spark.sql.Column) =>
      round(log(p) * 1e6, 0).cast("long")
    val vocab = cnt.orderBy(col("__c").desc, col("__t")).limit(vocabSize)
      .select(col("__t"), microLp(col("__c") / lit(total.toDouble)).as("__lp"))
    val oovLp = new java.math.BigDecimal(math.log(oovDiscount / total) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    toks.join(broadcast(vocab), Seq("__t"), "left")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__lp"), lit(oovLp))).as("__sum"))
      .select(col("__id").as(idCol), col("n_tokens"),
        microMean(col("__sum"), col("n_tokens")).as("avg_logprob"))
  }

  /** The per-doc mean, rounded half-away-from-zero to whole micro-nats in
    * EXACT integer arithmetic and only then divided by 1e6. Rounding the
    * RATIONAL sum/n (not the double quotient) is what keeps engines
    * bit-identical: sum/n lands EXACTLY on a micro-nat half whenever
    * n | 2·sum oddly — common, not a corner — and decimal-rounding the
    * nearest DOUBLE to such a half goes whichever way that engine's
    * round() leans (Spark's shortest-string BigDecimal rounds the half
    * up; DuckDB rounds the binary value, which sits below it). The
    * floor-form ⌊(2·|sum| + n) / 2n⌋ is exact while 2·|sum|+n < 2⁵³
    * (≈ 4·10¹⁵ micro-nats — a ~10-billion-token document).
    */
  private def microMean(sum: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    signum(sum) *
      floor((abs(sum) * 2 + n) / (n.cast("double") * 2)) / 1e6

  /** Order-2 scoring with stupid backoff (Brants et al. 2007 — the
    * unnormalized backoff used at web scale BECAUSE it needs only raw
    * counts): the first token scores unigram; every later token scores
    * `log(c(ab)/c(a))` when the bigram is in the model, else
    * `log(backoff) + unigram(b)`. Both model tables are bounded top-cuts
    * (count desc, lexicographic tie-break) broadcast to the scorers;
    * conditional log-probs quantize to micro-nats at model build, and the
    * backoff constant is itself a quantized micro-nat added in integer
    * arithmetic — the whole per-doc sum stays exact, like [[scoreDocs]].
    *
    * Scale shape: one extra corpus aggregation keyed by the bigram pair
    * (map-side combined; pair strings must ride this model-build exchange
    * — they ARE the model) plus the same broadcast-join scoring; pair
    * construction is scan-local from each doc's own token array (no
    * window, no self-join).
    */
  def scoreDocsBigram(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 50000, bigramSize: Int = 100000,
      backoff: Double = 0.4, oovDiscount: Double = 0.5): DataFrame = {
    require(vocabSize > 0 && bigramSize > 0, "vocab sizes must be positive")
    require(backoff > 0.0 && backoff <= 1.0,
      s"backoff must be in (0, 1], got $backoff")
    require(oovDiscount > 0.0 && oovDiscount <= 1.0,
      s"oovDiscount must be in (0, 1], got $oovDiscount")
    val ts = split(trim(lower(col(textCol))), "\\s+")
    // NULL-text and blank docs are omitted, matching scoreDocs; without
    // the filter they would score one phantom ""-token.
    val base = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).as("__id"), ts.as("__ts"))
      .scopedCheckpoint(false) // consumed by unigrams, pairs, and firsts
    val toks = base.select(col("__id"), explode(col("__ts")).as("__t"))
    val cnt = toks.groupBy("__t").agg(count(lit(1)).as("__c"))
      .scopedCheckpoint(false) // total + unigram vocab + bigram contexts
    // NULL-sum-on-empty guard — see scoreDocs.
    val total = Option(cnt.agg(sum(col("__c"))).first().get(0))
      .map(_.asInstanceOf[Long]).filter(_ > 0L).getOrElse(1L)
    val microLp = (p: org.apache.spark.sql.Column) =>
      round(log(p) * 1e6, 0).cast("long")
    val uniVocab = cnt.orderBy(col("__c").desc, col("__t")).limit(vocabSize)
      .select(col("__t"), microLp(col("__c") / lit(total.toDouble)).as("__ulp"))
    def quantize(x: Double): Long =
      new java.math.BigDecimal(x * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val oovLp = quantize(math.log(oovDiscount / total))
    val backoffLp = quantize(math.log(backoff))

    // Pair stream: scan-local from each doc's own token array (guard the
    // 1-token case — Spark's sequence(2, 1) would count DOWN).
    val pairArr = when(size(col("__ts")) >= 2,
      transform(sequence(lit(2), size(col("__ts"))), i =>
        struct(element_at(col("__ts"), i - 1).as("a"),
          element_at(col("__ts"), i).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))
    val pairs = base.select(col("__id"), explode(pairArr).as("__p"))
      .select(col("__id"), col("__p.a").as("__a"), col("__p.b").as("__b"))
    // Bigram model: top pairs by count; conditional on the FULL context
    // count (not the truncated vocab), quantized at build.
    val biVocab = pairs.groupBy("__a", "__b").agg(count(lit(1)).as("__cab"))
      .orderBy(col("__cab").desc, col("__a"), col("__b")).limit(bigramSize)
      .join(cnt.select(col("__t").as("__a"), col("__c").as("__ca")), "__a")
      .select(col("__a"), col("__b"),
        microLp(col("__cab") / col("__ca").cast("double")).as("__blp"))

    val firstScores = base
      .select(col("__id"), element_at(col("__ts"), 1).as("__t"))
      .join(broadcast(uniVocab), Seq("__t"), "left")
      .select(col("__id"), coalesce(col("__ulp"), lit(oovLp)).as("__lp"))
    val pairScores = pairs
      .join(broadcast(biVocab), Seq("__a", "__b"), "left")
      .join(broadcast(uniVocab.withColumnRenamed("__t", "__b")),
        Seq("__b"), "left")
      .select(col("__id"),
        coalesce(col("__blp"),
          lit(backoffLp) + coalesce(col("__ulp"), lit(oovLp))).as("__lp"))
    firstScores.unionByName(pairScores)
      .groupBy("__id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("__lp")).as("__sum"))
      .select(col("__id").as(idCol), col("n_tokens"),
        microMean(col("__sum"), col("n_tokens")).as("avg_logprob"))
  }
}
