package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    val toks = docs.select(col(idCol).as("__id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("__t"))
    val cnt = toks.groupBy("__t").agg(count(lit(1)).as("__c"))
      .localCheckpoint(false) // shared by the total and the vocab cut
    // Metadata-plane scalar (one row), like the mixture thresholds.
    val total = cnt.agg(sum(col("__c"))).first().getLong(0)
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
        round(col("__sum").cast("double") / col("n_tokens") / 1e6, 6)
          .as("avg_logprob"))
  }
}
