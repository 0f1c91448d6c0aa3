package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.ScopedStorage.Ops
import graft.operators.Sampling

/** Data Selection via Importance Resampling (Xie et al. 2023, NeurIPS —
  * "DSIR"): select raw-corpus documents whose n-gram feature distribution
  * looks like a small TARGET corpus, by (1) fitting bag-of-words
  * distributions to target and raw, (2) scoring every raw document with
  * its log importance weight log p_target(doc) − log p_raw(doc), and
  * (3) Gumbel-top-k resampling — add independent Gumbel noise to each
  * log-weight and take the k largest, which draws WITHOUT replacement
  * from the softmax of the weights (the paper's sampling trick). The
  * published method hashes n-grams into buckets; over a SQL-replayable
  * vocabulary the bucket is the term itself — the estimator is identical
  * with a collision-free feature map.
  *
  * Determinism (the [[UnigramLm]] discipline end-to-end): both
  * distributions are Laplace-smoothed exact integer counts; per-term
  * log-ratios quantize to micro-nats at model build; a document's weight
  * is an exact integer sum. The Gumbel draw is content-addressed — the
  * uniform comes from the same md5 bucket primitive every sampler here
  * uses ([[Sampling.hashBucket]]), so u = (bucket + 0.5) / 2^32 is a
  * pure function of (doc id, salt), and the noise −ln(−ln u) is itself
  * micro-quantized before the integer add. Same rows on every run,
  * every partitioning, every engine; ties break on doc id.
  *
  * Scale shape: two vocabulary-sized aggregations (target is small by
  * premise; raw is one map-side-combined (term, count) pass), a
  * broadcast model of micro-nat log-ratios over the vocab cut, then a
  * scan-side broadcast join + per-doc integer sum, and a single
  * TakeOrdered(k) for the resample — no full sort, no text in any
  * exchange.
  */
object Dsir {

  /** Per-document log importance weights of `raw` against `target`.
    * Returns (idCol, n_tokens, log_weight) — log_weight is micro-exact,
    * Σ count·(log p_t(term) − log p_r(term)) over the vocab terms; OOV
    * tokens contribute zero (outside the feature map, the hashed-feature
    * analog of colliding into an untracked bucket).
    *
    * Vocabulary = top `vocabSize` terms of the TARGET (count desc, term
    * asc): DSIR's features must be informative about the target — raw-
    * corpus-dominant vocab would spend the budget on terms whose target
    * probability is all smoothing floor.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, vocabSize: Int = 10000): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    def toks(df: DataFrame, keep: Column*): DataFrame =
      df.filter(col(textCol).isNotNull)
        .select(keep :+
          explode(split(trim(lower(col(textCol))), "\\s+")).as("__t"): _*)
        .filter(col("__t") =!= "")
    val tCnt = toks(target).groupBy("__t").agg(count(lit(1)).as("__tc"))
      .scopedCheckpoint(false) // vocab cut + totals + model join
    val vocab = tCnt.orderBy(col("__tc").desc, col("__t")).limit(vocabSize)
      .select("__t").scopedCheckpoint(false)
    val vocabN = vocab.count()
    require(vocabN > 0, "DSIR target corpus has no tokens")
    val rCnt = toks(raw).groupBy("__t").agg(count(lit(1)).as("__rc"))
    // Totals restricted to the vocab (the feature map's event space —
    // probabilities must normalize over the same support on both sides).
    val tTot = vocab.join(tCnt, Seq("__t"))
      .agg(coalesce(sum(col("__tc")), lit(0L))).first().getLong(0)
    val rTot = vocab.join(rCnt, Seq("__t"), "left")
      .agg(coalesce(sum(col("__rc")), lit(0L))).first().getLong(0)
    val microOf = (p: Column) => round(log(p) * 1e6, 0).cast("long")
    // log ratio per vocab term, both sides Laplace-smoothed over vocabN.
    val model = vocab
      .join(tCnt, Seq("__t"), "left")
      .join(rCnt, Seq("__t"), "left")
      .select(col("__t"),
        (microOf((coalesce(col("__tc"), lit(0L)) + 1).cast("double") /
            lit((tTot + vocabN).toDouble)) -
          microOf((coalesce(col("__rc"), lit(0L)) + 1).cast("double") /
            lit((rTot + vocabN).toDouble))).as("__lr"))
    // One tokenization of raw serves both the per-doc token count and the
    // model join; left-join the weights back so documents with zero vocab
    // matches keep a row (weight 0 — indistinguishable from raw, which is
    // exactly what "no informative features" means).
    val docTok = toks(raw, col(idCol).as("__id")).scopedCheckpoint(false)
    docTok.groupBy("__id").agg(count(lit(1)).as("n_tokens"))
      .join(
        docTok.join(broadcast(model), Seq("__t"))
          .groupBy("__id").agg(sum(col("__lr")).as("__w")),
        Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_tokens"),
        (coalesce(col("__w"), lit(0L)) / 1e6).as("log_weight"))
  }

  /** Gumbel-top-k resample of `raw` by importance weight: keep the k
    * documents maximizing microWeight + microGumbel(id, salt). Returns
    * (idCol, n_tokens, log_weight, noised) sorted by noised desc — the
    * selected training subset plus the audit columns.
    */
  def resample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, salt: Long, vocabSize: Int = 10000): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val weighted = importanceWeights(raw, target, idCol, textCol, vocabSize)
    val u = (Sampling.hashBucket(col(idCol), salt).cast("double") + 0.5) /
      lit(4294967296.0)
    val gumbelMicro = round(-log(-log(u)) * 1e6, 0).cast("long")
    // Recover the exact micro long via round (a bare cast would TRUNCATE
    // the one-ulp-low double some micro values round-trip to).
    val noisedMicro =
      round(col("log_weight") * 1e6, 0).cast("long") + gumbelMicro
    weighted.withColumn("noised", noisedMicro / 1e6)
      .orderBy(round(col("noised") * 1e6, 0).cast("long").desc, col(idCol).asc)
      .limit(k)
  }
}
