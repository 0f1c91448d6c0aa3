package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.ScopedStorage.Ops

/** BM25 full-text retrieval over the corpus — the keyword-search
  * primitive a training-data pipeline uses for targeted curation (pull
  * documents matching a topic list, mine hard negatives for a retriever,
  * audit what the corpus says about a term). Okapi BM25 with the Lucene
  * idf form (ln(1 + (N - df + 0.5)/(df + 0.5)) — always positive, so a
  * term occurring in most documents still contributes rather than
  * flipping the ranking).
  *
  * Determinism contract (the same discipline as [[UnigramLm]]): each
  * (query term, document) contribution is computed from INTEGER corpus
  * statistics (tf, len, df, N, total length) in one fixed double
  * expression, quantized to micro-units (×1e6, half-up to long) at the
  * term level, and summed in exact integer arithmetic — no
  * float-accumulation order dependence between partitionings or engines.
  * Ranks tie-break on doc_id asc, so the top-k cut is total-ordered.
  *
  * Scale shape: documents tokenize scan-locally into (doc, term, tf)
  * pairs — ONE map-side-combined aggregation, the same subtree TF-IDF
  * uses. The query term list is tiny and broadcast, so the postings join
  * prunes the pair stream to matching terms before anything wide runs;
  * document-frequency statistics are computed AFTER that prune (df only
  * matters for matched terms). Corpus scalars (N, total length) ride a
  * 1-row cross join. The final top-k is a per-query window whose
  * partition is one query's candidate set — no hot-partition funnel.
  * At 100 TB the pair aggregation dominates; it shuffles (term, doc, tf)
  * triples with map-side combine and nothing carries document text. For
  * REPEATED search over one corpus version, persist `pairs` (bucketed
  * by term) and `lens` once — they ARE the inverted index + norms table
  * a search engine precomputes; the per-query work is then the pruned
  * postings join plus one 16-byte-row join against the stored lengths.
  */
object Bm25 {

  /** Top-k documents per query by BM25. `queries` has (qidCol, qtextCol);
    * both sides tokenize as lowercased whitespace tokens. Returns
    * (qidCol, doc id, score, rank) — score is micro-exact (6 dp).
    *
    * k1/b are the standard Robertson defaults. Duplicate query terms
    * score once (set semantics, the standard bag-of-words query model).
    */
  def search(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("__t"))
      .filter(col("__t") =!= "")
    // (doc, term, tf) — the one corpus-wide aggregation; shared by the
    // postings side and the per-document length statistic.
    val pairs = toks.groupBy("__id", "__t").agg(count(lit(1)).as("__tf"))
      .scopedCheckpoint(false)
    val lens = pairs.groupBy("__id").agg(sum(col("__tf")).as("__len"))
      .scopedCheckpoint(false) // reused: corpus scalars + score join
    // Corpus scalars on the metadata plane (two longs).
    val scal = lens.agg(count(lit(1)).as("__n"), sum(col("__len")).as("__tl"))
      .first()
    val n = scal.getLong(0); val totLen = scal.getLong(1)
    require(n > 0, "BM25 over an empty corpus")
    val qterms = queries
      .select(col(qidCol).as("__qid"),
        explode(split(trim(lower(col(qtextCol))), "\\s+")).as("__t"))
      .filter(col("__t") =!= "").distinct()
    // Prune postings to query terms FIRST (broadcast — the query list is
    // tiny), then df over the matched terms only. df counts from the
    // DEDUPLICATED term list (not `matched`, whose rows multiply by the
    // number of queries sharing a term); pairs is already distinct per
    // (doc, term), so a plain count over the pruned pairs IS the
    // document frequency.
    val matched = pairs.join(broadcast(qterms), Seq("__t"))
    val dfs = pairs.join(broadcast(qterms.select("__t").distinct()), Seq("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__df"))
    // One fixed double expression over integer stats, micro-quantized at
    // the term level: idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*len/avgdl))
    // with avgdl = totLen/N as an exact two-long division.
    val avgdl = lit(totLen.toDouble) / lit(n.toDouble)
    val idfE = log(lit(1.0) +
      (lit(n.toDouble) - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val tfE = (col("__tf") * lit(k1 + 1.0)) /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__len") / avgdl))
    val micro = round(idfE * tfE * 1e6, 0).cast("long")
    val scored = matched
      .join(broadcast(dfs), Seq("__t"))
      .join(lens, Seq("__id"))
      .groupBy("__qid", "__id")
      .agg(sum(micro).as("__s"))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("__s").desc, col("__id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__qid").as(qidCol), col("__id").as(idCol),
        (col("__s") / 1e6).as("score"), col("rank"))
  }
}
