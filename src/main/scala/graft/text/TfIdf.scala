package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.ScopedStorage.Ops

/** Corpus TF-IDF: smoothed inverse document frequency over the whole
  * corpus and per-document top-k salient terms — the keyword-extraction /
  * topical-filter primitive of a training-data pipeline (route documents
  * by their most characteristic terms, build per-domain mixtures, spot
  * boilerplate whose "salient" terms are navigation chrome).
  *
  * Scale shape: ONE distinct (doc, term, count) aggregation (shuffled by
  * doc then by term — both map-side combined) feeds both statistics: term
  * frequencies directly, document frequencies by re-aggregating the same
  * distinct pairs by term. IDF is ln((N+1)/(df+1)) + 1 (sklearn's
  * smoothing — never zero, never divides by zero); the corpus size N is a
  * 1-row broadcast. The score join shuffles by term, where AQE broadcasts
  * the vocabulary side when it fits. Top-k is a per-document window —
  * partition cardinality is a single document's distinct terms, so there
  * is no hot-partition funnel to salt.
  */
object TfIdf {

  /** (term, df, idf) over the corpus — df = documents containing the term. */
  def idf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    idfFromPairs(docTermCounts(docs, idCol, textCol), docs)

  private def idfFromPairs(pairs: DataFrame, docs: DataFrame): DataFrame =
    pairs.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(docs.agg(count(lit(1)).as("__n")))
      .select(col("term"), col("df"),
        (log((col("__n") + 1).cast("double") / (col("df") + 1)) + 1).as("idf"))

  /** Per-document top-k terms by tf·idf (raw in-document term count ×
    * smoothed idf), rank 1 = most salient; ties break lexicographically on
    * the term so the result is total-ordered and replayable.
    *
    * The distinct (doc, term, count) aggregation — the expensive subtree —
    * is consumed by BOTH the tf side and the df re-aggregation; Catalyst
    * plans being trees, it is lazily localCheckpoint()ed so one
    * materialization serves both (same idiom as the dedup collapse).
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val pairs = docTermCounts(docs, idCol, textCol).scopedCheckpoint(false)
    val scored = pairs
      .join(idfFromPairs(pairs, docs).select("term", "idf"), "term")
      .select(col("id"), col("term"), (col("tf") * col("idf")).as("score"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id").as(idCol), col("term"), col("score"), col("rank"))
  }

  /** Distinct (id, term, tf) rows — tf is the raw in-document count.
    * Blank/whitespace-only docs are omitted like NULL-text docs: split of
    * blank text yields the single token "", which would pollute df and
    * surface as those docs' rank-1 'salient' term. */
  private def docTermCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).as("id"),
        explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
}
