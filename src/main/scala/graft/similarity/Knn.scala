package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths (SURVEY north-star / BASELINE.json):
  *   - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set
  *     against the corpus, codegen'd cosine per pair, per-query top-k. Scales
  *     linearly in corpus size with NO shuffle of the corpus: the only
  *     shuffle is the final per-query top-k over queries × corpus rows.
  *   - [[lshTopK]]: the scale path — sign-random-projection buckets shrink
  *     the candidate set to vectors sharing ≥1 of 4 16-bit LSH bands with
  *     the query (same index family as an IVF coarse quantizer; recall
  *     grows with band count).
  */
object Knn {

  /** Exact top-k cosine neighbors per query vector.
    * Queries must be small enough to broadcast (the usual case);
    * self-matches (same id) are excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", GraftFunctions.cosineSim(col("q_vec"), col("c_vec")))
    topK(scored, k)
  }

  /** LSH-bucketed ANN: candidates share ≥1 signature band with the query;
    * exact cosine re-ranks. Returns up to k neighbors per query (fewer when
    * buckets are sparse).
    *
    * Recall physics: a band of `bandBits` bits matches with probability
    * (1 - θ/π)^bandBits, so narrow bands (16 bits) only retrieve HIGH-cosine
    * neighbors — near-duplicate retrieval. For weak-similarity k-NN use
    * wider recall (fewer bits per band) or [[bruteForceTopK]]; bucket sizes
    * grow accordingly — that IS the accuracy/cost dial.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      bands: Int = 4, bandBits: Int = 16): DataFrame = {
    require(bands * bandBits <= 64, "bands * bandBits must fit the 64-bit signature")
    val mask = (1L << bandBits) - 1
    def banded(df: DataFrame, role: String) = {
      val sig = GraftFunctions.signProjection(col(vecCol))
      val chunks = (0 until bands).map(j =>
        shiftright(sig, bandBits * j).bitwiseAND(lit(mask)))
      df.select(col(idCol).as(s"${role}_id"),
        posexplode(array(chunks: _*)).as(Seq("band_idx", "band_hash")))
    }
    // Candidate generation carries ids only: the distinct dedups (query_id,
    // neighbor_id) without shuffling any vector through the exchange; the
    // vectors are joined back afterwards (same pattern as
    // Dedup.embeddingNearDupPairs).
    val q = broadcast(banded(queries, "query"))
    val c = banded(corpus, "neighbor")
    val candidates = c.join(q, Seq("band_idx", "band_hash"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val qv = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec")))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"))
    val scored = candidates
      .join(cv, "neighbor_id")
      .join(qv, "query_id")
      .withColumn("cosine", GraftFunctions.cosineSim(col("query_vec"), col("neighbor_vec")))
    topK(scored, k)
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
