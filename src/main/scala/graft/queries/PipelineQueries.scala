package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.dedup.Dedup
import graft.functions.GraftFunctions
import graft.multimodal.Multimodal
import graft.similarity.Knn
import graft.text.TextAnalysis

/** Driver-gate queries for the training-data pipeline operators (dedup,
  * similarity search, text analysis, multimodal) over the `documents` and
  * `embeddings` tables. SQL-expressible scorers carry DuckDB oracles; the
  * sketch/LSH operators are deterministic but not SQL-expressible, so they
  * get the driver's rows-only check plus ScalaTest assertions.
  */
object PipelineQueries {

  /** The test corpus has few natural near-dups, so near-dup queries plant
    * deterministic ones: exact copies of docs 0-24 (ids +1,000,000) and
    * two-token-appended copies of docs 25-49 (ids +2,000,000).
    */
  private def plantedDocs(docs: DataFrame): DataFrame = {
    val copies = docs.filter(col("doc_id") < 25)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val perturbed = docs.filter(col("doc_id") >= 25 && col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 2000000L)
      .withColumn("text", concat(col("text"), lit(" zq zq")))
    docs.unionByName(copies).unionByName(perturbed)
  }

  // ---------------------------------------------------------------- text
  def txtTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  private val txtTokensSql =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INT) AS n_bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  def txtQuality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  private val txtQualitySql =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens,
      |  (least(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) / 100.0, 1.0) * 0.5
      |   + (CASE WHEN (CAST(length(text) AS DOUBLE)
      |                 - (CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) - 1))
      |                / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)
      |              BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3
      |   + (1.0 - least(CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
      |                  / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.2) AS quality
      |FROM documents ORDER BY doc_id""".stripMargin

  def txtLangId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("lang_guess"),
        TextAnalysis.langHits(col("text"), "en").as("en_hits"),
        TextAnalysis.langHits(col("text"), "de").as("de_hits"))
      .orderBy(col("doc_id"))

  private def hitsSql(words: Seq[String]): String =
    s"CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), " +
      s"x -> x IN (${words.map(w => s"'$w'").mkString(", ")}))) AS INT)"

  private val txtLangIdSql = {
    val profiles = TextAnalysis.stopwordProfiles
    val Seq(de, en, es, fr) = Seq("de", "en", "es", "fr").map(l => hitsSql(profiles(l)))
    s"""SELECT doc_id, lang,
       |  CASE WHEN $de >= $en AND $de >= $es AND $de >= $fr THEN 'de'
       |       WHEN $en >= $es AND $en >= $fr THEN 'en'
       |       WHEN $es >= $fr THEN 'es'
       |       ELSE 'fr' END AS lang_guess,
       |  $en AS en_hits, $de AS de_hits
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Rolling-hash fingerprint (custom codegen'd expression) — rows-only. */
  def txtFingerprint(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- dedup
  def ddExact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val kept = Dedup.exact(docs, Seq("text"), Seq(col("doc_id")))
    docs.agg(count(lit(1)).as("n_total"))
      .crossJoin(kept.agg(count(lit(1)).as("n_kept")))
  }

  private val ddExactSql =
    "SELECT COUNT(*) AS n_total, COUNT(DISTINCT text) AS n_kept FROM documents"

  def ddMinhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = plantedDocs(Tables.documents(spark, dir))
    Dedup.minhashNearDupPairs(docs, "doc_id", "text")
      .orderBy(col("id_a"), col("id_b"))
  }

  def ddSimhash(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val docs = plantedDocs(Tables.documents(spark, dir))
    Dedup.simhashNearDupPairs(docs, "doc_id", "text")
      .orderBy(col("id_a"), col("id_b"))
  }

  def ddNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = plantedDocs(Tables.documents(spark, dir))
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .orderBy(col("id_a"), col("id_b"))
  }

  def ddEmbedding(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val vecs = Tables.embeddings(spark, dir)
    val planted = vecs.unionByName(
      vecs.filter(col("vec_id") < 25).withColumn("vec_id", col("vec_id") + 1000000L))
    Dedup.embeddingNearDupPairs(planted, "vec_id", "embedding", threshold = 0.98)
      .orderBy(col("id_a"), col("id_b"))
  }

  // ---------------------------------------------------------------- knn
  def simKnnBrute(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val vecs = Tables.embeddings(spark, dir)
    Knn.bruteForceTopK(vecs.filter(col("vec_id") < 5), vecs, "vec_id", "embedding", 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH ANN in its sweet spot — near-duplicate retrieval: the queries are
    * copies of corpus vectors (ids +5,000,000), and the LSH index must pull
    * the original back as the top hit without scanning the corpus.
    */
  def simKnnLsh(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val vecs = Tables.embeddings(spark, dir)
    val probes = vecs.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 5000000L)
    Knn.lshTopK(probes, vecs, "vec_id", "embedding", 3)
      .orderBy(col("query_id"), col("rank"))
  }

  // ---------------------------------------------------------------- multimodal
  def mmFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.packDocuments(Tables.documents(spark, dir))
    val features = Multimodal.decodeStub(spark, media)
    val frames = Multimodal.frameSample(media, n = 4)
      .groupBy(col("media_id")).agg(count(lit(1)).as("n_frames"))
    features.join(frames, "media_id")
      .select(col("media_id"), col("n_bytes"), col("n_frames").cast("int").as("n_frames"))
      .orderBy(col("media_id"))
  }

  private val mmFeaturesSql =
    """SELECT doc_id AS media_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  4 AS n_frames
      |FROM documents ORDER BY media_id""".stripMargin

  // ----------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_tokens" -> (txtTokens _),
    "txt_quality" -> (txtQuality _),
    "txt_langid" -> (txtLangId _),
    "txt_fingerprint" -> (txtFingerprint _),
    "dd_exact" -> (ddExact _),
    "dd_minhash" -> (ddMinhash _),
    "dd_simhash" -> (ddSimhash _),
    "dd_ngram_jaccard" -> (ddNgramJaccard _),
    "dd_embedding" -> (ddEmbedding _),
    "sim_knn_brute" -> (simKnnBrute _),
    "sim_knn_lsh" -> (simKnnLsh _),
    "mm_features" -> (mmFeatures _))

  val oracles: Map[String, String] = Map(
    "txt_tokens" -> txtTokensSql,
    "txt_quality" -> txtQualitySql,
    "txt_langid" -> txtLangIdSql,
    "dd_exact" -> ddExactSql,
    "mm_features" -> mmFeaturesSql)
}
