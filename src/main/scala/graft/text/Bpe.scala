package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Byte-pair-encoding subword tokenization (the Sennrich et al. 2016
  * algorithm behind GPT-2/RoBERTa-class vocabularies): train a ranked
  * merge table from corpus word statistics, then tokenize any text with
  * it. This replaces the regex token-count PROXY
  * ([[TextAnalysis.bpeishTokenCount]]) with the real thing — a pipeline
  * sizing a token-budget mixture or packing sequences can count the same
  * units its training tokenizer will produce.
  *
  * Scale shape — the IVF-quantizer recipe applied to text: training needs
  * only the word-frequency table (ONE map-side-combined aggregation — the
  * corpus's only shuffle — whose result is vocabulary-sized), truncated to
  * the `maxWords` most frequent words (count desc, word asc — a bounded
  * deterministic TakeOrdered, NOT corpus-sized) and run through the merge
  * loop on the driver in milliseconds. Application is one scan-local
  * codegen'd kernel per row with the merge table baked into the plan as a
  * broadcast constant ([[graft.functions.BpeTokens]]). Word-frequency
  * truncation is the standard practical dodge (tail hapaxes contribute
  * almost nothing to pair statistics); determinism end-to-end: max-count
  * pair ties break to the lexicographically smallest (left, right).
  */
object Bpe {

  /** A trained model: merge pairs in rank order plus the base symbol set
    * (the training corpus's characters and the `</w>` marker, sorted).
    */
  final case class BpeModel(merges: Array[(String, String)],
      baseSymbols: Array[String]) {
    /** "left right" keys in rank order — the plan-constant form. */
    def mergeKeys: Array[String] = merges.map { case (a, b) => s"$a $b" }

    /** Deterministic id table: base symbols in sorted order, then one
      * merged symbol per merge rank. Id `vocabulary.length` is reserved
      * for UNK (symbols from characters unseen at training time).
      */
    def vocabulary: Array[String] =
      baseSymbols ++ merges.map { case (a, b) => a + b }
  }

  /** Learn `numMerges` merges from the corpus's word-frequency table
    * (lowercased whitespace words, bounded to the `maxWords` most
    * frequent).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 10000): BpeModel = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    val wordFreqs: Array[(String, Long)] = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    val baseSymbols =
      (wordFreqs.iterator.flatMap(_._1.map(String.valueOf(_))).toSet + "</w>")
        .toArray.sorted
    var vocab: Array[(Array[String], Long)] = wordFreqs.map { case (w, c) =>
      ((w.map(String.valueOf(_)) :+ "</w>").toArray, c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val pairCounts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 &&
                syms(i + 1) == best._2) {
              out += best._1 + best._2; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, c)
        }
      }
    }
    BpeModel(merges.toArray, baseSymbols)
  }

  /** Tokenize with a trained model: array of subword tokens (word-final
    * tokens carry the `</w>` marker). Scan-local codegen'd kernel.
    */
  def tokens(model: BpeModel, text: Column): Column =
    GraftFunctions.bpeTokens(text, model.mergeKeys)

  /** Trained-tokenizer token count — the unit a token-budget mixture or
    * sequence-packing layout should be sized in.
    */
  def tokenCount(model: BpeModel, text: Column): Column =
    size(tokens(model, text))

  /** Tokenize to VOCABULARY IDS ([[BpeModel.vocabulary]] order; unseen
    * symbols take the reserved UNK id = vocabulary.length) — the
    * training-consumable integer form a packed corpus actually stores.
    */
  def tokenIds(model: BpeModel, text: Column): Column =
    GraftFunctions.bpeTokenIds(text, model.mergeKeys, model.vocabulary)

  /** Persist a trained model as one catalog table of
    * (kind, rank, left, right): base symbols under kind='base' (rank =
    * sorted position, right null) and merges under kind='merge' — the
    * train-once / tokenize-for-months contract (a tokenizer that drifts
    * between corpus versions silently re-tokenizes the world; the saved
    * table IS the version).
    */
  def saveBpe(spark: org.apache.spark.sql.SparkSession, model: BpeModel,
      table: String): Unit = {
    import spark.implicits._
    val base = model.baseSymbols.zipWithIndex.map { case (s, i) =>
      ("base", i, s, Option.empty[String]) }
    val merges = model.merges.zipWithIndex.map { case ((a, b), i) =>
      ("merge", i, a, Option(b)) }
    (base ++ merges).toSeq.toDF("kind", "rank", "left", "right")
      .write.mode("overwrite").saveAsTable(table)
  }

  /** Reload a model persisted by [[saveBpe]] (rank order restored). */
  def loadBpe(spark: org.apache.spark.sql.SparkSession,
      table: String): BpeModel = {
    val rows = spark.table(table)
      .select(col("kind"), col("rank"), col("left"), col("right"))
      .collect()
    val base = rows.filter(_.getString(0) == "base")
      .sortBy(_.getInt(1)).map(_.getString(2))
    val merges = rows.filter(_.getString(0) == "merge")
      .sortBy(_.getInt(1)).map(r => (r.getString(2), r.getString(3)))
    BpeModel(merges, base)
  }
}
