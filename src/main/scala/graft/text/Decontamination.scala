package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Benchmark decontamination: drop training documents that overlap an
  * evaluation set (the n-gram-collision protocol used by published LLM
  * data pipelines — a document is contaminated when it shares at least
  * `minHits` distinct word n-grams with any benchmark document).
  *
  * Scale shape: the benchmark side is small (thousands of prompts), the
  * corpus side is the 100 TB table. Benchmark n-grams are therefore
  * reduced to DISTINCT 64-bit hashes and broadcast, so the corpus pass is
  * a scan-local explode + broadcast semi-join + partial-aggregated count —
  * the corpus never shuffles by gram. Joining on xxhash64 instead of the
  * raw gram text keeps the broadcast a few MB per million benchmark grams
  * (a raw 13-gram averages ~80 bytes); a 64-bit collision would need
  * ~2^32 gram pairs to become likely, far beyond any benchmark set.
  */
object Decontamination {

  /** A doc's meaningful shingles: [[Dedup.shingles]] minus the empty
    * string. Null/empty text shingles to `[""]` (the split contract), and
    * an empty gram must never count as overlap — a blank benchmark row
    * would otherwise mark every blank corpus doc 100% contaminated.
    */
  private def nonEmptyShingles(text: Column, n: Int): Column =
    filter(Dedup.shingles(text, n), g => g =!= "")

  private def benchGramHashes(bench: DataFrame, textCol: String, n: Int) =
    bench.select(explode(nonEmptyShingles(col(textCol), n)).as("g"))
      .select(xxhash64(col("g")).as("__gh"))
      .distinct()

  /** Contaminated corpus docs: (idCol, n_hits) where n_hits = distinct
    * n-grams of the doc that appear anywhere in the benchmark set.
    */
  def contaminated(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, benchTextCol: String,
      n: Int = 13, minHits: Int = 1): DataFrame = {
    val grams = corpus.select(col(idCol),
        explode(nonEmptyShingles(col(textCol), n)).as("g"))
      .select(col(idCol), xxhash64(col("g")).as("__gh"))
    grams.join(broadcast(benchGramHashes(bench, benchTextCol, n)), "__gh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** Per-document contamination FRACTION — the published protocols
    * threshold on overlap SHARES (e.g. "drop if >50% of a doc's n-grams
    * appear in the eval set"), not absolute hits: `n_grams` (the doc's
    * distinct n-grams), `n_hits` (those appearing anywhere in the
    * benchmark), `overlap_frac` = n_hits / n_grams. Every doc with at
    * least one non-empty n-gram gets a row (zero hits included — the
    * fraction is the signal); null/blank-text docs have no meaningful
    * n-grams ([[nonEmptyShingles]]) and are omitted. Same broadcast
    * scan-local shape as [[contaminated]]; the denominator comes from the
    * doc's own shingle array, no second corpus pass.
    */
  def contaminationScore(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, benchTextCol: String,
      n: Int = 13): DataFrame = {
    val grams = corpus.select(col(idCol),
        nonEmptyShingles(col(textCol), n).as("__gs"))
      .select(col(idCol), size(col("__gs")).as("__ng"),
        explode(col("__gs")).as("g"))
      .select(col(idCol), col("__ng"), xxhash64(col("g")).as("__gh"))
    val benchSet = benchGramHashes(bench, benchTextCol, n)
      .withColumn("__hit", lit(1))
    grams.join(broadcast(benchSet), Seq("__gh"), "left")
      .groupBy(col(idCol))
      .agg(max(col("__ng")).cast("long").as("n_grams"),
        count(col("__hit")).as("n_hits"))
      .select(col(idCol), col("n_grams"), col("n_hits"),
        round(col("n_hits") / col("n_grams").cast("double"), 6)
          .as("overlap_frac"))
  }

  /** The clean corpus: contaminated rows anti-joined away. */
  def decontaminate(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, benchTextCol: String,
      n: Int = 13, minHits: Int = 1): DataFrame =
    corpus.join(
      contaminated(corpus, bench, idCol, textCol, benchTextCol, n, minHits)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
