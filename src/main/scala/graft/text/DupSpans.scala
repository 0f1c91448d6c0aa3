package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.ScopedStorage.Ops

/** Duplicated-span detection: how much of each document is made of word
  * n-grams that also occur in other documents — the distributed form of
  * the exact-substring dedup signal (the suffix-array approach of the
  * "Deduplicating Training Data" line of work is inherently sequential;
  * fixed-length n-gram occurrence counting is its scalable approximation,
  * and with n around 10–20 tokens the two flag nearly the same spans).
  * High `dup_frac` documents are templated/boilerplate/mirrored content
  * that exact- and near-dedup both miss when the surrounding page differs.
  *
  * Scale shape: the gram-occurrence table is O(total corpus tokens) rows
  * but — with `hashGrams` (the default) — each row is an 8-byte xxhash64
  * key, never the gram text, so the two aggregations that consume it
  * ((doc, gram) counts, then per-gram document frequencies) shuffle
  * fixed-width rows and combine map-side. The (doc, gram) frame is the
  * shared expensive subtree (consumed by the df re-aggregation AND the
  * dup-count join) and is lazily localCheckpoint()ed once — the TfIdf /
  * dedup-collapse idiom. Per-doc gram totals come scan-locally from the
  * token count (size − n + 1), not from the gram table. Hash collisions
  * can in principle merge two distinct grams (odds ~grams²/2⁶⁵ — vanishing
  * at any real corpus size); pass `hashGrams = false` to carry gram text
  * end-to-end when exact auditability beats shuffle width.
  */
object DupSpans {

  /** All positional word n-gram occurrences of `text` (NOT distinct — a
    * gram repeated inside one doc occupies several spans and each counts
    * toward that doc's duplicated fraction). Documents with fewer than `n`
    * tokens have no spans and produce an empty array.
    */
  private[text] def gramArray(text: Column, n: Int): Column =
    // Token array bound as a lambda variable so the per-position lambda
    // reads a bound buffer — the O(tokens²) pitfall documented at
    // GraftFunctions.bindArray (with n = 16-token spans the naive shape
    // re-tokenized the document once per span position).
    graft.functions.GraftFunctions.bindArray(split(trim(text), "\\s+")) { toks =>
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
    }

  /** Per-document duplicated-span statistics: `n_grams` (total n-gram
    * occurrences), `n_dup` (occurrences whose gram appears in at least
    * `minDocs` DISTINCT documents), and `dup_frac` = n_dup / n_grams.
    * Documents with fewer than `n` tokens have no spans and are omitted
    * (a fraction over zero occurrences is undefined, and NULL rows would
    * poison downstream threshold filters).
    */
  def duplicatedSpanStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 16, minDocs: Int = 2, hashGrams: Boolean = true): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val gram = explode(gramArray(col(textCol), n)).as("__g0")
    val key = if (hashGrams) xxhash64(col("__g0")) else col("__g0")
    val perDoc = docs.select(col(idCol).as("id"), gram)
      .select(col("id"), key.as("__g"))
      .groupBy("id", "__g").agg(count(lit(1)).as("__c"))
      .scopedCheckpoint(false)
    val dupGrams = perDoc.groupBy("__g")
      .agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs)
    val dupPerDoc = perDoc.join(dupGrams.select("__g"), "__g")
      .groupBy("id").agg(sum(col("__c")).as("__dup"))
    val toks = split(trim(col(textCol)), "\\s+")
    docs.select(col(idCol).as("id"),
        (size(toks) - (n - 1)).cast("long").as("n_grams"))
      .filter(col("n_grams") > 0)
      .join(dupPerDoc, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"),
        coalesce(col("__dup"), lit(0L)).as("n_dup"),
        round(coalesce(col("__dup"), lit(0L)) /
          col("n_grams").cast("double"), 6).as("dup_frac"))
  }

  /** The substring-dedup TRANSFORM (not just the signal): rewrite each
    * document with every token covered by a cross-document duplicated
    * n-gram removed — what the "Deduplicating Training Data" line of work
    * actually does to the corpus before training. Adds `clean_text`; the
    * original column is kept. Output text is whitespace-normalized
    * (single-space joined) whether or not anything was removed.
    *
    * Scale shape: the positional gram table shuffles 8-byte hashed keys
    * (see the module scaladoc; `hashGrams = false` trades shuffle width
    * for exact auditability), is localCheckpoint()ed once and consumed by
    * both the document-frequency cut and the span join; per-document dup
    * starts come back as one `collect_list` whose size is bounded by the
    * doc's own gram count (same order as the doc text itself — per-doc
    * state, never corpus-sized); the rewrite is a single scan-local
    * codegen'd kernel ([[graft.functions.RemoveSpans]] — sorted two-pointer
    * sweep, O(tokens + spans·log spans) per doc, NOT tokens × spans).
    */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 16, minDocs: Int = 2, hashGrams: Boolean = true): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val key = if (hashGrams) xxhash64(col("__g0")) else col("__g0")
    val pos = docs.select(col(idCol).as("__id"),
        posexplode(gramArray(col(textCol), n)).as(Seq("__p0", "__g0")))
      .select(col("__id"), (col("__p0") + 1).cast("long").as("__start"),
        key.as("__g"))
      .scopedCheckpoint(false)
    val dupKeys = pos.select("__id", "__g").distinct()
      .groupBy("__g").agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs).select("__g")
    val starts = pos.join(dupKeys, "__g")
      .groupBy("__id").agg(collect_list(col("__start")).as("__starts"))
    docs.join(starts, docs(idCol) === starts("__id"), "left")
      .withColumn("clean_text", graft.functions.GraftFunctions.removeSpans(
        split(trim(col(textCol)), "\\s+"),
        coalesce(col("__starts"), array().cast("array<bigint>")), n))
      .drop("__id", "__starts")
  }

  /** The corpus's most-duplicated spans: the `k` n-grams occurring in the
    * most distinct documents (ties broken lexicographically) — the
    * boilerplate/template detector that tells you WHAT the duplicated
    * material is, where [[duplicatedSpanStats]] tells you how much of each
    * document it covers. Carries gram text (that IS the output), but only
    * for grams surviving the `minDocs` document-frequency cut; the global
    * top-k is a TakeOrdered over that filtered set, not a full sort.
    */
  def topDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 16, k: Int = 20, minDocs: Int = 2): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    docs.select(col(idCol).as("id"),
        explode(array_distinct(gramArray(col(textCol), n))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("gram"))
      .limit(k)
  }
}
