package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.ScopedStorage.Ops

/** Cross-document LINE deduplication — the RefinedWeb / CCNet pass that
  * strips boilerplate occurring verbatim across pages (navigation chrome,
  * cookie banners, subscribe footers, license blurbs) while [[DupSpans]]
  * catches duplicated WORD runs that cross line boundaries. A line whose
  * exact text appears in at least `minDocs` distinct documents is removed
  * from every document (all occurrences — the content is corpus
  * boilerplate, not any document's own prose). Blank lines (empty after
  * trim) are structural separators, never content: they are exempt from
  * flagging, so a corpus where every doc contains blank spacer lines does
  * not lose its paragraph structure.
  *
  * Scale shape — identical to [[DupSpans.removeDuplicatedSpans]]: the
  * positional line table shuffles (doc, position, 8-byte xxhash64 key)
  * rows — never line text — through the two aggregations (distinct-doc
  * frequency cut, then per-doc flagged positions); it is the shared
  * expensive subtree and is localCheckpoint()ed once; flagged positions
  * come back as one per-doc `collect_list` bounded by the doc's own line
  * count; the rewrite is the scan-local codegen'd
  * [[graft.functions.RemoveSpans]] sweep (n=1 over the line array, newline
  * rejoin). Pass `hashLines = false` to carry line text end-to-end when
  * exact auditability beats shuffle width (same collision note as the
  * [[DupSpans]] module scaladoc).
  */
object LineDedup {

  private def lineArray(textCol: String) = split(col(textCol), "\n")

  /** (doc, key[, 1-based position]) for every non-blank line,
    * checkpointed — the shared subtree of both public operators. The
    * stats path passes `withPos = false`: it never reads the position,
    * so keeping it out narrows the checkpoint and both downstream
    * exchanges by 8 bytes per line.
    */
  private def positionalLines(docs: DataFrame, idCol: String,
      textCol: String, hashLines: Boolean,
      withPos: Boolean = true): DataFrame = {
    val key = if (hashLines) xxhash64(col("__l0")) else col("__l0")
    val cols =
      if (withPos) Seq(col("__id"),
        (col("__p0") + 1).cast("long").as("__pos"), key.as("__k"))
      else Seq(col("__id"), key.as("__k"))
    docs.select(col(idCol).as("__id"),
        posexplode(lineArray(textCol)).as(Seq("__p0", "__l0")))
      .filter(trim(col("__l0")) =!= "")
      .select(cols: _*)
      .scopedCheckpoint(false)
  }

  /** Keys of lines occurring in ≥ `minDocs` distinct documents. */
  private def dupKeys(pos: DataFrame, minDocs: Int): DataFrame =
    pos.select("__id", "__k").distinct()
      .groupBy("__k").agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs).select("__k")

  /** Per-document duplicated-line statistics: `n_lines` (non-blank lines),
    * `n_dup` (of those, lines whose text occurs in ≥ `minDocs` distinct
    * docs) and `dup_frac` = n_dup / n_lines. Documents with no non-blank
    * lines are omitted (the fraction is undefined, and NULLs would poison
    * downstream threshold filters — the [[DupSpans.duplicatedSpanStats]]
    * contract).
    */
  def duplicatedLineStats(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 2, hashLines: Boolean = true): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val pos = positionalLines(docs, idCol, textCol, hashLines,
      withPos = false)
    val dupPerDoc = pos.join(dupKeys(pos, minDocs), "__k")
      .groupBy("__id").agg(count(lit(1)).as("__dup"))
    val nonBlank = size(filter(lineArray(textCol), l => trim(l) =!= ""))
    docs.select(col(idCol).as("__id"),
        nonBlank.cast("long").as("n_lines"))
      .filter(col("n_lines") > 0)
      .join(dupPerDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_lines"),
        coalesce(col("__dup"), lit(0L)).as("n_dup"),
        round(coalesce(col("__dup"), lit(0L)) /
          col("n_lines").cast("double"), 6).as("dup_frac"))
  }

  /** WITHIN-document line dedup — the page-local half of line-based
    * cleaning (repeated nav blocks, stuttered paragraphs): keep the first
    * occurrence of each exact line in order, blanks exempt. Purely
    * scan-local (a codegen'd hash-set sweep, no shuffle at all), so it
    * composes for free in front of the cross-corpus pass.
    */
  def dedupLinesWithinDoc(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.GraftFunctions.dedupLines(split(text, "\n"))

  /** The line-dedup TRANSFORM: rewrite each document with every corpus-
    * duplicated line removed, surviving lines rejoined with newline in
    * their original order. Adds `clean_text`; the original column is kept.
    * A document that loses nothing round-trips byte-identically (newline
    * split/rejoin is lossless).
    */
  def removeDuplicateLines(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 2, hashLines: Boolean = true): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val pos = positionalLines(docs, idCol, textCol, hashLines)
    val flagged = pos.join(dupKeys(pos, minDocs), "__k")
      .groupBy("__id").agg(collect_list(col("__pos")).as("__positions"))
    docs.join(flagged, docs(idCol) === flagged("__id"), "left")
      .withColumn("clean_text", graft.functions.GraftFunctions.removeLines(
        lineArray(textCol),
        coalesce(col("__positions"), array().cast("array<bigint>"))))
      .drop("__id", "__positions")
  }
}
