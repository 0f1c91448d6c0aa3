package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — what changed between two versions of a dataset,
  * by key and content hash: `added` (key only in the new snapshot),
  * `removed` (only in the old), `changed` (both, different content),
  * `unchanged`. The ops primitive behind incremental re-processing ("which
  * documents need re-embedding since the last run?"), dataset release
  * notes, and drift monitoring between corpus versions.
  *
  * Scale shape: content is hashed (md5, scan-local) BEFORE the join, so
  * the single full-outer hash-join exchanges only (key, 32-byte hash) —
  * never text — and each side's scan prunes to key + hashed columns.
  * Multi-column content hashes through a NUL-separated concat (the
  * separator keeps ("ab","c") ≠ ("a","bc")); nulls hash as the empty
  * string, so null vs absent-column is the caller's schema contract.
  */
object SnapshotDiff {

  /** One row per key present in either snapshot:
    * (key, status ∈ added|removed|changed|unchanged).
    */
  def diff(old: DataFrame, cur: DataFrame, keyCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "diff needs at least one content column")
    // coalesce BEFORE hashing, not bare concat_ws: concat_ws silently
    // SKIPS null elements together with their separator, so ("a", null)
    // and (null, "a") would hash identically and a value moving between
    // columns would read as "unchanged" — the null must occupy its slot
    // for the documented nulls-hash-as-empty-string contract to hold.
    def hashed(df: DataFrame, h: String): DataFrame =
      df.select(col(keyCol).as("key"),
        md5(concat_ws("\u0000",
          contentCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*))
          .as(h))
    hashed(old, "__old_h")
      .join(hashed(cur, "__cur_h"), Seq("key"), "full_outer")
      .select(col("key"),
        when(col("__old_h").isNull, lit("added"))
          .when(col("__cur_h").isNull, lit("removed"))
          .when(col("__old_h") =!= col("__cur_h"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Rollup: (status, n) — the release-notes line. */
  def summary(old: DataFrame, cur: DataFrame, keyCol: String,
      contentCols: Seq[String]): DataFrame =
    diff(old, cur, keyCol, contentCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
