package graft.materialize

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Format-agnostic MERGE (SURVEY §2.5 O3′).
  *
  * The reference emits `MERGE INTO ... WHEN MATCHED THEN UPDATE ... WHEN NOT
  * MATCHED THEN INSERT` and restricts it to ACID formats (reference
  * macros/materializations/incremental/strategies.sql:42-93,
  * validate.sql:41-43). This re-expresses the same semantics as pure
  * DataFrame ops so plain parquet tables can merge too:
  *
  *   - matched rows:   update columns come from source, others kept
  *   - unmatched src:  inserted (projected to target schema)
  *   - unmatched tgt:  kept
  *   - no key at all:  `ON FALSE` → insert-only (strategies.sql:76)
  *
  * Scale notes: a single full-outer shuffle join on the key set — no
  * collects, no driver-side loops, no double scan of either side. At 100 TB
  * both sides hash-partition on the key; AQE handles skew. The write side
  * (atomic swap) is in [[IncrementalMaterialization]].
  */
object MergeOps {

  /** Target-side column reference for use in `matchedPredicate` (the
    * reference's `incremental_predicates` address DBT_INTERNAL_DEST /
    * DBT_INTERNAL_SOURCE; these helpers are the engine's public equivalent —
    * the join aliases stay internal).
    */
  def tgt(name: String): Column = col(s"t.`$name`")

  /** Source-side column reference for use in `matchedPredicate`. */
  def src(name: String): Column = col(s"s.`$name`")

  /** Pure-DataFrame MERGE returning the post-merge dataset.
    *
    * @param updateColumns  reference `merge_update_columns` — when non-empty,
    *                       only these columns take the source value on match
    * @param excludeColumns reference `merge_exclude_columns` — never updated
    * @param matchedPredicate extra `incremental_predicates` applied to the
    *                       MATCHED branch (rows failing it keep target values)
    */
  def merge(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      updateColumns: Seq[String] = Nil,
      excludeColumns: Seq[String] = Nil,
      matchedPredicate: Option[Column] = None): DataFrame = {
    val cols = target.columns.toSeq
    if (keys.isEmpty) {
      // ON FALSE: nothing ever matches — append-only semantics.
      return target.unionByName(source.select(cols.map(col): _*))
    }
    val updatable: Set[String] = {
      val base = if (updateColumns.nonEmpty) updateColumns.toSet
                 else cols.toSet -- keys
      base -- excludeColumns -- keys
    }
    // Align source to target schema, tag both sides with presence markers.
    val t = target.select(cols.map(col) :+ lit(1).as("__t"): _*).alias("t")
    val s = source.select(cols.map(col) :+ lit(1).as("__s"): _*).alias("s")
    val joinCond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val joined = t.join(s, joinCond, "full_outer")

    val tHit = col("t.__t").isNotNull
    val sHit = col("s.__s").isNotNull
    val updateFires = matchedPredicate match {
      case Some(p) => tHit && sHit && p
      case None    => tHit && sHit
    }
    val out = cols.map { c =>
      val tc = col(s"t.$c"); val sc = col(s"s.$c")
      if (keys.contains(c)) coalesce(tc, sc).as(c)
      else if (updatable(c))
        when(!tHit, sc)              // not matched → insert source value
          .when(updateFires, sc)     // matched (+predicate) → update
          .otherwise(tc).as(c)       // matched, column not updatable → keep
      else when(tHit, tc).otherwise(sc).as(c)
    }
    joined.select(out: _*)
  }

  /** Snapshot-shaped merge (SURVEY §2.5 O4, reference
    * macros/materializations/snapshot.sql:15-41): staging rows carry
    * `dbt_change_type`; updates/deletes close the matched current row by
    * setting `dbt_valid_to`, inserts add new rows verbatim.
    */
  def snapshotMerge(target: DataFrame, staging: DataFrame,
      openPredicate: Column = col("dbt_valid_to").isNull): DataFrame = {
    val cols = target.columns.toSeq
    val closers = staging
      .filter(col("dbt_change_type").isin("update", "delete"))
      .select(col("dbt_scd_id").as("__close_id"), col("dbt_valid_to").as("__new_valid_to"))
    // closers is the changed-row delta — typically small vs the full
    // history; Catalyst/AQE broadcast it when stats allow (not forced: at
    // 100 TB a changed-row set can itself be large).
    val closed = target
      .join(closers, col("dbt_scd_id") === col("__close_id"), "left")
      .withColumn("dbt_valid_to",
        when(col("__close_id").isNotNull && openPredicate, col("__new_valid_to"))
          .otherwise(col("dbt_valid_to")))
      .select(cols.map(col): _*)
    val inserts = staging
      .filter(col("dbt_change_type") === "insert")
      .select(cols.map(col): _*)
    closed.unionByName(inserts)
  }
}
