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
    // Internal side references, backtick-quoted like the public tgt()/src()
    // helpers — dotted column names must not parse as struct access.
    def tq(c: String) = col(s"t.`${c.replace("`", "``")}`")
    def sq(c: String) = col(s"s.`${c.replace("`", "``")}`")
    // Align source to target schema, tag both sides with presence markers.
    // The source marker doubles as the multiple-match guard: MERGE INTO
    // raises when several source rows match one target row (duplicating
    // the target row would corrupt the table silently, compounding across
    // incremental runs) — a per-key window count rides the same key
    // shuffle the join needs, and the guard fires only on MATCHED
    // duplicates (several unmatched same-key source rows legally all
    // insert, exactly like MERGE's NOT MATCHED branch).
    val t = target.select(cols.map(col) :+ lit(1).as("__t"): _*).alias("t")
    val dupCount = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*))
    val s = source.select(cols.map(col) :+ dupCount.as("__s"): _*).alias("s")
    // Null-UNSAFE equality, matching the reference's `MERGE ON t.k = s.k`:
    // a NULL-key source row never matches (it inserts), a NULL-key target
    // row is never updated. (The old <=> also cross-joined multiple
    // NULL-key rows from both sides.) partitionScopedMerge computes its
    // affected partitions with the same null-unsafe equality.
    //
    // The multiple-match guard rides the JOIN CONDITION, not an output
    // column: a projection-based guard is prunable — a consumer that only
    // aggregates (merge(...).count(), the bench driver's own shape) scans
    // ReadSchema struct<> and evaluates NO output column, silently fanning
    // out matched target rows. Join conditions determine the output ROW
    // SET, so they are evaluated under any consumer. Catalyst extracts the
    // key equalities as hash-join keys and evaluates the residual guard
    // only on key-equal candidate pairs (never pushed to a side — this is
    // a full outer join), so it fires exactly on MATCHED duplicates:
    // several unmatched same-key source rows legally all insert, like
    // MERGE's NOT MATCHED branch.
    val guard = when(col("s.__s") > 1, raise_error(concat(
        lit("MERGE source batch has multiple rows for matched unique key ("),
        concat_ws(", ", keys.map(k => sq(k).cast("string")): _*),
        lit(") — the reference MERGE raises on multiple source matches; " +
          "dedupe the batch first"))).cast("boolean"))
      .otherwise(lit(true))
    val joinCond = keys.map(k => tq(k) === sq(k)).reduce(_ && _) && guard
    val joined = t.join(s, joinCond, "full_outer")

    val tHit = col("t.__t").isNotNull
    val sHit = col("s.__s").isNotNull
    val updateFires = matchedPredicate match {
      case Some(p) => tHit && sHit && p
      case None    => tHit && sHit
    }
    val out = cols.map { c =>
      val tc = tq(c); val sc = sq(c)
      val base =
        if (keys.contains(c)) coalesce(tc, sc)
        else if (updatable(c))
          when(!tHit, sc)              // not matched → insert source value
            .when(updateFires, sc)     // matched (+predicate) → update
            .otherwise(tc)             // matched, column not updatable → keep
        else when(tHit, tc).otherwise(sc)
      base.as(c)
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
