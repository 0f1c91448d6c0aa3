package graft.materialize

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Relation

/** SCD Type-2 snapshots (SURVEY §2.5 O4/O5, reference
  * macros/materializations/snapshot.sql).
  *
  * Change detection strategies mirror dbt's:
  *   - [[SnapshotStrategy.ByTimestamp]]: a row changed when its
  *     `updated_at` advanced past the stored `dbt_updated_at`
  *   - [[SnapshotStrategy.ByCheck]]: a row changed when any check column
  *     differs (null-safe comparison)
  *
  * The synthetic row id is the reference's md5-over-pipe-joined-columns
  * (snapshot.sql:1-6). The clock is injectable so results are deterministic
  * under test/oracle comparison (SURVEY §7 "timestamp determinism" risk).
  *
  * Scale: one full-outer shuffle join per snapshot run (source × current
  * rows) + the [[MergeOps.snapshotMerge]] join. History grows append-only;
  * partition the snapshot table by a date derived from dbt_valid_from when
  * histories get long.
  */
sealed trait SnapshotStrategy
object SnapshotStrategy {
  final case class ByTimestamp(updatedAt: String) extends SnapshotStrategy
  final case class ByCheck(cols: Seq[String]) extends SnapshotStrategy
  /** dbt's `check_cols = 'all'`: every non-key source column participates
    * in change detection. */
  case object ByCheckAll extends SnapshotStrategy
}

/** dbt 1.9's `hard_deletes` config (supersedes the boolean
  * `invalidate_hard_deletes`):
  *   - [[HardDeletes.Ignore]]: vanished keys keep their open row (default)
  *   - [[HardDeletes.Invalidate]]: vanished keys close at the snapshot
  *     clock (the old `invalidate_hard_deletes: true`)
  *   - [[HardDeletes.NewRecord]]: close the old row AND append a tombstone
  *     version — the row's last values under `dbt_is_deleted = 'True'` —
  *     so the history records the deletion as an event, and a later
  *     reappearance snapshots as a fresh change (the is-deleted flag
  *     participates in change detection).
  */
sealed trait HardDeletes
object HardDeletes {
  case object Ignore extends HardDeletes
  case object Invalidate extends HardDeletes
  case object NewRecord extends HardDeletes
}

final case class SnapshotConfig(
    keys: Seq[String],
    strategy: SnapshotStrategy,
    invalidateHardDeletes: Boolean = false,
    clock: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
    /** Partition the history by close date (`dbt_valid_to_date`, open rows
      * under a 9999-12-31 sentinel). A snapshot run then scans ONLY the
      * open partition plus the close-date partitions it touches, and
      * rewrites only those — O(current + churn) instead of O(full history),
      * which is what keeps long histories affordable at 100 TB. Off by
      * default because it adds the partition column to the table schema.
      */
    partitionHistory: Boolean = false,
    /** dbt 1.9 `hard_deletes`; when left [[HardDeletes.Ignore]] the legacy
      * `invalidateHardDeletes` boolean still selects Invalidate (the two
      * spellings of the same knob never conflict: the enum wins when set).
      */
    hardDeletes: HardDeletes = HardDeletes.Ignore,
    /** dbt's `dbt_valid_to_current` (reference snapshot.sql:27-32): when
      * set, OPEN rows carry this literal timestamp in `dbt_valid_to`
      * instead of NULL (the "9999-12-31 convention" some warehouses use so
      * BETWEEN-style validity predicates need no null handling). Change
      * detection and close-merges treat the sentinel as open.
      */
    validToCurrent: Option[Timestamp] = None) {
  /** Effective hard-delete mode (enum wins over the legacy boolean). */
  def deleteMode: HardDeletes =
    if (hardDeletes != HardDeletes.Ignore) hardDeletes
    else if (invalidateHardDeletes) HardDeletes.Invalidate
    else HardDeletes.Ignore

  /** Predicate: is this row's dbt_valid_to an OPEN marker? */
  def isOpen(validTo: Column): Column = validToCurrent match {
    case Some(ts) => validTo.isNull || validTo === lit(ts)
    case None     => validTo.isNull
  }
  def openValue: Column = validToCurrent match {
    case Some(ts) => lit(ts).cast("timestamp")
    case None     => lit(null).cast("timestamp")
  }
}

object SnapshotMaterialization {
  /** md5(coalesce(cast(c as string),'') || '|' || ...) — snapshot.sql:1-6. */
  def scdId(cols: Seq[Column]): Column =
    md5(concat_ws("|", cols.map(c => coalesce(c.cast("string"), lit(""))): _*))

  def run(spark: SparkSession, target: String, source: DataFrame,
      cfg: SnapshotConfig): Unit = {
    val now = lit(cfg.clock()).cast("timestamp")
    val updatedAt: Column = cfg.strategy match {
      case SnapshotStrategy.ByTimestamp(c) => col(c)
      case _                               => now // check strategies stamp the clock
    }
    val withMetaBase = source
      .withColumn("dbt_updated_at", updatedAt)
      .withColumn("dbt_valid_from", updatedAt)
      .withColumn("dbt_valid_to", cfg.openValue)
      .withColumn("dbt_scd_id",
        scdId(cfg.keys.map(col) :+ col("dbt_updated_at")))
    // new_record mode: every live row carries the dbt 1.9 string flag
    // ('False'/'True', dbt-core's spelling) so tombstones are first-class
    // versions and the flag participates in change detection.
    val withMeta =
      if (cfg.deleteMode == HardDeletes.NewRecord)
        withMetaBase.withColumn("dbt_is_deleted", lit("False"))
      else withMetaBase

    if (!spark.catalog.tableExists(Relation.parse(target).quoted)) {
      if (cfg.partitionHistory)
        TableMaterialization.run(spark, target,
          withMeta.withColumn(CloseDateCol, closeDate(col("dbt_valid_to"), cfg)),
          partitionBy = Seq(CloseDateCol))
      else
        TableMaterialization.run(spark, target, withMeta)
      return
    }

    if (cfg.partitionHistory) {
      runPartitioned(spark, target, withMeta, cfg)
      return
    }

    val snapshotted = spark.table(Relation.parse(target).quoted)
    val current = snapshotted.filter(cfg.isOpen(col("dbt_valid_to")))
    val staging = stagingRows(withMeta, current, cfg, now)
    val merged = MergeOps.snapshotMerge(snapshotted, staging,
      openPredicate = cfg.isOpen(col("dbt_valid_to")))

    // Same staged-commit discipline as incremental merge — staged on shared
    // storage, and if the destructive swap dies the staged copy is preserved
    // as the named recovery artifact (Staging.recoverStagedCommit) instead
    // of deleted: once the overwrite starts, the pre-merge target rows the
    // result was computed from are being destroyed, so a retry would
    // re-merge from a damaged target.
    val rel = Relation.parse(target)
    Staging.stagedCommit(spark, rel, s"snap_${rel.identifier}") { dir =>
      merged.write.mode(SaveMode.Overwrite).parquet(dir)
      // Pin the format the first-run CTAS used: replay under a session whose
      // default source differs must not silently convert the table.
      Staging.CommitSpec("replace_table", format = Some("parquet"))
    }
  }

  /** One full-outer join source × current rows decides inserts / updates /
    * deletes (dbt-core's snapshot_staging_table, referenced from
    * snapshot.sql:15-41). Returns staging rows tagged `dbt_change_type`.
    */
  private def stagingRows(withMeta: DataFrame, current: DataFrame,
      cfg: SnapshotConfig, now: Column): DataFrame = {
    val s = withMeta.alias("s")
    val t = current.alias("t")
    val joinCond = cfg.keys.map(k => col(s"s.$k") <=> col(s"t.$k")).reduce(_ && _)
    val joined = s.join(t, joinCond, "full_outer")

    val sHit = col("s.dbt_scd_id").isNotNull
    val tHit = col("t.dbt_scd_id").isNotNull
    def checkDiff(cols: Seq[String]): Column =
      cols.map(c => !(col(s"s.$c") <=> col(s"t.$c"))).reduce(_ || _)
    val strategyChanged: Column = cfg.strategy match {
      case SnapshotStrategy.ByTimestamp(c) => col(s"s.$c") > col("t.dbt_updated_at")
      case SnapshotStrategy.ByCheck(cols)  => checkDiff(cols)
      case SnapshotStrategy.ByCheckAll     =>
        checkDiff(withMeta.columns.toSeq
          .filterNot(_.startsWith("dbt_")).filterNot(cfg.keys.contains))
    }
    // new_record: a key whose current version is a TOMBSTONE and which is
    // back in the source has "changed" even when every check column equals
    // the tombstone's copied values (dbt-core compares dbt_is_deleted too)
    // — otherwise a deleted-then-restored row would never re-open.
    val changed: Column =
      if (cfg.deleteMode == HardDeletes.NewRecord)
        strategyChanged || !(col("s.dbt_is_deleted") <=> col("t.dbt_is_deleted"))
      else strategyChanged

    val srcCols = withMeta.columns.toSeq
    def sSide = srcCols.map(c => col(s"s.$c").as(c))

    // New keys → insert.
    val inserts = joined.filter(sHit && !tHit)
      .select(sSide :+ lit("insert").as("dbt_change_type"): _*)
    // Changed rows → a fresh 'insert' version + an 'update' row closing the
    // old version (matched on the OLD scd_id, valid_to = new valid_from).
    val changedRows = joined.filter(sHit && tHit && changed)
    val newVersions = changedRows
      .select(sSide :+ lit("insert").as("dbt_change_type"): _*)
    val closeOld = changedRows.select(
      srcCols.map {
        case "dbt_scd_id"   => col("t.dbt_scd_id").as("dbt_scd_id")
        case "dbt_valid_to" => col("s.dbt_valid_from").as("dbt_valid_to")
        case c               => col(s"s.$c").as(c)
      } :+ lit("update").as("dbt_change_type"): _*)
    // Vanished keys → close at the snapshot clock (invalidate/new_record).
    // In new_record mode a key whose current version is ALREADY a
    // tombstone must not re-close (or re-tombstone) every subsequent run.
    val vanished = cfg.deleteMode match {
      case HardDeletes.Ignore => joined.filter(lit(false))
      case HardDeletes.Invalidate => joined.filter(tHit && !sHit)
      case HardDeletes.NewRecord =>
        joined.filter(tHit && !sHit && col("t.dbt_is_deleted") === "False")
    }
    val deletes =
      if (cfg.deleteMode == HardDeletes.Ignore) None
      else Some(vanished.select(
        srcCols.map {
          case "dbt_scd_id"   => col("t.dbt_scd_id").as("dbt_scd_id")
          case "dbt_valid_to" => now.as("dbt_valid_to")
          case c               => col(s"t.$c").as(c)
        } :+ lit("delete").as("dbt_change_type"): _*))
    // new_record tombstones: the row's last values re-inserted as an OPEN
    // version flagged deleted, stamped and scd-identified at the snapshot
    // clock (key + clock, the same id rule as any other version).
    val tombstones =
      if (cfg.deleteMode != HardDeletes.NewRecord) None
      else Some(vanished.select(
        srcCols.map {
          case "dbt_scd_id" =>
            scdId(cfg.keys.map(k => col(s"t.$k")) :+ now).as("dbt_scd_id")
          case "dbt_valid_from"  => now.as("dbt_valid_from")
          case "dbt_valid_to"    => cfg.openValue.as("dbt_valid_to")
          case "dbt_updated_at"  => now.as("dbt_updated_at")
          case "dbt_is_deleted"  => lit("True").as("dbt_is_deleted")
          case c                  => col(s"t.$c").as(c)
        } :+ lit("insert").as("dbt_change_type"): _*))

    (Seq(inserts, newVersions, closeOld) ++ deletes ++ tombstones)
      .reduce(_ unionByName _)
  }

  /** Close-date partition column: open rows live under a far-future
    * sentinel partition, closed rows under their close date. */
  private val CloseDateCol = "dbt_valid_to_date"
  private val OpenSentinel = "9999-12-31"
  private def closeDate(validTo: Column, cfg: SnapshotConfig): Column =
    when(cfg.isOpen(validTo), to_date(lit(OpenSentinel)))
      .otherwise(to_date(validTo))

  /** History-partitioned snapshot run (cfg.partitionHistory): change
    * detection and the close-merge read ONLY the open partition; the write
    * replaces the open partition plus the close-date partitions this run
    * adds rows to (their pre-existing rows are unioned back in, both reads
    * partition-pruned). Older history partitions are untouched.
    */
  private def runPartitioned(spark: SparkSession, target: String,
      withMeta: DataFrame, cfg: SnapshotConfig): Unit = {
    val rel = Relation.parse(target)
    val now = lit(cfg.clock()).cast("timestamp")
    val full = spark.table(rel.quoted)
    val current = full
      .filter(col(CloseDateCol) === to_date(lit(OpenSentinel)))
      .drop(CloseDateCol)
    val staging = stagingRows(withMeta, current, cfg, now)
    val merged = MergeOps.snapshotMerge(current, staging,
      openPredicate = cfg.isOpen(col("dbt_valid_to")))

    // Two-level staging: the merged result materializes once to an
    // intermediate dir (it feeds both the partition-list collect and the
    // commit content — recomputing the full-outer join twice would double
    // the run), then the COMPLETE replacement content of every touched
    // partition — merged rows PLUS the pre-existing rows of the close-date
    // partitions this run adds to — is staged through stagedCommit, so the
    // recovery artifact replays without reading the (possibly damaged)
    // target. The intermediate is a plain withDir: worthless on failure.
    Staging.withDir(spark, s"snap_pre_${rel.identifier}") { pre =>
      merged.withColumn(CloseDateCol, closeDate(col("dbt_valid_to"), cfg))
        .write.mode(SaveMode.Overwrite).parquet(pre)
      val fresh = spark.read.parquet(pre)
      // Close-date partitions touched this run (metadata-scale collect);
      // their existing rows ride along so dynamic overwrite keeps them.
      val allDates = fresh.select(CloseDateCol).distinct()
        .collect().map(_.getDate(0))
      val openDate = java.sql.Date.valueOf(OpenSentinel)
      val touchedDates = allDates.filterNot(_ == openDate)
      val existingClosed = full.filter(
        col(CloseDateCol).isin(touchedDates.toSeq: _*))
      val outCols = full.columns.toSeq
      Staging.stagedCommit(spark, rel, s"snap_${rel.identifier}") { dir =>
        fresh.select(outCols.map(col): _*)
          .unionByName(existingClosed.select(outCols.map(col): _*))
          .write.mode(SaveMode.Overwrite).parquet(dir)
        // A run that leaves NO open rows (every key invalidated) writes
        // nothing under the open sentinel, so dynamic overwrite would keep
        // the now-stale open partition — drop it at commit time instead.
        val drops =
          if (allDates.contains(openDate)) Nil
          else Seq(s"`$CloseDateCol` = ${Relation.sqlLiteral(openDate)}")
        Staging.CommitSpec("dynamic_overwrite", dropPartitions = drops)
      }
    }
  }
}
