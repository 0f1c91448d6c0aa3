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
}

final case class SnapshotConfig(
    keys: Seq[String],
    strategy: SnapshotStrategy,
    invalidateHardDeletes: Boolean = false,
    clock: () => Timestamp = () => new Timestamp(System.currentTimeMillis()))

object SnapshotMaterialization {
  /** md5(coalesce(cast(c as string),'') || '|' || ...) — snapshot.sql:1-6. */
  def scdId(cols: Seq[Column]): Column =
    md5(concat_ws("|", cols.map(c => coalesce(c.cast("string"), lit(""))): _*))

  def run(spark: SparkSession, target: String, source: DataFrame,
      cfg: SnapshotConfig): Unit = {
    val now = lit(cfg.clock()).cast("timestamp")
    val updatedAt: Column = cfg.strategy match {
      case SnapshotStrategy.ByTimestamp(c) => col(c)
      case SnapshotStrategy.ByCheck(_)     => now
    }
    val withMeta = source
      .withColumn("dbt_updated_at", updatedAt)
      .withColumn("dbt_valid_from", updatedAt)
      .withColumn("dbt_valid_to", lit(null).cast("timestamp"))
      .withColumn("dbt_scd_id",
        scdId(cfg.keys.map(col) :+ col("dbt_updated_at")))

    if (!spark.catalog.tableExists(Relation.parse(target).quoted)) {
      TableMaterialization.run(spark, target, withMeta)
      return
    }

    val snapshotted = spark.table(Relation.parse(target).quoted)
    val current = snapshotted.filter(col("dbt_valid_to").isNull)

    // One full-outer join source × current rows decides inserts / updates /
    // deletes (dbt-core's snapshot_staging_table, referenced from
    // snapshot.sql:15-41).
    val s = withMeta.alias("s")
    val t = current.alias("t")
    val joinCond = cfg.keys.map(k => col(s"s.$k") <=> col(s"t.$k")).reduce(_ && _)
    val joined = s.join(t, joinCond, "full_outer")

    val sHit = col("s.dbt_scd_id").isNotNull
    val tHit = col("t.dbt_scd_id").isNotNull
    val changed: Column = cfg.strategy match {
      case SnapshotStrategy.ByTimestamp(c) => col(s"s.$c") > col("t.dbt_updated_at")
      case SnapshotStrategy.ByCheck(cols) =>
        cols.map(c => !(col(s"s.$c") <=> col(s"t.$c"))).reduce(_ || _)
    }

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
    // Vanished keys → close at the snapshot clock (optional).
    val deletes =
      if (!cfg.invalidateHardDeletes) None
      else Some(joined.filter(tHit && !sHit).select(
        srcCols.map {
          case "dbt_scd_id"   => col("t.dbt_scd_id").as("dbt_scd_id")
          case "dbt_valid_to" => now.as("dbt_valid_to")
          case c               => col(s"t.$c").as(c)
        } :+ lit("delete").as("dbt_change_type"): _*))

    val staging = (Seq(inserts, newVersions, closeOld) ++ deletes)
      .reduce(_ unionByName _)
    val merged = MergeOps.snapshotMerge(snapshotted, staging)

    // Same staging-then-swap discipline as incremental merge — staged on
    // shared storage (Staging), never a driver-local temp dir.
    val rel = Relation.parse(target)
    Staging.withDir(spark, s"snap_${rel.identifier}") { dir =>
      merged.write.mode(SaveMode.Overwrite).parquet(dir)
      spark.read.parquet(dir).write.mode(SaveMode.Overwrite)
        .saveAsTable(rel.quoted)
      spark.catalog.refreshTable(rel.quoted)
    }
  }
}
