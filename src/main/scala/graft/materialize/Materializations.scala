package graft.materialize

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

/** The five materialization state machines of the reference (SURVEY §0, §2.1,
  * §2.5): table (CTAS), view, incremental (append / insert_overwrite /
  * merge), seed, snapshot — re-expressed on the Spark catalog + DataFrame
  * writers instead of generated Spark SQL text.
  */
object TableMaterialization {
  /** CTAS semantics (reference macros/adapters.sql:148-192 + table.sql):
    * drop any existing relation, then `create table ... using <format>
    * [partitioned by] [clustered by] [location] as select`.
    *
    * partitionBy/bucketBy map to directory partitioning + bucketing —
    * at scale this is the layout knob: partition on the natural pruning key
    * (low cardinality), bucket on the frequent join key.
    */
  def run(
      spark: SparkSession,
      table: String,
      df: DataFrame,
      format: String = "parquet",
      partitionBy: Seq[String] = Nil,
      bucketBy: Option[(Int, Seq[String])] = None,
      location: Option[String] = None,
      properties: Map[String, String] = Map.empty): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP VIEW IF EXISTS $table")
    var w = df.write.format(format).mode(SaveMode.Overwrite)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    bucketBy.foreach { case (n, cols) => w = w.bucketBy(n, cols.head, cols.tail: _*) }
    location.foreach(p => w = w.option("path", p))
    properties.foreach { case (k, v) => w = w.option(k, v) }
    w.saveAsTable(table)
  }
}

object ViewMaterialization {
  /** `create or replace view` from SQL text (reference adapters.sql:253-299). */
  def run(spark: SparkSession, view: String, selectSql: String): Unit =
    spark.sql(s"CREATE OR REPLACE VIEW $view AS $selectSql")

  /** Temp view from a DataFrame (reference adapters.sql:121-135 — the
    * staging relation used by incremental/snapshot). */
  def temp(df: DataFrame, name: String): Unit = df.createOrReplaceTempView(name)
}

/** `on_schema_change` handling (reference incremental.sql:30,71-80 +
  * adapters.sql:15-46): ignore / fail / append_new_columns /
  * sync_all_columns. Dropping columns is rejected on every platform
  * (adapters.sql:17-26), so sync only ever ADDs.
  */
sealed trait SchemaChangePolicy
object SchemaChangePolicy {
  case object Ignore extends SchemaChangePolicy
  case object Fail extends SchemaChangePolicy
  case object AppendNewColumns extends SchemaChangePolicy
  case object SyncAllColumns extends SchemaChangePolicy
}

object SchemaEvolution {
  /** Columns in `incoming` missing from table `target`. */
  def newColumns(spark: SparkSession, target: String, incoming: DataFrame): Seq[StructField] = {
    val have = spark.table(target).schema.fieldNames.map(_.toLowerCase).toSet
    incoming.schema.fields.toSeq.filterNot(f => have(f.name.toLowerCase))
  }

  /** `ALTER TABLE ... ADD COLUMNS (...)` (SURVEY §2.5 O6). */
  def addColumns(spark: SparkSession, target: String, cols: Seq[StructField]): Unit =
    if (cols.nonEmpty) {
      val ddl = cols.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      spark.sql(s"ALTER TABLE $target ADD COLUMNS ($ddl)")
    }

  def apply(spark: SparkSession, target: String, incoming: DataFrame,
      policy: SchemaChangePolicy): Unit = {
    val added = newColumns(spark, target, incoming)
    val removed = {
      val incomingNames = incoming.schema.fieldNames.map(_.toLowerCase).toSet
      spark.table(target).schema.fieldNames.toSeq.filterNot(n => incomingNames(n.toLowerCase))
    }
    policy match {
      case SchemaChangePolicy.Ignore => ()
      case SchemaChangePolicy.Fail =>
        if (added.nonEmpty || removed.nonEmpty)
          throw new IllegalStateException(
            s"schema changed for $target: +${added.map(_.name)} -$removed " +
              "(on_schema_change=fail)")
      case SchemaChangePolicy.AppendNewColumns => addColumns(spark, target, added)
      case SchemaChangePolicy.SyncAllColumns =>
        // Reference semantics: add new columns; dropping is rejected, the
        // stale columns simply stop receiving values (adapters.sql:17-26).
        addColumns(spark, target, added)
    }
  }
}

sealed trait IncrementalStrategy
object IncrementalStrategy {
  /** `INSERT INTO` (reference strategies.sql:22-39). */
  case object Append extends IncrementalStrategy
  /** `INSERT OVERWRITE ... [PARTITION]` with dynamic partition replacement
    * (strategies.sql:1-19) — the reference's default strategy. */
  case object InsertOverwrite extends IncrementalStrategy
  /** MERGE by unique key (strategies.sql:42-93), via [[MergeOps.merge]]. */
  case object Merge extends IncrementalStrategy
}

final case class IncrementalConfig(
    strategy: IncrementalStrategy,
    uniqueKey: Seq[String] = Nil,
    partitionBy: Seq[String] = Nil,
    mergeUpdateColumns: Seq[String] = Nil,
    mergeExcludeColumns: Seq[String] = Nil,
    matchedPredicate: Option[Column] = None,
    onSchemaChange: SchemaChangePolicy = SchemaChangePolicy.Ignore,
    fileFormat: String = "parquet")

/** The incremental materialization state machine (reference
  * macros/materializations/incremental/incremental.sql):
  * first run → CTAS; subsequent runs → strategy-specific DML, preceded by
  * on_schema_change handling. Validation mirrors validate.sql:19-50, except
  * merge is additionally allowed on plain parquet thanks to the O3′ rewrite.
  */
object IncrementalMaterialization {

  def run(spark: SparkSession, target: String, batch: DataFrame,
      cfg: IncrementalConfig): Unit = {
    if (cfg.strategy == IncrementalStrategy.Merge && cfg.uniqueKey.isEmpty) {
      // Reference: no unique_key → merge degenerates to ON FALSE insert-only
      // (strategies.sql:76). Handled inside MergeOps.
    }
    if (!spark.catalog.tableExists(target)) {
      TableMaterialization.run(spark, target, batch,
        format = cfg.fileFormat, partitionBy = cfg.partitionBy)
      return
    }
    SchemaEvolution(spark, target, batch, cfg.onSchemaChange)
    // Project to destination columns in target order (reference
    // strategies.sql:2-3 — dest_columns drive the insert projection).
    val destCols = spark.table(target).columns.toSeq
    val aligned = batch.select(destCols.map(c =>
      if (batch.columns.contains(c)) col(c) else lit(null).as(c)): _*)

    cfg.strategy match {
      case IncrementalStrategy.Append =>
        aligned.write.mode(SaveMode.Append).insertInto(target)

      case IncrementalStrategy.InsertOverwrite =>
        // Dynamic mode: only partitions present in the batch are replaced;
        // unpartitioned target → whole-table overwrite (README.md:549-553).
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        aligned.write.mode(SaveMode.Overwrite).insertInto(target)

      case IncrementalStrategy.Merge =>
        val merged = MergeOps.merge(spark.table(target), aligned,
          cfg.uniqueKey, cfg.mergeUpdateColumns, cfg.mergeExcludeColumns,
          cfg.matchedPredicate)
        atomicReplace(spark, target, merged, cfg)
    }
  }

  /** Atomic-ish replace for non-ACID formats: materialize the merged result
    * to a staging location first, then swap it in. Mirrors the reason the
    * reference restricts MERGE to ACID formats (validate.sql:41-43) — the
    * staging write makes the overwrite never read what it's writing. On a
    * lakehouse format the swap would be a metadata-only commit instead.
    */
  private def atomicReplace(spark: SparkSession, target: String,
      merged: DataFrame, cfg: IncrementalConfig): Unit = {
    val staging = java.nio.file.Files
      .createTempDirectory(s"graft_merge_${target.replace('.', '_')}")
      .toString
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    val fresh = spark.read.parquet(staging)
    var w = fresh.write.format(cfg.fileFormat).mode(SaveMode.Overwrite)
    if (cfg.partitionBy.nonEmpty) w = w.partitionBy(cfg.partitionBy: _*)
    w.saveAsTable(target)
    spark.catalog.refreshTable(target) // SURVEY §2.5 O8
  }
}

object SeedLoader {
  /** Seed CSV semantics (reference impl.py:624-719 + seed.sql:7-49):
    * lenient parse then per-column cast (`ColumnCsvMappingStrategy`,
    * impl.py:37-64), written overwrite (full_refresh) or append.
    * The reference's 60 kB statement-chunk protocol (impl.py:712-719) exists
    * only because data crosses the wire inside code text — in-process we
    * read the file directly.
    */
  def loadCsv(spark: SparkSession, table: String, path: String,
      columnTypes: Map[String, String] = Map.empty,
      overwrite: Boolean = true): Unit = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    write(spark, table, cast(raw, columnTypes), overwrite)
  }

  /** In-memory seed (the agate-rows path, impl.py:645-710). */
  def loadRows(spark: SparkSession, table: String, rows: DataFrame,
      columnTypes: Map[String, String] = Map.empty,
      overwrite: Boolean = true): Unit =
    write(spark, table, cast(rows, columnTypes), overwrite)

  private def cast(df: DataFrame, columnTypes: Map[String, String]): DataFrame =
    if (columnTypes.isEmpty) df
    else df.select(df.columns.toSeq.map { c =>
      columnTypes.get(c) match {
        case Some(t) => col(c).cast(t).as(c) // 2-phase typing, impl.py:679-690
        case None    => col(c)
      }
    }: _*)

  private def write(spark: SparkSession, table: String, df: DataFrame,
      overwrite: Boolean): Unit =
    if (!spark.catalog.tableExists(table))
      df.write.mode(SaveMode.Overwrite).saveAsTable(table)
    else if (overwrite) {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      df.write.mode(SaveMode.Overwrite).saveAsTable(table)
    } else df.write.mode(SaveMode.Append).insertInto(table)
}
