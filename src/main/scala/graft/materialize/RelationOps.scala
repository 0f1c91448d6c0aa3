package graft.materialize

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, floor, lit, max, min, shiftleft, shiftright}

import graft.core.Relation

/** Relation lifecycle operators (SURVEY §2.1 S9–S11, §2.5 O8/O9/O11).
  *
  * The reference implements rename as copy-write-drop because Glue lacks
  * ALTER RENAME (reference impl.py:192-217); Spark has the native statement,
  * so managed tables rename as a metadata-only operation — the copy path
  * survives only as the cross-schema fallback. Drops are type-aware
  * (table vs view vs temp view — adapters.sql:56-97, 198-228).
  */
object RelationOps {

  /** S9: rename. Metadata-only `ALTER TABLE RENAME` within a schema; views
    * re-create via their stored DDL ([[duplicateView]] + drop).
    */
  def rename(spark: SparkSession, from: String, to: String): Unit = {
    val f = Relation.parse(from)
    val t = Relation.parse(to)
    if (isView(spark, f)) {
      duplicateView(spark, from, to)
      spark.sql(s"DROP VIEW IF EXISTS ${f.quoted}")
    } else {
      spark.sql(s"ALTER TABLE ${f.quoted} RENAME TO ${t.quoted}")
    }
  }

  /** S10: duplicate a view under a new name via its stored definition
    * (the reference rewrites `SHOW CREATE TABLE` output textually —
    * impl.py:398-413; the catalog's View Text is the same definition without
    * the fragile string surgery).
    */
  def duplicateView(spark: SparkSession, from: String, to: String): Unit = {
    val f = Relation.parse(from)
    val t = Relation.parse(to)
    val body = spark.sql(s"DESCRIBE TABLE EXTENDED ${f.quoted}")
      .filter(col("col_name") === "View Text")
      .collect().headOption.map(_.getString(1))
      .getOrElse(throw new IllegalArgumentException(s"$from is not a view"))
    spark.sql(s"CREATE OR REPLACE VIEW ${t.quoted} AS $body")
  }

  /** S11: type-aware drop matrix. Temp views, views, and tables each need a
    * different statement; `purge` mirrors `drop table ... purge`
    * (adapters.sql:76-83) by also deleting the table's files for EXTERNAL
    * tables (managed-table data is dropped by Spark itself).
    */
  def drop(spark: SparkSession, name: String, purge: Boolean = false): Unit = {
    val rel = Relation.parse(name)
    if (spark.catalog.dropTempView(rel.identifier)) return
    if (!spark.catalog.tableExists(rel.quoted)) return
    val info = spark.catalog.getTable(rel.quoted)
    if (info.tableType.equalsIgnoreCase("VIEW")) {
      spark.sql(s"DROP VIEW IF EXISTS ${rel.quoted}")
    } else {
      val loc = if (purge) tableLocation(spark, rel) else None
      spark.sql(s"DROP TABLE IF EXISTS ${rel.quoted}")
      loc.foreach { l =>
        val p = new org.apache.hadoop.fs.Path(l)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(p, true)
      }
    }
  }

  private def isView(spark: SparkSession, rel: Relation): Boolean =
    spark.catalog.tableExists(rel.quoted) &&
      spark.catalog.getTable(rel.quoted).tableType.equalsIgnoreCase("VIEW")

  private def tableLocation(spark: SparkSession, rel: Relation): Option[String] =
    spark.sql(s"DESCRIBE TABLE EXTENDED ${rel.quoted}")
      .filter(col("col_name") === "Location")
      .collect().headOption.map(_.getString(1))

  /** O7 analog: change a table's partition spec. Iceberg evolves the spec
    * as metadata (reference python_utils.sql:197-230); plain parquet needs a
    * one-time rewrite under the new layout. The old table is RENAMED aside
    * (metadata + filesystem move, no data copied) and the relayout CTAS
    * reads it directly — ONE data write total, where a staging-copy
    * formulation would write the corpus twice; at 100 TB the extra copy IS
    * the job. On a relayout failure the original renames back, so the
    * table is never lost mid-evolution.
    */
  def evolvePartitioning(spark: SparkSession, name: String,
      newPartitionBy: Seq[String]): Unit =
    relayoutWith(spark, name, newPartitionBy, identity)

  /** Shared rename-aside + single-relayout-CTAS machinery behind
    * [[evolvePartitioning]], [[compact]] and [[optimizeLayout]]: the data
    * moves ONCE (a staging-copy formulation would write it twice; at
    * 100 TB the extra copy IS the job), and a relayout failure renames the
    * original back, so the table is never lost mid-rewrite.
    */
  private def relayoutWith(spark: SparkSession, name: String,
      partitionBy: Seq[String], shape: DataFrame => DataFrame): Unit = {
    val rel = Relation.parse(name)
    val tmp = Relation.sibling(name, "__evolve_src")
    spark.sql(s"DROP TABLE IF EXISTS ${tmp.quoted}")
    // USER table properties ride through the rebuild: governance tags
    // (`graft.tag.*`), the microbatch granularity attestation, and any
    // caller-set metadata live in TBLPROPERTIES, and the relayout CTAS
    // would otherwise silently drop them — a layout rewrite losing
    // governance metadata surfaced as the microbatch machine refusing a
    // post-compaction table. Engine-managed keys (spark.*, storage
    // internals) are the rebuilt table's own business and are excluded.
    val reserved = Set("transient_lastDdlTime", "external", "location",
      "owner", "provider", "path")
    val carriedProps = spark.sql(s"SHOW TBLPROPERTIES ${rel.quoted}")
      .collect().map(r => r.getString(0) -> r.getString(1))
      .filterNot { case (k, _) =>
        k.startsWith("spark.") || k.startsWith("option.") || reserved(k) }
    rename(spark, name, tmp.name)
    // The rename moves the table DIRECTORY, but a partitioned table's
    // catalog entries still record per-partition locations under the old
    // path — left alone the renamed table reads empty. Re-discover them
    // from the moved directory (metadata-only listing). Unpartitioned
    // sources (evolving a flat table INTO a partitioned layout) have no
    // partition entries to fix, and MSCK rejects them.
    repairIfPartitioned(spark, tmp)
    try {
      graft.core.Failpoints.check("relayout.rebuild")
      // Carried properties ride the materialization itself (its own
      // TBLPROPERTIES channel) — no window where the rebuilt table exists
      // without its governance metadata.
      TableMaterialization.run(spark, name, shape(spark.table(tmp.quoted)),
        partitionBy = partitionBy, properties = carriedProps.toMap)
    } catch { case e: Throwable =>
      spark.sql(s"DROP TABLE IF EXISTS ${rel.quoted}")
      rename(spark, tmp.name, name)
      // The rollback rename breaks partition locations exactly like the
      // forward one did — repair again or the "restored" table reads empty.
      repairIfPartitioned(spark, rel)
      throw e
    }
    spark.sql(s"DROP TABLE IF EXISTS ${tmp.quoted}")
  }

  /** Small-file compaction (the OPTIMIZE/rewrite_data_files analog — the
    * maintenance half of incremental materialization: months of per-batch
    * appends leave thousands of KB-scale files whose open/footer overhead
    * dominates scans long before I/O does). Unpartitioned tables rewrite
    * into ceil(bytes / targetFileBytes) files; partitioned tables
    * hash-repartition on their partition columns — one task per partition
    * value, so each partition directory collapses to a single file (the
    * Hive-compaction contract; a value's data is assumed to fit one task,
    * which directory partitioning already assumes at write time).
    * Contents are untouched — only the file layout changes.
    */
  def compact(spark: SparkSession, name: String,
      targetFileBytes: Long = 128L << 20): Unit = {
    val rel = Relation.parse(name)
    val parts = partitionColumnNames(spark, rel)
    if (parts.nonEmpty)
      relayoutWith(spark, name, parts, _.repartition(parts.map(col): _*))
    else {
      val n = math.max(1L,
        (dataBytes(spark, rel) + targetFileBytes - 1) / targetFileBytes).toInt
      relayoutWith(spark, name, Nil, _.repartition(n))
    }
  }

  /** Sort-based layout optimization (the OPTIMIZE ... SORT BY / linear
    * Z-ORDER analog): rewrite so each file covers a DISJOINT range of
    * `sortCols` (range repartition) and is sorted inside (row-group
    * stats). Parquet min/max footers then let any reader skip whole files
    * for predicates on the sort prefix — at 100 TB the difference between
    * "scan the table" and "open 1/1000th of it". Partitioned tables keep
    * their spec; partition columns lead the range key so directory
    * co-location survives. Contents are untouched.
    */
  def optimizeLayout(spark: SparkSession, name: String, sortCols: Seq[String],
      targetFileBytes: Long = 128L << 20): Unit = {
    require(sortCols.nonEmpty, "optimizeLayout needs at least one sort column")
    val rel = Relation.parse(name)
    val parts = partitionColumnNames(spark, rel)
    val keys = (parts ++ sortCols.filterNot(parts.contains)).map(col)
    val n = math.max(1L,
      (dataBytes(spark, rel) + targetFileBytes - 1) / targetFileBytes).toInt
    relayoutWith(spark, name, parts,
      _.repartitionByRange(n, keys: _*).sortWithinPartitions(keys: _*))
  }

  /** Multi-dimension clustered rewrite — the OPTIMIZE ZORDER analog: map
    * each clustering column onto a `bits`-bit integer index by LINEAR
    * min–max scaling (the metadata-plane normalization production layout
    * optimizers use), interleave the index bits into one Z-value, and
    * range-partition + sort the table by it. Points close in EVERY
    * dimension land in the same file, so per-file min/max footers prune
    * multi-predicate scans on ALL clustered columns — where a plain
    * lexicographic sort ([[optimizeLayout]]) prunes only its leading
    * column and leaves every other dimension spanning the full range in
    * every file.
    *
    * Scale shape: one min/max aggregate per rewrite (metadata plane),
    * then the same range-partition shuffle + in-partition sort any
    * layout rewrite pays; the Z-value is a scan-local integer
    * expression (bits·dims shift-mask-or terms, whole-stage codegen)
    * and is DROPPED before write — the layout changes, the schema
    * doesn't. Linear scaling assumes roughly uniform value spread;
    * heavily skewed dimensions want a quantile-based index instead
    * (same interleave, different bucketing).
    */
  def zOrderLayout(spark: SparkSession, name: String, zCols: Seq[String],
      targetFileBytes: Long = 128L << 20, bits: Int = 16): Unit = {
    require(zCols.size >= 2,
      "zOrderLayout needs >= 2 columns (one column is optimizeLayout)")
    require(bits * zCols.size <= 63,
      s"bits ($bits) * dims (${zCols.size}) must fit a signed long")
    val rel = Relation.parse(name)
    val parts = partitionColumnNames(spark, rel)
    require(zCols.forall(c => !parts.contains(c)),
      "z-order columns must not be partition columns")
    val n = math.max(1L,
      (dataBytes(spark, rel) + targetFileBytes - 1) / targetFileBytes).toInt
    relayoutWith(spark, name, parts, { df =>
      val span = (1L << bits) - 1
      // Per-dimension bounds: one aggregate row (metadata plane).
      val bounds = df.agg(
        zCols.flatMap(c => Seq(min(col(c).cast("double")),
          max(col(c).cast("double")))).head,
        zCols.flatMap(c => Seq(min(col(c).cast("double")),
          max(col(c).cast("double")))).tail: _*).head()
      val idx = zCols.zipWithIndex.map { case (c, i) =>
        // An entirely-null (or empty-table) dimension has no bounds to
        // scale into — fail loudly rather than NPE out of Row.getDouble
        // or silently cluster on garbage. Individual null VALUES yield a
        // null Z-value and sort together at the range's null end — a
        // defined, prune-friendly placement.
        require(!bounds.isNullAt(2 * i),
          s"z-order column '$c' has no non-null values to scale")
        val (lo, hi) = (bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
        if (hi > lo)
          floor((col(c).cast("double") - lit(lo)) * span / lit(hi - lo))
            .cast("long")
        else lit(0L)
      }
      val d = zCols.size
      val z = (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
        idx.zipWithIndex.foldLeft(acc) { case (a, (ix, i)) =>
          a + shiftleft(shiftright(ix, b).bitwiseAND(lit(1L)), b * d + i)
        }
      }
      df.withColumn("__z", z)
        .repartitionByRange(n, col("__z"))
        .sortWithinPartitions(col("__z"))
        .drop("__z")
    })
  }

  private def partitionColumnNames(spark: SparkSession, rel: Relation): Seq[String] = {
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(
      rel.identifier, Option(rel.schema).filter(_.nonEmpty))
    spark.sessionState.catalog.getTableMetadata(ident).partitionColumnNames
  }

  /** The table's data files (path, bytes) from a recursive listing —
    * metadata-scale; drives file-count sizing and the layout specs.
    */
  private[graft] def dataFiles(spark: SparkSession, name: String): Seq[(String, Long)] = {
    val rel = Relation.parse(name)
    tableLocation(spark, rel).toSeq.flatMap { l =>
      val p = new org.apache.hadoop.fs.Path(l)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Nil
      else {
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        while (it.hasNext) {
          val f = it.next()
          val base = f.getPath.getName
          if (!base.startsWith("_") && !base.startsWith("."))
            buf += ((f.getPath.toString, f.getLen))
        }
        buf.toSeq
      }
    }
  }

  private def dataBytes(spark: SparkSession, rel: Relation): Long =
    dataFiles(spark, rel.name).map(_._2).sum

  /** O9: discover partitions written out-of-band (impl.py:771-773). */
  def repair(spark: SparkSession, name: String): Unit =
    spark.sql(s"MSCK REPAIR TABLE ${Relation.parse(name).quoted}")

  private[graft] def repairIfPartitioned(spark: SparkSession, rel: Relation): Unit = {
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(
      rel.identifier, Option(rel.schema).filter(_.nonEmpty))
    if (spark.sessionState.catalog.getTableMetadata(ident)
        .partitionColumnNames.nonEmpty)
      repair(spark, rel.name)
  }

  /** O11: post-write verification select (impl.py:209,707,1039). */
  def verifyReadable(spark: SparkSession, name: String): Boolean =
    spark.table(Relation.parse(name).quoted).limit(1).count() >= 0
}

/** S8: the Python-model analog (reference
  * macros/materializations/python/python_utils.sql:1-277 + impl.py:1137-1288)
  * — a user-supplied transform routed through the standard materializations.
  * In the reference the "model" is arbitrary PySpark receiving a `dbt` ctx
  * and the session; here it is any `(ModelCtx, SparkSession) => DataFrame`.
  */
final case class ModelCtx(
    spark: SparkSession,
    dataDir: String,
    config: Map[String, String] = Map.empty) {
  /** dbtObj.source analog: a raw input table by name. */
  def source(name: String): DataFrame = graft.core.Tables.load(spark, dataDir, name)
  /** dbtObj.ref analog: a previously materialized relation. */
  def ref(name: String): DataFrame = spark.table(Relation.parse(name).quoted)
}

object UserModel {
  type Transform = (ModelCtx, SparkSession) => DataFrame

  /** Table-materialize a user transform (python_utils.sql:86 writer). */
  def runTable(spark: SparkSession, target: String, ctx: ModelCtx,
      model: Transform, partitionBy: Seq[String] = Nil): Unit =
    TableMaterialization.run(spark, target, model(ctx, spark),
      partitionBy = partitionBy)

  /** Incrementally materialize a user transform — the python-model
    * incremental path (incremental.sql:96-108 routes python models through
    * the same strategies). */
  def runIncremental(spark: SparkSession, target: String, ctx: ModelCtx,
      model: Transform, cfg: IncrementalConfig): Unit =
    IncrementalMaterialization.run(spark, target, model(ctx, spark), cfg)
}
