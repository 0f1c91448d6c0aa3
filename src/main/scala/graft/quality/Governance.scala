package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Relation

/** LF-style governance plane (SURVEY §2.8 C6/C7, §2.2 F6 — reference
  * dbt/adapters/glue/lakeformation.py).
  *
  * The reference manages Lake Formation tags (lakeformation.py:21-164) and
  * data-cell filters — a row predicate plus a column include list enforced
  * at the catalog (lakeformation.py:167-204, `FilterConfig.to_api_repr`).
  * In-process the same contract maps to:
  *   - tags → table properties under a `graft.tag.` prefix (diff-based
  *     add/remove like the reference's update path)
  *   - data-cell filters → a secured VIEW rewriting the relation to
  *     `SELECT <allowed cols> WHERE <row filter>` — readers query the view,
  *     never the base table
  */
object Governance {

  /** Right-to-be-forgotten propagation: rewrite `table` without any row
    * whose `keyCol` appears in `keys` — the erasure primitive a GDPR/CCPA
    * deletion request drives across a base table and every derived table
    * keyed by the same subject. Returns (nBefore, nPurged, nAfter).
    *
    * Mechanics: the deletion list is small by nature (one row per
    * requesting subject) → broadcast anti-join, so the rewrite is one
    * scan of the table with no shuffle. Survivors are staged to a DURABLE
    * sibling table first, and only then overwrite the target (a
    * checkpoint-only formulation held the sole copy of the survivors in
    * executor blocks across the truncate — an executor loss mid-overwrite
    * destroyed the whole table, a severe failure mode for a
    * compliance-grade primitive). If the overwrite itself fails, the
    * staging table is deliberately LEFT IN PLACE as the recovery copy and
    * the error says so. The staging write also cuts the target's scan out
    * of the insert's lineage (an INSERT whose source still reads the
    * target is rejected by Spark — the rolling-ledger lesson). The insert
    * runs under STATIC partition-overwrite: under the session's default
    * dynamic mode a partition whose every row was erased would be
    * silently left intact, which for erasure is not an optimization but a
    * compliance bug. At lakehouse scale the same call maps onto
    * format-native DELETE WHERE; this is the parquet-table analog.
    */
  def eraseKeys(spark: SparkSession, table: String, keyCol: String,
      keys: DataFrame): (Long, Long, Long) = {
    require(keys.columns.length == 1,
      s"keys must be a single-column frame, got ${keys.columns.mkString(",")}")
    val stage = Relation.sibling(table, "__erase_stage")
    // A live staging table means a PREVIOUS erasure died mid-overwrite and
    // the stage is the only trustworthy copy of that erasure's survivors —
    // the target may be truncated or partial. Re-running eraseKeys here
    // would rebuild the stage FROM that damaged target, silently
    // destroying the recovery copy while appearing to succeed with fewer
    // rows. Fail fast and route the caller to [[recoverErasure]].
    if (spark.catalog.tableExists(stage.quoted))
      throw new IllegalStateException(
        s"erasure recovery stage ${stage.name} exists — a previous erasure " +
          s"of $table failed mid-overwrite and the stage holds the only " +
          s"sound copy of its survivors; call Governance.recoverErasure(" +
          s"spark, \"$table\") to restore before erasing again")
    val target = spark.table(table)
    val nBefore = target.count()
    val keyFrame = keys.toDF(keyCol).distinct()
    // Stage through the CTAS materialization, not a raw saveAsTable: it
    // type-aware-drops a staging name bound to a view AND self-heals an
    // orphan staging directory (a crash mid-staging-write would
    // otherwise brick every future erase of this table with
    // LOCATION_ALREADY_EXISTS — no catalog entry for DROP to clear).
    graft.materialize.TableMaterialization.run(spark, stage.name, target
      .join(broadcast(keyFrame), Seq(keyCol), "left_anti")
      .select(target.columns.map(col): _*))
    try
      graft.core.Engine.withConf(spark,
        Map("spark.sql.sources.partitionOverwriteMode" -> "static")) {
        graft.core.Failpoints.check("erase.overwrite")
        spark.table(stage.quoted).write.mode("overwrite").insertInto(table)
      }
    catch { case e: Throwable =>
      throw new IllegalStateException(
        s"erasure overwrite of $table failed mid-rewrite; survivors are " +
          s"preserved in staging table ${stage.name} — call " +
          s"Governance.recoverErasure(spark, \"$table\") to restore", e)
    }
    spark.sql(s"DROP TABLE IF EXISTS ${stage.quoted}")
    spark.catalog.refreshTable(table)
    val nAfter = spark.table(table).count()
    (nBefore, nBefore - nAfter, nAfter)
  }

  /** Recovery half of [[eraseKeys]]: re-run the overwrite from a staging
    * table a failed erasure left behind, then retire the stage. Safe to
    * call repeatedly — the stage is dropped only after the insert
    * succeeds, so a recovery that itself dies mid-overwrite leaves the
    * stage in place for the next attempt. Returns the restored row count.
    */
  def recoverErasure(spark: SparkSession, table: String): Long = {
    val stage = Relation.sibling(table, "__erase_stage")
    require(spark.catalog.tableExists(stage.quoted),
      s"no erasure recovery stage for $table (${stage.name} does not exist)")
    graft.core.Engine.withConf(spark,
      Map("spark.sql.sources.partitionOverwriteMode" -> "static")) {
      spark.table(stage.quoted).write.mode("overwrite").insertInto(table)
    }
    spark.sql(s"DROP TABLE IF EXISTS ${stage.quoted}")
    spark.catalog.refreshTable(table)
    spark.table(table).count()
  }

  /** C7: a data-cell filter — mirrors FilterConfig (lakeformation.py:167):
    * `rowFilter` is a SQL predicate ("true" = all rows); `includeColumns`
    * the visible columns (empty = all).
    */
  final case class CellFilter(rowFilter: String = "true",
      includeColumns: Seq[String] = Nil)

  /** C7: enforce a cell filter as a secured view over `table`. */
  def createSecuredView(spark: SparkSession, table: String, view: String,
      filter: CellFilter): Unit = {
    val cols =
      if (filter.includeColumns.isEmpty) "*"
      else filter.includeColumns.map(c => s"`$c`").mkString(", ")
    spark.sql(
      s"""CREATE OR REPLACE VIEW ${Relation.parse(view).quoted} AS
         |SELECT $cols FROM ${Relation.parse(table).quoted}
         |WHERE ${filter.rowFilter}""".stripMargin)
  }

  /** F6: the same filter applied inline to a DataFrame. */
  def applyFilter(df: DataFrame, filter: CellFilter): DataFrame = {
    val filtered = df.filter(expr(filter.rowFilter))
    if (filter.includeColumns.isEmpty) filtered
    else filtered.select(filter.includeColumns.map(col): _*)
  }

  private val TagPrefix = "graft.tag."

  /** C6: set tags (diff-based like lakeformation.py:62-118 — existing tags
    * not in `tags` are left alone; use [[removeTags]] to drop). */
  def setTags(spark: SparkSession, table: String, tags: Map[String, String]): Unit =
    if (tags.nonEmpty) {
      // Keys and values are caller data — they only enter the DDL as escaped
      // literals (a tag value containing ' must not break the statement).
      val props = tags
        .map { case (k, v) =>
          s"${Relation.sqlLiteral(TagPrefix + k)} = ${Relation.sqlLiteral(v)}"
        }.mkString(", ")
      spark.sql(s"ALTER TABLE ${Relation.parse(table).quoted} SET TBLPROPERTIES ($props)")
    }

  def removeTags(spark: SparkSession, table: String, keys: Seq[String]): Unit =
    if (keys.nonEmpty) {
      val props = keys.map(k => Relation.sqlLiteral(TagPrefix + k)).mkString(", ")
      spark.sql(
        s"ALTER TABLE ${Relation.parse(table).quoted} UNSET TBLPROPERTIES IF EXISTS ($props)")
    }

  /** All raw TBLPROPERTIES on a relation (metadata-scale read). */
  def tableProperties(spark: SparkSession, table: String): Map[String, String] =
    spark.sql(s"SHOW TBLPROPERTIES ${Relation.parse(table).quoted}")
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap

  /** C6: read back the tags on a relation. */
  def tags(spark: SparkSession, table: String): Map[String, String] =
    tableProperties(spark, table)
      .collect { case (k, v) if k.startsWith(TagPrefix) =>
        k.stripPrefix(TagPrefix) -> v
      }.toMap

  // ------------------------------------------------------- principal plane

  private val FilterPrefix = "graft.filter."
  private val GrantPrefix = "graft.grant."

  final case class GrantDiff(added: Map[String, String],
      revoked: Map[String, String])

  private def props(spark: SparkSession, table: String,
      prefix: String): Map[String, String] =
    spark.sql(s"SHOW TBLPROPERTIES ${Relation.parse(table).quoted}")
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .collect { case (k, v) if k.startsWith(prefix) =>
        k.stripPrefix(prefix) -> v
      }.toMap

  private def setProps(spark: SparkSession, table: String,
      kv: Map[String, String]): Unit =
    if (kv.nonEmpty) {
      val rendered = kv.map { case (k, v) =>
        s"${Relation.sqlLiteral(k)} = ${Relation.sqlLiteral(v)}"
      }.mkString(", ")
      spark.sql(
        s"ALTER TABLE ${Relation.parse(table).quoted} SET TBLPROPERTIES ($rendered)")
    }

  private def unsetProps(spark: SparkSession, table: String,
      keys: Seq[String]): Unit =
    if (keys.nonEmpty) {
      val rendered = keys.map(Relation.sqlLiteral).mkString(", ")
      spark.sql(s"ALTER TABLE ${Relation.parse(table).quoted} " +
        s"UNSET TBLPROPERTIES IF EXISTS ($rendered)")
    }

  /** C7: register a NAMED data-cell filter on a relation (the reference
    * creates/updates it via the LF API — lakeformation.py:167-204; here the
    * definition is catalog-backed table metadata, so any session can
    * enforce it).
    */
  def defineFilter(spark: SparkSession, table: String, name: String,
      filter: CellFilter): Unit =
    setProps(spark, table, Map(
      s"$name.row" -> filter.rowFilter,
      s"$name.cols" -> filter.includeColumns.mkString(","))
      .map { case (k, v) => (FilterPrefix + k, v) })

  /** C7: read a named filter's definition back from the catalog. */
  def filterDef(spark: SparkSession, table: String, name: String): CellFilter = {
    val all = props(spark, table, FilterPrefix)
    val row = all.getOrElse(s"$name.row",
      throw new IllegalArgumentException(s"no filter '$name' on $table"))
    val cols = all.getOrElse(s"$name.cols", "")
    CellFilter(row, cols.split(",").filter(_.nonEmpty).toSeq)
  }

  /** C7 principal plane (reference lakeformation.py:207-333 — diff-based
    * grant/revoke of SELECT per principal on data-cell filters): make the
    * catalog's grants match `desired` (principal → filter name). Grants
    * already in place are left alone; principals absent from `desired` are
    * revoked. Returns the applied diff, like the reference's
    * `to_add`/`to_revoke` bookkeeping.
    */
  def applyGrants(spark: SparkSession, table: String,
      desired: Map[String, String]): GrantDiff = {
    val current = grants(spark, table)
    val toAdd = desired.filter { case (p, f) => !current.get(p).contains(f) }
    val toRevoke = current.filter { case (p, _) => !desired.contains(p) }
    setProps(spark, table, toAdd.map { case (p, f) => (GrantPrefix + p, f) })
    unsetProps(spark, table, toRevoke.keys.map(GrantPrefix + _).toSeq)
    GrantDiff(toAdd, toRevoke)
  }

  /** C7: current grants (principal → filter name) on a relation. */
  def grants(spark: SparkSession, table: String): Map[String, String] =
    props(spark, table, GrantPrefix)

  /** C7 enforcement: `principal` reads `table` through its granted cell
    * filter; a principal with no grant is denied (the reference delegates
    * this to Lake Formation at query time).
    */
  def readFor(spark: SparkSession, table: String, principal: String): DataFrame = {
    val filterName = grants(spark, table).getOrElse(principal,
      throw new SecurityException(
        s"principal '$principal' has no grant on $table"))
    applyFilter(spark.table(Relation.parse(table).quoted),
      filterDef(spark, table, filterName))
  }
}
