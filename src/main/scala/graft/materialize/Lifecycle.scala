package graft.materialize

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.core.Relation

/** Model contracts — dbt's `contract: enforced` as applied by the
  * reference's table materialization (table.sql:39 `persist_constraints`,
  * inherited from dbt-spark). A contracted model declares its output
  * schema (ordered column names + types) and column constraints
  * (`not_null`, `check`); the build FAILS — loudly, before anything is
  * written — when the produced frame deviates. Spark tables cannot
  * enforce constraints at the storage layer (parquet has no CHECK), so
  * the adapter's behavior is compile/run-time validation: schema shape is
  * checked against the plan (metadata-only), constraints are checked with
  * ONE aggregate pass over the data (all violation counts in a single
  * job — no per-constraint scans), and only a fully-conforming frame
  * reaches the writer.
  *
  * Scale shape: the schema check is driver-side metadata; the constraint
  * scan is a map-side-combinable global aggregate over only the
  * constrained columns (column-pruned), so at 100 TB it costs one pass of
  * the constrained subset — the price of a guarantee the lakehouse
  * formats charge identically (Delta CHECK constraints scan on write).
  */
object Contracts {

  /** One contracted column: `dataType` is Spark DDL ("bigint", "double",
    * "decimal(18,2)"); `check` is a boolean SQL expression over the row
    * (dbt `constraints: [{type: check, expression: ...}]`).
    */
  final case class ColumnSpec(
      name: String,
      dataType: String,
      notNull: Boolean = false,
      check: Option[String] = None)

  /** Validate `df` against the contract; returns the frame with columns
    * reordered to contract order (dbt reorders to the declared contract —
    * column ORDER in the produced select is free, names/types are not).
    * Throws IllegalStateException tagged CONTRACT_* on any deviation.
    */
  def enforce(df: DataFrame, contract: Seq[ColumnSpec]): DataFrame = {
    val ordered = validateShape(df, contract)
    checkConstraints(ordered, contract)
    ordered
  }

  /** Driver-side (metadata-only) half of the contract: column set, types,
    * contract-order reprojection. Throws CONTRACT_COLUMNS_MISMATCH /
    * CONTRACT_TYPE_MISMATCH; never runs a job.
    */
  private def validateShape(df: DataFrame,
      contract: Seq[ColumnSpec]): DataFrame = {
    require(contract.nonEmpty, "empty contract")
    val declared = contract.map(_.name)
    val produced = df.columns.toSeq
    val missing = declared.diff(produced)
    val unexpected = produced.diff(declared)
    if (missing.nonEmpty || unexpected.nonEmpty)
      throw new IllegalStateException(
        s"CONTRACT_COLUMNS_MISMATCH: missing=${missing.mkString(",")} " +
          s"unexpected=${unexpected.mkString(",")}")
    val actualTypes = df.schema.map(f => f.name -> f.dataType).toMap
    val typeErrors = contract.flatMap { c =>
      val want = DataType.fromDDL(c.dataType)
      val got = actualTypes(c.name)
      if (got != want) Some(s"${c.name}: expected ${want.sql} got ${got.sql}")
      else None
    }
    if (typeErrors.nonEmpty)
      throw new IllegalStateException(
        s"CONTRACT_TYPE_MISMATCH: ${typeErrors.mkString("; ")}")
    df.select(declared.map(col): _*)
  }

  /** Data half of the contract: all constraint violation counts in ONE
    * aggregate job. sum(cond) on a boolean needs an int cast; count(when)
    * skips nulls — use the latter so a NULL check-expression result counts
    * as a violation only for not_null (CHECK follows SQL semantics: NULL
    * passes). Throws CONTRACT_CONSTRAINT_VIOLATION.
    */
  private def checkConstraints(df: DataFrame,
      contract: Seq[ColumnSpec]): Unit = {
    val probes = contract.flatMap { c =>
      val nn = if (c.notNull)
        Seq(count(when(col(c.name).isNull, lit(1)))
          .as(s"not_null:${c.name}")) else Nil
      val ck = c.check.map(e =>
        count(when(!expr(e), lit(1))).as(s"check:${c.name}")).toSeq
      nn ++ ck
    }
    if (probes.nonEmpty) {
      val row = df.agg(probes.head, probes.tail: _*).head()
      val violated = row.schema.fieldNames.zipWithIndex
        .map { case (n, i) => n -> row.getLong(i) }
        .filter(_._2 > 0)
      if (violated.nonEmpty)
        throw new IllegalStateException("CONTRACT_CONSTRAINT_VIOLATION: " +
          violated.map { case (n, c) => s"$n ($c rows)" }.mkString("; "))
    }
  }

  /** Contract-enforced table build, single-evaluation: validate the shape
    * driver-side, CTAS into a STAGING table, run the constraint scan over
    * the staged (materialized) data, then rename into place. Validating
    * the lazy frame and then CTAS-ing it evaluated the model TWICE — a
    * source changing between the passes (or a nondeterministic
    * expression) could pass validation yet write contract-violating rows;
    * here the scan and the final table read the same parquet bytes. The
    * target name never exists on a failed build (staging is dropped), and
    * the model is evaluated exactly once at any scale — the constraint
    * scan re-reads only the constrained columns, column-pruned, from
    * what was written. The commit mirrors [[RelationOps]]'s rename-aside
    * relayout: the current target renames ASIDE (never dropped first), the
    * stage renames in, then the aside copy drops — so the original DATA
    * survives every failure window (the name itself is briefly unbound
    * between the two renames: a concurrent reader can see
    * TABLE_OR_VIEW_NOT_FOUND, and a crash inside that window parks the
    * data under the aside name for manual rename-back — never loses it).
    * A failure in the rename-in window restores the original and rethrows
    * (FaultInjectionSpec injects into exactly that window). The one
    * un-asided case is a target currently bound to a VIEW: views are
    * definition-only (no data to lose), so the view is dropped outright
    * before the rename-in — and because nothing can be restored on that
    * path, a rename-in failure there PRESERVES the staged build as the
    * named recovery artifact instead of dropping it.
    */
  def materialize(spark: SparkSession, table: String, df: DataFrame,
      contract: Seq[ColumnSpec],
      partitionBy: Seq[String] = Nil): Unit = {
    val ordered = validateShape(df, contract)
    val rel = Relation.parse(table)
    val stage = Relation.sibling(table, "__contract_stage")
    val aside = Relation.sibling(table, "__contract_old")
    // run() performs its own type-aware drop + orphan-location self-heal
    // for the staging name — no separate pre-drop needed.
    TableMaterialization.run(spark, stage.name, ordered,
      partitionBy = partitionBy)
    try checkConstraints(spark.table(stage.quoted), contract)
    catch { case e: Throwable =>
      spark.sql(s"DROP TABLE IF EXISTS ${stage.quoted}")
      throw e
    }
    // Move the current target ASIDE instead of dropping it: the data
    // survives every failure window of the commit below. A target bound
    // to a VIEW can't rename via ALTER TABLE (and has no directory to
    // preserve) — type-aware drop it like the CTAS path does.
    val asideMade =
      if (!spark.catalog.tableExists(rel.quoted)) false
      else {
        if (TableMaterialization.isViewLike(spark, rel)) {
          spark.sql(s"DROP VIEW IF EXISTS ${rel.quoted}")
          false
        } else {
          TableMaterialization.dropExisting(spark, aside)
          // An orphan directory AT THE ASIDE's default path (a crash
          // between a previous aside drop's catalog removal and its
          // directory delete) has no catalog entry for dropExisting to
          // clear and would fail this rename forever — same self-heal the
          // target and stage locations already get.
          TableMaterialization.clearOrphanLocation(spark, aside)
          RelationOps.rename(spark, table, aside.name)
          // No partition repair on the aside here, deliberately: the aside
          // is only ever READ on the restore path, which renames it back
          // and repairs then. Under the hive catalog a managed-table
          // rename re-points partition locations itself (probe-verified:
          // both the table and every partition track the moved directory,
          // and the renamed table reads its rows — HiveFormatSpec pins the
          // full partitioned re-materialization end-to-end), and the
          // in-memory catalog's drop removes only the table's own
          // directory — so the success-path drop below never touches the
          // committed table's data, and an MSCK here (a full directory
          // listing per commit) would buy nothing.
          true
        }
      }
    try {
      // The rename moves the staging table's managed directory onto the
      // target's default location — an orphan directory there (a previous
      // crashed write with no catalog entry) would fail the rename
      // forever. The aside rename above moved a live target's directory
      // away, so anything still at the default path is by definition an
      // orphan. Inside the try: the name is already unbound here, so a
      // filesystem failure in the clear must take the same restore /
      // named-artifact path as a rename-in failure — outside it, a
      // transient IOException would strand the commit with the original
      // parked under the aside name and no recovery message.
      TableMaterialization.clearOrphanLocation(spark, rel)
      graft.core.Failpoints.check("contract.rename_in")
      RelationOps.rename(spark, stage.name, table)
    } catch { case e: Throwable =>
      if (asideMade) {
        // Restore the original under the target name (rename breaks a
        // partitioned table's per-partition locations both ways — repair),
        // and retire the stage: the build is reproducible and the
        // original is intact, so nothing is lost. The restore itself can
        // fail (the same filesystem that just failed the rename-in) — in
        // that window the original data is parked under the aside name and
        // the validated build under the stage name, and the error MUST say
        // so, with the original failure as cause, or the operator has no
        // recovery pointer.
        try RelationOps.rename(spark, aside.name, table)
        catch { case restoreFailure: Throwable =>
          val ise = new IllegalStateException(
            s"contract commit for ${rel.quoted} failed AND the restore " +
              s"rename failed (${restoreFailure.getMessage}); the original " +
              s"data is preserved at ${aside.quoted} and the validated " +
              s"build at ${stage.quoted} — rename either into place to " +
              s"recover", e)
          ise.addSuppressed(restoreFailure)
          throw ise
        }
        // The rename-back SUCCEEDED: the original is bound to the target
        // name again, so the aside-pointer message above would now be a
        // lie — repair/cleanup failures ride the ORIGINAL error as
        // suppressed context instead.
        try {
          RelationOps.repairIfPartitioned(spark, rel)
          spark.sql(s"DROP TABLE IF EXISTS ${stage.quoted}")
        } catch { case cleanupFailure: Throwable =>
          e.addSuppressed(cleanupFailure)
        }
        throw e
      } else {
        // Nothing to restore — the target was a view (already dropped) or
        // absent, so the staged build is the ONLY copy of the validated
        // data. Keep it as the named recovery artifact; destroying it
        // here would turn a transient rename failure into total loss.
        throw new IllegalStateException(
          s"contract commit for ${rel.quoted} failed after the target " +
            s"name was unbound; the validated build is preserved at " +
            s"${stage.quoted} — rename it into place to recover", e)
      }
    }
    // A partitioned staging table's catalog partition entries still point
    // under the staging directory after the rename — re-discover them
    // (metadata-only), or the contracted table reads empty.
    RelationOps.repairIfPartitioned(spark, rel)
    if (asideMade) spark.sql(s"DROP TABLE IF EXISTS ${aside.quoted}")
  }
}

/** Pre/post hooks — the reference brackets every materialization with
  * `run_hooks(pre_hooks)` / `run_hooks(post_hooks)` (table.sql:11,48;
  * incremental.sql:44,122; snapshot.sql:146-223; seed.sql:19). Hooks are
  * arbitrary SQL statements (audit inserts, GRANTs, ANALYZE) executed in
  * declaration order; a failing pre-hook aborts the model (nothing
  * materializes), a failing post-hook fails the run AFTER the model built
  * (dbt marks the node errored but the table exists — same here).
  *
  * `{{ this }}` is the one template variable worth its cost in-process:
  * hooks routinely reference the relation they decorate, and the caller
  * does not know scratch-database names up front.
  */
object Hooks {

  /** Substitute `{{ this }}` with the target relation name. */
  private def render(sql: String, table: String): String =
    sql.replace("{{ this }}", table)

  def runAll(spark: SparkSession, hooks: Seq[String], table: String): Unit =
    hooks.foreach { h =>
      try spark.sql(render(h, table))
      catch {
        case e: Throwable =>
          throw new IllegalStateException(
            s"HOOK_FAILED: ${render(h, table)}: ${e.getMessage}", e)
      }
    }

  /** Table materialization with the reference's hook bracketing. */
  def materializeWithHooks(spark: SparkSession, table: String, df: DataFrame,
      preHooks: Seq[String] = Nil, postHooks: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil): Unit = {
    runAll(spark, preHooks, table)
    TableMaterialization.run(spark, table, df, partitionBy = partitionBy)
    runAll(spark, postHooks, table)
  }
}
