package graft.materialize

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

import graft.core.Relation

/** Staging locations for the merge/snapshot swap writes.
  *
  * These MUST live on storage every executor can reach: executors write the
  * staging parquet, the driver then re-reads it. A driver-local
  * `Files.createTempDirectory` path works on local[N] but silently corrupts
  * on a real cluster (each executor would write to its own local disk), so
  * staging goes under `spark.sql.warehouse.dir` — shared storage wherever
  * the warehouse itself is usable.
  */
object Staging {
  def withDir[T](spark: SparkSession, tag: String)(f: String => T): T = {
    val dir = newDir(spark, tag)
    try f(dir)
    finally delete(spark, dir)
  }

  private def newDir(spark: SparkSession, tag: String): String = {
    val warehouse = spark.conf.get(
      "spark.sql.warehouse.dir").stripSuffix("/")
    s"$warehouse/_graft_staging/${tag}_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(12)
  }

  private def fsOf(spark: SparkSession, path: org.apache.hadoop.fs.Path) =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def delete(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    fsOf(spark, p).delete(p, true)
  }

  // ---------------------------------------------------------------------
  // Staged commit: the stage-then-overwrite discipline with a crash-window
  // recovery contract (the same contract eraseKeys carries, generalized).
  //
  // Four writers (unpartitioned merge, partition-scoped merge, and both
  // snapshot paths) materialize their result to a staging directory and
  // then destructively overwrite the target. Once the overwrite has begun,
  // the staged parquet is the ONLY sound copy of the post-commit content —
  // the pre-commit target rows it was computed from are being destroyed —
  // so a plain `finally delete(staging)` turns any mid-overwrite failure
  // into data loss, and a naive retry re-merges from the damaged target
  // and "succeeds" with wrong rows. stagedCommit instead:
  //   1. fails fast if a recovery artifact for the table already exists
  //      (the eraseKeys retry lesson: never rebuild from a damaged target);
  //   2. writes a sidecar into the staging dir describing how to replay
  //      the commit from the staged content alone, BEFORE touching the
  //      target — the artifact is self-describing;
  //   3. on a commit failure, MOVES the staging dir to a deterministic
  //      per-table recovery location and names it (and the recovery call)
  //      in the error, instead of deleting it;
  //   4. exposes recoverStagedCommit to replay the commit from the
  //      artifact and retire it — safe to re-run until it succeeds.
  // On a lakehouse format the commit would be a metadata-only atomic swap
  // and none of this machinery would exist; this is the parquet analog.
  // ---------------------------------------------------------------------

  /** How to replay the destructive half of a staged commit from the staged
    * parquet content alone. `mode` is `replace_table` (drop-and-recreate
    * via saveAsTable — the whole-table swap) or `dynamic_overwrite`
    * (dynamic-partition INSERT OVERWRITE of exactly the staged partitions,
    * then the recorded partition drops for partitions the operation
    * drained empty). `format = None` preserves the session default. */
  private[graft] final case class CommitSpec(
      mode: String,
      format: Option[String] = None,
      partitionBy: Seq[String] = Nil,
      dropPartitions: Seq[String] = Nil)

  // "_" prefix: invisible to parquet file listing. private[graft]: the
  // vacuum gate and the fault-injection spec plant sidecars to exercise
  // the sweep's protection — they must track a rename of this name.
  private[graft] val Sidecar = "_graft_commit.properties"
  private[graft] def recoveryDir(spark: SparkSession, rel: Relation): String = {
    val warehouse = spark.conf.get(
      "spark.sql.warehouse.dir").stripSuffix("/")
    s"$warehouse/_graft_recovery/${rel.schema}_${rel.identifier}"
  }

  private def writeSpec(spark: SparkSession, dir: String, table: Relation,
      spec: CommitSpec): Unit = {
    val props = new java.util.Properties()
    props.setProperty("table", table.name)
    props.setProperty("mode", spec.mode)
    spec.format.foreach(props.setProperty("format", _))
    // List entries are numbered properties (partitionBy.0, ...) — entries
    // are arbitrary strings (partition VALUES appear in drop specs), so no
    // joining separator is safe; Properties escapes each value on its own.
    def listProps(key: String, vals: Seq[String]): Unit =
      vals.zipWithIndex.foreach { case (v, i) =>
        props.setProperty(s"$key.$i", v)
      }
    listProps("partitionBy", spec.partitionBy)
    listProps("dropPartitions", spec.dropPartitions)
    val p = new org.apache.hadoop.fs.Path(dir, Sidecar)
    val out = fsOf(spark, p).create(p, true)
    try props.store(out, "graft staged-commit replay spec")
    finally out.close()
  }

  private def loadProps(spark: SparkSession,
      dir: String): java.util.Properties = {
    val p = new org.apache.hadoop.fs.Path(dir, Sidecar)
    val fs = fsOf(spark, p)
    require(fs.exists(p),
      s"$dir is not a staged-commit artifact ($Sidecar missing)")
    val in = fs.open(p)
    val props = new java.util.Properties()
    try props.load(in) finally in.close()
    props
  }

  /** The table an artifact was staged FOR, best effort (None when the dir
    * holds no readable sidecar). Used to name the true owner in errors. */
  private def recordedOwner(spark: SparkSession, dir: String): Option[String] =
    try Option(loadProps(spark, dir).getProperty("table"))
    catch { case _: Throwable => None }

  private def readSpec(spark: SparkSession, dir: String,
      table: Relation): CommitSpec = {
    val props = loadProps(spark, dir)
    // The recovery path is keyed by a flattened `schema_identifier` dir
    // name, where `a.b_c` and `a_b.c` collide — the recorded table name is
    // the authority, so a recovery can never replay one table's artifact
    // onto another.
    val recorded = props.getProperty("table")
    require(recorded == table.name,
      s"staged-commit artifact at $dir belongs to table '$recorded', not " +
        s"'${table.name}' — recover it under its own name first")
    def list(k: String): Seq[String] =
      Iterator.from(0).map(i => Option(props.getProperty(s"$k.$i")))
        .takeWhile(_.isDefined).flatten.toSeq
    CommitSpec(props.getProperty("mode"),
      Option(props.getProperty("format")),
      list("partitionBy"), list("dropPartitions"))
  }

  /** Replay the destructive half of a staged commit from `dir` per `spec`.
    * Used by both the in-line commit and crash recovery — one code path,
    * so recovery cannot drift from what the commit would have done. */
  private def replay(spark: SparkSession, rel: Relation, dir: String,
      spec: CommitSpec): Unit = {
    val fresh = spark.read.parquet(dir)
    spec.mode match {
      case "replace_table" =>
        // Replay must land from ANY crash point of the original commit —
        // including "target dropped, managed dir half-written": type-aware
        // drop plus orphan-location self-heal, the same preamble CTAS uses.
        TableMaterialization.dropExisting(spark, rel)
        TableMaterialization.clearOrphanLocation(spark, rel)
        var w = fresh.write.mode(SaveMode.Overwrite)
        spec.format.foreach(f => w = w.format(f))
        if (spec.partitionBy.nonEmpty) w = w.partitionBy(spec.partitionBy: _*)
        w.saveAsTable(rel.quoted)
      case "dynamic_overwrite" =>
        // insertInto is positional — align the staged columns to the
        // target's order (the target still exists in this mode).
        val aligned = fresh.select(
          spark.table(rel.quoted).columns.map(col).toSeq: _*)
        graft.core.Engine.withConf(spark,
          Map("spark.sql.sources.partitionOverwriteMode" -> "dynamic")) {
          aligned.write.mode(SaveMode.Overwrite).insertInto(rel.quoted)
        }
        spec.dropPartitions.foreach { s =>
          spark.sql(s"ALTER TABLE ${rel.quoted} DROP IF EXISTS PARTITION ($s)")
        }
      case other =>
        throw new IllegalArgumentException(s"unknown commit mode '$other'")
    }
    spark.catalog.refreshTable(rel.quoted) // SURVEY §2.5 O8
  }

  /** Stage-then-overwrite with the recovery contract above. `stage` writes
    * the complete post-commit content (for `dynamic_overwrite`: the FULL
    * replacement content of every partition it will touch — nothing may be
    * unioned in from the live target at commit time, the target may be
    * mid-destruction by then) as parquet into the directory it is given
    * and returns the replay spec; everything destructive happens after it
    * returns. */
  /** Resolve what sits at the recovery location: the artifact dir itself,
    * or — when the post-failure rename could not move the staging dir — a
    * POINTER FILE whose single line names the artifact's raw staging path.
    * Either way `fs.exists(recoveryDir)` blocks re-entry. */
  private def resolveArtifact(spark: SparkSession, at: String): String = {
    val p = new org.apache.hadoop.fs.Path(at)
    val fs = fsOf(spark, p)
    if (fs.exists(p) && fs.getFileStatus(p).isFile) {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try in.readFully(buf) finally in.close()
      new String(buf, java.nio.charset.StandardCharsets.UTF_8).trim
    } else at
  }

  private[graft] def stagedCommit(spark: SparkSession, rel: Relation,
      tag: String)(stage: String => CommitSpec): Unit = {
    val rec = recoveryDir(spark, rel)
    val recPath = new org.apache.hadoop.fs.Path(rec)
    val fs = fsOf(spark, recPath)
    if (fs.exists(recPath)) {
      // The flattened dir name can collide across tables (`a.b_c` vs
      // `a_b.c`) — name the artifact's RECORDED owner so the operator
      // recovers the right table on the first try.
      val owner = recordedOwner(spark, resolveArtifact(spark, rec))
        .getOrElse(rel.name)
      throw new IllegalStateException(
        s"pending staged-commit recovery artifact at $rec (recorded owner: " +
          s"'$owner') — a previous commit died mid-overwrite and the " +
          "artifact holds the only sound copy of its result (the owner " +
          "table may be truncated); call Staging.recoverStagedCommit(" +
          s"""spark, "$owner") to finish that commit before mutating """ +
          "this table again")
    }
    val dir = newDir(spark, tag)
    val spec =
      try {
        val s = stage(dir)
        writeSpec(spark, dir, rel, s)
        s
      } catch { case e: Throwable =>
        // Nothing destructive has run — the staging content is worthless.
        delete(spark, dir); throw e
      }
    try {
      graft.core.Failpoints.check("staged.commit")
      replay(spark, rel, dir, spec)
    } catch { case e: Throwable =>
      // The staged dir is now the only sound copy — move it to the named
      // recovery location (never delete). If the rename itself fails, PLANT
      // A POINTER FILE at the recovery location naming the raw path, so the
      // fail-fast re-entry gate still blocks the retry that would re-merge
      // from the damaged target; only if even that fails does the error
      // fall back to naming the raw path alone.
      val at =
        try {
          graft.core.Failpoints.check("staged.rename_failed")
          fs.mkdirs(recPath.getParent)
          if (fs.rename(new org.apache.hadoop.fs.Path(dir), recPath)) rec
          else throw new java.io.IOException(s"rename $dir -> $rec refused")
        } catch { case _: Throwable =>
          try {
            val out = fs.create(recPath, false)
            try out.write(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally out.close()
            rec
          } catch { case _: Throwable => dir }
        }
      throw new IllegalStateException(
        s"staged commit of ${rel.name} failed mid-overwrite; the complete " +
          s"post-commit content is preserved at $at — call " +
          s"""Staging.recoverStagedCommit(spark, "${rel.name}"""" +
          (if (at == rec) ")" else s""", Some("$dir"))""") +
          " to finish the commit", e)
    }
    delete(spark, dir)
  }

  /** Recovery half of [[stagedCommit]]: replay the interrupted commit from
    * its artifact, then retire the artifact (and its pointer, when the
    * artifact could not be moved and is reached through one). Safe to call
    * repeatedly — retirement happens only after the replay succeeds, so a
    * recovery that itself dies leaves everything in place for the next
    * attempt. */
  def recoverStagedCommit(spark: SparkSession, table: String,
      artifactDir: Option[String] = None): Unit = {
    val rel = Relation.parse(table)
    val at = artifactDir.getOrElse(recoveryDir(spark, rel))
    val p = new org.apache.hadoop.fs.Path(at)
    require(fsOf(spark, p).exists(p),
      s"no staged-commit recovery artifact for $table ($at does not exist)")
    val dir = resolveArtifact(spark, at)
    replay(spark, rel, dir, readSpec(spark, dir, rel))
    delete(spark, dir)
    if (dir != at) delete(spark, at) // retire the pointer too
  }

  /** O10 analog (the reference's iceberg `expire_snapshots`/vacuum,
    * impl.py:1053-1085, re-expressed for the parquet staging discipline):
    * sweep ABANDONED staging directories under `_graft_staging` whose
    * modification time is older than `retentionMs`. A JVM that dies
    * between [[withDir]]'s newDir and its scoped delete — or between
    * [[stagedCommit]]'s staging write and its commit — leaves a dir
    * behind; once nothing references it, its content is worthless and it
    * accumulates forever (the orphan class this module's crash-recovery
    * contracts deliberately create).
    *
    * NEVER touched, by construction:
    *   - anything under `_graft_recovery` — a pending artifact is the
    *     ONLY sound copy of a failed commit's result (the sweep does not
    *     even list that tree for deletion);
    *   - any staging dir a recovery POINTER FILE references (the
    *     rename-failed case: the artifact physically still lives in the
    *     staging area and only the pointer marks it) — protected
    *     regardless of age;
    *   - any staging dir CONTAINING a commit sidecar — a staged commit
    *     writes the sidecar before anything destructive runs and deletes
    *     the dir only after success, so a sidecar'd dir left in staging
    *     is a commit that died mid-replay (JVM death skips the catch
    *     block entirely) or whose recovery rename AND pointer write both
    *     failed: in every such case it may be the ONLY sound copy of the
    *     commit's result, whatever its age;
    *   - anything younger than the retention window, where age is the
    *     newest touch among the dir AND its direct children (an in-flight
    *     PARTITIONED staging write bumps partition-subdir mtimes, not the
    *     staging dir's own — see the in-body comment for the multi-level
    *     caveat on custom retention windows).
    *
    * Returns the paths actually removed (a delete the filesystem refused
    * is excluded, not reported as reclaimed). Listing is two shallow
    * directory scans plus one per expired candidate — metadata-scale at
    * any table count.
    */
  def vacuumOrphans(spark: SparkSession,
      retentionMs: Long = 7L * 24 * 3600 * 1000): Seq[String] = {
    val warehouse = spark.conf.get(
      "spark.sql.warehouse.dir").stripSuffix("/")
    val stagingRoot = new org.apache.hadoop.fs.Path(s"$warehouse/_graft_staging")
    val recoveryRoot = new org.apache.hadoop.fs.Path(s"$warehouse/_graft_recovery")
    val fs = fsOf(spark, stagingRoot)
    // Scheme-insensitive comparison: pointer files record the raw conf-
    // derived path ("file:/..." or "/..."), listStatus returns qualified
    // URIs — compare the URI path component.
    def norm(s: String): String =
      new org.apache.hadoop.fs.Path(s).toUri.getPath
    val referenced: Set[String] =
      if (!fs.exists(recoveryRoot)) Set.empty
      else fs.listStatus(recoveryRoot).toSeq.filter(_.isFile)
        .map(st => norm(resolveArtifact(spark, st.getPath.toString)))
        .toSet
    if (!fs.exists(stagingRoot)) Seq.empty
    else {
      val cutoff = System.currentTimeMillis() - retentionMs
      // Age = the NEWEST touch among the dir and its direct children, not
      // the dir's own mtime: a PARTITIONED staging write streams files into
      // partition subdirs, which bumps the subdirs' mtimes but (on HDFS and
      // local FS alike) not the staging dir's own — judged by root mtime
      // alone, an in-flight write outliving retentionMs could be swept
      // mid-write (spurious commit failure, and the rename-failure fallback
      // could then plant a pointer at a dir this sweep just deleted). One
      // extra shallow listStatus per EXPIRED-by-root-mtime candidate —
      // still metadata-scale. Caveat this cannot close: a MULTI-LEVEL
      // partition layout only bumps the deepest dir, so callers passing a
      // custom retentionMs must keep it comfortably above the longest
      // expected staging write (the 7-day default dwarfs any sane write).
      def newestTouch(st: org.apache.hadoop.fs.FileStatus): Long =
        if (!st.isDirectory) st.getModificationTime
        else (st.getModificationTime +:
          fs.listStatus(st.getPath).toSeq.map(_.getModificationTime)).max
      fs.listStatus(stagingRoot).toSeq
        .filter(_.getModificationTime < cutoff)
        .filterNot(st => referenced.contains(norm(st.getPath.toString)))
        .filterNot(st => st.isDirectory &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, Sidecar)))
        .filter(newestTouch(_) < cutoff)
        // Report only what was ACTUALLY removed: fs.delete returns false on
        // failure, and echoing a failed delete into the result would
        // mislead operators (and tests) into believing the space was
        // reclaimed.
        .flatMap { st =>
          if (fs.delete(st.getPath, true)) Some(st.getPath.toString)
          else None
        }
    }
  }
}

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
      properties: Map[String, String] = Map.empty,
      comment: Option[String] = None,
      columnComments: Map[String, String] = Map.empty): Unit = {
    val rel = Relation.parse(table)
    dropExisting(spark, rel)
    if (location.isEmpty) clearOrphanLocation(spark, rel)
    var w = df.write.format(format).mode(SaveMode.Overwrite)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    bucketBy.foreach { case (n, cols) => w = w.bucketBy(n, cols.head, cols.tail: _*) }
    location.foreach(p => w = w.option("path", p))
    w.saveAsTable(rel.quoted)
    // TBLPROPERTIES are catalog metadata, not writer options (the reference
    // CTAS emits a TBLPROPERTIES clause — adapters.sql:183-186,312-325);
    // the DataFrameWriter API has no properties channel, so they land via
    // ALTER TABLE after the catalog entry exists. Keys/values are caller
    // data and enter the DDL only as escaped literals.
    if (properties.nonEmpty) {
      val clause = properties
        .map { case (k, v) => s"${Relation.sqlLiteral(k)} = ${Relation.sqlLiteral(v)}" }
        .mkString(", ")
      spark.sql(s"ALTER TABLE ${rel.quoted} SET TBLPROPERTIES ($clause)")
    }
    PersistDocs(spark, table, comment, columnComments)
  }

  /** Type-aware pre-materialization drop: Spark 4 raises
    * WRONG_COMMAND_FOR_OBJECT_TYPE when DROP TABLE hits a VIEW (and vice
    * versa) even with IF EXISTS, so the old unconditional
    * DROP TABLE + DROP VIEW pair failed whenever the target name was
    * currently bound to a view. One catalog probe picks the right
    * statement; DROP VIEW also covers temp views.
    */
  /** Is the existing relation bound to a view (incl. temp)? One catalog
    * probe, shared by every type-aware drop/rename dispatch so a future
    * catalog quirk fix lands once. Caller guarantees the relation exists. */
  private[graft] def isViewLike(spark: SparkSession, rel: Relation): Boolean = {
    val kind = spark.catalog.getTable(rel.quoted).tableType
    kind.equalsIgnoreCase("VIEW") || kind.equalsIgnoreCase("TEMPORARY")
  }

  private[graft] def dropExisting(spark: SparkSession, rel: Relation): Unit =
    if (spark.catalog.tableExists(rel.quoted)) {
      if (isViewLike(spark, rel))
        spark.sql(s"DROP VIEW IF EXISTS ${rel.quoted}")
      else spark.sql(s"DROP TABLE IF EXISTS ${rel.quoted}")
    }

  /** Crash recovery: a managed-table directory with no catalog entry (a
    * write died between file output and catalog commit) would otherwise
    * fail CTAS — or a rename-into-place commit — forever with
    * LOCATION_ALREADY_EXISTS. With no catalog entry the default managed
    * path is by definition an orphan — clear it. Shared by the CTAS path
    * and the staged contract build (whose rename moves a managed
    * directory onto the target's default location).
    */
  private[graft] def clearOrphanLocation(spark: SparkSession,
      rel: Relation): Unit = {
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(
      rel.identifier, Option(rel.schema).filter(_.nonEmpty))
    val default = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = default.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(default)) fs.delete(default, true)
  }
}

/** persist_docs: table + column descriptions written to the catalog after
  * materialization (reference table.sql:37 / snapshot.sql:213 calling
  * dbt-spark's default persist_docs — CTAS `comment` clause,
  * adapters.sql:187/403, plus per-column comment ALTERs). Metadata-scale
  * DDL only; comments are caller data and enter the statements as escaped
  * literals.
  */
object PersistDocs {
  def apply(spark: SparkSession, table: String,
      comment: Option[String],
      columnComments: Map[String, String] = Map.empty): Unit = {
    val rel = Relation.parse(table)
    comment.foreach { c =>
      spark.sql(s"COMMENT ON TABLE ${rel.quoted} IS ${Relation.sqlLiteral(c)}")
    }
    columnComments.foreach { case (name, c) =>
      spark.sql(s"ALTER TABLE ${rel.quoted} ALTER COLUMN `${name.replace("`", "``")}` " +
        s"COMMENT ${Relation.sqlLiteral(c)}")
    }
  }

  /** Read back (comment, column comments) — the docs snapshot a catalog
    * crawler / dbt docs generate would see.
    */
  def describe(spark: SparkSession, table: String): (Option[String], Map[String, String]) = {
    val rel = Relation.parse(table)
    val tableComment = spark.sql(s"DESCRIBE TABLE EXTENDED ${rel.quoted}")
      .collect()
      .find(_.getString(0) == "Comment")
      .map(_.getString(1))
    val colComments = spark.table(rel.quoted).schema.fields
      .flatMap(f => f.getComment().map(f.name -> _))
      .toMap
    (tableComment, colComments)
  }
}

object ViewMaterialization {
  /** `create or replace view` from SQL text (reference adapters.sql:253-299),
    * with optional persist_docs: a view-level `COMMENT` clause
    * (adapters.sql:403) and per-column comments via an explicit column list
    * (a view's columns cannot be ALTERed afterwards, so the list is derived
    * from the resolved SELECT schema — resolution only, nothing executes).
    */
  def run(spark: SparkSession, view: String, selectSql: String,
      comment: Option[String] = None,
      columnComments: Map[String, String] = Map.empty): Unit = {
    val colList =
      if (columnComments.isEmpty) ""
      else {
        // Fail loudly on a comment keyed to no output column (typo / stale
        // name) — the table path throws from ALTER COLUMN for the same
        // mistake, and a silently dropped doc never surfaces again.
        val fields = spark.sql(selectSql).schema.fieldNames
        val unknown = columnComments.keys.filterNot(fields.toSet)
        require(unknown.isEmpty,
          s"columnComments reference no output column: ${unknown.mkString(", ")} " +
            s"(view columns: ${fields.mkString(", ")})")
        fields.map { f =>
          val c = columnComments.get(f)
            .map(t => s" COMMENT ${Relation.sqlLiteral(t)}").getOrElse("")
          s"`${f.replace("`", "``")}`$c"
        }.mkString(" (", ", ", ")")
      }
    val commentClause =
      comment.map(c => s" COMMENT ${Relation.sqlLiteral(c)}").getOrElse("")
    spark.sql(s"CREATE OR REPLACE VIEW ${Relation.parse(view).quoted}" +
      s"$colList$commentClause AS $selectSql")
  }

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
    val have = spark.table(Relation.parse(target).quoted)
      .schema.fieldNames.map(_.toLowerCase).toSet
    incoming.schema.fields.toSeq.filterNot(f => have(f.name.toLowerCase))
  }

  /** `ALTER TABLE ... ADD COLUMNS (...)` (SURVEY §2.5 O6). */
  def addColumns(spark: SparkSession, target: String, cols: Seq[StructField]): Unit =
    if (cols.nonEmpty) {
      val ddl = cols.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      spark.sql(s"ALTER TABLE ${Relation.parse(target).quoted} ADD COLUMNS ($ddl)")
    }

  def apply(spark: SparkSession, target: String, incoming: DataFrame,
      policy: SchemaChangePolicy): Unit = {
    val added = newColumns(spark, target, incoming)
    val removed = {
      val incomingNames = incoming.schema.fieldNames.map(_.toLowerCase).toSet
      spark.table(Relation.parse(target).quoted)
        .schema.fieldNames.toSeq.filterNot(n => incomingNames(n.toLowerCase))
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
    fileFormat: String = "parquet",
    // TBLPROPERTIES recorded when the FIRST run creates the target —
    // through the CTAS materialization's own property channel (the r16
    // lesson), so the table is self-describing the moment the
    // materialization call returns. NOT fully atomic with the catalog
    // commit: the DataFrameWriter API has no properties channel, so
    // TableMaterialization applies them via ALTER immediately after
    // saveAsTable — a crash INSIDE that sub-statement gap still leaves
    // a property-less table (for microbatch, the grandfathered refusal +
    // attestation hatch is the designed backstop for exactly that
    // sliver; before r17 the exposed window was the entire window loop).
    // Subsequent runs never re-write them here; callers owning
    // run-over-run property state (microbatch's granularity record)
    // re-assert it themselves.
    tableProperties: Map[String, String] = Map.empty)

/** The incremental materialization state machine (reference
  * macros/materializations/incremental/incremental.sql):
  * first run → CTAS; subsequent runs → strategy-specific DML, preceded by
  * on_schema_change handling. Validation mirrors validate.sql:19-50, except
  * merge is additionally allowed on plain parquet thanks to the O3′ rewrite.
  */
object IncrementalMaterialization {

  def run(spark: SparkSession, target: String, batch: DataFrame,
      cfg: IncrementalConfig): Unit = {
    val rel = Relation.parse(target)
    if (cfg.strategy == IncrementalStrategy.Merge && cfg.uniqueKey.isEmpty) {
      // Reference: no unique_key → merge degenerates to ON FALSE insert-only
      // (strategies.sql:76). Handled inside MergeOps.
    }
    if (!spark.catalog.tableExists(rel.quoted)) {
      TableMaterialization.run(spark, target, batch,
        format = cfg.fileFormat, partitionBy = cfg.partitionBy,
        properties = cfg.tableProperties)
      return
    }
    SchemaEvolution(spark, target, batch, cfg.onSchemaChange)
    // Project to destination columns in target order (reference
    // strategies.sql:2-3 — dest_columns drive the insert projection).
    val destCols = spark.table(rel.quoted).columns.toSeq
    val aligned = batch.select(destCols.map(c =>
      if (batch.columns.contains(c)) col(c) else lit(null).as(c)): _*)

    cfg.strategy match {
      case IncrementalStrategy.Append =>
        aligned.write.mode(SaveMode.Append).insertInto(rel.quoted)

      case IncrementalStrategy.InsertOverwrite =>
        // Dynamic mode: only partitions present in the batch are replaced;
        // unpartitioned target → whole-table overwrite (README.md:549-553).
        // Scoped, not set: the caller's session must not keep the mode.
        graft.core.Engine.withConf(spark,
          Map("spark.sql.sources.partitionOverwriteMode" -> "dynamic")) {
          aligned.write.mode(SaveMode.Overwrite).insertInto(rel.quoted)
        }

      case IncrementalStrategy.Merge if cfg.partitionBy.nonEmpty =>
        partitionScopedMerge(spark, rel, aligned, cfg)

      case IncrementalStrategy.Merge =>
        val merged = MergeOps.merge(spark.table(rel.quoted), aligned,
          cfg.uniqueKey, cfg.mergeUpdateColumns, cfg.mergeExcludeColumns,
          cfg.matchedPredicate)
        atomicReplace(spark, rel, merged, cfg)
    }
  }

  /** Partition-scoped MERGE for partitioned non-ACID targets: only the
    * partitions that can change are read and rewritten, instead of the whole
    * table — the property that keeps merge affordable at 100 TB (a lakehouse
    * format gets this from MERGE INTO metadata; this is the parquet analog).
    *
    * Affected partitions = partitions of the source batch ∪ partitions of
    * target rows whose unique key appears in the batch (a key UPDATE may
    * move a row across partitions — its old partition must be rewritten
    * too). The merge runs over that target subset only; the result lands via
    * dynamic-partition INSERT OVERWRITE, replacing exactly the rewritten
    * partitions. A partition drained empty by the merge produces no output
    * rows, so it is dropped explicitly (metadata-scale operation).
    */
  private def partitionScopedMerge(spark: SparkSession, rel: Relation,
      aligned: DataFrame, cfg: IncrementalConfig): Unit = {
    val pcols = cfg.partitionBy
    val tgt = spark.table(rel.quoted)
    val srcParts = aligned.select(pcols.map(col): _*).distinct()
    val matchedParts =
      if (cfg.uniqueKey.isEmpty) srcParts.limit(0)
      else tgt.join(
          aligned.select(cfg.uniqueKey.map(col): _*).distinct(),
          cfg.uniqueKey, "left_semi")
        .select(pcols.map(col): _*).distinct()
    val affected = srcParts.unionByName(matchedParts).distinct()
    val scopedTarget = tgt.join(affected, pcols, "left_semi")
    val merged = MergeOps.merge(scopedTarget, aligned,
      cfg.uniqueKey, cfg.mergeUpdateColumns, cfg.mergeExcludeColumns,
      cfg.matchedPredicate)
    Staging.stagedCommit(spark, rel, s"merge_${rel.identifier}") { staging =>
      merged.select(tgt.columns.map(col).toSeq: _*)
        .write.mode(SaveMode.Overwrite).parquet(staging)
      val fresh = spark.read.parquet(staging)
      // Both partition lists are computed HERE, before anything destructive
      // runs (the target is untouched during staging; evaluating `affected`
      // after the overwrite would see post-merge state — a moved row's OLD
      // partition would vanish from the list and never get dropped).
      // Partition lists are metadata scale, so the collects are bounded.
      val affectedVals = affected.collect().map(_.toSeq).toSet
      val writtenVals = fresh.select(pcols.map(col): _*).distinct()
        .collect().map(_.toSeq).toSet
      // Partitions the merge drained (rows moved out by a key update):
      // affected-but-absent from the output, dropped at commit time.
      val drops = (affectedVals -- writtenVals).toSeq.map { vals =>
        pcols.zip(vals)
          .map { case (c, v) => s"`$c` = ${Relation.sqlLiteral(v)}" }
          .mkString(", ")
      }
      Staging.CommitSpec("dynamic_overwrite", dropPartitions = drops)
    }
  }

  /** Atomic-ish replace for non-ACID formats: materialize the merged result
    * to a staging location first, then swap it in. Mirrors the reason the
    * reference restricts MERGE to ACID formats (validate.sql:41-43) — the
    * staging write makes the overwrite never read what it's writing. On a
    * lakehouse format the swap would be a metadata-only commit instead.
    * (No delta/iceberg/hudi runtime jar ships in this sandbox's
    * /opt/spark/jars, so the parquet rewrite is the only merge path.)
    */
  private def atomicReplace(spark: SparkSession, rel: Relation,
      merged: DataFrame, cfg: IncrementalConfig): Unit =
    Staging.stagedCommit(spark, rel, s"merge_${rel.identifier}") { staging =>
      merged.write.mode(SaveMode.Overwrite).parquet(staging)
      Staging.CommitSpec("replace_table",
        format = Some(cfg.fileFormat), partitionBy = cfg.partitionBy)
    }
}

/** S12: location resolution (reference impl.py:415-444 `_build_location` /
  * `get_location`): `custom_location` wins outright; else
  * `root_location/table`; else the default `warehouse/schema/table`.
  */
object Locations {
  def resolve(spark: SparkSession, rel: graft.core.Relation,
      rootLocation: Option[String] = None,
      customLocation: Option[String] = None): String =
    customLocation.getOrElse {
      rootLocation match {
        case Some(r) => s"${r.stripSuffix("/")}/${rel.identifier}"
        case None =>
          val wh = spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/")
          s"$wh/${rel.schema}/${rel.identifier}"
      }
    }
}

/** F2: audit-column star projection (reference macros/iceberg_helper.sql:
  * 1-37 — `select *, current_timestamp() as update_iceberg_ts`, dedup-aware
  * when a unique key orders versions). Clock is injectable for
  * deterministic tests/oracles (SURVEY §7 timestamp-determinism risk).
  */
object AuditColumns {
  def withUpdateTs(df: DataFrame, colName: String = "update_ts",
      clock: Option[java.sql.Timestamp] = None,
      uniqueKey: Seq[String] = Nil,
      latestBy: Seq[Column] = Nil): DataFrame = {
    val ts = clock.map(t => lit(t).cast("timestamp")).getOrElse(current_timestamp())
    val base =
      if (uniqueKey.isEmpty) df
      else {
        // Dedup-aware path: one row per key, latest by `latestBy` order.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(uniqueKey.map(col): _*)
          .orderBy(latestBy: _*)
        df.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
    base.withColumn(colName, ts)
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
    val raw =
      if (columnTypes.isEmpty)
        spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      else {
        // Phase-1 lenient load typing (reference impl.py:37-64 via
        // TypeMapper.seedLoadType): parse the CSV AS the lenient types
        // derived from the declared column types — timestamp/date as
        // string, bigint as double — in ONE scan; inferSchema would scan
        // the file twice AND could infer a type the reference's
        // string-then-cast contract never produces. Undeclared columns
        // load as string (the lenient identity).
        val header = spark.read.option("header", "true").csv(path)
          .schema.fieldNames.toSeq
        val loadSchema = org.apache.spark.sql.types.StructType(header.map { c =>
          val load = columnTypes.get(c)
            .map(graft.core.TypeMapper.seedLoadType).getOrElse("string")
          StructField(c, org.apache.spark.sql.types.DataType.fromDDL(load))
        })
        spark.read.option("header", "true").schema(loadSchema).csv(path)
      }
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
        // 2-phase typing (impl.py:679-690); declared names normalized via
        // the reference's type-mapping rules (TEXT→STRING etc.).
        case Some(t) => col(c).cast(graft.core.TypeMapper.castType(t)).as(c)
        case None    => col(c)
      }
    }: _*)

  private def write(spark: SparkSession, table: String, df: DataFrame,
      overwrite: Boolean): Unit = {
    val rel = Relation.parse(table)
    if (!spark.catalog.tableExists(rel.quoted))
      df.write.mode(SaveMode.Overwrite).saveAsTable(rel.quoted)
    else if (overwrite) {
      spark.sql(s"DROP TABLE IF EXISTS ${rel.quoted}")
      df.write.mode(SaveMode.Overwrite).saveAsTable(rel.quoted)
    } else df.write.mode(SaveMode.Append).insertInto(rel.quoted)
  }
}
