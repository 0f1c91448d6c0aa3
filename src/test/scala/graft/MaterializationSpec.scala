package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.materialize._
import graft.quality.QualityChecks

/** Matrix tests for the materialization layer — the Scala analog of the
  * reference's macro-rendering unit tests (SURVEY §5 layer 2): one cell per
  * (strategy × option × schema-change) behavior.
  */
class MaterializationSpec extends AnyFunSuite {
  import SparkTestSession._

  private var n = 0
  private def freshTable(): String = { n += 1; s"default.mat_spec_$n" }
  private def orders = Tables.orders(spark, sf)

  test("merge with no unique key is insert-only (ON FALSE)") {
    val t = orders.limit(10)
    val s = orders.limit(5)
    val merged = MergeOps.merge(t, s, keys = Nil)
    assert(merged.count() === 15)
  }

  test("merge updates matched rows and inserts unmatched ones") {
    val target = orders.filter(col("o_orderkey") <= 100)
      .withColumn("o_orderpriority", lit("STALE"))
    val source = orders.filter(col("o_orderkey") > 50 && col("o_orderkey") <= 150)
    val merged = MergeOps.merge(target, source, Seq("o_orderkey"))
    assert(merged.count() === 151) // keys 0..150
    assert(merged.filter(col("o_orderpriority") === "STALE").count() === 51) // 0..50
  }

  test("merge_exclude_columns keeps excluded columns from the target") {
    val target = orders.filter(col("o_orderkey") <= 100)
      .withColumn("o_orderpriority", lit("KEEP_ME"))
      .withColumn("o_orderstatus", lit("X"))
    val source = orders.filter(col("o_orderkey") <= 100)
    val merged = MergeOps.merge(target, source, Seq("o_orderkey"),
      excludeColumns = Seq("o_orderpriority"))
    assert(merged.filter(col("o_orderpriority") === "KEEP_ME").count() === 101)
    assert(merged.filter(col("o_orderstatus") === "X").count() === 0) // updated
  }

  test("merge raises on multiple MATCHED source rows; unmatched duplicates insert") {
    import spark.implicits._
    val target = Seq((1L, "t1"), (2L, "t2")).toDF("k", "v")
    // Two source rows for MATCHED key 1: the reference MERGE raises on
    // multiple source matches (silently fanning out duplicated the target
    // row, compounding across incremental runs).
    val dupMatched = Seq((1L, "a"), (1L, "b")).toDF("k", "v")
    // The guard rides the JOIN CONDITION, so the wrapper class depends on
    // where evaluation surfaces (SparkException from a task,
    // SparkRuntimeException straight from raise_error) — the CONTRACT is
    // the loud message, not the wrapper.
    def matchMsg(e: Throwable): Boolean =
      e.getMessage.contains("multiple rows for matched unique key") ||
        Option(e.getCause).exists(_.getMessage
          .contains("multiple rows for matched unique key"))
    val e = intercept[Exception] {
      MergeOps.merge(target, dupMatched, Seq("k")).collect()
    }
    assert(matchMsg(e))
    // An aggregate-only consumer prunes EVERY output column (count() scans
    // ReadSchema struct<>), which silently disarmed a projection-based
    // guard — the join-condition guard must fire under it too.
    val eCount = intercept[Exception] {
      MergeOps.merge(target, dupMatched, Seq("k")).count()
    }
    assert(matchMsg(eCount))
    // Duplicate UNMATCHED keys are legal — each inserts (MERGE's NOT
    // MATCHED branch fires per source row).
    val dupNew = Seq((9L, "a"), (9L, "b")).toDF("k", "v")
    assert(MergeOps.merge(target, dupNew, Seq("k")).count() === 4)
  }

  test("merge null keys never match (reference ON equality)") {
    import spark.implicits._
    val target = Seq((Option(1L), "t1"), (Option.empty[Long], "tnull"))
      .toDF("k", "v")
    val source = Seq((Option(1L), "s1"), (Option.empty[Long], "snull"))
      .toDF("k", "v")
    val merged = MergeOps.merge(target, source, Seq("k")).collect()
      .map(r => (Option(r.get(0)), r.getString(1))).toSeq
    // Key 1 updates; the NULL-key source row INSERTS (never matches the
    // NULL-key target row), so both null rows survive — MERGE ON t.k = s.k
    // semantics, and consistent with partitionScopedMerge's null-unsafe
    // affected-partition computation.
    assert(merged.sortBy(_._2) ===
      Seq((Some(1L), "s1"), (None, "snull"), (None, "tnull")).sortBy(_._2))
  }

  test("relationships supports a self-referencing FK (child eq parent)") {
    import spark.implicits._
    val employees = Seq((1L, Option.empty[Long]), (2L, Option(1L)),
      (3L, Option(1L)), (4L, Option(99L))).toDF("id", "manager_id")
    // Same DataFrame on both sides — the old child(k) === parent(k)
    // condition threw AMBIGUOUS_SELF_JOIN here.
    val orphans = QualityChecks.relationships(
      employees, "manager_id", employees, "id")
    assert(orphans.select("id").collect().map(_.getLong(0)).toSeq === Seq(4L))
  }

  test("matched predicate gates the update branch") {
    val target = orders.filter(col("o_orderkey") <= 100)
      .withColumn("o_orderpriority", lit("STALE"))
    val source = orders.filter(col("o_orderkey") <= 100)
    val merged = MergeOps.merge(target, source, Seq("o_orderkey"),
      matchedPredicate = Some(MergeOps.tgt("o_orderkey") > 90))
    assert(merged.filter(col("o_orderpriority") === "STALE").count() === 91) // 0..90 kept
  }

  test("incremental append on existing table aligns batch columns to target order") {
    val t = freshTable()
    val cfg = IncrementalConfig(IncrementalStrategy.Append)
    IncrementalMaterialization.run(spark, t, orders.limit(10), cfg)
    // shuffled column order in the second batch must not corrupt rows
    val batch = orders.limit(5).select("o_totalprice", "o_orderkey", "o_orderstatus",
      "o_orderdate", "o_orderpriority", "o_custkey")
    IncrementalMaterialization.run(spark, t, batch, cfg)
    val got = spark.table(t)
    assert(got.count() === 15)
    assert(got.filter(col("o_totalprice") < 1).count() === 0) // no column swap
  }

  test("on_schema_change=append_new_columns adds the column; ignore does not") {
    val t = freshTable()
    val cfg = IncrementalConfig(IncrementalStrategy.Append,
      onSchemaChange = SchemaChangePolicy.AppendNewColumns)
    IncrementalMaterialization.run(spark, t, orders.limit(10), cfg)
    val widened = orders.limit(5).withColumn("loyalty_tier", lit("gold"))
    IncrementalMaterialization.run(spark, t, widened, cfg)
    assert(spark.table(t).columns.contains("loyalty_tier"))
    assert(spark.table(t).filter(col("loyalty_tier").isNull).count() === 10)

    val t2 = freshTable()
    val cfgIgnore = IncrementalConfig(IncrementalStrategy.Append,
      onSchemaChange = SchemaChangePolicy.Ignore)
    IncrementalMaterialization.run(spark, t2, orders.limit(10), cfgIgnore)
    IncrementalMaterialization.run(spark, t2, widened, cfgIgnore)
    assert(!spark.table(t2).columns.contains("loyalty_tier"))
  }

  test("on_schema_change=fail raises on new columns") {
    val t = freshTable()
    val cfg = IncrementalConfig(IncrementalStrategy.Append,
      onSchemaChange = SchemaChangePolicy.Fail)
    IncrementalMaterialization.run(spark, t, orders.limit(10), cfg)
    val widened = orders.limit(5).withColumn("extra", lit(1))
    intercept[IllegalStateException] {
      IncrementalMaterialization.run(spark, t, widened, cfg)
    }
  }

  test("snapshot timestamp strategy versions rows whose updated_at advanced") {
    val t = freshTable()
    import spark.implicits._
    val v1 = Seq((1L, "a", Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, "b", Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "val", "updated_at")
    val v2 = Seq((1L, "a2", Timestamp.valueOf("2024-02-01 00:00:00")), // changed
      (2L, "b", Timestamp.valueOf("2024-01-01 00:00:00")),             // unchanged
      (3L, "c", Timestamp.valueOf("2024-02-01 00:00:00")))             // new
      .toDF("id", "val", "updated_at")
    val cfg = SnapshotConfig(Seq("id"), SnapshotStrategy.ByTimestamp("updated_at"))
    SnapshotMaterialization.run(spark, t, v1, cfg)
    SnapshotMaterialization.run(spark, t, v2, cfg)
    val snap = spark.table(t)
    assert(snap.count() === 4) // 2 v1 rows + new version of id=1 + id=3
    assert(snap.filter(col("id") === 1 && col("dbt_valid_to").isNotNull).count() === 1)
    assert(snap.filter(col("id") === 1 && col("dbt_valid_to").isNull)
      .select("val").head.getString(0) === "a2")
    assert(snap.filter(col("id") === 2).count() === 1)
    assert(snap.filter(col("id") === 3 && col("dbt_valid_to").isNull).count() === 1)
  }

  test("snapshot invalidate_hard_deletes closes vanished rows") {
    val t = freshTable()
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "val")
    val v2 = Seq((1L, "a")).toDF("id", "val") // id=2 deleted
    val clock2 = Timestamp.valueOf("2024-03-01 00:00:00")
    SnapshotMaterialization.run(spark, t, v1, SnapshotConfig(Seq("id"),
      SnapshotStrategy.ByCheck(Seq("val")), invalidateHardDeletes = true,
      clock = () => Timestamp.valueOf("2024-01-01 00:00:00")))
    SnapshotMaterialization.run(spark, t, v2, SnapshotConfig(Seq("id"),
      SnapshotStrategy.ByCheck(Seq("val")), invalidateHardDeletes = true,
      clock = () => clock2))
    val closed = spark.table(t).filter(col("id") === 2)
    assert(closed.count() === 1)
    assert(closed.select("dbt_valid_to").head.getTimestamp(0) === clock2)
  }

  test("snapshot dbt_valid_to_current: open rows carry the sentinel, not null") {
    val t = freshTable()
    import spark.implicits._
    val sentinel = Timestamp.valueOf("9999-12-31 00:00:00")
    def cfg(ts: String) = SnapshotConfig(Seq("id"),
      SnapshotStrategy.ByCheck(Seq("val")),
      clock = () => Timestamp.valueOf(ts),
      validToCurrent = Some(sentinel))
    SnapshotMaterialization.run(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("id", "val"), cfg("2024-01-01 00:00:00"))
    val after1 = spark.table(t)
    assert(after1.filter(col("dbt_valid_to").isNull).count() === 0)
    assert(after1.filter(col("dbt_valid_to") === sentinel).count() === 2)

    SnapshotMaterialization.run(spark, t,
      Seq((1L, "a2"), (2L, "b")).toDF("id", "val"), cfg("2024-02-01 00:00:00"))
    val after2 = spark.table(t)
    assert(after2.count() === 3)
    // id=1 v1 closed at the run-2 clock; open rows still carry the sentinel
    assert(after2.filter(col("id") === 1 &&
      col("dbt_valid_to") === Timestamp.valueOf("2024-02-01 00:00:00")).count() === 1)
    assert(after2.filter(col("dbt_valid_to") === sentinel).count() === 2)
    assert(after2.filter(col("id") === 1 && col("dbt_valid_to") === sentinel)
      .select("val").head.getString(0) === "a2")
  }

  test("seed loads CSV from disk with 2-phase typing") {
    val t = freshTable()
    val csv = java.nio.file.Files.createTempDirectory("graft_seed")
    java.nio.file.Files.writeString(csv.resolve("seed.csv"),
      "id,name,joined\n1,ann,2024-01-01\n2,bo,2024-05-06\n")
    SeedLoader.loadCsv(spark, t, csv.resolve("seed.csv").toString,
      columnTypes = Map("id" -> "bigint", "joined" -> "date"))
    val got = spark.table(t)
    assert(got.schema("id").dataType.typeName === "long")
    assert(got.schema("joined").dataType.typeName === "date")
    assert(got.count() === 2)
    // append mode (full_refresh=false) inserts instead of replacing
    SeedLoader.loadCsv(spark, t, csv.resolve("seed.csv").toString,
      columnTypes = Map("id" -> "bigint", "joined" -> "date"), overwrite = false)
    assert(spark.table(t).count() === 4)
  }

  test("seed CSV phase-1 lenient schema handles beyond-int bigints and bare dates") {
    // Reference contract (impl.py:37-64): the CSV parses AS the lenient
    // load type of each declared column (bigint→double, date→string), then
    // the cast projection applies the declared type — one scan, no
    // inference pass to disagree with.
    val t = freshTable()
    val csv = java.nio.file.Files.createTempDirectory("graft_seed_lenient")
    java.nio.file.Files.writeString(csv.resolve("seed.csv"),
      "id,big,joined,note\n1,3000000000,2024-01-01,x\n2,-3000000000,2024-05-06,y\n")
    SeedLoader.loadCsv(spark, t, csv.resolve("seed.csv").toString,
      columnTypes = Map("big" -> "bigint", "joined" -> "date"))
    val got = spark.table(t)
    assert(got.schema("big").dataType.typeName === "long")
    assert(got.schema("joined").dataType.typeName === "date")
    // undeclared columns load as string (the lenient identity)
    assert(got.schema("id").dataType.typeName === "string")
    val rows = got.orderBy(col("big")).collect()
    assert(rows.map(_.getAs[Long]("big")).toSeq === Seq(-3000000000L, 3000000000L))
    assert(rows.map(_.getAs[java.sql.Date]("joined").toString).toSeq ===
      Seq("2024-05-06", "2024-01-01"))
  }

  test("snapshot check_cols=all versions any non-key change") {
    val t = freshTable()
    import spark.implicits._
    def cfg(ts: String) = SnapshotConfig(Seq("id"), SnapshotStrategy.ByCheckAll,
      clock = () => Timestamp.valueOf(ts))
    SnapshotMaterialization.run(spark, t,
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "v1", "v2"), cfg("2024-01-01 00:00:00"))
    // change a DIFFERENT column than a ByCheck(v1) config would watch
    SnapshotMaterialization.run(spark, t,
      Seq((1L, "a", 11), (2L, "b", 20)).toDF("id", "v1", "v2"), cfg("2024-02-01 00:00:00"))
    val snap = spark.table(t)
    assert(snap.count() === 3)
    assert(snap.filter(col("id") === 1 && col("dbt_valid_to").isNull)
      .head.getAs[Int]("v2") === 11)
  }

  test("type mapper mirrors the reference's agate and seed-load rules") {
    import graft.core.TypeMapper
    import org.apache.spark.sql.types._
    assert(TypeMapper.fromAgate("text") === StringType)
    assert(TypeMapper.fromAgate("number") === LongType)
    assert(TypeMapper.fromAgate("number", hasDecimals = true) === DoubleType)
    assert(TypeMapper.fromAgate("date") === DateType)
    assert(TypeMapper.fromAgate("datetime") === TimestampType)
    assert(TypeMapper.headTypeName("decimal(10,2)") === "decimal")
    assert(TypeMapper.headTypeName("array<string>") === "array")
    assert(TypeMapper.headTypeName("VARCHAR(20)") === "string")
    assert(TypeMapper.seedLoadType("timestamp") === "string")
    assert(TypeMapper.seedLoadType("bigint") === "double")
    assert(TypeMapper.castType("TEXT") === "string")
    assert(TypeMapper.castType("decimal(10,2)") === "decimal(10,2)")
  }

  test("compact: fragmented unpartitioned table collapses to sized files, contents intact") {
    val t = freshTable()
    val src = orders
    TableMaterialization.run(spark, t, src.repartition(16))
    assert(RelationOps.dataFiles(spark, t).size === 16)
    RelationOps.compact(spark, t) // default 128 MB target ⇒ 1 file at spec scale
    assert(RelationOps.dataFiles(spark, t).size === 1)
    val after = spark.table(t)
    assert(after.except(src).count() === 0)
    assert(src.except(after).count() === 0)
  }

  test("compact: partitioned table collapses to one file per partition directory") {
    val t = freshTable()
    TableMaterialization.run(spark, t, orders.repartition(8),
      partitionBy = Seq("o_orderstatus"))
    val statuses = spark.table(t).select("o_orderstatus").distinct().count()
    assert(RelationOps.dataFiles(spark, t).size > statuses)
    RelationOps.compact(spark, t)
    val files = RelationOps.dataFiles(spark, t)
    assert(files.size === statuses)
    // Still partition-pruned: each file sits under its value directory.
    assert(files.map(_._1).forall(_.contains("o_orderstatus=")))
    assert(spark.table(t).count() === orders.count())
  }

  test("optimizeLayout: files cover disjoint sort-key ranges for footer skipping") {
    val t = freshTable()
    TableMaterialization.run(spark, t, orders.repartition(16))
    // Tiny target so the rewrite yields several range files at spec scale.
    RelationOps.optimizeLayout(spark, t, Seq("o_orderkey"),
      targetFileBytes = 64L << 10)
    val files = RelationOps.dataFiles(spark, t).map(_._1)
    assert(files.size > 1)
    // Per-file min/max of the sort key (what a parquet footer advertises)
    // must not overlap between files — the property file skipping needs.
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("o_orderkey")), max(col("o_orderkey"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2)
      case _ =>
    }
    assert(spark.table(t).count() === orders.count())
  }

  test("z-order layout: both dimensions prune, contents intact, guards loud") {
    val db = "graft_spec_zo"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")
    val t = s"$db.orders_zo"
    val o = orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    TableMaterialization.run(spark, t, o.repartition(8))
    RelationOps.zOrderLayout(spark, t, Seq("o_orderkey", "o_custkey"),
      targetFileBytes = 4L << 10) // spec-scale table: tiny target → several files
    val files = RelationOps.dataFiles(spark, t).map(_._1)
    assert(files.size > 3, s"want a multi-file layout, got ${files.size}")
    // Contents intact.
    assert(spark.table(t).count() === o.count())
    // Two-dimensional pruning geometry: a centered quarter-range
    // rectangle in (orderkey, custkey) must be coverable by a strict
    // subset of files via their min/max footers. Under a plain
    // single-column sort the SECOND dimension spans the full range in
    // every file and nothing prunes on it; z-order bounds both.
    val Seq(okLo, okHi, ckLo, ckHi) = {
      val r = o.agg(min("o_orderkey"), max("o_orderkey"),
        min("o_custkey"), max("o_custkey")).head()
      Seq(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    def mid(lo: Long, hi: Long) = (lo + (hi - lo) * 3 / 8, lo + (hi - lo) * 5 / 8)
    val (qOkLo, qOkHi) = mid(okLo, okHi)
    val (qCkLo, qCkHi) = mid(ckLo, ckHi)
    val intersecting = files.count { f =>
      val r = spark.read.parquet(f).agg(
        min("o_orderkey"), max("o_orderkey"),
        min("o_custkey"), max("o_custkey")).head()
      r.getLong(1) >= qOkLo && r.getLong(0) <= qOkHi &&
        r.getLong(3) >= qCkLo && r.getLong(2) <= qCkHi
    }
    assert(intersecting < files.size,
      s"quarter-rectangle query must prune at least one of ${files.size} files")
    intercept[IllegalArgumentException] {
      RelationOps.zOrderLayout(spark, t, Seq("o_orderkey"))
    }
    intercept[IllegalArgumentException] {
      RelationOps.zOrderLayout(spark, t, Seq("o_orderkey", "o_custkey"), bits = 40)
    }
    spark.sql(s"DROP DATABASE $db CASCADE")
  }

  test("quality checks return offending rows only") {
    assert(QualityChecks.notNull(orders, "o_orderkey").count() === 0)
    assert(QualityChecks.unique(orders, "o_orderkey").count() === 0)
    assert(QualityChecks.unique(Tables.lineitem(spark, sf), "l_orderkey").count() > 0)
    assert(QualityChecks.acceptedValues(orders, "o_orderstatus", Seq("O", "F", "P")).count() === 0)
    assert(QualityChecks.relationships(
      Tables.lineitem(spark, sf), "l_orderkey", orders, "o_orderkey").count() === 0)
    assert(QualityChecks.expression(orders, col("o_totalprice") > 0).count() === 0)
    // dbt-core's default unique contract: NULLs are the not_null test's
    // job — repeated nulls must NOT report a duplicate group, while a
    // repeated real value must.
    import spark.implicits._
    val withNulls = Seq(Option(1L), None, None, Option(2L), Option(2L))
      .toDF("k")
    val dups = QualityChecks.unique(withNulls, "k").collect()
    assert(dups.length === 1 && dups.head.getLong(0) === 2L)
  }

  test("profiler: nulls counted, distinct excludes null, all-null column renders ''") {
    import spark.implicits._
    import graft.quality.Profiler
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None), (None, Some("b"))
    ).toDF("k", "s").withColumn("z", lit(null).cast("string"))
    val got = Profiler.profile(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got("k") === ((3L, 1L, 1L, "1", "1")))
    assert(got("s") === ((3L, 1L, 2L, "a", "b")))
    assert(got("z") === ((3L, 3L, 0L, "", "")), "all-null column: '' min/max, 0 distinct")
    // Column subset + approx flag both produce one row per requested col.
    val sub = Profiler.profile(df, Seq("k"), approxDistinct = true).collect()
    assert(sub.length === 1 && sub(0).getString(0) === "k")
    assert(sub(0).getLong(3) === 1L, "HLL on one distinct value is exact")
  }

  test("test evaluate: severity bands, store-failures persists offenders, bad thresholds loud") {
    import graft.quality.QualityChecks
    val db = "graft_spec_sf"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val off = QualityChecks.unique(Tables.lineitem(spark, sf), "l_orderkey")
    val nOff = off.count()
    assert(nOff > 0, "fixture premise: order keys repeat per line item")
    // Stored: audit table holds exactly the offending frame.
    val r = QualityChecks.evaluate(off, Some(s"$db.offenders")).collect()(0)
    assert(r.getLong(0) === nOff && r.getString(1) === "error")
    assert(spark.table(s"$db.offenders").count() === nOff)
    // Bands: warn-only, then pass.
    val warn = QualityChecks.evaluate(off, None, 0L, nOff).collect()(0)
    assert(warn.getString(1) === "warn")
    val pass = QualityChecks.evaluate(off, None, nOff, nOff).collect()(0)
    assert(pass.getString(1) === "pass")
    // A clean test passes under the strictest config.
    val clean = QualityChecks.evaluate(
      QualityChecks.notNull(Tables.orders(spark, sf), "o_orderkey")).collect()(0)
    assert(clean.getLong(0) === 0L && clean.getString(1) === "pass")
    intercept[IllegalArgumentException] {
      QualityChecks.evaluate(off, None, 5L, 1L)
    }
    spark.sql(s"DROP DATABASE $db CASCADE")
  }

  test("unit test: multiset diff counts duplicates, schema mismatch loud, column order free") {
    import spark.implicits._
    import graft.quality.UnitTest
    val model = (in: Map[String, org.apache.spark.sql.DataFrame]) =>
      in("src").groupBy(col("k")).agg(count(lit(1)).cast("long").as("n"))
    val src = Seq("a", "a", "b").toDF("k")
    assert(UnitTest.run(model, Map("src" -> src),
      Seq(("a", 2L), ("b", 1L)).toDF("k", "n")).passed)
    // Column order in the expectation must not matter.
    assert(UnitTest.run(model, Map("src" -> src),
      Seq((2L, "a"), (1L, "b")).toDF("n", "k")).passed)
    // Multiset: an expectation duplicating a correct row still fails,
    // with the surplus copy reported missing.
    val dup = UnitTest.run(model, Map("src" -> src),
      Seq(("a", 2L), ("a", 2L), ("b", 1L)).toDF("k", "n"))
    assert(!dup.passed && dup.missing.count() === 1 && dup.unexpected.count() === 0)
    intercept[IllegalArgumentException] {
      UnitTest.run(model, Map("src" -> src), Seq(("a", 2L)).toDF("k", "wrong"))
    }
  }

  test("microbatch: hourly batches keep their own partitions, retry replaces one window only") {
    import java.sql.Timestamp
    import spark.implicits._
    val db = "graft_spec_mb"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val t = s"$db.mb_hourly"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    def ts(s: String) = Timestamp.valueOf(s)
    val src = Seq(
      (1L, ts("2024-01-01 10:15:00"), 10.0),
      (2L, ts("2024-01-01 11:20:00"), 20.0),
      (3L, ts("2024-01-01 11:40:00"), 21.0),
      (4L, ts("2024-01-01 12:05:00"), 30.0), // outside [10:00, 12:00)
      (5L, ts("2023-12-31 09:00:00"), 99.0)  // before the range
    ).toDF("id", "ts", "v")
    // Two hourly batches over [10:00, 12:00): rows 4 and 5 excluded.
    val n = graft.materialize.Microbatch.run(spark, t, src, "ts",
      ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"), batchSize = "hour")
    assert(n === 2)
    assert(spark.table(t).select("id").as[Long].collect().toSet === Set(1L, 2L, 3L))
    // Hourly batch identity must be the truncated TIMESTAMP — a date
    // cast would merge both hours and the retry below would wipe hour 10.
    assert(spark.table(t).select("batch_start").distinct().count() === 2)
    // Retry hour 11 from a corrected source: hour 10 untouched.
    val fixed = src.withColumn("v", when(col("id") === 2L, 200.0).otherwise(col("v")))
    graft.materialize.Microbatch.run(spark, t, fixed, "ts",
      ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"), batchSize = "hour")
    val byId = spark.table(t).select("id", "v").as[(Long, Double)].collect().toMap
    assert(byId === Map(1L -> 10.0, 2L -> 200.0, 3L -> 21.0))
    // A window whose source has DRAINED (every hour-11 row deleted) must
    // clear its partition on rebuild — a raw dynamic overwrite would no-op
    // on the empty batch and leave rows 2/3 stale forever.
    graft.materialize.Microbatch.run(spark, t,
      fixed.filter(col("id") === 1L), "ts",
      ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"), batchSize = "hour")
    assert(spark.table(t).select("id").as[Long].collect().toSet === Set(1L),
      "drained window must clear exactly its own partition")
    // Unsupported granularity fails loudly.
    intercept[IllegalArgumentException] {
      graft.materialize.Microbatch.run(spark, t, src, "ts",
        ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"), batchSize = "week")
    }
    spark.sql(s"DROP DATABASE $db CASCADE")
  }

  test("microbatch: a granularity-mismatched re-run fails loudly, never corrupts") {
    import java.sql.Timestamp
    import spark.implicits._
    import graft.materialize.Microbatch
    val db = "graft_spec_mbgran"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    def ts(s: String) = Timestamp.valueOf(s)
    val t = s"$db.mb_day"
    val src = Seq((1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-02 11:00:00"), 2.0)).toDF("id", "ts", "v")
    Microbatch.run(spark, t, src, "ts",
      ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))
    // An HOURLY re-run against the day-built table previously passed a
    // timestamp literal to the DATE partition column — on a drained window
    // that could resolve as the whole day and silently drop 24 hours.
    val hourly = intercept[IllegalStateException] {
      Microbatch.run(spark, t, src.filter(lit(false)), "ts",
        ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"),
        batchSize = "hour")
    }
    assert(hourly.getMessage.contains("batch_size"), hourly.getMessage)
    // Day vs month share the DATE column type — the recorded TBLPROPERTY
    // distinguishes them (a month overwrite would replace only the
    // first-of-month partition and leave days 2..31 stale).
    val monthly = intercept[IllegalStateException] {
      Microbatch.run(spark, t, src, "ts",
        ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00"),
        batchSize = "month")
    }
    assert(monthly.getMessage.contains("'day'"), monthly.getMessage)
    assert(spark.table(t).count() === 2, "failed runs must not have written")
    // Pre-property tables (simulated by unsetting it) still get the
    // column-type fallback on the hour/coarser axis...
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES IF EXISTS " +
      s"('${Microbatch.GranularityProperty}')")
    intercept[IllegalStateException] {
      Microbatch.run(spark, t, src.filter(lit(false)), "ts",
        ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"),
        batchSize = "hour")
    }
    // ...while a grandfathered DATE-typed table is refused for EVERY
    // date-granularity run — a mismatch is silently lossy in both
    // directions (month-on-day melts the month; day-on-month replaces a
    // whole-month partition with one day) and neither the schema nor the
    // partition values can prove which of day/month/year built it. The
    // error names the attestation escape hatch.
    for (size <- Seq("day", "month")) {
      val refused = intercept[IllegalStateException] {
        Microbatch.run(spark, t, src, "ts",
          ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00"),
          batchSize = size)
      }
      assert(refused.getMessage.contains("SET TBLPROPERTIES"),
        refused.getMessage)
    }
    assert(spark.table(t).count() === 2, "refused runs must not write")
    // The documented escape hatch: attest the original granularity, and
    // the matching re-run proceeds (the property then stays recorded).
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      s"('${Microbatch.GranularityProperty}'='day')")
    Microbatch.run(spark, t, src, "ts",
      ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))
    val recorded = spark.sql(s"SHOW TBLPROPERTIES $t")
      .filter(col("key") === Microbatch.GranularityProperty)
      .collect().map(_.getString(1))
    assert(recorded.toSeq === Seq("day"))
    // Attest-then-WRONG-size: the attestation re-arms the property guard,
    // so a month run against the now-attested day table is refused by the
    // recorded-property check (not the grandfathered refusal) — attesting
    // never weakens the guard, it only names the one true granularity.
    val postAttest = intercept[IllegalStateException] {
      Microbatch.run(spark, t, src, "ts",
        ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00"),
        batchSize = "month")
    }
    assert(postAttest.getMessage.contains("'day'") &&
      !postAttest.getMessage.contains("SET TBLPROPERTIES"),
      postAttest.getMessage)
    assert(spark.table(t).count() === 2, "post-attest refusal must not write")
    // A pre-existing table that is not a microbatch table at all.
    spark.sql(s"CREATE TABLE $db.not_mb (id BIGINT) USING PARQUET")
    val notMb = intercept[IllegalStateException] {
      Microbatch.run(spark, s"$db.not_mb", src, "ts",
        ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
    }
    assert(notMb.getMessage.contains("batch_start"), notMb.getMessage)
    spark.sql(s"DROP DATABASE $db CASCADE")
  }

  test("microbatch: the granularity record rides the FIRST window — a mid-first-run crash leaves a self-describing table") {
    import java.sql.Timestamp
    import spark.implicits._
    import graft.materialize.Microbatch
    import graft.core.Failpoints
    val db = "graft_spec_mbfirst"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    def ts(s: String) = Timestamp.valueOf(s)
    val t = s"$db.mb_crash_first"
    val src = Seq((1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-02 11:00:00"), 2.0)).toDF("id", "ts", "v")
    // Crash a brand-new DAY table's FIRST run after its first committed
    // window. Before r17 the property was written only after the whole
    // loop, so this exact crash left a property-less DATE table that the
    // grandfathered refusal then blocked from the documented "re-run the
    // range" recovery (r16 ADVICE item) — the property must now ride the
    // first window's CTAS itself.
    try {
      Failpoints.arm("microbatch.window")
      intercept[Failpoints.Injected] {
        Microbatch.run(spark, t, src, "ts",
          ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))
      }
    } finally Failpoints.disarmAll()
    val prop = spark.sql(s"SHOW TBLPROPERTIES $t")
      .filter(col("key") === Microbatch.GranularityProperty)
      .collect().map(_.getString(1))
    assert(prop.toSeq === Seq("day"),
      "a one-window table must already carry its granularity record")
    // The documented recovery works WITHOUT manual attestation.
    val n = Microbatch.run(spark, t, src, "ts",
      ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))
    assert(n === 2)
    assert(spark.table(t).select("id").as[Long].collect().toSet
      === Set(1L, 2L))
    // And a validated run on a property-LESS pre-existing table records
    // the property up front (the hour-proved shape): strip it, re-run at
    // the type-proven granularity, observe the record restored.
    val th = s"$db.mb_hour_selfdesc"
    Microbatch.run(spark, th, src, "ts",
      ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"),
      batchSize = "hour")
    spark.sql(s"ALTER TABLE $th UNSET TBLPROPERTIES IF EXISTS " +
      s"('${Microbatch.GranularityProperty}')")
    Microbatch.run(spark, th, src, "ts",
      ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"),
      batchSize = "hour")
    val hprop = spark.sql(s"SHOW TBLPROPERTIES $th")
      .filter(col("key") === Microbatch.GranularityProperty)
      .collect().map(_.getString(1))
    assert(hprop.toSeq === Seq("hour"))
    spark.sql(s"DROP DATABASE $db CASCADE")
  }

  test("relayout rewrites preserve user TBLPROPERTIES (tags, attestations)") {
    import spark.implicits._
    val t = freshTable()
    TableMaterialization.run(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    // Governance tags and the microbatch granularity attestation both live
    // in TBLPROPERTIES; the relayout CTAS previously dropped them (the
    // microbatch machine surfaced it as a post-compaction refusal).
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('graft.tag.pii'='true', 'graft.microbatch.batch_size'='day')")
    RelationOps.compact(spark, t)
    val props = spark.sql(s"SHOW TBLPROPERTIES $t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.tag.pii") === Some("true"))
    assert(props.get("graft.microbatch.batch_size") === Some("day"))
    assert(spark.table(t).count() === 2, "relayout must not touch contents")
  }

  test("microbatch: drained windows cost a set lookup, not a probe job each") {
    import java.sql.Timestamp
    import spark.implicits._
    import graft.materialize.Microbatch
    val db = "graft_spec_mbjobs"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    def ts(s: String) = Timestamp.valueOf(s)
    // Identical seed state on two tables: days 1-2 populated.
    val src = Seq((1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-02 11:00:00"), 2.0)).toDF("id", "ts", "v")
    for (t <- Seq(s"$db.few", s"$db.many"))
      Microbatch.run(spark, t, src, "ts",
        ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))
    // Count Spark jobs via job-group attribution; the status store is fed
    // asynchronously, so poll until the count is stable.
    def jobsOf(group: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try body finally spark.sparkContext.clearJobGroup()
      var prev = -1
      var cur = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (cur != prev && System.nanoTime() < deadline) {
        prev = cur; Thread.sleep(200)
        cur = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      }
      cur
    }
    // Same two non-empty windows; 2 vs 10 drained windows. Before the
    // one-pass pre-pass each drained window paid its own isEmpty probe
    // job, so the 12-window run would exceed the 4-window one by 8 jobs.
    val few = jobsOf("mb-few") {
      Microbatch.run(spark, s"$db.few", src, "ts",
        ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00"))
    }
    val many = jobsOf("mb-many") {
      Microbatch.run(spark, s"$db.many", src, "ts",
        ts("2024-01-01 00:00:00"), ts("2024-01-13 00:00:00"))
    }
    assert(few > 0, "job-group attribution must observe the run at all")
    assert(many === few,
      s"drained windows must not add jobs: 10-empty run $many vs 2-empty $few")
    // Both runs landed the same (drained-cleared) state.
    assert(spark.table(s"$db.few").count() === 2)
    assert(spark.table(s"$db.many").count() === 2)
    spark.sql(s"DROP DATABASE $db CASCADE")
  }

  test("source freshness: status bands, grouped shards, empty source errors") {
    import java.sql.Timestamp
    import spark.implicits._
    import graft.quality.SourceFreshness
    def ts(s: String) = Timestamp.valueOf(s)
    val now = ts("2024-01-10 00:00:00")
    val df = Seq(
      ("fresh", ts("2024-01-09 23:00:00")),   // 1h old
      ("stale", ts("2024-01-08 00:00:00")),   // 2d old
      ("dead", ts("2023-12-01 00:00:00"))     // 40d old
    ).toDF("shard", "ts")
    // Global: the fresh shard's max hides the dead one → pass.
    val g = SourceFreshness.evaluate(df, "ts", now,
      warnAfterS = 86400L, errorAfterS = 86400L * 30).collect()(0)
    assert(g.getString(2) === "pass")
    // Grouped: each shard gets its own band.
    val got = SourceFreshness.evaluate(df, "ts", now,
      86400L, 86400L * 30, groupCols = Seq("shard")).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(got === Map("fresh" -> "pass", "stale" -> "warn", "dead" -> "error"))
    // Zero-row source: null max → error, not a crash.
    val empty = SourceFreshness.evaluate(df.filter(lit(false)), "ts", now,
      60L, 120L).collect()(0)
    assert(empty.isNullAt(0) && empty.getString(2) === "error")
    intercept[IllegalArgumentException] {
      SourceFreshness.evaluate(df, "ts", now, 120L, 60L)
    }
  }

  test("new_record hard deletes: tombstone once, restore re-opens") {
    import java.sql.Timestamp
    import spark.implicits._
    val t = freshTable()
    val src = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    def cfg(ts: String) = SnapshotConfig(Seq("id"),
      SnapshotStrategy.ByCheck(Seq("v")),
      hardDeletes = HardDeletes.NewRecord,
      clock = () => Timestamp.valueOf(ts))
    SnapshotMaterialization.run(spark, t, src, cfg("2024-01-01 00:00:00"))
    // id 2 vanishes → close + tombstone.
    SnapshotMaterialization.run(spark, t, src.filter(col("id") === 1),
      cfg("2024-02-01 00:00:00"))
    // STILL missing → idempotent: no second tombstone, nothing re-closed.
    SnapshotMaterialization.run(spark, t, src.filter(col("id") === 1),
      cfg("2024-02-15 00:00:00"))
    val afterTwo = spark.table(t).filter(col("id") === 2)
      .select("dbt_valid_from", "dbt_valid_to", "dbt_is_deleted")
      .collect().map(r => (String.valueOf(r.get(0)), String.valueOf(r.get(1)),
        r.getString(2))).toSet
    assert(afterTwo === Set(
      ("2024-01-01 00:00:00.0", "2024-02-01 00:00:00.0", "False"),
      ("2024-02-01 00:00:00.0", "null", "True")))
    // Restore with IDENTICAL check values: is_deleted diff must re-open.
    SnapshotMaterialization.run(spark, t, src, cfg("2024-03-01 00:00:00"))
    val restored = spark.table(t).filter(col("id") === 2)
      .select("dbt_valid_from", "dbt_valid_to", "dbt_is_deleted")
      .collect().map(r => (String.valueOf(r.get(0)), String.valueOf(r.get(1)),
        r.getString(2))).toSet
    assert(restored === Set(
      ("2024-01-01 00:00:00.0", "2024-02-01 00:00:00.0", "False"),
      ("2024-02-01 00:00:00.0", "2024-03-01 00:00:00.0", "True"),
      ("2024-03-01 00:00:00.0", "null", "False")))
    // Legacy boolean still selects Invalidate when the enum is unset.
    assert(SnapshotConfig(Seq("id"), SnapshotStrategy.ByCheckAll,
      invalidateHardDeletes = true).deleteMode === HardDeletes.Invalidate)
    spark.sql(s"DROP TABLE $t")
  }

  test("contracts: reorder, type/column/constraint failures are tagged") {
    import spark.implicits._
    import Contracts.ColumnSpec
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String]))
      .toDF("k", "s").select(col("s"), col("k"))
    val contract = Seq(
      ColumnSpec("k", "bigint", notNull = true, check = Some("k > 0")),
      ColumnSpec("s", "string"))
    // Reorders to contract order; null in a non-notNull column passes.
    assert(Contracts.enforce(df, contract).columns.toSeq === Seq("k", "s"))
    // CHECK with NULL result passes (SQL semantics), notNull does not.
    val nullCheck = Seq(ColumnSpec("s", "string", check = Some("s <> 'zz'")))
    assert(Contracts.enforce(df.select("s"), nullCheck).count() === 2)
    val e1 = intercept[IllegalStateException] {
      Contracts.enforce(df.drop("s"), contract)
    }
    assert(e1.getMessage.startsWith("CONTRACT_COLUMNS_MISMATCH") &&
      e1.getMessage.contains("missing=s"))
    val e2 = intercept[IllegalStateException] {
      Contracts.enforce(df.withColumn("k", col("k").cast("int")), contract)
    }
    assert(e2.getMessage.startsWith("CONTRACT_TYPE_MISMATCH") &&
      e2.getMessage.contains("expected BIGINT got INT"))
    val e3 = intercept[IllegalStateException] {
      Contracts.enforce(df,
        contract.map(c => if (c.name == "k") c.copy(notNull = false,
          check = Some("k > 1")) else c))
    }
    assert(e3.getMessage.startsWith("CONTRACT_CONSTRAINT_VIOLATION") &&
      e3.getMessage.contains("check:k (1 rows)"))
  }

  test("hooks: {{ this }} renders; post-hook failure leaves the table") {
    import spark.implicits._
    val t = freshTable()
    val audit = freshTable()
    spark.sql(s"CREATE TABLE $audit (tag STRING) USING parquet")
    Hooks.materializeWithHooks(spark, t, Seq(1, 2, 3).toDF("v"),
      postHooks = Seq(s"INSERT INTO $audit SELECT CAST(COUNT(*) AS STRING) FROM {{ this }}"))
    assert(spark.table(audit).as[String].collect().toSeq === Seq("3"))
    // A failing POST-hook fails the run but the model already built.
    val t2 = freshTable()
    val e = intercept[IllegalStateException] {
      Hooks.materializeWithHooks(spark, t2, Seq(9).toDF("v"),
        postHooks = Seq("INSERT INTO default.absent_xyz VALUES (1)"))
    }
    assert(e.getMessage.startsWith("HOOK_FAILED"))
    assert(spark.table(t2).count() === 1)
  }

  test("content witness: layout-invariant, moves on any row edit/drop/dup") {
    import spark.implicits._
    import graft.queries.MaterializationQueries.contentWitness
    val base = Seq((1L, "a", 1.5), (2L, "b", -2.0), (3L, "b", 0.0))
      .toDF("k", "s", "v")
    val w = contentWitness(base)
    // Layout-only changes (the thing the witness must TOLERATE): row
    // order, partitioning, file count all leave it fixed.
    assert(contentWitness(base.orderBy(desc("k")).repartition(7)) === w)
    assert(contentWitness(base.coalesce(1)) === w)
    // Content changes (the thing it must CATCH): an edited cell, a
    // dropped row, a duplicated row — each with the count unchanged or
    // the sum unchanged being the trap the other component covers.
    val edited = base.withColumn("v",
      when(col("k") === 2L, lit(99.0)).otherwise(col("v")))
    assert(contentWitness(edited) !== w, "edited cell must move the sum")
    assert(contentWitness(base.filter(col("k") =!= 3L)) !== w)
    assert(contentWitness(base.unionAll(base.limit(1))) !== w,
      "a duplicated row must move count AND sum")
    // Null-bearing rows hash, not vanish: the witness still counts them
    // and distinguishes null placements.
    val withNull = base.withColumn("s",
      when(col("k") === 1L, lit(null: String)).otherwise(col("s")))
    assert(contentWitness(withNull) !== w)
    assert(contentWitness(withNull)._1 === 3L)
    // Cross-column value↔null TRANSPOSITION must move the sum: a flat
    // xxhash64(c1, c2, ...) silently skips null inputs, so ('x', null)
    // and (null, 'x') would collide — the review case the per-column
    // pre-hash exists for.
    val ab = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
    val ba = Seq((Option.empty[String], Option("x"))).toDF("a", "b")
    assert(contentWitness(ab) !== contentWitness(ba),
      "null placement across same-typed columns must change the witness")
    // Empty frame: defined, zeroed — not a null-sum crash.
    assert(contentWitness(base.limit(0)) === ((0L, BigInt(0))))
  }

  test("UserModel.runTable materializes a user transform with partitioning") {
    // The table-materialization half of the python-model analog (S8):
    // runIncremental carries the driver gate; this pins runTable — the
    // transform's output becomes the table verbatim, partitioned as asked,
    // and a re-run REPLACES (table semantics, not append).
    val t = s"default.user_model_table_${System.nanoTime()}"
    val ctx = ModelCtx(spark, sf)
    val model: UserModel.Transform = (c, _) =>
      c.source("nation").select(col("n_nationkey"), col("n_name"),
        (col("n_regionkey") % 2).as("bucket"))
    UserModel.runTable(spark, t, ctx, model, partitionBy = Seq("bucket"))
    val got = spark.table(t)
    assert(got.count() === 25)
    assert(got.columns.toSeq.sorted === Seq("bucket", "n_name", "n_nationkey"))
    val parts = spark.sql(s"SHOW PARTITIONS $t")
      .collect().map(_.getString(0)).toSet
    assert(parts === Set("bucket=0", "bucket=1"))
    // Re-run with a narrower transform: replaced, not appended.
    UserModel.runTable(spark, t, ctx, (c, _) =>
      c.source("nation").filter(col("n_regionkey") === 0)
        .select(col("n_nationkey"), col("n_name"),
          (col("n_regionkey") % 2).as("bucket")))
    assert(spark.table(t).count() === 5)
    spark.sql(s"DROP TABLE $t")
  }
}
