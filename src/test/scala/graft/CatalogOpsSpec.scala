package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Catalog, Relation, Tables}
import graft.materialize._

/** Catalog facade (C1–C5), relation lifecycle ops (S9–S11), user-model
  * harness (S8), identifier quoting, and the partition-scoped merge's
  * cross-partition edge cases.
  */
class CatalogOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private var n = 0
  private def freshDb(): String = {
    n += 1
    val db = s"graft_catspec_$n"
    Catalog.dropSchema(spark, db, cascade = true)
    Catalog.createSchema(spark, db)
    db
  }
  private def nation = Tables.nation(spark, sf)

  test("catalog: create/list/get/drop schema roundtrip") {
    val db = freshDb()
    assert(Catalog.listSchemas(spark).contains(db))
    TableMaterialization.run(spark, s"$db.t1", nation)
    ViewMaterialization.run(spark, s"$db.v1", s"SELECT n_name FROM $db.t1")
    val rels = Catalog.listRelations(spark, db)
    assert(rels.map(_.identifier) === Seq("t1", "v1"))
    assert(rels.map(_.tableType) === Seq("managed", "view"))
    val t1 = Catalog.getRelation(spark, db, "t1")
    assert(t1.exists(_.format.contains("parquet")))
    assert(Catalog.getRelation(spark, db, "nope").isEmpty)
    val snap = Catalog.snapshot(spark, db)
    assert(snap.filter(col("table_name") === "t1").count() === 3) // 3 nation cols
    Catalog.dropSchema(spark, db, cascade = true)
    assert(!Catalog.listSchemas(spark).contains(db))
  }

  test("relation ops: rename table, duplicate view, type-aware drop") {
    val db = freshDb()
    TableMaterialization.run(spark, s"$db.a", nation)
    RelationOps.rename(spark, s"$db.a", s"$db.b")
    assert(!spark.catalog.tableExists(s"$db.a"))
    assert(spark.table(s"$db.b").count() === 25)

    ViewMaterialization.run(spark, s"$db.v", s"SELECT * FROM $db.b WHERE n_regionkey = 0")
    RelationOps.duplicateView(spark, s"$db.v", s"$db.v_copy")
    assert(spark.table(s"$db.v_copy").count() === spark.table(s"$db.v").count())

    // renaming a view goes through recreate+drop
    RelationOps.rename(spark, s"$db.v", s"$db.v_renamed")
    assert(!spark.catalog.tableExists(s"$db.v"))
    assert(spark.table(s"$db.v_renamed").count() === 5)

    RelationOps.drop(spark, s"$db.v_copy")
    assert(!spark.catalog.tableExists(s"$db.v_copy"))
    RelationOps.drop(spark, s"$db.b", purge = true)
    assert(!spark.catalog.tableExists(s"$db.b"))
    RelationOps.drop(spark, s"$db.never_existed") // no-op, no throw
  }

  test("quoted identifiers: reserved-word table name works end-to-end") {
    // Spark's SessionCatalog restricts managed-table names to [A-Za-z0-9_],
    // so the quoting test uses a reserved word — unquoted DDL would fail to
    // parse `select` as an identifier.
    val db = freshDb()
    val t = s"$db.select"
    TableMaterialization.run(spark, t, nation)
    assert(spark.table(Relation.parse(t).quoted).count() === 25)
    val cfg = IncrementalConfig(IncrementalStrategy.Append)
    IncrementalMaterialization.run(spark, t, nation.limit(5), cfg)
    assert(spark.table(Relation.parse(t).quoted).count() === 30)
    RelationOps.drop(spark, t)
    assert(!spark.catalog.tableExists(Relation.parse(t).quoted))
  }

  test("user model routes through incremental merge (S8)") {
    val db = freshDb()
    val t = s"$db.um"
    val ctx = ModelCtx(spark, sf)
    val m1: UserModel.Transform = (c, _) =>
      c.source("nation").select(col("n_nationkey"), lit("v1").as("tag"))
    val m2: UserModel.Transform = (c, _) =>
      c.source("nation").filter(col("n_nationkey") < 5)
        .select(col("n_nationkey"), lit("v2").as("tag"))
    val cfg = IncrementalConfig(IncrementalStrategy.Merge, uniqueKey = Seq("n_nationkey"))
    UserModel.runIncremental(spark, t, ctx, m1, cfg)
    UserModel.runIncremental(spark, t, ctx, m2, cfg)
    val got = spark.table(t)
    assert(got.count() === 25)
    assert(got.filter(col("tag") === "v2").count() === 5)
  }

  test("partition-scoped merge: only touched partitions rewritten; moves + drains handled") {
    val db = freshDb()
    val t = s"$db.part_merge"
    import spark.implicits._
    val base = Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0), (4L, "C", 40.0))
      .toDF("id", "part", "amount")
    val cfg = IncrementalConfig(IncrementalStrategy.Merge,
      uniqueKey = Seq("id"), partitionBy = Seq("part"))
    IncrementalMaterialization.run(spark, t, base, cfg)
    val files0 = partitionFiles(t, "part=C")

    // batch: update id=3 in B, move id=1 from A to B, insert id=5 into B.
    val batch = Seq((3L, "B", 31.0), (1L, "B", 11.0), (5L, "B", 50.0))
      .toDF("id", "part", "amount")
    IncrementalMaterialization.run(spark, t, batch, cfg)
    // saveAsTable puts partition columns last in the catalog schema —
    // select explicitly rather than assuming input order.
    val got = spark.table(t).select("id", "part", "amount").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got === Array((1L, "B", 11.0), (2L, "A", 20.0), (3L, "B", 31.0),
      (4L, "C", 40.0), (5L, "B", 50.0)))
    // untouched partition C was not rewritten (same physical files)
    assert(partitionFiles(t, "part=C") === files0)

    // drain: move every remaining A row to B → partition A must disappear
    val drain = Seq((2L, "B", 21.0)).toDF("id", "part", "amount")
    IncrementalMaterialization.run(spark, t, drain, cfg)
    assert(spark.table(t).filter(col("part") === "A").count() === 0)
    assert(spark.table(t).count() === 5)
    assert(!spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0))
      .exists(_.startsWith("part=A")))
  }

  test("partition-scoped merge: quoted and null partition values drain safely") {
    val db = freshDb()
    val t = s"$db.part_merge_quoted"
    import spark.implicits._
    // partition values an unescaped interpolation would choke on: a single
    // quote inside the value, and a NULL partition value
    val base = Seq((1L, "it's-A", 10.0), (2L, "plain-B", 20.0), (3L, null, 30.0))
      .toDF("id", "part", "amount")
    val cfg = IncrementalConfig(IncrementalStrategy.Merge,
      uniqueKey = Seq("id"), partitionBy = Seq("part"))
    IncrementalMaterialization.run(spark, t, base, cfg)
    // move id=1 out of the quoted partition and id=3 out of the null one:
    // both source partitions drain → DROP PARTITION with escaped literals
    val batch = Seq((1L, "plain-B", 11.0), (3L, "plain-B", 31.0))
      .toDF("id", "part", "amount")
    IncrementalMaterialization.run(spark, t, batch, cfg)
    val got = spark.table(t).select("id", "part", "amount").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got === Array((1L, "plain-B", 11.0), (2L, "plain-B", 20.0),
      (3L, "plain-B", 31.0)))
    val parts = spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0))
    assert(parts.length === 1 && parts.head.startsWith("part=plain-B"),
      s"stale partitions not dropped: ${parts.mkString(",")}")
  }

  test("governance: principal grants are diff-applied and enforced on read") {
    import graft.quality.Governance
    val db = freshDb()
    val t = s"$db.gov_grants"
    TableMaterialization.run(spark, t, nation)
    Governance.defineFilter(spark, t, "r0",
      Governance.CellFilter("n_regionkey = 0", Seq("n_nationkey", "n_name")))
    Governance.defineFilter(spark, t, "all_rows",
      Governance.CellFilter("true", Nil))
    // initial grants
    val d1 = Governance.applyGrants(spark, t,
      Map("alice" -> "r0", "bob" -> "all_rows"))
    assert(d1.added === Map("alice" -> "r0", "bob" -> "all_rows"))
    assert(d1.revoked === Map.empty)
    // re-apply with bob dropped and alice unchanged → diff revokes only bob
    val d2 = Governance.applyGrants(spark, t, Map("alice" -> "r0"))
    assert(d2.added === Map.empty)
    assert(d2.revoked === Map("bob" -> "all_rows"))
    assert(Governance.grants(spark, t) === Map("alice" -> "r0"))
    // enforcement: alice sees the filtered projection, bob is denied
    val forAlice = Governance.readFor(spark, t, "alice")
    assert(forAlice.columns.toSeq === Seq("n_nationkey", "n_name"))
    assert(forAlice.count() === nation.filter(col("n_regionkey") === 0).count())
    intercept[SecurityException] { Governance.readFor(spark, t, "bob") }
  }

  test("governance: tag values with quotes survive the DDL roundtrip") {
    import graft.quality.Governance
    val db = freshDb()
    val t = s"$db.gov_quoted"
    TableMaterialization.run(spark, t, nation)
    val tags = Map("note" -> "it's a 'quoted' value \\ with backslash")
    Governance.setTags(spark, t, tags)
    assert(Governance.tags(spark, t) === tags)
  }

  private def partitionFiles(table: String, part: String): Set[String] = {
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $table")
      .filter(col("col_name") === "Location").collect().head.getString(1)
    val dir = new java.io.File(new java.net.URI(loc).getPath, part)
    Option(dir.listFiles()).map(_.map(f => f.getName + ":" + f.lastModified).toSet)
      .getOrElse(Set.empty)
  }

  test("bucketed tables join without a join-key exchange") {
    val db = freshDb()
    val o = Tables.orders(spark, sf)
    val l = Tables.lineitem(spark, sf)
    TableMaterialization.run(spark, s"$db.ob", o, bucketBy = Some((4, Seq("o_orderkey"))))
    TableMaterialization.run(spark, s"$db.lb", l, bucketBy = Some((4, Seq("l_orderkey"))))
    graft.core.Engine.withConf(spark,
      Map("spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val ob = spark.table(s"$db.ob")
      val lb = spark.table(s"$db.lb")
      val joined = lb.join(ob, lb("l_orderkey") === ob("o_orderkey"))
      assert(joined.count() === l.join(o, l("l_orderkey") === o("o_orderkey")).count())
      assert(PlanCheck.shufflesOn(joined, "l_orderkey").isEmpty,
        "bucketed join must not exchange the lineitem side")
      assert(PlanCheck.shufflesOn(joined, "o_orderkey").isEmpty,
        "bucketed join must not exchange the orders side")
    }
  }

  test("salted aggregate and salted join match their unsalted twins") {
    import graft.operators.Skew
    val o = Tables.orders(spark, sf)
    // Exact decimal: double SUM is order-dependent, and salting reorders
    // the additions — the same reason the oracle-checked queries go
    // through DECIMAL(18,2).
    val dec = col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
    val salted = Skew.saltedAggregate(o, Seq("o_orderstatus"), 8,
      partials = Seq(count(lit(1)).as("pc"), sum(dec).as("ps")),
      finals = Seq(sum(col("pc")).as("n"), sum(col("ps")).cast("double").as("total")))
    val direct = o.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(dec).cast("double").as("total"))
    assert(salted.except(direct).count() === 0)
    assert(direct.except(salted).count() === 0)

    val n = Tables.nation(spark, sf)
    val c = Tables.customer(spark, sf)
      .withColumnRenamed("c_nationkey", "n_nationkey")
    val sj = Skew.saltedJoin(c, n, Seq("n_nationkey"), 8)
    val dj = c.join(n, Seq("n_nationkey"))
    assert(sj.count() === dj.count())
    assert(sj.select("c_custkey", "n_name").except(dj.select("c_custkey", "n_name")).count() === 0)
  }

  test("AQE skew join: planted hot key splits; salted join spreads it") {
    import spark.implicits._
    import graft.operators.Skew
    // 10^5-row hot key 0 against a non-broadcastable right side: AQE's
    // skew-join splitter must fire — the runtime re-plan the 100 TB
    // as-of/salted paths rely on when a key's heat only shows up in
    // shuffle stats. The payload must be INCOMPRESSIBLE (per-row sha2,
    // not a constant pad): skew detection reads compressed map-output
    // sizes, and a constant pad lz4's to nothing, hiding the heat.
    val left = spark.range(0, 100000).select(lit(0L).as("k"),
      sha2(concat(lit("graft-skew"), col("id").cast("string")), 256).as("p"))
      .unionAll(spark.range(1, 2000)
        .select((col("id") % 97 + 1).as("k"),
          sha2(col("id").cast("string"), 256).as("p")))
    val right = spark.range(0, 98).select(col("id").as("k"),
      lit("dim").as("d"))
    graft.core.Engine.withConf(spark, Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8")) {
      val joined = left.join(right, Seq("k"))
      // Execute THIS dataframe (count() would plan its own query and
      // leave joined's AdaptiveSparkPlan un-finalized — skew splitting
      // only shows in the final adaptive plan).
      assert(joined.toLocalIterator().asScala.length === 100000 + 1999)
      assert(PlanCheck.skewJoins(joined).nonEmpty,
        s"AQE did not mark the hot-key join skewed:\n" +
          joined.queryExecution.executedPlan)
    }
    // The explicit salted path must spread the hot key across tasks even
    // with AQE off — its per-task bound is rows(key)/saltBuckets, not
    // rows(key). Assert the hot key's output actually lands on >1
    // partition (the salt did its job), and correctness held above.
    graft.core.Engine.withConf(spark, Map(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8")) {
      val sj = Skew.saltedJoin(left, right, Seq("k"), 8)
      val hotParts = sj.filter(col("k") === 0L)
        .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"))
        .distinct().count()
      assert(hotParts > 1L,
        s"salted join left the hot key on $hotParts partition(s)")
    }
  }

  test("audit column: star projection + fixed clock + dedup-aware path") {
    val ts = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    val out = AuditColumns.withUpdateTs(nation, "update_ts", clock = Some(ts))
    assert(out.columns.toSeq === (nation.columns.toSeq :+ "update_ts"))
    assert(out.select("update_ts").distinct().head.getTimestamp(0) === ts)

    import spark.implicits._
    val versions = Seq((1L, 1, "old"), (1L, 2, "new"), (2L, 1, "only"))
      .toDF("id", "v", "payload")
    val deduped = AuditColumns.withUpdateTs(versions, "update_ts", Some(ts),
      uniqueKey = Seq("id"), latestBy = Seq(col("v").desc))
    assert(deduped.count() === 2)
    assert(deduped.filter(col("id") === 1).head.getString(2) === "new")
  }

  test("governance: tags roundtrip and cell filter enforces rows + columns") {
    import graft.quality.Governance
    val db = freshDb()
    val t = s"$db.gov"
    TableMaterialization.run(spark, t, nation)
    Governance.setTags(spark, t, Map("domain" -> "ref", "tier" -> "gold"))
    assert(Governance.tags(spark, t) === Map("domain" -> "ref", "tier" -> "gold"))
    Governance.setTags(spark, t, Map("tier" -> "silver")) // diff update
    assert(Governance.tags(spark, t)("tier") === "silver")
    Governance.removeTags(spark, t, Seq("domain"))
    assert(Governance.tags(spark, t) === Map("tier" -> "silver"))

    val filter = Governance.CellFilter("n_regionkey = 0", Seq("n_nationkey", "n_name"))
    Governance.createSecuredView(spark, t, s"$db.gov_v", filter)
    val viaView = spark.table(s"$db.gov_v")
    assert(viaView.columns.toSeq === Seq("n_nationkey", "n_name"))
    assert(viaView.count() === 5)
    assert(Governance.applyFilter(nation, filter).count() === 5)
  }

  test("partitioned snapshot: same result as plain SCD2, old partitions untouched") {
    import java.sql.Timestamp
    val db = freshDb()
    val t = s"$db.snap_part"
    import spark.implicits._
    def cfg(ts: String) = SnapshotConfig(Seq("id"),
      SnapshotStrategy.ByCheck(Seq("v")),
      clock = () => Timestamp.valueOf(ts), partitionHistory = true)
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    SnapshotMaterialization.run(spark, t, v1, cfg("2024-01-01 00:00:00"))
    // run 2: id=1 changes → closed into partition 2024-02-01
    SnapshotMaterialization.run(spark, t,
      Seq((1L, "a2"), (2L, "b"), (3L, "c")).toDF("id", "v"), cfg("2024-02-01 00:00:00"))
    val febFiles = partitionFiles(t, "dbt_valid_to_date=2024-02-01")
    assert(febFiles.nonEmpty)
    // run 3: id=2 changes → closed into 2024-03-01; February partition
    // must not be rewritten.
    SnapshotMaterialization.run(spark, t,
      Seq((1L, "a2"), (2L, "b2"), (3L, "c")).toDF("id", "v"), cfg("2024-03-01 00:00:00"))
    assert(partitionFiles(t, "dbt_valid_to_date=2024-02-01") === febFiles)
    val snap = spark.table(t)
    assert(snap.count() === 5) // 3 open + 2 closed versions
    assert(snap.filter(col("dbt_valid_to").isNull).count() === 3)
    assert(snap.filter(col("id") === 1 && col("dbt_valid_to").isNull)
      .head.getAs[String]("v") === "a2")
    // same-day double close: run 4 changes id=3 with the March clock —
    // the existing March partition rows must survive the second write.
    SnapshotMaterialization.run(spark, t,
      Seq((1L, "a2"), (2L, "b2"), (3L, "c2")).toDF("id", "v"), cfg("2024-03-01 00:00:00"))
    assert(spark.table(t)
      .filter(col("dbt_valid_to") === Timestamp.valueOf("2024-03-01 00:00:00"))
      .count() === 2)
  }

  test("partition evolution rewrites layout without losing data (O7 analog)") {
    val db = freshDb()
    val t = s"$db.evolve_me"
    TableMaterialization.run(spark, t, nation)
    assert(intercept[Exception](spark.sql(s"SHOW PARTITIONS $t")) != null)
    RelationOps.evolvePartitioning(spark, t, Seq("n_regionkey"))
    val parts = spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0))
    assert(parts.length === 5 && parts.forall(_.startsWith("n_regionkey=")))
    assert(spark.table(t).count() === 25)
  }

  test("partition evolution rollback restores a readable partitioned table") {
    // A failed relayout (nonexistent partition column) must leave the
    // original table intact AND readable — the rollback rename breaks
    // partition locations exactly like the forward rename, so the repair
    // must run on the rollback path too.
    val db = freshDb()
    val t = s"$db.evolve_rb"
    TableMaterialization.run(spark, t, nation, partitionBy = Seq("n_regionkey"))
    intercept[Exception] {
      RelationOps.evolvePartitioning(spark, t, Seq("no_such_column"))
    }
    assert(spark.catalog.tableExists(t))
    assert(spark.table(t).count() === 25)
    assert(spark.sql(s"SHOW PARTITIONS $t").count() === 5)
  }

  test("engine: job group cancel API is safe when idle (X5)") {
    graft.core.Engine.withJobGroup(spark, "gspec", "noop") {
      assert(spark.range(10).count() === 10)
    }
    graft.core.Engine.cancel(spark, "gspec") // nothing running — must not throw
    val s2 = graft.core.Engine.newSession(spark)
    assert(s2 ne spark)
    assert(s2.sparkContext eq spark.sparkContext)
  }

  test("engine: cancel interrupts a RUNNING job group and the session survives (X5 live)") {
    // The idle test above pins the no-op path; this pins the one that
    // matters in production — a multi-minute scan killed mid-flight.
    // The group is polled ACTIVE via the status tracker before the cancel
    // fires (a cancelJobGroup issued before submission would cancel
    // nothing and the 10^12-row count would run to the Await timeout).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val group = "gspec_live"
    val fut = Future {
      graft.core.Engine.withJobGroup(spark, group, "slow scan") {
        // Minutes of per-row work at spec parallelism — never finishes
        // before the cancel unless cancellation is broken.
        spark.range(1L << 42).filter(col("id") % 7 === 3).count()
      }
    }
    val tracker = spark.sparkContext.statusTracker
    val deadline = System.currentTimeMillis() + 30000
    while (tracker.getJobIdsForGroup(group).isEmpty &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(tracker.getJobIdsForGroup(group).nonEmpty, "job never started")
    graft.core.Engine.cancel(spark, group)
    val e = intercept[Exception] { Await.result(fut, 2.minutes) }
    assert(e.getMessage != null && e.getMessage.toLowerCase.contains("cancel"),
      s"want a cancellation failure, got: ${e.getMessage}")
    // The session (and the shared context) must remain fully usable.
    assert(spark.range(10).count() === 10)
  }

  test("engine: session pool reuses per key, isolates temp views (X2)") {
    import graft.core.Engine.SessionPool
    val a1 = SessionPool.forKey(spark, "model_a")
    val a2 = SessionPool.forKey(spark, "model_a")
    val b = SessionPool.forKey(spark, "model_b")
    assert(a1 eq a2)
    assert(a1 ne b)
    assert(a1.sparkContext eq spark.sparkContext)
    a1.range(3).createOrReplaceTempView("pool_scoped_view")
    assert(a2.catalog.tableExists("pool_scoped_view"))
    assert(!b.catalog.tableExists("pool_scoped_view"))
    SessionPool.clear()
    assert(SessionPool.forKey(spark, "model_a") ne a1)
    SessionPool.clear()
  }

  test("engine: withConf scopes and restores per-model config (X8)") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val before = spark.conf.get(key)
    graft.core.Engine.withConf(spark, Map(key -> "12345")) {
      assert(spark.conf.get(key) === "12345")
    }
    assert(spark.conf.get(key) === before)
  }

  test("location resolution follows custom > root > warehouse default (S12)") {
    val rel = Relation("sales", "orders")
    assert(Locations.resolve(spark, rel, customLocation = Some("/x/y"))
      === "/x/y")
    assert(Locations.resolve(spark, rel, rootLocation = Some("/data/lake/"))
      === "/data/lake/orders")
    assert(Locations.resolve(spark, rel)
      .endsWith("/sales/orders"))
  }
}
