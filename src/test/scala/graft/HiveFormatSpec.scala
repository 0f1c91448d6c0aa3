package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S1 format matrix, hive-SerDe cell — `hive` is in the reference's
  * accepted file-format list (validate.sql:4) and was the one
  * `mat_file_formats` cell still unexercised: a Derby-metastore session
  * round-trips hive-SerDe tables (TEXTFILE via the `hive` writer format
  * and a SQL `STORED AS SEQUENCEFILE` DDL) through the catalog.
  *
  * Runs in its OWN forked JVM (build.sbt `Test / testGrouping` splits
  * this suite out): `spark.sql.catalogImplementation` is a STATIC conf
  * baked into SharedState at first-session creation, so a hive-catalog
  * session cannot coexist with the main suite's in-memory-catalog
  * session in one JVM — exactly why the cell stayed unexercised until
  * now (r10 verdict item 4).
  */
class HiveFormatSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-hive").toString
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-hive-format")
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$tmp/warehouse")
      // Private Derby metastore: a fixed derby home would collide with
      // any other suite run on the host.
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$tmp/metastore_db;create=true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("hive-SerDe round-trip: TEXTFILE writer format + STORED AS DDL") {
    assert(spark.conf.get("spark.sql.catalogImplementation") === "hive")
    val db = "graft_hive_spec"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")
    import spark.implicits._
    val src = Seq((1L, "alpha", 10.5), (2L, "beta", -3.25), (3L, "gamma", 0.0))
      .toDF("id", "name", "score")

    // Cell 1: the `hive` datasource-writer format (what the reference's
    // file_format=hive materializes through).
    src.write.format("hive").option("fileFormat", "textfile")
      .saveAsTable(s"$db.t_text")
    val back = spark.table(s"$db.t_text")
    assert(back.count() === 3)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq ===
      Seq("alpha", "beta", "gamma"))
    // It must be a REAL hive-SerDe table, not a datasource table in
    // disguise: serde recorded in the catalog metadata.
    val desc = spark.sql(s"DESCRIBE FORMATTED $db.t_text")
      .collect().map(r => s"${r.getString(0)}|${Option(r.getString(1)).getOrElse("")}")
    assert(desc.exists(l => l.toLowerCase.contains("lazysimpleserde")),
      s"expected a hive TEXTFILE serde in:\n${desc.mkString("\n")}")

    // Cell 2: SQL DDL with STORED AS + INSERT, a second serde family.
    spark.sql(
      s"""CREATE TABLE $db.t_seq (id BIGINT, name STRING, score DOUBLE)
         |STORED AS SEQUENCEFILE""".stripMargin)
    src.write.mode("append").insertInto(s"$db.t_seq")
    assert(spark.table(s"$db.t_seq").orderBy("id").collect().toSeq ===
      src.orderBy("id").collect().toSeq)

    // The catalog sees both as hive tables (provider hive).
    val provider = spark.sql(s"DESCRIBE FORMATTED $db.t_seq").collect()
      .find(_.getString(0).toLowerCase.startsWith("provider"))
      .map(_.getString(1).trim.toLowerCase)
    assert(provider === Some("hive"))
    spark.sql(s"DROP DATABASE $db CASCADE")
  }

  test("contracted PARTITIONED re-materialization survives the aside drop under the hive catalog") {
    // The contract commit renames the live target ASIDE, renames the stage
    // in, then DROPS the aside. A review pass flagged a plausible hive-side
    // hazard: if the rename left the aside's partition entries pointing
    // under the TARGET's directory, dropping the managed aside could
    // delete the committed table's partition data. A probe disproved it —
    // under the hive catalog a managed-table rename re-points every
    // partition location at the moved directory (and the renamed table
    // reads its rows), so the commit needs no aside repair. This test pins
    // that end-to-end: FaultInjectionSpec runs on the in-memory catalog,
    // whose drop semantics (table directory only) could not catch a
    // hive-side regression in this sequence.
    import graft.materialize.Contracts
    import graft.materialize.Contracts.ColumnSpec
    import spark.implicits._
    val db = "graft_hive_contract"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")
    val t = s"$db.c_part"
    val contract =
      Seq(ColumnSpec("k", "bigint", notNull = true), ColumnSpec("s", "string"))
    Contracts.materialize(spark, t,
      Seq((1L, "p1"), (2L, "p2")).toDF("k", "s"), contract,
      partitionBy = Seq("s"))
    assert(spark.table(t).count() === 2)
    // Re-materialize OVER the live partitioned target: the full
    // rename-aside → rename-in → drop-aside sequence runs.
    Contracts.materialize(spark, t,
      Seq((9L, "p1"), (8L, "p3"), (7L, "p2")).toDF("k", "s"), contract,
      partitionBy = Seq("s"))
    // Every partition of the committed table must still read after the
    // aside dropped (pre-repair-fix, the drop deleted them out from under
    // the new table).
    assert(spark.table(t).count() === 3)
    assert(spark.table(t).select("k").as[Long].collect().sorted.toSeq
      === Seq(7L, 8L, 9L))
    assert(spark.table(t).select("s").distinct().as[String].collect().sorted
      .toSeq === Seq("p1", "p2", "p3"))
    assert(!spark.catalog.tableExists(s"${t}__contract_old"))
    assert(!spark.catalog.tableExists(s"${t}__contract_stage"))
    spark.sql(s"DROP DATABASE $db CASCADE")
  }

  test("staged-commit crash recovery replays under the hive catalog") {
    // FaultInjectionSpec pins the staged-commit recovery contract on the
    // in-memory catalog; both replay modes lean on catalog-specific
    // semantics (dynamic-partition insertInto, ALTER TABLE DROP PARTITION,
    // drop-and-recreate saveAsTable), so the same crash → recover sequence
    // is pinned once under the Derby hive metastore too.
    import graft.core.Failpoints
    import graft.materialize.{IncrementalConfig, IncrementalMaterialization, IncrementalStrategy, Staging}
    import spark.implicits._
    val db = "graft_hive_staged"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")
    try {
      // dynamic_overwrite replay: partition-scoped merge whose key update
      // moves the only row out of partition a — recovery must land the
      // overwrite AND the recorded drained-partition drop.
      val t = s"$db.m_part"
      val cfg = IncrementalConfig(IncrementalStrategy.Merge,
        uniqueKey = Seq("k"), partitionBy = Seq("p"))
      IncrementalMaterialization.run(spark, t,
        Seq((1L, "a", "x1"), (2L, "b", "x2")).toDF("k", "p", "v"), cfg)
      Failpoints.arm("staged.commit")
      intercept[IllegalStateException] {
        IncrementalMaterialization.run(spark, t,
          Seq((1L, "b", "x1new")).toDF("k", "p", "v"), cfg)
      }
      Staging.recoverStagedCommit(spark, t)
      assert(spark.table(t).select("k", "p", "v").orderBy("k")
        .as[(Long, String, String)].collect().toSeq
        === Seq((1L, "b", "x1new"), (2L, "b", "x2")))
      assert(spark.sql(s"SHOW PARTITIONS $t").as[String].collect().toSeq
        === Seq("p=b"))

      // replace_table replay: unpartitioned merge recovery.
      val u = s"$db.m_flat"
      val cfgF = IncrementalConfig(IncrementalStrategy.Merge,
        uniqueKey = Seq("k"))
      IncrementalMaterialization.run(spark, u,
        Seq((1L, "a"), (2L, "b")).toDF("k", "v"), cfgF)
      Failpoints.arm("staged.commit")
      intercept[IllegalStateException] {
        IncrementalMaterialization.run(spark, u,
          Seq((2L, "b2"), (3L, "c")).toDF("k", "v"), cfgF)
      }
      Staging.recoverStagedCommit(spark, u)
      assert(spark.table(u).orderBy("k").as[(Long, String)].collect().toSeq
        === Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    } finally {
      Failpoints.disarmAll()
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
