package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Failpoints
import graft.materialize.{Contracts, RelationOps}
import graft.materialize.Contracts.ColumnSpec
import graft.quality.Governance

/** Crash-window specs (r11 verdict item 3): every multi-step catalog
  * mutation with a recovery path gets its failure window exercised
  * DIRECTLY via [[Failpoints]] — the injected error lands exactly between
  * the two steps the window separates, and the spec asserts the
  * documented contract: either a full rollback (a table with the original
  * contents stays bound to the target name) or a named, durable recovery
  * artifact plus a working recovery call.
  *
  * Windows covered:
  *   - `erase.overwrite`   — eraseKeys dies mid-overwrite (Governance)
  *   - `contract.rename_in`— staged contract commit dies after the target
  *                           was renamed aside (Lifecycle)
  *   - `relayout.rebuild`  — relayout CTAS dies after the rename-aside
  *                           (RelationOps.evolvePartitioning/compact)
  */
class FaultInjectionSpec extends AnyFunSuite with BeforeAndAfterEach {
  import SparkTestSession._
  import spark.implicits._

  override def afterEach(): Unit = Failpoints.disarmAll()

  private var n = 0
  private def fresh(tag: String): String = { n += 1; s"default.fi_${tag}_$n" }

  // ------------------------------------------------------------ eraseKeys

  test("eraseKeys crash window: stage survives, retry fails fast, recovery restores") {
    val t = fresh("erase")
    val stage = s"${t}__erase_stage"
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (3L, "d")).toDF("uid", "payload")
      .write.saveAsTable(t)

    // 1. The overwrite dies mid-erasure: the error names the recovery
    //    call, and the stage holds the survivors durably.
    Failpoints.arm("erase.overwrite")
    val e1 = intercept[IllegalStateException] {
      Governance.eraseKeys(spark, t, "uid", Seq(3L).toDF("k"))
    }
    assert(e1.getMessage.contains("recoverErasure"))
    assert(e1.getCause.isInstanceOf[Failpoints.Injected])
    assert(spark.catalog.tableExists(stage), "recovery stage must survive")
    val staged = spark.table(stage).select("uid").as[Long].collect().sorted
    assert(staged.toSeq === Seq(1L, 2L), "stage must hold the survivors")

    // 2. The natural retry must NOT rebuild the stage from the (possibly
    //    truncated) target — it fails fast, stage untouched (the r11
    //    advice: the old behavior silently destroyed the only recovery
    //    copy while the retry appeared to succeed).
    val e2 = intercept[IllegalStateException] {
      Governance.eraseKeys(spark, t, "uid", Seq(3L).toDF("k"))
    }
    assert(e2.getMessage.contains("recoverErasure"))
    assert(spark.table(stage).count() === 2, "retry must not touch the stage")

    // 3. Recovery completes the erasure from the stage and retires it.
    assert(Governance.recoverErasure(spark, t) === 2L)
    assert(!spark.catalog.tableExists(stage))
    assert(spark.table(t).select("uid").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L))

    // 4. The primitive is usable again after recovery.
    val (b, p, a) = Governance.eraseKeys(spark, t, "uid", Seq(2L).toDF("k"))
    assert((b, p, a) === ((2L, 1L, 1L)))
    spark.sql(s"DROP TABLE $t")
  }

  test("recoverErasure without a stage refuses loudly") {
    val t = fresh("erase_nostage")
    Seq((1L, "a")).toDF("uid", "payload").write.saveAsTable(t)
    val e = intercept[IllegalArgumentException] {
      Governance.recoverErasure(spark, t)
    }
    assert(e.getMessage.contains("no erasure recovery stage"))
    spark.sql(s"DROP TABLE $t")
  }

  // --------------------------------------------------- contract commit

  private val contract =
    Seq(ColumnSpec("k", "bigint", notNull = true), ColumnSpec("s", "string"))

  test("contract commit crash window: original stays bound, no stage/aside debris") {
    val t = fresh("contract")
    Contracts.materialize(spark, t,
      Seq((1L, "old"), (2L, "old")).toDF("k", "s"), contract)

    Failpoints.arm("contract.rename_in")
    intercept[Failpoints.Injected] {
      Contracts.materialize(spark, t,
        Seq((9L, "new")).toDF("k", "s"), contract)
    }
    // Full rollback: a TABLE with the ORIGINAL contents is still bound to
    // the target name (the r11 shape dropped the target first — this
    // window used to leave NO table bound to the name).
    assert(spark.catalog.tableExists(t))
    assert(spark.table(t).select("s").distinct().as[String].collect().toSeq
      === Seq("old"))
    assert(!spark.catalog.tableExists(s"${t}__contract_stage"))
    assert(!spark.catalog.tableExists(s"${t}__contract_old"))

    // Disarmed (one-shot), the rebuild lands.
    Contracts.materialize(spark, t, Seq((9L, "new")).toDF("k", "s"), contract)
    assert(spark.table(t).select("s").as[String].collect().toSeq === Seq("new"))
    assert(!spark.catalog.tableExists(s"${t}__contract_old"))
    spark.sql(s"DROP TABLE $t")
  }

  test("contract commit crash window: PARTITIONED original restores readable") {
    val t = fresh("contract_part")
    Contracts.materialize(spark, t,
      Seq((1L, "p1"), (2L, "p2"), (3L, "p2")).toDF("k", "s"), contract,
      partitionBy = Seq("s"))
    assert(spark.table(t).count() === 3)

    Failpoints.arm("contract.rename_in")
    intercept[Failpoints.Injected] {
      Contracts.materialize(spark, t,
        Seq((9L, "px")).toDF("k", "s"), contract, partitionBy = Seq("s"))
    }
    // The rollback rename breaks partition locations exactly like the
    // forward one — the restored table must still READ its rows (an
    // unrepaired restore reads empty).
    assert(spark.table(t).count() === 3, "restored partitioned table reads")
    assert(spark.table(t).select("k").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 3L))
    spark.sql(s"DROP TABLE $t")
  }

  test("contract commit over a VIEW target: view dropped, failure leaves name unbound but data-free") {
    val t = fresh("contract_view")
    spark.sql(s"CREATE VIEW $t AS SELECT 1L AS k, 'v' AS s")
    // Success path: re-materializing a view as a contracted table works.
    Contracts.materialize(spark, t, Seq((5L, "t")).toDF("k", "s"), contract)
    assert(spark.catalog.getTable(t).tableType !== "VIEW")
    assert(spark.table(t).select("k").as[Long].head() === 5L)
    spark.sql(s"DROP TABLE $t")
  }

  test("contract commit over a VIEW target: rename-in failure preserves the staged build") {
    val t = fresh("contract_view_fail")
    spark.sql(s"CREATE VIEW $t AS SELECT 1L AS k, 'v' AS s")
    // A view has no data to rename aside, so when the rename-in dies the
    // staged build is the ONLY copy of the validated data — the commit
    // must surface it as the named recovery artifact, never drop it.
    Failpoints.arm("contract.rename_in")
    val e = intercept[IllegalStateException] {
      Contracts.materialize(spark, t, Seq((5L, "t")).toDF("k", "s"), contract)
    }
    assert(e.getMessage.contains("__contract_stage"))
    assert(e.getCause.isInstanceOf[Failpoints.Injected])
    assert(!spark.catalog.tableExists(t), "target name stays unbound")
    val stage = s"${t}__contract_stage"
    assert(spark.catalog.tableExists(stage), "staged build preserved")
    assert(spark.table(stage).select("k").as[Long].head() === 5L)
    // The documented recovery — rename the stage into place — completes.
    RelationOps.rename(spark, stage, t)
    assert(spark.table(t).select("k").as[Long].head() === 5L)
    spark.sql(s"DROP TABLE $t")
  }

  // ----------------------------------------------------------- relayout

  test("relayout crash window: original table renames back with contents") {
    val t = fresh("relayout")
    Seq((1L, "p1"), (2L, "p2"), (3L, "p2")).toDF("k", "s")
      .write.saveAsTable(t)

    Failpoints.arm("relayout.rebuild")
    intercept[Failpoints.Injected] {
      RelationOps.evolvePartitioning(spark, t, Seq("s"))
    }
    assert(spark.catalog.tableExists(t))
    assert(spark.table(t).select("k").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 3L))
    assert(!spark.catalog.tableExists(s"${t}__evolve_src"))

    // And the evolution still works once the fault clears.
    RelationOps.evolvePartitioning(spark, t, Seq("s"))
    assert(spark.table(t).count() === 3)
    spark.sql(s"DROP TABLE $t")
  }

  test("relayout crash window: PARTITIONED source restores readable") {
    val t = fresh("relayout_part")
    Seq((1L, "p1"), (2L, "p2"), (3L, "p2")).toDF("k", "s")
      .write.partitionBy("s").saveAsTable(t)

    Failpoints.arm("relayout.rebuild")
    intercept[Failpoints.Injected] {
      RelationOps.compact(spark, t)
    }
    // Rollback repaired the partition entries — the restored table reads.
    assert(spark.table(t).count() === 3, "restored partitioned table reads")
    spark.sql(s"DROP TABLE $t")
  }
}
