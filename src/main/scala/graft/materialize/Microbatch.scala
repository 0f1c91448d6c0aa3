package graft.materialize

import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampType}

/** The `microbatch` incremental strategy (dbt-core 1.9): the source is
  * split into consecutive EVENT-TIME windows ("batches") and each batch
  * insert-overwrites exactly its own time partition of the target —
  * giving per-window idempotent rebuilds and independent retry of a
  * failed window, the properties the append/merge strategies lack for
  * late-arriving event data. The reference adapter ships the
  * insert_overwrite primitive this strategy compiles onto
  * (strategies.sql:1-19); the window orchestration itself is dbt-core
  * model config (`incremental_strategy='microbatch'`, `event_time`,
  * `batch_size`, `begin`) — re-expressed here as a first-class runner.
  *
  * Scale shape: each batch is one dynamic-partition insert-overwrite
  * whose scan is bounded by the event-time filter (partition pruning on
  * the derived `batch_start` column makes the REWRITE side touch only
  * that window's files); the window loop is a driver-side metadata loop
  * over period boundaries, each iteration a distributed job. Which
  * windows are NON-EMPTY is computed up front in ONE pass over the run's
  * range (a distinct over truncated event times — one value per covered
  * period, metadata-sized), so drained windows cost a driver-side set
  * lookup instead of one probe job each: a 10-year hourly backfill pays
  * one aggregation, not ~87k sequential LIMIT-1 scans. Backfills re-run
  * any sub-range without touching neighbors.
  */
object Microbatch {

  /** Supported batch granularities (dbt-core's batch_size values). */
  private val truncUnit = Map(
    "hour" -> "hour", "day" -> "day", "month" -> "month", "year" -> "year")

  /** TBLPROPERTIES key recording the granularity a microbatch target was
    * built with — re-runs validate against it (see [[run]]).
    */
  val GranularityProperty = "graft.microbatch.batch_size"

  private val WallClock = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Run `source` into `target` in `batchSize` event-time batches over
    * [begin, end). The target gains a `batch_start` date/timestamp
    * partition column (the batch identity — what a retry overwrites).
    * Batch boundaries are PERIOD-ALIGNED (dbt's contract): `begin` is
    * truncated DOWN to its period start, and the run covers whole
    * periods from there until `end` — so a mid-period `begin` processes
    * its full period (a partial window would make the partition
    * non-idempotent across retries), while rows outside the covered
    * periods are ignored (late data lands on the next run of its own
    * window). A window whose source has drained to zero rows CLEARS its
    * partition (explicit metadata drop) rather than no-op'ing like a raw
    * dynamic overwrite would — re-running a window always lands exactly
    * that window's source truth. Returns the number of batches executed.
    *
    * CONTRACT: `source` must be STABLE for the duration of the run. The
    * drained-vs-non-empty classification is computed once up front (the
    * one-pass pre-pass) while each window's write re-scans `source` — if
    * rows drain out of a window between the pre-pass and that window's
    * turn in a long backfill, its dynamic overwrite sees zero rows and
    * no-ops, leaving the stale partition the drained-window DROP exists
    * to clear (and conversely, rows arriving mid-run land or miss
    * arbitrarily by window position). Run against an immutable snapshot
    * (a committed table/path, not a live view over moving data); a
    * caller that cannot guarantee stability should snapshot or cache the
    * frame first. Re-running the range afterwards reconciles any drift,
    * exactly like the crash-recovery path.
    *
    * Granularity is a TABLE property, not a run parameter: a re-run whose
    * `batchSize` disagrees with what the target was built at FAILS LOUDLY
    * up front. Before this guard an hourly re-run against a day-built
    * table handed a timestamp literal to a DATE partition column — on a
    * drained window that can resolve to the whole day and silently drop
    * 24 hours of data (and a non-empty window died as an opaque write
    * error). The check: the recorded [[GranularityProperty]] when
    * present (recorded BEFORE any window runs — riding the first
    * window's CTAS for a new table, or re-asserted immediately after
    * validation for a pre-existing one — so a crash at any point of any
    * run leaves a self-describing table, modulo the sub-statement gap
    * inside the CTAS itself; distinguishes day/month/year, which share
    * the DATE column type); without it a TIMESTAMP batch_start proves
    * 'hour' (the only size producing one), while a DATE-typed
    * grandfathered table is REFUSED outright — a mismatch is silently
    * lossy in both directions and nothing in the schema or partition
    * values can prove which of day/month/year built it (the error names
    * the one-statement TBLPROPERTIES attestation escape hatch).
    */
  def run(spark: SparkSession, target: String, source: DataFrame,
      eventTimeCol: String, begin: Timestamp, end: Timestamp,
      batchSize: String = "day"): Int = {
    val unit = truncUnit.getOrElse(batchSize.toLowerCase,
      throw new IllegalArgumentException(
        s"unsupported batch_size '$batchSize' " +
          s"(expected one of ${truncUnit.keys.mkString(", ")})"))
    require(begin.before(end), s"empty batch range [$begin, $end)")
    val chrono = unit match {
      case "hour" => ChronoUnit.HOURS
      case "day" => ChronoUnit.DAYS
      case "month" => ChronoUnit.MONTHS
      case "year" => ChronoUnit.YEARS
    }
    // Period boundaries on the driver (metadata plane): truncate `begin`
    // down to its period start, then step until `end` is covered.
    var aligned = begin.toLocalDateTime.truncatedTo(
      if (chrono == ChronoUnit.MONTHS || chrono == ChronoUnit.YEARS)
        ChronoUnit.DAYS else chrono)
    aligned = unit match {
      case "month" => aligned.withDayOfMonth(1)
      case "year" => aligned.withDayOfYear(1)
      case _ => aligned
    }
    val endLdt = end.toLocalDateTime
    // begin < end and aligned <= begin, so there is always >= 1 window.
    val starts = Iterator.iterate(aligned)(_.plus(1, chrono))
      .takeWhile(_.isBefore(endLdt)).toVector
    // The granularity record rides the FIRST window's CTAS as a
    // materialization-channel TBLPROPERTY — a table is self-describing
    // from the moment the first window's materialization returns (the
    // residual exposure is the sub-statement saveAsTable→ALTER gap
    // inside TableMaterialization, for which the attestation hatch
    // remains the backstop; see IncrementalConfig.tableProperties).
    // Before r17 the property was written only AFTER the whole window
    // loop, so a crash on a table's first day/month/year run (≥1
    // committed window, loop unfinished) left a property-less DATE table
    // that validateGranularity REFUSES — the documented "simply re-run
    // the range" recovery then demanded manual attestation on exactly
    // the runs that most need automatic retry.
    val cfg = IncrementalConfig(IncrementalStrategy.InsertOverwrite,
      partitionBy = Seq("batch_start"),
      tableProperties = Map(GranularityProperty -> unit))
    // Parse once, probe the catalog once — existence can only flip
    // false→true (the first window's CTAS), tracked locally.
    val rel = graft.core.Relation.parse(target)
    var targetExists = spark.catalog.tableExists(rel.quoted)
    if (targetExists) {
      validateGranularity(spark, rel.quoted, unit)
      // A validated pre-existing table may still lack the property (an
      // hourly table proven by its TIMESTAMP type) — record it NOW, before
      // any window runs, so one validated run makes the table
      // self-describing no matter where a crash lands. Idempotent for
      // recorded/attested tables (same key, same proven value).
      spark.sql(s"ALTER TABLE ${rel.quoted} SET TBLPROPERTIES " +
        s"('$GranularityProperty'=${graft.core.Relation.sqlLiteral(unit)})")
    }
    // TIMEZONE DISCIPLINE: everything engine-side is anchored in the
    // SESSION timezone's wall clock. Window boundaries enter Spark as
    // wall-clock STRINGS parsed by to_timestamp (session tz) — never as
    // Timestamp literals, whose instant depends on the JVM default zone —
    // so the row filter, date_trunc's truncation, the derived batch_start
    // partition values, the pre-pass keys, and the DROP PARTITION literals
    // all agree by construction even when the JVM default zone differs
    // from spark.sql.session.timeZone (the engine pins UTC sessions; a
    // host JVM on a local zone previously split the filter from the
    // truncation and could misroute windows). The `begin`/`end` Timestamps
    // are read back through the same JVM-default rendering the caller's
    // Timestamp.valueOf used to build them, so the API round-trips
    // wall-clock faithfully.
    def wall(ldt: java.time.LocalDateTime): String = ldt.format(WallClock)
    def wallTs(ldt: java.time.LocalDateTime) =
      to_timestamp(lit(wall(ldt)), "yyyy-MM-dd HH:mm:ss")
    // Non-empty-window pre-pass: ONE distinct over the run's whole range
    // (the last window extends to its period end, possibly past `end` —
    // whole-period coverage is the idempotence contract above), keyed by
    // session-tz wall-clock strings.
    val lastHi = starts.last.plus(1, chrono)
    val nonEmpty: Set[String] = source
      .filter(col(eventTimeCol) >= wallTs(starts.head) &&
        col(eventTimeCol) < wallTs(lastHi))
      .select(date_format(date_trunc(unit, col(eventTimeCol)),
        "yyyy-MM-dd HH:mm:ss").as("__graft_w"))
      .distinct()
      .collect().map(_.getString(0)).toSet // bounded: one row per covered
                                           // period with data — the
                                           // window count, not the data.
    var n = 0
    for (cursor <- starts) {
      if (targetExists && !nonEmpty.contains(wall(cursor))) {
        // A window whose source drained to ZERO rows must still rebuild to
        // its source truth: dynamic overwrite only replaces partitions
        // PRESENT in the batch, so an empty batch would silently leave the
        // window's stale rows in place — the one case where "re-run the
        // window" would not be idempotent (caught by the microbatch crash
        // machine). Clear the window's partition explicitly instead — a
        // metadata-scale drop, and a deliberate strengthening over the
        // reference's raw insert_overwrite compilation, which no-ops here.
        val pval =
          if (unit == "hour") cursor.format(WallClock)
          else cursor.toLocalDate.toString
        spark.sql(s"ALTER TABLE ${rel.quoted} DROP IF EXISTS " +
          s"PARTITION (batch_start=${graft.core.Relation.sqlLiteral(pval)})")
      } else {
        // Batch identity column: DATE for day-and-coarser batches; the
        // truncated TIMESTAMP for hourly (a date cast would merge a day's
        // 24 hourly batches into one partition, and each hour's overwrite
        // would wipe its siblings).
        val bs = date_trunc(unit, col(eventTimeCol))
        val batch = source
          .filter(col(eventTimeCol) >= wallTs(cursor) &&
            col(eventTimeCol) < wallTs(cursor.plus(1, chrono)))
          .withColumn("batch_start",
            if (unit == "hour") bs else bs.cast("date"))
        IncrementalMaterialization.run(spark, target, batch, cfg)
        targetExists = true
      }
      // Crash window BETWEEN batches (FaultInjectionSpec's microbatch
      // machine): a driver death mid-run leaves a committed PREFIX of
      // windows — the documented recovery is simply re-running the range
      // (each window's insert-overwrite is idempotent over its own
      // partition), which the machine asserts under random interleavings.
      graft.core.Failpoints.check("microbatch.window")
      n += 1
    }
    n
  }

  /** Fail loudly when a pre-existing target's granularity disagrees with
    * this run's — see [[run]]'s scaladoc for why silence here loses data.
    */
  private def validateGranularity(spark: SparkSession, quoted: String,
      unit: String): Unit = {
    val recorded = spark.sql(s"SHOW TBLPROPERTIES $quoted")
      .filter(col("key") === GranularityProperty)
      .collect().headOption.map(_.getString(1))
    recorded match {
      case Some(prev) =>
        if (prev != unit) throw new IllegalStateException(
          s"microbatch target $quoted was built with batch_size='$prev' " +
            s"but this run asked for '$unit' — re-running a microbatch " +
            "table at a different granularity would corrupt its " +
            "partitions (rebuild the table, or match the recorded size)")
      case None =>
        val bsType = spark.table(quoted).schema.fields
          .find(_.name == "batch_start").map(_.dataType)
          .getOrElse(throw new IllegalStateException(
            s"microbatch target $quoted exists but has no batch_start " +
              "column — not a microbatch table"))
        val expected = if (unit == "hour") TimestampType else DateType
        if (bsType != expected) throw new IllegalStateException(
          s"microbatch target $quoted partitions batch_start as $bsType " +
            s"but batch_size='$unit' produces $expected — re-running a " +
            "microbatch table at a different granularity would corrupt " +
            "its partitions (rebuild the table, or match the original " +
            "batch_size)")
        // day/month/year all share the DATE column type, so for a
        // grandfathered table (no recorded property) NO granularity is
        // provable from the schema — and a mismatch is silently lossy in
        // BOTH directions (a month run on a day table melts the month
        // into its first-of-month partition; a day run on a month table
        // replaces the whole-month partition with one day's rows).
        // Partition VALUES cannot prove it either: a young day table and
        // a month table both show only period-aligned dates. Refuse
        // loudly and offer the one-statement attestation escape hatch —
        // after which every completed run re-records the property.
        // (Hourly tables are unambiguous: only batch_size='hour'
        // produces a TIMESTAMP batch_start, so the type check above is
        // the whole proof.)
        if (bsType == DateType) throw new IllegalStateException(
          s"microbatch target $quoted has no recorded batch_size and its " +
            "DATE-typed batch_start cannot distinguish day/month/year — " +
            "a mismatched re-run silently corrupts partitions in either " +
            "direction. Attest the granularity it was built at with " +
            s"ALTER TABLE $quoted SET TBLPROPERTIES " +
            s"('$GranularityProperty'='<day|month|year>') and re-run, " +
            "or rebuild the table")
    }
  }
}
