package graft.materialize

import java.sql.Timestamp
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * over period boundaries, each iteration a distributed job. Backfills
  * re-run any sub-range without touching neighbors.
  */
object Microbatch {

  /** Supported batch granularities (dbt-core's batch_size values). */
  private val truncUnit = Map(
    "hour" -> "hour", "day" -> "day", "month" -> "month", "year" -> "year")

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
    var cursor = begin.toLocalDateTime.truncatedTo(
      if (chrono == ChronoUnit.MONTHS || chrono == ChronoUnit.YEARS)
        ChronoUnit.DAYS else chrono)
    cursor = unit match {
      case "month" => cursor.withDayOfMonth(1)
      case "year" => cursor.withDayOfYear(1)
      case _ => cursor
    }
    val endLdt = end.toLocalDateTime
    var n = 0
    val cfg = IncrementalConfig(IncrementalStrategy.InsertOverwrite,
      partitionBy = Seq("batch_start"))
    // Loop-invariant: parse once, probe the catalog once — existence can
    // only flip false→true (the first window's CTAS), tracked locally.
    val rel = graft.core.Relation.parse(target)
    var targetExists = spark.catalog.tableExists(rel.quoted)
    while (cursor.isBefore(endLdt)) {
      val next = cursor.plus(1, chrono)
      val lo = Timestamp.valueOf(cursor)
      val hi = Timestamp.valueOf(next)
      // Batch identity column: DATE for day-and-coarser batches; the
      // truncated TIMESTAMP for hourly (a date cast would merge a day's
      // 24 hourly batches into one partition, and each hour's overwrite
      // would wipe its siblings).
      val bs = date_trunc(unit, col(eventTimeCol))
      val batch = source
        .filter(col(eventTimeCol) >= lit(lo) && col(eventTimeCol) < lit(hi))
        .withColumn("batch_start", if (unit == "hour") bs else bs.cast("date"))
      if (targetExists && batch.isEmpty) {
        // A window whose source drained to ZERO rows must still rebuild to
        // its source truth: dynamic overwrite only replaces partitions
        // PRESENT in the batch, so an empty batch would silently leave the
        // window's stale rows in place — the one case where "re-run the
        // window" would not be idempotent (caught by the microbatch crash
        // machine). Clear the window's partition explicitly instead — a
        // metadata-scale drop, and a deliberate strengthening over the
        // reference's raw insert_overwrite compilation, which no-ops here.
        // (The isEmpty probe is a LIMIT-1 scan under the window's pushed
        // event-time filter — trivial next to the window job it replaces.)
        val pval =
          if (unit == "hour") cursor.format(
            java.time.format.DateTimeFormatter
              .ofPattern("yyyy-MM-dd HH:mm:ss"))
          else cursor.toLocalDate.toString
        spark.sql(s"ALTER TABLE ${rel.quoted} DROP IF EXISTS " +
          s"PARTITION (batch_start=${graft.core.Relation.sqlLiteral(pval)})")
      } else {
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
      cursor = next
    }
    n
  }
}
