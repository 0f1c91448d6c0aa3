package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface. The reference has no streaming path
  * (SURVEY §1 / §2.7 — verified absent), so this is part of the engine's
  * beyond-parity pipeline surface: the same event aggregations as the batch
  * queries, expressed as an incremental streaming plan with watermarked
  * state. Batch and stream share the transformation, which is the property
  * that matters at scale — one definition, two runtimes.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type — the streaming twin of the
    * batch `evt_tumbling` query. Watermark bounds state: late rows beyond
    * 30 minutes are dropped instead of growing the store forever.
    */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Input/state/output rows for the stateful sessionizer. */
  final case class SessEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Stateful streaming sessionizer — the streaming twin of the batch
    * `evt_sessionize` query, built on `flatMapGroupsWithState` (custom
    * per-key state, the shape Spark offers for semantics windows can't
    * express). A session closes when the FLOOR-SECOND gap between
    * consecutive events strictly exceeds `gapSeconds` (exactly
    * `gapSeconds` keeps the session — the batch gate's precise contract;
    * floored integer seconds are what both engines replay bit-for-bit):
    * closure by a newer event emits immediately; the trailing open session
    * emits when the event-time watermark passes its gap (state is then
    * dropped, so the store is bounded by ACTIVE users, not history).
    *
    * Same second-floor gap arithmetic as the batch query so the two agree
    * row-for-row on bounded input (StreamingSpec asserts it), including
    * within-watermark stragglers that land before the held session's
    * start (they lower the start, or chain into their own earlier
    * sessions). The one inherent append-mode divergence: a straggler
    * cannot merge into a session already emitted downstream.
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800,
      watermark: String = "30 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[SessEvent], state: GroupState[SessionState]) =>
          def toSession(s: SessionState) = Session(uid,
            new java.sql.Timestamp(s.start * 1000L),
            new java.sql.Timestamp(s.end * 1000L), s.n)
          if (batch.isEmpty && state.hasTimedOut) {
            // Watermark passed the open session's gap — finalize it.
            val out = state.getOption.map(toSession).toSeq
            state.remove()
            out.iterator
          } else {
            // Events within a micro-batch are unordered; sort before folding.
            val evs = batch.map(e => math.floorDiv(e.ts.getTime, 1000L))
              .toArray.sorted
            val (open, closed) = foldBatch(state.getOption, evs, gapSeconds)
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.end + gapSeconds) * 1000L + 1)
            }
            closed.map(toSession).iterator
          }
      }
  }

  /** One micro-batch's sessionize fold: (held state, ASCENDING event
    * seconds) → (new held state, closed sessions in emission order).
    * Extracted so the cross-batch straggler rules are directly unit-
    * testable (StreamingSpec) without a streaming harness.
    *
    * Within-watermark stragglers OLDER than the held session's reach
    * (sec < start - gap) chain among themselves; a later within-reach
    * straggler LOWERS the held start, like the batch twin's min(ts), and
    * if that lowered start comes within gap of the early chain's end the
    * chain is ABSORBED into the open session (batch semantics bridges
    * through the straggler); otherwise the chain emits as its own closed
    * session, exactly as the batch twin would. Ascending order means
    * stragglers are a batch prefix, so nothing after a merge can re-open
    * a gap. (The one inherent append-mode divergence: a straggler cannot
    * merge into a session that was already emitted.)
    */
  private[graft] def foldBatch(prior: Option[SessionState],
      evs: Array[Long], gapSeconds: Long)
      : (Option[SessionState], Seq[SessionState]) = {
    var open = prior
    val closed = Seq.newBuilder[SessionState]
    var early: Option[SessionState] = None
    def flushEarly(): Unit = { early.foreach(closed += _); early = None }
    evs.foreach { sec =>
      open match {
        case Some(s) if sec < s.start - gapSeconds =>
          early match {
            case Some(e) if sec - e.end > gapSeconds =>
              closed += e
              early = Some(SessionState(sec, sec, 1))
            case Some(e) =>
              early = Some(SessionState(e.start, math.max(e.end, sec), e.n + 1))
            case None =>
              early = Some(SessionState(sec, sec, 1))
          }
        case Some(s) if sec - s.end > gapSeconds =>
          // sec > s.end + gap ≥ early.end + 2·gap, so the chain can never
          // bridge into the NEW session — flushing here is always batch-exact.
          flushEarly()
          closed += s
          open = Some(SessionState(sec, sec, 1))
        case Some(s) =>
          val newStart = math.min(s.start, sec)
          early match {
            case Some(e) if newStart - e.end <= gapSeconds =>
              // The lowered start bridges to the straggler chain: in batch
              // semantics {chain, sec, held} is ONE session. Absorb.
              early = None
              open = Some(SessionState(e.start, math.max(s.end, sec),
                s.n + 1 + e.n))
            case _ =>
              flushEarly()
              open = Some(SessionState(newStart, math.max(s.end, sec), s.n + 1))
          }
        case None =>
          open = Some(SessionState(sec, sec, 1))
      }
    }
    flushEarly()
    (open, closed.result())
  }

  /** Stream-stream interval join — the streaming twin of the batch range
    * join ([[graft.operators.RangeJoin]], `evt_range_join`): clicks
    * matched to view-anchored attribution windows [view ts, view ts +
    * span]. Structured Streaming executes the equality-plus-time-range
    * condition natively as a watermarked stream-stream join; the time
    * bound is what lets it EVICT state — each side's store holds only
    * rows within watermark + span, so state is bounded by stream rate ×
    * window, never by history. (The batch operator solves the same
    * containment problem with bucketing; the streaming runtime solves it
    * with watermarked state — one semantics, two runtimes.)
    */
  def intervalJoin(clicks: DataFrame, views: DataFrame,
      windowSpan: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val v = views.withWatermark("ts", watermark)
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    c.join(v,
        col("c_user") === col("v_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr(s"INTERVAL $windowSpan"))
      .select(col("c_user").as("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Run a bounded stream through `transform` applied PER MICRO-BATCH via
    * foreachBatch, appending each batch's result to `outDir` parquet and
    * returning the union. This is the streaming adapter for batch-only
    * plan shapes — non-time windows, distinct, broadcast-model scoring —
    * that the continuous planner rejects: inside foreachBatch each
    * micro-batch is an ordinary DataFrame, so any batch operator applies
    * unchanged, with per-micro-batch (not global) semantics. Correct for
    * per-row stateless transforms (scoring, filtering, rewriting);
    * anything needing cross-batch state belongs in the watermarked
    * operators above instead.
    */
  def runBoundedForeachBatch(spark: SparkSession, sourceDir: String,
      schema: StructType, transform: DataFrame => DataFrame,
      outDir: String, readOptions: Map[String, String] = Map.empty,
      statePartitions: Option[Int] = None,
      noDataBatch: Boolean = true): DataFrame =
    withStatePartitions(spark, statePartitions) {
      withNoDataBatch(spark, noDataBatch) {
        runBoundedForeachBatchImpl(spark, sourceDir, schema, transform,
          outDir, readOptions)
      }
    }

  /** Scope `spark.sql.shuffle.partitions` for one bounded drain: a
    * streaming query materializes a STATE STORE INSTANCE per shuffle
    * partition per stateful operator, and each instance pays per-batch
    * commit I/O regardless of how little state it holds — on a bounded
    * smoke run sized in the thousands-to-millions of rows, 32 partitions
    * is pure fixed overhead (measured: the stream-stream join gate spends
    * most of its wall time committing near-empty stores). Callers size
    * this to the bounded input; production streams size it to state
    * volume and leave it None. The conf is read at query PLANNING, so
    * scoping the whole start→drain window is sufficient and the session
    * value is restored after.
    */
  private def withStatePartitions[T](spark: SparkSession,
      n: Option[Int])(f: => T): T = n match {
    case Some(p) => graft.core.Engine.withConf(spark,
      Map("spark.sql.shuffle.partitions" -> p.toString))(f)
    case None => f
  }

  /** Scope `spark.sql.streaming.noDataMicroBatches.enabled=false` for one
    * bounded drain. After the last data batch advances the watermark, the
    * engine runs one more ZERO-ROW micro-batch purely to let stateful
    * operators evict/flush against the new watermark — on a bounded drain
    * whose state holds the whole corpus, that empty batch full-scans every
    * state store and can cost as much as the data batch itself (measured:
    * 7 of the interval-join gate's 11 s). Disabling it is sound ONLY when
    * the final no-data batch cannot add output rows: inner stream-stream
    * joins (matches emit on arrival), complete-mode aggregations (every
    * batch emits the full result), stateless transforms, and
    * sentinel-flushed sessionization (closure is driven by planted data
    * rows, not the terminal watermark). Callers whose OUTPUT depends on a
    * terminal watermark flush — append-mode windowed aggs, timeout-driven
    * state emission without sentinels — must leave this enabled.
    */
  private def withNoDataBatch[T](spark: SparkSession,
      enabled: Boolean)(f: => T): T =
    if (enabled) f
    else graft.core.Engine.withConf(spark,
      Map("spark.sql.streaming.noDataMicroBatches.enabled" -> "false"))(f)

  private def runBoundedForeachBatchImpl(spark: SparkSession, sourceDir: String,
      schema: StructType, transform: DataFrame => DataFrame,
      outDir: String, readOptions: Map[String, String]): DataFrame = {
    // Seed the sink with the ZERO-ROW transformed frame first: an empty
    // source produces no micro-batches, and reading back a directory no
    // batch ever wrote would fail schema inference — the seed pins the
    // output schema (derived by running the transform on an empty input)
    // without adding rows.
    transform(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
      .write.mode("append").parquet(outDir)
    val stream = spark.readStream.options(readOptions)
      .schema(schema).parquet(sourceDir)
    val q: StreamingQuery = stream.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        transform(df).write.mode("append").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(outDir)
  }

  /** Run a streaming query over a bounded parquet source into an in-memory
    * sink, synchronously (the local-smoke pattern for streaming jobs:
    * processAllAvailable drains the source, then we read the sink table).
    *
    * `readOptions` reach the file source — pass `maxFilesPerTrigger` to
    * drain the bounded source in several micro-batches instead of one
    * (AvailableNow honors per-batch read limits), the incremental-arrival
    * shape a production stream actually has. `probe` runs after the drain,
    * before stop — the hook for reading per-batch progress
    * (`q.recentProgress`) from harnesses that assert on batch shape.
    */
  def runBoundedToMemory(spark: SparkSession, sourceDir: String,
      schema: StructType, transform: DataFrame => DataFrame,
      sinkName: String, outputMode: String = "append",
      statePartitions: Option[Int] = None,
      noDataBatch: Boolean = true,
      readOptions: Map[String, String] = Map.empty,
      probe: StreamingQuery => Unit = _ => ()): DataFrame =
    withStatePartitions(spark, statePartitions) { withNoDataBatch(spark, noDataBatch) {
    val stream = spark.readStream.options(readOptions)
      .schema(schema).parquet(sourceDir)
    val q: StreamingQuery = transform(stream).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(sinkName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    probe(q)
    q.stop()
    spark.table(sinkName)
  } }
}
