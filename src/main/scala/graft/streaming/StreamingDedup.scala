package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.dedup.Dedup

/** Streaming twin of [[graft.dedup.Dedup.exact]]: keep the first-arriving
  * row per content identity. Identity is the SAME scan-local 128-bit
  * content-hash pair as the batch operator (shared definition —
  * `Dedup.hashKeys` — so batch and stream agree on what "identical"
  * means), which also keeps the state store fixed-width: two longs plus
  * the event-time column per distinct content, never the content itself —
  * at ingest scale the raw text/vector must not enter state.
  *
  * Contract difference vs batch, inherent to streaming: the batch operator
  * picks a deterministic winner per group (min by tie-break) over ALL
  * history; a stream can neither see the future nor hold unbounded state,
  * so the winner is the first row to ARRIVE, and
  * `dropDuplicatesWithinWatermark` expires a content key once the
  * watermark passes its event time + delay — a duplicate arriving beyond
  * the horizon is re-admitted. State is therefore bounded by the distinct
  * contents seen within the watermark window, not by history; the KEPT
  * CONTENT SET over bounded input is identical to batch (StreamingSpec
  * asserts it), only the representative row choice differs.
  */
object StreamingDedup {

  /** Drop rows whose `contentCols` exactly match an earlier row within the
    * watermark horizon. `docs` must be a streaming DataFrame with a
    * watermark already set on its event-time column (the watermark governs
    * state expiry).
    */
  def dropExactDuplicates(docs: DataFrame, contentCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val Seq(h1, h2) = Dedup.hashKeys(contentCols.map(col))
    docs
      .withColumn("__h1", h1)
      .withColumn("__h2", h2)
      .dropDuplicatesWithinWatermark("__h1", "__h2")
      .drop("__h1", "__h2")
  }

  /** Streaming twin of [[graft.dedup.Dedup.exactAgainst]]: drop stream rows
    * byte-identical to a STATIC reference corpus (live decontamination at
    * ingest — scrub a crawl stream against an eval set as it arrives).
    * The reference reduces once to distinct 128-bit content hashes (16 B
    * per distinct content, the same [[Dedup.hashKeys]] identity as batch)
    * and the stream side is a stateless stream-static left-anti join —
    * no watermark, no state store: every micro-batch probes the static
    * (usually broadcast) hash relation scan-locally, so the stream twin
    * keeps exactly the rows the batch operator would keep, row-for-row
    * (StreamingSpec asserts it).
    */
  def dropExactAgainst(stream: DataFrame, streamCols: Seq[String],
      reference: DataFrame, referenceCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(streamCols.length == referenceCols.length,
      "streamCols and referenceCols must align")
    require(!reference.isStreaming,
      "reference must be a static DataFrame (stream-static anti-join)")
    val Seq(h1, h2) = Dedup.hashKeys(streamCols.map(col))
    val refKeys = reference
      .select(Dedup.hashKeys(referenceCols.map(col)): _*)
      .distinct()
    stream
      .withColumn("__h1", h1)
      .withColumn("__h2", h2)
      .join(refKeys, Seq("__h1", "__h2"), "left_anti")
      .drop("__h1", "__h2")
  }
}
