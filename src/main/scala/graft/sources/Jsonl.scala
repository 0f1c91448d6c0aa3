package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines corpus source/sink — the interchange format LLM training
  * pipelines actually exchange (one JSON document per line, newline
  * delimited, gzip-friendly, streamable). Thin, deliberately: Spark's
  * native JSON datasource already does distributed line-parallel parsing
  * with predicate/column pruning into the parse; what this wrapper adds is
  * the CONTRACT a corpus pipeline needs:
  *
  *  - writes are single-line JSON objects (no multiline), optionally
  *    compressed — `read(write(df)) ≡ df` for any nullable flat schema;
  *  - reads take an EXPLICIT schema — schema inference over a 100 TB
  *    corpus is a full extra pass and silently widens types on dirty rows;
  *  - corrupt lines are quarantined, not dropped: PERMISSIVE mode with a
  *    `_corrupt_record` column the caller can count/route (a crawl file
  *    with one truncated line must not kill a 1000-executor job, and must
  *    not vanish rows silently either).
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** Read a JSONL corpus with an enforced schema. Rows that fail to parse
    * land with every data column null and the raw line in
    * `_corrupt_record` (added to the schema automatically).
    */
  def read(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(paths: _*)

  /** Write a DataFrame as JSONL. `codec` e.g. "gzip" for the usual
    * compressed shards; partition count = input partitions (repartition
    * upstream to control shard size).
    */
  def write(df: DataFrame, path: String, codec: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    codec.foreach(c => w.option("compression", c))
    w.json(path)
  }
}
