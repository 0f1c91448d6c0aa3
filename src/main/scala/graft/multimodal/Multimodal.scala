package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * The DECODE step is a clearly-marked STUB (this container has no image or
  * audio codecs): `decodeStub` derives deterministic fake features from the
  * raw bytes. Everything around it — the (media, meta) schema, the
  * mapPartitions batch shape (the Scala analog of `mapInPandas`), the
  * fixed-width feature output, partition-parallel execution — is the real
  * production plumbing a 100 TB media pipeline needs: features compute
  * scan-local with no shuffle.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** Pack a text corpus into the multimodal shape: the text's UTF-8 bytes
    * stand in for an encoded image payload, with synthetic-but-typed
    * metadata. In production this column comes straight from the lake.
    */
  def packDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("fake/raw").as("format"),
        (pmod(col("doc_id"), lit(64)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 1).cast("int").as("height")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("histogram", ArrayType(DoubleType), nullable = false)))

  /** ??? REAL DECODER GOES HERE ??? — stub: a real implementation would
    * decode the codec (JPEG/PNG/WAV...) inside this per-partition loop.
    * The deterministic fake emits a 16-bin byte histogram as the "feature
    * vector" so downstream plumbing is testable.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "media").mapPartitions { rows =>
      // Batch shape: one iterator per partition — codecs get initialized
      // once per partition, not once per row (the mapInPandas contract).
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Double](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
        val n = math.max(bytes.length, 1)
        Row(id, bytes.length, hist.map(_ / n).toSeq)
      }
    }(enc)
  }

  /** Frame sampling stub: slice `n` evenly-spaced byte windows out of the
    * payload ("frames"); real video sampling swaps the slicer, keeps the
    * explode shape.
    */
  def frameSample(media: DataFrame, n: Int, frameBytes: Int = 16): DataFrame = {
    val step = greatest((octet_length(col("media")) / n).cast("int"), lit(1))
    media.select(col("media_id"),
      posexplode(transform(sequence(lit(0), lit(n - 1)), i =>
        col("media").substr(i * step + 1, lit(frameBytes))))
        .as(Seq("frame_idx", "frame")))
  }
}
