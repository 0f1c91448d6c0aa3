package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * The DECODE step is REAL for the formats pure JVM code can parse without
  * native codec libraries — PPM (P6) and BMP (24-bit) images, WAV (16-bit
  * PCM) audio ([[MediaCodecs]]) — producing genuine luminance/amplitude
  * histograms and container dimensions. Formats that require native codecs
  * (JPEG/PNG/MP3/H.264 — unavailable in this environment) take a clearly
  * marked `raw` byte-histogram fallback. The surrounding plumbing — the
  * (media, meta) schema, the mapPartitions batch shape (the Scala analog
  * of `mapInPandas`), the fixed-width feature output, partition-parallel
  * execution — is the production shape a 100 TB media pipeline needs:
  * features compute scan-local with no shuffle.
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
    StructField("format", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("histogram", ArrayType(DoubleType), nullable = false)))

  /** Per-partition batch decode ([[MediaCodecs.decode]]): PPM/BMP payloads
    * → 16-bin luminance histogram + container dimensions; WAV → 16-bin
    * amplitude histogram + sample count; anything else → the `raw`
    * byte-histogram fallback (dimensions null). One iterator per partition
    * — decoder state initializes once per partition, not once per row (the
    * mapInPandas contract).
    */
  def decode(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        // NULL payloads quarantine as zero-length raw rows (the schema
        // declares media nullable and packDocuments emits NULL for
        // NULL-text docs) — a decode must flag, never abort the job.
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])
        val d = MediaCodecs.decode(bytes)
        Row(id, d.format, bytes.length,
          if (d.width < 0) null else Int.box(d.width),
          if (d.height < 0) null else Int.box(d.height),
          if (d.nSamples < 0) null else Long.box(d.nSamples),
          d.histogram.toSeq)
      }
    }(enc)
  }

  /** Deterministic media fixtures with hand-computable features — used by
    * the `mm_decode` driver gate and the codec specs so a DuckDB oracle
    * (which cannot run the decoders) can still pin every decoded value.
    */
  object Fixtures {
    /** 16×16 P6 PPM; pixel i (row-major) is gray level i (0..255, each
      * exactly once) → luminance histogram uniform: 1/16 per bin.
      */
    def ppmGradient16: Array[Byte] = {
      val header = "P6\n16 16\n255\n".getBytes("US-ASCII")
      val raster = new Array[Byte](16 * 16 * 3)
      var i = 0
      while (i < 256) {
        raster(i * 3) = i.toByte
        raster(i * 3 + 1) = i.toByte
        raster(i * 3 + 2) = i.toByte
        i += 1
      }
      header ++ raster
    }

    /** 4×4 24-bit uncompressed BMP, every pixel gray 128 → histogram
      * bin 8 = 1.0. Rows are 12 bytes (already 4-byte aligned).
      */
    def bmpGray4: Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(54 + 4 * 12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte)
      buf.putInt(54 + 48) // file size
      buf.putInt(0)       // reserved
      buf.putInt(54)      // pixel data offset
      buf.putInt(40)      // BITMAPINFOHEADER size
      buf.putInt(4)       // width
      buf.putInt(4)       // height (bottom-up)
      buf.putShort(1)     // planes
      buf.putShort(24)    // bpp
      buf.putInt(0)       // BI_RGB
      buf.putInt(48)      // image size
      buf.putInt(2835).putInt(2835) // 72 dpi
      buf.putInt(0).putInt(0)       // palette
      var i = 0
      while (i < 48) { buf.put(128.toByte); i += 1 }
      buf.array()
    }

    /** 8-sample mono 16-bit PCM WAV alternating +16384 / −16384 →
      * amplitude bins 12 and 4 at 0.5 each.
      */
    def wavAlternating8: Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(44 + 16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + 16)
      buf.put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      buf.putShort(1)      // PCM
      buf.putShort(1)      // mono
      buf.putInt(8000)     // sample rate
      buf.putInt(16000)    // byte rate
      buf.putShort(2)      // block align
      buf.putShort(16)     // bits per sample
      buf.put("data".getBytes("US-ASCII")).putInt(16)
      var i = 0
      while (i < 8) {
        buf.putShort(if (i % 2 == 0) 16384.toShort else (-16384).toShort)
        i += 1
      }
      buf.array()
    }

    /** A minimal mono PCM-16 WAV around arbitrary samples — the general
      * fixture builder for the audio-window/silence gates (same header
      * layout as [[wavAlternating8]]).
      */
    def wavPcm(samples: Array[Short]): Array[Byte] = {
      val dataBytes = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      buf.put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      buf.putShort(1)      // PCM
      buf.putShort(1)      // mono
      buf.putInt(8000)     // sample rate
      buf.putInt(16000)    // byte rate
      buf.putShort(2)      // block align
      buf.putShort(16)     // bits per sample
      buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
      samples.foreach(buf.putShort)
      buf.array()
    }
  }

  val resizeSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("src_width", IntegerType, nullable = true),
    StructField("src_height", IntegerType, nullable = true),
    StructField("out_width", IntegerType, nullable = true),
    StructField("out_height", IntegerType, nullable = true),
    StructField("luma", ArrayType(IntegerType), nullable = false)))

  /** Per-partition batch RESIZE ([[MediaCodecs.resizeNearest]]): decodable
    * images (PPM/BMP) → a top-down `targetW × targetH` nearest-neighbor
    * luminance grid (row-major `luma` array) + source dimensions;
    * non-image payloads pass through as format `raw` with null dimensions
    * and an empty grid — flagged, never dropped, never fatal (the decode
    * module's quarantine convention). Same scale shape as [[decode]]:
    * scan-local mapPartitions, no shuffle, decoder state per partition.
    * Real pipelines feed the grid to a vision encoder; here it IS the
    * output, which keeps every resized pixel oracle-checkable.
    */
  def resize(spark: SparkSession, media: DataFrame,
      targetW: Int, targetH: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(resizeSchema)
    media.select("media_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        MediaCodecs.lumaGrid(bytes) match {
          case Some(g) =>
            Row(id, g.format, Int.box(g.width), Int.box(g.height),
              Int.box(targetW), Int.box(targetH),
              MediaCodecs.resizeNearest(g, targetW, targetH).toSeq)
          case None =>
            Row(id, "raw", null, null, null, null, Seq.empty[Int])
        }
      }
    }(enc)
  }

  val aHashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("sig", LongType, nullable = true)))

  /** Perceptual average-hash (aHash) signatures: decode → nearest-neighbor
    * resize to an 8×8 luma grid → one bit per cell (luma ≥ integer grid
    * mean), packed row-major into a 64-bit signature. Uniform brightness
    * shifts move every cell AND the mean together, so small global
    * perturbations (re-encodes, gamma nudges) keep the signature stable —
    * the classic image near-dup key. Flat images all hash to the all-ones
    * signature (every cell equals the mean): visually they ARE
    * near-identical flat frames, which is aHash's documented behavior,
    * not a bug. Non-image payloads get a null signature. Scan-local
    * mapPartitions like [[decode]]; only (id, 8-byte sig) ever needs to
    * leave the scan.
    */
  def aHash(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(aHashSchema)
    media.select("media_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        MediaCodecs.lumaGrid(bytes) match {
          case Some(g) =>
            val cells = MediaCodecs.resizeNearest(g, 8, 8)
            val mean = cells.map(_.toLong).sum / 64
            var sig = 0L
            var i = 0
            while (i < 64) {
              if (cells(i) >= mean) sig |= (1L << i)
              i += 1
            }
            Row(id, g.format, Long.box(sig))
          case None => Row(id, "raw", null)
        }
      }
    }(enc)
  }

  /** Image near-dup dedup: group decodable payloads by aHash signature,
    * keep each group's minimum id (with the group size); non-image rows
    * are their own survivors. The same one-hash-aggregation scale shape
    * as [[graft.dedup.Dedup.exact]] — 8-byte signatures in the exchange,
    * never pixels or payloads.
    */
  def nearDupSurvivors(spark: SparkSession, media: DataFrame): DataFrame = {
    val sigs = aHash(spark, media)
    val images = sigs.filter(col("sig").isNotNull)
      .groupBy(col("sig"))
      // One min_by over a (media_id, format) struct, not independent
      // mins: two flat images in DIFFERENT containers (a PPM and a BMP)
      // share the all-ones signature, and separate min()s would report
      // the surviving media_id with the OTHER row's format — the
      // survivor's columns must come from one row.
      .agg(min_by(struct(col("media_id"), col("format")), col("media_id"))
        .as("best"),
        count(lit(1)).as("n_dups"))
      .select(col("best.media_id").as("media_id"),
        col("best.format").as("format"), col("n_dups"))
    val raws = sigs.filter(col("sig").isNull)
      .select(col("media_id"), col("format"), lit(1L).as("n_dups"))
    images.unionByName(raws)
  }

  /** Frame sampling stub: slice `n` evenly-spaced byte windows out of the
    * payload ("frames"); real video sampling swaps the slicer, keeps the
    * explode shape.
    */
  def frameSample(media: DataFrame, n: Int, frameBytes: Int = 16): DataFrame = {
    // sequence(0, -1) steps BACKWARDS ([0, -1]) — n = 0 would fabricate
    // two garbage frames instead of none; siblings guard likewise.
    require(n > 0 && frameBytes > 0,
      s"need n ($n) > 0 and frameBytes ($frameBytes) > 0")
    val step = greatest((octet_length(col("media")) / n).cast("int"), lit(1))
    media.select(col("media_id"),
      posexplode(transform(sequence(lit(0), lit(n - 1)), i =>
        col("media").substr(i * step + 1, lit(frameBytes))))
        .as(Seq("frame_idx", "frame")))
  }

  /** Inter-frame distances: for each sampled frame after the first, the
    * byte-level distance to its predecessor ([[graft.functions
    * .GraftFunctions.byteDistance]] — sum of unsigned byte deltas,
    * missing bytes maximally different). Frame 0 carries NULL (no
    * predecessor), so thresholds never misread the start of a clip as a
    * cut. The window partitions by media_id — one clip's frames, a
    * bounded partition — ordered by frame index.
    */
  def frameDiffs(media: DataFrame, n: Int, frameBytes: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.register(media.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frameSample(media, n, frameBytes)
      .withColumn("__prev", lag(col("frame"), 1).over(w))
      .withColumn("diff", when(col("__prev").isNull, lit(null).cast("long"))
        .otherwise(graft.functions.GraftFunctions
          .byteDistance(col("frame"), col("__prev"))))
      .select(col("media_id"), col("frame_idx"), col("diff"))
  }

  private val audioWindowSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("window_idx", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("energy", LongType, nullable = false)))

  /** Windowed audio statistics over PCM-16 WAV payloads: consecutive
    * `windowSamples`-sample windows, each with its sample count (the
    * tail window may be short), peak |amplitude|, and integer energy
    * (Σ sample² — exact, no float RMS, so a SQL oracle replays it
    * bit-for-bit). Non-WAV payloads produce NO window rows (the
    * quarantine convention for a sample-level operator — there are no
    * samples to window). Scan-local mapPartitions like [[decode]].
    */
  def audioWindows(spark: SparkSession, media: DataFrame,
      windowSamples: Int): DataFrame = {
    require(windowSamples > 0, s"windowSamples must be positive, got $windowSamples")
    val enc = org.apache.spark.sql.Encoders.row(audioWindowSchema)
    media.select("media_id", "media").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        MediaCodecs.pcmSamples(r.getAs[Array[Byte]](1)).toSeq.flatMap { s =>
          s.grouped(windowSamples).zipWithIndex.map { case (w, i) =>
            var peak = 0
            var energy = 0L
            var j = 0
            while (j < w.length) {
              val a = math.abs(w(j))
              if (a > peak) peak = a
              energy += w(j).toLong * w(j)
              j += 1
            }
            Row(id, i, w.length, peak, energy)
          }
        }
      }
    }(enc)
  }

  private val trimSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("first_loud", IntegerType, nullable = true),
    StructField("last_loud", IntegerType, nullable = true),
    StructField("n_trimmed", IntegerType, nullable = false)))

  /** Silence trimming plan: per WAV, the first and last sample whose
    * |amplitude| reaches `threshold` and how many samples leading/
    * trailing silence removal would drop (all of them when the clip
    * never reaches threshold — first/last NULL). The metadata the
    * pipeline uses to slice payloads without a second decode pass.
    */
  def trimSilence(spark: SparkSession, media: DataFrame,
      threshold: Int): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val enc = org.apache.spark.sql.Encoders.row(trimSchema)
    media.select("media_id", "media").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        MediaCodecs.pcmSamples(r.getAs[Array[Byte]](1)).map { s =>
          var first = -1
          var last = -1
          var i = 0
          while (i < s.length) {
            if (math.abs(s(i)) >= threshold) {
              if (first < 0) first = i
              last = i
            }
            i += 1
          }
          if (first < 0) Row(id, s.length, null, null, s.length)
          else Row(id, s.length, Int.box(first), Int.box(last),
            first + (s.length - 1 - last))
        }
      }
    }(enc)
  }

  /** Scene-cut detection: frame indexes whose distance from the previous
    * frame exceeds `threshold` — the shot-boundary primitive a video
    * pipeline runs before per-scene sampling/dedup. Same stub contract
    * as [[frameSample]]: byte-window frames stand in for decoded video;
    * a real decoder swaps the slicer, the detection shape stays.
    */
  def sceneCuts(media: DataFrame, n: Int, threshold: Long,
      frameBytes: Int = 16): DataFrame =
    frameDiffs(media, n, frameBytes)
      .filter(col("diff") > threshold)
      .select(col("media_id"), col("frame_idx").as("cut_idx"), col("diff"))
}
