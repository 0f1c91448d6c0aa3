package graft.multimodal

/** Pure-JVM decoders for the uncompressed media formats a sandboxed
  * environment can parse without native codec libraries: PPM (P6) and BMP
  * (24-bit BI_RGB) images, and WAV (16-bit PCM) audio. Each decoder is a
  * plain static-forwardable JVM kernel invoked from the per-partition batch
  * loop in [[Multimodal.decode]] — no Spark types in the signatures, so the
  * hot loop stays allocation-light and the kernels are unit-testable
  * against hand-built byte fixtures.
  *
  * Features are format-appropriate but schema-uniform: a 16-bin normalized
  * histogram (image → luminance bins, audio → amplitude bins, unknown →
  * raw byte bins), plus the dimensions the container declares. Compressed
  * codecs (JPEG/PNG/MP3/H.264) are NOT parseable without native libraries
  * in this environment; they take the `raw` fallback path, which is the
  * honest boundary of what pure JVM code can decode here.
  */
object MediaCodecs {

  /** Decoded media record. `width`/`height` are -1 for audio/raw;
    * `nSamples` is -1 for images/raw. `histogram` always has 16 bins
    * summing to 1 (or all zeros for an empty payload).
    */
  final case class Decoded(
      format: String,
      width: Int,
      height: Int,
      nSamples: Long,
      histogram: Array[Double])

  /** Dispatch on magic bytes; unknown formats fall back to the raw byte
    * histogram (the only remaining "stub" behavior — and still a real,
    * deterministic feature for opaque payloads).
    */
  def decode(bytes: Array[Byte]): Decoded = {
    val d =
      if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
      else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
      else if (bytes.length >= 12 && hasAscii(bytes, 0, "RIFF") &&
        hasAscii(bytes, 8, "WAVE")) decodeWav(bytes)
      else None
    d.getOrElse(rawHistogram(bytes))
  }

  private def hasAscii(bytes: Array[Byte], off: Int, s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (bytes(off + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  private def normalize(hist: Array[Double], n: Long): Array[Double] = {
    if (n > 0) {
      var i = 0
      while (i < hist.length) { hist(i) /= n; i += 1 }
    }
    hist
  }

  /** Raw fallback: high-nibble byte histogram (16 bins). */
  def rawHistogram(bytes: Array[Byte]): Decoded = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
    Decoded("raw", -1, -1, -1L, normalize(hist, bytes.length.toLong))
  }

  /** A decoded image as a TOP-DOWN row-major luminance grid — the spatial
    * form histograms don't need but resize/crop/feature-map operators do.
    * `luma(y * width + x)` is pixel (x, y) in 0..`maxval`.
    */
  final case class LumaGrid(format: String, width: Int, height: Int,
      maxval: Int, luma: Array[Int])

  /** Histogram from a grid — the shared bin rule: luminance scaled by
    * maxval into 16 equal bins, index clamped (garbage payloads can carry
    * pixel bytes above the declared maxval, and an unclamped bin index
    * would throw out of a Spark task). For maxval = 255 this is the
    * classic `lum >> 4`.
    */
  private def gridHistogram(g: LumaGrid): Decoded = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < g.luma.length) {
      hist(math.min(g.luma(i) * 16 / (g.maxval + 1), 15)) += 1
      i += 1
    }
    Decoded(g.format, g.width, g.height, -1L,
      normalize(hist, g.luma.length.toLong))
  }

  /** Spatial decode for whichever image codec recognizes the payload
    * (PPM then BMP); None for audio/unknown bytes.
    */
  def lumaGrid(bytes: Array[Byte]): Option[LumaGrid] =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6')
      lumaGridPpm(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
      lumaGridBmp(bytes)
    else None

  /** Nearest-neighbor resize of a grid to (tw × th): target pixel (x, y)
    * reads source (⌊x·w/tw⌋, ⌊y·h/th⌋) — the standard index mapping,
    * integer arithmetic only (long products: a pathological 2G-pixel
    * declared dimension must not wrap the index math).
    */
  def resizeNearest(g: LumaGrid, tw: Int, th: Int): Array[Int] = {
    require(tw > 0 && th > 0, s"target dims must be positive, got ${tw}x$th")
    // The long-product discipline applies to the TARGET allocation too:
    // 65536×65536 wraps int multiplication to 0 and corrupts the index math.
    require(tw.toLong * th <= Int.MaxValue,
      s"target ${tw}x$th exceeds the 2^31-1 pixel addressable bound")
    val out = new Array[Int](tw * th)
    var y = 0
    while (y < th) {
      val sy = ((y.toLong * g.height) / th).toInt
      var x = 0
      while (x < tw) {
        val sx = ((x.toLong * g.width) / tw).toInt
        out(y * tw + x) = g.luma(sy * g.width + sx)
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------------ PPM
  /** PPM "P6": ASCII header `P6 <width> <height> <maxval>` (whitespace
    * separated, `#` comments allowed) followed by ONE whitespace byte and
    * the binary RGB raster, 1 byte per channel (maxval ≤ 255 supported).
    * Luminance = (r+g+b)/3.
    */
  def lumaGridPpm(bytes: Array[Byte]): Option[LumaGrid] = {
    var pos = 2
    def skipSpaceAndComments(): Unit = {
      var going = true
      while (going && pos < bytes.length) {
        val c = bytes(pos)
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else going = false
      }
    }
    def readInt(): Int = {
      skipSpaceAndComments()
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      if (!any) -1 else v
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    pos += 1 // the single whitespace byte after maxval
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    val need = w.toLong * h * 3
    if (pos + need > bytes.length) return None
    val n = w * h
    val luma = new Array[Int](n)
    var i = 0
    var p = pos
    while (i < n) {
      luma(i) = ((bytes(p) & 0xff) + (bytes(p + 1) & 0xff) + (bytes(p + 2) & 0xff)) / 3
      p += 3; i += 1
    }
    Some(LumaGrid("ppm", w, h, maxval, luma))
  }

  def decodePpm(bytes: Array[Byte]): Option[Decoded] =
    lumaGridPpm(bytes).map(gridHistogram)

  // ------------------------------------------------------------------ BMP
  /** BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER; only the
    * uncompressed (BI_RGB) 24-bit variant is supported — rows padded to
    * 4-byte boundaries, BGR order. A POSITIVE header height means the
    * raster is stored BOTTOM-UP; the grid is normalized to top-down
    * (histograms ignore row order; resize must not).
    */
  def lumaGridBmp(bytes: Array[Byte]): Option[LumaGrid] = {
    if (bytes.length < 54) return None
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def i32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    val dataOffset = i32(10)
    val w = i32(18)
    val hRaw = i32(22)
    val h = math.abs(hRaw)
    val bpp = u16(28)
    val compression = i32(30)
    if (w <= 0 || h == 0 || bpp != 24 || compression != 0) return None
    // dataOffset and the dimensions are attacker/garbage-controlled (any
    // text starting "BM" reaches this parser): reject offsets before the
    // headers end, and compute the stride in LONG — w*3 in int arithmetic
    // would wrap negative for a huge declared width and defeat the bounds
    // check below.
    if (dataOffset < 54) return None
    val strideL = ((w.toLong * 3 + 3) / 4) * 4
    if (dataOffset.toLong + strideL * h > bytes.length) return None
    val stride = strideL.toInt // fits: the whole raster fits in the array
    val bottomUp = hRaw > 0
    val luma = new Array[Int](w * h)
    var row = 0
    while (row < h) {
      val imgRow = if (bottomUp) h - 1 - row else row
      var x = 0
      var p = dataOffset + row * stride
      while (x < w) {
        luma(imgRow * w + x) =
          ((bytes(p) & 0xff) + (bytes(p + 1) & 0xff) + (bytes(p + 2) & 0xff)) / 3
        p += 3; x += 1
      }
      row += 1
    }
    Some(LumaGrid("bmp", w, h, 255, luma))
  }

  def decodeBmp(bytes: Array[Byte]): Option[Decoded] =
    lumaGridBmp(bytes).map(gridHistogram)

  // ------------------------------------------------------------------ WAV
  /** WAV: RIFF container, `fmt ` chunk (PCM format 1, 16-bit), `data`
    * chunk of little-endian signed 16-bit samples (channels interleaved —
    * every sample feeds the histogram). Amplitude bins: (sample + 32768)
    * >> 12, i.e. 16 equal bins over the full signed range.
    */
  def decodeWav(bytes: Array[Byte]): Option[Decoded] =
    pcmSamples(bytes).map { samples =>
      val hist = new Array[Double](16)
      var i = 0
      while (i < samples.length) {
        hist((samples(i) + 32768) >> 12) += 1
        i += 1
      }
      Decoded("wav", -1, -1, samples.length.toLong,
        normalize(hist, samples.length.toLong))
    }

  /** The signed 16-bit PCM sample stream of a WAV payload (the chunk walk
    * behind [[decodeWav]], exposed for the audio-window/silence
    * operators); None when the payload is not a PCM-16 WAV.
    */
  def pcmSamples(bytes: Array[Byte]): Option[Array[Int]] = {
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def i32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    if (bytes.length < 12 || !hasAscii(bytes, 0, "RIFF") ||
      !hasAscii(bytes, 8, "WAVE")) return None
    // pos advances by attacker/garbage-controlled chunk sizes: walk in LONG
    // so a huge declared size cannot wrap pos negative and index the array
    // below zero.
    var pos = 12L
    var fmtOk = false
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= bytes.length && (dataOff < 0 || !fmtOk)) {
      val idOff = pos.toInt
      val size = i32(idOff + 4)
      if (size < 0) return None
      if (hasAscii(bytes, idOff, "fmt ") && pos + 8 + 16 <= bytes.length) {
        val audioFormat = u16(idOff + 8)
        val bits = u16(idOff + 8 + 14)
        fmtOk = audioFormat == 1 && bits == 16
      } else if (hasAscii(bytes, idOff, "data")) {
        dataOff = idOff + 8
        dataLen = math.min(size.toLong, (bytes.length - dataOff).toLong).toInt
      }
      pos += 8L + size + (size & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0) return None
    val n = dataLen / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = (u16(dataOff + i * 2) << 16) >> 16 // sign-extend
      i += 1
    }
    Some(out)
  }
}
