package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the custom Catalyst expressions. Top-level objects get
  * static forwarders, so generated (Janino) code can call these directly —
  * the expressions stay inside whole-stage codegen with one static call per
  * row instead of falling back to interpreted eval.
  */
object Kernels {

  /** FNV-1a 64-bit over a UTF8String's bytes — deterministic token hash. */
  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** SimHash-64 of a token array: per-token 64-bit hashes vote on each bit;
    * the sign of each bit's tally forms the signature. Near-identical token
    * multisets land within a small Hamming distance.
    */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv64(tokens.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Sum of absolute UNSIGNED byte differences over the common prefix of
    * two binary payloads, plus 255 per surplus byte of the longer one (a
    * missing byte is maximally different — without the penalty a frame
    * that truncates to nothing would measure distance 0 from anything).
    * The inter-frame distance behind scene-cut detection.
    */
  def byteDistance(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var d = 0L
    var i = 0
    while (i < n) {
      d += math.abs((a(i) & 0xff) - (b(i) & 0xff))
      i += 1
    }
    d + 255L * (math.max(a.length, b.length) - n)
  }

  /** Document fingerprint: minimum of rolling polynomial (Karp–Rabin) hashes
    * over byte windows of size `window`. O(n) single pass; equal prefixes/
    * suffixes of near-dup docs share window hashes, so the min is stable
    * under small edits.
    */
  def rollingMinHash(s: UTF8String, window: Int): Long = {
    val b = s.getBytes
    if (b.length == 0) return 0L
    if (b.length <= window) return fnv64(s)
    val base = 257L
    var pow = 1L // base^(window-1), wrapping arithmetic is fine (JVM longs)
    var i = 1
    while (i < window) { pow *= base; i += 1 }
    var h = 0L
    i = 0
    while (i < window) { h = h * base + (b(i) & 0xffL); i += 1 }
    var min = mix(h)
    i = window
    while (i < b.length) {
      h = (h - (b(i - window) & 0xffL) * pow) * base + (b(i) & 0xffL)
      val m = mix(h)
      if (m < min) min = m
      i += 1
    }
    min
  }

  /** splitmix64 finalizer — decorrelates consecutive rolling hashes. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1): plane p,
    * dimension j. No driver-side state to broadcast — every executor
    * recomputes the same plane from (p, j).
    */
  def planeComponent(p: Int, j: Int): Double =
    (mix(p.toLong * 100003L + j) >>> 11) * (2.0 / (1L << 53)) - 1.0

  /** Sign-random-projection LSH signature of a float vector: bit p is the
    * sign of the dot product with deterministic hyperplane p. Cosine-similar
    * vectors agree on most bits.
    */
  def signProjection(vec: ArrayData, planes: Int): Long = {
    val n = vec.numElements()
    var sig = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        if (!vec.isNullAt(j)) dot += vec.getFloat(j) * planeComponent(p, j)
        j += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Per-doc word-n-gram occurrence counts for the repetition metrics:
    * key = gram text, value = (occurrences, gram chars). Also returns the
    * whitespace-normalized doc length (token chars + single separators) —
    * the denominator both metrics share. One pass over the token array,
    * per-row state only: this is what keeps the repetition filters
    * scan-local instead of shuffling a gram stream per document.
    */
  private def gramCounts(tokens: ArrayData, n: Int):
      (java.util.HashMap[String, Array[Long]], Long) = {
    val m = new java.util.HashMap[String, Array[Long]]()
    val nTok = tokens.numElements()
    var docLen = 0L
    var i = 0
    while (i < nTok) {
      if (!tokens.isNullAt(i)) docLen += tokens.getUTF8String(i).numChars()
      i += 1
    }
    if (nTok > 1) docLen += nTok - 1
    val nGrams = math.max(nTok - n + 1, 1)
    i = 0
    while (i < nGrams && i < nTok) {
      val sb = new java.lang.StringBuilder()
      var chars = 0L
      var j = i
      val end = math.min(i + n, nTok)
      while (j < end) {
        if (j > i) { sb.append(' '); chars += 1 }
        if (!tokens.isNullAt(j)) {
          val t = tokens.getUTF8String(j)
          sb.append(t.toString); chars += t.numChars()
        }
        j += 1
      }
      val v = m.get(sb.toString)
      if (v == null) m.put(sb.toString, Array(1L, chars)) else v(0) += 1
      i += 1
    }
    (m, docLen)
  }

  /** Character share of the single most repeated word n-gram: max over
    * grams of occurrences × gram chars, over the normalized doc length
    * (a Gopher-style repetition rule). 0.0 for empty docs.
    */
  def topNgramCharFraction(tokens: ArrayData, n: Int): Double = {
    val (m, docLen) = gramCounts(tokens, n)
    if (docLen == 0L) return 0.0
    var best = 0L
    val it = m.values().iterator()
    while (it.hasNext) {
      val v = it.next()
      val w = v(0) * v(1)
      if (w > best) best = w
    }
    best.toDouble / docLen
  }

  /** Character share of all word n-grams occurring more than once
    * (occurrences × gram chars summed over duplicated grams, over the
    * normalized doc length). Overlapping occurrences each count, so
    * heavily-looped boilerplate can exceed 1.0 — callers threshold, not
    * normalize. 0.0 for empty docs.
    */
  def dupNgramCharFraction(tokens: ArrayData, n: Int): Double = {
    val (m, docLen) = gramCounts(tokens, n)
    if (docLen == 0L) return 0.0
    var dup = 0L
    val it = m.values().iterator()
    while (it.hasNext) {
      val v = it.next()
      if (v(0) >= 2L) dup += v(0) * v(1)
    }
    dup.toDouble / docLen
  }

  // One Deflater + output buffer per executor thread: Deflater wraps native
  // zlib state whose per-row allocation would dominate the kernel; reset()
  // between rows reuses it. The output buffer is only a drain — compressed
  // bytes are counted, never kept.
  private val deflaterTL = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
  }
  private val deflateBufTL = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 16)
  }

  /** Deflate compression ratio (compressed bytes / raw bytes) of a
    * string's UTF-8 — the Gopher-style entropy signal: looped boilerplate
    * compresses far below natural prose, random noise barely compresses.
    * Deterministic for a fixed zlib level; 1.0 for the empty string.
    */
  def deflateRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaterTL.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = deflateBufTL.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  /** Nearest-centroid assignment over FLATTENED centroids (k × dim,
    * row-major) with precomputed squared norms. The input vector is
    * L2-normalized INSIDE the kernel — folding the normalization in keeps
    * IVF corpus assignment a single static call (the `transform`/
    * `aggregate` lambda formulation of the same normalization blocks
    * whole-stage codegen for the entire scan stage) — then assignment is
    * argmax(2·(v·c)/‖v‖ − ||c||²) = argmin ||v/‖v‖ − c||², ties to the
    * lowest list id — the same ranking [[graft.similarity.Knn.searchIvf]]'s
    * probe phase uses, so corpus assignment and query probing can never
    * disagree on a boundary point. Zero vectors assign to the
    * smallest-norm centroid (any list is equally wrong for a
    * direction-free point; the choice is deterministic). Returns -1 when
    * there are no centroids. Double-array reader; [[nearestCentroidF]] is
    * the float-array twin.
    */
  def nearestCentroid(vec: ArrayData, cents: Array[Double],
      cnorm2: Array[Double]): Int = {
    val k = cnorm2.length
    if (k == 0) return -1
    val dim = cents.length / k
    val n = math.min(vec.numElements(), dim)
    var nrm2 = 0.0
    var i = 0
    while (i < n) { val x = vec.getDouble(i); nrm2 += x * x; i += 1 }
    val inv = if (nrm2 == 0.0) 0.0 else 1.0 / math.sqrt(nrm2)
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      var dot = 0.0
      i = 0
      while (i < n) { dot += vec.getDouble(i) * cents(off + i); i += 1 }
      val score = 2.0 * dot * inv - cnorm2(c)
      if (score > bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }

  /** [[nearestCentroid]] over a float vector (same normalize-inside
    * semantics, float reader).
    */
  def nearestCentroidF(vec: ArrayData, cents: Array[Double],
      cnorm2: Array[Double]): Int = {
    val k = cnorm2.length
    if (k == 0) return -1
    val dim = cents.length / k
    val n = math.min(vec.numElements(), dim)
    var nrm2 = 0.0
    var i = 0
    while (i < n) { val x = vec.getFloat(i); nrm2 += x.toDouble * x; i += 1 }
    val inv = if (nrm2 == 0.0) 0.0 else 1.0 / math.sqrt(nrm2)
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      var dot = 0.0
      i = 0
      while (i < n) { dot += vec.getFloat(i).toDouble * cents(off + i); i += 1 }
      val score = 2.0 * dot * inv - cnorm2(c)
      if (score > bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }

  // ------------------------------------------------------------------ PQ
  // Product-quantization kernels (the FAISS IVFPQ shape): a vector's
  // residual against its coarse centroid is split into m contiguous
  // subspaces, each encoded as the index of its nearest codeword in a
  // 2^nbits-entry codebook. All tables (coarse centroids, codebooks,
  // codeword norms) are PLAN-TIME constants shipped once per task via the
  // codegen reference table, so corpus encoding and ADC scoring are
  // scan-local static calls inside whole-stage codegen — the index itself
  // is (id, list_id, m bytes) per row: the raw-vector memory drops by
  // dim·4/m, which is what makes a 100 TB corpus's index RAM-resident.

  /** Shared by both element readers: normalize `vec` (length `dim`,
    * missing tail treated 0), subtract coarse centroid `listId`, and
    * nearest-codeword-encode each of the `m` subspaces. Ties break to the
    * lowest code (same rule as [[nearestCentroid]]); `listId` < 0 (no
    * centroids) encodes the normalized vector itself. Returns `m` bytes.
    */
  private def pqEncodeImpl(read: Int => Double, nVec: Int, listId: Int,
      cents: Array[Double], books: Array[Double], bnorm2: Array[Double],
      m: Int, ks: Int): Array[Byte] = {
    val codes = new Array[Byte](m)
    if (ks == 0) return codes
    val dsub = books.length / (m * ks)
    val dim = m * dsub
    val n = math.min(nVec, dim)
    var nrm2 = 0.0
    var i = 0
    while (i < n) { val x = read(i); nrm2 += x * x; i += 1 }
    val inv = if (nrm2 == 0.0) 0.0 else 1.0 / math.sqrt(nrm2)
    val coff = if (listId >= 0) listId * dim else -1
    val r = new Array[Double](dsub)
    var sub = 0
    while (sub < m) {
      val roff = sub * dsub
      var d = 0
      while (d < dsub) {
        val v = if (roff + d < n) read(roff + d) * inv else 0.0
        r(d) = if (coff >= 0) v - cents(coff + roff + d) else v
        d += 1
      }
      var best = 0
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < ks) {
        val boff = (sub * ks + j) * dsub
        var dot = 0.0
        d = 0
        while (d < dsub) { dot += r(d) * books(boff + d); d += 1 }
        val score = 2.0 * dot - bnorm2(sub * ks + j)
        if (score > bestScore) { bestScore = score; best = j }
        j += 1
      }
      codes(sub) = best.toByte
      sub += 1
    }
    codes
  }

  /** PQ-encode a float vector's coarse residual — see [[pqEncodeImpl]]. */
  def pqEncodeF(vec: ArrayData, listId: Int, cents: Array[Double],
      books: Array[Double], bnorm2: Array[Double], m: Int, ks: Int): Array[Byte] =
    pqEncodeImpl(i => vec.getFloat(i).toDouble, vec.numElements(), listId,
      cents, books, bnorm2, m, ks)

  /** PQ-encode a double vector's coarse residual — see [[pqEncodeImpl]]. */
  def pqEncodeD(vec: ArrayData, listId: Int, cents: Array[Double],
      books: Array[Double], bnorm2: Array[Double], m: Int, ks: Int): Array[Byte] =
    pqEncodeImpl(i => vec.getDouble(i), vec.numElements(), listId,
      cents, books, bnorm2, m, ks)

  /** The query half of asymmetric-distance computation: for normalized
    * query q, table[sub·ks + j] = q_sub · codeword[sub][j], so a candidate
    * with codes c scores q·v̂ = q·centroid + Σ_sub table[sub·ks + c_sub] —
    * the residual part is m array lookups per candidate ([[pqAdcScore]]),
    * never a dim-length dot product. O(ks·dim) once per query.
    */
  private def pqAdcTableImpl(read: Int => Double, nVec: Int,
      books: Array[Double], m: Int, ks: Int):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val table = new Array[Double](m * ks)
    if (ks == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(table)
    val dsub = books.length / (m * ks)
    val dim = m * dsub
    val n = math.min(nVec, dim)
    var nrm2 = 0.0
    var i = 0
    while (i < n) { val x = read(i); nrm2 += x * x; i += 1 }
    val inv = if (nrm2 == 0.0) 0.0 else 1.0 / math.sqrt(nrm2)
    var sub = 0
    while (sub < m) {
      val roff = sub * dsub
      var j = 0
      while (j < ks) {
        val boff = (sub * ks + j) * dsub
        var dot = 0.0
        var d = 0
        while (d < dsub) {
          if (roff + d < n) dot += read(roff + d) * inv * books(boff + d)
          d += 1
        }
        table(sub * ks + j) = dot
        j += 1
      }
      sub += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(table)
  }

  /** ADC lookup table for a float query vector — see [[pqAdcTableImpl]]. */
  def pqAdcTableF(vec: ArrayData, books: Array[Double], m: Int, ks: Int): ArrayData =
    pqAdcTableImpl(i => vec.getFloat(i).toDouble, vec.numElements(), books, m, ks)

  /** ADC lookup table for a double query vector — see [[pqAdcTableImpl]]. */
  def pqAdcTableD(vec: ArrayData, books: Array[Double], m: Int, ks: Int): ArrayData =
    pqAdcTableImpl(i => vec.getDouble(i), vec.numElements(), books, m, ks)

  /** Residual part of the ADC score: m table lookups, one per code byte.
    * `table` is a query's [[pqAdcTableF]] output (length m·ks).
    */
  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  /** Unicode NFC normalization — canonical composition, so "e" + combining
    * acute and precomposed "é" hash identically in every downstream dedup.
    * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
    * true for virtually all real text, so the rewrite only runs on the
    * rows that need it.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Apply a trained BPE merge table ([[graft.text.Bpe]]) to one document:
    * lowercase, whitespace-split, then per word run the classic merge loop
    * — seed symbols are the word's UTF-16 chars plus a terminal `</w>`;
    * each iteration merges ALL occurrences of the best-ranked adjacent
    * pair until no pair is in the table. `ranks` maps "left right" → rank
    * (symbols never contain a space, so the key is unambiguous). Scan-
    * local; the merge table is a broadcast plan constant.
    */
  private def bpeMergeWord(w: String,
      ranks: java.util.HashMap[String, Integer]): java.util.ArrayList[String] = {
    var syms = new java.util.ArrayList[String](w.length + 1)
    var ci = 0
    while (ci < w.length) { syms.add(String.valueOf(w.charAt(ci))); ci += 1 }
    syms.add("</w>")
    var done = false
    while (!done && syms.size >= 2) {
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < syms.size - 1) {
        val r = ranks.get(syms.get(i) + " " + syms.get(i + 1))
        if (r != null && r < bestRank) {
          bestRank = r; bestA = syms.get(i); bestB = syms.get(i + 1)
        }
        i += 1
      }
      if (bestA == null) done = true
      else {
        val next = new java.util.ArrayList[String](syms.size)
        i = 0
        while (i < syms.size) {
          if (i < syms.size - 1 && syms.get(i) == bestA &&
              syms.get(i + 1) == bestB) {
            next.add(bestA + bestB); i += 2
          } else { next.add(syms.get(i)); i += 1 }
        }
        syms = next
      }
    }
    syms
  }

  def bpeTokens(text: UTF8String,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val words = wsPattern.split(text.toString.trim.toLowerCase)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val syms = bpeMergeWord(w, ranks)
        var si = 0
        while (si < syms.size) {
          out += UTF8String.fromString(syms.get(si)); si += 1
        }
      }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Tokenize to VOCABULARY IDS — the training-consumable form. `ids`
    * maps symbol → id; symbols outside the vocabulary (characters unseen
    * at training time) take `unk`.
    */
  def bpeTokenIds(text: UTF8String, ranks: java.util.HashMap[String, Integer],
      ids: java.util.HashMap[String, Integer], unk: Int): ArrayData = {
    val words = wsPattern.split(text.toString.trim.toLowerCase)
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val syms = bpeMergeWord(w, ranks)
        var si = 0
        while (si < syms.size) {
          val id = ids.get(syms.get(si))
          out += (if (id == null) unk else id.intValue())
          si += 1
        }
      }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Within-document line dedup: keep the FIRST occurrence of each exact
    * line, preserve order, rejoin with newline. Blank-after-trim lines are
    * structural separators and always kept (the [[graft.text.LineDedup]]
    * contract). One hash-set pass — O(lines) per doc, scan-local.
    */
  def dedupLines(lines: ArrayData): UTF8String = {
    val n = lines.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val sb = new java.lang.StringBuilder
    var first = true
    var i = 0
    while (i < n) {
      val l = lines.getUTF8String(i)
      if (l.trim().numBytes() == 0 || seen.add(l)) {
        if (!first) sb.append('\n')
        sb.append(l.toString)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Int8 scalar quantization of a vector for cosine search: L2-normalize,
    * scale by 127, round half-even, clamp to [-127, 127]. A zero vector
    * encodes to all zeros (its cosine against anything is 0 anyway). One
    * byte per dimension — 4× narrower than float32, so a quantized corpus
    * scan moves a quarter of the bytes and the dot product runs in integer
    * arithmetic.
    */
  def sq8EncodeF(vec: ArrayData): Array[Byte] = {
    val n = vec.numElements()
    val out = new Array[Byte](n)
    var norm = 0.0
    var i = 0
    while (i < n) { val x = vec.getFloat(i).toDouble; norm += x * x; i += 1 }
    if (norm > 0.0) {
      val s = 127.0 / math.sqrt(norm)
      i = 0
      while (i < n) {
        var q = math.rint(vec.getFloat(i) * s).toInt
        if (q > 127) q = 127 else if (q < -127) q = -127
        out(i) = q.toByte
        i += 1
      }
    }
    out
  }

  def sq8EncodeD(vec: ArrayData): Array[Byte] = {
    val n = vec.numElements()
    val out = new Array[Byte](n)
    var norm = 0.0
    var i = 0
    while (i < n) { val x = vec.getDouble(i); norm += x * x; i += 1 }
    if (norm > 0.0) {
      val s = 127.0 / math.sqrt(norm)
      i = 0
      while (i < n) {
        var q = math.rint(vec.getDouble(i) * s).toInt
        if (q > 127) q = 127 else if (q < -127) q = -127
        out(i) = q.toByte
        i += 1
      }
    }
    out
  }

  /** Approximate cosine of two [[sq8EncodeF]] codes: integer dot product
    * rescaled by 127² (both inputs are unit vectors scaled to 127, so the
    * int dot is cosine·127² up to rounding). Pure int multiply-adds over
    * byte arrays — the quantized scan kernel.
    */
  def sq8Dot(a: Array[Byte], b: Array[Byte]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc / (127.0 * 127.0)
  }

  def pqAdcScore(codes: Array[Byte], table: ArrayData): Double = {
    val m = codes.length
    if (m == 0) return 0.0
    val ks = table.numElements() / m
    var s = 0.0
    var sub = 0
    while (sub < m) {
      s += table.getDouble(sub * ks + (codes(sub) & 0xff))
      sub += 1
    }
    s
  }

  /** Cosine similarity of two float vectors (0.0 when either norm is 0). */
  /** Rebuild a document's text with every token covered by a flagged
    * n-gram span removed. `starts` holds the 1-based token positions where
    * a duplicated n-gram begins (any order, duplicates fine); a token at
    * position t is dropped iff some start p satisfies p <= t < p + n.
    * One sorted two-pointer sweep: O(tokens + starts·log starts), no
    * per-token scan over the span list — the scan-local cost stays linear
    * even when a boilerplate-heavy doc flags most of its grams. `sep`
    * rejoins the kept elements (space for word tokens, newline when the
    * "tokens" are a document's lines — the line-dedup rewrite).
    */
  def removeSpans(tokens: ArrayData, starts: ArrayData, n: Int,
      sep: Char = ' '): UTF8String = {
    val numToks = tokens.numElements()
    val p = new Array[Long](starts.numElements())
    var i = 0
    while (i < p.length) { p(i) = starts.getLong(i); i += 1 }
    java.util.Arrays.sort(p)
    val sb = new java.lang.StringBuilder
    var pi = 0
    var coverEnd = 0L // exclusive upper bound of the active covered range
    var kept = false  // explicit flag: a kept EMPTY element (a blank line
                      // in line mode) must still earn its separator
    var t = 0
    while (t < numToks) {
      val pos = t + 1L
      while (pi < p.length && p(pi) <= pos) {
        val e = p(pi) + n
        if (e > coverEnd) coverEnd = e
        pi += 1
      }
      if (pos >= coverEnd) {
        if (kept) sb.append(sep)
        sb.append(tokens.getUTF8String(t).toString)
        kept = true
      }
      t += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      // Widen BEFORE multiplying: `Float * Float` is a single-precision
      // product (relative error ~6e-8 per term) that a declarative
      // double replay can drift a 6-dp rounding boundary across; the
      // double product matches any engine computing over widened floats
      // to the last ulp.
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** array<double> twin of [[cosine]] — the expression dispatches on the
    * input element type (getFloat over packed doubles would silently
    * reinterpret 4-byte halves, garbage with no exception). */
  def cosineD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
