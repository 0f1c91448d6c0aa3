package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, Kernels}

/** Deduplication operators for training-data pipelines, designed around one
  * invariant: never materialize the O(n²) pair space. Every near-dup
  * algorithm is CANDIDATES (LSH bucket self-join, each bucket capped at
  * `maxBucketSize` members via [[capBuckets]] so a hot bucket contributes at
  * most max² pairs, never quadratic in bucket size) → VERIFY (exact measure
  * on candidate pairs only). At 100 TB the only shuffles are a groupBy(doc)
  * for signatures and the bucket join; both partial-aggregate map-side.
  *
  * Exact duplicates are PRE-ROUTED inside every near-dup entry point
  * ([[collapseGroups]]): identical content collapses to one representative
  * (min id) via a map-side-combined aggregation — 100M copies of one
  * boilerplate doc reach the reducer as O(partitions) rows, never as a
  * 100M-row bucket — LSH runs over distinct content only, and results fan
  * back out to member ids ([[fanOut]]). Dup groups larger than
  * `maxBucketSize` are down-sampled for pair REPORTING (the same ≤max²
  * contract as an LSH bucket); the representative always survives, so the
  * group still links to its near-dup neighbors.
  *
  * The residual cap in [[capBuckets]] then only fires for *near*-identical
  * clusters (distinct texts landing in one bucket); it trades recall only
  * there, and any `maxBucketSize` sample of such a cluster still links it.
  */
object Dedup {

  /** Split a 64-bit signature column into per-band bucket rows. The band
    * hash is computed AFTER the explode from the materialized `sig` column:
    * inlining the signature kernel into the band array would let Catalyst
    * collapse it into the Generate and re-evaluate the O(planes×dim) kernel
    * once per band instead of once per row.
    */
  private[dedup] def bandRows(sigs: DataFrame, bands: Int, bandBits: Int): DataFrame = {
    val mask = (1L << bandBits) - 1
    sigs.withColumn("band_idx", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("band_hash",
        expr(s"shiftright(sig, band_idx * $bandBits) & $mask"))
  }

  /** Within each (band_idx, band_hash) bucket keep only the first
    * `max` members (ordered by id — deterministic). Bounds downstream pair
    * generation at max² per bucket.
    *
    * Enforcement is two-phase so a pathological bucket never funnels through
    * one task: (1) a map-side-combined count finds buckets over 4·max, and a
    * deterministic hash-mod filter (broadcast of the rare oversized keys —
    * ≤ rows/4max of them by construction) down-samples them scan-locally to
    * ~4·max expected members; (2) the row_number window — whose per-bucket
    * input is now bounded — applies the exact first-max-by-id cap. Buckets
    * ≤ 4·max skip phase 1 entirely and keep the exact deterministic-prefix
    * semantics. (Windows get no AQE skew mitigation, so the bound must exist
    * BEFORE the sort — that is what phase 1 provides.)
    */
  private def capBuckets(banded: DataFrame, max: Int): DataFrame = {
    val counts = banded.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("__cnt"))
    val hot = counts.filter(col("__cnt") > 4L * max)
    val bounded = banded
      .join(broadcast(hot), Seq("band_idx", "band_hash"), "left")
      .filter(col("__cnt").isNull ||
        pmod(xxhash64(col("id")),
          ceil(col("__cnt") / lit(4 * max)).cast("long")) === 0)
      .drop("__cnt")
    val w = Window.partitionBy("band_idx", "band_hash").orderBy(col("id"))
    bounded.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= max)
      // the USING-join moved the band keys first; callers rename
      // positionally, so restore the input column order
      .select(banded.columns.map(col).toSeq: _*)
  }

  /** Output of [[collapseKeyed]]: `reps` (id, payload…) one row per
    * distinct content; `members` (id, __rep) dup-group membership, capped;
    * `dupReps` (__rep) one row per dup group — the seed for identity
    * self-pairs in [[fanOut]], derived off the same shared agg exchange.
    */
  private[dedup] final case class Collapsed(
      reps: DataFrame, members: DataFrame, dupReps: DataFrame)

  /** Exact-duplicate pre-routing core: collapse rows with an identical
    * content-hash pair to one representative (the min id), so LSH/banding
    * sees each distinct content ONCE. `keyed` must carry (id, __h1, __h2)
    * plus any payload columns — values derived from the content, identical
    * within a group by construction (e.g. the content itself, or its
    * scan-locally precomputed signature), carried by first().
    *
    * Scale shape: content identity is a scan-local 128-bit hash pair
    * (collision odds ~n²/2¹²⁹ — vanishing even at 10¹¹ docs), so the group
    * aggregation is map-side combined: a 100M-copy group reaches the
    * reducer as O(partitions) partial rows, each partial carrying ONE copy
    * of the payload. Each distinct payload therefore crosses the wire
    * exactly once — callers that only need a fixed-width signature
    * downstream pass THAT as the payload and keep the full text/vector off
    * the exchange entirely — and `reps` is a plain agg output: a single
    * exchange that ReuseExchange shares across every downstream pass
    * (signature + verify), instead of a join subtree each pass would
    * re-evaluate. The membership join carries ids + 16-byte hash keys
    * only, against the DUP groups (one row per duplicated content), which
    * a mostly-unique corpus keeps broadcast-small; when dups dominate it
    * degrades to a shuffled equi-join, which AQE skew-split handles —
    * unlike a window, which would sort the whole hot group in one task.
    * The member cap uses the same bounded two-phase trick as
    * [[capBuckets]]: hash-mod oversized groups to ~4·max expected
    * survivors, then an exact row_number cap over the bounded input.
    */
  private[dedup] def collapseKeyed(keyed: DataFrame, maxGroupSize: Int): Collapsed = {
    val payload = keyed.columns.filterNot(Set("id", "__h1", "__h2")).toSeq
    val aggs = min(col("id")).as("__rep") +: count(lit(1)).as("__n") +:
      payload.map(c => first(col(c)).as(c))
    val groups = keyed.groupBy("__h1", "__h2").agg(aggs.head, aggs.tail: _*)
    val reps = groups.select(col("__rep").as("id") +: payload.map(col): _*)
    val dupGroups = groups.filter(col("__n") > 1)
      .select("__h1", "__h2", "__rep", "__n")
    val bounded = keyed.select("id", "__h1", "__h2")
      .join(dupGroups, Seq("__h1", "__h2"))
      .filter(col("__n") <= maxGroupSize || col("id") === col("__rep") ||
        pmod(xxhash64(col("id")),
          ceil(col("__n") / lit(4 * maxGroupSize)).cast("long")) === 0)
    val w = Window.partitionBy("__rep").orderBy(col("id"))
    val members = bounded
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxGroupSize)
      .select(col("id"), col("__rep"))
    Collapsed(reps, members, dupGroups.select(col("__rep")))
  }

  /** The 128-bit content-hash key pair over `content` — scan-local, the
    * group identity for [[collapseKeyed]] and [[exact]].
    */
  private def hashKeys(content: Seq[Column]): Seq[Column] = Seq(
    xxhash64(content: _*).as("__h1"),
    xxhash64(lit(7) +: content: _*).as("__h2"))

  /** [[collapseKeyed]] with the content itself as the payload — for
    * callers that still need the representative's text downstream
    * (shingling / exact-Jaccard verify).
    */
  private[dedup] def collapseGroups(docs: DataFrame, idCol: String,
      contentCol: String, maxGroupSize: Int): Collapsed =
    collapseKeyed(
      docs.select(col(idCol).as("id") +: hashKeys(Seq(col(contentCol))) :+
        col(contentCol): _*),
      maxGroupSize)

  /** Fan representative-level near-dup pairs back out to member ids. The
    * caller appends one IDENTITY pair (rep, rep, selfScore) per dup group
    * to `repPairs` (a tiny union — one row per duplicated content, not per
    * result pair), and a single pass of two left joins expands both kinds:
    *   - cross-group pairs: every (member of rep_a) × (member of rep_b)
    *     inherits the rep pair's score (identical content ⇒ identical
    *     measure), normalized to id_a < id_b. `members` holds dup groups
    *     only, so the joins are left with the rep id itself as fallback —
    *     a singleton rep is its own single member.
    *   - within-group pairs: the identity pair expands to the group's
    *     member × member square; the `__ma < __mb` guard keeps each
    *     unordered pair exactly once (members of distinct groups are
    *     disjoint, so the guard never touches cross pairs).
    */
  private def fanOut(repPairs: DataFrame, members: DataFrame): DataFrame = {
    val mA = members.select(col("__rep").as("id_a"), col("id").as("__ma"))
    val mB = members.select(col("__rep").as("id_b"), col("id").as("__mb"))
    val scoreCols = repPairs.columns.filterNot(Set("id_a", "id_b")).toSeq
    repPairs
      .join(mA, Seq("id_a"), "left")
      .join(mB, Seq("id_b"), "left")
      .withColumn("__ma", coalesce(col("__ma"), col("id_a")))
      .withColumn("__mb", coalesce(col("__mb"), col("id_b")))
      .filter(col("id_a") =!= col("id_b") || col("__ma") < col("__mb"))
      .select(least(col("__ma"), col("__mb")).as("id_a") +:
        greatest(col("__ma"), col("__mb")).as("id_b") +:
        scoreCols.map(col): _*)
  }

  /** Exact dedup: keep one row per duplicate group, chosen by `tieBreak`
    * (ascending struct comparison — the lexicographically-first row wins;
    * pass a total order, e.g. a unique id, for a deterministic winner —
    * unlike dropDuplicates).
    *
    * Group identity is the 128-bit content-hash pair over `dupCols`
    * (collision odds ~n²/2¹²⁹ — vanishing even at 10¹¹ rows), so the
    * whole operator is ONE map-side-combined hash aggregation: a
    * 100M-copy boilerplate group reaches the reducer as O(partitions)
    * min_by partials, each carrying a single candidate row — never the
    * single-task sort a window partitioned by the raw dup key would
    * funnel the entire group through.
    */
  def exact(df: DataFrame, dupCols: Seq[String], tieBreak: Seq[Column]): DataFrame = {
    val keys = hashKeys(dupCols.map(col))
    val winner = min_by(struct(df.columns.map(col): _*), struct(tieBreak: _*))
    df.groupBy(keys: _*)
      .agg(winner.as("__row"))
      .select(col("__row.*"))
  }

  /** Distinct word shingles (n-grams) — the Jaccard universe of a doc. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    val starts = sequence(lit(1), greatest(size(toks) - (n - 1), lit(1)))
    array_distinct(transform(starts, i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  private def shingleRows(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("sh"))

  // ------------------------------------------------------------ MinHash+LSH

  final case class MinHashConfig(
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.7,
      maxBucketSize: Int = 10000) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rowsPerBand: Int = numHashes / bands
  }

  // Deterministic 31-bit multipliers/offsets per hash function: a*h31 + b
  // stays < 2^62, so no overflow even under ANSI arithmetic.
  private val MersennePrime = 2147483647L
  private def hashParams(i: Int): (Long, Long) = {
    val a = (Kernels.mix(2L * i + 1) >>> 33) | 1L
    val b = Kernels.mix(2L * i + 2) >>> 33
    (a, b)
  }

  /** MinHash signatures: one row per doc, `numHashes` min-columns. One
    * explode + one partially-aggregated groupBy — shuffle volume is
    * O(docs × numHashes), independent of document length.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, cfg.shingleSize)
      .withColumn("h", pmod(xxhash64(col("sh")), lit(MersennePrime)))
    val minCols = (0 until cfg.numHashes).map { i =>
      val (a, b) = hashParams(i)
      min(pmod(col("h") * a + b, lit(MersennePrime))).as(s"mh_$i")
    }
    sh.groupBy(col("id")).agg(minCols.head, minCols.tail: _*)
  }

  /** LSH banding: (id, band_idx, band_hash); docs sharing any band bucket
    * become candidate pairs via a bucket self-join.
    */
  def bandedSignatures(sigs: DataFrame, cfg: MinHashConfig): DataFrame = {
    val bands = (0 until cfg.bands).map { bnd =>
      val parts = (0 until cfg.rowsPerBand)
        .map(r => col(s"mh_${bnd * cfg.rowsPerBand + r}").cast("string"))
      xxhash64(concat_ws("_", lit(bnd.toString) +: parts: _*))
    }
    sigs.select(col("id"), posexplode(array(bands: _*)).as(Seq("band_idx", "band_hash")))
  }

  private def bucketJoinPairs(banded: DataFrame, maxBucketSize: Int): DataFrame = {
    val capped = capBuckets(banded, maxBucketSize)
    val a = capped.toDF("id_a", "band_idx", "band_hash")
    val b = capped.toDF("id_b", "band_idx", "band_hash")
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact Jaccard for candidate pairs via shingle co-occurrence — touches
    * only candidate docs' shingles, never the corpus square.
    */
  def verifyJaccard(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, candidates: DataFrame): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, shingleSize)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = candidates
      .join(sh.toDF("id_a", "sh"), "id_a")
      .join(sh.toDF("id_b", "sh"), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.toDF("id_a", "n_a"), "id_a")
      .join(sizes.toDF("id_b", "n_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
  }

  /** Ground-truth pair set: exact Jaccard for EVERY pair of docs sharing at
    * least one shingle. Quadratic in per-shingle frequency — a recall oracle
    * for small corpora, NOT a production path (use [[minhashNearDupPairs]] /
    * [[ngramJaccardPairs]] at scale).
    */
  def allPairsJaccard(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, shingleSize)
    val candidates = sh.toDF("id_a", "sh")
      .join(sh.toDF("id_b", "sh"), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    verifyJaccard(docs, idCol, textCol, shingleSize, candidates)
  }

  /** MinHash-LSH near-duplicate pairs: (id_a, id_b, jaccard ≥ threshold).
    * Exact duplicates are pre-routed ([[collapseGroups]]): signatures and
    * buckets are computed over distinct texts only; identical-text pairs
    * come back via [[fanOut]] at jaccard 1.0 (their exact measure).
    */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    val c = collapseGroups(docs, idCol, textCol, cfg.maxBucketSize)
    val sigs = minhashSignatures(c.reps, "id", textCol, cfg)
    val candidates = bucketJoinPairs(bandedSignatures(sigs, cfg), cfg.maxBucketSize)
    val repPairs = verifyJaccard(c.reps, "id", textCol, cfg.shingleSize, candidates)
      .filter(col("jaccard") >= cfg.threshold)
      .unionByName(c.dupReps.select(col("__rep").as("id_a"),
        col("__rep").as("id_b"), lit(1.0).as("jaccard")))
    fanOut(repPairs, c.members)
  }

  // ------------------------------------------------------------ SimHash

  /** SimHash near-dup pairs: 64-bit signature per doc; banding the signature
    * into 4 × 16-bit chunks guarantees (pigeonhole) that any pair within
    * Hamming distance 3 shares a chunk. Returns (id_a, id_b, hamming ≤ maxDist).
    *
    * The signature is computed scan-locally BEFORE the exact-dup collapse
    * and passed as its payload (identical text ⇒ identical signature), so
    * only (id, 2×8-byte key, 8-byte sig) rides the collapse exchange — the
    * full text never shuffles anywhere in this operator.
    */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, maxBucketSize: Int = 10000): DataFrame = {
    val c = collapseKeyed(
      docs.select(col(idCol).as("id") +: hashKeys(Seq(col(textCol))) :+
        GraftFunctions.simhash64(split(trim(col(textCol)), "\\s+")).as("sig"): _*),
      maxBucketSize)
    val banded = capBuckets(bandRows(c.reps, bands = 4, bandBits = 16), maxBucketSize)
      .select("id", "sig", "band_idx", "band_hash")
    val a = banded.toDF("id_a", "sig_a", "band_idx", "band_hash")
    val b = banded.toDF("id_b", "sig_b", "band_idx", "band_hash")
    val repPairs = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
      .unionByName(c.dupReps.select(col("__rep").as("id_a"),
        col("__rep").as("id_b"), lit(0).cast("int").as("hamming")))
    fanOut(repPairs, c.members)
  }

  // ------------------------------------------------------------ n-gram Jaccard

  /** Set-similarity join on word n-grams with exact Jaccard ≥ threshold,
    * using PPJoin-style prefix filtering: two sets with Jaccard ≥ τ must
    * share a shingle within each other's prefix of the ⌊(1-τ)·|set|⌋+1
    * globally-rarest shingles, so the candidate join runs only over those
    * prefixes — on skewed vocabularies this cuts the bucket join from
    * Σ freq² over ALL shingles to the rare tail. A size-ratio filter
    * (τ·|B| ≤ |A|) prunes the survivors before exact verification.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8, maxBucketSize: Int = 10000): DataFrame = {
    val c = collapseGroups(docs, idCol, textCol, maxBucketSize)
    val sh = shingleRows(c.reps, "id", textCol, n)
    val freq = sh.groupBy("sh").agg(count(lit(1)).as("freq"))
    // One window pass: the ordered spec with an unbounded frame yields both
    // the per-doc rank and the per-doc size off a single partition+sort.
    val wOrd = Window.partitionBy("id").orderBy(col("freq"), col("sh"))
    val sized = sh.join(freq, "sh")
      .withColumn("sz", count(lit(1)).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rn", row_number().over(wOrd))
    val prefix = sized
      .filter(col("rn") <= floor(lit(1.0 - threshold) * col("sz")) + 1)
      .select(col("id"), col("sh"), col("sz"))
    // Cap per-shingle groups like LSH buckets (band_idx is constant: the
    // prefix join has a single logical band).
    val capped = capBuckets(
      prefix.withColumn("band_idx", lit(0)).withColumnRenamed("sh", "band_hash"),
      maxBucketSize)
      .withColumnRenamed("band_hash", "sh").drop("band_idx")
    val candidates = capped.toDF("id_a", "sh", "sz_a")
      .join(capped.toDF("id_b", "sh", "sz_b"), Seq("sh"))
      .filter(col("id_a") < col("id_b") &&
        col("sz_a") >= lit(threshold) * col("sz_b") &&
        col("sz_b") >= lit(threshold) * col("sz_a"))
      .select("id_a", "id_b").distinct()
    val repPairs = verifyJaccard(c.reps, "id", textCol, n, candidates)
      .filter(col("jaccard") >= threshold)
      .unionByName(c.dupReps.select(col("__rep").as("id_a"),
        col("__rep").as("id_b"), lit(1.0).as("jaccard")))
    fanOut(repPairs, c.members)
  }

  // ------------------------------------------------------------ Embeddings

  /** Embedding near-dup pairs: sign-random-projection LSH (64 deterministic
    * hyperplanes) → 4 × 16-bit band buckets → exact cosine on candidates.
    * Returns (id_a, id_b, cosine ≥ threshold).
    *
    * Every pair — including the within-group pairs of an exact-duplicate
    * cluster — is subject to the cosine ≥ threshold filter, so groups of
    * degenerate (zero/NaN-norm) vectors are absent from the pair report,
    * exactly as they would be without the collapse.
    *
    * The projection signature is computed scan-locally BEFORE the collapse
    * and passed as its payload (identical vector ⇒ identical signature), so
    * no vector rides the collapse OR bucket exchange — vectors are joined
    * back from the input only for the candidate pairs that survive the
    * distinct.
    */
  def embeddingNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, maxBucketSize: Int = 10000): DataFrame = {
    val c = collapseKeyed(
      vectors.select(col(idCol).as("id") +: hashKeys(Seq(col(vecCol))) :+
        GraftFunctions.signProjection(col(vecCol)).as("sig"): _*),
      maxBucketSize)
    val banded = capBuckets(bandRows(c.reps, bands = 4, bandBits = 16), maxBucketSize)
      .select("id", "band_idx", "band_hash")
    val a = banded.select(col("id").as("id_a"), col("band_idx"), col("band_hash"))
    val b = banded.select(col("id").as("id_b"), col("band_idx"), col("band_hash"))
    val candidates = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val vecs = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val repPairs = candidates
      .join(vecs.toDF("id_a", "vec_a"), "id_a")
      .join(vecs.toDF("id_b", "vec_b"), "id_b")
      .withColumn("cosine", GraftFunctions.cosineSim(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      // Identity-pair score = the identical-vector cosine computed by the
      // SAME kernel over the rep's own vector — bit-identical to what the
      // uncollapsed pair would have produced (not a synthesized 1.0, which
      // could differ in the last ulp).
      .unionByName(c.dupReps.join(vecs.toDF("__rep", "vec"), "__rep")
        .select(col("__rep").as("id_a"), col("__rep").as("id_b"),
          GraftFunctions.cosineSim(col("vec"), col("vec")).as("cosine"))
        .filter(col("cosine") >= threshold))
    fanOut(repPairs, c.members)
  }
}
