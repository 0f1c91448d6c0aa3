package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (/root/repo/TESTDATA.md).
  *
  * TPC-H-ish star schema (`region nation customer supplier part orders
  * lineitem`) plus `events` (timestamped stream-shaped table), `documents`
  * (text corpus) and `embeddings` (64-dim float vectors). One parquet file
  * per table under a scale-factor directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some driver
    * generations (Spark's reader rejects nanos — read as long, truncate to
    * micros, the same truncation DuckDB applies) and as TIMESTAMP(MICROS)
    * in others (reads as TIMESTAMP_NTZ under Spark 4's NTZ inference —
    * cast to session-local TimestampType; the session is pinned UTC, so
    * the wall-clock values are identical). Dispatch on the read schema so
    * both generations land on the same TimestampType micros.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(s, d, "events"))
  }

  /** Normalize an events frame's `ts` to TimestampType micros whatever the
    * parquet generation produced (see [[events]]). Also used by streaming
    * readers, which apply the same dispatch to their file-source schema.
    *
    * Boundary contracts (each fails LOUDLY here rather than confusingly
    * downstream):
    *   - LongType only ever arises from `nanosAsLong` reading a
    *     TIMESTAMP(NANOS) column, so the value is NANOSECONDS. A future
    *     generation writing a bare int64 (no parquet logical type) would
    *     also read as LongType and be silently divided by 1000 — guard by
    *     magnitude: nanos since epoch for any plausible event time
    *     (2001–2200) sit in [1e18, 7.3e18); micros/millis are orders of
    *     magnitude below. Checked per-row in the expression — a sub-nanos
    *     magnitude raises a descriptive error and FAILS the query (better
    *     a loud load-boundary failure than silently shifting every
    *     timestamp 1000×); genuinely-null rows stay null. No extra scan.
    *   - The NTZ cast is reinterpreted in the SESSION time zone; every
    *     harness session pins UTC, and the oracle's DuckDB read assumes
    *     it. Assert rather than trust.
    *   - Any other type (string, int32, …) is an unknown generation:
    *     throw with the observed type instead of passing it through to a
    *     confusing downstream analysis error.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr(
          "timestamp_micros(CASE WHEN ts IS NULL THEN NULL " +
            "WHEN abs(ts) >= 978307200000000000 THEN ts div 1000 " +
            "ELSE raise_error(concat('events.ts read as long but magnitude ', " +
            "CAST(ts AS STRING), ' is not nanoseconds-since-epoch — " +
            "unexpected parquet generation')) END)"))
      case TimestampNTZType =>
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts is TIMESTAMP_NTZ and the session time zone is '$tz': " +
            "the NTZ→timestamp cast reinterprets wall-clock values in the " +
            "session zone, and the DuckDB oracle assumes UTC — pin " +
            "spark.sql.session.timeZone=UTC before loading events")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"events.ts has unexpected parquet type $other — known generations " +
          "are TIMESTAMP(NANOS) (read as long), TIMESTAMP(MICROS) (read as " +
          "TIMESTAMP_NTZ), and TimestampType")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` can address it by
    * its bare name (mirrors how the reference passes user SQL straight to
    * Spark SQL — reference gluedbapi/connection.py:430).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
