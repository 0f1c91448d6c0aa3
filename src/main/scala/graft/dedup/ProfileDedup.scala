package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Scratch profiler for dd_* plan stages (not shipped behavior). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.groupBy("lang").count().count() // warm
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    for (_ <- 1 to 2) {
      val c = Dedup.collapseGroups(docs, "doc_id", "text", 10000)
      time("collapse.reps") { c.reps.count() }
      time("collapse.members") { c.members.count() }
      time("collapse.both") { c.reps.count() + c.members.count() }
      val sigs = c.reps.select(col("id"),
        GraftFunctions.simhash64(split(trim(col("text")), "\\s+")).as("sig"))
      time("sigs") { sigs.count() }
      time("full") {
        Dedup.simhashNearDupPairs(docs, "doc_id", "text").count()
      }
      time("full_nocollapse") {
        // r2-shape: no pre-routing, straight over docs
        val s2 = docs.select(col("doc_id").as("id"),
          GraftFunctions.simhash64(split(trim(col("text")), "\\s+")).as("sig"))
        val banded = Dedup.bandRows(s2, 4, 16)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("band_idx", "band_hash").orderBy(col("id"))
        val capped = banded.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= 10000).drop("__rn")
          .select("id", "sig", "band_idx", "band_hash")
        val a = capped.toDF("id_a", "sig_a", "band_idx", "band_hash")
        val b = capped.toDF("id_b", "sig_b", "band_idx", "band_hash")
        a.join(b, Seq("band_idx", "band_hash"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b", "sig_a", "sig_b").distinct()
          .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
          .filter(col("hamming") <= 3)
          .count()
      }
    }
    spark.stop()
  }
}
