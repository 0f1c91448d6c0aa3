package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the ngramJaccard candidate funnel at a given sf: how many
  * shingle rows, prefix rows, raw bucket pairs, size-ratio survivors,
  * position-filter survivors, distinct candidates, and verified pairs —
  * the numbers that decide where the gate's time goes. Never shipped.
  *
  *   sbt "Test/runMain graft.tools.ProbeNgram [sfDir]"
  */
object ProbeNgram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-probe-ngram")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.Dedup
    val t = Tools.timed _

    // Mirror of the gate's input (ddNgramJaccard uses plantedDocs; probe the
    // raw documents table — the funnel shape is what matters).
    val docs = graft.core.Tables.documents(spark, dir)
    val n = 3; val threshold = 0.8
    val sh = docs.select(col("doc_id").as("id"), col("text"))
      .withColumn("__sha", Dedup.shingles(col("text"), n))
      .select(col("id"), size(col("__sha")).as("sz"),
        explode(col("__sha")).as("sh"))
    t("shingle rows", sh.count())
    val freq = sh.groupBy("sh").agg(count(lit(1)).as("freq"))
    t("distinct shingles", freq.count())
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("freq"), col("sh"))
    val sized = sh.join(freq, "sh")
      .withColumn("rn", row_number().over(wOrd))
    val prefix = sized
      .filter(col("rn") <=
        col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
      .select(col("id"), col("sh"), col("sz"), col("rn"))
    t("prefix rows", prefix.count())
    val bucketSizes = prefix.groupBy("sh").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * (col("c") - 1) / 2)).head().getDouble(0)
    println(s"raw generated pairs (sum c*(c-1)/2): $bucketSizes")
    val pairs = prefix.groupBy("sh")
      .agg(collect_list(struct(col("id"), col("sz"), col("rn"))).as("ms"))
      .select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"),
        col("a.rn").as("rn_a"), col("b.rn").as("rn_b"))
    val sized2 = pairs
      .filter(col("sz_a") >= lit(threshold) * col("sz_b") - lit(1e-9) &&
        col("sz_b") >= lit(threshold) * col("sz_a") - lit(1e-9))
    t("after size-ratio", sized2.count())
    val required =
      lit(threshold / (1 + threshold)) * (col("sz_a") + col("sz_b")) - lit(1e-9)
    val positioned = sized2.filter(
      least(col("rn_a"), col("rn_b")) +
        least(col("sz_a") - col("rn_a"), col("sz_b") - col("rn_b")) >= required)
    t("after position filter", positioned.count())
    t("distinct candidates (with position)", positioned.select("id_a", "id_b").distinct().count())
    t("distinct candidates (without position)", sized2.select("id_a", "id_b").distinct().count())
    spark.stop()
  }
}

private object Tools {
  def timed(label: String, v: => Any): Unit = {
    val t0 = System.nanoTime()
    val r = v
    println(f"$label: $r (${(System.nanoTime() - t0) / 1e9}%.2f s)")
  }
}
