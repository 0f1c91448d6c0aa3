package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Second-stage ngram probe: which PIECE of the funnel is slow — the scan,
  * the shingling expression, the freq agg, the window, or the join? Each
  * measured twice to split codegen/JIT from steady-state. Dev only.
  */
object ProbeNgram2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-probe-ngram2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.Dedup
    def timed(label: String)(v: => Any): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val r = v
      println(f"$label rep$i: $r (${(System.nanoTime() - t0) / 1e9}%.2f s)")
    }
    val docs = graft.core.Tables.documents(spark, dir)
    timed("scan count")(docs.count())
    timed("token count")(
      docs.select(size(split(trim(col("text")), "\\s+")).as("n"))
        .agg(sum("n")).head().getLong(0))
    val sh = docs.select(col("doc_id").as("id"),
        Dedup.shingles(col("text"), 3).as("sha"))
    timed("shingles scan-local")(
      sh.select(size(col("sha")).as("n")).agg(sum("n")).head().getLong(0))
    val exploded = sh.select(col("id"), explode(col("sha")).as("sh"))
    timed("explode count")(exploded.count())
    timed("freq agg")(
      exploded.groupBy("sh").count().count())
    val freq = exploded.groupBy("sh").agg(count(lit(1)).as("freq"))
    timed("join sh x freq")(exploded.join(freq, "sh").count())
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("freq"), col("sh"))
    timed("window rank")(
      exploded.join(freq, "sh").withColumn("rn",
        row_number().over(wOrd)).count())
    spark.stop()
  }
}
