package graft.tools

import org.apache.spark.sql.SparkSession

/** Test-scope smoke: row counts of the dedup/cluster gates at sf0.01,
  * compared by hand against CORRECTNESS_r05 during development.
  */
object SmokeCounts {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-smoke")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("dd_cluster", "dd_ngram_jaccard", "dd_minhash", "dd_minhash_recall",
      "dd_simhash", "dd_embedding", "dd_exact").foreach { q =>
      println(s"$q -> ${graft.SparkEntry.queries(q)(spark, dir).count()}")
    }
    spark.stop()
  }
}
