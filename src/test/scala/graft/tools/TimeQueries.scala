package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timing harness (test scope — not part of the shipped artifact):
  * time a comma-separated subset of SparkEntry queries (args(0)) against a
  * scale-factor dir (args(1), default sf0.1), printing one line per query.
  * Used while iterating on performance so a full Bench run isn't needed per
  * experiment: `sbt "Test/runMain graft.tools.TimeQueries dd_simhash"`.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val known = graft.SparkEntry.queries.keys.toSeq.sorted
    if (args.isEmpty) {
      System.err.println("usage: TimeQueries <name>[,<name>...] [sfDir]")
      System.err.println(s"known queries: ${known.mkString(", ")}")
      sys.exit(2)
    }
    val names = args(0).split(",").toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      System.err.println(s"known queries: ${known.mkString(", ")}")
      sys.exit(2)
    }
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    locally {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/nation.parquet")
        .groupBy(col("n_regionkey")).count().count()
    }
    for (rep <- 1 to 2; name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[time] rep$rep $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    spark.stop()
  }
}
