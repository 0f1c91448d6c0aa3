package graft.tools

import org.apache.spark.sql.SparkSession

/** Test-scope per-query profiler: times any SparkEntry gate end-to-end,
  * with repetitions to separate first-run (codegen/JIT) cost from
  * steady-state, and optional formatted-plan dumps.
  *
  *   sbt "Test/runMain graft.tools.ProfileRegressions [sfDir] [reps]
  *        [--explain] [query ...]"
  *
  * A development tool — never shipped in the library artifact.
  */
object ProfileRegressions {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).flatMap(_.toIntOption).getOrElse(3)
    val explain = args.contains("--explain")
    val names = args.drop(2).filterNot(_.startsWith("--")).toSeq
    val all = graft.SparkEntry.queries
    val targets = if (names.isEmpty) {
      Seq("dd_simhash", "sim_knn_lsh", "sim_knn_brute")
    } else names
    val unknown = targets.filterNot(all.contains)
    if (unknown.nonEmpty) {
      System.err.println(
        s"unknown queries: ${unknown.mkString(", ")}\n" +
          s"valid names: ${all.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-profile")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    spark.read.parquet(s"$dir/nation.parquet").count()

    targets.foreach { name =>
      val fn = all(name)
      if (explain) {
        println(s"===== PLAN $name")
        fn(spark, dir).explain("formatted")
      }
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
