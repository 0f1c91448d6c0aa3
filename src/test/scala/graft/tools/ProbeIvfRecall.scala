package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.queries.PipelineQueries
import graft.similarity.Knn

/** Test-scope probe: IVF recall@1 fraction vs KMeans maxIter, over the
  * EXACT workload the recall gate runs (probe construction shared with
  * PipelineQueries.simKnnIvfRecall — this tool's output justifies the
  * operator's maxIter default, so it must not drift from the gate).
  */
object ProbeIvfRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-probe-ivf")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 500)
    val probes = PipelineQueries.ivfRecallProbes(corpus).localCheckpoint()
    val truth = Knn.bruteForceTopK(probes, corpus, "vec_id", "embedding", k = 1)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    val nq = truth.count()
    Seq(2, 4, 8).foreach { it =>
      val t0 = System.nanoTime()
      val found = Knn.ivfTopK(probes, corpus, "vec_id", "embedding", k = 1,
        nlist = 16, nprobe = 4, maxIter = it)
        .select(col("query_id"), col("neighbor_id"))
      val hit = truth.intersect(found).count()
      println(f"maxIter=$it recall@1=${hit.toDouble / nq}%.4f ($hit/$nq) in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
