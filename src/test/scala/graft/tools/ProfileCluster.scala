package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.{Clusters, Dedup}
import graft.queries.PipelineQueries

/** Test-scope breakdown of dd_cluster cost: edge-pipeline evaluation vs
  * label-propagation loop (`sbt "Test/runMain graft.tools.ProfileCluster"`).
  * Uses the SAME upstream the gate uses (MinHash-LSH pairs).
  */
object ProfileCluster {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-profile-cluster")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/nation.parquet").count()

    (1 to 2).foreach { rep =>
      spark.catalog.clearCache()
      val docs = PipelineQueries.plantedDocs(
        graft.core.Tables.documents(spark, dir))
      var t0 = System.nanoTime()
      val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text")
        .select("id_a", "id_b").localCheckpoint()
      println(f"rep$rep edges: ${(System.nanoTime() - t0) / 1e9}%.3f s (${pairs.count()} pairs)")
      t0 = System.nanoTime()
      val labels = Clusters.connectedComponents(pairs)
      val n = labels.count()
      println(f"rep$rep loop: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n labels)")
    }
    spark.stop()
  }
}
