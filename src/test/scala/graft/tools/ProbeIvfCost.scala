package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.similarity.Knn

/** Test-scope probe: where does the IVF gate's wall-clock go — quantizer
  * training (KMeans.fit), corpus assignment, or search? Drives the same
  * shapes as sim_knn_ivf to place the optimization where the time is.
  */
object ProbeIvfCost {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-probe-ivf-cost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm-up
    spark.read.parquet(s"$dir/embeddings.parquet").count()
    for (bound <- Seq(5000L, 50000L)) {
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") < bound)
      val probes = vecs.filter(col("vec_id") < 20)
        .withColumn("vec_id", col("vec_id") + 5000000L)
      val index = timed(s"buildIvf(bound=$bound)") {
        val ix = Knn.buildIvf(vecs, "vec_id", "embedding")
        ix.assigned.count() // materialize assignment
        ix
      }
      timed(s"searchIvf(bound=$bound)") {
        Knn.searchIvf(index, probes, "vec_id", "embedding", k = 3).count()
      }
    }
    spark.stop()
  }
}
