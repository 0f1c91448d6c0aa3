package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print the BM25 physical plan to confirm the query-term
  * prune broadcasts and no document text rides an exchange past
  * tokenization. Never shipped.
  *
  *   sbt "Test/runMain graft.tools.ProbeBm25 [sfDir]"
  */
object ProbeBm25 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .appName("graft-probe-bm25")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val qs = Seq((1L, "spark window sort")).toDF("qid", "qt")
    graft.text.Bm25.search(
      graft.core.Tables.documents(spark, dir), "doc_id", "text",
      qs, "qid", "qt", k = 10).explain("formatted")
    spark.stop()
  }
}
