package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: does `format("org.apache.spark.sql.avro.AvroFileFormat")` resolve in this sandbox? Spark 4.1
  * bundles org.apache.spark.sql.avro.AvroFileFormat inside spark-sql
  * (historically an external module); this answers whether the round's
  * "avro is env-blocked" assumption still holds. Never shipped.
  */
object ProbeAvro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("avro_probe").toString
    try {
      Seq((1L, "a", 1.5), (2L, "b", -2.25)).toDF("k", "s", "v")
        .write.format("org.apache.spark.sql.avro.AvroFileFormat").mode("overwrite").save(s"$dir/t")
      val back = spark.read.format("org.apache.spark.sql.avro.AvroFileFormat").load(s"$dir/t")
        .orderBy("k").collect()
      println(s"AVRO_OK ${back.mkString("|")}")
    } catch {
      case e: Throwable => println(s"AVRO_FAIL ${e.getClass.getName}: ${e.getMessage}")
    } finally spark.stop()
  }
}
