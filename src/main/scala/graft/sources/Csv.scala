package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV corpus source/sink with the same quarantine contract as [[Jsonl]]
  * — CSV is what arrives from partners/exports (the reference's seed path
  * is CSV, `seed.sql` + TypeMapper two-phase cast), and at corpus scale
  * the same rules apply: explicit schema (no inference pass, no silent
  * type widening on dirty rows), PERMISSIVE parse with malformed lines
  * QUARANTINED into `_corrupt_record` rather than dropped or fatal.
  * A malformed row here = wrong column count or an uncastable value
  * (Spark's univocity parser semantics); short rows null-pad, so the
  * corrupt column is the contract for counting/routing rejects.
  */
object Csv {

  val CorruptCol = "_corrupt_record"

  /** Read CSV with an enforced schema; a malformed row lands with the raw
    * line in `_corrupt_record` — its PARSEABLE fields are still extracted
    * (PERMISSIVE nulls only the uncastable/missing ones), so route rejects
    * by `_corrupt_record IS NOT NULL`, never by "all data columns null"
    * (src_csv_quarantine pins a quarantined row keeping a parsed field).
    */
  def read(spark: SparkSession, schema: StructType, header: Boolean,
      paths: String*): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .csv(paths: _*)

  def write(df: DataFrame, path: String, header: Boolean = true,
      codec: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).option("header", header.toString)
    codec.foreach(c => w.option("compression", c))
    w.csv(path)
  }
}
