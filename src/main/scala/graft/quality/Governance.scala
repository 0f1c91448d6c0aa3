package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Relation

/** LF-style governance plane (SURVEY §2.8 C6/C7, §2.2 F6 — reference
  * dbt/adapters/glue/lakeformation.py).
  *
  * The reference manages Lake Formation tags (lakeformation.py:21-164) and
  * data-cell filters — a row predicate plus a column include list enforced
  * at the catalog (lakeformation.py:167-204, `FilterConfig.to_api_repr`).
  * In-process the same contract maps to:
  *   - tags → table properties under a `graft.tag.` prefix (diff-based
  *     add/remove like the reference's update path)
  *   - data-cell filters → a secured VIEW rewriting the relation to
  *     `SELECT <allowed cols> WHERE <row filter>` — readers query the view,
  *     never the base table
  */
object Governance {

  /** C7: a data-cell filter — mirrors FilterConfig (lakeformation.py:167):
    * `rowFilter` is a SQL predicate ("true" = all rows); `includeColumns`
    * the visible columns (empty = all).
    */
  final case class CellFilter(rowFilter: String = "true",
      includeColumns: Seq[String] = Nil)

  /** C7: enforce a cell filter as a secured view over `table`. */
  def createSecuredView(spark: SparkSession, table: String, view: String,
      filter: CellFilter): Unit = {
    val cols =
      if (filter.includeColumns.isEmpty) "*"
      else filter.includeColumns.map(c => s"`$c`").mkString(", ")
    spark.sql(
      s"""CREATE OR REPLACE VIEW ${Relation.parse(view).quoted} AS
         |SELECT $cols FROM ${Relation.parse(table).quoted}
         |WHERE ${filter.rowFilter}""".stripMargin)
  }

  /** F6: the same filter applied inline to a DataFrame. */
  def applyFilter(df: DataFrame, filter: CellFilter): DataFrame = {
    val filtered = df.filter(expr(filter.rowFilter))
    if (filter.includeColumns.isEmpty) filtered
    else filtered.select(filter.includeColumns.map(col): _*)
  }

  private val TagPrefix = "graft.tag."

  /** C6: set tags (diff-based like lakeformation.py:62-118 — existing tags
    * not in `tags` are left alone; use [[removeTags]] to drop). */
  def setTags(spark: SparkSession, table: String, tags: Map[String, String]): Unit =
    if (tags.nonEmpty) {
      // Keys and values are caller data — they only enter the DDL as escaped
      // literals (a tag value containing ' must not break the statement).
      val props = tags
        .map { case (k, v) =>
          s"${Relation.sqlLiteral(TagPrefix + k)} = ${Relation.sqlLiteral(v)}"
        }.mkString(", ")
      spark.sql(s"ALTER TABLE ${Relation.parse(table).quoted} SET TBLPROPERTIES ($props)")
    }

  def removeTags(spark: SparkSession, table: String, keys: Seq[String]): Unit =
    if (keys.nonEmpty) {
      val props = keys.map(k => Relation.sqlLiteral(TagPrefix + k)).mkString(", ")
      spark.sql(
        s"ALTER TABLE ${Relation.parse(table).quoted} UNSET TBLPROPERTIES IF EXISTS ($props)")
    }

  /** C6: read back the tags on a relation. */
  def tags(spark: SparkSession, table: String): Map[String, String] =
    spark.sql(s"SHOW TBLPROPERTIES ${Relation.parse(table).quoted}")
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .collect { case (k, v) if k.startsWith(TagPrefix) =>
        k.stripPrefix(TagPrefix) -> v
      }.toMap
}
