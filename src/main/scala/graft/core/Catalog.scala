package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog facade (SURVEY §2.8 C1–C5) over `spark.catalog` — the in-process
  * analog of the reference's Glue Data Catalog plane (reference
  * dbt/adapters/glue/impl.py:137-166, 219-288, 446-536, 538-612).
  *
  * These are metadata-plane operations: result sizes are bounded by catalog
  * cardinality (schemas × tables), so the driver-side materialization that
  * `spark.catalog` implies is the correct shape even against a 100 TB
  * warehouse — the reference pages the same lists out of the Glue API.
  */
object Catalog {

  /** C1: list schemas/databases (impl.py:137-146 `list_schemas`). */
  def listSchemas(spark: SparkSession): Seq[String] =
    spark.catalog.listDatabases().collect().map(_.name).toSeq.sorted

  /** C2: list relations in a schema with their types
    * (impl.py:148-166 `list_relations_without_caching`). Session temp views
    * are excluded — the reference lists the persistent (Glue) catalog only,
    * and Spark's listTables mixes schema-less temp views into every schema.
    */
  def listRelations(spark: SparkSession, schema: String): Seq[RelationInfo] =
    spark.catalog.listTables(schema).collect().toSeq
      .filterNot(_.isTemporary)
      .map { t =>
        RelationInfo(Option(t.database).getOrElse(""), t.name,
          t.tableType.toLowerCase)
      }.sortBy(r => (r.schema, r.identifier))

  /** C3: get_relation / table-type detection (impl.py:219-288; the reference
    * additionally sniffs iceberg/delta via table parameters — here the
    * provider IS the format). Returns None when absent rather than throwing,
    * matching adapter get_relation semantics.
    */
  def getRelation(spark: SparkSession, schema: String, name: String): Option[RelationInfo] = {
    val rel = Relation(schema, name)
    if (!spark.catalog.tableExists(rel.quoted)) None
    else {
      val t = spark.catalog.getTable(rel.quoted)
      val provider =
        if (t.tableType.equalsIgnoreCase("VIEW")) None
        else describeProvider(spark, rel)
      Some(RelationInfo(Option(t.database).getOrElse(""), t.name,
        t.tableType.toLowerCase, isTemporary = t.isTemporary, format = provider))
    }
  }

  private def describeProvider(spark: SparkSession, rel: Relation): Option[String] =
    spark.sql(s"DESCRIBE TABLE EXTENDED ${rel.quoted}")
      .filter(col("col_name") === "Provider")
      .collect().headOption.map(_.getString(1).toLowerCase)

  /** C4: create schema (impl.py:446-536; LF grants collapse away locally). */
  def createSchema(spark: SparkSession, schema: String,
      location: Option[String] = None): Unit = {
    val loc = location.map(l => s" LOCATION '$l'").getOrElse("")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$schema`$loc")
  }

  /** C4: drop schema; cascade drops contained relations first. */
  def dropSchema(spark: SparkSession, schema: String, cascade: Boolean = false): Unit = {
    val suffix = if (cascade) " CASCADE" else " RESTRICT"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema`$suffix")
  }

  /** C5: catalog snapshot for docs (impl.py:538-612 `_get_one_catalog`) —
    * one row per column: (schema, table, type, column, dtype, position). */
  def snapshot(spark: SparkSession, schema: String): DataFrame = {
    import spark.implicits._
    val rows = listRelations(spark, schema).flatMap { r =>
      val fields = spark.table(Relation(r.schema, r.identifier).quoted).schema.fields
      fields.zipWithIndex.map { case (f, i) =>
        (r.schema, r.identifier, r.tableType, f.name, f.dataType.simpleString, i)
      }
    }
    rows.toDF("table_schema", "table_name", "table_type",
      "column_name", "column_type", "column_index")
  }
}

/** Catalog-plane description of a relation (C2/C3). */
final case class RelationInfo(
    schema: String,
    identifier: String,
    tableType: String,
    isTemporary: Boolean = false,
    format: Option[String] = None)
