package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality test queries (SURVEY §2.2 F5, §2.3 J1, §2.4 A1 — reference
  * macros/generic_test_sql/). Each returns the OFFENDING rows; an empty
  * result means the test passes, mirroring dbt's contract.
  */
object QualityChecks {

  /** not_null: rows where the column is null. */
  def notNull(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNull)

  /** unique: values that occur more than once, with their count. */
  def unique(df: DataFrame, column: String): DataFrame =
    df.groupBy(col(column))
      .agg(count(lit(1)).as("n_records"))
      .filter(col("n_records") > 1)

  /** accepted_values (reference accepted_values.sql:1-23): distinct values
    * outside the allowed list, with counts. */
  def acceptedValues(df: DataFrame, column: String, allowed: Seq[Any]): DataFrame =
    df.groupBy(col(column))
      .agg(count(lit(1)).as("n_records"))
      .filter(!col(column).isin(allowed: _*))

  /** relationships (reference relationships.sql:1-19): child values with no
    * matching parent — child LEFT ANTI JOIN parent on the key. */
  def relationships(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent, child(childKey) === parent(parentKey), "left_anti")

  /** Arbitrary-expression check (LF-style row filter surface, SURVEY §2.2
    * F6): rows violating the predicate. */
  def expression(df: DataFrame, predicate: Column): DataFrame =
    df.filter(!predicate)
}
