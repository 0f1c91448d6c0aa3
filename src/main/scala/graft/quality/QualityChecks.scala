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

  /** unique: NON-NULL values that occur more than once, with their count.
    * The null filter is dbt-core's default unique test contract (the
    * reference ships no unique.sql override, so core's `where column is
    * not null` applies): nulls are the not_null test's job — without the
    * filter, two null keys would report a spurious duplicate group.
    */
  def unique(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNotNull)
      .groupBy(col(column))
      .agg(count(lit(1)).as("n_records"))
      .filter(col("n_records") > 1)

  /** accepted_values (reference accepted_values.sql:1-23): distinct values
    * outside the allowed list, with counts. */
  def acceptedValues(df: DataFrame, column: String, allowed: Seq[Any]): DataFrame =
    df.groupBy(col(column))
      .agg(count(lit(1)).as("n_records"))
      .filter(!col(column).isin(allowed: _*))

  /** relationships (reference relationships.sql:1-19): child values with no
    * matching parent — child LEFT ANTI JOIN parent on the key. The parent
    * side routes through a renamed key projection: a SELF-referencing FK
    * (child eq parent — a standard dbt relationships case, e.g.
    * employees.manager_id → employees.id) would otherwise make
    * `child(key) === parent(key)` an ambiguous self-join; the rename also
    * dedups the anti-join build side. */
  def relationships(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val parentKeys = parent.select(col(parentKey).as("__parent_key")).distinct()
    child.filter(col(childKey).isNotNull)
      .join(parentKeys, col(childKey) === col("__parent_key"), "left_anti")
  }

  /** Arbitrary-expression check (LF-style row filter surface, SURVEY §2.2
    * F6): rows violating the predicate. */
  def expression(df: DataFrame, predicate: Column): DataFrame =
    df.filter(!predicate)

  /** Evaluate a test's offending-row frame under dbt's severity contract
    * (`severity` / `warn_if` / `error_if` thresholds, dbt-core test
    * configs) and optionally persist the offenders (`--store-failures`:
    * dbt writes each failing test's rows to an audit table so the
    * failures are queryable after the run, not just counted). Returns a
    * 1-row frame (n_failures, status) with status 'pass' /'warn'/
    * 'error': error when n_failures > errorAbove, else warn when
    * n_failures > warnAbove, else pass — dbt's default is both
    * thresholds at 0 with severity=error.
    *
    * Scale shape: the count is one aggregate over the offending frame;
    * when storing, the SAME frame materializes once via the audit-table
    * CTAS and the count reads the stored table rather than recomputing
    * the test query twice (dbt's store-then-count order).
    */
  def evaluate(offending: DataFrame, storeFailuresTable: Option[String] = None,
      warnAbove: Long = 0L, errorAbove: Long = 0L): DataFrame = {
    require(warnAbove >= 0 && errorAbove >= warnAbove,
      s"thresholds must satisfy 0 <= warn ($warnAbove) <= error ($errorAbove)")
    val spark = offending.sparkSession
    val counted = storeFailuresTable match {
      case Some(t) =>
        graft.materialize.TableMaterialization.run(spark, t, offending)
        spark.table(t)
      case None => offending
    }
    counted.agg(count(lit(1)).as("n_failures"))
      .select(col("n_failures"),
        when(col("n_failures") > errorAbove, lit("error"))
          .when(col("n_failures") > warnAbove, lit("warn"))
          .otherwise(lit("pass")).as("status"))
  }
}
