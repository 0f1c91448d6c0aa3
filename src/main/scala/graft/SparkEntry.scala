package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.queries.{EventQueries, MaterializationQueries, PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue by nation: 5-way star join + aggregate (SURVEY §7 step 2). */
  def entry(spark: SparkSession): DataFrame = {
    Engine.tune(spark)
    RelationalQueries.q02RevenueByNation(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ MaterializationQueries.queries ++
      PipelineQueries.queries ++ EventQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ MaterializationQueries.oracles ++
      PipelineQueries.oracles ++ EventQueries.oracles
}
