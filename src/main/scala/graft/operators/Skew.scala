package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-management operators for 100 TB layouts.
  *
  * AQE's skew-join splitting handles most hot keys automatically; these are
  * the explicit tools for the cases it can't reach — a single aggregation
  * key holding a large share of all rows, or a join against a hot dimension
  * row.
  */
object Skew {

  /** Two-phase salted aggregation: rows are spread over `saltBuckets`
    * sub-keys, partially aggregated per (key, salt), then finally combined
    * per key. A key holding 30% of the table no longer lands on one reducer
    * — it lands on `saltBuckets` of them, at the cost of a second (tiny)
    * shuffle over the partial rows.
    *
    * `partials` aggregate the raw rows per (key, salt); `finals` combine
    * the partial columns per key (so e.g. COUNT becomes SUM of partial
    * counts). The caller owns that algebra — it is what makes an aggregate
    * salt-able (commutative + associative).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side: the hot left rows are salted
    * into `saltBuckets` sub-keys and the (small) right side is exploded
    * once per bucket, so a hot join key fans across `saltBuckets` tasks
    * instead of one. Right-side cost multiplies by `saltBuckets` — use for
    * dimension-sized right sides only (the broadcast-ineligible middle
    * ground).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val explodedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(explodedRight, keys :+ "__salt").drop("__salt")
  }
}
