package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.RelationalQueries

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.crossJoin.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"

  /** The LM scorers' mean contract, encoded once for every spec: exact-
    * integer half-away rounding of the rational sum/n micro-nats, then
    * the 1e6 division (see UnigramLm.microMean).
    */
  def microMeanRef(lps: Seq[Long]): Double = {
    val s = lps.sum; val n = lps.length
    math.signum(s.toDouble) * ((2 * math.abs(s) + n) / (2L * n)) / 1e6
  }
}

class RelationalQueriesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and matches its oracle's column names") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      // force execution
      df.limit(5).collect()
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("q01 pricing summary has one row per (returnflag, linestatus)") {
    val rows = RelationalQueries.q01PricingSummary(spark, sf).collect()
    assert(rows.length === rows.map(r => (r.getString(0), r.getString(1))).distinct.length)
    assert(rows.nonEmpty)
  }

  test("q02 revenue by nation covers all 25 nations") {
    assert(RelationalQueries.q02RevenueByNation(spark, sf).count() === 25)
  }

  test("q03 top-k returns exactly 10 descending prices") {
    val prices = RelationalQueries.q03TopOrders(spark, sf)
      .collect().map(_.getDouble(2))
    assert(prices.length === 10)
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("q10 window rank returns at most 3 per segment") {
    val bySeg = RelationalQueries.q10WindowRank(spark, sf)
      .collect().groupBy(_.getString(0))
    assert(bySeg.values.forall(_.length <= 3))
  }

  test("q17 cross join cardinality = |region| * |supplier|") {
    assert(RelationalQueries.q17CrossJoin(spark, sf).count() === 5L * 10L)
  }
}
