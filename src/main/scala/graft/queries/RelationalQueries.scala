package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.core.Tables

/** The relational capability surface (SURVEY.md §2.2–§2.6).
  *
  * The reference passes user model SQL verbatim to Spark SQL (reference
  * gluedbapi/connection.py:430), so its query contract is "whatever Spark SQL
  * supports". Each query here demonstrates one operator family, paired with
  * ANSI SQL the driver replays in DuckDB.
  *
  * Numeric-determinism policy: raw doubles pass through untouched (bitwise
  * identical in both engines); any SUM/AVG over doubles goes through
  * DECIMAL(18,2) (the data is 2dp) so both engines do exact decimal
  * arithmetic, then casts the final aggregate to double the same way on both
  * sides. Every query ends in a total ORDER BY so row order is deterministic.
  */
object RelationalQueries {
  private val D2 = DecimalType(18, 2)
  /** Exact-decimal view of a 2dp double column. */
  private def dec(c: Column): Column = c.cast(D2)
  /** revenue item: extendedprice * (1 - discount), exact decimal. */
  private def revItem(price: Column, disc: Column): Column =
    (dec(price) * (lit(1) - dec(disc))).cast(DecimalType(18, 4))
  private val revSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q01
  /** A4: hash aggregate with multiple measures (TPC-H Q1 shape). */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        sum(revItem(col("l_extendedprice"), col("l_discount"))).cast(DoubleType).as("sum_disc_price"),
        sum((revItem(col("l_extendedprice"), col("l_discount")) * (lit(1) + dec(col("l_tax"))))
          .cast(DecimalType(28, 6))).cast(DoubleType).as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast(DoubleType) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       |  CAST(SUM($revSql) AS DOUBLE) AS sum_disc_price,
       |  CAST(SUM(CAST($revSql * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** J4: multi-way join (star schema) + aggregate. Dims are small —
    * Catalyst auto-broadcasts them under the 10 MB threshold; the fact
    * table shuffles once, on the group key.
    */
  def q02RevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(revItem(col("l_extendedprice"), col("l_discount"))).cast(DoubleType).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val q02Sql =
    s"""SELECT r_name, n_name,
       |  CAST(SUM($revSql) AS DOUBLE) AS revenue,
       |  COUNT(DISTINCT o_orderkey) AS n_orders
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q03
  /** T1: global top-k (sort + limit; Spark plans TakeOrderedAndProject —
    * no full sort, no single-partition shuffle). */
  def q03TopOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  private val q03Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q04
  /** F1/F5: filter + projection; predicates and 4-column ReadSchema push
    * down to the parquet scan. */
  def q04FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
        col("l_quantity") > 45 && col("l_discount").isNotNull)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q04Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_quantity > 45 AND l_discount IS NOT NULL
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q05
  /** J1: referential-integrity anti join (reference
    * macros/generic_test_sql/relationships.sql:1-19 — child left join parent
    * where parent key is null ≡ left_anti). */
  def q05AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1998-01-01")))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val q05Sql =
    """SELECT c_custkey, c_name
      |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01') o
      |  ON c_custkey = o_custkey
      |WHERE o_orderkey IS NULL
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q06
  /** A1/T6: accepted-values data test (reference
    * macros/generic_test_sql/accepted_values.sql:1-23). */
  def q06AcceptedValues(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .filter(!col("o_orderstatus").isin("O", "F"))
      .orderBy(col("o_orderstatus"))

  private val q06Sql =
    """SELECT o_orderstatus, COUNT(*) AS n FROM orders
      |GROUP BY o_orderstatus
      |HAVING o_orderstatus NOT IN ('O', 'F')
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q07
  /** F4: incremental high-watermark scalar subquery (reference
    * tests/functional/adapter/test_basic.py:279-286 — `where id > (select
    * max(id) from this)`). */
  def q07HighWatermark(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderkey > (SELECT MAX(o_orderkey) - 200 FROM orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  private val q07Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_orderkey > (SELECT MAX(o_orderkey) - 200 FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q08
  /** T2: UNION ALL of two branches (reference test fixture models,
    * tests/functional/adapter/test_iceberg.py:296-308). */
  def q08UnionAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val hi = o.filter(col("o_totalprice") > 400000)
      .select(lit("high_value").as("bucket"), col("o_orderkey"))
    val recent = o.filter(col("o_orderdate") >= to_timestamp(lit("1998-06-01")))
      .select(lit("recent").as("bucket"), col("o_orderkey"))
    hi.unionByName(recent)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), countDistinct(col("o_orderkey")).as("n_distinct"))
      .orderBy(col("bucket"))
  }

  private val q08Sql =
    """SELECT bucket, COUNT(*) AS n, COUNT(DISTINCT o_orderkey) AS n_distinct FROM (
      |  SELECT 'high_value' AS bucket, o_orderkey FROM orders WHERE o_totalprice > 400000
      |  UNION ALL
      |  SELECT 'recent' AS bucket, o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-06-01'
      |) GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q09
  /** Set ops: INTERSECT and EXCEPT (passthrough surface, SURVEY §2.6). */
  def q09SetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def buyers(year: Int) = o
      .filter(col("o_orderdate") >= to_timestamp(lit(s"$year-01-01")) &&
        col("o_orderdate") < to_timestamp(lit(s"${year + 1}-01-01")))
      .select(col("o_custkey"))
    val both = buyers(1997).intersect(buyers(1998)).withColumn("segment", lit("both"))
    val only97 = buyers(1997).except(buyers(1998)).withColumn("segment", lit("only_1997"))
    both.unionByName(only97).orderBy(col("segment"), col("o_custkey"))
  }

  private val q09Sql =
    """WITH b97 AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'),
      |     b98 AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01')
      |SELECT o_custkey, 'both' AS segment FROM (SELECT * FROM b97 INTERSECT SELECT * FROM b98)
      |UNION ALL
      |SELECT o_custkey, 'only_1997' AS segment FROM (SELECT * FROM b97 EXCEPT SELECT * FROM b98)
      |ORDER BY segment, o_custkey""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Window ranking: top-3 orders per market segment (deterministic
    * tiebreak on orderkey). */
  def q10WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.join(c, o("o_custkey") === c("c_custkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_mktsegment"), col("rk"))
  }

  private val q10Sql =
    """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |) WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Window analytic frame: running revenue per supplier (rowsBetween
    * unbounded preceding → current). Exact decimal inside the frame. */
  def q11WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).filter(col("l_suppkey") <= 2)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(revItem(col("l_extendedprice"), col("l_discount"))).over(w)
          .cast(DoubleType).as("running_revenue"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  private val q11Sql =
    s"""SELECT l_suppkey, l_orderkey, l_linenumber,
       |  CAST(SUM($revSql) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue
       |FROM lineitem WHERE l_suppkey <= 2
       |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q12
  /** ROLLUP grouping sets over order year/month. */
  def q12Rollup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"),
        col("o_totalprice"))
      .rollup(col("yr"), col("mo"))
      .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).cast(DoubleType).as("total"))
      .orderBy(col("yr").asc_nulls_first, col("mo").asc_nulls_first)
  }

  private val q12Sql =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
      |  COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP (yr, mo)
      |ORDER BY yr ASC NULLS FIRST, mo ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q13
  /** A5: DISTINCT projection. */
  def q13Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_nationkey"))
      .distinct()
      .orderBy(col("c_mktsegment"), col("c_nationkey"))

  private val q13Sql =
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q14
  /** O5/T5: the snapshot row-id hash — md5 over pipe-joined, null-coalesced
    * columns (reference macros/materializations/snapshot.sql:1-6). */
  def q14ScdHash(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .select(
        col("n_nationkey"),
        md5(concat_ws("|",
          coalesce(col("n_nationkey").cast("string"), lit("")),
          coalesce(col("n_name"), lit("")),
          coalesce(col("n_regionkey").cast("string"), lit("")))).as("scd_id"))
      .orderBy(col("n_nationkey"))

  private val q14Sql =
    """SELECT n_nationkey,
      |  md5(concat_ws('|', coalesce(CAST(n_nationkey AS VARCHAR), ''),
      |                     coalesce(n_name, ''),
      |                     coalesce(CAST(n_regionkey AS VARCHAR), ''))) AS scd_id
      |FROM nation ORDER BY n_nationkey""".stripMargin

  // ---------------------------------------------------------------- q15
  /** T7/T3: date/time functions — extract, trunc, day bucketing over the
    * events table. */
  def q15DateFunctions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast(DoubleType).as("total_value"))
      .orderBy(col("day"), col("event_type"))

  private val q15Sql =
    """SELECT CAST(ts AS DATE) AS day, event_type,
      |  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  // ---------------------------------------------------------------- q16
  /** T6 + CASE: bucketed conditional aggregation with NOT IN. */
  def q16CaseNotIn(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(!col("c_mktsegment").isin("AUTOMOBILE"))
      .select(
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 5000, "mid").otherwise("high").as("balance_bucket"))
      .groupBy(col("balance_bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("balance_bucket"))

  private val q16Sql =
    """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
      |            WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS balance_bucket,
      |  COUNT(*) AS n
      |FROM customer WHERE c_mktsegment NOT IN ('AUTOMOBILE')
      |GROUP BY 1 ORDER BY balance_bucket""".stripMargin

  // ---------------------------------------------------------------- q17
  /** J3: explicit cross join (reference enables crossJoin per session —
    * gluedbapi/connection.py:429). */
  def q17CrossJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.region(spark, dir)
      .crossJoin(Tables.supplier(spark, dir))
      .select(col("r_name"), col("s_name"))
      .orderBy(col("r_name"), col("s_name"))

  private val q17Sql =
    "SELECT r_name, s_name FROM region CROSS JOIN supplier ORDER BY r_name, s_name"

  // ---------------------------------------------------------------- q18
  /** J4: left-semi join (EXISTS). */
  def q18SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_active_customers"))
      .orderBy(col("c_nationkey"))
  }

  private val q18Sql =
    """SELECT c_nationkey, COUNT(*) AS n_active_customers
      |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q19
  /** T8: string functions — lower/upper/trim/substring/replace/length/concat. */
  def q19StringFunctions(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        length(col("p_name")).as("name_len"),
        concat_ws(":", col("p_brand"), col("p_type")).as("brand_type"))
      .filter(col("p_name").startsWith("s") || col("p_name").contains("bolt"))
      .orderBy(col("p_partkey"))

  private val q19Sql =
    """SELECT p_partkey, lower(p_name) AS name_lower, upper(p_brand) AS brand_upper,
      |  substring(p_type, 1, 5) AS type_prefix, replace(p_name, ' ', '_') AS name_snake,
      |  CAST(length(p_name) AS INT) AS name_len, concat_ws(':', p_brand, p_type) AS brand_type
      |FROM part WHERE p_name LIKE 's%' OR p_name LIKE '%bolt%'
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q20
  /** JSON extraction from the events.props payload. */
  def q20Json(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  private val q20Sql =
    """SELECT event_type, COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
      |FROM (SELECT event_type, CAST(props->>'$.k' AS INT) AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q21
  /** Lateral explode of a split array: token frequencies over documents. */
  def q21Explode(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  private val q21Sql =
    """SELECT token, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE length(token) > 0
      |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q22
  /** approx_count_distinct (HLL). Sketch estimates differ across engines, so
    * the comparable output is the exact count plus an error-bound boolean:
    * |approx - exact| / exact < 5% (HLL rsd default is 5%). The oracle
    * computes the exact count and expects the bound to hold. */
  def q22ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) <
          col("exact_parts") * 0.05).as("within_bound"))
      .orderBy(col("l_returnflag"))

  private val q22Sql =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts, TRUE AS within_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q23
  /** J4 + broadcast hint: dimension join with an explicit broadcast. */
  def q23BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    s.join(n, s("s_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"), col("r_name"))
      .orderBy(col("s_suppkey"))
  }

  private val q23Sql =
    """SELECT s_suppkey, s_name, n_name, r_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q24
  /** PIVOT: orders per year × status matrix. Pivot values are enumerated
    * explicitly so the output schema is static (the scale-safe form — a
    * value-discovering pivot adds a collect of the key domain). */
  def q24Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).as("yr"), col("o_orderstatus"))
      .groupBy(col("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("yr"))

  private val q24Sql =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr,
      |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
      |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
      |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
      |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin

  // ---------------------------------------------------------------- q25
  /** Higher-order array functions — filter/transform/aggregate stay INSIDE
    * the array (no explode, no shuffle): long-token stats per document. */
  def q25HigherOrder(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        filter(split(trim(col("text")), "\\s+"), t => length(t) > 4).as("long_toks"))
      .select(col("doc_id"),
        size(col("long_toks")).as("n_long"),
        aggregate(transform(col("long_toks"), t => length(t)),
          lit(0), (acc, n) => acc + n).as("long_chars"))
      .orderBy(col("doc_id"))

  private val q25Sql =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
      |           x -> length(x) > 4)) AS INT) AS n_long,
      |  CAST(coalesce(list_sum(list_transform(
      |           list_filter(string_split_regex(trim(text), '\s+'),
      |                       x -> length(x) > 4),
      |           x -> length(x))), 0) AS INT) AS long_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q26
  /** GROUPING SETS + CUBE with grouping_id — the rest of the OLAP
    * multi-level aggregation family beyond q12's rollup. grouping_id
    * disambiguates a NULL group key from the all-group aggregate (the
    * thing naive NULL-keyed rollups get wrong); both engines compute the
    * same bit vector.
    */
  def q26GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(col("o_orderstatus").as("st"), col("o_orderpriority").as("pri"),
        col("o_totalprice"))
      .cube(col("st"), col("pri"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast(DoubleType).as("total"))
      .orderBy(col("gid"), col("st").asc_nulls_first, col("pri").asc_nulls_first)
  }

  private val q26Sql =
    """SELECT o_orderstatus AS st, o_orderpriority AS pri,
      |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY gid, st ASC NULLS FIRST, pri ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q27
  /** Window navigation family — lead/lag/ntile/percent_rank/cume_dist
    * over a per-customer order timeline (q10/q11 cover rank and running
    * frames; this pins the navigation + distribution functions). All
    * deterministic: the window's (date, key) order is total, and the
    * distribution functions are exact rational arithmetic both engines
    * compute identically in doubles.
    */
  def q27WindowNav(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_custkey") <= 100)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("prev_order", lag(col("o_orderkey"), 1).over(w))
      .withColumn("next_order", lead(col("o_orderkey"), 1).over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q27Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  lag(o_orderkey) OVER w AS prev_order,
      |  lead(o_orderkey) OVER w AS next_order,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM orders WHERE o_custkey <= 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ----------------------------------------------------------------
  // ---------------------------------------------------------------- graph
  /** Deterministic integer PageRank over the supplier co-order graph
    * (suppliers are linked when they serve the same order — both
    * directions, so the graph is symmetric and dangling-free). 5 fixed
    * synchronous iterations in micro-units; the oracle replays every
    * iteration with the identical integer arithmetic as unrolled CTEs.
    */
  def graphPagerank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
    val edges = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_suppkey") =!= col("b.l_suppkey"))
      .select(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
    graft.operators.PageRank.run(edges, "src", "dst", iterations = 5)
      .select(col("node").as("s_suppkey"), col("rank"))
      .orderBy(col("rank").desc, col("s_suppkey"))
  }

  private val graphPagerankSql: String = {
    val iters = (1 to 5).map { i =>
      s""", r$i AS (
         |  SELECT n.node,
         |    CAST(150000 + (85 * COALESCE(s.incoming, 0)) // 100 AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, SUM(r.rank // o.d) AS incoming
         |    FROM edges e JOIN r${i - 1} r ON r.node = e.src
         |      JOIN outdeg o ON o.src = e.src
         |    GROUP BY e.dst) s ON s.node = n.node)""".stripMargin
    }.mkString
    s"""WITH edges AS (
       |  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
       |), outdeg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes)$iters
       |SELECT node AS s_suppkey, rank FROM r5
       |ORDER BY rank DESC, s_suppkey""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "graph_pagerank" -> (graphPagerank _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_revenue_by_nation" -> (q02RevenueByNation _),
    "q03_topk_orders" -> (q03TopOrders _),
    "q04_filter_project" -> (q04FilterProject _),
    "q05_anti_join" -> (q05AntiJoin _),
    "q06_accepted_values" -> (q06AcceptedValues _),
    "q07_high_watermark" -> (q07HighWatermark _),
    "q08_union_all" -> (q08UnionAll _),
    "q09_set_ops" -> (q09SetOps _),
    "q10_window_rank" -> (q10WindowRank _),
    "q11_window_running" -> (q11WindowRunning _),
    "q12_rollup" -> (q12Rollup _),
    "q13_distinct" -> (q13Distinct _),
    "q14_scd_hash" -> (q14ScdHash _),
    "q15_date_functions" -> (q15DateFunctions _),
    "q16_case_not_in" -> (q16CaseNotIn _),
    "q17_cross_join" -> (q17CrossJoin _),
    "q18_semi_join" -> (q18SemiJoin _),
    "q19_string_functions" -> (q19StringFunctions _),
    "q20_json" -> (q20Json _),
    "q21_explode" -> (q21Explode _),
    "q22_approx_distinct" -> (q22ApproxDistinct _),
    "q23_broadcast_join" -> (q23BroadcastJoin _),
    "q24_pivot" -> (q24Pivot _),
    "q25_higher_order" -> (q25HigherOrder _),
    "q26_grouping_sets" -> (q26GroupingSets _),
    "q27_window_nav" -> (q27WindowNav _))

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> graphPagerankSql,
    "q01_pricing_summary" -> q01Sql,
    "q02_revenue_by_nation" -> q02Sql,
    "q03_topk_orders" -> q03Sql,
    "q04_filter_project" -> q04Sql,
    "q05_anti_join" -> q05Sql,
    "q06_accepted_values" -> q06Sql,
    "q07_high_watermark" -> q07Sql,
    "q08_union_all" -> q08Sql,
    "q09_set_ops" -> q09Sql,
    "q10_window_rank" -> q10Sql,
    "q11_window_running" -> q11Sql,
    "q12_rollup" -> q12Sql,
    "q13_distinct" -> q13Sql,
    "q14_scd_hash" -> q14Sql,
    "q15_date_functions" -> q15Sql,
    "q16_case_not_in" -> q16Sql,
    "q17_cross_join" -> q17Sql,
    "q18_semi_join" -> q18Sql,
    "q19_string_functions" -> q19Sql,
    "q20_json" -> q20Sql,
    "q21_explode" -> q21Sql,
    "q22_approx_distinct" -> q22Sql,
    "q23_broadcast_join" -> q23Sql,
    "q24_pivot" -> q24Sql,
    "q25_higher_order" -> q25Sql,
    "q26_grouping_sets" -> q26Sql,
    "q27_window_nav" -> q27Sql)
}
