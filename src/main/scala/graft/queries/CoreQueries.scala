package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables
import graft.operators.GoldenJoin

/** Reference-core analytics queries over the driver testdata.
  *
  * Numeric discipline: money columns are cast to DECIMAL before SUM so the
  * result is independent of partition/accumulation order (a double sum is
  * not). Averages are derived from the exact decimal sums via one double
  * division, which is bitwise deterministic — required for the driver's
  * hash-compare against the DuckDB oracle and for reproducibility on a real
  * cluster where partition order is arbitrary.
  */
object CoreQueries {

  /** Pricing summary mart aggregation (reference analytics layer grain:
    * dags/analytics_dag.py:97 OBT; shaped like TPC-H Q1 so partial
    * aggregation/codegen kick in). Includes the reference's
    * inventory_status derivation (transform_tiki.py:553 — price present and
    * > 0).
    */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    // The source doubles are conceptually fixed-point (2-decimal money,
    // 2-decimal rates); recover exact decimals BEFORE any arithmetic so both
    // engines compute identical exact products and order-independent sums.
    val priceD = col("l_extendedprice").cast(DecimalType(18, 2))
    val discD  = col("l_discount").cast(DecimalType(4, 2))
    val taxD   = col("l_tax").cast(DecimalType(4, 2))
    l.filter(col("l_shipdate") <= lit("1998-09-02"))
      .withColumn("in_stock",
        graft.functions.CleanFns.inventoryStatus(col("l_extendedprice")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      // sums aggregate as exact decimals (order-independent) and are cast to
      // double only in the final projection: Spark's sum(decimal) result
      // precision (28,2) differs from DuckDB's (38,2), so emitting the
      // decimal directly diverges physically even though values are equal.
      // Canonical output type for derived aggregates is double (VERDICT r1).
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"),
        sum(priceD).cast(DoubleType).as("sum_base_price"),
        sum(priceD * (lit(1) - discD)).cast(DoubleType).as("sum_disc_price"),
        sum(priceD * (lit(1) - discD) * (lit(1) + taxD)).cast(DoubleType).as("sum_charge"),
        count(lit(1)).as("count_order"),
        sum(when(col("in_stock"), 1L).otherwise(0L)).as("in_stock_count"))
      .withColumn("avg_qty",
        col("sum_qty").cast(DoubleType) / col("count_order"))
      .withColumn("avg_price",
        col("sum_base_price").cast(DoubleType) / col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  def q01Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order,
      |  CAST(SUM(CASE WHEN l_extendedprice IS NOT NULL AND l_extendedprice > 0 THEN 1 ELSE 0 END) AS BIGINT) AS in_stock_count,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
      |FROM lineitem
      |WHERE l_shipdate <= '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** The Golden Join (dags/analytics_dag.py:71-160): fact LEFT-joined to the
    * dimension chain + derived trends/fx dims, USD price normalization with
    * COALESCE fallback (analytics_dag.py:113, FALLBACK_FX_RATE=25400) and the
    * trend-signal CASE (analytics_dag.py:121).
    *
    * The testdata has no calendar overlap between orders (1995-2001) and
    * events (2024), so the trends/fx dims key on day-of-month: day 31 has no
    * fx row and order dates on it take the fallback branch; mkt segments
    * outside the keyword map take the 'Unmapped' branch — all three CASE
    * arms are exercised.
    *
    * Scale: nation/region/keyword-map/trends/fx are broadcast (tiny or
    * bounded by distinct-day cardinality); lineitem⋈orders⋈customer are
    * fact-scale shuffle joins left to AQE.
    */
  def q02GoldenJoin(spark: SparkSession, dir: String): DataFrame = {
    import GoldenJoin.Dim
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val c = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
    val r = Tables.region(spark, dir).select("r_regionkey", "r_name")

    // Keyword mapping dim (reference dim_keyword_mapping): segment → trend
    // keyword; segments not listed stay unmapped.
    val m = spark.createDataFrame(Seq(
      ("BUILDING", "click"), ("AUTOMOBILE", "view"), ("MACHINERY", "purchase")
    )).toDF("m_segment", "trend_keyword")

    // Trends dim (reference fact_google_trends): max score per (day, type).
    val ev = Tables.events(spark, dir)
    val t = ev.groupBy(dayofmonth(col("ts")).as("t_day"),
        col("event_type").as("t_keyword"))
      .agg(max(col("value").cast(DecimalType(18, 2))).as("trend_score"))

    // FX dim (reference dim_exchange_rate): one deterministic rate per day.
    val e = graft.operators.FxRates.daily(ev, dayofmonth(col("ts")), col("value"))

    val enriched = GoldenJoin.leftEnrich(
      l.join(o, l("l_orderkey") === o("o_orderkey"), "left"),
      Seq(
        Dim(c, (f, d) => f("o_custkey") === d("c_custkey"), hint = "shuffle"),
        Dim(n, (f, d) => f("c_nationkey") === d("n_nationkey")),
        Dim(r, (f, d) => f("n_regionkey") === d("r_regionkey")),
        Dim(m, (f, d) => f("c_mktsegment") === d("m_segment")),
        Dim(t, (f, d) => f("trend_keyword") === d("t_keyword") &&
          dayofmonth(f("o_orderdate")) === d("t_day")),
        Dim(e, (f, d) => dayofmonth(f("o_orderdate")) === d("fx_day"))
      ))

    graft.operators.FxRates
      .usdPrice(enriched, col("l_extendedprice"), col("rate"), "__usd")
      .select(
      col("l_orderkey"), col("l_linenumber"),
      to_date(col("o_orderdate")).as("order_date"),
      col("c_name").as("customer_name"),
      col("n_name").as("nation_name"),
      col("r_name").as("region_name"),
      col("l_extendedprice").as("price_vnd_real"),
      col("__usd").as("price_usd_real"),
      coalesce(col("rate").cast(DoubleType),
        lit(graft.operators.FxRates.FallbackRate)).as("fx_rate"),
      col("trend_keyword"),
      col("trend_score").cast(DoubleType).as("google_trend_score"),
      when(col("trend_keyword").isNull, "Unmapped")
        .when(col("trend_score").isNull, "No Trend Data")
        .otherwise("Full Data").as("trend_signal_status"))
  }

  def q02Oracle: String =
    """WITH m(m_segment, trend_keyword) AS (
      |  VALUES ('BUILDING','click'), ('AUTOMOBILE','view'), ('MACHINERY','purchase')
      |), t AS (
      |  SELECT EXTRACT(day FROM ts) AS t_day, event_type AS t_keyword,
      |         MAX(CAST(value AS DECIMAL(18,2))) AS trend_score
      |  FROM events GROUP BY 1, 2
      |), e AS (
      |  SELECT EXTRACT(day FROM ts) AS e_day,
      |         MAX(CAST(value AS DECIMAL(18,2))) AS fx_rate_raw
      |  FROM events GROUP BY 1
      |)
      |SELECT l.l_orderkey, l.l_linenumber,
      |  CAST(o.o_orderdate AS DATE) AS order_date,
      |  c.c_name AS customer_name,
      |  n.n_name AS nation_name,
      |  r.r_name AS region_name,
      |  l.l_extendedprice AS price_vnd_real,
      |  (CASE WHEN CAST(COALESCE(e.fx_rate_raw, CAST(25400 AS DECIMAL(18,2))) * 100 AS BIGINT) > 0
      |    THEN (2 * 100 * CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      + CAST(COALESCE(e.fx_rate_raw, CAST(25400 AS DECIMAL(18,2))) * 100 AS BIGINT))
      |     // (2 * CAST(COALESCE(e.fx_rate_raw, CAST(25400 AS DECIMAL(18,2))) * 100 AS BIGINT))
      |   END) / 100.0 AS price_usd_real,
      |  COALESCE(CAST(e.fx_rate_raw AS DOUBLE), 25400.0) AS fx_rate,
      |  m.trend_keyword,
      |  CAST(t.trend_score AS DOUBLE) AS google_trend_score,
      |  CASE WHEN m.trend_keyword IS NULL THEN 'Unmapped'
      |       WHEN t.trend_score IS NULL THEN 'No Trend Data'
      |       ELSE 'Full Data' END AS trend_signal_status
      |FROM lineitem l
      |LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      |LEFT JOIN m ON c.c_mktsegment = m.m_segment
      |LEFT JOIN t ON m.trend_keyword = t.t_keyword AND EXTRACT(day FROM o.o_orderdate) = t.t_day
      |LEFT JOIN e ON EXTRACT(day FROM o.o_orderdate) = e.e_day""".stripMargin
}
