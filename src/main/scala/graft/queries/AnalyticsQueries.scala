package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables
import graft.operators.{Analytics, FxRates}

/** Analytics-layer queries (SURVEY §2 items 20, 22, 26-29). */
object AnalyticsQueries {

  /** q11: FX dim build + currency normalization with fallback + source
    * marker (ref transform_fx_rate.py, analytics_dag.py:113).
    */
  def q11FxNormalize(spark: SparkSession, dir: String): DataFrame = {
    val fx = FxRates.daily(Tables.events(spark, dir),
      dayofmonth(col("ts")), col("value"))
    val o = Tables.orders(spark, dir)
    val joined = o.join(broadcast(fx),
      dayofmonth(o("o_orderdate")) === fx("fx_day"), "left")
    FxRates.usdPrice(joined, col("o_totalprice"), col("rate"), "__usd")
      .select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        col("o_totalprice").as("price_vnd"),
        coalesce(col("rate").cast(DoubleType), lit(FxRates.FallbackRate)).as("fx_rate"),
        col("__usd").as("price_usd"),
        when(col("rate").isNull, "Fallback").otherwise("derived").as("fx_source"),
        col("from_currency"), col("to_currency"))
  }

  def q11Oracle: String =
    """WITH fx AS (
      |  SELECT EXTRACT(day FROM ts) AS fx_day,
      |         MAX(CAST(value AS DECIMAL(18,2))) AS rate,
      |         'USD' AS from_currency, 'VND' AS to_currency
      |  FROM events GROUP BY 1
      |)
      |SELECT o.o_orderkey,
      |  CAST(o.o_orderdate AS DATE) AS order_date,
      |  o.o_totalprice AS price_vnd,
      |  COALESCE(CAST(fx.rate AS DOUBLE), 25400.0) AS fx_rate,
      |  (CASE WHEN CAST(COALESCE(fx.rate, CAST(25400 AS DECIMAL(18,2))) * 100 AS BIGINT) > 0
      |    THEN (2 * 100 * CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      + CAST(COALESCE(fx.rate, CAST(25400 AS DECIMAL(18,2))) * 100 AS BIGINT))
      |     // (2 * CAST(COALESCE(fx.rate, CAST(25400 AS DECIMAL(18,2))) * 100 AS BIGINT))
      |   END) / 100.0 AS price_usd,
      |  CASE WHEN fx.rate IS NULL THEN 'Fallback' ELSE 'derived' END AS fx_source,
      |  CASE WHEN fx.fx_day IS NOT NULL THEN 'USD' END AS from_currency,
      |  CASE WHEN fx.fx_day IS NOT NULL THEN 'VND' END AS to_currency
      |FROM orders o LEFT JOIN fx ON EXTRACT(day FROM o.o_orderdate) = fx.fx_day""".stripMargin

  /** q37: FX carry-forward gap-fill (ref fx_rate_dag.py:74-129's fallback
    * to a previous rate, as last_value-ignore-nulls over the calendar).
    * Every third observed day is dropped to manufacture gaps; the calendar
    * comes from the fact side's distinct days, so days the fx feed never
    * saw (day 31) are filled too.
    */
  def q37FxCarryForward(spark: SparkSession, dir: String): DataFrame = {
    val fx = FxRates.daily(Tables.events(spark, dir),
        dayofmonth(col("ts")), col("value"))
      .withColumn("fx_day", col("fx_day").cast("long"))
      .filter(col("fx_day") % 3 =!= 0)
      .select("fx_day", "rate", "from_currency", "to_currency")
    val cal = Tables.orders(spark, dir)
      .select(dayofmonth(col("o_orderdate")).cast("long").as("fx_day"))
      .distinct()
    FxRates.carryForward(fx, cal, "fx_day", "rate",
      partitionCols = Seq("from_currency", "to_currency"))
      // gap-fill runs on the exact decimal; outputs are canonical double
      // (the driver's hasher diverges on decimal bytes — VERDICT r2 #3)
      .withColumn("rate", col("rate").cast(DoubleType))
      .withColumn("rate_filled", col("rate_filled").cast(DoubleType))
  }

  def q37Oracle: String =
    """WITH fx AS (
      |  SELECT EXTRACT(day FROM ts) AS fx_day,
      |         MAX(CAST(value AS DECIMAL(18,2))) AS rate,
      |         'USD' AS from_currency, 'VND' AS to_currency
      |  FROM events GROUP BY 1
      |), gapped AS (
      |  SELECT * FROM fx WHERE fx_day % 3 <> 0
      |), cal AS (
      |  SELECT DISTINCT EXTRACT(day FROM o_orderdate) AS fx_day FROM orders
      |), series AS (
      |  SELECT c.fx_day, p.from_currency, p.to_currency
      |  FROM cal c CROSS JOIN (SELECT DISTINCT from_currency, to_currency FROM gapped) p
      |), j AS (
      |  SELECT s.fx_day, s.from_currency, s.to_currency, g.rate,
      |    last_value(g.rate IGNORE NULLS) OVER (
      |      PARTITION BY s.from_currency, s.to_currency ORDER BY s.fx_day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rate_filled
      |  FROM series s LEFT JOIN gapped g
      |    ON s.fx_day = g.fx_day AND s.from_currency = g.from_currency
      |   AND s.to_currency = g.to_currency
      |)
      |SELECT fx_day, from_currency, to_currency,
      |  CAST(rate AS DOUBLE) AS rate, CAST(rate_filled AS DOUBLE) AS rate_filled,
      |  CASE WHEN rate IS NOT NULL THEN 'observed'
      |       WHEN rate_filled IS NOT NULL THEN 'carried' END AS rate_source
      |FROM j""".stripMargin

  /** q13: top-3 products per brand by revenue (dashboard ranking). */
  def q13TopPerBrand(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select("l_partkey", "l_extendedprice", "l_discount")
    val p = Tables.part(spark, dir).select("p_partkey", "p_name", "p_brand")
    val revenue = l.join(p, l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"), col("p_name"))
      .agg(sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1) - col("l_discount").cast(DecimalType(4, 2))))).as("revenue"))
    Analytics.topNPerGroup(revenue, Seq("p_brand"),
      Seq(col("revenue").desc, col("p_partkey").asc), n = 3)
      // rank on the exact decimal; emit the canonical double (VERDICT r1)
      .withColumn("revenue", col("revenue").cast(DoubleType))
  }

  def q13Oracle: String =
    """WITH rev AS (
      |  SELECT p.p_brand, p.p_partkey, p.p_name,
      |    SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS revenue
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY p.p_brand, p.p_partkey, p.p_name
      |)
      |SELECT p_brand, p_partkey, p_name, CAST(revenue AS DOUBLE) AS revenue, rank
      |FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey ASC) AS INTEGER) AS rank
      |  FROM rev) t
      |WHERE rank <= 3""".stripMargin

  /** q14: market share — each nation's revenue share within its region. */
  def q14MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    val nationRev = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("revenue"),
        count(lit(1)).as("n_orders"))
    Analytics.shareOfTotal(nationRev, Seq("region_name"), "revenue", "revenue_share")
      // share divides the exact decimal sums; emit revenue as canonical double
      .withColumn("revenue", col("revenue").cast(DoubleType))
  }

  def q14Oracle: String =
    """WITH rev AS (
      |  SELECT r.r_name AS region_name, n.n_name AS nation_name,
      |    SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS revenue,
      |    COUNT(*) AS n_orders
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  GROUP BY r.r_name, n.n_name
      |)
      |SELECT region_name, nation_name, CAST(revenue AS DOUBLE) AS revenue, n_orders,
      |  CAST(revenue AS DOUBLE) / CAST(SUM(revenue) OVER (PARTITION BY region_name) AS DOUBLE) AS revenue_share
      |FROM rev""".stripMargin

  /** q15: day-over-day average price change per product (price-history
    * analysis on the fact_daily_snapshot grain).
    */
  def q15PriceHistory(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val daily = l.groupBy(col("l_partkey").as("product_id"),
        to_date(col("l_shipdate")).as("snapshot_date"))
      .agg((sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType) /
        count(lit(1))).as("avg_price"))
    Analytics.dayOverDay(daily, Seq("product_id"), col("snapshot_date"),
      "avg_price", "price_delta")
  }

  def q15Oracle: String =
    """WITH daily AS (
      |  SELECT l_partkey AS product_id, CAST(l_shipdate AS DATE) AS snapshot_date,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
      |  FROM lineitem GROUP BY 1, 2
      |)
      |SELECT *, avg_price - lag(avg_price, 1) OVER (PARTITION BY product_id ORDER BY snapshot_date) AS price_delta
      |FROM daily""".stripMargin

  /** q16: 7-day rolling average of daily trend volume per keyword
    * (trend smoothing over the fact_google_trends shape).
    */
  def q16RollingTrend(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val daily = ev.groupBy(col("event_type").as("keyword"),
        to_date(col("ts")).as("trend_date"))
      .agg(sum(col("value").cast(DecimalType(18, 2))).as("daily_value"),
        count(lit(1)).as("n_events"))
    Analytics.rollingAvg(daily, Seq("keyword"), col("trend_date"),
      "daily_value", size = 7, avgCol = "rolling_avg_7d")
      // the rolling window sums the exact decimal; emit canonical double
      .withColumn("daily_value", col("daily_value").cast(DoubleType))
  }

  def q16Oracle: String =
    """WITH daily AS (
      |  SELECT event_type AS keyword, CAST(ts AS DATE) AS trend_date,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS daily_value, COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT keyword, trend_date, CAST(daily_value AS DOUBLE) AS daily_value, n_events,
      |  CAST(SUM(daily_value) OVER w AS DOUBLE) / COUNT(daily_value) OVER w AS rolling_avg_7d
      |FROM daily
      |WINDOW w AS (PARTITION BY keyword ORDER BY trend_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin
}
