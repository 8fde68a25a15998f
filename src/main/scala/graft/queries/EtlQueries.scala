package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.operators.{Dedup, Melt, QualityChecks, Upsert}

/** ETL operator queries (SURVEY §2 items 10-20, 25). */
object EtlQueries {

  /** q03: keep-most-recent dedup by key + critical-field validation
    * (ref transform_tiki.py:582,595). Latest event per user.
    */
  def q03DedupLatest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val deduped = Dedup.latestByKey(ev, Seq("user_id"),
      Seq(col("ts").desc, col("event_id").desc))
    QualityChecks.dropNullKeys(deduped, Seq("user_id", "event_type"))
      .select("user_id", "event_id", "ts", "event_type", "value")
      // emit wall-clock (ntz) timestamps: with the UTC session tz the cast
      // is value-preserving, and the parquet output stays naive
      // timestamp[us] instead of UTC-adjusted — the driver-canonical
      // physical type (VERDICT r2 #1)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
  }

  def q03Oracle: String =
    """SELECT user_id, event_id, ts, event_type, value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events) t
      |WHERE rn = 1 AND user_id IS NOT NULL AND event_type IS NOT NULL""".stripMargin

  /** q04: wide→long melt (ref transform_google_trends.py:68). */
  def q04Melt(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    Melt.wideToLong(l, Seq("l_orderkey", "l_linenumber"),
      Seq("quantity" -> "l_quantity", "extendedprice" -> "l_extendedprice",
        "discount" -> "l_discount", "tax" -> "l_tax"),
      varName = "metric", valueName = "metric_value")
  }

  def q04Oracle: String =
    """SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS metric_value FROM lineitem
      |UNION ALL SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
      |UNION ALL SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
      |UNION ALL SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem""".stripMargin

  /** q05: SCD1 MERGE upsert (ref load_to_bq.py:273, trends_dag.py:653).
    * Target = orders; source = simulated daily delta (10% updates at +10%
    * price, plus new keys). Matched rows take source values, target-only
    * column o_orderpriority is preserved, source-only keys are inserted.
    */
  def q05MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val priceD = expr("CAST(o_totalprice AS DECIMAL(18,2))")
    val target = o.select(col("o_orderkey"), priceD.as("total_price"),
      col("o_orderstatus").as("status"), col("o_orderpriority"))
    val updates = o.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"),
        expr("CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1))").as("total_price"),
        lit("U").as("status"))
    // offset far above any plausible orderkey (TPC-H max ≈ 6e6·SF) so the
    // synthetic insert keys can never collide with real ones and break
    // Upsert.merge's unique-source-key precondition
    val inserts = o.filter(col("o_orderkey") % 7 === 0)
      .select((col("o_orderkey") + 1000000000000000L).as("o_orderkey"),
        priceD.as("total_price"), lit("N").as("status"))
    Upsert.merge(target, updates.unionByName(inserts), keys = Seq("o_orderkey"))
      // merge arithmetic stays decimal-exact; the output type is canonical
      // double (Spark's (18,2)*(2,1) decimal result precision differs from
      // DuckDB's, so the raw decimal diverges physically — VERDICT r1)
      .withColumn("total_price", col("total_price").cast(DoubleType))
  }

  def q05Oracle: String =
    """WITH tgt AS (
      |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS total_price,
      |         o_orderstatus AS status, o_orderpriority
      |  FROM orders
      |), src AS (
      |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)) AS total_price,
      |         'U' AS status
      |  FROM orders WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 1000000000000000, CAST(o_totalprice AS DECIMAL(18,2)), 'N'
      |  FROM orders WHERE o_orderkey % 7 = 0
      |)
      |SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
      |  CAST(CASE WHEN s.o_orderkey IS NOT NULL THEN s.total_price ELSE t.total_price END AS DOUBLE) AS total_price,
      |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.status ELSE t.status END AS status,
      |  t.o_orderpriority
      |FROM tgt t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey""".stripMargin

  /** q06: hybrid merge keeping manually-curated fields
    * (ref load_to_bq.py:393 dim_categories COALESCE(T.c, S.c)).
    */
  def q06HybridMerge(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val target = n.select(col("n_nationkey").as("category_id"),
      when(col("n_nationkey") % 2 === 0, col("n_name")).as("category_name"),
      when(col("n_nationkey") % 5 === 0, concat(lit("MANUAL-"), col("n_name")))
        .as("standard_category"),
      lit(1).as("category_level"))
    val source = n.select(col("n_nationkey").as("category_id"),
        lower(col("n_name")).as("category_name"),
        lit("auto").as("standard_category"), lit(2).as("category_level"))
      .unionByName(n.select((col("n_nationkey") + 100).as("category_id"),
        lower(col("n_name")).as("category_name"),
        lit("auto").as("standard_category"), lit(2).as("category_level")))
    Upsert.merge(target, source, keys = Seq("category_id"),
      keepCols = Seq("category_name", "standard_category"))
  }

  def q06Oracle: String =
    """WITH tgt AS (
      |  SELECT n_nationkey AS category_id,
      |         CASE WHEN n_nationkey % 2 = 0 THEN n_name END AS category_name,
      |         CASE WHEN n_nationkey % 5 = 0 THEN 'MANUAL-' || n_name END AS standard_category,
      |         1 AS category_level
      |  FROM nation
      |), src AS (
      |  SELECT n_nationkey AS category_id, lower(n_name) AS category_name,
      |         'auto' AS standard_category, 2 AS category_level FROM nation
      |  UNION ALL
      |  SELECT n_nationkey + 100, lower(n_name), 'auto', 2 FROM nation
      |)
      |SELECT COALESCE(t.category_id, s.category_id) AS category_id,
      |  CASE WHEN t.category_id IS NOT NULL AND s.category_id IS NOT NULL THEN COALESCE(t.category_name, s.category_name)
      |       WHEN t.category_id IS NOT NULL THEN t.category_name ELSE s.category_name END AS category_name,
      |  CASE WHEN t.category_id IS NOT NULL AND s.category_id IS NOT NULL THEN COALESCE(t.standard_category, s.standard_category)
      |       WHEN t.category_id IS NOT NULL THEN t.standard_category ELSE s.standard_category END AS standard_category,
      |  CASE WHEN s.category_id IS NOT NULL THEN s.category_level ELSE t.category_level END AS category_level
      |FROM tgt t FULL OUTER JOIN src s ON t.category_id = s.category_id""".stripMargin

  /** q07: trends cleaning + dedup-aggregate (ref
    * transform_google_trends.py:87-146 — "<1"→0, coerce, groupBy(date,
    * keyword).agg(max score, max is_partial)). Score text is derived
    * deterministically so the oracle can rebuild it.
    */
  def q07TrendsAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val scoreText = when(col("value") < 1, lit("<1"))
      .otherwise(floor(col("value")).cast("long").cast("string"))
    val long = ev.select(to_date(col("ts")).as("trend_date"),
      col("event_type").as("keyword"), scoreText.as("score_text"),
      (dayofmonth(col("ts")) === 30).as("is_partial_raw"))
    long
      .withColumn("score",
        coalesce(regexp_replace(col("score_text"), "<1", "0").cast("long"), lit(0L)))
      .groupBy("trend_date", "keyword")
      .agg(max("score").as("score"), max("is_partial_raw").as("is_partial"),
        count(lit(1)).as("n_obs"))
  }

  def q07Oracle: String =
    """WITH long AS (
      |  SELECT CAST(ts AS DATE) AS trend_date, event_type AS keyword,
      |    CASE WHEN value < 1 THEN '<1' ELSE CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) END AS score_text,
      |    EXTRACT(day FROM ts) = 30 AS is_partial_raw
      |  FROM events
      |)
      |SELECT trend_date, keyword,
      |  MAX(COALESCE(TRY_CAST(replace(score_text, '<1', '0') AS BIGINT), 0)) AS score,
      |  MAX(is_partial_raw) AS is_partial,
      |  COUNT(*) AS n_obs
      |FROM long GROUP BY trend_date, keyword""".stripMargin

  /** q41: the trends aggregate restricted to fully-observed days — the
    * reference's dashboards drop the partial final day
    * (transform_google_trends.py keeps `isPartial`; the Looker layer
    * filters it). [[graft.operators.Trends.completeDays]] over q07.
    */
  def q41TrendsComplete(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Trends.completeDays(q07TrendsAgg(spark, dir), col("is_partial"))

  def q41Oracle: String =
    s"""SELECT * FROM (${q07Oracle}) WHERE NOT COALESCE(is_partial, false)"""

  /** q08: data-quality report in ONE aggregation pass
    * (ref dags/analytics_dag.py:172-240 ASSERT block — the reference scans
    * once per check; we fold all checks into a single partial-agg job).
    */
  def q08QualityChecks(spark: SparkSession, dir: String): DataFrame = {
    import QualityChecks.Check
    val mart = CoreQueries.q02GoldenJoin(spark, dir)
    QualityChecks.report(mart, Seq(
      Check("invalid_price", col("price_vnd_real") <= 0),
      Check("null_product_id", col("l_orderkey").isNull),
      Check("null_fx_rate", col("fx_rate").isNull),
      Check("unrealistic_usd_price", col("price_usd_real") > 100000),
      Check("unmapped_share_high", col("trend_signal_status") === "Unmapped"),
      // reference Check 4 + Check 6 (analytics_dag.py:204,222): ">0"
      // polarity — some rows inserted, some products carry trend data
      Check.atLeast("rows_inserted", lit(true)),
      Check.atLeast("has_trend_data", col("trend_signal_status") === "Full Data")))
  }

  def q08Oracle: String = {
    val base = CoreQueries.q02Oracle
    s"""WITH base AS (
       |$base
       |), agg AS (
       |  SELECT COUNT(*) AS total_rows,
       |    CAST(SUM(CASE WHEN price_vnd_real <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS invalid_price,
       |    CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_product_id,
       |    CAST(SUM(CASE WHEN fx_rate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_fx_rate,
       |    CAST(SUM(CASE WHEN price_usd_real > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS unrealistic_usd_price,
       |    CAST(SUM(CASE WHEN trend_signal_status = 'Unmapped' THEN 1 ELSE 0 END) AS BIGINT) AS unmapped_share_high,
       |    CAST(GREATEST(0, 1 - COUNT(*)) AS BIGINT) AS rows_inserted,
       |    CAST(GREATEST(0, 1 - SUM(CASE WHEN trend_signal_status = 'Full Data' THEN 1 ELSE 0 END)) AS BIGINT) AS has_trend_data
       |  FROM base
       |)
       |SELECT c.check_name, c.violations, agg.total_rows, c.violations = 0 AS passed
       |FROM agg, LATERAL (VALUES
       |  ('invalid_price', invalid_price),
       |  ('null_product_id', null_product_id),
       |  ('null_fx_rate', null_fx_rate),
       |  ('unrealistic_usd_price', unrealistic_usd_price),
       |  ('unmapped_share_high', unmapped_share_high),
       |  ('rows_inserted', rows_inserted),
       |  ('has_trend_data', has_trend_data)) AS c(check_name, violations)""".stripMargin
  }

  /** q12: star-schema dimension build (ref transform_tiki.py:601-775 split
    * into fact/dim_products: first-seen created_at, last-seen updated_at).
    */
  def q12StarSplit(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select("l_partkey", "l_shipdate")
    val p = Tables.part(spark, dir)
    l.join(p, l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_partkey").as("product_id"))
      .agg(max("p_name").as("name"), max("p_brand").as("brand_name"),
        max("p_type").as("type_name"),
        min("l_shipdate").as("created_at"), max("l_shipdate").as("updated_at"),
        count(lit(1)).as("n_snapshots"))
  }

  def q12Oracle: String =
    """SELECT p.p_partkey AS product_id, MAX(p.p_name) AS name,
      |  MAX(p.p_brand) AS brand_name, MAX(p.p_type) AS type_name,
      |  MIN(l.l_shipdate) AS created_at, MAX(l.l_shipdate) AS updated_at,
      |  COUNT(*) AS n_snapshots
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY p.p_partkey""".stripMargin

  /** q43: [[graft.operators.StarSchema.split]]'s dim_products output
    * directly (q12 computes the equivalent rollup with plain aggregates;
    * this gates the operator itself — latest-row SCD1 attributes + history
    * date stamps). Attributes are functionally dependent on the key in this
    * testdata, so the oracle's MAX() equals the latest-row value while the
    * operator still runs its dedup-then-join plan.
    */
  def q43StarDim(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select("l_partkey", "l_shipdate")
    val p = Tables.part(spark, dir).select("p_partkey", "p_name", "p_brand")
    val snap = l.join(p, l("l_partkey") === p("p_partkey"))
      .select(col("p_partkey").as("product_id"), col("p_name").as("name"),
        col("p_brand").as("brand_name"), col("l_shipdate"))
    graft.operators.StarSchema.split(snap,
      factCols = Seq("product_id", "l_shipdate"),
      dimKey = "product_id", dimCols = Seq("name", "brand_name"),
      catKey = "brand_name", catCols = Seq("name"),
      updatedAtCol = "l_shipdate").dimProducts
  }

  def q43Oracle: String =
    """SELECT p.p_partkey AS product_id, MAX(p.p_name) AS name,
      |  MAX(p.p_brand) AS brand_name,
      |  MIN(l.l_shipdate) AS created_at, MAX(l.l_shipdate) AS updated_at
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY p.p_partkey""".stripMargin
}
