package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.CleanFns

/** Exercises the reference's text parsers (SURVEY §2 items 1-8) on
  * deterministically derived string columns, so the DuckDB oracle can build
  * the identical inputs and recompute the identical parse.
  */
object ParseQueries {

  /** q09: Vietnamese sales-volume / discount / price / URL parsing
    * (ref transform_tiki.py:191,261,286,308,350,663).
    */
  def q09ParseFuncs(spark: SparkSession, dir: String): DataFrame = {
    // a small compressed parquet arrives as ONE split and this query is a
    // pure projection (no shuffle anywhere) — without a repartition the
    // whole regex-parse pipeline runs on a single core (SURVEY §5 trap);
    // the narrow 6-column shuffle is ~100x cheaper than the serial parse
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_partkey", "l_suppkey", "l_shipdate")
      .repartition(col("l_orderkey"))
    // floor() before the int cast: Spark's double→bigint cast truncates but
    // DuckDB's rounds — floor makes the derived input identical either way
    val qtyS = floor(col("l_quantity")).cast("bigint").cast("string")
    val pk900 = (col("l_partkey") % 900 + 100).cast("string")
    val salesText = when(col("l_linenumber") % 4 === 0, concat(lit("Đã bán "), qtyS))
      .when(col("l_linenumber") % 4 === 1, concat(lit("Đã bán "), qtyS, lit("k")))
      .when(col("l_linenumber") % 4 === 2, concat(lit("Đã bán "), qtyS, lit(".5tr")))
      .otherwise(concat(lit("Đã bán "), pk900, lit(".000")))
    val discountText = concat(lit("-"), (col("l_suppkey") % 100).cast("string"), lit("%"))
    val priceText = when(col("l_linenumber") % 3 === 0, concat(pk900, lit(".000 VND")))
      .when(col("l_linenumber") % 3 === 1, concat(col("l_partkey").cast("string"), lit(" đ")))
      .otherwise(lit(""))
    val url = concat(lit("https://tiki.vn/cat-"), col("l_partkey").cast("string"),
      lit("/c"), (col("l_partkey") % 5000).cast("string"), lit("?page=2"))
    val tsText = concat(date_format(col("l_shipdate"), "yyyy-MM-dd"), lit("T16:49:55.805Z"))

    l.select(
      col("l_orderkey"), col("l_linenumber"),
      CleanFns.parseSalesVolume(salesText).as("sales_volume_acc"),
      CleanFns.parseDiscountRate(discountText).as("discount_rate"),
      CleanFns.cleanPrice(priceText).as("current_price"),
      CleanFns.extractCategoryId(url).as("category_id"),
      CleanFns.extractUrlKey(url).as("url_key"),
      CleanFns.toSnapshotDate(tsText).as("snapshot_date"))
  }

  /** q125: q09's ENTIRE parse chain run through `spark.sql` on the
    * [[graft.plans.GraftExtensions]]-registered function surface instead
    * of the DataFrame API — the same derived inputs, the same six
    * registered functions by their SQL names, the same oracle VERBATIM
    * ([[q09Oracle]]). This oracle-gates SURVEY item 51b (the SQL surface):
    * the spec already proves SQL ≡ DataFrame row-for-row; this proves the
    * SQL path against the independent DuckDB replay, so a builder that
    * resolved a name to the wrong Column tree would hash-fail here even
    * if both engines' paths drifted together.
    *
    * Registration goes through the same `registrations` seq
    * `spark.sql.extensions` installs — registerFunction is idempotent, so
    * running the gate in a session that already loaded GraftExtensions is
    * fine.
    */
  def q125SqlSurface(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.registrations.foreach { case (id, info, b) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, b)
    }
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_partkey",
        "l_suppkey", "l_shipdate")
      .createOrReplaceTempView("graft_q125_lineitem")
    // REPARTITION hint = q09's .repartition(col("l_orderkey")): one
    // compressed parquet split would otherwise serialize the regex parse
    spark.sql(
      """WITH src AS (
        |  SELECT /*+ REPARTITION(l_orderkey) */ l_orderkey, l_linenumber,
        |    CASE WHEN l_linenumber % 4 = 0 THEN concat('Đã bán ', CAST(CAST(floor(l_quantity) AS BIGINT) AS STRING))
        |         WHEN l_linenumber % 4 = 1 THEN concat('Đã bán ', CAST(CAST(floor(l_quantity) AS BIGINT) AS STRING), 'k')
        |         WHEN l_linenumber % 4 = 2 THEN concat('Đã bán ', CAST(CAST(floor(l_quantity) AS BIGINT) AS STRING), '.5tr')
        |         ELSE concat('Đã bán ', CAST(l_partkey % 900 + 100 AS STRING), '.000') END AS sales_text,
        |    concat('-', CAST(l_suppkey % 100 AS STRING), '%') AS discount_text,
        |    CASE WHEN l_linenumber % 3 = 0 THEN concat(CAST(l_partkey % 900 + 100 AS STRING), '.000 VND')
        |         WHEN l_linenumber % 3 = 1 THEN concat(CAST(l_partkey AS STRING), ' đ')
        |         ELSE '' END AS price_text,
        |    concat('https://tiki.vn/cat-', CAST(l_partkey AS STRING), '/c', CAST(l_partkey % 5000 AS STRING), '?page=2') AS url,
        |    concat(date_format(l_shipdate, 'yyyy-MM-dd'), 'T16:49:55.805Z') AS ts_text
        |  FROM graft_q125_lineitem
        |)
        |SELECT l_orderkey, l_linenumber,
        |  parse_sales_volume(sales_text) AS sales_volume_acc,
        |  parse_discount_rate(discount_text) AS discount_rate,
        |  clean_price(price_text) AS current_price,
        |  extract_category_id(url) AS category_id,
        |  extract_url_key(url) AS url_key,
        |  parse_snapshot_date(ts_text) AS snapshot_date
        |FROM src""".stripMargin)
  }

  /** q125 shares q09's oracle by construction — same inputs, same parse. */
  def q125Oracle: String = q09Oracle

  def q09Oracle: String =
    """WITH src AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CASE WHEN l_linenumber % 4 = 0 THEN 'Đã bán ' || CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR)
      |         WHEN l_linenumber % 4 = 1 THEN 'Đã bán ' || CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR) || 'k'
      |         WHEN l_linenumber % 4 = 2 THEN 'Đã bán ' || CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR) || '.5tr'
      |         ELSE 'Đã bán ' || CAST(l_partkey % 900 + 100 AS VARCHAR) || '.000' END AS sales_text,
      |    '-' || CAST(l_suppkey % 100 AS VARCHAR) || '%' AS discount_text,
      |    CASE WHEN l_linenumber % 3 = 0 THEN CAST(l_partkey % 900 + 100 AS VARCHAR) || '.000 VND'
      |         WHEN l_linenumber % 3 = 1 THEN CAST(l_partkey AS VARCHAR) || ' đ'
      |         ELSE '' END AS price_text,
      |    'https://tiki.vn/cat-' || CAST(l_partkey AS VARCHAR) || '/c' || CAST(l_partkey % 5000 AS VARCHAR) || '?page=2' AS url,
      |    strftime(l_shipdate, '%Y-%m-%d') || 'T16:49:55.805Z' AS ts_text
      |  FROM lineitem
      |), parsed AS (
      |  SELECT l_orderkey, l_linenumber,
      |    lower(trim(sales_text)) AS st, trim(discount_text) AS dt, trim(price_text) AS pt, url, ts_text
      |  FROM src
      |)
      |SELECT l_orderkey, l_linenumber,
      |  CASE
      |    WHEN regexp_extract(st, '(\d+(?:[.,]\d+)?)\s*(k|tr|m|trieu|triệu)', 1) <> ''
      |      THEN CAST(trunc(CAST(replace(regexp_extract(st, '(\d+(?:[.,]\d+)?)\s*(k|tr|m|trieu|triệu)', 1), ',', '.') AS DOUBLE)
      |           * (CASE WHEN regexp_extract(st, '(\d+(?:[.,]\d+)?)\s*(k|tr|m|trieu|triệu)', 2) = 'k' THEN 1000.0 ELSE 1000000.0 END)) AS BIGINT)
      |    WHEN regexp_extract(st, '(\d{1,3}(?:\.\d{3})+)', 1) <> ''
      |      THEN CAST(replace(regexp_extract(st, '(\d{1,3}(?:\.\d{3})+)', 1), '.', '') AS BIGINT)
      |    WHEN regexp_extract(st, '(\d+)', 1) <> '' THEN CAST(regexp_extract(st, '(\d+)', 1) AS BIGINT)
      |    ELSE 0 END AS sales_volume_acc,
      |  CASE WHEN regexp_extract(dt, '(\d+)', 1) <> '' THEN CAST(regexp_extract(dt, '(\d+)', 1) AS INTEGER) ELSE 0 END AS discount_rate,
      |  CASE
      |    WHEN regexp_extract(pt, '(?i)^\s*(\d{1,3}(?:\.\d{3})+)(?:\s*(?:đ|VND|₫))?\s*$', 1) <> ''
      |      THEN CAST(replace(regexp_extract(pt, '(?i)^\s*(\d{1,3}(?:\.\d{3})+)(?:\s*(?:đ|VND|₫))?\s*$', 1), '.', '') AS BIGINT)
      |    WHEN regexp_extract(regexp_replace(pt, '[^0-9.]', '', 'g'), '^(\d{1,3}(?:\.\d{3})+)$', 1) <> ''
      |      THEN CAST(replace(regexp_extract(regexp_replace(pt, '[^0-9.]', '', 'g'), '^(\d{1,3}(?:\.\d{3})+)$', 1), '.', '') AS BIGINT)
      |    ELSE CAST(trunc(TRY_CAST(regexp_replace(pt, '[^0-9.]', '', 'g') AS DOUBLE)) AS BIGINT)
      |  END AS current_price,
      |  CASE WHEN regexp_extract(url, '/c(\d+)', 1) <> '' THEN CAST(regexp_extract(url, '/c(\d+)', 1) AS BIGINT) END AS category_id,
      |  CASE WHEN regexp_extract(url, '/([^/]+)/c\d+', 1) <> '' THEN regexp_extract(url, '/([^/]+)/c\d+', 1) END AS url_key,
      |  CASE WHEN regexp_extract(ts_text, '^(\d{4}-\d{2}-\d{2})', 1) <> ''
      |       THEN CAST(regexp_extract(ts_text, '^(\d{4}-\d{2}-\d{2})', 1) AS DATE) END AS snapshot_date
      |FROM parsed""".stripMargin

  /** q10: category-path hierarchy extraction + badge flag
    * (ref transform_tiki.py:476-549, 557, 663-707 dim_categories build).
    */
  def q10CategoryPath(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val p1 = col("c_nationkey").cast("string")
    val p2 = (col("c_custkey") % 100 + 100).cast("string")
    val p3 = (col("c_custkey") % 7 + 7).cast("string")
    val depthSel = col("c_custkey") % 3
    val path = when(depthSel === 0, p1)
      .when(depthSel === 1, concat(p1, lit(" > "), p2))
      .otherwise(concat(p1, lit(" > "), p2, lit(" > "), p3))
    val badges = when(col("c_custkey") % 2 === 0,
      array(lit("tiki_now"), lit("freeship"))).otherwise(array(lit("freeship")))

    val leaf = CleanFns.categoryLeaf(path)
    val root = CleanFns.categoryRoot(path)
    val depth = CleanFns.categoryDepth(path)
    c.select(
      col("c_custkey"),
      leaf.as("category_id"),
      root.as("root_category_id"),
      depth.as("category_depth"),
      least(depth, lit(3)).as("category_level"),
      when(root =!= leaf, concat(root.cast("string"), lit(" > "), leaf.cast("string")))
        .otherwise(leaf.cast("string")).as("full_path"),
      when(depth > 1, root).otherwise(lit(null).cast("bigint")).as("parent_id"),
      CleanFns.hasBadge(badges, "tiki_now").as("tiki_now"))
  }

  def q10Oracle: String =
    """WITH src AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 3 = 0 THEN CAST(c_nationkey AS VARCHAR)
      |         WHEN c_custkey % 3 = 1 THEN CAST(c_nationkey AS VARCHAR) || ' > ' || CAST(c_custkey % 100 + 100 AS VARCHAR)
      |         ELSE CAST(c_nationkey AS VARCHAR) || ' > ' || CAST(c_custkey % 100 + 100 AS VARCHAR) || ' > ' || CAST(c_custkey % 7 + 7 AS VARCHAR)
      |    END AS path,
      |    CASE WHEN c_custkey % 2 = 0 THEN ['tiki_now','freeship'] ELSE ['freeship'] END AS badges
      |  FROM customer
      |), arr AS (
      |  SELECT c_custkey, badges,
      |    list_transform(string_split(path, '>'), x -> CAST(trim(x) AS BIGINT)) AS ids
      |  FROM src
      |)
      |SELECT c_custkey,
      |  ids[-1] AS category_id,
      |  ids[1] AS root_category_id,
      |  CAST(len(ids) AS INTEGER) AS category_depth,
      |  CAST(least(len(ids), 3) AS INTEGER) AS category_level,
      |  CASE WHEN ids[1] <> ids[-1] THEN CAST(ids[1] AS VARCHAR) || ' > ' || CAST(ids[-1] AS VARCHAR)
      |       ELSE CAST(ids[-1] AS VARCHAR) END AS full_path,
      |  CASE WHEN len(ids) > 1 THEN ids[1] END AS parent_id,
      |  list_contains(badges, 'tiki_now') AS tiki_now
      |FROM arr""".stripMargin
}
