package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Column-level cleaning/parsing functions re-expressing the reference's
  * row-wise Python parsers (TikiTransform/scripts/transform_tiki.py) as
  * Catalyst expressions. Everything here composes built-in regexp/string
  * functions, so the whole pipeline stays inside WholeStageCodegen — no
  * Scala UDF boxing, fully pushdown/prune friendly, and identical semantics
  * are expressible in the DuckDB oracle SQL.
  */
object CleanFns {

  private val SuffixPattern = """(\d+(?:[.,]\d+)?)\s*(k|tr|m|trieu|triệu)"""
  private val ThousandSepPattern = """(\d{1,3}(?:\.\d{3})+)"""

  /** Vietnamese sales-volume text → accumulated units
    * (ref transform_tiki.py:191 parse_sales_volume).
    * "Đã bán 1.5k" → 1500, "Đã bán 2tr" → 2000000, "Đã bán 10.000" → 10000,
    * "Đã bán 100" → 100, null/unparseable → 0. Truncates like Python int().
    */
  def parseSalesVolume(value: Column): Column = {
    val text = lower(trim(value))
    val sufNum = regexp_extract(text, SuffixPattern, 1)
    val suffix = regexp_extract(text, SuffixPattern, 2)
    val multiplier = when(suffix === "k", 1000.0d).otherwise(1000000.0d)
    val thousand = regexp_extract(text, ThousandSepPattern, 1)
    val simple = regexp_extract(text, """(\d+)""", 1)
    when(value.isNull, 0L)
      .when(sufNum =!= "",
        (translate(sufNum, ",", ".").cast(DoubleType) * multiplier).cast(LongType))
      .when(thousand =!= "", translate(thousand, ".", "").cast(LongType))
      .when(simple =!= "", simple.cast(LongType))
      .otherwise(0L)
  }

  /** "-41%" → 41 (ref transform_tiki.py:261 parse_discount_rate). */
  def parseDiscountRate(value: Column): Column = {
    val m = regexp_extract(trim(value), """(\d+)""", 1)
    when(value.isNull, 0).when(m =!= "", m.cast(IntegerType)).otherwise(0)
  }

  /** Price text → integer VND (ref transform_tiki.py:308 clean_price).
    * "1.000.000 VND" → 1000000 (VN thousand separators), else strip
    * non-numeric and truncate; unparseable → null.
    */
  def cleanPrice(value: Column): Column = {
    val text = trim(value)
    val anchored =
      regexp_extract(text, """(?i)^\s*(\d{1,3}(?:\.\d{3})+)(?:\s*(?:đ|VND|₫))?\s*$""", 1)
    val stripped = regexp_replace(text, """[^\d.]""", "")
    // a VN-separated price inside prose ("Giá: 1.299.000") survives the
    // strip as "1.299.000" — an invalid double; recognize it before the
    // cast instead of losing the price to null
    val strippedVn = regexp_extract(stripped, """^(\d{1,3}(?:\.\d{3})+)$""", 1)
    when(value.isNull, lit(null).cast(LongType))
      .when(anchored =!= "", translate(anchored, ".", "").cast(LongType))
      .when(strippedVn =!= "", translate(strippedVn, ".", "").cast(LongType))
      .otherwise(stripped.cast(DoubleType).cast(LongType))
  }

  /** Category URL → category id (ref transform_tiki.py:286):
    * ".../dien-thoai/c1789?page=2" → 1789; no match → null.
    */
  def extractCategoryId(url: Column): Column = {
    val m = regexp_extract(url, """/c(\d+)""", 1)
    when(m =!= "", m.cast(LongType)).otherwise(lit(null).cast(LongType))
  }

  /** Category URL → slug (ref transform_tiki.py:663 extract_url_key). */
  def extractUrlKey(url: Column): Column = {
    val m = regexp_extract(url, """/([^/]+)/c\d+""", 1)
    when(m =!= "", m).otherwise(lit(null).cast("string"))
  }

  /** "1815 > 28670 > 12296" → array<long> (ref transform_tiki.py:476
    * parse_category_path). Empty/null path → empty array.
    */
  def categoryPath(path: Column): Column =
    when(path.isNull || trim(path) === "", array().cast("array<long>"))
      .otherwise(transform(split(path, ">"), x => trim(x).cast(LongType)))

  def categoryLeaf(path: Column): Column  = element_at(categoryPath(path), -1)
  def categoryRoot(path: Column): Column  = element_at(categoryPath(path), 1)
  def categoryDepth(path: Column): Column = size(categoryPath(path))

  /** ISO-8601 timestamp text → date (ref transform_tiki.py:350
    * parse_snapshot_date): "2026-01-18T16:49:55.805Z" → 2026-01-18.
    */
  def toSnapshotDate(extractedAt: Column): Column = {
    val d = regexp_extract(extractedAt, """^(\d{4}-\d{2}-\d{2})""", 1)
    when(d =!= "", to_date(d)).otherwise(lit(null).cast("date"))
  }

  /** badges array contains a flag (ref transform_tiki.py:557 has_tiki_now). */
  def hasBadge(badges: Column, badge: String): Column =
    coalesce(array_contains(badges, badge), lit(false))

  /** Price present and positive (ref transform_tiki.py:553). */
  def inventoryStatus(price: Column): Column =
    price.isNotNull && price > 0
}
