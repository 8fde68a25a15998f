package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Text-analysis queries over the documents table (SURVEY §2 items 37-40). */
object TextQueries {

  /** q26: marker-word language ID with deterministic argmax. */
  def q26LangId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val markerCols = TextFns.LangMarkers.map { case (l, p) =>
      when(col("text").isNull, 0)
        .otherwise(size(regexp_extract_all(lower(col("text")), lit(p), lit(0))))
        .as(s"c_$l")
    }
    d.select(Seq(col("doc_id"), col("lang").as("source_lang"),
      TextFns.languageId(col("text")).as("predicted_lang")) ++ markerCols: _*)
  }

  def q26Oracle: String =
    """WITH m AS (
      |  SELECT doc_id, lang AS source_lang,
      |    CAST(len(regexp_extract_all(lower(COALESCE(text, '')), '\b(the|and|of|to|a|in)\b')) AS INTEGER) AS c_en,
      |    CAST(len(regexp_extract_all(lower(COALESCE(text, '')), '\b(der|die|und|das|nicht)\b')) AS INTEGER) AS c_de,
      |    CAST(len(regexp_extract_all(lower(COALESCE(text, '')), '\b(el|la|los|que|es)\b')) AS INTEGER) AS c_es,
      |    CAST(len(regexp_extract_all(lower(COALESCE(text, '')), '\b(le|les|des|est|une)\b')) AS INTEGER) AS c_fr,
      |    CAST(len(regexp_extract_all(lower(COALESCE(text, '')), '[一-鿿]')) AS INTEGER) AS c_zh
      |  FROM documents
      |)
      |SELECT doc_id, source_lang,
      |  CASE WHEN greatest(c_en, c_de, c_es, c_fr, c_zh) <= 0 THEN 'unknown'
      |       WHEN c_en = greatest(c_en, c_de, c_es, c_fr, c_zh) THEN 'en'
      |       WHEN c_de = greatest(c_en, c_de, c_es, c_fr, c_zh) THEN 'de'
      |       WHEN c_es = greatest(c_en, c_de, c_es, c_fr, c_zh) THEN 'es'
      |       WHEN c_fr = greatest(c_en, c_de, c_es, c_fr, c_zh) THEN 'fr'
      |       WHEN c_zh = greatest(c_en, c_de, c_es, c_fr, c_zh) THEN 'zh'
      |       ELSE 'unknown' END AS predicted_lang,
      |  c_en, c_de, c_es, c_fr, c_zh
      |FROM m""".stripMargin

  /** q27: heuristic quality scoring (length/punct/stopword ratios). */
  def q27QualityScore(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"),
      TextFns.tokenCountWs(col("text")).as("n_tokens"),
      TextFns.alphaRatio(col("text")).as("alpha_ratio"),
      TextFns.stopwordRatio(col("text")).as("stopword_ratio"),
      TextFns.qualityScore(col("text")).as("quality_score"))
  }

  def q27Oracle: String =
    """WITH base AS (
      |  SELECT doc_id, text,
      |    CASE WHEN text IS NULL OR trim(text) = '' THEN 0
      |         ELSE CAST(len(regexp_extract_all(trim(text), '\S+')) AS INTEGER) END AS n_tokens,
      |    CASE WHEN text IS NULL OR length(text) = 0 THEN 0.0
      |         ELSE CAST(len(regexp_extract_all(lower(text), '[a-z]')) AS DOUBLE) / length(text) END AS alpha_ratio,
      |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS INTEGER) AS n_stops
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, n_tokens, alpha_ratio,
      |    CASE WHEN n_tokens = 0 THEN 0.0 ELSE LEAST(1.0, CAST(n_stops AS DOUBLE) / n_tokens) END AS stopword_ratio
      |  FROM base
      |)
      |SELECT doc_id, n_tokens, alpha_ratio, stopword_ratio,
      |  0.4 * alpha_ratio + 0.3 * stopword_ratio + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) AS quality_score
      |FROM r""".stripMargin

  /** q28: token counting — whitespace and BPE-ish regex. */
  def q28TokenCount(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"), col("n_chars"),
      TextFns.tokenCountWs(col("text")).as("ws_tokens"),
      TextFns.tokenCountBpe(col("text")).as("bpe_tokens"),
      length(col("text")).as("measured_chars"))
  }

  def q28Oracle: String =
    """SELECT doc_id, n_chars,
      |  CASE WHEN text IS NULL OR trim(text) = '' THEN 0
      |       ELSE CAST(len(regexp_extract_all(trim(text), '\S+')) AS INTEGER) END AS ws_tokens,
      |  CAST(len(regexp_extract_all(COALESCE(text, ''), '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INTEGER) AS bpe_tokens,
      |  CAST(length(text) AS INTEGER) AS measured_chars
      |FROM documents""".stripMargin

  /** q29: document fingerprinting — md5 of normalized text + duplicate
    * group size per fingerprint (the exact-dedup key).
    */
  def q29Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val fp = d.select(col("doc_id"),
      TextFns.fingerprint(col("text")).as("fingerprint"),
      length(TextFns.normalizeText(col("text"))).as("n_norm_chars"))
    fp.withColumn("dup_group_size",
      count(lit(1)).over(Window.partitionBy(col("fingerprint"))))
  }

  def q29Oracle: String =
    """WITH fp AS (
      |  SELECT doc_id,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
      |    CAST(length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS INTEGER) AS n_norm_chars
      |  FROM documents
      |)
      |SELECT doc_id, fingerprint, n_norm_chars,
      |  COUNT(*) OVER (PARTITION BY fingerprint) AS dup_group_size
      |FROM fp""".stripMargin
}
