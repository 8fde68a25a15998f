package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.multimodal.BinaryPipeline
import graft.operators.similarity.{CosineTopK, LshAnn}

/** Similarity-search and multimodal queries (SURVEY §2 items 34-36, 41). */
object SimilarityQueries {

  val Dims = 64
  val K = 10

  /** q24: brute-force exact cosine top-10 for query vectors vec_id < 10. */
  def q24CosineTopk(spark: SparkSession, dir: String): DataFrame =
    CosineTopK.search(Tables.embeddings(spark, dir), "vec_id", "embedding",
      _ < 10, K)

  def q24Oracle: String = {
    val dot = (1 to Dims)
      .map(i => s"CAST(q.e[$i] AS DOUBLE)*CAST(c.e[$i] AS DOUBLE)")
      .mkString(" + ")
    val sumsq = (1 to Dims)
      .map(i => s"CAST(e[$i] AS DOUBLE)*CAST(e[$i] AS DOUBLE)")
      .mkString(" + ")
    s"""WITH n AS (
       |  SELECT vec_id, embedding AS e, sqrt($sumsq) AS nrm FROM embeddings
       |), scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ($dot) / (q.nrm * c.nrm) AS cosine
       |  FROM n q JOIN n c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10
       |)
       |SELECT query_id, neighbor_id, cosine, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM scored) t
       |WHERE rank <= $K""".stripMargin
  }

  /** q25: random-hyperplane LSH ANN (LshAnn.NumTables tables ×
    * LshAnn.PlanesPerTable planes). Not
    * SQL-expressible at reasonable size → rows-only check from the driver;
    * recall vs q24 is asserted in SimilaritySpec.
    */
  def q25LshAnn(spark: SparkSession, dir: String): DataFrame =
    LshAnn.search(Tables.embeddings(spark, dir), "vec_id", "embedding",
      _ < 10, K, Dims)

  /** q30: multimodal binary-column pipeline with stubbed decode. Null
    * payload/metadata normalize to empty/0 (mirrored in the oracle) — the
    * typed decode path must never die on a null row.
    */
  def q30Multimodal(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        coalesce(col("text"), lit("")).cast("binary").as("blob"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"))
    BinaryPipeline.decodeFeatures(spark, d, "doc_id", "blob", "n_chars")
  }

  /** Text is ASCII in this corpus, so the byte checksum equals the
    * codepoint checksum DuckDB can compute.
    */
  def q30Oracle: String =
    """SELECT doc_id,
      |  CAST(strlen(COALESCE(text, '')) AS INTEGER) AS byte_len,
      |  CAST(COALESCE(n_chars, 0) % 640 + 1 AS INTEGER) AS width,
      |  CAST(COALESCE(n_chars, 0) % 480 + 1 AS INTEGER) AS height,
      |  CAST(CAST(COALESCE(n_chars, 0) % 640 + 1 AS INTEGER) AS DOUBLE) / CAST(COALESCE(n_chars, 0) % 480 + 1 AS INTEGER) AS aspect_ratio,
      |  CAST(COALESCE(list_sum(list_transform(range(least(64, length(COALESCE(text, '')))),
      |    i -> unicode(text[i+1:i+1]))), 0) % 9973 AS BIGINT) AS checksum,
      |  'fake/raw' AS format
      |FROM documents""".stripMargin
}
