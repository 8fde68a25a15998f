package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns
import graft.operators.similarity.CosinePairs

/** Round-1 widening: embedding near-dup (SURVEY §2 item 34 as a standalone
  * query) and winnowing fingerprints (item 40's rolling-hash variant).
  */
object ExtraQueries {

  /** q31: embedding-cosine near-duplicate pairs via [[CosinePairs.banded]]
    * — LSH bucket candidates + exact-cosine verify, never an unblocked
    * O(n²) self-join. The oracle mirrors the banding bit-for-bit (the LCG
    * plane weights are embedded as double literals, the sign sums are
    * in-element-order), so the driver gate checks the banded semantics
    * exactly; recall vs the brute-force all-pairs baseline is measured in
    * CosinePairsSpec (it is data-dependent: the testdata's qualifying pairs
    * sit at the decision boundary — min cosine 0.4000 vs threshold 0.4 —
    * where no banding scheme can be both complete and sub-quadratic).
    */
  val CosineThreshold = 0.4

  def q31EmbeddingDedup(spark: SparkSession, dir: String): DataFrame =
    CosinePairs.banded(Tables.embeddings(spark, dir), "vec_id", "embedding",
      threshold = CosineThreshold, dims = SimilarityQueries.Dims)

  def q31Oracle: String = {
    val dims = SimilarityQueries.Dims
    def pairDot(a: String, b: String) = (1 to dims)
      .map(i => s"CAST($a.embedding[$i] AS DOUBLE)*CAST($b.embedding[$i] AS DOUBLE)")
      .mkString(" + ")
    val sumsq = (1 to dims)
      .map(i => s"CAST(embedding[$i] AS DOUBLE)*CAST(embedding[$i] AS DOUBLE)")
      .mkString(" + ")
    // same LCG weights, same in-element-order sign sums as LshAnn.bucketKey
    val (bucketCols, anyBucket) = SimilarityQueries.lshBucketSql
    s"""WITH v AS (
       |  SELECT vec_id, embedding, sqrt($sumsq) AS nrm,
       |    $bucketCols
       |  FROM embeddings
       |), pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM v a JOIN v b ON a.vec_id < b.vec_id AND ($anyBucket)
       |)
       |SELECT p.vec_a, p.vec_b,
       |  (${pairDot("va", "vb")}) / (va.nrm * vb.nrm) AS cosine
       |FROM pairs p
       |JOIN v va ON p.vec_a = va.vec_id
       |JOIN v vb ON p.vec_b = vb.vec_id
       |WHERE (${pairDot("va", "vb")}) / (va.nrm * vb.nrm) >= $CosineThreshold""".stripMargin
  }

  /** q32: winnowing fingerprints — per document, the distinct set of
    * rolling w-window minima over the (ordered, non-distinct) shingle hash
    * sequence. The standard local-fingerprint selection for plagiarism-style
    * overlap detection; emitted exploded (doc_id, fingerprint) for joining.
    */
  val WinnowWindow = 4

  def q32WinnowFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val d = Tables.documents(spark, dir).repartition(col("doc_id"))
    // ordered (non-distinct) hash sequence — winnowing needs positions
    val hashSeq = ColumnBridge.column(graft.plans.ShingleHash(
      ColumnBridge.expression(col("text")), distinct = false))
    // single consumer — no cache (nothing to reuse, unlike the dedup family)
    val hl = d.select(col("doc_id"), hashSeq.as("hs"))
    val m = size(col("hs"))
    val w = lit(WinnowWindow)
    val minima = when(m >= WinnowWindow,
      array_distinct(transform(sequence(lit(0), m - w),
        i => array_min(slice(col("hs"), i + 1, w)))))
      .otherwise(array(array_min(col("hs"))))
    hl.select(col("doc_id"), explode(minima).as("fingerprint"))
  }

  def q32Oracle: String =
    s"""WITH docs AS (
       |  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm FROM documents
       |), toks AS (
       |  SELECT doc_id, norm, string_split(norm, ' ') AS t FROM docs
       |), sh AS (
       |  SELECT doc_id, CASE WHEN len(t) >= 3
       |    THEN list_transform(range(len(t)-2), i -> array_to_string(t[i+1:i+3], ' '))
       |    ELSE [norm] END AS shingles
       |  FROM toks
       |), hseq AS (
       |  SELECT doc_id, list_transform(shingles,
       |    s -> CAST('0x' || substr(md5(s),1,8) AS BIGINT) % 2147483647) AS hs
       |  FROM sh
       |), minima AS (
       |  SELECT doc_id, CASE WHEN len(hs) >= $WinnowWindow
       |    THEN list_distinct(list_transform(range(len(hs) - $WinnowWindow + 1),
       |      i -> list_min(hs[i+1:i+$WinnowWindow])))
       |    ELSE [list_min(hs)] END AS fps
       |  FROM hseq
       |)
       |SELECT doc_id, unnest(fps) AS fingerprint FROM minima""".stripMargin
}
