package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns
import graft.operators.similarity.VectorFns

/** Round-1 widening: embedding near-dup (SURVEY §2 item 34 as a standalone
  * query) and winnowing fingerprints (item 40's rolling-hash variant).
  */
object ExtraQueries {

  /** q31: embedding-cosine near-duplicate pairs — all pairs above a cosine
    * threshold. Broadcast-nested-loop on the small side at test SF; at
    * corpus scale the same scoring runs on LshAnn candidates instead of the
    * full cross product (see SURVEY §4).
    */
  def q31EmbeddingDedup(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VectorFns.norm(col("embedding")).as("nrm"))
    v.alias("a").join(v.alias("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        VectorFns.cosine(
          VectorFns.dot(col("a.embedding"), col("b.embedding")),
          col("a.nrm"), col("b.nrm")).as("cosine"))
      .filter(col("cosine") >= 0.4)
  }

  def q31Oracle: String = {
    val dot = (1 to SimilarityQueries.Dims)
      .map(i => s"CAST(a.embedding[$i] AS DOUBLE)*CAST(b.embedding[$i] AS DOUBLE)")
      .mkString(" + ")
    val sumsq = (1 to SimilarityQueries.Dims)
      .map(i => s"CAST(embedding[$i] AS DOUBLE)*CAST(embedding[$i] AS DOUBLE)")
      .mkString(" + ")
    s"""WITH v AS (
       |  SELECT vec_id, embedding, sqrt($sumsq) AS nrm FROM embeddings
       |)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ($dot) / (a.nrm * b.nrm) AS cosine
       |FROM v a JOIN v b ON a.vec_id < b.vec_id
       |WHERE ($dot) / (a.nrm * b.nrm) >= 0.4""".stripMargin
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
       |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm FROM documents
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
