package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.similarity.{IvfAnn, KMeansExact}

/** q33: IVF ANN — the partition-prunable similarity-search scale path
  * (SURVEY §2 item 36, complementing LSH q25), now with TRAINED centroids:
  * 3 exact-integer Lloyd iterations ([[KMeansExact]]) refine the first-K
  * seeds before assignment/probing. Fully oracle-checked INCLUDING the
  * training: the DuckDB oracle replays quantization, every assignment,
  * every integer floor-mean update, the dequantized centroid weights, and
  * then the search's argmax-assign/probe/re-rank — bit-for-bit.
  */
object IvfQueries {

  val NCentroids = 8
  val Probes = 2
  val TrainIters = 3

  def q33IvfAnn(spark: SparkSession, dir: String): DataFrame =
    IvfAnn.searchTrained(Tables.embeddings(spark, dir), "vec_id", "embedding",
      _ < 10, k = SimilarityQueries.K, nCentroids = NCentroids,
      probes = Probes, trainIters = TrainIters, dims = SimilarityQueries.Dims)

  def q33Oracle: String = {
    val dims = SimilarityQueries.Dims
    def dot(a: String, b: String) = (1 to dims)
      .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")
    // corpus-vector · trained-centroid dot, element order, centroid side
    // already double (w columns)
    def dotW(a: String, c: String) = (0 until dims)
      .map(i => s"CAST($a[${i + 1}] AS DOUBLE)*$c.w$i")
      .mkString(" + ")
    val sumsq = dot("embedding", "embedding")
    val training = KMeansExact.oracleCtes("km", "embeddings", "vec_id",
      "embedding", NCentroids, TrainIters, dims)
    s"""WITH $training
       |n AS MATERIALIZED (
       |  SELECT vec_id, embedding AS e, sqrt($sumsq) AS nrm FROM embeddings
       |), asgscore AS (
       |  SELECT v.vec_id AS vid, v.e, v.nrm, c.cid,
       |    (${dotW("v.e", "c")}) / (v.nrm * c.cnrm) AS ccos
       |  FROM n v CROSS JOIN kmcw c
       |), asg AS MATERIALIZED (
       |  SELECT vid, e, nrm, cid AS cluster_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid ASC) AS crank
       |    FROM asgscore) t
       |  WHERE crank = 1
       |), queries AS (
       |  SELECT vid AS query_id, e AS qe, nrm AS qnrm FROM asg WHERE vid < 10
       |), probescore AS (
       |  SELECT q.query_id, q.qe, q.qnrm, c.cid,
       |    (${dotW("q.qe", "c")}) / (q.qnrm * c.cnrm) AS ccos
       |  FROM queries q CROSS JOIN kmcw c
       |), probes AS (
       |  SELECT query_id, qe, qnrm, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, cid ASC) AS prank
       |    FROM probescore) t
       |  WHERE prank <= $Probes
       |), cands AS (
       |  SELECT DISTINCT p.query_id, a.vid AS neighbor_id,
       |    (${dot("p.qe", "a.e")}) / (p.qnrm * a.nrm) AS cosine
       |  FROM probes p JOIN asg a ON p.cid = a.cluster_id AND a.vid <> p.query_id
       |)
       |SELECT query_id, neighbor_id, cosine, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM cands) t
       |WHERE rank <= ${SimilarityQueries.K}""".stripMargin
  }

  val SemThreshold = 0.4 // the corpus's near-dup boundary (q31's threshold)

  /** q121: SemDeDup-style SEMANTIC dedup
    * ([[graft.operators.dedup.SemanticDedup]], Abbas et al. 2023) —
    * trained k-means clustering + within-cluster min-id-wins drop of
    * near-identical vectors. The oracle replays the ENTIRE composition:
    * the same [[KMeansExact.oracleCtes]] training replay q33 uses, every
    * cluster assignment, and the per-pair drop rule — kept flags for the
    * whole corpus, checked by an engine that never saw the clustering.
    */
  def q121SemanticDedup(spark: SparkSession, dir: String): DataFrame =
    graft.operators.dedup.SemanticDedup.flaggedAdaptive(
      Tables.embeddings(spark, dir), "vec_id", "embedding",
      threshold = SemThreshold, trainIters = TrainIters,
      dims = SimilarityQueries.Dims)

  def q121Oracle: String = {
    import graft.operators.dedup.SemanticDedup
    import graft.operators.similarity.NswAnn
    val dims = SimilarityQueries.Dims
    def dot(a: String, b: String) = (1 to dims)
      .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")
    def dotW(a: String, c: String) = (0 until dims)
      .map(i => s"CAST($a[${i + 1}] AS DOUBLE)*$c.w$i")
      .mkString(" + ")
    val sumsq = dot("embedding", "embedding")
    // occupancy-adaptive cell ladder + training-sample modulus, replayed
    // as integer CASE ladders exactly like the NSW oracle's
    val cellLadder = {
      val steps = Iterator.iterate(SemanticDedup.BaseCells)(_ << 1)
        .takeWhile(_ < SemanticDedup.MaxCells)
        .map(k => s"WHEN count(*) <= ${k.toLong * SemanticDedup.TargetCell} THEN $k")
        .mkString(" ")
      s"SELECT CASE $steps ELSE ${SemanticDedup.MaxCells} END AS k FROM embeddings"
    }
    val modLadder = {
      val steps = Iterator.iterate(1)(_ << 1)
        .takeWhile(_ < NswAnn.MaxModulus)
        .map(m => s"WHEN count(*) <= ${m.toLong * NswAnn.TrainCap} THEN $m")
        .mkString(" ")
      s"SELECT CASE $steps ELSE ${NswAnn.MaxModulus} END AS m FROM embeddings"
    }
    val training = KMeansExact.oracleCtes("km",
      "(SELECT * FROM embeddings WHERE vec_id % (SELECT m FROM smod) = 0)",
      "vec_id", "embedding", SemanticDedup.MaxCells, TrainIters, dims,
      kSql = "SELECT k FROM nc")
    s"""WITH nc AS ($cellLadder),
       |smod AS ($modLadder),
       |$training
       |n AS MATERIALIZED (
       |  SELECT vec_id, embedding AS e, sqrt($sumsq) AS nrm FROM embeddings
       |), asgscore AS (
       |  SELECT v.vec_id AS vid, v.e, v.nrm, c.cid,
       |    (${dotW("v.e", "c")}) / (v.nrm * c.cnrm) AS ccos
       |  FROM n v CROSS JOIN kmcw c
       |), asg AS MATERIALIZED (
       |  SELECT vid, e, nrm, cid AS cluster_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid ASC) AS crank
       |    FROM asgscore) t
       |  WHERE crank = 1
       |)
       |SELECT a.vid AS vec_id, a.cluster_id,
       |  NOT EXISTS (
       |    SELECT 1 FROM asg b
       |    WHERE b.cluster_id = a.cluster_id AND b.vid < a.vid
       |      AND (${dot("a.e", "b.e")}) / (a.nrm * b.nrm) > $SemThreshold
       |  ) AS kept
       |FROM asg a""".stripMargin
  }
}
