package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.similarity.IvfAnn

/** q33: IVF ANN — the partition-prunable similarity-search scale path
  * (SURVEY §2 item 36, complementing LSH q25). Fully oracle-checked: the
  * deterministic centroid choice + in-order dot folds make every stage
  * reproducible in DuckDB.
  */
object IvfQueries {

  val NCentroids = 8
  val Probes = 2

  def q33IvfAnn(spark: SparkSession, dir: String): DataFrame =
    IvfAnn.search(Tables.embeddings(spark, dir), "vec_id", "embedding",
      _ < 10, k = SimilarityQueries.K, nCentroids = NCentroids, probes = Probes)

  def q33Oracle: String = {
    def dot(a: String, b: String) = (1 to SimilarityQueries.Dims)
      .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")
    val sumsq = dot("embedding", "embedding")
    s"""WITH n AS (
       |  SELECT vec_id, embedding AS e, sqrt($sumsq) AS nrm FROM embeddings
       |), cents AS (
       |  SELECT vec_id AS cid, e AS cvec, nrm AS cnrm FROM n WHERE vec_id < $NCentroids
       |), asgscore AS (
       |  SELECT v.vec_id AS vid, v.e, v.nrm, cents.cid,
       |    (${dot("v.e", "cents.cvec")}) / (v.nrm * cents.cnrm) AS ccos
       |  FROM n v CROSS JOIN cents
       |), asg AS (
       |  SELECT vid, e, nrm, cid AS cluster_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid ASC) AS crank
       |    FROM asgscore) t
       |  WHERE crank = 1
       |), queries AS (
       |  SELECT vid AS query_id, e AS qe, nrm AS qnrm FROM asg WHERE vid < 10
       |), probescore AS (
       |  SELECT q.query_id, q.qe, q.qnrm, cents.cid,
       |    (${dot("q.qe", "cents.cvec")}) / (q.qnrm * cents.cnrm) AS ccos
       |  FROM queries q CROSS JOIN cents
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
}
