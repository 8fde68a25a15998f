package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.similarity.{KMeansExact, NswAnn}

/** q100: graph ANN ([[NswAnn]]) — beam search over the deterministic
  * NSW-style neighbor graph, the third ANN path beside LSH (q25) and IVF
  * (q33) for corpora where both stay candidate-volume-bound, with TRAINED
  * hubs: exact-integer k-means over a deterministic vid-modulus sample,
  * per-cluster medoids as the hub set. FULLY oracle-checked like its
  * siblings AND including training: sample ladder, every Lloyd iteration,
  * the medoid pick, hub ranking, cell assignment, the per-cell top-M
  * short edges, the hub shortcuts, and every one of the `Rounds` beam
  * expansions are replayed in DuckDB with the identical in-order dot
  * folds and (cosine DESC, id ASC) tiebreaks, so the entire WALK — not
  * just the final ranking — is checked bit-for-bit.
  */
object NswQueries {

  val TrainIters = 2

  def q100NswAnn(spark: SparkSession, dir: String): DataFrame =
    NswAnn.searchTrained(Tables.embeddings(spark, dir), "vec_id", "embedding",
      _ < 10, k = SimilarityQueries.K, trainIters = TrainIters,
      dims = SimilarityQueries.Dims)

  def q100Oracle: String = {
    val M = NswAnn.M
    val L = NswAnn.HubLinks
    val B = NswAnn.Beam
    // hub-count ladder replaying NswAnn.adaptiveHubs bit-for-bit: integer
    // comparisons only, so every engine picks the identical count
    val hubLadder = {
      val steps = Iterator.iterate(NswAnn.BaseHubs)(_ << 1)
        .takeWhile(_ < NswAnn.MaxHubs)
        .map(h => s"WHEN count(*) <= ${h.toLong * NswAnn.TargetCell} THEN $h")
        .mkString(" ")
      s"SELECT CASE $steps ELSE ${NswAnn.MaxHubs} END AS h FROM embeddings"
    }
    // sample-modulus ladder replaying NswAnn.trainModulus the same way
    val modLadder = {
      val steps = Iterator.iterate(1)(_ << 1)
        .takeWhile(_ < NswAnn.MaxModulus)
        .map(m => s"WHEN count(*) <= ${m.toLong * NswAnn.TrainCap} THEN $m")
        .mkString(" ")
      s"SELECT CASE $steps ELSE ${NswAnn.MaxModulus} END AS m FROM embeddings"
    }
    val training = KMeansExact.oracleCtes("km",
      s"(SELECT * FROM embeddings WHERE vec_id % (SELECT m FROM smod) = 0)",
      "vec_id", "embedding", NswAnn.MaxHubs, TrainIters,
      SimilarityQueries.Dims, kSql = "SELECT h FROM nh", withMedoids = true)
    def dot(a: String, b: String) = (1 to SimilarityQueries.Dims)
      .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")
    val sumsq = dot("embedding", "embedding")

    // one beam-expansion round: neighbors of the beam via the edge list,
    // exact cosine, union the carried beam, DISTINCT (recomputed cosines
    // are bitwise-identical to carried ones), keep top-B per query
    def expand(prev: String, name: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT query_id, node, cosine FROM (
         |    SELECT query_id, node, cosine,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, node ASC) AS rnk
         |    FROM (
         |      SELECT DISTINCT query_id, node, cosine FROM (
         |        SELECT b.query_id, e.dst AS node,
         |          (${dot("q.qe", "c.e")}) / (q.qnrm * c.nrm) AS cosine
         |        FROM $prev b
         |        JOIN edges e ON e.src = b.node
         |        JOIN n c ON c.vec_id = e.dst
         |        JOIN queries q ON q.query_id = b.query_id
         |        UNION ALL
         |        SELECT query_id, node, cosine FROM $prev
         |      ) u
         |    ) d
         |  ) r WHERE rnk <= $B
         |)""".stripMargin
    val rounds = (1 to NswAnn.Rounds)
      .map(i => expand(if (i == 1) "beam0" else s"beam${i - 1}", s"beam$i"))
      .mkString(",\n")

    s"""WITH n AS MATERIALIZED (
       |  SELECT vec_id, embedding AS e, sqrt($sumsq) AS nrm FROM embeddings
       |), nh AS MATERIALIZED ($hubLadder
       |), smod AS MATERIALIZED ($modLadder
       |), $training hubrank AS MATERIALIZED (
       |  SELECT c.vec_id AS node, h.vec_id AS hub,
       |    row_number() OVER (PARTITION BY c.vec_id
       |      ORDER BY (${dot("c.e", "h.e")}) / (c.nrm * h.nrm) DESC, h.vec_id ASC) AS rnk
       |  FROM n c JOIN n h ON h.vec_id IN (SELECT vid FROM kmmed)
       |), cells AS (
       |  SELECT node, hub AS cell FROM hubrank WHERE rnk = 1
       |), short_edges AS (
       |  SELECT src, dst FROM (
       |    SELECT a.node AS src, b.node AS dst,
       |      row_number() OVER (PARTITION BY a.node
       |        ORDER BY (${dot("av.e", "bv.e")}) / (av.nrm * bv.nrm) DESC, b.node ASC) AS rnk
       |    FROM cells a JOIN cells b ON a.cell = b.cell AND a.node <> b.node
       |    JOIN n av ON av.vec_id = a.node
       |    JOIN n bv ON bv.vec_id = b.node
       |  ) t WHERE rnk <= $M
       |), long_edges AS (
       |  SELECT node AS src, hub AS dst FROM hubrank
       |  WHERE rnk <= $L AND node <> hub
       |), edges AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM short_edges
       |    UNION ALL SELECT src, dst FROM long_edges) u
       |), queries AS MATERIALIZED (
       |  SELECT vec_id AS query_id, e AS qe, nrm AS qnrm FROM n
       |  WHERE vec_id < 10
       |), beam0 AS MATERIALIZED (
       |  SELECT query_id, node, cosine FROM (
       |    SELECT q.query_id, h.vec_id AS node,
       |      (${dot("q.qe", "h.e")}) / (q.qnrm * h.nrm) AS cosine,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY (${dot("q.qe", "h.e")}) / (q.qnrm * h.nrm) DESC, h.vec_id ASC) AS rnk
       |    FROM queries q JOIN n h ON h.vec_id IN (SELECT vid FROM kmmed)
       |  ) t WHERE rnk <= $B
       |),
       |$rounds
       |SELECT query_id, node AS neighbor_id, cosine, rank FROM (
       |  SELECT query_id, node, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, node ASC) AS INTEGER) AS rank
       |  FROM beam${NswAnn.Rounds}
       |  WHERE node <> query_id) t
       |WHERE rank <= ${SimilarityQueries.K}""".stripMargin
  }
}
