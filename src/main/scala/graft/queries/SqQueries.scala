package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.similarity.SqAnn

/** q139: int8 scalar-quantization ANN ([[SqAnn]]) — the training-free
  * compressed-domain path beside PQ (q102): one signed byte per dimension,
  * per-vector symmetric maxabs scaling, integer-dot quantized-cosine cut,
  * exact float re-rank of the top-`Rerank` survivors. FULLY oracle-checked:
  * the DuckDB oracle replays every quantization (the same pinned
  * multiply/divide/+0.5/floor chain), both integer norms, every quantized
  * cosine (exact ints through one multiply, one sqrt, one division — all
  * correctly rounded, so the doubles match bitwise), the top-`Rerank` cut,
  * and the exact-cosine re-rank. The oracle reads the UNPACKED codes; that
  * the engine's scan unpacks the same codes from the 8-per-long packed
  * frame is pinned by SqAnnSpec's pack/unpack identity test.
  */
object SqQueries {

  val Rerank = 50

  def q139SqAnn(spark: SparkSession, dir: String): DataFrame =
    SqAnn.search(Tables.embeddings(spark, dir), "vec_id", "embedding",
      _ < 10, k = SimilarityQueries.K, rerank = Rerank,
      dims = SimilarityQueries.Dims)

  def q139Oracle: String = {
    val dims = SimilarityQueries.Dims
    def dot(a: String, b: String) = (1 to dims)
      .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")
    val sumsq = dot("embedding", "embedding")
    val maxabs = "GREATEST(" + (1 to dims)
      .map(i => s"ABS(CAST(embedding[$i] AS DOUBLE))").mkString(", ") + ")"
    // code_i replays SqAnn.codesCol's pinned order: multiply, divide,
    // +0.5, floor; the all-zero vector (maxabs = 0) codes to all zeros
    def code(i: Int) =
      s"CASE WHEN maxabs > 0 THEN CAST(FLOOR(CAST(e[$i] AS DOUBLE) * 127.0" +
        s" / maxabs + 0.5) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    val codeList = (1 to dims).map(code).mkString(",\n      ")
    val n2 = (1 to dims).map(i => s"c[$i]*c[$i]").mkString(" + ")
    val qdot = (1 to dims).map(i => s"q.qc[$i]*v.c[$i]").mkString(" + ")
    s"""WITH n AS MATERIALIZED (
       |  SELECT vec_id, embedding AS e, sqrt($sumsq) AS nrm,
       |    $maxabs AS maxabs
       |  FROM embeddings
       |), enc AS MATERIALIZED (
       |  SELECT vec_id, e, nrm,
       |    [$codeList] AS c
       |  FROM n
       |), encn AS MATERIALIZED (
       |  SELECT vec_id, e, nrm, c, ($n2) AS n2 FROM enc
       |), q AS MATERIALIZED (
       |  SELECT vec_id AS query_id, e AS qe, nrm AS qnrm, c AS qc, n2 AS qn2
       |  FROM encn WHERE vec_id < 10
       |), scored AS MATERIALIZED (
       |  SELECT q.query_id, v.vec_id AS vid,
       |    CAST(($qdot) AS DOUBLE)
       |      / sqrt(CAST(v.n2 AS DOUBLE) * CAST(q.qn2 AS DOUBLE)) AS qcos
       |  FROM encn v JOIN q ON v.vec_id <> q.query_id AND q.qn2 > 0
       |  WHERE v.n2 > 0
       |), cand AS MATERIALIZED (
       |  SELECT query_id, vid FROM (
       |    SELECT query_id, vid,
       |      row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, vid ASC) AS rnk
       |    FROM scored) t WHERE rnk <= $Rerank
       |)
       |SELECT query_id, neighbor_id, cosine, rank FROM (
       |  SELECT c.query_id, v.vec_id AS neighbor_id,
       |    (${dot("qr.qe", "v.e")}) / (qr.qnrm * v.nrm) AS cosine,
       |    CAST(row_number() OVER (PARTITION BY c.query_id
       |      ORDER BY (${dot("qr.qe", "v.e")}) / (qr.qnrm * v.nrm) DESC, v.vec_id ASC) AS INTEGER) AS rank
       |  FROM cand c
       |  JOIN encn v ON v.vec_id = c.vid
       |  JOIN q qr ON qr.query_id = c.query_id
       |) t WHERE rank <= ${SimilarityQueries.K}""".stripMargin
  }

  /** q143's output width: 64 → 16 dims; 1/√16 = 0.25 is an exact binary
    * scale, so the one post-dot multiply is replayable without a
    * round-tripped literal.
    */
  val JlOutDims = 16

  /** q143: Johnson–Lindenstrauss random projection
    * ([[graft.operators.similarity.RandomProjection]]) — the
    * dimensionality-reduction projection before the ANN/dedup ladders.
    * The oracle regenerates the full 16×64 LCG weight matrix as double
    * literals (Java shortest-repr round-trips through DuckDB's parser —
    * the q25 plane discipline) and replays every coordinate's
    * in-element-order dot product and the scale multiply bitwise.
    */
  def q143RandomProjection(spark: SparkSession, dir: String): DataFrame = {
    // the gate flattens the library's array column to scalar p<j> columns
    // (the driver compare cannot hash list cells); Catalyst folds
    // element_at(array(...), j) back to the bare coordinate expression
    val projected = graft.operators.similarity.RandomProjection.project(
      Tables.embeddings(spark, dir), "vec_id", "embedding",
      SimilarityQueries.Dims, JlOutDims)
    projected.select(col("vid") +:
      (0 until JlOutDims).map(j =>
        element_at(col("proj"), j + 1).as(s"p$j")): _*)
  }

  /** Render a double as a DuckDB DOUBLE literal: a bare decimal literal
    * parses as DECIMAL(38,s) and its per-term products round differently
    * (the q143 gate caught real ulp drift); an exponent suffix forces the
    * correctly-rounded double parse path. The existing LSH-plane oracles
    * get away with bare literals only because they feed a sign test.
    */
  private def dlit(v: Double): String = {
    val r = v.toString
    if (r.contains('E') || r.contains('e')) r else r + "e0"
  }

  /** Coordinate j of the JL projection as SQL over an `embedding` column
    * — the forced-double weight literals and pinned order shared by the
    * q143 readout and q144's projected-search replay.
    */
  private def jlCoordSql(j: Int): String = {
    val dims = SimilarityQueries.Dims
    val scale = 1.0d / math.sqrt(JlOutDims.toDouble)
    "(" + (1 to dims)
      .map(i => s"CAST(embedding[$i] AS DOUBLE)*" +
        dlit(graft.operators.similarity.RandomProjection.weight(j, i - 1)))
      .mkString(" + ") + s") * ${dlit(scale)}"
  }

  def q143Oracle: String = {
    val elems = (0 until JlOutDims)
      .map(j => s"${jlCoordSql(j)} AS p$j").mkString(",\n  ")
    s"""SELECT CAST(vec_id AS BIGINT) AS vid,
       |  $elems
       |FROM embeddings""".stripMargin
  }

  /** q144: the COMPOSED reduced-space search — q143's projection feeding
    * q24's brute-force cosine top-k in 16 dims instead of 64 (the shape a
    * wide-embedding corpus actually searches at scale: project once, run
    * every downstream dot at a quarter the width). Stage gates pass while
    * a composition drifts — this gate replays projection AND search
    * end-to-end from raw embeddings: every coordinate, every reduced-space
    * dot/norm/cosine (all in pinned element order over the
    * bitwise-replayed projected doubles), and the ranked cut.
    */
  def q144ProjectedTopk(spark: SparkSession, dir: String): DataFrame = {
    val proj = graft.operators.similarity.RandomProjection.project(
      Tables.embeddings(spark, dir), "vec_id", "embedding",
      SimilarityQueries.Dims, JlOutDims)
    graft.operators.similarity.CosineTopK.search(proj, "vid", "proj",
      _ < 10, SimilarityQueries.K)
  }

  /** q147: the PRODUCTION reduced-space ladder — q143's projection feeding
    * the TRAINED IVF index (q33's operator) at 16 dims instead of the
    * brute scan q144 composes: project once, then train/assign/probe/
    * re-rank entirely in the reduced space. This is the shape a wide-
    * embedding corpus actually ships at 100 TB (the projection is pure
    * codegen with zero shuffles; every downstream centroid scan, cell
    * shuffle and re-rank dot runs at a quarter the width). The oracle
    * replays the WHOLE chain from raw embeddings: all 16 projected
    * coordinates bitwise (q143's forced-double literals), the k-means
    * training on the projected doubles, every assignment, the probe cut,
    * and the reduced-space re-rank. Recall vs the unprojected ladder is
    * spec territory (ProjectedIvfSpec, on a CLUSTERED corpus — the i.i.d.
    * gate corpus destroys rank order under any reduction by distance
    * concentration, measured and documented at q144).
    */
  def q147ProjectedIvf(spark: SparkSession, dir: String): DataFrame = {
    val proj = graft.operators.similarity.RandomProjection.project(
      Tables.embeddings(spark, dir), "vec_id", "embedding",
      SimilarityQueries.Dims, JlOutDims)
    graft.operators.similarity.IvfAnn.searchTrained(proj, "vid", "proj",
      _ < 10, k = SimilarityQueries.K, nCentroids = IvfQueries.NCentroids,
      probes = IvfQueries.Probes, trainIters = IvfQueries.TrainIters,
      dims = JlOutDims)
  }

  def q147Oracle: String = {
    val dims = JlOutDims
    def dot(a: String, b: String) = (1 to dims)
      .map(i => s"$a.p[$i]*$b.p[$i]").mkString(" + ")
    def dotW(a: String, c: String) = (0 until dims)
      .map(i => s"$a.p[${i + 1}]*$c.w$i").mkString(" + ")
    val psumsq = (1 to dims).map(i => s"p[$i]*p[$i]").mkString(" + ")
    val elems = (0 until JlOutDims).map(jlCoordSql).mkString(",\n    ")
    val training = graft.operators.similarity.KMeansExact.oracleCtes(
      "pk", "pr", "vid", "p", IvfQueries.NCentroids, IvfQueries.TrainIters,
      dims)
    s"""WITH pr AS MATERIALIZED (
       |  SELECT CAST(vec_id AS BIGINT) AS vid,
       |    [$elems] AS p
       |  FROM embeddings
       |),
       |$training
       |n AS MATERIALIZED (
       |  SELECT vid, p, sqrt($psumsq) AS nrm FROM pr
       |), asgscore AS (
       |  SELECT v.vid, v.p, v.nrm, c.cid,
       |    (${dotW("v", "c")}) / (v.nrm * c.cnrm) AS ccos
       |  FROM n v CROSS JOIN pkcw c
       |), asg AS MATERIALIZED (
       |  SELECT vid, p, nrm, cid AS cluster_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid ASC) AS crank
       |    FROM asgscore) t
       |  WHERE crank = 1
       |), queries AS (
       |  SELECT vid AS query_id, p, nrm FROM asg WHERE vid < 10
       |), probescore AS (
       |  SELECT q.query_id, q.p, q.nrm, c.cid,
       |    (${dotW("q", "c")}) / (q.nrm * c.cnrm) AS ccos
       |  FROM queries q CROSS JOIN pkcw c
       |), probes AS (
       |  SELECT query_id, p, nrm, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, cid ASC) AS prank
       |    FROM probescore) t
       |  WHERE prank <= ${IvfQueries.Probes}
       |), cands AS (
       |  SELECT DISTINCT p.query_id, a.vid AS neighbor_id,
       |    (${dot("p", "a")}) / (p.nrm * a.nrm) AS cosine
       |  FROM probes p JOIN asg a ON p.cid = a.cluster_id AND a.vid <> p.query_id
       |)
       |SELECT query_id, neighbor_id, cosine, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM cands) t
       |WHERE rank <= ${SimilarityQueries.K}""".stripMargin
  }

  def q144Oracle: String = {
    val elems = (0 until JlOutDims).map(jlCoordSql).mkString(",\n    ")
    def pdot(a: String, b: String) = (1 to JlOutDims)
      .map(i => s"$a.p[$i]*$b.p[$i]").mkString(" + ")
    val psumsq = (1 to JlOutDims).map(i => s"p[$i]*p[$i]").mkString(" + ")
    s"""WITH pr AS MATERIALIZED (
       |  SELECT CAST(vec_id AS BIGINT) AS vid,
       |    [$elems] AS p
       |  FROM embeddings
       |), n AS MATERIALIZED (
       |  SELECT vid, p, sqrt($psumsq) AS nrm FROM pr
       |), scored AS (
       |  SELECT q.vid AS query_id, c.vid AS neighbor_id,
       |    (${pdot("q", "c")}) / (q.nrm * c.nrm) AS cosine
       |  FROM n q JOIN n c ON c.vid <> q.vid
       |  WHERE q.vid < 10
       |)
       |SELECT query_id, neighbor_id, cosine, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM scored) t
       |WHERE rank <= ${SimilarityQueries.K}""".stripMargin
  }
}
