package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.similarity.{KMeansExact, PqAnn}

/** q102: product-quantization ANN ([[PqAnn]]) — the compressed-domain
  * fourth ANN path (LSH q25 / IVF q33 / NSW q100), with TRAINED codewords:
  * per subspace, [[KMeansExact]] refines the first-16 seeds with exact
  * Lloyd iterations over the quantized sub-vectors. FULLY oracle-checked
  * INCLUDING training: the DuckDB oracle replays all 8 subspace training
  * chains (quantize, every assignment, every integer floor-mean update),
  * dequantizes the codewords, then rebuilds every per-subspace codeword
  * assignment, the packed codes, every ADC score (all distance sums
  * written as explicit dim-ordered terms so the doubles match bitwise),
  * the top-`Rerank` compressed cut, and the exact-cosine re-rank.
  */
object PqQueries {

  val Rerank = 50
  val TrainIters = 3

  def q102PqAnn(spark: SparkSession, dir: String): DataFrame =
    PqAnn.searchTrained(Tables.embeddings(spark, dir), "vec_id", "embedding",
      _ < 10, k = SimilarityQueries.K, rerank = Rerank,
      trainIters = TrainIters, dims = SimilarityQueries.Dims)

  def q102Oracle: String = {
    val subs = PqAnn.Subs
    val kCb = PqAnn.K
    val dims = SimilarityQueries.Dims
    val subDim = dims / subs
    def dot(a: String, b: String) = (1 to dims)
      .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")
    val sumsq = dot("embedding", "embedding")
    // one exact-integer training chain per subspace, offset into the full
    // vector — identical to PqAnn's quantize-once-then-slice
    val training = (0 until subs).map { s =>
      KMeansExact.oracleCtes(s"km$s", "embeddings", "vec_id", "embedding",
        kCb, TrainIters, subDim, offset = s * subDim)
    }.mkString
    // explicit dim-ordered squared distance between a full-vector slice
    // (subspace as expression sExpr) and a trained codeword's w columns
    def subDistW(a: String, cb: String, sExpr: String) = (1 to subDim).map { d =>
      val ix = s"$sExpr*$subDim+$d"
      s"(CAST($a[$ix] AS DOUBLE) - $cb.w${d - 1}) * " +
        s"(CAST($a[$ix] AS DOUBLE) - $cb.w${d - 1})"
    }.mkString(" + ")
    val cbnUnion = (0 until subs).map { s =>
      val ws = (0 until subDim).map(d => s"w$d").mkString(", ")
      s"SELECT $s AS s, cid AS c, $ws FROM km${s}cw"
    }.mkString("\n  UNION ALL ")
    val codeCols = (0 until subs)
      .map(s => s"MAX(CASE WHEN s = $s THEN c END) AS c$s").mkString(",\n    ")
    val cbJoins = (0 until subs)
      .map(s => s"JOIN km${s}cw cb$s ON cb$s.cid = t.c$s").mkString("\n  ")
    // ADC: left-associated chain in subspace order, each term dim-ordered —
    // the exact accumulation PqAnn's driver-built lookup table performs
    val adcExpr = (0 until subs)
      .map(s => s"(${subDistW("q.qe", s"cb$s", s.toString)})")
      .mkString(" + ")
    s"""WITH $training
       |n AS MATERIALIZED (
       |  SELECT vec_id, embedding AS e, sqrt($sumsq) AS nrm FROM embeddings
       |), cbn AS MATERIALIZED (
       |  $cbnUnion
       |), dist AS MATERIALIZED (
       |  SELECT v.vec_id AS vid, cb.s, cb.c,
       |    (${subDistW("v.e", "cb", "cb.s")}) AS dist
       |  FROM n v CROSS JOIN cbn cb
       |), assign AS MATERIALIZED (
       |  SELECT vid, s, c FROM (
       |    SELECT vid, s, c,
       |      row_number() OVER (PARTITION BY vid, s ORDER BY dist ASC, c ASC) AS rnk
       |    FROM dist) t WHERE rnk = 1
       |), codes AS MATERIALIZED (
       |  SELECT vid,
       |    $codeCols
       |  FROM assign GROUP BY vid
       |), queries AS MATERIALIZED (
       |  SELECT vec_id AS query_id, e AS qe, nrm AS qnrm FROM n
       |  WHERE vec_id < 10
       |), adc AS MATERIALIZED (
       |  SELECT q.query_id, t.vid, ($adcExpr) AS adc
       |  FROM queries q
       |  JOIN codes t ON t.vid <> q.query_id
       |  $cbJoins
       |), cand AS MATERIALIZED (
       |  SELECT query_id, vid FROM (
       |    SELECT query_id, vid,
       |      row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, vid ASC) AS rnk
       |    FROM adc) t WHERE rnk <= $Rerank
       |)
       |SELECT query_id, neighbor_id, cosine, rank FROM (
       |  SELECT c.query_id, v.vec_id AS neighbor_id,
       |    (${dot("q.qe", "v.e")}) / (q.qnrm * v.nrm) AS cosine,
       |    CAST(row_number() OVER (PARTITION BY c.query_id
       |      ORDER BY (${dot("q.qe", "v.e")}) / (q.qnrm * v.nrm) DESC, v.vec_id ASC) AS INTEGER) AS rank
       |  FROM cand c
       |  JOIN n v ON v.vec_id = c.vid
       |  JOIN queries q ON q.query_id = c.query_id
       |) t WHERE rank <= ${SimilarityQueries.K}""".stripMargin
  }
}
