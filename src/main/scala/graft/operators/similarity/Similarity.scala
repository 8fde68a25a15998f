package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (SURVEY §2 items
  * 34-36).
  *
  * Float discipline: dot products and norms are LEFT FOLDS in element order
  * (aggregate over zip_with), so any engine that sums the same terms in the
  * same order — e.g. the DuckDB oracle's explicit left-associated 64-term
  * sum — reproduces the doubles bitwise.
  */
object VectorFns {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Σ aᵢ·bᵢ via the codegen'd [[graft.plans.DotProduct]] expression —
    * same in-element-order accumulation as [[dotFold]], compiled to a
    * primitive loop instead of an interpreted lambda per element.
    */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(graft.plans.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Reference higher-order-function fold (kept for cross-checking the
    * native expression; bitwise-equal results).
    */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  /** ‖a‖₂ = sqrt(a·a) — same accumulation order as the fold. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a,b) given precomputed norms — one fixed-shape expression. */
  def cosine(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)
}

/** Brute-force exact cosine top-k: the correctness baseline. O(|Q|·N·D) —
  * with a broadcast query set this is a single map-side pass over the
  * corpus + one shuffle for the per-query top-k window; use [[LshAnn]] as
  * the sublinear path at corpus scale.
  */
object CosineTopK {
  def search(vectors: DataFrame, idCol: String, vecCol: String,
             queryPred: Column => Column, k: Int): DataFrame = {
    val withNorm = vectors.select(col(idCol).as("vid"), col(vecCol).as("vec"),
      VectorFns.norm(col(vecCol)).as("nrm"))
    val queries = withNorm.filter(queryPred(col("vid")))
      .select(col("vid").as("query_id"), col("vec").as("qvec"), col("nrm").as("qnrm"))
    val scored = withNorm.join(broadcast(queries), col("vid") =!= col("query_id"))
      .select(col("query_id"), col("vid").as("neighbor_id"),
        VectorFns.cosine(VectorFns.dot(col("qvec"), col("vec")),
          col("qnrm"), col("nrm")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}

/** Random-hyperplane LSH ANN — the 100 TB path: each vector lands in
  * `NumTables` sign-pattern buckets (one per table); candidate generation
  * joins on bucket keys (O(N) index build, sublinear probe) and only
  * candidates pay the exact cosine. Plane weights come from a fixed LCG so
  * signatures are reproducible anywhere.
  */
object LshAnn {
  // 8 coarser tables (2^6 buckets each) trade index size for recall — on
  // near-uniform cosine data fine buckets collapse recall; multi-table
  // union recovers it while candidate volume stays ~10% of the corpus.
  val NumTables = 8
  val PlanesPerTable = 6

  /** Deterministic pseudo-random plane weight in [-0.5, 0.5). */
  private def weight(table: Int, plane: Int, dim: Int): Double = {
    val seed = table.toLong * 1000003L + plane.toLong * 64L + dim
    val x = (1103515245L * seed + 12345L) % 2147483648L
    x.toDouble / 2147483648.0d - 0.5d
  }

  private def planeCol(vec: Column, table: Int, plane: Int, dims: Int): Column = {
    val w = array((0 until dims).map(d => lit(weight(table, plane, d))): _*)
    (VectorFns.dot(vec, w) > 0).cast("int")
  }

  /** Bucket key per table: packed sign bits of the `PlanesPerTable`
    * hyperplane projections.
    */
  def bucketKey(vec: Column, table: Int, dims: Int): Column =
    (0 until PlanesPerTable).map(p => planeCol(vec, table, p, dims) * (1 << p))
      .reduce(_ + _)

  /** Approximate top-k: candidates = same bucket in ANY table, then exact
    * cosine rank among candidates only.
    */
  def search(vectors: DataFrame, idCol: String, vecCol: String,
             queryPred: Column => Column, k: Int, dims: Int): DataFrame = {
    val keyed = vectors.select(
      col(idCol).as("vid") +: col(vecCol).as("vec") +:
        VectorFns.norm(col(vecCol)).as("nrm") +:
        (0 until NumTables).map(t => bucketKey(col(vecCol), t, dims).as(s"bk_$t")): _*)
    val buckets = keyed.select(col("vid"), col("vec"), col("nrm"),
      explode(array((0 until NumTables).map(t =>
        struct(lit(t).as("t"), col(s"bk_$t").as("k"))): _*)).as("bucket"))
    val queries = buckets.filter(queryPred(col("vid")))
      .select(col("vid").as("query_id"), col("vec").as("qvec"),
        col("nrm").as("qnrm"), col("bucket").as("qbucket"))
    val cands = buckets.join(queries,
        col("bucket") === col("qbucket") && col("vid") =!= col("query_id"))
      .select(col("query_id"), col("vid").as("neighbor_id"),
        col("qvec"), col("vec"), col("qnrm"), col("nrm"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cands.select(col("query_id"), col("neighbor_id"),
      VectorFns.cosine(VectorFns.dot(col("qvec"), col("vec")),
        col("qnrm"), col("nrm")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
