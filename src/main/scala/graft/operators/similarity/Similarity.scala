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

  /** Element-wise vec/divisor as double — unit-normalization when divisor
    * is the precomputed norm COLUMN. Compute the norm in a prior
    * projection: an inline norm(vec) here would re-fold the whole dot
    * product once per element under projection collapse.
    */
  def scale(vec: Column, divisor: Column): Column =
    transform(vec, x => x.cast("double") / divisor)

  /** Driver-side coercion of a collected embedding field (index `i` of
    * `r`) to doubles — shared by the ANN operators that collect bounded
    * hub/codebook/query sets. `nullAsZero = true` gives a null element 0
    * contribution (DotProduct's skip convention, [[graft.operators
    * .similarity.NswAnn]]); `false` rejects nulls loudly for operators
    * whose math has no skip-consistent analog ([[PqAnn]]'s L2 codeword
    * distances).
    */
  private[similarity] def collectElems(r: org.apache.spark.sql.Row, i: Int,
                                       nullAsZero: Boolean): IndexedSeq[Double] =
    r.getSeq[Any](i).map {
      case f: java.lang.Float  => f.doubleValue()
      case d: java.lang.Double => d.doubleValue()
      case null if nullAsZero => 0.0d
      case null => throw new IllegalArgumentException(
        "embedding contains a null element; this operator requires dense " +
          "vectors — impute or drop upstream")
      case x => throw new IllegalArgumentException(s"bad element $x")
    }.toIndexedSeq
}

/** Brute-force exact cosine top-k: the correctness baseline. O(|Q|·N·D) —
  * with a broadcast query set this is a single map-side pass over the
  * corpus; the per-query top-k runs through [[graft.operators.TopK]]'s
  * k-bounded partial aggregation, so the shuffle carries at most k rows per
  * query per mapper instead of the full N×|Q| scored set (which a window
  * formulation would sort — and spill — at corpus scale). Use [[LshAnn]] as
  * the sublinear path when even one scoring pass is too much.
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
    graft.operators.TopK.perGroup(scored, Seq("query_id"),
      sortCol = "cosine", idCol = "neighbor_id", k = k)
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

  /** Occupancy-bounded plane count for SELF-JOIN banding: with a fixed
    * plane count, expected bucket occupancy is n/2^bits, so in-bucket
    * candidate pairs grow as n² — the 10× scale probe measured exactly
    * that (q31: 13× time at 10× rows). Growing bits with log₂(n) pins
    * occupancy near [[TargetOccupancy]] and candidate volume to ~O(n).
    * Integer step ladder, NOT a float log: both the operator and the
    * DuckDB oracle must pick the identical width on every engine.
    * n ≤ 2048 keeps the historical 6 bits, so all driver-tested scale
    * factors are bit-for-bit unchanged.
    */
  val TargetOccupancy = 32

  /** Ladder ceiling: covers 32·2¹⁸ ≈ 8.4M vectors at target occupancy.
    * The round-13 100× probe measured the saturated ladder directly —
    * MaxPlanes=12 caps coverage at 131k, so the 200k-vector corpus
    * over-filled every bucket and q31 ran 142× at 100× data; the cap is
    * the q121 fixed-k lesson in LSH form. Each plane costs one 64-lit
    * dot per table per row (18·8 = 144 dots/row at the cap — linear,
    * codegen'd, far under the 262k-literal HubTopTwo plan bomb); beyond
    * 8.4M vectors, shard the corpus or raise the ceiling with the same
    * arithmetic — the knob is the documented bound, not a silent one.
    */
  val MaxPlanes = 18
  def adaptivePlanes(n: Long): Int =
    (PlanesPerTable to MaxPlanes).find(b => n <= (TargetOccupancy.toLong << b))
      .getOrElse(MaxPlanes)

  /** Deterministic pseudo-random plane weight in [-0.5, 0.5). Public so an
    * external oracle (e.g. the DuckDB correctness gate) can reproduce the
    * exact signatures.
    */
  def weight(table: Int, plane: Int, dim: Int): Double = {
    val seed = table.toLong * 1000003L + plane.toLong * 64L + dim
    val x = (1103515245L * seed + 12345L) % 2147483648L
    x.toDouble / 2147483648.0d - 0.5d
  }

  private def planeCol(vec: Column, table: Int, plane: Int, dims: Int): Column = {
    val w = array((0 until dims).map(d => lit(weight(table, plane, d))): _*)
    (VectorFns.dot(vec, w) > 0).cast("int")
  }

  /** Bucket key per table: packed sign bits of the `bits` hyperplane
    * projections (default: the fixed query-path width).
    */
  def bucketKey(vec: Column, table: Int, dims: Int,
                bits: Int = PlanesPerTable): Column =
    (0 until bits).map(p => planeCol(vec, table, p, dims) * (1 << p))
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

/** Embedding-cosine near-duplicate PAIRS at scale: LSH-banded candidate
  * generation + exact-cosine verification — never an unblocked O(n²)
  * self-join (SURVEY §4). The bucket self-join is narrow (ids + bucket key
  * only); embeddings re-attach after pair dedup, the same shape as
  * [[graft.operators.dedup.MinHashLSH]].
  *
  * The operator is APPROXIMATE by contract: a pair is reported iff it
  * shares an LSH bucket in ≥1 table AND its exact cosine clears the
  * threshold. Recall vs the brute-force all-pairs baseline is
  * data-dependent (high for true near-dups, lower near the decision
  * boundary) and is measured in CosinePairsSpec; the brute-force
  * formulation lives only there, as the oracle reference.
  */
object CosinePairs {
  /** @param planesPerTable bucket-key width; 0 (default) sizes it from a
    *                       corpus count via [[LshAnn.adaptivePlanes]] — the
    *                       one extra action is a single-column count scan,
    *                       paid once to keep the self-join candidate volume
    *                       linear in n instead of quadratic.
    */
  def banded(vectors: DataFrame, idCol: String, vecCol: String,
             threshold: Double, dims: Int, planesPerTable: Int = 0): DataFrame = {
    val bits =
      if (planesPerTable > 0) planesPerTable
      else LshAnn.adaptivePlanes(vectors.select(col(idCol)).count())
    val keyed = graft.operators.OpCache.cache(vectors.select(
      col(idCol).as("vid") +: col(vecCol).as("vec") +:
        VectorFns.norm(col(vecCol)).as("nrm") +:
        (0 until LshAnn.NumTables).map(t =>
          LshAnn.bucketKey(col(vecCol), t, dims, bits).as(s"bk_$t")): _*)
    ) // consumed three times: bucket entries + both pair sides
    val entries = keyed.select(col("vid"),
      explode(array((0 until LshAnn.NumTables).map(t =>
        struct(lit(t).as("t"), col(s"bk_$t").as("k"))): _*)).as("bucket"))
    val pairs = entries.alias("a").join(entries.alias("b"),
        col("a.bucket") === col("b.bucket") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("vec_a"), col("b.vid").as("vec_b"))
      .distinct() // a pair may collide in several tables; verify it once
    val va = keyed.select(col("vid").as("vec_a"), col("vec").as("avec"),
      col("nrm").as("anrm"))
    val vb = keyed.select(col("vid").as("vec_b"), col("vec").as("bvec"),
      col("nrm").as("bnrm"))
    pairs.join(va, "vec_a").join(vb, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        VectorFns.cosine(VectorFns.dot(col("avec"), col("bvec")),
          col("anrm"), col("bnrm")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
