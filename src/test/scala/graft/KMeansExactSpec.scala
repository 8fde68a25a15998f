package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.similarity.{CosineTopK, IvfAnn, KMeansExact, PqAnn}

/** Unit contract of [[KMeansExact]] (exact floor-mean updates, lowest-cid
  * tie-breaks, dims-aware quantization bounds) plus the spec the training
  * exists for: on a corpus whose first-K ids are UNREPRESENTATIVE (all drawn
  * from one tight cluster), trained centroids/codewords must beat the
  * first-K seeding convention on recall@10 for both IVF and PQ.
  */
class KMeansExactSpec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------------------
  // unit contract
  // ------------------------------------------------------------------

  test("maxQFor is the largest power-of-2 bound keeping worst-case distance in int64") {
    assert(KMeansExact.maxQFor(64) == (1L << 27))
    for (dims <- Seq(1, 2, 8, 64, 256, 4096)) {
      val b = KMeansExact.maxQFor(dims)
      assert(BigInt(dims) * 4 * b * b <= (BigInt(1) << 62), s"dims=$dims bound $b overflows")
      assert(b == 1 || BigInt(dims) * 4 * (2 * b) * (2 * b) > (BigInt(1) << 62),
        s"dims=$dims bound $b not maximal")
    }
    // one bit per dims quadrupling (b² scales inverse-linearly with dims)
    assert(KMeansExact.maxQFor(256) == (1L << 26))
  }

  test("quantized floors at 2^20 and is loud on nulls and overflow magnitudes") {
    val v = Seq((1L, Seq(1.5d, -1.5d))).toDF("id", "vec")
    val q = KMeansExact.quantized(v, "id", "vec", dims = 2)
      .head().getSeq[Long](1)
    assert(q == Seq((1.5 * (1L << 20)).toLong, math.floor(-1.5 * (1 << 20)).toLong))
    val nullV = Seq((1L, Seq[java.lang.Double](1.0d, null))).toDF("id", "vec")
    val eNull = intercept[Exception](
      KMeansExact.quantized(nullV, "id", "vec", 2).collect())
    assert(eNull.getMessage.contains("dense"), eNull.getMessage)
    val loud = Seq((1L, Seq(1e9d, 0d))).toDF("id", "vec")
    val eBig = intercept[Exception](
      KMeansExact.quantized(loud, "id", "vec", 2).collect())
    assert(eBig.getMessage.contains("too large"), eBig.getMessage)
  }

  test("train: floor-mean updates (negative sums floor down), ties to lowest cid, empty clusters hold") {
    // hand-checkable 1-D quantized corpus; seeds = two lowest vids (q=0, q=10)
    val qz = Seq(
      (1L, Seq(0L)), (2L, Seq(10L)), // seeds
      (3L, Seq(5L)),                 // equidistant to 0 and 10 → tie → cid 0
      (4L, Seq(-8L)),                // cid 0
      (5L, Seq(13L))                 // cid 1
    ).toDF("vid", "qvec")
    val cents = KMeansExact.train(qz, k = 2, iters = 1, dims = 1)
    // cid 0 gathers {0, 5, -8}: sum = -3, n = 3 → floor(-1.0) = -1
    // cid 1 gathers {10, 13}:   sum = 23, n = 2 → floor(11.5) = 11
    assert(cents.map(_.toSeq).toSeq == Seq(Seq(-1L), Seq(11L)))
    // a far-out seed that attracts nothing must keep its coordinates
    val qz2 = Seq((1L, Seq(0L)), (2L, Seq(1000000L)), (3L, Seq(1L)))
      .toDF("vid", "qvec")
    val cents2 = KMeansExact.train(qz2, k = 2, iters = 2, dims = 1)
    assert(cents2(1).toSeq == Seq(1000000L), "empty cluster must keep its centroid")
    assert(cents2(0).toSeq == Seq(0L)) // floor((0+1)/2) = 0, stable
  }

  test("medoids picks the (dist, vid)-least REAL row per cluster, vids ascending") {
    val qz = Seq(
      (11L, Seq(0L, 0L)), (12L, Seq(2L, 0L)),   // cluster around origin
      (21L, Seq(100L, 0L)), (22L, Seq(98L, 0L)) // cluster around (99, 0)
    ).toDF("vid", "qvec")
    val cents = Array(Array(1L, 0L), Array(99L, 0L))
    // dist 1 from (1,0): vids 11 and 12 tie at 1 → vid ASC → 11
    // dist 1 from (99,0): vids 21 and 22 tie at 1 → vid ASC → 21
    assert(KMeansExact.medoids(qz, cents).toSeq == Seq(11L, 21L))
  }

  // ------------------------------------------------------------------
  // recall: trained beats first-K on an adversarial-id corpus
  // ------------------------------------------------------------------

  /** 400 vectors in 8 orthogonal block clusters (cluster g = 1.0 on coords
    * 8g..8g+7) + small zero-mean deterministic noise — EXCEPT ids 0..15,
    * which all sit in cluster 0: the first-K seeding convention (IVF's 8
    * centroids, PQ's 16 codewords per subspace) sees only cluster 0.
    *
    * The seed ids carry a ±δ sign-pattern perturbation with ZERO sum inside
    * every 8-coord block and identical norms. That shape is what makes the
    * seeding GENUINELY adversarial rather than merely degenerate: equal
    * norms and zero block-sums cancel every v-independent term in the
    * corpus→centroid score, so a first-K assignment ranks centroids purely
    * by each vector's own noise — a deterministic per-vector hash that
    * scatters every true cluster uniformly across all 8 cells (probes=2
    * then sees ~1/4 of a query's true neighbors). Any asymmetry instead
    * collapses assignment into one or two cells, where probing hides the
    * bad partition behind recall=1.0 at zero pruning.
    */
  private lazy val adversarial: DataFrame = {
    val rows = (0L until 400L).map { i =>
      val g = if (i < 16) 0 else (i % 8).toInt
      val vec = Array.tabulate(64) { d =>
        val base = if (d / 8 == g) 1.0d else 0.0d
        if (i < 16) {
          // seed noise: 4 "+" and 4 "−" per block, rotated by id → zero
          // block-sums, equal norms, 8 distinct directions
          val sign = if ((d % 8 + i + d / 8) % 8 < 4) 1.0d else -1.0d
          (base + sign * 0.1d).toFloat
        } else {
          val h = (i * 1103515245L + d * 2654435761L) % 997L
          (base + (h.toDouble / 997.0d - 0.5d) * 0.16d).toFloat
        }
      }
      (i, vec.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def recallOf(approx: DataFrame, exact: Set[(Long, Long)]): Double = {
    val a = approx.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact.intersect(a).size.toDouble / exact.size
  }

  test("IVF: k-means-trained centroids beat first-K seeding on adversarial ids") {
    val qp: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => c >= 16 && c < 32 // 16 queries spread over all 8 clusters
    val exact = CosineTopK.search(adversarial, "vec_id", "embedding", qp, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val firstK = recallOf(
      IvfAnn.search(adversarial, "vec_id", "embedding", qp, 10,
        nCentroids = 8, probes = 2), exact)
    val trained = recallOf(
      IvfAnn.searchTrained(adversarial, "vec_id", "embedding", qp, 10,
        nCentroids = 8, probes = 2, trainIters = 5, dims = 64), exact)
    info(s"IVF recall@10: firstK=$firstK trained=$trained")
    assert(trained > firstK,
      s"training must lift IVF recall on adversarial ids: $trained <= $firstK")
    assert(trained >= 0.5, s"trained IVF recall too low: $trained")
  }

  test("NSW: k-means-medoid hubs beat first-K hub seeding on adversarial ids") {
    import graft.operators.similarity.NswAnn
    // Metric note: within a cluster every member sits at near-identical
    // cosine to the query (a deliberately FLAT landscape), so exact-set
    // recall@10 only measures which near-ties a 16-node beam happened to
    // visit — noise for BOTH hub choices. What hub quality controls is
    // whether the beam lands in the RIGHT cluster at all, so the assertion
    // is cluster precision: the fraction of returned neighbors sharing the
    // query's true cluster. Trained medoid hubs cover all 8 clusters
    // (verified via the centroid block structure while authoring this
    // spec); first-K hubs all sit in cluster 0's seed ball and strand
    // part of the beam there.
    def clusterOf(i: Long): Int = if (i < 16) 0 else (i % 8).toInt
    val qp: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => c >= 16 && c < 32
    def precision(rows: Array[(Long, Long)]): Double =
      rows.count(t => clusterOf(t._2) == clusterOf(t._1)).toDouble / rows.length
    val firstK = precision(
      NswAnn.search(adversarial, "vec_id", "embedding", qp, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))))
    val trained = precision(
      NswAnn.searchTrained(adversarial, "vec_id", "embedding", qp, 10,
        trainIters = 5, dims = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1))))
    info(s"NSW cluster precision: firstK=$firstK trained=$trained")
    assert(trained > firstK,
      s"medoid hubs must beat first-K hubs on cluster precision: $trained <= $firstK")
    assert(trained >= 0.95, s"trained NSW cluster precision too low: $trained")
  }

  test("PQ: k-means-trained codewords beat first-K seeding on adversarial ids") {
    val qp: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => c >= 16 && c < 32
    val exact = CosineTopK.search(adversarial, "vec_id", "embedding", qp, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val firstK = recallOf(
      PqAnn.search(adversarial, "vec_id", "embedding", qp, k = 10, rerank = 50),
      exact)
    val trained = recallOf(
      PqAnn.searchTrained(adversarial, "vec_id", "embedding", qp, k = 10,
        rerank = 50, trainIters = 5, dims = 64), exact)
    info(s"PQ recall@10: firstK=$firstK trained=$trained")
    assert(trained > firstK,
      s"training must lift PQ recall on adversarial ids: $trained <= $firstK")
    assert(trained >= 0.5, s"trained PQ recall too low: $trained")
  }
}
