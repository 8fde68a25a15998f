package graft

import org.apache.spark.sql.functions._

import graft.operators.similarity.RandomProjection

/** Contracts of the JL projection beyond q143's bitwise oracle gate:
  * driver-side fold equivalence (independent re-implementation of the
  * pinned accumulation), determinism across fresh plans, and the
  * norm-preservation statistic the projection exists for.
  */
class RandomProjectionSpec extends SparkSpec {

  private def vecs = Tables.embeddings(spark, sf("0.001"))

  test("coordinates equal an independent driver-side left fold") {
    val rows = vecs.filter(col("vec_id") < 5).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    val got = RandomProjection.project(vecs, "vec_id", "embedding", 64, 16)
      .filter(col("vid") < 5).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    val scale = 1.0d / math.sqrt(16.0d)
    rows.foreach { case (vid, e) =>
      (0 until 16).foreach { j =>
        var acc = 0.0d
        (0 until 64).foreach(d => acc += e(d) * RandomProjection.weight(j, d))
        assert(got(vid)(j) == acc * scale,
          s"vid=$vid p$j: ${got(vid)(j)} != ${acc * scale}")
      }
    }
  }

  test("deterministic across fresh plans") {
    def run() = RandomProjection.project(vecs, "vec_id", "embedding", 64, 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(run() == run())
  }

  test("norms are preserved in aggregate (the JL property, scaled by the U[-.5,.5) variance)") {
    // E[(w.x)^2] = |x|^2/12 for uniform weights, so 12*|proj|^2/|x|^2
    // concentrates at 1; the mean over the corpus must sit tight
    val p = RandomProjection.project(vecs, "vec_id", "embedding", 64, 16)
    val joined = vecs.select(col("vec_id").as("vid"), col("embedding"))
      .join(p, "vid")
      .select(
        expr("aggregate(proj, 0.0d, (a, x) -> a + x * x)").as("pn2"),
        expr("aggregate(embedding, 0.0d, (a, x) -> a + cast(x as double) * cast(x as double))").as("n2"))
    val meanRatio = joined.filter(col("n2") > 0)
      .select(avg(col("pn2") * lit(12.0d) / col("n2"))).collect()(0).getDouble(0)
    info(s"mean 12*|proj|^2/|x|^2 = $meanRatio")
    assert(meanRatio > 0.7 && meanRatio < 1.3,
      s"JL norm statistic off: $meanRatio (expected ~1)")
  }

  test("guards") {
    intercept[IllegalArgumentException](
      RandomProjection.project(vecs, "vec_id", "embedding", 64, 0))
    intercept[IllegalArgumentException](
      RandomProjection.project(vecs, "vec_id", "embedding", 64, 65))
  }

  test("pairwise distances are preserved in aggregate (the JL guarantee)") {
    // What JL promises is DISTANCE preservation within (1 +- eps), and
    // that is what this pins: mean of 12*|proj(a)-proj(b)|^2 / |a-b|^2
    // over many pairs ~ 1, per-pair spread ~ sqrt(2/16). Top-k neighbor
    // RECALL is deliberately NOT asserted: the synthetic embeddings are
    // i.i.d. uniform, every pairwise cosine concentrates at the same
    // value, and rank order among near-equal distances is destroyed by
    // any reduction (measured recall@10 = 0.06 here) — that is distance
    // concentration in structureless data, not a projection defect.
    val e = vecs.filter(col("vec_id") < 200).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1).map(_._2)
    val scale = 1.0d / math.sqrt(16.0d)
    def proj(x: Array[Double]) = Array.tabulate(16) { j =>
      var a = 0.0d
      (0 until 64).foreach(d => a += x(d) * RandomProjection.weight(j, d))
      a * scale
    }
    val ps = e.map(proj)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for (i <- e.indices; k <- (i + 1) until e.length if k <= i + 7)
      yield 12.0d * d2(ps(i), ps(k)) / d2(e(i), e(k))
    val mean = ratios.sum / ratios.size
    val within = ratios.count(r => r > 0.4 && r < 1.9).toDouble / ratios.size
    info(s"pairs=${ratios.size} mean ratio=$mean within[0.4,1.9]=$within")
    assert(mean > 0.85 && mean < 1.15, s"JL distance mean off: $mean")
    assert(within > 0.9, s"too many distorted pairs: $within")
  }
}
