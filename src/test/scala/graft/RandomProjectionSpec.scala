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
}
