package graft

import org.apache.spark.sql.functions._

import graft.operators.similarity.PrototypePrune

class PrototypePruneSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated 2-d clusters around (0,0) and (10,10), each with
  // one far outlier — ids ordered so seeds (lowest vids) land one per blob
  private def blobs = Seq(
    (0L, Seq(0.0f, 0.0f)),
    (1L, Seq(10.0f, 10.0f)),
    (2L, Seq(0.1f, 0.0f)),
    (3L, Seq(0.0f, 0.1f)),
    (4L, Seq(0.1f, 0.1f)),
    (5L, Seq(3.0f, 3.0f)),    // cluster-0 outlier (hard example)
    (6L, Seq(10.1f, 10.0f)),
    (7L, Seq(10.0f, 10.1f)),
    (8L, Seq(10.1f, 10.1f)),
    (9L, Seq(7.0f, 7.0f)))    // cluster-1 outlier
    .toDF("vec_id", "embedding")

  private def run(keepPct: Int) =
    PrototypePrune.flagged(blobs, "vec_id", "embedding",
      k = 2, iters = 2, dims = 2, keepPct = keepPct)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getAs[Boolean]("keep"))).toMap

  test("keep-hard: the farthest example per cluster always survives a 20% cut") {
    val out = run(20)
    assert(out.size == 10, "no rows dropped from the flag frame")
    assert(out(5L)._3, "cluster-0 outlier is the hardest example — must be kept")
    assert(out(9L)._3, "cluster-1 outlier is the hardest example — must be kept")
    // the prototypical members (at the centroid) are the first pruned
    val dists = out.values.groupBy(_._1)
    dists.foreach { case (cid, rows) =>
      val kept = rows.filter(_._3).map(_._2)
      val dropped = rows.filterNot(_._3).map(_._2)
      assert(kept.nonEmpty, s"cluster $cid kept nothing at 20%")
      if (dropped.nonEmpty)
        assert(kept.min >= dropped.max,
          s"cluster $cid: kept a nearer example while dropping a farther one")
    }
  }

  test("keepPct=100 keeps everything") {
    val out = run(100)
    assert(out.values.forall(_._3))
  }

  test("per-cluster keep fraction honors the exact-rank contract (>= keepPct%)") {
    val out = run(60)
    out.values.groupBy(_._1).foreach { case (cid, rows) =>
      val n = rows.size
      val kept = rows.count(_._3)
      val target = n - (n * 60) / 100 + 1
      // kept = #{dist >= the target-th smallest}: at least n - target + 1
      assert(kept >= n - target + 1,
        s"cluster $cid kept $kept of $n — below the exact-rank floor")
    }
  }

  test("a cluster too small for its cut keeps nothing, loudly deterministic") {
    // 3 rows in one cluster at keepPct=20: rank = 3 - 0 + 1 = 4 > n -> none kept
    val tiny = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(0.1f, 0.0f)), (2L, Seq(0.0f, 0.1f)))
      .toDF("vec_id", "embedding")
    val out = PrototypePrune.flagged(tiny, "vec_id", "embedding",
      k = 1, iters = 1, dims = 2, keepPct = 20)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(out.size == 3 && out.values.forall(!_))
  }

  test("select returns exactly the kept rows; determinism across runs") {
    val kept = PrototypePrune.select(blobs, "vec_id", "embedding",
      k = 2, iters = 2, dims = 2, keepPct = 40)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val expected = run(40).filter(_._2._3).keySet
    assert(kept == expected)
    assert(run(40) == run(40), "two runs must agree bit-for-bit")
  }
}
