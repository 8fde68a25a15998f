package graft

import graft.operators.PageRank

/** Contracts of the exact-integer PageRank beyond q135's oracle gate:
  * symmetry on a cycle, dangling-mass redistribution, multi-edge
  * collapse, and bit-identical re-runs (the determinism the integer
  * discipline buys).
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int = 3) =
    PageRank.run(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a symmetric cycle stays uniform") {
    val pr = run(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L))
    assert(pr.values.toSet.size == 1, s"cycle ranks diverged: $pr")
    // mass is conserved up to per-node truncation (< iters per node)
    val base = PageRank.Scale / 3
    assert(pr.values.forall(v => v <= base && v > base - 10))
  }

  test("a sink concentrates mass and redistributes it as dangling") {
    // 2->1, 3->1: node 1 is the only sink AND the only dangling node
    val pr = run(Seq(2L -> 1L, 3L -> 1L), iters = 1)
    assert(pr(1L) > pr(2L) && pr(2L) == pr(3L))
    // after one round the spokes hold base15 + dangling share only
    val base = PageRank.Scale / 3
    val base15 = (15 * base) / 100
    assert(pr(2L) == base15 + (85 * (base / 3)) / 100)
  }

  test("duplicate edge rows collapse to the simple digraph") {
    val once = run(Seq(1L -> 2L, 2L -> 1L))
    val dup = run(Seq(1L -> 2L, 1L -> 2L, 2L -> 1L, 1L -> 2L))
    assert(once == dup)
  }

  test("re-running is bit-identical") {
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L, 4L -> 1L)
    assert(run(edges, 5) == run(edges, 5))
  }

  test("guards") {
    intercept[IllegalArgumentException](
      PageRank.run(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", 0))
  }
}
