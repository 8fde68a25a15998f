package graft

import graft.operators.Rrf

/** Contracts of the RRF fuser beyond q134's oracle gate: missing-leg
  * zero contribution, the pinned left-to-right leg sum, single-leg
  * degeneracy, and the leg-name guards that keep internal rank columns
  * well-formed.
  */
class RrfSpec extends SparkSpec {
  import spark.implicits._

  private def leg(rows: (Int, Long, Int)*) =
    rows.toDF("query_id", "doc_id", "rank")

  test("doc present in both legs outranks a rank-1 single-leg doc") {
    // doc 10: rank 2 in both legs = 2/(60+2); doc 20: rank 1 sparse only
    // = 1/61 < 2/62·? -> 2/62 = 0.03226 > 1/61 = 0.01639
    val out = Rrf.fuse(Seq(
      "sparse" -> leg((1, 10L, 2), (1, 20L, 1)),
      "dense" -> leg((1, 10L, 2))), topK = 10).orderBy("rank").collect()
    assert(out.map(r => (r.getLong(1), r.getInt(2))).toSeq ==
      Seq((10L, 2), (20L, 1)))
    val rrf10 = out(0).getDouble(3)
    assert(rrf10 == 1.0 / 62 + 1.0 / 62) // exact: pinned two-term sum
    assert(out(1).getDouble(3) == 1.0 / 61 + 0.0)
  }

  test("ties on rrf break by doc_id ascending") {
    // both docs rank 1 in exactly one (different) leg -> equal rrf
    val out = Rrf.fuse(Seq(
      "sparse" -> leg((1, 7L, 1)),
      "dense" -> leg((1, 3L, 1))), topK = 10)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 7L))
  }

  test("single leg degenerates to the leg's own order") {
    val out = Rrf.fuse(Seq("only" -> leg((1, 5L, 1), (1, 6L, 2))), topK = 1)
      .collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(5L))
    assert(out.head.getInt(2) == 1) // n_legs
  }

  test("leg-name and arity guards") {
    intercept[IllegalArgumentException](Rrf.fuse(Seq.empty, topK = 1))
    intercept[IllegalArgumentException](
      Rrf.fuse(Seq("a" -> leg(), "a" -> leg()), topK = 1))
    intercept[IllegalArgumentException](
      Rrf.fuse(Seq("Bad Name" -> leg()), topK = 1))
    intercept[IllegalArgumentException](
      Rrf.fuse(Seq("a" -> leg()), topK = 0))
  }
}
