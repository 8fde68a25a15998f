package graft

import org.apache.spark.sql.functions._

import graft.operators.dedup.SemanticContamination

class SemanticContaminationSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated 2-d blobs; even ids = "eval" via the predicate
  // below. 5 is a paraphrase-twin of 4 (same direction, near-identical),
  // 6 points elsewhere inside blob B's cell.
  private def vecs = Seq(
    (0L, Seq(1.0f, 0.0f)),    // eval, blob A
    (1L, Seq(0.99f, 0.05f)),  // train, blob A — near-parallel to 0
    (2L, Seq(0.7f, 0.7f)),    // train, blob A boundary-ish
    (4L, Seq(0.0f, 1.0f)),    // eval, blob B
    (5L, Seq(0.05f, 0.99f)),  // train, blob B — near-parallel to 4
    (7L, Seq(-1.0f, 0.2f)))   // train, own direction
    .toDF("vec_id", "embedding")

  private def even: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    vid => vid % 2 === 0

  private def run(threshold: Double) =
    SemanticContamination.audit(vecs, "vec_id", "embedding", even,
      threshold, nCentroids = 2, trainIters = 2, dims = 2)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getAs[Boolean]("contaminated"))).toMap

  test("audit flags the paraphrase twin and finds the nearest train neighbor") {
    val out = run(0.9)
    // only eval (even) ids appear
    assert(out.keySet.forall(_ % 2 == 0))
    val (nn0, cos0, flag0) = out(0L)
    assert(nn0.contains(1L), s"eval 0's nearest train neighbor should be 1, got $nn0")
    assert(cos0.exists(_ > 0.9) && flag0, "near-parallel twin must flag")
    val (nn4, _, flag4) = out(4L)
    assert(nn4.contains(5L) && flag4)
  }

  test("threshold gates the flag, not the neighbor") {
    val strict = run(0.9999)
    strict.foreach { case (id, (nn, cos, flag)) =>
      assert(!flag, s"eval $id flagged at an unreachable threshold")
      // neighbors still reported — the audit is a report, not just a filter
      assert(nn.isDefined == cos.isDefined)
    }
    assert(run(0.9).map { case (k, v) => k -> v._1 } ==
      strict.map { case (k, v) => k -> v._1 },
      "nearest neighbor must not depend on the threshold")
  }

  test("an eval vector alone in its cell reports null neighbor, unflagged") {
    // one eval blob far from the single train point's cell: k=2 puts the
    // lone eval direction in its own cluster with no train rows
    val lonely = Seq(
      (0L, Seq(1.0f, 0.0f)),   // eval, own direction
      (1L, Seq(-1.0f, 0.0f)),  // train, opposite cell
      (3L, Seq(-0.99f, 0.05f))) // train, same cell as 1
      .toDF("vec_id", "embedding")
    val out = SemanticContamination.audit(lonely, "vec_id", "embedding",
      even, 0.5, nCentroids = 2, trainIters = 2, dims = 2)
      .collect().map(r => r.getLong(0) ->
        (r.isNullAt(2), r.isNullAt(3), r.getAs[Boolean]("contaminated"))).toMap
    val (nnNull, cosNull, flag) = out(0L)
    assert(nnNull && cosNull && !flag,
      "no train row in the cell -> null neighbor, no flag")
  }

  test("auditAdaptive equals the explicit-knob audit at the corpus's ladder rung") {
    // n=6 -> flat ladder rung kc=BaseCells, modulus 1 — the adaptive
    // entry must route to exactly audit(k=BaseCells, m=1)
    val ad = SemanticContamination.auditAdaptive(vecs, "vec_id", "embedding",
      even, 0.9, trainIters = 2, dims = 2, oracleFlatLadder = true)
      .collect().map(_.toSeq).toSet
    val ex = SemanticContamination.audit(vecs, "vec_id", "embedding",
      even, 0.9, nCentroids = graft.operators.dedup.SemanticDedup.BaseCells,
      trainIters = 2, dims = 2)
      .collect().map(_.toSeq).toSet
    assert(ad == ex)
  }

  test("deterministic across runs and repartitionings") {
    val a = run(0.9)
    val b = SemanticContamination.audit(vecs.repartition(7), "vec_id",
      "embedding", even, 0.9, nCentroids = 2, trainIters = 2, dims = 2)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getAs[Boolean]("contaminated"))).toMap
    assert(a == b)
  }
}
