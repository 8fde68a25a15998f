package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** Contracts of the DSIR selector beyond q136's oracle gate: target-like
  * documents outscore off-target ones, threshold ties all survive, empty
  * text carries no vote, and the loud guards.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("documents matching the target distribution are selected first") {
    // target = the "alpha beta" dialect; doc 4 shares no bigram with it
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", "tgt"),
      (2L, "alpha beta gamma alpha beta", "other"),
      (3L, "alpha beta alpha beta", "other"),
      (4L, "zeta eta theta iota kappa lambda", "other"))
      .toDF("doc_id", "text", "src")
    val kept = Dsir.select(docs, "doc_id", "text",
        col("src") === "tgt", keepPct = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(4L),
      s"expected the on-target docs, got $kept")
  }

  test("threshold ties all survive (selection can exceed keepPct)") {
    // four docs with identical text -> identical score_per_tok; top-25%
    // cut lands ON the tie, so all four survive
    val docs = (1L to 4L).map(i => (i, "same text here", "t"))
      .toDF("doc_id", "text", "src")
    val kept = Dsir.select(docs, "doc_id", "text", lit(true), keepPct = 25)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L))
  }

  test("empty/whitespace text is excluded from corpus and selection") {
    val docs = Seq((1L, "alpha beta", "t"), (2L, "   ", "t"), (3L, null, "t"))
      .toDF("doc_id", "text", "src")
    val out = Dsir.select(docs, "doc_id", "text", lit(true), keepPct = 100)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L))
  }

  test("guards: empty target and keepPct range fail loudly") {
    val docs = Seq((1L, "a b", "x")).toDF("doc_id", "text", "src")
    val e = intercept[IllegalArgumentException] {
      Dsir.select(docs, "doc_id", "text", col("src") === "missing", 50)
    }
    assert(e.getMessage.contains("target subcorpus is empty"))
    intercept[IllegalArgumentException](
      Dsir.select(docs, "doc_id", "text", lit(true), 0))
    intercept[IllegalArgumentException](
      Dsir.select(docs, "doc_id", "text", lit(true), 101))
  }
}
