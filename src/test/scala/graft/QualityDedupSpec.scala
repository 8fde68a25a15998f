package graft

import org.apache.spark.sql.functions._

import graft.operators.dedup.QualityDedup

/** Contracts of the quality-aware cluster dedup (q148's operator) beyond
  * the oracle gate: the winner is the QUALITY argmax, not the min id
  * (the property that distinguishes it from DupClusters' canonical-copy
  * rule); ties break by id; singletons and null-text docs survive; every
  * input doc appears exactly once; reruns are identical.
  */
class QualityDedupSpec extends SparkSpec {
  import spark.implicits._

  // docs 1/2/3 are near-identical (one shared long shingle run); doc 3
  // carries the richest text (stopwords + length) so it outscores the
  // LOWER-id duplicates; docs 10 and 11 are unrelated singletons; doc 20
  // has null text
  private def corpus = Seq(
    (1L, Option("alpha beta gamma delta epsilon zeta eta theta")),
    (2L, Option("alpha beta gamma delta epsilon zeta eta iota")),
    (3L, Option("the alpha beta gamma delta epsilon zeta eta and it is " +
      "a story of the words in it to read and the reader is in it")),
    (10L, Option("completely unrelated text about something else entirely")),
    (11L, Option("another distinct document with its own vocabulary set")),
    (20L, None: Option[String])).toDF("doc_id", "text")

  test("the cluster winner is the quality argmax, not the min id") {
    val out = QualityDedup.keepBest(corpus, "doc_id", "text", threshold = 0.1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out.size == 6, s"every input doc appears once: $out")
    // 1,2,3 cluster together under rep 1
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L && out(3L)._1 == 1L)
    assert(out(1L)._2 == 3L) // cluster_size
    // doc 3 outscores 1 and 2 -> it alone is kept despite the larger id
    assert(out(3L)._4 && !out(1L)._4 && !out(2L)._4,
      s"winner must be the quality argmax: $out")
    assert(out(3L)._3 > out(1L)._3 && out(3L)._3 > out(2L)._3)
    // singletons and the null-text doc survive as their own clusters
    for (id <- Seq(10L, 11L, 20L)) {
      assert(out(id) == (id, 1L, out(id)._3, true), s"doc $id: ${out(id)}")
    }
    assert(out(20L)._3 == 0.0d) // null text scores zero but is kept
  }

  test("exact-duplicate texts tie on quality and break by lowest id") {
    val dup = Seq(
      (5L, "identical words repeated here for the tie case"),
      (4L, "identical words repeated here for the tie case"))
      .toDF("doc_id", "text")
    val out = QualityDedup.keepBest(dup, "doc_id", "text", threshold = 0.1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out == Map(4L -> true, 5L -> false))
  }

  test("deterministic across fresh plans") {
    def run() = QualityDedup.keepBest(corpus, "doc_id", "text", 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
      .toSet
    assert(run() == run())
  }

  test("banded arm: exact-duplicate clusters are fully recalled; quality rule identical") {
    // exact duplicates have jaccard 1.0 -> every band collides, so the
    // banded arm's recall on them is 1 by construction; the quality
    // argmax downstream is byte-identical code
    val dup = Seq(
      (5L, "identical words repeated here for the tie case"),
      (4L, "identical words repeated here for the tie case"),
      (9L, "a different singleton text that stands alone"))
      .toDF("doc_id", "text")
    val out = QualityDedup.keepBest(dup, "doc_id", "text", threshold = 0.1,
        banded = true)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out == Map(4L -> true, 5L -> false, 9L -> true))
  }

  test("banded vs exact arm: the recall trade, measured on the real corpus") {
    val docs = Tables.documents(spark, sf("0.001"))
    def drops(banded: Boolean) =
      QualityDedup.keepBest(docs, "doc_id", "text", 0.1, banded)
        .filter(!col("kept")).select("doc_id").collect()
        .map(_.getLong(0)).toSet
    val exact = drops(banded = false)
    val banded = drops(banded = true)
    val recall = banded.intersect(exact).size.toDouble / exact.size
    info(f"drop-recall banded-vs-exact: $recall%.3f " +
      f"(banded drops ${banded.size}, exact drops ${exact.size})")
    // the documented trade: banding (4 bands x 4 rows at the corpus's
    // near-dup jaccard profile) recalls most of the exact arm's drops
    // while capping candidate cost at O(docs x bands); the floor pins a
    // regression in the banding wiring, not the corpus
    assert(exact.nonEmpty, "vacuous corpus: exact arm dropped nothing")
    assert(recall >= 0.5, f"banded drop-recall collapsed: $recall%.3f")
  }
}
