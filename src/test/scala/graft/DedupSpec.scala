package graft

import graft.operators.dedup.{MinHashLSH, NGramJaccard, SimHash}

class DedupSpec extends SparkSpec {

  test("MinHash LSH recalls the high-similarity pairs found by exact Jaccard") {
    val docs = Tables.documents(spark, sf("0.001"))
    val exact = NGramJaccard.pairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = MinHashLSH.candidatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-duplicates")
    val recalled = exact.intersect(lsh)
    assert(recalled.size.toDouble / exact.size >= 0.8,
      s"LSH recall too low: ${recalled.size}/${exact.size}")
  }

  test("SimHash: near-identical docs get near-identical signatures") {
    val docs = Tables.documents(spark, sf("0.001"))
    val sig = SimHash.signatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nearDups = NGramJaccard.pairs(docs, "doc_id", "text", threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDups.nonEmpty)
    nearDups.foreach { case (a, b) =>
      val hamming = java.lang.Long.bitCount(sig(a) ^ sig(b))
      assert(hamming <= 8, s"hamming($a,$b)=$hamming for jaccard>=0.7 pair")
    }
  }
}
