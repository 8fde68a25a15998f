package graft

import org.apache.spark.sql.functions._

import graft.operators.Bm25

/** Contracts of the BM25 ranker beyond q132's oracle gate: the input
  * guards that keep the slot-pivot construction well-formed (duplicate
  * terms would make the post-agg `__c_<term>` reference ambiguous;
  * non-[a-z0-9]+ terms would leak into slot column names and the oracle
  * SQL's interpolated literals), plus hand-built ranking semantics the
  * gate's fixed query set can't isolate.
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry durian"),
    (4L, "unrelated words only")).toDF("doc_id", "text")

  test("duplicate terms within a query are rejected") {
    val e = intercept[IllegalArgumentException] {
      Bm25.rank(corpus, "doc_id", "text",
        Seq(1 -> Seq("apple", "apple")), topK = 3)
    }
    assert(e.getMessage.contains("duplicate terms"))
  }

  test("terms outside [a-z0-9]+ are rejected (slot names + oracle SQL)") {
    for (bad <- Seq("o'brien", "two words", "Upper", "sémantic", "a;--")) {
      val e = intercept[IllegalArgumentException] {
        Bm25.rank(corpus, "doc_id", "text", Seq(1 -> Seq(bad)), topK = 3)
      }
      assert(e.getMessage.contains("[a-z0-9]+"), s"term '$bad' slipped through")
    }
  }

  test("ranking semantics on a hand corpus") {
    val out = Bm25.rank(corpus, "doc_id", "text",
      Seq(1 -> Seq("apple"), 2 -> Seq("banana", "cherry")), topK = 10)
      .orderBy("query_id", "rank").collect()
    val q1 = out.filter(_.getInt(0) == 1)
    assert(q1.map(_.getLong(1)).toSeq == Seq(1L)) // only doc 1 has "apple"
    assert(q1.head.getInt(2) == 1)
    val q2 = out.filter(_.getInt(0) == 2)
    // docs 1,2,3 match at least one of banana/cherry; doc 4 is absent
    assert(q2.map(_.getLong(1)).toSet == Set(1L, 2L, 3L))
    // doc 2 matches both terms, the others one each
    val matchedBy = q2.map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(matchedBy(2L) == 2 && matchedBy(1L) == 1 && matchedBy(3L) == 1)
    // two-term match with both rarer-than-nothing terms outranks either single
    assert(q2.head.getLong(1) == 2L)
  }
}
