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

  test("final cut is partial-agg TopK: no per-query WindowExec in the plan") {
    // the skew shape the r15 weak flagged: a window partitioned by
    // query_id sorts EVERY doc matching a high-df term on one reducer;
    // TopK.perGroup ships <= k rows per (query, mapper) instead
    val plan = Bm25.rank(corpus, "doc_id", "text",
      Seq(1 -> Seq("apple")), topK = 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"per-query window cut crept back into the BM25 plan:\n$plan")
  }

  test("TopK cut matches the window formulation rank-for-rank") {
    // ten docs share the term with distinct tf -> distinct scores; ties on
    // score broken by doc_id asc exactly like row_number over the window
    val docs = (1L to 10L)
      .map(i => (i, ("apple " * i.toInt).trim + " filler"))
      .toDF("doc_id", "text")
    val got = Bm25.rank(docs, "doc_id", "text", Seq(1 -> Seq("apple")), topK = 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(4), r.getLong(1))).toSeq
    val all = Bm25.rank(docs, "doc_id", "text", Seq(1 -> Seq("apple")), topK = 100)
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    val want = all.sortBy { case (id, s) => (-s, id) }.take(4)
      .zipWithIndex.map { case ((id, _), i) => (i + 1, id) }.toSeq
    assert(got == want)
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
