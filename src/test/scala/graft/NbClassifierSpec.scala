package graft

import org.apache.spark.sql.functions._

import graft.operators.NbClassifier

class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  // a tiny corpus with a clean lexical split: "good" class speaks
  // prose words, "bad" class speaks spam words, unlabeled docs use one
  // vocabulary or the other
  private def corpus = Seq(
    (1L, "the quick brown fox reads fine prose", "pos"),
    (2L, "prose reads well the fox is fine", "pos"),
    (3L, "buy cheap pills now click here now", "neg"),
    (4L, "click buy now cheap cheap pills", "neg"),
    (10L, "the fox reads prose", ""),       // unlabeled, prose-like
    (11L, "buy pills click now", ""),       // unlabeled, spam-like
    (12L, "zzz qqq xxx", ""))               // unlabeled, fully OOV
    .toDF("doc_id", "text", "label")

  private def scored = NbClassifier.score(corpus, "doc_id", "text",
    col("label") === "pos", col("label") === "neg")
    .collect().map(r => r.getLong(0) ->
      (r.getAs[Boolean]("pred"), r.getAs[Long]("margin"))).toMap

  test("unlabeled docs are classified by the seed models") {
    val out = scored
    assert(out(10L)._1, "prose-like doc should classify positive")
    assert(!out(11L)._1, "spam-like doc should classify negative")
  }

  test("training docs classify as their own stratum") {
    val out = scored
    assert(out(1L)._1 && out(2L)._1)
    assert(!out(3L)._1 && !out(4L)._1)
  }

  test("fully-OOV doc has zero margin and ties go negative (stays filtered)") {
    val out = scored
    // every token is out of vocabulary: both classes score the smoothed
    // floor; margin is exactly the per-token floor difference * n_tok —
    // equal only when (Npos+V) == (Nneg+V), i.e. balanced training mass
    val m = NbClassifier.score(corpus, "doc_id", "text",
      col("label") === "pos", col("label") === "neg")
      .filter(col("doc_id") === 12L)
      .select("pos_score", "neg_score", "pred").head()
    if (m.getLong(0) == m.getLong(1)) assert(!m.getBoolean(2))
    assert(out.contains(12L), "OOV doc must still be scored")
  }

  test("empty training stratum fails loudly") {
    val ex = intercept[IllegalArgumentException] {
      NbClassifier.score(corpus, "doc_id", "text",
        col("label") === "nope", col("label") === "neg").collect()
    }
    assert(ex.getMessage.contains("positive training stratum is empty"))
  }

  test("margin is exactly pos_score - neg_score and per-token margins are DIV-consistent") {
    val rows = NbClassifier.score(corpus, "doc_id", "text",
      col("label") === "pos", col("label") === "neg").collect()
    rows.foreach { r =>
      val (pos, neg, m) = (r.getAs[Long]("pos_score"),
        r.getAs[Long]("neg_score"), r.getAs[Long]("margin"))
      val (nTok, mpt) = (r.getAs[Long]("n_tok"), r.getAs[Long]("margin_per_tok"))
      assert(m == pos - neg)
      assert(mpt == pos * NbClassifier.RScale / nTok - neg * NbClassifier.RScale / nTok)
    }
  }

  test("select keeps exactly the pred=true docs") {
    val kept = NbClassifier.select(corpus, "doc_id", "text",
      col("label") === "pos", col("label") === "neg")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = scored.filter(_._2._1).keySet
    assert(kept == expected)
  }
}
