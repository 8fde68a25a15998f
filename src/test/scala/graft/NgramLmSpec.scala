package graft

import org.apache.spark.sql.functions._

import graft.operators.NgramLm

/** Contracts of the CCNet-style n-gram LM filter beyond q149's oracle
  * gate: the filter SEPARATES boilerplate from fluent prose, the
  * stupid-backoff arithmetic matches a hand computation, the doc-start
  * rule, determinism, and the loud guards.
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // a small "fluent" dialect: bigrams the target LM has seen
  private val fluent = Seq(
    "the quick fox jumps over the lazy dog",
    "the lazy dog sleeps under the old tree",
    "the quick fox runs past the old tree",
    "a quick fox jumps over a lazy dog")

  test("LM score separates boilerplate from clean docs") {
    // target = the fluent dialect; candidates = two clean docs reusing
    // its bigrams vs two boilerplate docs (token salad the LM has never
    // seen + a repeated-junk page). CCNet's claim: the LM orders them.
    val docs = (
      fluent.zipWithIndex.map { case (t, i) => (i.toLong, t, "tgt") } ++ Seq(
        (10L, "the quick fox jumps over the old tree", "clean"),
        (11L, "a lazy dog sleeps under the old tree", "clean"),
        (12L, "click here subscribe now cookie policy accept all", "boiler"),
        (13L, "lorem ipsum dolor sit amet consectetur adipiscing elit", "boiler")))
      .toDF("doc_id", "text", "src")
    val scored = NgramLm.score(docs, "doc_id", "text", col("src") === "tgt")
      .join(docs.select(col("doc_id"), col("src")), "doc_id")
      .select(col("src"), col("lm_score_per_tok")).as[(String, Long)]
      .collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val minClean = scored("clean").min
    val maxBoiler = scored("boiler").max
    assert(minClean > maxBoiler * 10,
      s"expected an order-of-magnitude gap: clean min $minClean vs " +
        s"boilerplate max $maxBoiler")
    // and the cut lands between clean and boilerplate: the pool is 4
    // target + 2 clean + 2 boiler docs, so the top-75% rank threshold
    // keeps the 6 fluent docs and drops exactly the boilerplate
    val kept = NgramLm.select(docs,
        "doc_id", "text", col("src") === "tgt", keepPct = 75)
      .select("doc_id").as[Long].collect().toSet
    assert(Set(10L, 11L).subsetOf(kept) && !kept.contains(12L) && !kept.contains(13L),
      s"expected the clean docs kept and the boilerplate cut, got $kept")
  }

  test("stupid-backoff arithmetic matches a hand computation") {
    // target: "a b a b a c" -> unigrams a:3 b:2 c:1 (N=6, V=3);
    // bigrams: (a,b):2 (b,a):2 (a,c):1
    val docs = Seq((1L, "a b a b a c", true), (2L, "a b z", false))
      .toDF("doc_id", "text", "tgt")
    val r = NgramLm.score(docs, "doc_id", "text", col("tgt"))
      .filter(col("doc_id") === 2L).head()
    val S = NgramLm.SScale
    // doc 2 = [a, b, z]:
    //   a | start  -> (S*(c1(a)+1)) DIV (N+V) = (S*4) DIV 9
    //   b | a seen -> (S*c2(a,b)) DIV c1(a)   = (S*2) DIV 3
    //   z | b unseen -> (2*S*(0+1)) DIV (5*9)
    val exp = (S * 4) / 9 + (S * 2) / 3 + (2 * S) / (5 * 9)
    assert(r.getAs[Long]("lm_score") == exp,
      s"lm_score ${r.getAs[Long]("lm_score")} != hand value $exp")
    assert(r.getAs[Long]("n_tok") == 3L)
    assert(r.getAs[Long]("lm_score_per_tok") == exp * NgramLm.RScale / 3)
  }

  test("single-token doc is scored by the context-free unigram rule") {
    val docs = Seq((1L, "a a b", true), (2L, "a", false))
      .toDF("doc_id", "text", "tgt")
    val r = NgramLm.score(docs, "doc_id", "text", col("tgt"))
      .filter(col("doc_id") === 2L).head()
    // N=3 V=2; a|start = (S*(2+1)) DIV 5 — no alpha penalty at doc start
    assert(r.getAs[Long]("lm_score") == NgramLm.SScale * 3 / 5)
  }

  test("scoring is deterministic across runs and repartitionings") {
    val docs = (1L to 40L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11}", i % 3 == 0))
      .toDF("doc_id", "text", "tgt")
    def run(df: org.apache.spark.sql.DataFrame) =
      NgramLm.score(df, "doc_id", "text", col("tgt"))
        .orderBy("doc_id").collect().toSeq
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("empty target subcorpus fails loudly") {
    val docs = Seq((1L, "a b", false)).toDF("doc_id", "text", "tgt")
    val e = intercept[IllegalArgumentException] {
      NgramLm.score(docs, "doc_id", "text", col("tgt")).collect()
    }
    assert(e.getMessage.contains("target subcorpus is empty"))
  }

  test("empty/whitespace/null text is excluded from LM and scoring") {
    val docs = Seq((1L, "a b", true), (2L, "   ", true), (3L, null, true))
      .toDF("doc_id", "text", "tgt")
    val ids = NgramLm.score(docs, "doc_id", "text", col("tgt"))
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  // a corpus where generic boilerplate DOMINATES the general stratum:
  // the single-LM cut's blind spot — boilerplate is generically
  // predictable — which the Moore-Lewis difference cancels
  private def mlCorpus = (
    fluent.zipWithIndex.map { case (t, i) => (i.toLong, t, "tgt") } ++
      (0 until 4).map(i =>
        (20L + i, "click here subscribe now accept all cookies", "boiler")) ++ Seq(
      (10L, "the quick fox jumps over the old tree", "cand"),
      (12L, "click here subscribe now accept all cookies", "cand")))
    .toDF("doc_id", "text", "src")

  test("moore-lewis: excess ranks in-domain text above corpus-dominant boilerplate") {
    val out = NgramLm.contrastiveFlagged(mlCorpus, "doc_id", "text",
      col("src") === "tgt", lit(true), keepPct = 50)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("excess"), r.getAs[Boolean]("keep"))).toMap
    assert(out(10L)._1 > out(12L)._1,
      s"in-domain candidate must out-rank the boilerplate twin: ${out(10L)} vs ${out(12L)}")
    // top-50% of the 10-doc pool = the 4 target docs + the in-domain
    // candidate; the boilerplate docs (generically predictable, not
    // in-domain-like) all fall
    assert(out(10L)._2, "in-domain candidate kept")
    assert(!out(12L)._2, "boilerplate candidate cut")
    (20L until 24L).foreach(i => assert(!out(i)._2, s"boilerplate doc $i cut"))
  }

  test("moore-lewis: excess is exactly in_spt - gen_spt, strata wired to the right LMs") {
    val flagged = NgramLm.contrastiveFlagged(mlCorpus, "doc_id", "text",
      col("src") === "tgt", lit(true), keepPct = 100).collect()
    val inScores = NgramLm.score(mlCorpus, "doc_id", "text", col("src") === "tgt")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("lm_score_per_tok")).toMap
    val genScores = NgramLm.score(mlCorpus, "doc_id", "text", lit(true))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("lm_score_per_tok")).toMap
    flagged.foreach { r =>
      val id = r.getLong(0)
      assert(r.getAs[Long]("in_spt") == inScores(id))
      assert(r.getAs[Long]("gen_spt") == genScores(id))
      assert(r.getAs[Long]("excess") == inScores(id) - genScores(id))
      assert(r.getAs[Boolean]("keep"), "keepPct=100 keeps everything")
    }
    assert(flagged.length == 10, "every non-empty doc scored")
  }
}
