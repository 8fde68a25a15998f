package graft

import graft.operators.BpeTrain

/** Contracts of the BPE trainer beyond q137's oracle gate: textbook
  * merge order on a hand corpus, the symbol-exact greedy fold on
  * repeated-symbol runs (the case naive string replacement gets wrong),
  * tie-breaking, and early exhaustion.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def train(texts: Seq[String], m: Int) =
    BpeTrain.merges(texts.toDF("text"), "text", m)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("textbook merge order on a weighted corpus") {
    // "lo" appears in every word; (l,o) count 5 wins round 1, then
    // (lo,w) count 5 wins round 2 (low x3 + lower x2 both contain l o w)
    val out = train(Seq("low low low lower lower widest"), 2)
    assert(out(0) == ((1, "l o", "lo", 5L)))
    assert(out(1) == ((2, "lo w", "low", 5L)))
  }

  test("repeated-symbol runs merge greedily, never re-merging") {
    // aaaa -> [a,a,a,a,</w>]: pairs (a,a) x3 beat (a,</w>) x1
    // greedy apply -> [aa,aa,</w>]; round 2's top pair is (aa,aa) x1...
    // with freq 2 it stays ahead of singles
    val out = train(Seq("aaaa aaaa"), 2)
    assert(out(0) == ((1, "a a", "aa", 6L)))
    // after [aa,aa,</w>] x2: pairs (aa,aa) x2, (aa,</w>) x2 -> tie broken
    // by pair ASC: "aa </w>" < "aa aa"
    assert(out(1)._2 == "aa </w>" && out(1)._4 == 2L)
  }

  test("five-symbol run: fold yields [aa,aa,a], not the re-merged [aaaa,a]") {
    // aaaaa -> round1 pair (a,a) count 4; apply -> [aa,aa,a,</w>]
    // round2 pairs: (aa,aa) x1, (aa,a) x1, (a,</w>) x1 -> tie by ASC:
    // "a </w>" < "aa a" < "aa aa"
    val out = train(Seq("aaaaa"), 2)
    assert(out(0) == ((1, "a a", "aa", 4L)))
    assert(out(1)._2 == "a </w>",
      s"expected the fold's [aa,aa,a,</w>] pair table, got ${out(1)}")
  }

  test("exhaustion stops early with fewer rows") {
    // single word collapses after 4 merges ("ab" has symbols a,b,</w>)
    val out = train(Seq("ab"), 10)
    assert(out.length < 10 && out.nonEmpty)
    val last = out.last
    assert(last._3 == "ab</w>")
  }

  test("guards") {
    intercept[IllegalArgumentException](
      BpeTrain.merges(Seq("x").toDF("text"), "text", 0))
  }

  private def encode(texts: Seq[String], merges: Seq[(String, String)]) =
    BpeTrain.encodeVocab(texts.toDF("text"), "text", merges)
      .orderBy("word").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3)))

  test("encodeVocab applies merges in learn order") {
    // merges (l,o) then (lo,w): low -> [low,</w>], lower -> [low,e,r,</w>],
    // widest untouched -> 7 symbols
    val out = encode(Seq("low low low lower lower widest"),
      Seq(("l", "o"), ("lo", "w")))
    assert(out.toSeq == Seq(
      ("low", 3L, 2, "low|</w>"),
      ("lower", 2L, 4, "low|e|r|</w>"),
      ("widest", 1L, 7, "w|i|d|e|s|t|</w>")))
  }

  test("encodeVocab run-of-5 greedy matches the trainer's fold") {
    // (a,a) over aaaaa -> [aa,aa,a,</w>]: leftmost non-overlapping, no
    // re-merge of the just-built aa with the next a
    val out = encode(Seq("aaaaa"), Seq(("a", "a")))
    assert(out.head == (("aaaaa", 1L, 4, "aa|aa|a|</w>")))
  }

  test("encodeVocab matches what training itself learned end-to-end") {
    val corpus = Seq("low low low lower lower widest newest newest")
    val learned = train(corpus, 4).map { t =>
      val Array(l, r) = t._2.split(" ", 2); (l, r)
    }.toSeq
    val enc = encode(corpus, learned)
    // every word's token sequence must re-concatenate to word + </w>
    enc.foreach { case (w, _, n, toks) =>
      assert(toks.split("\\|").mkString == w + "</w>")
      assert(toks.split("\\|").length == n)
    }
  }

  test("encodeVocab rejects unsafe merge symbols") {
    intercept[IllegalArgumentException](
      encode(Seq("ab"), Seq(("a'", "b"))))
    intercept[IllegalArgumentException](
      encode(Seq("ab"), Seq.empty))
  }

  test("docTokenCounts: per-doc sums under learned merges, tokenless docs dropped") {
    // merges (l,o),(lo,w): low=2 tokens, lower=4, widest=7 (see the
    // learn-order test); doc 1 = low lower low -> 2+4+2 = 8;
    // doc 2 = widest low -> 7+2 = 9; doc 3 has no pattern words -> no row
    val docs = Seq((1L, "low lower low"), (2L, "widest low"), (3L, "!!! ???"))
      .toDF("doc_id", "text")
    val out = BpeTrain.docTokenCounts(docs, "doc_id", "text",
        Seq(("l", "o"), ("lo", "w")))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 8L), (2L, 9L)))
  }

  test("corpus token budget: sum of doc counts equals sum of f x n_tokens over the vocab") {
    // the accounting identity a mixture recipe relies on, on real docs
    val docs = Tables.documents(spark, sf("0.001"))
    val merges = BpeTrain.merges(docs, "text", 4)
      .orderBy("step").collect()
      .map { r => val Array(l, rt) = r.getString(1).split(" ", 2); (l, rt) }.toSeq
    val vocabBudget = BpeTrain.encodeVocab(docs, "text", merges)
      .selectExpr("CAST(sum(f * n_tokens) AS LONG) AS b").collect()(0).getLong(0)
    val docBudget = BpeTrain.docTokenCounts(docs, "doc_id", "text", merges)
      .selectExpr("CAST(sum(doc_tokens) AS LONG) AS b").collect()(0).getLong(0)
    assert(vocabBudget == docBudget && vocabBudget > 0L,
      s"vocab-grain budget $vocabBudget != doc-grain budget $docBudget")
  }

  // ----------------------- batched trainer (q150) -----------------------

  private def trainBatched(texts: Seq[String], rounds: Int, b: Int) =
    BpeTrain.mergesBatched(texts.toDF("text"), "text", rounds, b)
      .orderBy("round", "sel").collect()
      .map(r => (r.getString(2), r.getLong(4))) // (pair, pair_count)

  test("batched B=1 is definitionally the sequential trainer") {
    val corpus = Seq("low low low lower lower widest newest newest")
    val seq4 = train(corpus, 4).map(t => (t._2, t._4)).toSeq
    assert(trainBatched(corpus, 4, 1).toSeq == seq4)
  }

  test("batched == sequential when the top-B pairs are symbol-disjoint") {
    // (a,b) count 100 and (c,d) count 90 share no symbol; the third
    // symbol differs per word so no marker/suffix pair reaches 90, and
    // the pairs merging (a,b) creates ((ab,x) 60, (ab,y) 40) stay below
    // (c,d) — the regime where one batched round of 2 IS two sequential
    // steps, stale counts included
    val corpus = Seq(
      Seq.fill(60)("abx").mkString(" "), Seq.fill(40)("aby").mkString(" "),
      Seq.fill(50)("cdp").mkString(" "), Seq.fill(40)("cdq").mkString(" "))
    val seq2 = train(corpus, 2).map(t => (t._2, t._4)).toSeq
    assert(seq2 == Seq(("a b", 100L), ("c d", 90L)))
    assert(trainBatched(corpus, 1, 2).toSeq == seq2)
  }

  test("batched greedy skips symbol-conflicting candidates") {
    // only pairs are (a,b) and (b,</w>), tied at 20 -> rank order
    // "a b" < "b </w>"; the second conflicts on b, so a round of B=2
    // learns just one merge
    val out = trainBatched(Seq(Seq.fill(20)("ab").mkString(" ")), 1, 2)
    assert(out.toSeq == Seq(("a b", 20L)))
  }

  test("batched pair_count is the round-start count") {
    // batch {(a,b),(c,d)}: (c,d)'s recorded count must be the pre-round
    // 90 even though 60+40 (ab,*) pairs exist after (a,b) applies
    val corpus = Seq(
      Seq.fill(60)("abx").mkString(" "), Seq.fill(40)("aby").mkString(" "),
      Seq.fill(50)("cdp").mkString(" "), Seq.fill(40)("cdq").mkString(" "))
    val out = BpeTrain.mergesBatched(corpus.toDF("text"), "text", 1, 2)
      .orderBy("round", "sel").collect()
    assert(out.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 1), (1, 2)))
    assert(out(1).getString(2) == "c d" && out(1).getLong(4) == 90L)
  }

  test("batched guards") {
    intercept[IllegalArgumentException](
      BpeTrain.mergesBatched(Seq("x").toDF("text"), "text", 0, 2))
    intercept[IllegalArgumentException](
      BpeTrain.mergesBatched(Seq("x").toDF("text"), "text", 2, 0))
  }

  // ---------------------- byte-level trainer (q151) ----------------------

  test("byte pre-tokenizer splits on the pinned GPT-2 classes") {
    // contraction arm, space-prefixed letter run, punct run (the hyphen
    // alone — letters restart a new arm), digit run
    val out = BpeTrain.byteEncodeVocab(
        Seq("it's low-cost 123").toDF("text"), "text", Seq(("61", "61")))
      .select("pretok").collect().map(_.getString(0)).sorted
    assert(out.toSeq == Seq(" 123", " low", "'s", "-", "cost", "it").sorted)
  }

  test("byteMerges learns hex-pair merges weighted by pre-token frequency") {
    // "aa aa": pre-tokens "aa" and " aa" -> (61,61) occurs in both (2)
    // beats (20,61) (1)
    val out = BpeTrain.byteMerges(Seq("aa aa").toDF("text"), "text", 1)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(1) == "61 61" && r.getString(2) == "6161" &&
      r.getLong(3) == 2L)
  }

  test("byte tokens reconcatenate to the pre-token's UTF-8 hex") {
    val docs = Seq("it's low-cost low lower 123").toDF("text")
    val learned = BpeTrain.byteMerges(docs, "text", 4)
      .orderBy("step").collect()
      .map { r => val Array(l, rt) = r.getString(1).split(" ", 2); (l, rt) }.toSeq
    BpeTrain.byteEncodeVocab(docs, "text", learned).collect().foreach { r =>
      val hexOf = r.getString(0).getBytes("UTF-8").map("%02x".format(_)).mkString
      assert(r.getString(3).split("\\|").mkString == hexOf)
      assert(r.getString(3).split("\\|").length == r.getInt(2))
    }
  }

  test("byte-grain corpus token budget: doc sums equal vocab f x n_tokens") {
    // the q140-style accounting identity at BYTE grain, on real docs
    val docs = Tables.documents(spark, sf("0.001"))
    val merges = BpeTrain.byteMerges(docs, "text", 4)
      .orderBy("step").collect()
      .map { r => val Array(l, rt) = r.getString(1).split(" ", 2); (l, rt) }.toSeq
    val vocabBudget = BpeTrain.byteEncodeVocab(docs, "text", merges)
      .selectExpr("CAST(sum(f * n_tokens) AS LONG) AS b").collect()(0).getLong(0)
    val docBudget = BpeTrain.byteDocTokenCounts(docs, "doc_id", "text", merges)
      .selectExpr("CAST(sum(doc_tokens) AS LONG) AS b").collect()(0).getLong(0)
    assert(vocabBudget == docBudget && vocabBudget > 0L,
      s"byte vocab-grain budget $vocabBudget != doc-grain budget $docBudget")
  }
}
