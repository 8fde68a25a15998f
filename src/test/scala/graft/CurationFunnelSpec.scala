package graft

import org.apache.spark.sql.functions._

import graft.functions.QualityRules
import graft.pipelines.CurationFunnel

class CurationFunnelSpec extends SparkSpec {
  import spark.implicits._

  // lenient thresholds sized to a hand corpus (the knob exists for
  // exactly this — q127 ships the paper defaults)
  private val Th = QualityRules.Thresholds(minWords = 5, minStops = 1)

  private val prose =
    "the quick fox and the lazy dog have fun with the old tree"
  private val deProse =
    "und der hund mit have the to of and that fox baum spielt gern dort"

  private def corpus = Seq(
    (1L, null.asInstanceOf[String], "en"),        // invalid: null text
    (2L, "   ", "en"),                            // invalid: empty norm
    (3L, prose, "en"),                            // dup group -> survivor
    (4L, prose, "en"),                            // dup group -> exact_dedup
    (5L, "zzz qqq xxx wwq yyq zaz", "en"),        // rules: zero stop words
    (6L, "the fox and the dog have fun with trees", "en"),
    (7L, deProse, "de"),
    (8L, "the old tree and the quick dog have fun too", "en"))
    .toDF("doc_id", "text", "lang")

  private def run(keepPct: Int) =
    CurationFunnel.stages(corpus, "doc_id", "text",
      col("lang") === "en", col("lang").isNotNull && col("lang") =!= "en",
      Th, keepPct)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("every doc attributed exactly once; hand-pinned early stages") {
    val out = run(100)
    assert(out.size == 8, "one attribution row per non-null-id doc")
    assert(out(1L) == "invalid" && out(2L) == "invalid")
    assert(out(4L) == "exact_dedup", "later duplicate falls at dedup")
    assert(out(3L) != "exact_dedup", "min-id survivor passes dedup")
    assert(out(5L) == "rules", "stopword-free doc falls at rules")
  }

  test("first failure wins: a duplicate that would also fail rules is exact_dedup") {
    val dupAndBad = corpus.union(Seq(
      (9L, "zzz qqq xxx wwq yyq zaz", "en")).toDF("doc_id", "text", "lang"))
    val out = CurationFunnel.stages(dupAndBad, "doc_id", "text",
      col("lang") === "en", col("lang").isNotNull && col("lang") =!= "en",
      Th, 100)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 9 duplicates 5's text; 5 is the min-id survivor and falls at
    // rules, 9 falls EARLIER, at dedup — stage order, not rule severity
    assert(out(9L) == "exact_dedup")
    assert(out(5L) == "rules")
  }

  test("report rollup equals the stage partition") {
    val stages = run(60)
    val report = CurationFunnel.report(corpus, "doc_id", "text",
      col("lang") === "en", col("lang").isNotNull && col("lang") =!= "en",
      Th, 60)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = stages.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(report == expected)
    assert(report.values.sum == 8)
  }

  test("the LM cut bites between rules and classifier") {
    val lenient = run(100)
    val strict = run(34) // keep top ~1/3 of the LM-scored survivors
    // docs that were kept or classifier-judged under keepPct=100 can
    // only move to 'lm' under the stricter cut — never backwards
    strict.foreach { case (id, s) =>
      val before = lenient(id)
      if (s == "lm")
        assert(before == "kept" || before == "classifier",
          s"doc $id moved to lm from '$before'")
      else assert(s == before, s"doc $id changed $before -> $s without an lm cut")
    }
    assert(strict.values.count(_ == "lm") > 0, "the strict cut must bite")
  }

  test("classifier stage = raw-corpus fit applied frozen to the LM survivors") {
    val out = run(100)
    // replicate the chain by hand: dedup survivors -> rules pass ->
    // (keepPct=100 LM keeps all scored) -> frozen raw-fit NB over them
    val s2Ids = Seq(3L, 6L, 7L, 8L)
    val s3 = corpus.filter(col("doc_id").isin(s2Ids: _*))
    val model = graft.operators.NbClassifier.fit(corpus, "doc_id", "text",
      col("lang") === "en", col("lang").isNotNull && col("lang") =!= "en")
    val nbKept = graft.operators.NbClassifier
      .scoreWith(model, s3, "doc_id", "text")
      .filter(col("pred")).select("doc_id").as[Long].collect().toSet
    s2Ids.foreach { id =>
      val expected = if (nbKept(id)) "kept" else "classifier"
      assert(out(id) == expected, s"doc $id: ${out(id)} != $expected")
    }
    assert(out(7L) == "classifier",
      "the de doc must fall at the classifier under the raw reference-vs-crawl fit")
  }

  // --- pluggable stages (round 18) --------------------------------------

  test("stagesOf(standardStages) is identical to the fixed chain") {
    val viaList = CurationFunnel.stagesOf(corpus, "doc_id", "text",
      CurationFunnel.standardStages("doc_id", "text",
        col("lang") === "en", col("lang").isNotNull && col("lang") =!= "en",
        Th, 60))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaList == run(60))
  }

  test("a spliced decontamination stage attributes and re-trains downstream") {
    import graft.pipelines.FunnelStage
    // doc 6 quotes a 5-word phrase of the 'bench' doc 20 verbatim; the
    // spliced stage must catch it AFTER rules and BEFORE lm
    val benchPhrase = "the fox and the dog have fun with trees"
    val docs = corpus.union(Seq(
      (20L, benchPhrase + " at the bench", "bench")).toDF("doc_id", "text", "lang"))
    val std = CurationFunnel.standardStages("doc_id", "text",
      col("lang") === "en", col("lang").isNotNull && col("lang") =!= "en",
      Th, 100)
    val decon = FunnelStage("decontaminated", (surv, raw) =>
      graft.operators.dedup.Decontaminate.flag(surv,
        raw.filter(col("lang") === "bench"), "doc_id", "text", shingleN = 5)
        .filter(!col("contaminated")).select(col("doc_id")))
    val chain = std.take(2) ++ Seq(decon) ++ std.drop(2)
    val out = CurationFunnel.stagesOf(docs, "doc_id", "text", chain)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(6L) == "decontaminated",
      s"the quoting doc must fall at the spliced stage, got ${out(6L)}")
    assert(out(20L) == "decontaminated",
      "the bench doc itself trivially shares its own shingles")
    // earlier stages keep priority over the splice
    assert(out(4L) == "exact_dedup" && out(5L) == "rules")
    // clean docs flow through to the downstream stages untouched
    assert(Set("lm", "classifier", "kept").contains(out(3L)))
  }

  test("a spliced PII stage drops saturated docs, keeps light hits, respects order") {
    // doc 6 gains 4 PII spans (saturated at maxPii=2), doc 8 one email
    // (light — kept); doc 4 stays an exact dup of 3 so the splice must
    // not outrank exact_dedup
    val pii = " call (555) 123-4567 or +1 555-123-4567 id 123-45-6789 host 10.0.0.1"
    val docs = corpus.withColumn("text",
      when(col("doc_id") === 6, concat(col("text"), lit(pii)))
        .when(col("doc_id") === 8,
          concat(col("text"), lit(" contact user8@example.com")))
        .otherwise(col("text")))
    val std = CurationFunnel.standardStages("doc_id", "text",
      col("lang") === "en", col("lang").isNotNull && col("lang") =!= "en",
      Th, 100)
    val chain = std.take(1) ++
      Seq(CurationFunnel.piiStage("doc_id", "text", maxPii = 2)) ++
      std.drop(1)
    val out = CurationFunnel.stagesOf(docs, "doc_id", "text", chain)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(6L) == "pii", s"4 spans > 2 must drop at pii, got ${out(6L)}")
    assert(out(4L) == "exact_dedup", "the splice must not outrank dedup")
    assert(!Set("pii").contains(out(8L)) && out(8L) != "invalid",
      s"one email is under the threshold, got ${out(8L)}")
    assert(out(5L) == "rules", "downstream stages still attribute")
  }

  test("piiStage rejects a negative threshold loudly") {
    intercept[IllegalArgumentException] {
      CurationFunnel.piiStage("doc_id", "text", maxPii = -1)
    }
  }

  test("stage-name collisions and reserved labels fail loudly") {
    import graft.pipelines.FunnelStage
    val noop = FunnelStage("x", (s, _) => s.select(col("doc_id")))
    intercept[IllegalArgumentException] {
      CurationFunnel.stagesOf(corpus, "doc_id", "text", Seq(noop, noop))
    }
    intercept[IllegalArgumentException] {
      CurationFunnel.stagesOf(corpus, "doc_id", "text",
        Seq(FunnelStage("invalid", (s, _) => s.select(col("doc_id")))))
    }
  }
}
