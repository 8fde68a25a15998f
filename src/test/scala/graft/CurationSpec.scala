package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Sampling

/** Training-data curation operators (SURVEY §2: split/sample, redaction,
  * unit vectors).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("deterministicSplit: stable across runs, roughly the asked proportion, no stragglers") {
    val docs = Tables.documents(spark, sf("0.001"))
    val a = Sampling.deterministicSplit(docs, "doc_id", 90)
      .select("doc_id", "split_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.deterministicSplit(docs, "doc_id", 90)
      .select("doc_id", "split_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "assignment must be identical run to run")
    val trainFrac = a.values.count(_ == "train").toDouble / a.size
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train fraction off: $trainFrac")
    // a sample is a subset with roughly 1/rate the rows
    val sampled = Sampling.deterministicSample(docs, "doc_id", rate = 10).count()
    assert(sampled > 0 && sampled < docs.count() / 4)
  }

  test("redact replaces emails and urls with tokens; counts audit the spans") {
    val df = Seq(
      (1L, "write to a.b+c@mail.example.org or see https://x.example/path?q=1 now"),
      (2L, "no contacts here"),
      (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val out = df.select(col("id"), TextFns.redact(col("t")).as("r"),
        TextFns.emailCount(col("t")).as("e"), TextFns.urlCount(col("t")).as("u"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getInt(2), r.getInt(3))).toMap
    assert(out(1) == (Some("write to <EMAIL> or see <URL> now"), 1, 1))
    assert(out(2) == (Some("no contacts here"), 0, 0))
    assert(out(3) == (None, 0, 0), "null text stays null; counts read 0")
  }

  test("piiRedact scrubs each family to its own token; families never cross-fire") {
    val df = Seq(
      (1L, "dial (555) 123-4567 or +1 555-123-4567 today"),
      (2L, "ssn 123-45-6789 on host 10.0.0.1 port 80"),
      (3L, "mail x@y.example please"),
      (4L, "version 1.2 build 3-4-5 is fine"), // shapes NEAR the patterns
      (5L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val out = df.select(col("id"), TextFns.piiRedact(col("t")).as("r"),
        TextFns.phoneCount(col("t")).as("p"), TextFns.idNumCount(col("t")).as("s"),
        TextFns.ipCount(col("t")).as("i"), TextFns.emailCount(col("t")).as("e"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getInt(2), r.getInt(3), r.getInt(4),
          r.getInt(5))).toMap
    assert(out(1) == (Some("dial <PHONE> or <PHONE> today"), 2, 0, 0, 0))
    assert(out(2) == (Some("ssn <ID> on host <IP> port 80"), 0, 1, 1, 0))
    assert(out(3) == (Some("mail <EMAIL> please"), 0, 0, 0, 1))
    assert(out(4) == (Some("version 1.2 build 3-4-5 is fine"), 0, 0, 0, 0),
      "near-miss shapes must not redact")
    assert(out(5) == (None, 0, 0, 0, 0), "null stays null; counts read 0")
  }

  test("packing: start-offset assignment — boundary-crossing docs overflow their pack") {
    import graft.operators.Packing
    val docs = Seq((1L, 200), (2L, 200), (3L, 900), (4L, 50), (5L, 450))
      .toDF("doc_id", "n_tokens")
    // single bucket so the fill order is just doc_id order.
    // Start offsets: 0, 200, 400, 1300, 1350. The 900-token doc STARTS in
    // pack 0, so pack 0 overflows to 1300 tokens and pack 1 stays empty —
    // the documented overflow-tolerant contract (capacity-strict packing
    // would need sequential per-bucket state).
    val packed = Packing.byTokenBudget(docs, "doc_id", "n_tokens",
        budget = 500L, buckets = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(packed == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 2L, 5L -> 2L))
  }

  test("strict packing: packs close at the budget; oversize docs isolate") {
    import graft.operators.Packing
    val docs = Seq((1L, 200), (2L, 200), (3L, 900), (4L, 50), (5L, 450))
      .toDF("doc_id", "n_tokens")
    // same fixture as the start-offset test: 200+200 fill pack 0 (adding
    // 900 would cross 500), the 900-token doc isolates as oversize pack 1,
    // 50+450 exactly fill pack 2
    val packed = Packing.byTokenBudgetStrict(docs, "doc_id", "n_tokens",
        budget = 500L, buckets = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(packed == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 2L))
  }

  test("strict packing properties on real documents: no multi-doc pack over budget, all docs packed, deterministic") {
    import graft.operators.Packing
    val d = Tables.documents(spark, sf("0.001"))
      .select(col("doc_id"), TextFns.tokenCountWs(col("text")).as("n_tokens"))
    val budget = 500L
    val packed = Packing.byTokenBudgetStrict(d, "doc_id", "n_tokens",
      budget, buckets = 8).cache()
    try {
      // all docs packed, exactly once, pack_id always assigned
      assert(packed.count() === d.count())
      assert(packed.select("doc_id").distinct().count() === d.count())
      assert(packed.filter(col("pack_id").isNull).count() === 0)
      // every pack with >= 2 docs fits the budget; singletons may only
      // exceed it when the lone doc itself does
      val packs = packed.groupBy("pack_bucket", "pack_id")
        .agg(sum(col("n_tokens").cast("long")).as("tok"), count(lit(1)).as("n"))
      assert(packs.filter(col("n") >= 2 && col("tok") > budget).count() === 0)
      assert(packs.filter(col("n") === 1 && col("tok") > budget)
        .join(packed.filter(col("n_tokens") > budget)
            .select(col("pack_bucket"), col("pack_id")),
          Seq("pack_bucket", "pack_id"), "left_anti").count() === 0)
      // deterministic: a second run assigns identical packs
      val again = Packing.byTokenBudgetStrict(d, "doc_id", "n_tokens",
        budget, buckets = 8)
      assert(packed.select("doc_id", "pack_bucket", "pack_id")
        .except(again.select("doc_id", "pack_bucket", "pack_id")).count() === 0)
    } finally packed.unpersist()
  }

  test("stratified sampling: per-stratum rates land near target, independent across strata") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, sf("0.001")).select(col("doc_id"), col("lang"))
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 25, "zh" -> 100), defaultPct = 50)
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptBy = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptBy("zh") == totals("zh"), "pct=100 keeps every row of the stratum")
    val enRate = keptBy("en").toDouble / totals("en")
    assert(enRate > 0.10 && enRate < 0.40, s"en rate $enRate should be near 0.25")
    // determinism: rerun keeps the identical id set
    val again = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 25, "zh" -> 100), defaultPct = 50)
    assert(kept.select("doc_id").except(again.select("doc_id")).count() == 0)
    assert(again.select("doc_id").except(kept.select("doc_id")).count() == 0)
    // pct=0 strata vanish entirely
    val none = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0), defaultPct = 100)
    assert(none.filter(col("lang") === "en").count() == 0)
    // null strata are their own defaultPct segment, NOT silently dropped
    // (an un-coalesced null stratum nulls the hash and samples at 0%)
    import spark.implicits._
    val withNulls = Seq((1L, Option("en")), (2L, None), (3L, None))
      .toDF("doc_id", "lang")
    val keptNull = Sampling.stratifiedSample(withNulls, "doc_id", "lang",
      Map("en" -> 100), defaultPct = 100)
    assert(keptNull.count() == 3, "defaultPct=100 must keep null-stratum rows")
  }

  test("chunked: every token covered, overlap exact, short docs one chunk") {
    import graft.functions.TextFns
    val text = (1 to 50).map(i => s"w$i").mkString(" ")
    val out = Seq((1L, text), (2L, "tiny doc"), (3L, "   "))
      .toDF("doc_id", "text")
      .select(col("doc_id"), explode(TextFns.chunked(col("text"), 20, 5)).as("c"))
      .select(col("doc_id"), col("c.chunk_no"), col("c.chunk_text"), col("c.n_tokens"))
      .collect()
    val d1 = out.filter(_.getLong(0) == 1L).sortBy(_.getInt(1))
    // starts every 15 tokens: 0, 15, 30 — the raw start 45 falls inside
    // the final overlap zone (its window ⊂ chunk 2) and is NOT emitted
    assert(d1.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(d1.map(_.getInt(3)).toSeq == Seq(20, 20, 20))
    // overlap: chunk 1 starts at token 16 (15 tokens after chunk 0)
    assert(d1(1).getString(2).startsWith("w16 "))
    // coverage: union of chunk tokens = all 50, no suffix-duplicate chunk
    val covered = d1.flatMap(_.getString(2).split(" ")).toSet
    assert(covered == (1 to 50).map(i => s"w$i").toSet)
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getString(2) == "tiny doc" &&
      d2.head.getInt(3) == 2)
    // whitespace-only text: zero chunks, not an empty chunk of n_tokens=1
    assert(!out.exists(_.getLong(0) == 3L))
  }

  test("unit vectors have norm 1") {
    // q45 emits one row per element (driver-gateable scalars); rebuild each
    // vector's norm from the exploded rows
    val unit = queries.ExtraQueries.q45UnitVectors(spark, sf("0.001"))
    val offenders = unit
      .filter(col("idx").isNotNull) // zero-norm rows carry null elements
      .groupBy("vec_id")
      .agg(abs(sqrt(sum(col("unit_value") * col("unit_value"))) - 1.0d).as("err"))
      .filter(col("err") > 1e-12).count()
    assert(offenders == 0)
  }

  test("mixExactPerSource: exact per-source counts, deterministic, monotone in k") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, sf("0.001"))
      .select(col("doc_id"), col("source"))
    val quotas = Map("src0" -> 7L, "src1" -> 3L, "src2" -> 0L)
    val got = Sampling.mixExactPerSource(docs, "doc_id", "source", quotas)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySource = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySource == Map("src0" -> 7, "src1" -> 3), s"got $bySource")
    // deterministic: a fresh plan reproduces the identical row set
    val again = Sampling.mixExactPerSource(docs, "doc_id", "source", quotas)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(again.toSet == got.toSet)
    // monotone: growing a quota only ADDS rows (hash rank is a fixed order)
    val grown = Sampling.mixExactPerSource(docs, "doc_id", "source",
        quotas.updated("src0", 9L))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSet.subsetOf(grown.toSet))
  }

  test("temperatureMix flattens a skewed corpus toward the minority source") {
    import graft.operators.Sampling
    // 9:1 web/code skew derived from the id — the q107 shape
    val docs = Tables.documents(spark, sf("0.001"))
      .withColumn("src_class",
        when(col("doc_id") % 10 =!= 0, "web").otherwise("code"))
      .select(col("doc_id"), col("src_class"))
    val total = docs.count().toDouble
    val codeShareCorpus =
      docs.filter(col("src_class") === "code").count() / total
    val sample = Sampling.temperatureMix(docs, "doc_id", "src_class",
      totalK = 100L) // alpha = 0.5
    val n = sample.count().toDouble
    assert(n > 0 && n <= 100)
    val codeShareSample =
      sample.filter(col("src_class") === "code").count() / n
    // sqrt weighting must lift the 10% minority well above its natural
    // share (to ~25% at 9:1) without inverting the majority
    assert(codeShareSample > codeShareCorpus + 0.1,
      f"no flattening: corpus $codeShareCorpus%.2f sample $codeShareSample%.2f")
    assert(codeShareSample < 0.5)
    // alpha = 1 reproduces the natural mixture's allocation (±rounding)
    val natural = Sampling.temperatureMix(docs, "doc_id", "src_class",
      totalK = 100L, alpha = 1.0)
    val codeNatural = natural.filter(col("src_class") === "code").count()
      .toDouble / natural.count()
    assert(math.abs(codeNatural - codeShareCorpus) < 0.05,
      f"alpha=1 should track the corpus: $codeNatural%.2f vs $codeShareCorpus%.2f")
  }
}
