package graft

import graft.operators.dedup.{DupClusters, MinHashLSH, NGramJaccard, SimHash}

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

  test("NGramJaccard: document-frequency cap suppresses stop-shingle bucket blowup") {
    import spark.implicits._
    // pathological corpus: every doc shares ONE boilerplate 3-gram ("all
    // docs share"); the rest of each doc is unique. Uncapped, that single
    // shingle's inverted-index bucket joins all-pairs (n²); capped, the
    // stop-shingle leaves the feature universe and no pairs remain.
    val n = 12
    val docs = (1 to n)
      .map(i => (i.toLong, s"all docs share this but tail$i is unique$i"))
      .toDF("doc_id", "text")
    val uncapped = NGramJaccard.pairs(docs, "doc_id", "text",
      threshold = 0.01, maxShingleDocFreq = Long.MaxValue)
    assert(uncapped.count() == n * (n - 1) / 2,
      "every pair shares the boilerplate shingles without a cap")
    val capped = NGramJaccard.pairs(docs, "doc_id", "text",
      threshold = 0.01, maxShingleDocFreq = n - 1L)
    assert(capped.count() == 0, "capped stop-shingles generate no candidates")
    // a sub-cap shared shingle still pairs: exact Jaccard over the filtered
    // universe, sizes counted post-cap
    val twoShared = docs.unionByName(
      Seq((100L, "rare shared tail only here x"),
          (101L, "rare shared tail only here y")).toDF("doc_id", "text"))
    val kept = NGramJaccard.pairs(twoShared, "doc_id", "text",
        threshold = 0.01, maxShingleDocFreq = n - 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == Set((100L, 101L)), s"sub-cap shingles must survive: $kept")
  }

  test("MinHashLSH: oversized band buckets are dropped from candidate generation") {
    import spark.implicits._
    // identical texts collide in EVERY band → one bucket of size n per band
    val n = 10
    val clones = (1 to n).map(i => (i.toLong, "same exact boilerplate text every time"))
      .toDF("doc_id", "text")
    val uncapped = MinHashLSH.candidatePairs(clones, "doc_id", "text",
      maxBucketSize = Long.MaxValue)
    assert(uncapped.count() == n * (n - 1) / 2)
    val capped = MinHashLSH.candidatePairs(clones, "doc_id", "text",
      maxBucketSize = n - 1L)
    assert(capped.count() == 0, "degenerate buckets must not fan out")
  }

  test("DupClusters: transitive pairs merge into one cluster with min-id survivor") {
    import spark.implicits._
    // components: {1,2,3,4} via chain 1-2, 2-3, 3-4; {10,11}; 20-21-22 star
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (21L, 20L), (22L, 20L)).toDF("doc_a", "doc_b")
    val out = DupClusters.components(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      1L -> (1L, 4L), 2L -> (1L, 4L), 3L -> (1L, 4L), 4L -> (1L, 4L),
      10L -> (10L, 2L), 11L -> (10L, 2L),
      20L -> (20L, 3L), 21L -> (20L, 3L), 22L -> (20L, 3L)))
  }

  test("DupClusters: long path converges (diameter rounds) and maxIter guards") {
    import spark.implicits._
    val n = 12
    val path = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    val out = DupClusters.components(path, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == n && out.values.forall(_ == 1L))
    intercept[IllegalArgumentException] {
      DupClusters.components(path, "doc_a", "doc_b", maxIter = 2)
    }
  }

  test("DupClusters.componentsAlternating: equivalent to plain propagation on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // include a self-loop-only node (99): both variants must keep it as a
    // singleton cluster rather than dropping it with the self-loop edge
    val pairs = ((1 to 150).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b } :+ (99L, 99L))
      .toDF("doc_a", "doc_b")
    val plain = DupClusters.components(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val alt = DupClusters.componentsAlternating(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(alt === plain)
  }

  test("DupClusters: both variants agree on null-id pairs (non-null side survives as singleton)") {
    import spark.implicits._
    // edges touching a null carry no identity: (7,null) must leave 7 a
    // singleton; (null,null) contributes nothing; real edges still merge
    val pairs = Seq[(Option[Long], Option[Long])](
      (Some(1L), Some(2L)), (Some(2L), Some(3L)),
      (Some(7L), None), (None, Some(8L)), (None, None))
      .toDF("doc_a", "doc_b")
    val plain = DupClusters.components(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val alt = DupClusters.componentsAlternating(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(alt === plain)
    assert(plain === Map(
      1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L),
      7L -> (7L, 1L), 8L -> (8L, 1L)))
  }

  test("DupClusters.componentsAlternating: a 64-node path converges in log rounds, not diameter") {
    import spark.implicits._
    val n = 64
    val path = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("doc_a", "doc_b")
    // plain propagation would need 63 rounds; succeeding under maxIter=12
    // IS the O(log n) evidence (the guard raises otherwise)
    val out = DupClusters.componentsAlternating(path, "doc_a", "doc_b", maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == n && out.values.forall(_ == 1L))
  }

  test("DupClusters pre-contraction: cross-partition chains keep the exact fixpoint") {
    import spark.implicits._
    // a 40-node path round-robin-scattered over 16 partitions —
    // adversarial for the partition-local union-find (adjacent edges
    // rarely co-locate, so most merging is left to the global rounds,
    // still within components' diameter budget); the fixpoint must be
    // bit-identical to the uncontracted semantics on BOTH variants
    val pairs = spark.range(39)
      .selectExpr("id AS doc_a", "id + 1 AS doc_b")
      .repartition(16)
    val plain = DupClusters.components(pairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(plain.size == 40 && plain.forall { case (_, rep, sz) =>
      rep == 0L && sz == 40L })
    val alt = DupClusters.componentsAlternating(pairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(alt == plain)
  }

  test("DupClusters pre-contraction: string-keyed pairs contract correctly") {
    import spark.implicits._
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("doc_a", "doc_b")
    val out = DupClusters.components(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out == Map(
      "a" -> ("a", 3L), "b" -> ("a", 3L), "c" -> ("a", 3L),
      "x" -> ("x", 2L), "y" -> ("x", 2L)))
  }

  test("DupClusters: empty pair list yields no clusters") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(DupClusters.components(empty, "doc_a", "doc_b").count() == 0)
  }

  test("DedupPipeline: planted near-dups collapse; survivors are fixpoints; coverage is total") {
    import graft.operators.dedup.DedupPipeline
    val docs = Tables.documents(spark, sf("0.001"))
    val out = DedupPipeline.dedupe(docs, "doc_id", "text", threshold = 0.4).cache()
    try {
      assert(out.count() === docs.count(), "every doc gets a row")
      val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // survivor of a survivor is itself (representatives are fixpoints)
      m.values.foreach(s => assert(m(s) == s, s"survivor $s maps to ${m(s)}"))
      val nClusters = m.values.toSet.size
      assert(nClusters < m.size, "the corpus has planted near-dups; some must collapse")
      // deduplicated corpus = survivors only; each lost doc points at a survivor
      out.collect().foreach { r =>
        assert(r.getBoolean(2) == (r.getLong(0) == r.getLong(1)))
      }
    } finally out.unpersist()
  }

  test("q53 repetition: duplicated spans raise the dup-ngram ratio; unique text scores 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // all 3-grams unique
      (2L, "spam spam spam spam spam spam spam"),  // one repeated 3-gram
      (3L, "hi"))                                   // <3 tokens: whole-text shingle
      .toDF("doc_id", "text")
    val hs = docs.select(col("doc_id"),
      graft.operators.dedup.TextShingles.shingleHashesAll(col("text")).as("hs"))
      .select(col("doc_id"), size(col("hs")).as("n"),
        size(array_distinct(col("hs"))).as("nd"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(hs(1L) == (4, 4), "6 tokens -> 4 ordered 3-grams, all distinct")
    assert(hs(2L) == (5, 1), "7 identical tokens -> 5 copies of one 3-gram")
    assert(hs(3L) == (1, 1))
  }

  test("q54 tf-idf: corpus-unique terms outrank ubiquitous ones") {
    // on the real corpus: for every doc, the top-ranked term's score must be
    // >= any other term's score in that doc (window ordering is correct)
    val out = graft.queries.TextQueries.q54TfIdf(spark, sf("0.001"))
    import org.apache.spark.sql.functions._
    val bad = out.groupBy("doc_id")
      .agg(max(when(col("rank") === 1, col("score"))).as("top"),
        max(col("score")).as("mx"))
      .filter(col("top") < col("mx")).count()
    assert(bad == 0)
    assert(out.filter(col("rank") > 3).count() == 0)
  }

  test("WinnowDedup: overlapping docs cluster transitively; unrelated docs stay out") {
    import spark.implicits._
    import graft.operators.dedup.WinnowDedup
    // A≈B (shared prefix), B≈C (shared suffix), D unrelated: winnowing must
    // close A-B-C into ONE cluster (rep = min id) even though A and C share
    // nothing directly — the fingerprint→pairs→CC composition under test
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the old river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog while boats drift along slowly here"),
      (3L, "completely different opening words now while boats drift along slowly here"),
      (4L, "unrelated text about spark catalyst optimizer rules and physical plans"))
      .toDF("doc_id", "text")
    val out = WinnowDedup.clusters(docs, "doc_id", "text",
        window = 2, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byNode = out.map(t => t._1 -> t._2).toMap
    assert(byNode.get(1L).contains(1L) && byNode.get(2L).contains(1L) &&
      byNode.get(3L).contains(1L),
      s"A-B-C must close into one cluster with rep 1, got ${out.mkString(",")}")
    assert(!byNode.contains(4L), "unrelated doc must not be materialized")
    assert(out.forall(_._3 == 3L), s"cluster size must be 3, got ${out.mkString(",")}")
  }

  test("WinnowDedup: doc-frequency cap suppresses boilerplate-window blowup") {
    import spark.implicits._
    import graft.operators.dedup.WinnowDedup
    // every doc shares one boilerplate run; with the cap at n-1 the shared
    // fingerprints leave the index and nothing pairs
    val n = 10
    val docs = (1 to n)
      .map(i => (i.toLong, s"all docs share this long boilerplate run tail$i unique$i trailer$i"))
      .toDF("doc_id", "text")
    val capped = WinnowDedup.clusters(docs, "doc_id", "text",
      window = 2, minShared = 1, maxDocFreq = n - 1L)
    assert(capped.count() == 0, "capped boilerplate generates no clusters")
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

  test("LineDedup: per-doc first occurrence, boilerplate threshold, empty docs drop") {
    import spark.implicits._
    import graft.operators.dedup.LineDedup
    // "nav" is boilerplate (3 of 4 docs); "dup" repeats inside doc 1;
    // doc 4 is all-boilerplate and must vanish from the output
    val docs = Seq(
      (1L, Seq("nav", "alpha", "dup", "beta", "dup")),
      (2L, Seq("nav", "gamma")),
      (3L, Seq("delta", "alpha")),
      (4L, Seq("nav"))
    ).toDF("doc_id", "lines")
    val out = LineDedup.clean(docs, "doc_id", "lines", maxDocFreq = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: dup deduped to first position, nav dropped (df=3 > 2),
    // ORDER preserved: alpha(2) dup(3) beta(4)
    assert(out(1L) == (("alpha\ndup\nbeta", 5L, 3L)), s"got ${out(1L)}")
    assert(out(2L) == (("gamma", 2L, 1L)))
    // alpha appears in 2 docs = at the threshold -> kept
    assert(out(3L) == (("delta\nalpha", 2L, 2L)))
    assert(!out.contains(4L), "all-boilerplate doc must drop")
    // permille wrapper: 1000 permille keeps everything except in-doc dups
    val all = LineDedup.cleanRelative(docs, "doc_id", "lines", 1000)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all(1L) == "nav\nalpha\ndup\nbeta")
    assert(all(4L) == "nav")
  }
}
