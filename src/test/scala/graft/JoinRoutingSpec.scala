package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{JoinRouting, NbClassifier, NgramLm}
import graft.operators.dedup.SemanticDedup

/** Round-18 plumbing: [[JoinRouting]]'s broadcast/shuffle auto-switch
  * (pinned at forced thresholds, knob override wins), the knownN
  * overloads (identical output, one fewer job), and
  * [[NbClassifier.fitAndScoreIds]]'s shared-tokenization contract
  * (value-identical to fit + scoreWith on the subset; the survivor
  * scoring reads the cached frame instead of re-tokenizing).
  */
class JoinRoutingSpec extends SparkSpec {
  import spark.implicits._

  private val ThresholdKey = "spark.sql.autoBroadcastJoinThreshold"

  private def withThreshold[T](v: String)(body: => T): T = {
    val old = spark.conf.get(ThresholdKey)
    spark.conf.set(ThresholdKey, v)
    try body finally spark.conf.set(ThresholdKey, old)
  }

  private def corpus = Seq(
    (1L, "the quick brown fox reads fine prose", "pos"),
    (2L, "prose reads well the fox is fine", "pos"),
    (3L, "buy cheap pills now click here now", "neg"),
    (4L, "click buy now cheap cheap pills", "neg"),
    (10L, "the fox reads prose", ""),
    (11L, "buy pills click now", ""))
    .toDF("doc_id", "text", "label")

  private def executedPlan(df: DataFrame): String = {
    df.collect() // AQE finalizes the plan only after execution
    df.queryExecution.executedPlan.toString
  }

  test("autoByRows: pinned at forced thresholds; disabled threshold routes to shuffle") {
    withThreshold("1024b") {
      assert(JoinRouting.autoByRows(spark, 1024 / JoinRouting.BytesPerCountRow))
      assert(!JoinRouting.autoByRows(spark,
        1024 / JoinRouting.BytesPerCountRow + 1))
    }
    withThreshold("-1") {
      assert(!JoinRouting.autoByRows(spark, 1), "-1 disables broadcast")
    }
  }

  test("threshold parse fails LOUDLY on an unparseable value") {
    // spark.conf.set validates this key itself in Spark 4, so the parser
    // is exercised directly — it guards values arriving through
    // UNvalidated channels (submit-time SparkConf, properties files)
    val e = intercept[IllegalArgumentException] {
      JoinRouting.parseThreshold("ten megabytes")
    }
    assert(e.getMessage.contains("ten megabytes"),
      s"the error must name the malformed value: ${e.getMessage}")
    assert(JoinRouting.parseThreshold("-1") == -1L)
    assert(JoinRouting.parseThreshold("10MB") == 10L << 20)
  }

  test("NbClassifier auto-routes with the session threshold; knob overrides") {
    def scored(knob: Option[Boolean]) = NbClassifier.score(
      corpus, "doc_id", "text",
      col("label") === "pos", col("label") === "neg", broadcastCounts = knob)
    // disabled threshold + auto: our routing picks identity AND Spark's
    // own planner cannot broadcast either — no broadcast anywhere
    val (shufflePlan, shuffleRows) = withThreshold("-1") {
      val df = scored(None)
      (executedPlan(df), df.collect().map(_.toSeq).toSet)
    }
    assert(!shufflePlan.contains("BroadcastExchange"),
      s"auto under disabled threshold must shuffle-join:\n$shufflePlan")
    // explicit override beats the threshold: the broadcast HINT is honored
    // even when autoBroadcastJoinThreshold is -1
    val (hintPlan, hintRows) = withThreshold("-1") {
      val df = scored(Some(true))
      (executedPlan(df), df.collect().map(_.toSeq).toSet)
    }
    assert(hintPlan.contains("BroadcastExchange"),
      s"Some(true) must broadcast regardless of threshold:\n$hintPlan")
    // default threshold + auto: the tiny vocab routes to broadcast
    val autoPlan = executedPlan(scored(None))
    assert(autoPlan.contains("BroadcastExchange"),
      s"auto under the default threshold must broadcast a tiny vocab:\n$autoPlan")
    // routing never moves values
    assert(shuffleRows == hintRows)
    assert(shuffleRows == scored(None).collect().map(_.toSeq).toSet)
  }

  test("NgramLm auto-routes by the token-total bound; values identical") {
    val docs = Seq(
      (1L, "a b a c a b", true), (2L, "a c b a", true),
      (3L, "z z y x w", false), (4L, "a b c a", false))
      .toDF("doc_id", "text", "tgt")
    def run(knob: Option[Boolean]) = NgramLm.score(
      docs, "doc_id", "text", col("tgt"), broadcastCounts = knob)
    val (p1, r1) = withThreshold("-1") {
      val df = run(None); (executedPlan(df), df.collect().map(_.toSeq).toSet)
    }
    assert(!p1.contains("BroadcastExchange"))
    val df2 = run(None)
    val p2 = executedPlan(df2)
    assert(p2.contains("BroadcastExchange"))
    assert(r1 == df2.collect().map(_.toSeq).toSet)
  }

  // --- knownN overloads -----------------------------------------------

  /** Count Spark jobs triggered by `body` (poll-stabilized: the listener
    * bus is async, so wait until the count stops moving).
    */
  private def countJobs(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stable < 5 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val cur = n.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      n.get()
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("knownN skips the ladder count: identical output, fewer jobs") {
    val vecs = Tables.embeddings(spark, sf("0.001")).cache()
    val exact = vecs.count() // materializes the cache too
    def run(kn: Option[Long]) = SemanticDedup.flaggedAdaptive(
      vecs, "vec_id", "embedding", 0.4, trainIters = 2, dims = 64,
      knownN = kn)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    var without: Set[(Long, Long, Boolean)] = null
    var withKn: Set[(Long, Long, Boolean)] = null
    val jWithout = countJobs { without = run(None) }
    val jWith = countJobs { withKn = run(Some(exact)) }
    assert(withKn == without, "knownN must not change the result")
    assert(jWith < jWithout,
      s"knownN must skip the count job ($jWith vs $jWithout)")
    vecs.unpersist(blocking = true)
  }

  test("knownN rejects a negative count loudly") {
    val vecs = Tables.embeddings(spark, sf("0.001"))
    val e = intercept[IllegalArgumentException] {
      SemanticDedup.flaggedAdaptive(vecs, "vec_id", "embedding", 0.4,
        trainIters = 2, dims = 64, knownN = Some(-5L))
    }
    assert(e.getMessage.contains("non-negative"))
  }

  // --- fitAndScoreIds (the q163 shared-tokenization path) ---------------

  test("fitAndScoreIds == fit + scoreWith on the id subset") {
    val ids = Seq(1L, 10L, 11L).toDF("doc_id")
    val shared = NbClassifier.fitAndScoreIds(corpus, "doc_id", "text",
      col("label") === "pos", col("label") === "neg", ids)
    val m = NbClassifier.fit(corpus, "doc_id", "text",
      col("label") === "pos", col("label") === "neg")
    val twoPass = NbClassifier.scoreWith(m,
      corpus.join(ids, Seq("doc_id"), "left_semi"), "doc_id", "text")
    assert(shared.collect().map(_.toSeq).toSet ==
      twoPass.collect().map(_.toSeq).toSet)
    assert(shared.count() == 3)
  }

  test("fitAndScoreIds scores off the cached frame — no second tokenize") {
    val ids = Seq(1L, 2L).toDF("doc_id")
    val shared = NbClassifier.fitAndScoreIds(corpus, "doc_id", "text",
      col("label") === "pos", col("label") === "neg", ids)
    shared.collect()
    // the survivor-side scan must read the InMemoryRelation built for the
    // fit; a Generate(explode) in the MAIN query tree (the cached plan
    // inside InMemoryRelation is not a child and must not count) would be
    // a re-tokenize
    import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def countGenerate(p: SparkPlan): Int = {
      val self = p match {
        case _: GenerateExec             => 1
        case a: AdaptiveSparkPlanExec    => countGenerate(a.executedPlan)
        case q: QueryStageExec           => countGenerate(q.plan)
        case _                           => 0
      }
      self + p.children.map(countGenerate).sum
    }
    val plan = shared.queryExecution.executedPlan
    assert(countGenerate(plan) == 0,
      s"survivor scoring must not re-tokenize:\n$plan")
    assert(plan.toString.contains("InMemoryTableScan") ||
      plan.toString.contains("TableCacheQueryStage"),
      s"survivor scoring must read the cached token frame:\n$plan")
  }
}
