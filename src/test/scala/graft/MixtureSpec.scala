package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Mixture

/** Contracts of the grouped two-phase prefix sum beyond q142's oracle
  * gate: bit-equivalence to the window formulation under heavy skew and
  * many partitions, source contiguity across partition boundaries, the
  * null conventions, and the kept-whole overshoot bound.
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("grouped prefix sum equals the window formulation under skew") {
    // one hot source with 10k rows, many singleton sources; ids shuffled
    // across input partitions so ranges must reassemble source runs
    val rows = (1L to 10000L).map(i => (i, "hot", (i % 7) + 1)) ++
      (10001L to 10200L).map(i => (i, s"s${i % 97}", (i % 5) + 1))
    val df = spark.createDataset(rows).toDF("id", "src", "tok")
      .repartition(16)
    val got = Mixture.groupedPrefixSum(df, "id", "src", "tok", partitions = 13)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val w = Window.partitionBy("src").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("c", sum(col("tok").cast("long")).over(w))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got == want)
  }

  test("null sources are excluded; null token counts draw zero") {
    val df = Seq((1L, Option("a"), Option(5L)), (2L, None, Option(9L)),
        (3L, Option("a"), None), (4L, Option("a"), Option(2L)))
      .toDF("id", "src", "tok")
    val out = Mixture.groupedPrefixSum(df, "id", "src", "tok")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 5L), (3L, 5L), (4L, 7L)))
  }

  test("quota cut keeps docs whole: start-offset rule, overshoot bounded by one doc") {
    // source a: toks 4,4,4 with quota 10 -> cum 4,8,12; starts 0,4,8 all
    // < 10 -> ALL kept (12 > quota: the documented kept-whole overshoot);
    // source b: toks 7,7 -> starts 0,7 -> both kept; third start 14 cut
    val df = Seq((1L, "a", 4L), (2L, "a", 4L), (3L, "a", 4L),
        (10L, "b", 7L), (11L, "b", 7L), (12L, "b", 7L))
      .toDF("id", "src", "tok")
    val kept = Mixture.materializeByQuota(df, "id", "src", "tok", 10L)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 10L, 11L))
    // per-source overshoot is at most the last kept doc's size
    val cums = Mixture.materializeByQuota(df, "id", "src", "tok", 10L)
      .groupBy("src").agg(max("src_cum").as("m")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(cums("a") == 12L && cums("b") == 14L)
  }

  test("weighted quotas: integer DIV split, unlisted sources excluded") {
    // budget 12, weights a:2 b:1 c:1 -> quotas 6/3/3; d unlisted -> dropped
    val df = Seq((1L, "a", 4L), (2L, "a", 4L), (3L, "a", 4L),
        (10L, "b", 2L), (11L, "b", 2L), (12L, "b", 2L),
        (20L, "c", 5L), (30L, "d", 1L))
      .toDF("id", "src", "tok")
    val kept = Mixture.materializeByWeights(df, "id", "src", "tok",
        budget = 12L, weights = Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
      .collect().map(_.getLong(1)).toSet
    // a (quota 6): starts 0,4,8 -> 1,2 kept; b (3): starts 0,2,4 -> 10,11
    // kept; c (3): start 0 -> 20 kept whole (size 5 > quota: kept-whole);
    // d: unlisted, dropped
    assert(kept == Set(1L, 2L, 10L, 11L, 20L))
  }

  test("wide-open source domain: 10^4 distinct sources stay distributed") {
    // the open-set case capPerSource exists for: offsets must come from
    // the per-source window over the totals frame, never a driver
    // collect/re-parallelize (which at P x |domain| would OOM at scale)
    val rows = (1L to 20000L).map(i => (i, s"src${i % 10000}", (i % 3) + 1))
    val df = spark.createDataset(rows).toDF("id", "src", "tok").repartition(8)
    val out = Mixture.groupedPrefixSum(df, "id", "src", "tok", partitions = 7)
    // the distributed-offset marker: a src-partitioned Window feeds the
    // offsets join; the old driver path showed a parallelized ExistingRDD
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a window-offset plan:\n$plan")
    assert(!plan.contains("Scan ExistingRDD"),
      s"driver-materialized offsets crept back in:\n$plan")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val w = Window.partitionBy("src").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("c", sum(col("tok").cast("long")).over(w))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got == want)
  }

  test("non-long-castable id fails loudly, not a silent null reorder") {
    val df = Seq(("doc-a", "a", 4L)).toDF("id", "src", "tok")
    val e = intercept[Exception](
      Mixture.groupedPrefixSum(df, "id", "src", "tok").collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("long-castable")), e.toString)
  }

  test("guards") {
    val df = Seq((1L, "a", 4L)).toDF("id", "src", "tok")
    intercept[IllegalArgumentException](
      Mixture.materializeByQuota(df, "id", "src", "tok", 0L))
    intercept[IllegalArgumentException](
      Mixture.materializeByWeights(df, "id", "src", "tok", 0L, Map("a" -> 1L)))
    intercept[IllegalArgumentException](
      Mixture.materializeByWeights(df, "id", "src", "tok", 10L, Map.empty))
    intercept[IllegalArgumentException](
      Mixture.materializeByWeights(df, "id", "src", "tok", 10L, Map("a" -> -1L)))
  }
}
