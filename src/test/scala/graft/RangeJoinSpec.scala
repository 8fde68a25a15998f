package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("pointInInterval: inclusive bounds, per-key isolation, left keeps outsiders") {
    val intervals = Seq(
      (1L, "s1", ts(0), ts(10)), (1L, "s2", ts(20), ts(30)),
      (2L, "s3", ts(0), ts(30)))
      .toDF("k", "iv", "lo", "hi")
    val points = Seq(
      (1L, 100L, ts(0)),   // ON the lower bound -> s1
      (1L, 101L, ts(10)),  // ON the upper bound -> s1
      (1L, 102L, ts(15)),  // in the gap -> no interval
      (1L, 103L, ts(25)),  // -> s2
      (2L, 104L, ts(25)),  // same time, other key -> s3
      (3L, 105L, ts(5)))   // key with no intervals
      .toDF("k", "pid", "ts")
    val inner = RangeJoin.pointInInterval(points, intervals,
        Seq("k"), "ts", "lo", "hi")
      .collect().map(r => r.getAs[Long]("pid") -> r.getAs[String]("iv")).toMap
    assert(inner == Map(100L -> "s1", 101L -> "s1", 103L -> "s2", 104L -> "s3"))
    val left = RangeJoin.pointInInterval(points, intervals,
        Seq("k"), "ts", "lo", "hi", joinType = "left")
      .collect().map(r => r.getAs[Long]("pid") ->
        Option(r.getAs[String]("iv"))).toMap
    assert(left(102L).isEmpty && left(105L).isEmpty && left.size == 6)
  }

  test("pointInInterval: overlapping intervals each match (one row per containing interval)") {
    val intervals = Seq((1L, "a", ts(0), ts(20)), (1L, "b", ts(10), ts(30)))
      .toDF("k", "iv", "lo", "hi")
    val points = Seq((1L, 200L, ts(15))).toDF("k", "pid", "ts")
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"), "ts", "lo", "hi")
      .collect().map(_.getAs[String]("iv")).toSet
    assert(out == Set("a", "b"))
  }

  test("pointInInterval: the equi-key reaches the join; no cartesian fan-out") {
    val intervals = Seq((1L, "a", ts(0), ts(20))).toDF("k", "iv", "lo", "hi")
    val points = Seq((1L, 300L, ts(5))).toDF("k", "pid", "ts")
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"), "ts", "lo", "hi")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"equi-conjunct must be extracted into a keyed join:\n$plan")
    assert(plan.contains("k#"), s"expected join keyed on k:\n$plan")
  }

  test("bucketedKeyless agrees with the naive cross-join formulation on random data") {
    val rnd = new scala.util.Random(7)
    val intervals = (1 to 80).map { i =>
      val lo = rnd.nextInt(1000).toDouble
      (i.toLong, lo, lo + rnd.nextInt(50) + 1)
    }.toDF("iv_id", "lo", "hi")
    val points = (1 to 300).map(i => (i.toLong, rnd.nextInt(1100).toDouble))
      .toDF("pid", "x")
    val fast = graft.operators.RangeJoin.bucketedKeyless(points, intervals,
        "x", "lo", "hi", bucketWidth = 40.0)
      .select("pid", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
        col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === naive)
    assert(fast.nonEmpty)
  }

  test("bucketedKeyless: a domain-spanning interval raises at runtime instead of replicating") {
    val intervals = Seq((1L, 0.0, 1e9)).toDF("iv_id", "lo", "hi")
    val points = Seq((1L, 5.0)).toDF("pid", "x")
    val e = intercept[Exception] {
      graft.operators.RangeJoin.bucketedKeyless(points, intervals,
        "x", "lo", "hi", bucketWidth = 10.0, maxBucketsPerInterval = 100).collect()
    }
    assert(e.getMessage.contains("buckets"), s"got: ${e.getMessage}")
  }

  test("bucketedKeyless: an inverted interval raises instead of exploding downward") {
    // sequence(lo, hi) with hi < lo would infer step -1 and replicate the
    // corrupt row through the whole lower bucket space
    val intervals = Seq((1L, 1e9, 0.0)).toDF("iv_id", "lo", "hi")
    val points = Seq((1L, 5.0)).toDF("pid", "x")
    val e = intercept[Exception] {
      graft.operators.RangeJoin.bucketedKeyless(points, intervals,
        "x", "lo", "hi", bucketWidth = 10.0).collect()
    }
    assert(e.getMessage.contains("inverted"), s"got: ${e.getMessage}")
  }

  test("pointInInterval refuses the keyless (cartesian) case and column collisions") {
    val intervals = Seq((1L, ts(0), ts(20))).toDF("k", "lo", "hi")
    val points = Seq((1L, ts(5))).toDF("k", "ts")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals, Nil, "ts", "lo", "hi")
    }
    val colliding = Seq((1L, ts(0), ts(20), "x")).toDF("k", "lo", "hi", "ts")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, colliding, Seq("k"), "ts", "lo", "hi")
    }
  }
}
