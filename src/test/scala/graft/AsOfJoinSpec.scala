package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("leftAsOf: at-or-before inclusive, per key, unmatched stays null") {
    val quotes = Seq(
      (1L, ts(0), 100.0), (1L, ts(10), 110.0), (1L, ts(20), 120.0),
      (2L, ts(5), 500.0))
      .toDF("sym", "qts", "px")
    val trades = Seq(
      (1L, ts(10), "exact-tie"),   // quote at SAME minute must match (inclusive)
      (1L, ts(15), "between"),     // latest prior is 10:10
      (1L, ts(25), "after-all"),   // latest prior is 10:20
      (2L, ts(4), "too-early"),    // before any quote for sym 2
      (3L, ts(30), "no-quotes"))   // key with no right rows at all
      .toDF("sym", "tts", "tag")
    val out = AsOfJoin.leftAsOf(trades, quotes, Seq("sym"), "tts", "qts")
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.doubleValue)).toMap
    assert(out == Map(
      "exact-tie" -> Some(110.0), "between" -> Some(110.0),
      "after-all" -> Some(120.0), "too-early" -> None, "no-quotes" -> None))
  }

  test("leftAsOf: null keys never match (SQL join semantics, not window-partition semantics)") {
    val right = Seq((Option(1L), ts(1), 10.0), (Option.empty[Long], ts(2), 99.0))
      .toDF("k", "rts", "v")
    val left = Seq((Option(1L), ts(5), "keyed"), (Option.empty[Long], ts(5), "nullkey"))
      .toDF("k", "lts", "tag")
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "lts", "rts")
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.doubleValue)).toMap
    assert(out == Map("keyed" -> Some(10.0), "nullkey" -> None),
      "a null-key left row must not be enriched from null-key right rows")
  }

  test("leftAsOf: null left ts passes through unenriched; null right ts is dropped") {
    val right = Seq((1L, Option(ts(5)), 1.0), (1L, Option.empty[Timestamp], 99.0))
      .toDF("k", "rts", "v")
    val left = Seq((1L, Option(ts(6)), "a"), (1L, Option.empty[Timestamp], "b"))
      .toDF("k", "lts", "tag")
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "lts", "rts")
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.doubleValue)).toMap
    assert(out == Map("a" -> Some(1.0), "b" -> None),
      "null-ts right row must never win; null-ts left row must not enrich")
  }

  test("leftAsOf: payload columns come from the SAME right row even when some are null") {
    val right = Seq((1L, ts(1), Option(10.0), Option.empty[String]),
                    (1L, ts(2), Option.empty[Double], Option("late")))
      .toDF("k", "rts", "a", "b")
    val left = Seq((1L, ts(3))).toDF("k", "lts")
    val row = AsOfJoin.leftAsOf(left, right, Seq("k"), "lts", "rts").head
    // the 10:02 row wins atomically: a=null, b="late" — NOT a=10.0 mixed in
    assert(row.getAs[Any]("asof_a") == null)
    assert(row.getAs[String]("asof_b") == "late")
  }

  test("leftAsOf agrees with the naive range-join + argmax formulation on random data") {
    // the O(n·m) reference implementation: for every left row, max right ts <= left ts
    val rnd = new scala.util.Random(42)
    val right = (1 to 300).map(_ =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(50)), rnd.nextInt(1000).toDouble))
      .distinct.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique (k, ts)
      .toDF("k", "rts", "v")
    val left = (1 to 200).map(i =>
      (rnd.nextInt(6).toLong, ts(rnd.nextInt(55)), i.toLong))
      .toDF("k", "lts", "lid")
    val fast = AsOfJoin.leftAsOf(left, right, Seq("k"), "lts", "rts")
      .select(col("lid"), col("asof_rts"), col("asof_v"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.getAs[java.lang.Double](2)))).toMap
    val naive = left.alias("l")
      .join(right.alias("r"), col("l.k") === col("r.k") && col("rts") <= col("lts"), "left")
      .groupBy(col("lid"))
      .agg(max(struct(col("rts"), col("v"))).as("m"))
      .select(col("lid"), col("m.rts"), col("m.v"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.getAs[java.lang.Double](2)))).toMap
    assert(fast === naive)
  }

  test("leftAsOf: one shuffle on the keys, no range fan-out join") {
    val right = Seq((1L, ts(1), 1.0)).toDF("k", "rts", "v")
    val left = Seq((1L, ts(2))).toDF("k", "lts")
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "lts", "rts")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"as-of must not fan out into a range join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      s"expected at most the two union-side exchanges:\n$plan")
  }
}
