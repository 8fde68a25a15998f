package graft

import org.apache.spark.sql.functions._

import graft.queries.{FeedHarness, StreamingQueries}

/** Guards for the round-12 streaming oracle gates (q108/q110/q111): the
  * boundary audits their Scaladoc claims, pinned as assertions so a driver
  * testdata regeneration that lands an expiry or session-close instant
  * exactly on a watermark fails HERE with a readable message instead of as
  * an inscrutable hash mismatch, plus the FeedHarness contract the gates
  * share.
  */
class StatefulGatesSpec extends SparkSpec {
  import spark.implicits._

  // the gates' OWN constants (StreamingQueries), not spec-local copies:
  // if cappedFeed changes, these audits change with it by definition
  private val UserCap = StreamingQueries.UserCap
  private val FeedDays = StreamingQueries.FeedDays

  private def fed(dir: String) = {
    val evAll = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("value").isNotNull && col("user_id") < UserCap)
    val minDay = evAll.agg(min(to_date(col("ts")))).head.getDate(0)
    evAll.filter(to_date(col("ts")) < date_add(lit(minDay), FeedDays))
  }

  test("q110 boundary audit: no session-close instant within 1 ms of the watermark") {
    for (s <- Seq("0.001", "0.01", "0.1")) {
      val f = fed(sf(s))
      // final watermark exactly as Spark computes it: max event time
      // floored to ms, minus the 1-day delay
      val wmUs = f.agg(max(unix_micros(col("ts")))).head.getLong(0) /
        1000 * 1000 - 86400000000L
      val sessions = graft.streaming.Sessionize.batch(f, gapSeconds = 21600L)
      val margins = sessions
        .select((unix_micros(col("session_end")) + 21600000000L - wmUs)
          .as("delta_us"))
        .agg(min(abs(col("delta_us")))).head.getLong(0)
      assert(margins > 1000L,
        s"sf$s: session-close instant within ${margins}us of the watermark " +
          "- comparison strictness could flip a q110 row; re-derive the gate")
    }
  }

  test("q108 boundary audit: no dedup-state expiry within 1 ms of a day watermark") {
    for (s <- Seq("0.001", "0.01", "0.1")) {
      val f = fed(sf(s))
      // per-key first-of-day feed rows (the q108 feed) and each day's
      // watermark; the audit is coarser than the recursive chain — it
      // checks EVERY feed ts + delay against EVERY later day watermark,
      // a superset of the instants the chain can compare
      val daily = graft.operators.Dedup.latestByKey(
          f.withColumn("__day", to_date(col("ts"))),
          Seq("user_id", "event_type", "__day"),
          Seq(col("ts").asc, col("event_id").asc))
        .select(col("__day"), unix_micros(col("ts")).as("us"))
      val wm = daily.groupBy(col("__day")).agg(max(col("us")).as("day_max"))
        .select(col("__day"),
          (expr("day_max DIV 1000") * 1000 - 86400000000L).as("wm_us"))
      val margin = daily.as("d").crossJoin(wm.as("w"))
        .filter(col("w.__day") > col("d.__day"))
        .select(abs(col("d.us") + 86400000000L - col("w.wm_us")).as("delta"))
        .agg(min(col("delta"))).head.getLong(0)
      assert(margin > 1000L,
        s"sf$s: expiry instant within ${margin}us of a watermark")
    }
  }

  test("q111 funnel twins: TWS/RocksDB and fMGWS backends agree row-for-row on the gate feed") {
    // the twin identity the q111 gate used to drive per bench shot —
    // moved here (one drive per build, not per measurement); the feed is
    // the GATE's own builder, so coverage is identical by construction
    import graft.queries.StatefulGates
    val batches = StatefulGates.q111Batches(spark, sf("0.01"))
    val stages = StatefulGates.FunnelStages
    import spark.implicits._
    val (tws, legacy) = FeedHarness.withRocksDb(spark) {
      (FeedHarness.drive(spark, "spec_funnel_tws", batches, "update") { ds =>
        graft.streaming.FunnelTws.track(ds.toDF(), stages).toDF()
      },
      FeedHarness.drive(spark, "spec_funnel_fmgws", batches, "update") { ds =>
        graft.streaming.StreamingFunnel.track(ds.toDF(), stages).toDF()
      })
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val (a, b) = (rows(tws), rows(legacy))
    assert(a == b, s"funnel backends diverged: TWS ${a.size} rows vs fMGWS ${b.size}")
    assert(a.nonEmpty, "twin check ran on an empty feed")
  }

  test("FeedHarness delivers batches in ascending order and drops the batch column") {
    val feed = Seq((2L, "b"), (0L, "z"), (1L, "m"), (0L, "a"))
      .toDF("__b", "payload")
    val batches = FeedHarness.batchesOf(feed, "__b")(_.getString(1))
    assert(batches.map(_.toSet) == Seq(Set("z", "a"), Set("m"), Set("b")))
  }

  test("q108/q110/q111 feeds are SF-invariant: capped keyspace, capped days") {
    val k01 = fed(sf("0.01")).select(col("user_id")).distinct().count()
    val k1 = fed(sf("0.1")).select(col("user_id")).distinct().count()
    assert(k01 <= UserCap && k1 <= UserCap)
    // 10x the data may not add keys beyond the cap — the driver-memory
    // bound the round-11 advisor asked for
    assert(math.abs(k01 - k1) <= 2, s"capped keyspace drifted: $k01 vs $k1")
    // the day cap bounds micro-batch count the same way on both SFs
    def days(dir: String) =
      fed(dir).select(to_date(col("ts"))).distinct().count()
    assert(days(sf("0.01")) <= FeedDays && days(sf("0.1")) <= FeedDays)
  }
}
