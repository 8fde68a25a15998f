package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.streaming.{EventAggregates, Sessionize, StreamJoin}

/** Batch-equivalent entries for the streaming operators (SURVEY §2 items
  * 42-43): Structured Streaming's unified model means the identical
  * aggregation plan runs over readStream sources (see StreamingSpec for the
  * MemoryStream drive); the DuckDB oracle checks the semantics here.
  */
object StreamingQueries {

  /** q17: tumbling 1-hour windowed aggregation over events. */
  def q17WindowedEvents(spark: SparkSession, dir: String): DataFrame =
    EventAggregates.windowed(Tables.events(spark, dir))
      // aggregate exactly as decimal; emit canonical double (VERDICT r1)
      .withColumn("total_value", col("total_value").cast(DoubleType))
      // canonical naive timestamp[us] output (UTC session tz makes the ntz
      // cast value-preserving — VERDICT r2 #1)
      .withColumn("window_start", col("window_start").cast("timestamp_ntz"))
      .withColumn("window_end", col("window_end").cast("timestamp_ntz"))

  def q17Oracle: String =
    """SELECT date_trunc('hour', ts) AS window_start,
      |  date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
      |  event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |WHERE ts IS NOT NULL -- Spark's window() drops null event times
      |GROUP BY 1, 2, 3""".stripMargin

  /** q18: gap-based sessionization (30-minute inactivity gap). */
  def q18Sessionize(spark: SparkSession, dir: String): DataFrame =
    Sessionize.batch(Tables.events(spark, dir), gapSeconds = 1800L)
      .withColumn("total_value", col("total_value").cast(DoubleType))
      .withColumn("session_start", col("session_start").cast("timestamp_ntz"))
      .withColumn("session_end", col("session_end").cast("timestamp_ntz"))

  /** q57: point-in-interval range join — error events attributed to the
    * session (q18's gap sessions) containing them, per user. Catalyst
    * extracts the user_id equi-conjunct into the shuffle join and runs the
    * BETWEEN as residual filter (asserted in RangeJoinSpec) — the
    * composition [[graft.operators.RangeJoin]] pins down.
    */
  def q57ErrorsInSessions(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val sessions = Sessionize.batch(ev, gapSeconds = 1800L)
      .select(col("user_id"), col("session_id"),
        col("session_start"), col("session_end"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.operators.RangeJoin.pointInInterval(errors, sessions,
        keys = Seq("user_id"), pointCol = "ts",
        startCol = "session_start", endCol = "session_end")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("session_id"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"))
  }

  def q57Oracle: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR (epoch(ts) - epoch(lag(ts) OVER w)) > 1800.0
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WHERE ts IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), numbered AS (
      |  SELECT user_id, ts,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM marked
      |), sessions AS (
      |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |    MIN(ts) AS session_start, MAX(ts) AS session_end
      |  FROM numbered GROUP BY user_id, session_id
      |)
      |SELECT e.event_id, e.user_id, e.ts, s.session_id, s.session_start, s.session_end
      |FROM events e JOIN sessions s
      |  ON e.user_id = s.user_id AND e.ts BETWEEN s.session_start AND s.session_end
      |WHERE e.event_type = 'error'""".stripMargin

  /** q69: stream-stream join (batch-equivalent plan): every click joined to
    * the same user's purchases within a 30-minute attribution horizon.
    * [[StreamJoin.attribute]] is the streaming operator — state on BOTH
    * sides, expired by the watermarks + this range conjunct (StreamingSpec
    * drives it over two MemoryStreams and asserts stream == this batch
    * result).
    */
  def q69ClickAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    StreamJoin.attribute(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        horizonSeconds = 1800L)
      .select(col("user_id"), col("click_id"),
        col("click_ts").cast("timestamp_ntz").as("click_ts"),
        col("purchase_id"),
        col("purchase_ts").cast("timestamp_ntz").as("purchase_ts"),
        col("purchase_value"))
  }

  def q69Oracle: String =
    """SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
      |  p.event_id AS purchase_id, p.ts AS purchase_ts,
      |  p.value AS purchase_value
      |FROM events c JOIN events p
      |  ON c.user_id = p.user_id
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1800 SECOND
      |WHERE c.event_type = 'click' AND p.event_type = 'purchase'""".stripMargin

  /** q59: snapshot diff — per-user activity snapshots of the corpus's first
    * two days, classified added/removed/changed
    * ([[graft.operators.SnapshotDiff]]: one full-outer join, null-safe
    * value comparison, unchanged rows dropped). The two days are derived
    * in-plan (min day, +1) so no date literal is baked in.
    */
  def q59SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ev = Tables.events(spark, dir).filter(col("ts").isNotNull)
      .withColumn("day", to_date(col("ts")))
    val days = ev.agg(min(col("day")).as("d1"))
      .select(col("d1"), date_add(col("d1"), 1).as("d2"))
    def snapshot(dcol: String) = ev.join(broadcast(days), lit(true))
      .filter(col("day") === col(dcol))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).as("total_value"))
    graft.operators.SnapshotDiff.diff(snapshot("d1"), snapshot("d2"),
        keys = Seq("user_id"))
      .select(col("user_id"), col("change_type"),
        col("before_n_events"),
        col("before_total_value").cast(DoubleType).as("before_total_value"),
        col("after_n_events"),
        col("after_total_value").cast(DoubleType).as("after_total_value"))
  }

  def q59Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, value FROM events WHERE ts IS NOT NULL
      |), dd AS (
      |  SELECT MIN(day) AS d1, MIN(day) + 1 AS d2 FROM ev
      |), b AS (
      |  SELECT user_id, COUNT(*) AS n_events, SUM(CAST(value AS DECIMAL(18,2))) AS tv
      |  FROM ev, dd WHERE day = d1 GROUP BY 1
      |), a AS (
      |  SELECT user_id, COUNT(*) AS n_events, SUM(CAST(value AS DECIMAL(18,2))) AS tv
      |  FROM ev, dd WHERE day = d2 GROUP BY 1
      |)
      |SELECT * FROM (
      |  SELECT COALESCE(b.user_id, a.user_id) AS user_id,
      |    CASE WHEN b.user_id IS NULL THEN 'added'
      |         WHEN a.user_id IS NULL THEN 'removed'
      |         WHEN b.n_events IS DISTINCT FROM a.n_events
      |              OR b.tv IS DISTINCT FROM a.tv THEN 'changed' END AS change_type,
      |    b.n_events AS before_n_events, CAST(b.tv AS DOUBLE) AS before_total_value,
      |    a.n_events AS after_n_events, CAST(a.tv AS DOUBLE) AS after_total_value
      |  FROM b FULL OUTER JOIN a ON b.user_id = a.user_id
      |) WHERE change_type IS NOT NULL""".stripMargin

  def q18Oracle: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR (epoch(ts) - epoch(lag(ts) OVER w)) > 1800.0
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WHERE ts IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), numbered AS (
      |  SELECT user_id, ts, value,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM marked
      |)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM numbered
      |GROUP BY user_id, session_id""".stripMargin

  // private[graft] (not [queries]) so StatefulGatesSpec audits the SAME
  // constants the gates drive — a spec-local copy could silently audit a
  // different feed than the one the oracles replay
  private[graft] val FeedDays = 4
  private[graft] val UserCap = 100L

  /** The capped feed every streaming gate (q108/q110/q111) derives from:
    * ts/user null filters, the `user_id < UserCap` keyspace bound (the
    * feed collect stays SF-invariant) and the first-`FeedDays` day window (4 days: enough batches to re-admit q108 keys, straddle q110 lateness, and complete q111 chains — 31 stage-3 users at sf0.01 AND sf0.1, audited by StatefulGatesSpec; was 8, then 5 — cut for harness cost, round-14 task #6 and round-15 task #7).
    * `withValue` additionally drops null values — q108/q110 carry `value`
    * into typed rows where a NULL would silently unbox to 0.0 — and must
    * match the oracle's filter set exactly. Returns (feed, minDay).
    * NOTE: the 100/8 literals are necessarily repeated inside each gate's
    * DuckDB oracle string; change them HERE and in all three oracles
    * together.
    */
  private[queries] def cappedFeed(spark: SparkSession, dir: String,
                                  withValue: Boolean): (DataFrame, java.sql.Date) = {
    val base = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("user_id") < UserCap)
    val filtered = if (withValue) base.filter(col("value").isNotNull) else base
    val sel = filtered.select(col("user_id"), col("event_id"), col("ts"),
      col("event_type"), col("value"))
    val minDay = sel.agg(min(to_date(col("ts")))).head.getDate(0)
    (sel.filter(to_date(col("ts")) < date_add(lit(minDay), FeedDays)), minDay)
  }

  /** q108: the streaming dedup-within-watermark operator (SURVEY 44b)
    * driven through a REAL MemoryStream query and oracle-gated. The feed
    * is deterministic: one row per (user_id, event_type, day) — each
    * day's earliest (ts, event_id) — added as one micro-batch per
    * calendar day in ascending order, so the watermark in effect while
    * batch d processes is exactly max(fed ts of days < d) − 1 day.
    * dropDuplicatesWithinWatermark then emits a key's row iff the key's
    * previously-emitted entry has EXPIRED (its event time + 1 day is
    * behind that watermark) — the bounded-state re-admission semantics
    * that distinguish this operator from a global dedup. The DuckDB
    * oracle replays the whole chain per key with a recursive CTE that
    * never saw Spark's state machinery; a boundary-equality audit over
    * the testdata (no expiry lands EXACTLY on a watermark at any shipped
    * SF — re-checked for these parameters) makes the strictness of the
    * comparison immaterial.
    *
    * BOTH feed dimensions are capped so the harness is SF-invariant:
    * `user_id < UserCap` bounds the keyspace (the driver feed collect
    * would otherwise grow with SF) and FeedDays bounds the micro-batch
    * count; the 1-day TTL still re-admits each key every ~3 batches
    * (~900 emissions over ~480 keys at the capped feed).
    */
  def q108StreamingDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // null user_ids/values out (getLong/getDouble would silently unbox
    // NULL to 0 and merge the null chain with real user 0's) — the oracle
    // below filters identically
    val (ev, minDay) = cappedFeed(spark, dir, withValue = true)
    // one deterministic feed row per (key, day): earliest (ts, event_id)
    val daily = graft.operators.Dedup.latestByKey(
      ev.withColumn("__day", to_date(col("ts"))),
      Seq("user_id", "event_type", "__day"),
      Seq(col("ts").asc, col("event_id").asc))
    val feed = daily.select(
      datediff(col("__day"), lit(minDay)).cast("long").as("__b"),
      col("user_id"), col("event_id"), col("ts"), col("event_type"),
      col("value"))
    val batches = FeedHarness.batchesOf(feed, "__b")(r => DedupFeedRow(
      r.getLong(1), r.getLong(2), r.getTimestamp(3), r.getString(4),
      r.getDouble(5)))
    FeedHarness.drive(spark, "q108_dedup", batches, "append") { ds =>
      graft.streaming.StreamingDedup.withinWatermark(ds.toDF(),
        Seq("user_id", "event_type"), "ts", delay = "1 day")
    }.select(col("user_id"), col("event_id"),
      col("ts").cast("timestamp_ntz").as("ts"),
      col("event_type"), col("value"))
  }

  def q108Oracle: String =
    """WITH RECURSIVE daily AS (
      |  SELECT user_id, event_type, CAST(ts AS DATE) AS day, ts, event_id, value,
      |    row_number() OVER (PARTITION BY user_id, event_type, CAST(ts AS DATE)
      |      ORDER BY ts, event_id) AS rn
      |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      |    AND value IS NOT NULL AND user_id < 100
      |    AND CAST(ts AS DATE) < (SELECT min(CAST(ts AS DATE)) + 4
      |                            FROM events
      |                            WHERE ts IS NOT NULL AND user_id IS NOT NULL
      |                              AND value IS NOT NULL AND user_id < 100)
      |), fed AS (
      |  SELECT user_id, event_type, day, ts, event_id, value FROM daily WHERE rn = 1
      |), dayidx AS (
      |  SELECT day, row_number() OVER (ORDER BY day) AS di
      |  FROM (SELECT DISTINCT day FROM fed)
      |), wm AS (
      |  SELECT d.di,
      |    (SELECT max(f.ts) FROM fed f JOIN dayidx x ON f.day = x.day
      |     WHERE x.di < d.di) - INTERVAL 1 DAY AS wm_ts
      |  FROM dayidx d
      |), seq AS (
      |  SELECT f.user_id, f.event_type, x.di, f.ts, f.event_id, f.value,
      |    row_number() OVER (PARTITION BY f.user_id, f.event_type ORDER BY x.di) AS k
      |  FROM fed f JOIN dayidx x ON f.day = x.day
      |), chain AS (
      |  SELECT user_id, event_type, di, ts, event_id, value, k,
      |    TRUE AS emitted, ts AS last_emit
      |  FROM seq WHERE k = 1
      |  UNION ALL
      |  SELECT s.user_id, s.event_type, s.di, s.ts, s.event_id, s.value, s.k,
      |    (c.last_emit + INTERVAL 1 DAY) < w.wm_ts AS emitted,
      |    CASE WHEN (c.last_emit + INTERVAL 1 DAY) < w.wm_ts
      |         THEN s.ts ELSE c.last_emit END AS last_emit
      |  FROM chain c
      |  JOIN seq s ON s.user_id = c.user_id AND s.event_type = c.event_type
      |            AND s.k = c.k + 1
      |  JOIN wm w ON w.di = s.di
      |)
      |SELECT user_id, event_id, ts, event_type, value
      |FROM chain WHERE emitted""".stripMargin
}

/** One deterministic dedup-feed row (q108's MemoryStream element type). */
final case class DedupFeedRow(user_id: Long, event_id: Long,
                              ts: java.sql.Timestamp, event_type: String,
                              value: Double)

/** q110: the transformWithState sessionizer ([[graft.streaming.SessionizeTws]],
  * SURVEY 43b) driven through a REAL micro-batched run on the RocksDB state
  * store and oracle-gated — the watermark-sealed buffering contract ("an
  * admitted-late event lands in the session it BELONGS to, not the one that
  * happened to be open") checked by an engine that never saw the batching.
  *
  * The feed delivers each event in micro-batch `day(ts) − minDay +
  * (event_id % 2)` — half of every day's events arrive one batch LATE, up
  * to a full day after their event time, exercising the sealed-prefix
  * re-ordering on every batch. With a 1-day watermark delay every late row
  * is still admissible by construction (wm during batch b is below the
  * start of day b−1), so the emitted sessions are EXACTLY the batch
  * operator's sessions over the prefix sealed by the final watermark —
  * the oracle needs no knowledge of the delivery schedule at all: it
  * replays q18's windowed sessionization over the capped feed and keeps
  * sessions whose `end + gap` lies strictly before the final watermark
  * (max fed ts, floored to Spark's millisecond watermark granularity,
  * minus 1 day). Boundary audit at all three shipped SFs: no session's
  * closing instant lands within 32 s of the watermark, so comparison
  * strictness and the ms floor cannot flip a row.
  */
object StatefulGates {
  import StreamingQueries.{FeedDays, UserCap}

  private val GapSeconds = 21600L // 6 h: the capped corpus's median
  // inter-event gap is ~7 h, so the feed mixes single- and multi-event
  // sessions instead of degenerating to one-per-event

  def q110SessionizeTws(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (ev, minDay) = StreamingQueries.cappedFeed(spark, dir, withValue = true)
    val feed = ev.select(
      (datediff(to_date(col("ts")), lit(minDay)) + (col("event_id") % 2))
        .cast("long").as("__b"),
      col("user_id"), col("ts"), col("event_type"), col("value"))
    val batches = FeedHarness.batchesOf(feed, "__b")(r => graft.streaming.Event(
      r.getLong(1), r.getTimestamp(2), r.getString(3), r.getDouble(4)))
    val out = FeedHarness.withRocksDb(spark) {
      FeedHarness.drive(spark, "q110_sessions", batches, "append") { ds =>
        graft.streaming.SessionizeTws.streaming(ds,
          gapSeconds = GapSeconds, watermarkDelay = "1 day").toDF()
      }
    }
    out.select(col("user_id"),
      col("session_start").cast("timestamp_ntz").as("session_start"),
      col("session_end").cast("timestamp_ntz").as("session_end"),
      col("n_events"), col("total_value"))
  }

  /** q111: the CONTINUOUS funnel twins ([[graft.streaming.StreamingFunnel]]
    * on flatMapGroupsWithState and [[graft.streaming.FunnelTws]] on
    * transformWithState/RocksDB, SURVEY 44f/44g) driven through a real
    * micro-batched run and oracle-gated — one deterministic feed drives
    * BOTH state backends, the gate requires them identical, and DuckDB
    * replays the emissions from the min-chain definition alone.
    *
    * The feed delivers the capped corpus one calendar day per micro-batch
    * in event-time order. Under in-order day-partitioned delivery the
    * monotone state machine provably equals the batch min-chain truncated
    * to each day-prefix (a stage event qualifying against chain time T
    * has ts > T, hence day ≥ day(T), hence is visible in T's batch or a
    * later one), so the Update-mode emission set is closed-form: for each
    * user, one row per distinct stage-attainment DAY carrying the highest
    * stage attained by that day. That is what the oracle computes — three
    * dependent min-aggregates and a (user, day) group-by, no state
    * machinery.
    */
  /** q111's exact day-per-batch Event feed — shared with
    * StatefulGatesSpec's twin-identity drive so the spec checks the SAME
    * feed the gate measures.
    */
  private[graft] def q111Batches(spark: SparkSession,
                                 dir: String): Seq[Seq[graft.streaming.Event]] = {
    val (ev, minDay) = StreamingQueries.cappedFeed(spark, dir, withValue = false)
    val feed = ev.select(
      datediff(to_date(col("ts")), lit(minDay)).cast("long").as("__b"),
      col("user_id"), col("ts"), col("event_type"), col("value"))
    // value is unused by the funnel, so a null (not filtered here — the
    // oracle has no value filter either) feeds as 0.0 instead of NPE-ing
    FeedHarness.batchesOf(feed, "__b")(r => graft.streaming.Event(
      r.getLong(1), r.getTimestamp(2), r.getString(3),
      if (r.isNullAt(4)) 0.0 else r.getDouble(4)))
  }

  private[graft] val FunnelStages = Seq("view", "click", "purchase")

  def q111StreamingFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val batches = q111Batches(spark, dir)
    val stages = FunnelStages
    // the gate drives the TWS/RocksDB production backend only; the twin
    // identity against the legacy fMGWS backend is a SPEC contract
    // (StatefulGatesSpec drives BOTH backends over this same capped feed
    // and requires row equality) — running two full micro-batched drives
    // per bench shot doubled the gate's wall for a check that needs to
    // hold once per build, not once per measurement (r15 task #7)
    val tws = FeedHarness.withRocksDb(spark) {
      FeedHarness.drive(spark, "q111_funnel_tws", batches, "update") { ds =>
        graft.streaming.FunnelTws.track(ds.toDF(), stages).toDF()
      }
    }
    tws.select(col("user_id"), col("reach"))
  }

  def q111FunnelOracle: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_type FROM events
      |  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND user_id < 100
      |    AND CAST(ts AS DATE) < (SELECT min(CAST(ts AS DATE)) + 4 FROM events
      |        WHERE ts IS NOT NULL AND user_id IS NOT NULL AND user_id < 100)
      |), s1 AS (
      |  SELECT user_id, MIN(ts) AS t FROM e WHERE event_type = 'view' GROUP BY 1
      |), s2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t FROM e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1
      |), s3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t FROM e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1
      |), stages AS (
      |  SELECT user_id, 1 AS stage, CAST(t AS DATE) AS d FROM s1
      |  UNION ALL SELECT user_id, 2, CAST(t AS DATE) FROM s2
      |  UNION ALL SELECT user_id, 3, CAST(t AS DATE) FROM s3
      |)
      |SELECT user_id, CAST(MAX(stage) AS INTEGER) AS reach
      |FROM stages GROUP BY user_id, d""".stripMargin

  /** q113: CONTINUOUS HLL sketch maintenance (SURVEY 44c,
    * [[graft.streaming.StreamOps.streamingHllRegisters]]) driven through a
    * real Complete-mode micro-batched run and oracle-gated. The capped
    * feed streams one calendar day per micro-batch; the memory sink holds
    * the final register table (max is order-free, so Complete mode
    * maintains ≤ M register rows forever). DuckDB rebuilds every register
    * from the same md5 pipeline over the fed event_ids — the determinism
    * contract that makes batch⋈streaming sketch MERGE sound, checked by
    * an engine that never saw the batching.
    */
  /** The day-per-batch DedupFeedRow feed q113/q114 share (the sketch
    * drives need every event's id/type, no per-key reduction, no
    * lateness): one micro-batch per calendar day of the capped feed.
    */
  private def sketchDayBatches(spark: SparkSession,
                               dir: String): Seq[Seq[DedupFeedRow]] = {
    val (ev, minDay) = StreamingQueries.cappedFeed(spark, dir, withValue = false)
    val feed = ev.select(
      datediff(to_date(col("ts")), lit(minDay)).cast("long").as("__b"),
      col("user_id"), col("event_id"), col("ts"), col("event_type"),
      col("value"))
    FeedHarness.batchesOf(feed, "__b")(r => DedupFeedRow(
      r.getLong(1), r.getLong(2), r.getTimestamp(3), r.getString(4),
      if (r.isNullAt(5)) 0.0 else r.getDouble(5)))
  }

  def q113StreamingHll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    FeedHarness.drive(spark, "q113_hll", sketchDayBatches(spark, dir),
        "complete") { ds =>
      graft.streaming.StreamOps.streamingHllRegisters(ds.toDF(), col("event_id"))
    }.select(col("bucket"), col("register").cast("int").as("register"))
  }

  def q113Oracle: String = {
    import graft.operators.HllSketch.{HashBits, MaxRho}
    s"""WITH fed AS (
       |  SELECT event_id FROM events
       |  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND user_id < 100
       |    AND CAST(ts AS DATE) < (SELECT min(CAST(ts AS DATE)) + 4 FROM events
       |        WHERE ts IS NOT NULL AND user_id IS NOT NULL AND user_id < 100)
       |), h AS (
       |  SELECT md5(CAST(event_id AS VARCHAR)) AS hx FROM fed
       |), br AS (
       |  SELECT CAST(CAST('0x' || substr(hx, 1, 2) AS BIGINT) AS INTEGER) AS bucket,
       |         CAST('0x' || substr(hx, 3, ${HashBits / 4}) AS BIGINT) AS v
       |  FROM h
       |)
       |SELECT bucket,
       |  CAST(MAX(CASE WHEN v = 0 THEN $MaxRho
       |                ELSE $MaxRho - length(bin(v)) END) AS INTEGER) AS register
       |FROM br GROUP BY bucket""".stripMargin
  }

  /** q114: CONTINUOUS count-min sketch maintenance (SURVEY 80,
    * [[graft.operators.CountMinSketch.cells]] in Complete mode — the
    * sparse counter shape whose state is ≤ Depth·Width rows forever).
    * Same drive as q113; DuckDB rebuilds every touched (row, bucket, cnt)
    * cell from the md5 bucket arithmetic over the fed event_types.
    */
  def q114StreamingCms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    FeedHarness.drive(spark, "q114_cms", sketchDayBatches(spark, dir),
        "complete") { ds =>
      graft.operators.CountMinSketch.cells(ds.toDF(), col("event_type"))
    }.select(col("row"), col("bucket"), col("cnt"))
  }

  def q114Oracle: String = {
    import graft.operators.CountMinSketch.{Depth, Width}
    val rowVals = (0 until Depth).map(r => s"($r)").mkString(", ")
    s"""WITH fed AS (
       |  SELECT event_type FROM events
       |  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND user_id < 100
       |    AND CAST(ts AS DATE) < (SELECT min(CAST(ts AS DATE)) + 4 FROM events
       |        WHERE ts IS NOT NULL AND user_id IS NOT NULL AND user_id < 100)
       |    AND event_type IS NOT NULL
       |)
       |SELECT r.r AS row,
       |  CAST('0x' || substr(md5(r.r || ':' || event_type), 1, 8) AS BIGINT) % $Width AS bucket,
       |  COUNT(*) AS cnt
       |FROM fed CROSS JOIN (VALUES $rowVals) r(r)
       |GROUP BY 1, 2""".stripMargin
  }

  def q110Oracle: String =
    """WITH fed AS (
      |  SELECT user_id, event_id, ts, value
      |  FROM events
      |  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
      |    AND user_id < 100
      |    AND CAST(ts AS DATE) < (SELECT min(CAST(ts AS DATE)) + 4 FROM events
      |        WHERE ts IS NOT NULL AND user_id IS NOT NULL
      |          AND value IS NOT NULL AND user_id < 100)
      |), wm AS (
      |  SELECT (CAST(floor(epoch_us(max(ts)) / 1000) AS BIGINT) - 86400000) * 1000 AS wm_us
      |  FROM fed
      |), marked AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR (epoch(ts) - epoch(lag(ts) OVER w)) > 21600.0
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM fed
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), numbered AS (
      |  SELECT user_id, ts, value,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked
      |), sessions AS (
      |  SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
      |    COUNT(*) AS n_events,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |  FROM numbered GROUP BY user_id, sid
      |)
      |SELECT user_id, session_start, session_end, n_events, total_value
      |FROM sessions, wm
      |WHERE epoch_us(session_end) + 21600000000 < wm.wm_us""".stripMargin
}
