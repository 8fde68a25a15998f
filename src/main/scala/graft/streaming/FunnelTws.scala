package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** [[StreamingFunnel]] on Spark 4's ARBITRARY-STATE API
  * (`transformWithState` + `StatefulProcessor`) — the production-scale
  * state path: per-key state lives in named typed stores served by the
  * RocksDB state store provider (off-heap, changelog-checkpointed,
  * incrementally snapshotted), not in the legacy HDFS-backed in-memory
  * map that `flatMapGroupsWithState` defaults to. Semantics are identical
  * to [[StreamingFunnel.track]] by construction (same min-chain advance,
  * same emit-on-change contract) and the spec asserts stream == batch
  * under the RocksDB provider.
  *
  * Why a second funnel rather than replacing the fMGWS one: the two APIs
  * exercise different state backends and checkpoint formats; keeping both
  * documents the migration (fMGWS → transformWithState) a production
  * deployment performs, with the spec proving the results don't move.
  *
  * Reference semantics: same event-funnel family as
  * [[graft.operators.Funnel]] (analytics_dag.py's dashboard feeds).
  */
object FunnelTws {

  /** Input needs (user_id, ts, event_type) columns; emits FunnelProgress
    * updates (OutputMode.Update sinks). Requires the session to run the
    * RocksDB state store provider — transformWithState rejects the
    * default HDFS-backed one:
    * `spark.sql.streaming.stateStore.providerClass =
    *  org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
    *
    * `idleTtl` bounds per-user state LIFETIME in EVENT TIME: a user whose
    * last funnel event is older than the TTL when the watermark passes is
    * evicted (event-time timer), and a later event restarts their funnel
    * FROM SCRATCH — the earlier reach is forgotten and re-emits, since the
    * fresh state's reach-change fires the emit-on-change contract again.
    * That is the 100 TB trade-off made explicit: unbounded keyspaces
    * (anonymous ids, bot churn) need eviction, and the price is funnels
    * spanning an idle period longer than the TTL.
    *
    * Event-time timers, NOT Spark's `TTLConfig`, deliberately: state TTL
    * is a wall-clock contract that forces `TimeMode.ProcessingTime`, where
    * the engine self-schedules no-data maintenance micro-batches
    * back-to-back — a funnel keyed on EVENT time would evict users on
    * replay/backfill (wall clock races ahead of event time) and the
    * eviction instant is nondeterministic. The timer formulation evicts at
    * `last event + TTL` in event time: deterministic, replay-safe, and the
    * state bound is the same. `watermarkDelay` is required with `idleTtl`
    * (event-time timers need a watermark).
    */
  def track(events: DataFrame, stages: Seq[String],
            idleTtl: Option[java.time.Duration] = None,
            watermarkDelay: String = "10 seconds"): Dataset[FunnelProgress] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // timers are millisecond-granular: a sub-ms TTL would truncate to 0 and
    // evict every user at the next watermark tick (eviction can land up to
    // ~1 ms early relative to exact `last event + TTL` for the same reason)
    idleTtl.foreach(d => require(d.toMillis >= 1,
      s"idleTtl must be >= 1 millisecond (timer granularity), got $d"))
    graft.operators.Funnel.requireIntegralId(
      events.schema("user_id").dataType, "user_id")
    val spark = events.sparkSession
    import spark.implicits._
    val src = idleTtl.fold(events)(_ => events.withWatermark("ts", watermarkDelay))
    val timeMode = idleTtl.fold(TimeMode.None())(_ => TimeMode.EventTime())
    val ttlMicros = idleTtl.map(d => d.toMillis * 1000L)
    src
      .filter(col("ts").isNotNull && col("event_type").isin(stages: _*))
      .select(col("user_id").cast("long"),
        graft.operators.TimeCols.micros(events, "ts"),
        col("event_type"))
      .filter(col("user_id").isNotNull)
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new FunnelProcessor(stages.toArray, ttlMicros),
        timeMode, OutputMode.Update())
  }
}

/** Per-user funnel state machine. State is ONE fixed-size record per user
  * (reach + last-stage micros) in a named ValueState — bounded regardless
  * of event volume, and RocksDB keeps it off-heap at scale. With
  * `ttlMicros` set, ONE event-time timer per user rides at
  * `last qualifying event + TTL`; when the watermark passes it, the user's
  * state evicts and their next event starts a fresh funnel.
  */
private[streaming] final class FunnelProcessor(stages: Array[String],
                                               ttlMicros: Option[Long])
    extends StatefulProcessor[Long, (Long, Long, String), FunnelProgress] {

  @transient private var state: ValueState[FunnelState] = _
  @transient private var wake: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    state = getHandle.getValueState[FunnelState]("funnel",
      Encoders.product[FunnelState], TTLConfig.NONE)
    if (ttlMicros.isDefined)
      wake = getHandle.getValueState[Long]("wake",
        Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(user: Long, rows: Iterator[(Long, Long, String)],
                               timerValues: TimerValues): Iterator[FunnelProgress] = {
    val evs = rows.toArray
    val prior = if (state.exists()) state.get() else FunnelState(0, Long.MinValue)
    val next = FunnelCore.advance(prior, evs, stages)
    ttlMicros.foreach { ttl =>
      // idle clock restarts at the newest qualifying event, reach change
      // or not — an active-but-stalled user is not an evictable one
      var maxUs = Long.MinValue
      evs.foreach(e => if (e._2 > maxUs) maxUs = e._2)
      if (maxUs != Long.MinValue) {
        val target = maxUs / 1000 + ttl / 1000 + 1
        val cur = if (wake.exists()) wake.get() else Long.MinValue
        if (target > cur) {
          if (cur != Long.MinValue) getHandle.deleteTimer(cur)
          getHandle.registerTimer(target)
          wake.update(target)
        }
      }
    }
    if (next.reach != prior.reach) {
      state.update(next)
      Iterator.single(FunnelProgress(user, next.reach))
    } else Iterator.empty
  }

  override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[FunnelProgress] = {
    // TTL eviction: forget the user entirely; a later event re-runs the
    // funnel from scratch (and re-emits — the documented trade-off)
    state.clear()
    wake.clear()
    Iterator.empty
  }
}
