package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

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
    */
  def track(events: DataFrame, stages: Seq[String]): Dataset[FunnelProgress] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    graft.operators.Funnel.requireIntegralId(
      events.schema("user_id").dataType, "user_id")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("ts").isNotNull && col("event_type").isin(stages: _*))
      .select(col("user_id").cast("long"),
        graft.operators.TimeCols.micros(events, "ts"),
        col("event_type"))
      .filter(col("user_id").isNotNull)
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new FunnelProcessor(stages.toArray),
        TimeMode.None(), OutputMode.Update())
  }
}

/** Per-user funnel state machine. State is ONE fixed-size record per user
  * (reach + last-stage micros) in a named ValueState — bounded regardless
  * of event volume, and RocksDB keeps it off-heap at scale.
  */
private[streaming] final class FunnelProcessor(stages: Array[String])
    extends StatefulProcessor[Long, (Long, Long, String), FunnelProgress] {

  @transient private var state: ValueState[FunnelState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[FunnelState]("funnel",
      Encoders.product[FunnelState], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[(Long, Long, String)],
                               timerValues: TimerValues): Iterator[FunnelProgress] = {
    val prior = if (state.exists()) state.get() else FunnelState(0, Long.MinValue)
    val next = FunnelCore.advance(prior, rows.toArray, stages)
    if (next.reach != prior.reach) {
      state.update(next)
      Iterator.single(FunnelProgress(user, next.reach))
    } else Iterator.empty
  }
}
