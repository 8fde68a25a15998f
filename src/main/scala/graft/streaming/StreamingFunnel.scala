package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user funnel state (2 scalars — state is bounded by user count,
  * never event history).
  */
final case class FunnelState(reach: Int, lastStageMicros: Long)

/** One (user, reach) progression emission. */
final case class FunnelProgress(user_id: Long, reach: Int)

/** The min-chain state advance shared by BOTH streaming funnel APIs
  * ([[StreamingFunnel]] on flatMapGroupsWithState, [[FunnelTws]] on
  * transformWithState): from prior state and one batch slice of (user,
  * micros, type) events, advance reach while each next stage has an event
  * strictly after the last reach time, taking the minimum such time. ONE
  * definition — a tie-break or strictness fix cannot drift between the
  * two state backends.
  */
private[streaming] object FunnelCore {
  def advance(prior: FunnelState, evs: Array[(Long, Long, String)],
              stages: Array[String]): FunnelState = {
    var reach = prior.reach
    var last = prior.lastStageMicros
    var advanced = true
    while (advanced && reach < stages.length) {
      val stage = stages(reach)
      var best = Long.MaxValue
      var i = 0
      while (i < evs.length) {
        val t = evs(i)._2
        if (evs(i)._3 == stage && t > last && t < best) best = t
        i += 1
      }
      if (best == Long.MaxValue) advanced = false
      else { last = best; reach += 1 }
    }
    FunnelState(reach, last)
  }
}

/** CONTINUOUS ordered-funnel tracking — the streaming twin of
  * [[graft.operators.Funnel]] (as [[AggMaintenanceSink]] is of
  * IncrementalAgg): each user's stage progression is maintained as
  * 2-scalar state and an update row is emitted whenever their reach
  * advances, so a dashboard reads conversion live instead of
  * re-scanning events.
  *
  * Semantics: the state machine is MONOTONE — stage i+1 fires on the
  * minimum event time of its type strictly after stage i's reach time,
  * considering events as they are delivered. When a user's events arrive
  * in event-time order across micro-batches (or all in one batch) this
  * equals the batch min-chain exactly (spec-asserted); an event arriving
  * out of order across batches cannot retroactively lower an
  * already-reached stage time — the streaming trade-off every funnel
  * tracker makes, since retraction would need unbounded history.
  */
object StreamingFunnel {

  /** Input needs (user_id, ts, event_type) columns; emits FunnelProgress
    * updates (OutputMode.Update sinks).
    */
  def track(events: DataFrame, stages: Seq[String]): Dataset[FunnelProgress] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    graft.operators.Funnel.requireIntegralId(
      events.schema("user_id").dataType, "user_id")
    val spark = events.sparkSession
    import spark.implicits._
    val stageArr = stages.toArray
    events
      .filter(col("ts").isNotNull && col("event_type").isin(stages: _*))
      .select(col("user_id").cast("long").as("__u"),
        graft.operators.TimeCols.micros(events, "ts"),
        col("event_type"))
      .filter(col("__u").isNotNull)
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, String)],
         state: GroupState[FunnelState]) =>
          val prior = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val next = FunnelCore.advance(prior, it.toArray, stageArr)
          if (next.reach != prior.reach) {
            state.update(next)
            Iterator.single(FunnelProgress(user, next.reach))
          } else Iterator.empty
      }
  }
}
