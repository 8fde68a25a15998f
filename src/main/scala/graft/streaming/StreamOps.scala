package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Additional streaming operators (SURVEY §2 items 42-44 family).
  */
object StreamOps {

  /** Continuous exact dedup: drops re-deliveries of the same key seen
    * within the watermark horizon (state is bounded by the horizon — the
    * streaming twin of the reference's batch drop_duplicates). The event
    * time column must be part of the frame for the watermark to bound
    * state.
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
                           tsCol: String, watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream LEFT interval join: each event picks up the reference
    * row (e.g. an FX-rate tick) whose event time falls within
    * [event - tolerance, event]. Both sides carry watermarks so join state
    * is evicted; the time-range predicate is what makes unbounded
    * stream-stream joins tractable.
    */
  def intervalEnrich(events: DataFrame, eventsTs: String,
                     reference: DataFrame, refTs: String,
                     joinKeys: org.apache.spark.sql.Column,
                     tolerance: String,
                     eventsWatermark: String, refWatermark: String): DataFrame = {
    val e = events.withWatermark(eventsTs, eventsWatermark)
    val r = reference.withWatermark(refTs, refWatermark)
    e.join(r, joinKeys &&
      col(refTs) >= col(eventsTs) - expr(s"INTERVAL $tolerance") &&
      col(refTs) <= col(eventsTs), "leftOuter")
  }
}
