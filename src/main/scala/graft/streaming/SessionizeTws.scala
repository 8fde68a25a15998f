package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** [[Sessionize]] on Spark 4's arbitrary-state API (`transformWithState` +
  * `StatefulProcessor`) — the production state path: named typed stores on
  * the RocksDB provider (off-heap, changelog-checkpointed), mirroring the
  * [[FunnelTws]] migration of [[StreamingFunnel]].
  *
  * The port is not a transliteration of the fMGWS version — it UPGRADES the
  * contract. The legacy path folds each micro-batch in arrival order, so an
  * admitted-late event that belongs to an older session can be glued onto
  * the wrong (newer) open session. Here events first land in a per-user
  * [[ListState]] buffer and are sessionized only once the event-time
  * watermark SEALS them (no admissible row can ever sort below a sealed
  * one — Spark drops rows strictly older than the watermark), so emitted
  * sessions are exactly the batch operator's sessions over the sealed
  * prefix, under any cross-batch arrival order the watermark admits.
  *
  * State shape per user: the pending buffer (bounded by watermark delay ×
  * per-user rate — the same bound the stream-stream join carries), one open
  * session record, and ONE registered event-time timer (min of "next buffered
  * row seals" and "open session's gap expires"). Timer-driven closure
  * replaces the legacy `GroupStateTimeout.EventTimeTimeout`.
  */
object SessionizeTws {

  /** Closed sessions (Append sinks), exactly [[Sessionize.batch]] over the
    * watermark-sealed prefix. `watermarkDelay` bounds both lateness and the
    * pending-buffer state.
    */
  def streaming(events: Dataset[Event], gapSeconds: Long,
                watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

/** One buffered (not yet watermark-sealed) event: micros + exact scale-2
  * cents ([[SessionTime.cents]] — per-event rounding identical to the batch
  * twin's `CAST(value AS DECIMAL(18,2))`, so the long sum matches exactly;
  * null = the batch cast would NULL this value, and the fold skips it like
  * SUM skips NULLs).
  */
final case class PendingEvent(us: Long, cents: java.lang.Long)

private[streaming] final class SessionProcessor(gapMicros: Long)
    extends StatefulProcessor[Long, Event, SessionOut] {

  @transient private var buffer: ListState[PendingEvent] = _
  @transient private var open: ValueState[SessionState] = _
  @transient private var wake: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    // TTL is deliberately NONE: liveness comes from the event-time timer
    // (every state entry has one registered), so TTL would only race it
    buffer = getHandle.getListState[PendingEvent]("buffer",
      Encoders.product[PendingEvent], TTLConfig.NONE)
    open = getHandle.getValueState[SessionState]("open",
      Encoders.product[SessionState], TTLConfig.NONE)
    wake = getHandle.getValueState[Long]("wake",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  import SessionTime.{addCents, cents, centsToDouble, micros, toTs}

  /** Move the single registered timer to `atMs` (no-op if already there). */
  private def retime(atMs: Long): Unit = {
    val cur = if (wake.exists()) wake.get() else Long.MinValue
    if (cur != atMs) {
      if (cur != Long.MinValue) getHandle.deleteTimer(cur)
      getHandle.registerTimer(atMs)
      wake.update(atMs)
    }
  }

  override def handleInputRows(user: Long, rows: Iterator[Event],
                               timerValues: TimerValues): Iterator[SessionOut] = {
    var minUs = Long.MaxValue
    rows.foreach { e =>
      if (e.ts != null) {
        val us = micros(e.ts)
        buffer.appendValue(PendingEvent(us, cents(e.value)))
        if (us < minUs) minUs = us
      }
    }
    if (minUs != Long.MaxValue) {
      // wake when the earliest buffered row seals; never earlier than the
      // next watermark tick so a late-but-admitted row still fires
      val target = math.max(minUs / 1000 + 1,
        timerValues.getCurrentWatermarkInMs() + 1)
      val cur = if (wake.exists()) wake.get() else Long.MaxValue
      if (target < cur) retime(target)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
    wake.clear() // the fired timer is gone; state must agree
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    val all = buffer.get().toArray
    // rows with ts == watermark are still admissible (Spark drops only
    // strictly-older rows), so they stay pending
    val (ripe, pending) = all.partition(_.us < wmUs)
    var out = List.empty[SessionOut]
    def close(s: SessionState): Unit =
      out ::= SessionOut(user, toTs(s.start), toTs(s.last), s.n,
        centsToDouble(s.totalCents))
    var cur = if (open.exists()) Option(open.get()) else None
    // null cents sort first at a given us — any fixed rule works, the sum
    // is order-free and session boundaries depend only on us
    java.util.Arrays.sort(ripe, Ordering.by((p: PendingEvent) =>
      (p.us, if (p.cents == null) Long.MinValue else p.cents.longValue())))
    ripe.foreach { p =>
      cur match {
        case Some(s) if p.us - s.last > gapMicros =>
          close(s)
          cur = Some(SessionState(p.us, p.us, 1L, addCents(0L, p.cents)))
        case Some(s) =>
          cur = Some(SessionState(math.min(s.start, p.us),
            math.max(s.last, p.us), s.n + 1, addCents(s.totalCents, p.cents)))
        case None =>
          cur = Some(SessionState(p.us, p.us, 1L, addCents(0L, p.cents)))
      }
    }
    // the open session is final once no admissible row can extend it: rows
    // at exactly last+gap would still merge (batch gap test is strict >)
    cur match {
      case Some(s) if wmUs > s.last + gapMicros =>
        close(s)
        cur = None
      case _ => ()
    }
    if (pending.length != all.length) {
      if (pending.isEmpty) buffer.clear() else buffer.put(pending)
    }
    cur match {
      case Some(s) => open.update(s)
      case None => open.clear()
    }
    val nextSeal = if (pending.isEmpty) Long.MaxValue else pending.map(_.us).min
    val nextGap = cur.fold(Long.MaxValue)(_.last + gapMicros)
    val nextUs = math.min(nextSeal, nextGap)
    if (nextUs != Long.MaxValue) retime(nextUs / 1000 + 1)
    out.reverseIterator
  }
}
