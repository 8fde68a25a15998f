package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{Event, Sessionize, SessionizeTws}

/** [[SessionizeTws]]: gap sessionization on the transformWithState/RocksDB
  * state path. The pinned contract is stream == batch over the sealed
  * prefix — including cross-batch out-of-order arrivals the legacy fMGWS
  * path misplaces (an admitted-late event glued onto the newer open session
  * instead of the older one it belongs to).
  */
class SessionizeTwsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("TWS sessionize == batch under RocksDB, out-of-order arrivals included") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[Event]
    // 10-minute gap, 30-minute lateness horizon
    val out = SessionizeTws.streaming(stream.toDS(), gapSeconds = 600L,
      watermarkDelay = "30 minutes")
    val q = out.writeStream.format("memory").queryName("sessions_tws")
      .outputMode(OutputMode.Append).start()
    val fed = scala.collection.mutable.ArrayBuffer.empty[Event]
    def feed(evs: Event*): Unit = {
      fed ++= evs
      stream.addData(evs: _*)
      q.processAllAvailable()
    }
    try {
      // 0.1 + 0.2 is the classic double-drift pair: the batch twin sums
      // DECIMAL(18,2) (exactly 0.30); a stream that added raw doubles
      // would emit 0.30000000000000004 and fail the equality below
      feed(Event(1L, ts(0), "click", 0.1), Event(2L, ts(1), "view", 5.0))
      // user 1's second session starts (25 > 0 + gap 10)
      feed(Event(1L, ts(25), "click", 2.0))
      // ADMITTED-LATE: 10:08 is ≥ watermark (09:55) but belongs to user 1's
      // FIRST session (8 ≤ 0+10). The legacy fMGWS fold would glue it onto
      // the open (25,25) session and drag that session's start back to
      // 10:08; the sealed-prefix contract must put it in session one.
      feed(Event(1L, ts(8), "late", 0.2))
      // flush: watermark far past everything + gap closes all sessions
      feed(Event(9L, Timestamp.valueOf("2024-01-01 13:00:00"), "view", 0.0))
      feed(Event(9L, Timestamp.valueOf("2024-01-01 14:00:00"), "view", 0.0))

      val streamed = spark.table("sessions_tws").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start"),
          r.getAs[Timestamp]("session_end"), r.getAs[Long]("n_events"),
          r.getAs[Double]("total_value"))).toSet
      val batch = Sessionize.batch(
          fed.toSeq.toDF().withColumn("event_id",
            org.apache.spark.sql.functions.monotonically_increasing_id()),
          gapSeconds = 600L)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start"),
          r.getAs[Timestamp]("session_end"), r.getAs[Long]("n_events"),
          r.getAs[java.math.BigDecimal]("total_value").doubleValue)).toSet
      // the last feed's session (user 9 at 14:00) cannot close: nothing
      // advanced the watermark past its gap — exclude it from the batch side
      val closeable = batch.filterNot(s =>
        s._1 == 9L && s._2 == Timestamp.valueOf("2024-01-01 14:00:00"))
      assert(streamed == closeable,
        s"stream != batch:\n  stream: $streamed\n  batch: $closeable")
      // user 1's late event landed in the FIRST session
      val u1 = streamed.filter(_._1 == 1L).toSeq.sortBy(_._2.getTime)
      assert(u1.map(s => (s._4, s._5)) == Seq((2L, 0.3), (1L, 2.0)),
        s"late event misplaced or money drifted: $u1")
      // the RUNNING query's state must actually be on RocksDB
      import scala.jdk.CollectionConverters._
      val stateOps = q.lastProgress.stateOperators
      assert(stateOps.nonEmpty && stateOps.head.customMetrics.keySet.asScala
        .exists(_.toLowerCase.contains("rocksdb")),
        "state metrics show no RocksDB provider")
    } finally {
      q.stop()
      prior.fold(spark.conf.unset(providerKey))(v => spark.conf.set(providerKey, v))
    }
  }

  test("TWS sessionize state drains once sessions close") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[Event]
    val out = SessionizeTws.streaming(stream.toDS(), gapSeconds = 60L,
      watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("sessions_tws_drain")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(Event(1L, ts(0), "click", 1.0), Event(2L, ts(1), "view", 2.0))
      q.processAllAvailable()
      stream.addData(Event(3L, ts(30), "view", 0.0))
      q.processAllAvailable()
      stream.addData(Event(3L, ts(59), "view", 0.0))
      q.processAllAvailable()
      assert(spark.table("sessions_tws_drain")
        .filter("user_id IN (1, 2)").count() == 2)
      // users 1 and 2 closed and their buffers sealed → their state rows
      // (buffer + open + wake) must be gone; only user 3 remains live
      val rows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(rows <= 3,
        s"closed users' state not drained: $rows state rows remain")
    } finally {
      q.stop()
      prior.fold(spark.conf.unset(providerKey))(v => spark.conf.set(providerKey, v))
    }
  }
}
