package graft.sources.dsv2

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** [[RawJsonFileLog]] — the compacted bookkeeping tier behind the O(1)
  * stream offsets (no Spark session needed: the log is plain-filesystem
  * driver state). Pins: position permanence across appends/compaction/
  * restore, O(1) offset JSON at 10k+ files, chunk folding, and the
  * out-of-range slice guard.
  */
class RawJsonFileLogSpec extends AnyFunSuite {

  private val conf = new Configuration()

  private def tmp(): String =
    Files.createTempDirectory("graft_filelog").toString + "/log"

  test("10k files: offset JSON stays O(1) and every position is replayable") {
    val dir = tmp()
    val log = new RawJsonFileLog(dir, conf)
    val files = (0 until 10500).map(i => f"/zone/chunk-$i%06d.jsonl")
    // 21 appends of 500 — crosses the compaction interval repeatedly
    var sizes = Vector.empty[Long]
    files.grouped(500).foreach { g => sizes :+= log.appendNew(g) }
    assert(sizes.last == 10500L)
    val offsetJson = RawJsonIndexOffset(sizes.last).json
    assert(offsetJson.length < 40,
      s"offset must be O(1) bytes at 10k files, got ${offsetJson.length}: $offsetJson")
    // every (start, end] window replays exactly its positions
    assert(log.slice(0, 500) == files.take(500).sorted)
    assert(log.slice(10000, 10500) == files.slice(10000, 10500).sorted)
    // compaction actually folded chunks: far fewer log entries than appends
    val entries = new java.io.File(dir).list().toSeq
    assert(entries.count(_.endsWith(".compact")) == 1,
      s"exactly the latest compact survives, got $entries")
    assert(entries.count(_.endsWith(".log")) <= RawJsonFileLog.CompactEvery,
      s"chunks before the compact must be dropped, got ${entries.size} entries")
  }

  test("restore rebuilds identical positions from compact + tail chunks") {
    val dir = tmp()
    val log = new RawJsonFileLog(dir, conf)
    // unsorted discovery order: positions pin the SORTED-within-append order
    log.appendNew(Seq("/z/b.jsonl", "/z/a.jsonl"))
    log.appendNew(Seq("/z/a.jsonl", "/z/c.jsonl")) // a already logged
    (0 until 25).foreach(i => log.appendNew(Seq(s"/z/d$i.jsonl")))
    val before = log.slice(0, log.size)
    val restored = new RawJsonFileLog(dir, conf)
    assert(restored.size == log.size)
    assert(restored.slice(0, restored.size) == before,
      "a restart must see byte-identical log positions")
    assert(before.take(3) == Seq("/z/a.jsonl", "/z/b.jsonl", "/z/c.jsonl"))
  }

  test("a slice beyond the log fails loudly") {
    val log = new RawJsonFileLog(tmp(), conf)
    log.appendNew(Seq("/z/x.jsonl"))
    val e = intercept[IllegalArgumentException] { log.slice(0, 2) }
    assert(e.getMessage.contains("never recorded"))
  }

  test("chunk writes are atomic: no torn files, stale temps ignored on restore") {
    val dir = tmp()
    val log = new RawJsonFileLog(dir, conf)
    log.appendNew(Seq("/z/a.jsonl"))
    val d = new java.io.File(dir)
    assert(!d.list().exists(_.endsWith(".tmp")),
      "a completed append must leave no temp files")
    // a crash mid-write leaves only a hidden temp — restore must ignore
    // it instead of reading a torn line as a permanent log position
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, ".00000000000000000001.log.tmp"),
      "/z/torn-partial") // no trailing newline: the torn shape
    val restored = new RawJsonFileLog(dir, conf)
    assert(restored.size == 1 && restored.slice(0, 1) == Seq("/z/a.jsonl"),
      "restore must see only published chunk files")
    // the next append publishes past the stale temp
    restored.appendNew(Seq("/z/b.jsonl"))
    assert(restored.slice(0, 2) == Seq("/z/a.jsonl", "/z/b.jsonl"))
  }

  /** The r19-ADVICE upgrade hole: the FIRST restart from a pre-round-19
    * checkpoint whose last batch was offset-logged but never committed
    * replays that batch with a LEGACY file-list END — which used to
    * throw, failing the upgrade permanently.
    */
  test("a pending pre-upgrade batch replays with a legacy file-list END") {
    def stream(checkpoint: String) = new RawJsonMicroBatchStream(
      "/nonexistent-zone", new org.apache.spark.sql.types.StructType(),
      Array.empty, new org.apache.spark.util.SerializableConfiguration(conf),
      checkpoint)
    val s = stream(Files.createTempDirectory("graft_mbs").toString)
    val legacyEnd = RawJsonStreamOffset(Seq("/z/a.jsonl", "/z/b.jsonl"))
    // committed legacy start: plan exactly the uncommitted delta
    val p1 = s.planInputPartitions(RawJsonStreamOffset(Seq("/z/a.jsonl")),
      legacyEnd)
    assert(p1.map(_.asInstanceOf[RawJsonInputPartition].file).toSeq ==
      Seq("/z/b.jsonl"))
    // initial index start (no committed batch, empty log): plan them all
    val p2 = s.planInputPartitions(RawJsonIndexOffset(0L), legacyEnd)
    assert(p2.map(_.asInstanceOf[RawJsonInputPartition].file).toSeq ==
      Seq("/z/a.jsonl", "/z/b.jsonl"))
  }
}
