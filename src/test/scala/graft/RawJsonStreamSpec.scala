package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** [[graft.sources.dsv2.RawJsonSource]]'s MICRO_BATCH_READ tier: the
  * invariants the q169 gate cannot phrase — restart resumes from the
  * offset log (exactly-once ACROSS queries, not just within one), the
  * offset log carries the file list, and hidden staging/bookkeeping
  * names never become stream rows.
  */
class RawJsonStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("product_id", LongType),
    StructField("brand", StringType)))

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_rjstream").toString

  private def writeChunk(dir: String, name: String, ids: Seq[Long]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val body = ids.map(i => s"""{"product_id": $i, "brand": "b${i % 3}"}""")
      .mkString("", "\n", "\n")
    Files.writeString(Paths.get(dir, name), body)
    ()
  }

  private def drain(raw: String, ckpt: String,
                    seen: mutable.Buffer[Long])(drops: (() => Unit)*): Unit = {
    val q = spark.readStream.format("graft.sources.dsv2.RawJsonSource")
      .schema(schema).option("path", raw).load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.collect() // driver-side accumulation (local mode)
        seen.synchronized { seen ++= rows.map(_.getLong(0)) }
        ()
      }
      .start()
    try drops.foreach { d => d(); q.processAllAvailable() }
    finally q.stop()
  }

  test("drops become micro-batches; restart from the offset log reads only new files") {
    val root = tmpRoot()
    val raw = s"$root/raw"
    val ckpt = s"$root/ckpt"
    val first = mutable.Buffer.empty[Long]
    drain(raw, ckpt, first)(
      () => writeChunk(raw, "chunk-a.jsonl", Seq(1L, 2L, 3L)),
      () => writeChunk(raw, "chunk-b.jsonl", Seq(4L, 5L)))
    assert(first.sorted == Seq(1L, 2L, 3L, 4L, 5L),
      s"streamed union must equal the batch union, got $first")
    // a NEW query on the SAME checkpoint must resume after chunk-a/b:
    // only the post-restart drop is read — file-granular exactly-once
    // across restarts, not merely within one run
    val second = mutable.Buffer.empty[Long]
    drain(raw, ckpt, second)(
      () => writeChunk(raw, "chunk-c.jsonl", Seq(6L, 7L)))
    assert(second.sorted == Seq(6L, 7L),
      s"restart must skip offset-logged files, got $second")
    // round 19: offsets are O(1) INDEX entries; the FILE LOG beside the
    // checkpoint carries the replayable file-position record
    val off0 = Files.readString(Paths.get(ckpt, "offsets", "0"))
    assert(off0.contains("\"v\":2") && off0.contains("\"idx\""),
      s"offsets must be v2 index entries, got: $off0")
    assert(!off0.contains("chunk-a.jsonl"),
      s"file names must live in the file log, not the offset: $off0")
    // Spark hands each source its own checkpoint subdir (sources/<i>)
    val logDir = Paths.get(ckpt, "sources", "0", "graft_file_log")
    val logged = Files.list(logDir).toArray.map(_.toString)
      .filter(p => p.endsWith(".log") || p.endsWith(".compact"))
      .flatMap(p => Files.readString(Paths.get(p)).split("\n")).toSeq
    assert(logged.exists(_.contains("chunk-a.jsonl")),
      s"the file log must pin every discovered file, got: $logged")
  }

  test("hidden staging/bookkeeping files never become stream rows") {
    val root = tmpRoot()
    val raw = s"$root/raw"
    writeChunk(raw, ".staging_x.jsonl", Seq(99L))
    writeChunk(raw, "_meta.jsonl", Seq(98L))
    val seen = mutable.Buffer.empty[Long]
    drain(raw, s"$root/ckpt", seen)(
      () => writeChunk(raw, "chunk.jsonl", Seq(1L)))
    assert(seen.sorted == Seq(1L), s"hidden files leaked: $seen")
  }

  test("streaming before the first file lands starts from an empty zone") {
    val root = tmpRoot()
    val seen = mutable.Buffer.empty[Long]
    drain(s"$root/raw", s"$root/ckpt", seen)(
      () => (), // no data yet: latestOffset lists a missing dir as empty
      () => writeChunk(s"$root/raw", "late.jsonl", Seq(5L)))
    assert(seen.sorted == Seq(5L))
  }
}
