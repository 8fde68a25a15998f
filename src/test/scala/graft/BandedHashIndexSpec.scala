package graft

import org.apache.spark.sql.functions._

import graft.operators.multimodal.{AudioHash, AudioHashIndex, Bmp,
  ImageHashIndex, Wav}
import graft.streaming.AudioIndexStreamSink

/** The GENERIC [[graft.operators.multimodal.BandedHashIndex]] surface
  * beyond what the image leg's q178/q181/q182 gates pin: the AUDIO
  * instance (union-of-appends ≡ one-shot, streaming retry), the
  * orphan-safe compaction (a crashed append's marker-less postings must
  * never fold — folding one would make its retry's rollback delete the
  * whole store), gap-tolerant auto-numbering (max+1, not dir count),
  * and the pairs-ledger co-compaction (file listing bounded, markers
  * preserved as sentinels).
  */
class BandedHashIndexSpec extends SparkSpec {
  import spark.implicits._

  private val N = 400

  private def wav(seed: Long, rate: Int = 8000, div: Int = 1) =
    Wav.encodeScaled(N, rate, seed, div)

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("bandedidx").toString

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("audio appends reproduce the one-shot pairing, cross-batch included") {
    val dir = tmpDir()
    val day0 = Seq(1L -> wav(1L), 2L -> wav(2L))
    val day1 = Seq(3L -> wav(1L, rate = 16000), 4L -> wav(1L, div = 4),
      5L -> wav(3L))
    def append(rows: Seq[(Long, Array[Byte])]) =
      AudioHashIndex.append(spark, dir, rows.toDF("doc_id", "blob"),
        "doc_id", "blob")
    val union = append(day0).unionByName(append(day1))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = AudioHash.nearDupPairs(
      AudioHash.hashes(spark, (day0 ++ day1).toDF("doc_id", "blob"),
        "doc_id", "blob"), "doc_id")
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(union == oneShot && union.contains((1L, 3L)),
      s"audio appends must reproduce the batch pairing: $union vs $oneShot")
  }

  test("streaming audio sink: a retried applied batch no-ops on the marker") {
    val dir = tmpDir()
    val sink = AudioIndexStreamSink.appendBatch(dir, "doc_id", "blob") _
    sink(Seq(1L -> wav(7L)).toDF("doc_id", "blob"), 0L)
    sink(Seq(2L -> wav(7L)).toDF("doc_id", "blob"), 1L)
    // retry of batch 1 with different rows: ledger and store untouched
    sink(Seq(3L -> wav(7L)).toDF("doc_id", "blob"), 1L)
    assert(AudioIndexStreamSink.readPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)),
      "the retried rows must never have entered the index")
  }

  test("manual append auto-numbering skips ledger id gaps (max+1, not count)") {
    val dir = tmpDir()
    def appendAt(id: Option[Long], rows: Seq[(Long, Array[Byte])]) =
      ImageHashIndex.append(spark, dir, rows.toDF("doc_id", "blob"),
        "doc_id", "blob", batchId = id)
    appendAt(Some(0L), Seq(1L -> Bmp.encode(24, 18, 7L)))
    appendAt(Some(2L), Seq(2L -> Bmp.encode(24, 18, 9L))) // stream-driven gap
    // count-based numbering would compute id 2, collide, and silently
    // return batch 2's frozen ledger instead of appending the new day
    val b3 = appendAt(None, Seq(3L -> Bmp.encode(24, 18, 7L)))
    assert(b3.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 3L)),
      "the gap-spanning manual append must land as a NEW batch and pair")
  }

  test("compaction never folds an orphaned (marker-less) postings batch") {
    val dir = tmpDir()
    def appendAt(id: Long, rows: Seq[(Long, Array[Byte])]) =
      ImageHashIndex.append(spark, dir, rows.toDF("doc_id", "blob"),
        "doc_id", "blob", batchId = Some(id))
    appendAt(0L, Seq(1L -> Bmp.encode(24, 18, 7L)))
    appendAt(1L, Seq(2L -> Bmp.encode(24, 18, 9L)))
    appendAt(2L, Seq(3L -> Bmp.encode(24, 18, 11L)))
    // crash window: batch 2's postings published but its pairs marker
    // never renamed — simulate by removing the marker
    val fs = fsOf(dir)
    require(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/pairs/batch=2"),
      true))
    // the fold must cover batches 0/1 ONLY; folding the orphan in would
    // make the retry below roll back the ENTIRE folded store
    assert(ImageHashIndex.compact(spark, dir) == 2)
    val b2 = appendAt(2L, Seq(3L -> Bmp.encode(24, 18, 7L)))
    assert(b2.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 3L)),
      "the redone batch must pair against the intact folded store")
    val b3 = appendAt(3L, Seq(4L -> Bmp.encode(24, 18, 9L)))
    assert(b3.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 4L)),
      "nothing stored before the crash may be lost by the retry's rollback")
  }

  test("pairs-ledger co-compaction: listing bounded, markers preserved") {
    val dir = tmpDir()
    def appendAt(id: Long, rows: Seq[(Long, Array[Byte])]) =
      ImageHashIndex.append(spark, dir, rows.toDF("doc_id", "blob"),
        "doc_id", "blob", batchId = Some(id))
    (0 until 4).foreach(i =>
      appendAt(i.toLong, Seq((10L + i) -> Bmp.encode(24, 18, 7L))))
    val fs = fsOf(dir)
    def dataFiles(sub: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/pairs"))
        .filter(_.getPath.getName.startsWith("batch="))
        .map(d => fs.listStatus(d.getPath).count(f => f.isFile &&
          !f.getPath.getName.startsWith(".") &&
          !f.getPath.getName.startsWith("_")))
        .sum
    val before = ImageHashIndex.pairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ImageHashIndex.compact(spark, dir) == 4)
    // data files folded into ONE batch dir; every batch id still a dir
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/pairs"))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted
    assert(dirs.toSeq == Seq("batch=0", "batch=1", "batch=2", "batch=3"),
      s"marker dirs must all survive the fold: ${dirs.toSeq}")
    assert(ImageHashIndex.pairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == before,
      "the fold must not move ledger values")
    // a retry of a folded batch still no-ops (empty frame, no writes)
    assert(appendAt(1L, Seq(99L -> Bmp.encode(24, 18, 7L))).count() == 0)
    assert(ImageHashIndex.pairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == before)
    // and repeated compaction stays a no-op with a bounded listing
    assert(ImageHashIndex.compact(spark, dir) == 0)
    assert(dataFiles("pairs") >= 1)
  }
}
