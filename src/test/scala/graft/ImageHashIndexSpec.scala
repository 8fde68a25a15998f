package graft

import org.apache.spark.sql.functions._

import graft.operators.multimodal.{Bmp, ImageHash, ImageHashIndex}

/** [[ImageHashIndex]]: the invariants the q178 batching-invariance gate
  * cannot phrase — pair ATTRIBUTION (a cross-batch pair lands in the
  * later member's batch, exactly once), output FROZENNESS (a batch's
  * returned frame never changes when later appends land), and the
  * empty-store bootstrap.
  */
class ImageHashIndexSpec extends SparkSpec {
  import spark.implicits._

  private val W = 24
  private val H = 18

  private def bmp(seed: Long) = Bmp.encode(W, H, seed)

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("imghashidx").toString

  private def append(dir: String, rows: Seq[(Long, Array[Byte])]) =
    ImageHashIndex.append(spark, dir,
      rows.toDF("doc_id", "blob"), "doc_id", "blob")

  test("a cross-batch twin pairs exactly once, in the later batch") {
    val dir = tmpDir()
    val b0 = append(dir, Seq(1L -> bmp(7L), 2L -> bmp(9L)))
    assert(b0.count() == 0, "distinct images in batch 0 must not pair")
    val b1 = append(dir, Seq(3L -> bmp(7L))) // twin of stored id 1
    val p1 = b1.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(p1.toSeq == Seq((1L, 3L, 0)),
      s"the cross-batch twin must surface once, ordered by id: ${p1.toSeq}")
    // batch 0's frame is FROZEN: re-evaluating it after batch 1 landed
    // must not resurrect pairs from the grown store
    assert(b0.count() == 0,
      "an earlier batch's output must never change under later appends")
  }

  test("within-batch and cross-batch pairs coexist; union equals one-shot") {
    val dir = tmpDir()
    val day0 = Seq(1L -> bmp(1L), 2L -> bmp(2L))
    val day1 = Seq(3L -> bmp(1L), 4L -> bmp(1L), 5L -> bmp(3L))
    val union = append(dir, day0).unionByName(append(dir, day1))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = ImageHash.nearDupPairs(
      ImageHash.hashes(spark, (day0 ++ day1).toDF("doc_id", "blob"),
        "doc_id", "blob"), "doc_id")
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(union == oneShot && oneShot == Set((1L, 3L), (1L, 4L), (3L, 4L)),
      s"appends must reproduce the batch pairing: $union vs $oneShot")
  }

  test("undecodable payloads are excluded from the index") {
    val dir = tmpDir()
    append(dir, Seq(1L -> Array.fill[Byte](32)(5)))
    val b1 = append(dir, Seq(2L -> Array.fill[Byte](32)(5)))
    assert(b1.count() == 0,
      "junk payloads carry no hash and must never pair")
  }

  test("a retried applied batch no-ops on the ledger marker") {
    val dir = tmpDir()
    def appendAt(id: Long, rows: Seq[(Long, Array[Byte])]) =
      ImageHashIndex.append(spark, dir, rows.toDF("doc_id", "blob"),
        "doc_id", "blob", batchId = Some(id))
    appendAt(0L, Seq(1L -> bmp(7L)))
    appendAt(1L, Seq(2L -> bmp(7L)))
    // foreachBatch retry surface: re-apply batch 1 with DIFFERENT rows —
    // the frozen ledger must come back and the store must be untouched
    val retried = appendAt(1L, Seq(3L -> bmp(7L)))
    assert(retried.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)), "retry must return the originally-applied pairs")
    assert(ImageHashIndex.pairs(spark, dir).count() == 1,
      "a retry must not add ledger entries")
    val b2 = appendAt(2L, Seq(4L -> bmp(7L)))
    assert(b2.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 4L), (2L, 4L)),
      "the retried rows must never have entered the postings store")
  }

  test("compaction folds batch dirs; retries of pre-compaction batches still no-op") {
    val dir = tmpDir()
    def appendAt(id: Long, rows: Seq[(Long, Array[Byte])]) =
      ImageHashIndex.append(spark, dir, rows.toDF("doc_id", "blob"),
        "doc_id", "blob", batchId = Some(id))
    appendAt(0L, Seq(1L -> bmp(7L)))
    appendAt(1L, Seq(2L -> bmp(9L)))
    assert(ImageHashIndex.compact(spark, dir) == 2)
    assert(ImageHashIndex.compact(spark, dir) == 0, "idempotent re-run")
    // the ledger markers survive the fold: a retry of batch 0 no-ops
    assert(appendAt(0L, Seq(9L -> bmp(7L))).count() == 0)
    // a post-compaction append still pairs against the folded store
    val b2 = appendAt(2L, Seq(3L -> bmp(7L), 4L -> bmp(9L)))
    assert(b2.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 3L), (2L, 4L)),
      "compaction must not lose or double any stored posting")
  }

  test("a crashed partial publish (postings without the marker) rolls back and redoes") {
    val dir = tmpDir()
    ImageHashIndex.append(spark, dir, Seq(1L -> bmp(5L)).toDF("doc_id", "blob"),
      "doc_id", "blob", batchId = Some(0L))
    // simulate the crash window: batch 1's postings published, pairs
    // marker never renamed
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partial = new org.apache.hadoop.fs.Path(s"$dir/postings/batch=1")
    fs.mkdirs(partial)
    val b1 = ImageHashIndex.append(spark, dir,
      Seq(2L -> bmp(5L)).toDF("doc_id", "blob"),
      "doc_id", "blob", batchId = Some(1L))
    assert(b1.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)),
      "the redo must pair against a store WITHOUT the partial batch")
  }
}
