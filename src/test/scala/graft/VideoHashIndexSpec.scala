package graft

import org.apache.spark.sql.functions._

import graft.operators.multimodal.{Avi, VideoHash, VideoHashIndex}

/** [[VideoHashIndex]] — the frame-grain instance of the generic banded
  * index: cross-day pairing with complete per-append share counts,
  * same-video self-pair exclusion, and the DAY-LOCAL df-cap trade the
  * scaladoc states (a frame hot only across days keeps pairing).
  */
class VideoHashIndexSpec extends SparkSpec {
  import spark.implicits._

  private def avi(base: Long, frames: Int = 6) = Avi.encode(16, 12, frames, base)

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("vidhashidx").toString

  private def append(dir: String, rows: Seq[(Long, Array[Byte])],
                     maxDf: Int = VideoHash.DefaultMaxDf) =
    VideoHashIndex.append(spark, dir, rows.toDF("doc_id", "blob"),
      "doc_id", "blob", frames = 8, maxDf = maxDf)

  test("cross-day twins pair once, in the later day, with COMPLETE counts") {
    val dir = tmpDir()
    assert(append(dir, Seq(1L -> avi(100L))).count() == 0,
      "a lone day-0 video has nothing to pair with")
    val d1 = append(dir, Seq(2L -> avi(100L), 3L -> avi(103L))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 2 shares all 6 frames with STORED 1; 3 overlaps both in exactly 3
    // (the threshold); every count is complete in the later day's output
    assert(d1 == Set((1L, 2L, 6L), (1L, 3L, 3L), (2L, 3L, 3L)),
      s"delta-vs-store and delta-vs-delta video pairs: $d1")
  }

  test("same-video frame self-pairs are dropped at the video aggregate") {
    // radix frame keys: 101/102 are frames of video 1; a banded join may
    // emit their near-match, but a video must never pair with itself
    val fp = Seq((101L, 102L, 0), (201L, 305L, 1), (202L, 306L, 0),
      (203L, 307L, 2)).toDF("a_id", "b_id", "ham_d")
    val p = VideoHashIndex.aggregate(fp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(p == Set((2L, 3L, 3L)), s"only the cross-video pair counts: $p")
  }

  test("the DF cap is day-local: a frame hot only ACROSS days keeps pairing") {
    // 5 identical videos in ONE day at cap 4: every frame hash hot, no pairs
    val dirA = tmpDir()
    assert(append(dirA, (1L to 5L).map(i => i -> avi(500L)), maxDf = 4)
      .count() == 0, "within-day hot frames must drop")
    // the same 5 split 3+2: each day's df stays under the cap, so all 10
    // pairs surface — the documented incremental trade, pinned
    val dirB = tmpDir()
    val u = append(dirB, (1L to 3L).map(i => i -> avi(500L)), maxDf = 4)
      .unionByName(append(dirB, (4L to 5L).map(i => i -> avi(500L)), maxDf = 4))
    assert(u.count() == 10,
      "cross-day hotness is invisible to the day-local cap (stated trade)")
  }

  test("a retried applied day no-ops on the ledger marker") {
    val dir = tmpDir()
    def at(id: Long, rows: Seq[(Long, Array[Byte])]) =
      VideoHashIndex.append(spark, dir, rows.toDF("doc_id", "blob"),
        "doc_id", "blob", frames = 8, batchId = Some(id))
    at(0L, Seq(1L -> avi(700L)))
    at(1L, Seq(2L -> avi(700L)))
    val retried = at(1L, Seq(3L -> avi(700L)))
    assert(retried.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)), "retry must return the originally-applied video pairs")
    assert(VideoHashIndex.pairs(spark, dir).count() == 1,
      "the retried rows must never have entered the index")
  }
}
