package graft

import org.apache.spark.sql.functions._

import graft.operators.multimodal.{Avi, VideoHash}

/** [[VideoHash]]: the invariants the q175 oracle gate cannot phrase —
  * the share-threshold boundary (≥ k caught, k−1 rejected), the within-
  * video distinct rule, the hot-frame DF cap, and the stub exclusion
  * for non-video payloads.
  */
class VideoHashSpec extends SparkSpec {
  import spark.implicits._

  private val W = 16
  private val H = 12

  /** 6-frame AVI whose frame seeds are base..base+5. */
  private def avi(base: Long, frames: Int = 6) = Avi.encode(W, H, frames, base)

  private def pairsOf(rows: Seq[(Long, Array[Byte])],
                      minShared: Int = VideoHash.DefaultMinShared,
                      maxDf: Int = VideoHash.DefaultMaxDf) =
    VideoHash.nearDupPairs(
      VideoHash.frameHashes(spark, rows.toDF("doc_id", "blob"),
        "doc_id", "blob", frames = 8),
      "doc_id", minShared, maxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("share threshold: >= minShared frames pair, fewer do not") {
    // video 1: frames 0..5; video 2: frames 3..8 (3 shared = threshold);
    // video 3: frames 4..9 (2 shared with video 1 - rejected; 5 shared
    // with video 2 - caught)
    val p = pairsOf(Seq(1L -> avi(0L), 2L -> avi(3L), 3L -> avi(4L)))
    assert(p == Set((1L, 2L, 3L), (2L, 3L, 5L)),
      s"expected the 3- and 5-frame overlaps only, got $p")
  }

  test("identical footage pairs at the full sampled frame count") {
    val p = pairsOf(Seq(1L -> avi(100L), 2L -> avi(100L)))
    assert(p == Set((1L, 2L, 6L)))
  }

  test("repeated identical frames within one video count once") {
    // both videos are 6 frames of ONE image (frame seeds all equal via
    // frames=1 re-encoded 6x would need a custom writer; instead use a
    // 1-frame video against a 6-frame video sharing that frame: the
    // 1-frame twin shares exactly 1 distinct hash, below threshold)
    val single = avi(200L, frames = 1)
    val six = avi(200L, frames = 6)
    assert(pairsOf(Seq(1L -> single, 2L -> six)).isEmpty,
      "one shared distinct frame must stay below the threshold")
    assert(pairsOf(Seq(1L -> single, 2L -> six), minShared = 1) ==
      Set((1L, 2L, 1L)),
      "at minShared=1 the single shared frame pairs exactly once")
  }

  test("hot-frame DF cap drops a frame shared by too many videos") {
    // five videos all containing frames base..base+5: every pair shares
    // 6 hashes; with maxDf = 4 < 5 every frame hash is hot and dropped
    val rows = (1L to 5L).map(i => i -> avi(300L))
    assert(pairsOf(rows, maxDf = 4).isEmpty,
      "all-hot frames must produce no pairs")
    assert(pairsOf(rows).size == 10, "under the cap all 10 pairs surface")
  }

  test("non-video payloads contribute no frames and never pair") {
    val junk = Array.fill[Byte](512)(7)
    val fh = VideoHash.frameHashes(spark,
      Seq(1L -> junk, 2L -> junk).toDF("doc_id", "blob"),
      "doc_id", "blob", frames = 8)
    assert(fh.count() == 0,
      "stub byte-slices must not reach the hash stage")
  }

  test("frame count outside the radix digit is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      VideoHash.frameHashes(spark,
        Seq(1L -> avi(0L)).toDF("doc_id", "blob"), "doc_id", "blob",
        frames = 100)
    }
    assert(e.getMessage.contains("radix"))
  }
}
