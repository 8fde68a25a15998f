package graft

import org.apache.spark.sql.functions._

import graft.operators.multimodal.{Avi, VideoHash}

/** [[VideoHash]]: the invariants the q175 oracle gate cannot phrase —
  * the share-threshold boundary (≥ k caught, k−1 rejected), the within-
  * video distinct rule, the hot-frame DF cap, the stub exclusion for
  * non-video payloads, and (round 20) the frame-level Hamming ball: a
  * re-encode that perturbs a sampled frame by ≤ 2 bits keeps that
  * frame's vote, a 3-bit perturbation loses exactly it.
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

  // three far-apart 56-bit frame hashes for the synthetic-hash tests
  private val h1 = 0x123456789abcdL
  private val h2 = 0x0fedcba987654L
  private val h3 = 0x0a5a5a5a5a5a5L

  private def syntheticPairs(rows: Seq[(Long, Int, Long)],
                             minShared: Int = VideoHash.DefaultMinShared) = {
    val fh = rows.map { case (vid, f, h) => (vid, f, h, h) }
      .toDF("doc_id", "frame_no", "dhash", "ahash")
    VideoHash.nearDupPairs(fh, "doc_id", minShared)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("a frame perturbed within the Hamming radius keeps its vote") {
    // video 2 re-encodes video 1 with a 1-bit and a 2-bit frame drift:
    // the r19 exact-equality rule would count only the untouched frame
    // (1 < 3) and silently lose the pair
    val rows =
      Seq((1L, 0, h1), (1L, 1, h2), (1L, 2, h3),
        (2L, 0, h1 ^ 1L), (2L, 1, h2 ^ 0x11L), (2L, 2, h3))
    assert(syntheticPairs(rows) == Set((1L, 2L, 3L)),
      "radius-2 perturbed frames must keep their votes")
  }

  test("a frame perturbed beyond the radius loses exactly its vote") {
    val rows =
      Seq((1L, 0, h1), (1L, 1, h2), (1L, 2, h3),
        (3L, 0, h1 ^ 7L), (3L, 1, h2), (3L, 2, h3)) // 3 bits: outside
    assert(syntheticPairs(rows).isEmpty,
      "2 surviving votes must stay below the threshold of 3")
    assert(syntheticPairs(rows, minShared = 2) == Set((1L, 3L, 2L)),
      "only the out-of-radius frame's vote is lost, not the pair's others")
  }

  test("the DF cap keys on the exact hash; near-variants keep voting") {
    // h1 is hot (4 videos); video 10's 1-bit variant of h1 is NOT hot
    // and still votes toward its pair with video 11
    val hot = (20L to 23L).flatMap(v => Seq((v, 0, h1)))
    val rows = hot ++ Seq(
      (10L, 0, h1 ^ 1L), (10L, 1, h2), (10L, 2, h3),
      (11L, 0, h1 ^ 1L), (11L, 1, h2), (11L, 2, h3))
    val fh = rows.map { case (vid, f, h) => (vid, f, h, h) }
      .toDF("doc_id", "frame_no", "dhash", "ahash")
    val p = VideoHash.nearDupPairs(fh, "doc_id", maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(p == Set((10L, 11L, 3L)),
      s"the hot exact hash drops, its near-variant still votes: $p")
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
