package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VIDEO near-duplication via frame-sample hashing — the last undeduped
  * modality (SURVEY §2 item 41h): [[BinaryPipeline.frameSample]] already
  * demuxes REAL AVI into decoded frames (q96), and 41b gave frames a
  * perceptual hash — this composes them into a video-level pair rule:
  *
  *  1. [[frameHashes]] — sample ≤ k evenly spaced frames per video
  *     (REAL decode only; stub-sliced payloads are excluded — hashing
  *     arbitrary byte windows would manufacture fake dups), re-wrapped
  *     as standalone BMPs by the demuxer, then hashed by the 41b
  *     pipeline ([[ImageHash.hashes]] over a radix-packed key, the q96
  *     discipline).
  *  2. [[nearDupPairs]] — two videos pair when they share ≥ `minShared`
  *     NEAR-matching frame hashes: per-frame candidates ride the SAME
  *     banded Hamming retrieval the image leg proved (41c — exact at
  *     maxHamming < bands by pigeonhole), and distinct matching
  *     hash-pairs count toward the share threshold. An exact re-encode
  *     shares every sampled frame hash at distance 0; a re-encode that
  *     perturbs a frame by 1–2 grid comparisons KEEPS that frame's vote
  *     (the r19 exact-equality rule silently lost it); a clip
  *     overlapping part of the footage shares the overlap; unrelated
  *     videos share nothing (the 41c band-collision arithmetic).
  *
  * Hot-frame cap: a frame hash appearing in more than `maxDf` videos
  * (test patterns, black frames, station cards) would emit df² pairs —
  * the DF cap drops those postings before the join, the same
  * subquadratic guard every shingle pipeline here carries. The cap keys
  * on the EXACT hash value; dropping a hot frame can only LOSE pairs
  * that share nothing else — the documented trade (q21's contract).
  *
  * Scale shape: demux+decode+hash is one narrow CPU pass, ≤ k frames
  * per video regardless of footage length (sampling, not exhaustive
  * demux); the pair join shuffles bands·(distinct frame-hash postings)
  * — ≤ bands·k·n rows, popcount-verified AT the bucket join (the
  * load-bearing order [[ImageHash.nearDupPairs]] documents); pair
  * output is bounded by duplicate-group structure, never all-pairs.
  */
object VideoHash {

  /** Minimum shared distinct frame hashes for a video pair. */
  val DefaultMinShared = 3

  /** Hot-frame document-frequency cap. */
  val DefaultMaxDf = 64

  /** Default per-frame Hamming radius — the image leg's proven setting
    * (3 bands of ⌈56/3⌉ bits, exact at radius 2).
    */
  val DefaultMaxHamming = 2

  /** (idCol, frame_no, dhash, ahash) — one row per REAL-decoded sampled
    * frame; videos the demuxer rejects contribute no rows (their stub
    * byte-slices are not frames and must not hash).
    */
  def frameHashes(spark: SparkSession, df: DataFrame, idCol: String,
                  blobCol: String, frames: Int): DataFrame = {
    require(frames >= 1 && frames < 100,
      s"frames in [1,100) — the radix-100 key packing's digit, got $frames")
    val sampled = BinaryPipeline
      .frameSample(spark, df, idCol, blobCol, frames)
      .filter(col("source") =!= "bytes-stub")
    // radix-100 packing (the q96 discipline): loudly asserted in-plan
    // rather than silently digit-overlapping if the sampler ever widens
    val keyed = sampled.select(
      when(col("frame_no") < 100, col(idCol) * 100 + col("frame_no"))
        .otherwise(raise_error(lit(
          "VideoHash fkey packing overflow: widen the radix")))
        .as("fkey"),
      col("frame_bytes"))
    ImageHash.hashes(spark, keyed, "fkey", "frame_bytes")
      .select(expr("fkey DIV 100").as(idCol),
        (col("fkey") % 100).cast("int").as("frame_no"),
        col("dhash"), col("ahash"))
  }

  /** Video pairs sharing ≥ minShared NEAR-matching frame hashes:
    * (a_id, b_id, n_shared), a_id < b_id. `n_shared` counts DISTINCT
    * (a-side hash, b-side hash) pairs within Hamming ≤ maxHamming; at
    * maxHamming = 0 this degenerates to the r19 exact shared-hash rule.
    * Retrieval is the 41c banded discipline at FRAME grain: the
    * popcount verify executes AT the bucket join, and the multi-band
    * dedup + share count fold into ONE count_distinct aggregate over
    * the post-cut narrow (hash, hash) projection — the measured
    * load-bearing order. Hot frames (EXACT-hash document frequency >
    * maxDf) drop before banding; their near-variants keep voting.
    */
  def nearDupPairs(frameHashes: DataFrame, idCol: String,
                   minShared: Int = DefaultMinShared,
                   maxDf: Int = DefaultMaxDf,
                   maxHamming: Int = DefaultMaxHamming,
                   bands: Int = DefaultMaxHamming + 1): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    require(bands >= 1 && bands <= ImageHash.Bits,
      s"bands in [1,${ImageHash.Bits}], got $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"banded retrieval is exact only for maxHamming < bands, " +
        s"got maxHamming=$maxHamming bands=$bands")
    // distinct (video, hash): repeated identical frames within one video
    // count once toward the share rule. Cached — it feeds the DF
    // aggregate AND the posting build over the whole decode lineage
    val fh = graft.operators.OpCache.cache(
      frameHashes.filter(col("dhash").isNotNull)
        .select(col(idCol).as("vid"), col("dhash")).distinct())
    // cached: the capped postings feed both band-join sides
    val kept = graft.operators.OpCache.cache(fh.join(
      fh.groupBy(col("dhash")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf).select(col("dhash")),
      Seq("dhash")))
    val banded = ImageHash.bandedPostings(kept, "vid", bands)
    val a = banded.select(col("band"), col("key"), col("vid").as("a_id"),
      col("dhash").as("a_h"))
    val b = banded.select(col("band"), col("key"), col("vid").as("b_id"),
      col("dhash").as("b_h"))
    a.join(b, Seq("band", "key"))
      .filter(col("a_id") < col("b_id") &&
        bit_count(col("a_h").bitwiseXOR(col("b_h"))) <= maxHamming)
      .groupBy(col("a_id"), col("b_id"))
      .agg(count_distinct(struct(col("a_h"), col("b_h"))).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
