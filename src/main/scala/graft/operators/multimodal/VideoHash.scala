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
  *     distinct frame dHashes: an equality join on the 56-bit hash (the
  *     q21 shingle posting shape at frame grain), count per ordered
  *     pair, threshold. A re-encoded/re-containerized copy shares every
  *     sampled frame hash; a clip overlapping part of the footage
  *     shares the overlap; unrelated videos share none (2⁻⁵⁶ background
  *     collisions).
  *
  * Hot-frame cap: a frame hash appearing in more than `maxDf` videos
  * (test patterns, black frames, station cards) would emit df² pairs —
  * the DF cap drops those postings before the join, the same
  * subquadratic guard every shingle pipeline here carries. Dropping a
  * hot frame can only LOSE pairs that share nothing else — the
  * documented trade (q21's contract).
  *
  * Scale shape: demux+decode+hash is one narrow CPU pass, ≤ k frames
  * per video regardless of footage length (sampling, not exhaustive
  * demux); the pair join shuffles (hash, vid) postings — ≤ k·n rows;
  * pair output is bounded by duplicate-group structure, never all-pairs.
  */
object VideoHash {

  /** Minimum shared distinct frame hashes for a video pair. */
  val DefaultMinShared = 3

  /** Hot-frame document-frequency cap. */
  val DefaultMaxDf = 64

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

  /** Video pairs sharing ≥ minShared distinct frame dHashes:
    * (a_id, b_id, n_shared), a_id < b_id, hot frames (document
    * frequency > maxDf) dropped before pairing.
    */
  def nearDupPairs(frameHashes: DataFrame, idCol: String,
                   minShared: Int = DefaultMinShared,
                   maxDf: Int = DefaultMaxDf): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    // distinct (video, hash): repeated identical frames within one video
    // count once toward the share rule
    val fh = frameHashes.filter(col("dhash").isNotNull)
      .select(col(idCol).as("vid"), col("dhash")).distinct()
    val kept = fh.join(
      fh.groupBy(col("dhash")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf).select(col("dhash")),
      Seq("dhash"))
    // one row per (pair, shared hash) — fh is distinct, so plain count
    kept.select(col("dhash"), col("vid").as("a_id"))
      .join(kept.select(col("dhash"), col("vid").as("b_id")), Seq("dhash"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
