package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.OpCache

/** INCREMENTAL image-hash index — the image instance of the generic
  * [[BandedHashIndex]] (which carries the full publish/retry/compaction
  * protocol documentation): postings store the 41b grid dHash + aHash,
  * the dHash is banded and popcount-verified AT the delta-vs-store
  * bucket join (the load-bearing order [[ImageHash.nearDupPairs]]
  * documents), and each append's NEW pairs land in the frozen ledger
  * ordered by id. Union-of-appends ≡ one-shot batch pairing is
  * oracle-gated by q178 (manual appends), q181 (streaming) and q182
  * (compaction invariance).
  */
object ImageHashIndex {

  /** dHash banded + verified; both hams emitted per pair. */
  val spec: BandedHashIndex.Spec = BandedHashIndex.Spec("dhash",
    Seq("dhash" -> "ham_d", "ahash" -> "ham_a"))

  /** Hash + index the day's images; return the pairs NEW with this
    * batch: (a_id, b_id, ham_d, ham_a), a_id < b_id by ID (not
    * arrival). See [[BandedHashIndex.append]] for the publish protocol
    * and the `batchId` idempotence contract.
    */
  def append(spark: SparkSession, indexDir: String, images: DataFrame,
             idCol: String, blobCol: String,
             maxHamming: Int = ImageHash.DefaultMaxHamming,
             bands: Int = ImageHash.DefaultMaxHamming + 1,
             batchId: Option[Long] = None): DataFrame =
    BandedHashIndex.append(spark, indexDir,
      ImageHash.hashes(spark, images, idCol, blobCol)
        .select(col(idCol).cast("long").as("hid"), col("dhash"),
          col("ahash")),
      spec, maxHamming, bands, batchId)

  /** The full pairs LEDGER (every batch's new pairs, `batch` stripped) —
    * what downstream CC clustering consumes.
    */
  def pairs(spark: SparkSession, indexDir: String): DataFrame =
    BandedHashIndex.pairs(spark, indexDir, spec)

  /** Fold the postings batches (and the pairs ledger's data files) —
    * [[BandedHashIndex.compact]]'s retire-swap with marker-preserving
    * sentinels and orphan-safe exclusion. Returns postings dirs folded.
    */
  def compact(spark: SparkSession, indexDir: String): Int =
    BandedHashIndex.compact(spark, indexDir, spec)
}

/** INCREMENTAL audio-hash index — the sound instance of
  * [[BandedHashIndex]], closing the r19 seam where only images had an
  * incremental/streaming index (an audio append would have re-paired
  * all of history): postings store the 41g
  * [[graft.plans.EnergyDiffHash]] 56-bit energy-difference hash
  * ([[AudioHash.hashes]] — REAL javax.sound PCM16 decode), banded and
  * popcount-verified at the bucket join exactly like the image leg.
  * Union-of-appends ≡ one-shot [[AudioHash.nearDupPairs]] is
  * oracle-gated by q185 over the q173/q174 audio corpus.
  */
object AudioHashIndex {

  /** The single energy hash, banded + verified, ham emitted as ham_e. */
  val spec: BandedHashIndex.Spec = BandedHashIndex.Spec("ehash",
    Seq("ehash" -> "ham_e"))

  /** Decode + hash + index the day's recordings; return the pairs NEW
    * with this batch: (a_id, b_id, ham_e), a_id < b_id by ID. Same
    * publish/idempotence contract as the image leg
    * ([[BandedHashIndex.append]]).
    */
  def append(spark: SparkSession, indexDir: String, audio: DataFrame,
             idCol: String, blobCol: String,
             maxHamming: Int = AudioHash.DefaultMaxHamming,
             bands: Int = AudioHash.DefaultMaxHamming + 1,
             batchId: Option[Long] = None): DataFrame =
    BandedHashIndex.append(spark, indexDir,
      AudioHash.hashes(spark, audio, idCol, blobCol)
        .select(col(idCol).cast("long").as("hid"), col("ehash")),
      spec, maxHamming, bands, batchId)

  /** The full pairs LEDGER — see [[BandedHashIndex.pairs]]. */
  def pairs(spark: SparkSession, indexDir: String): DataFrame =
    BandedHashIndex.pairs(spark, indexDir, spec)

  /** See [[BandedHashIndex.compact]]. Returns postings dirs folded. */
  def compact(spark: SparkSession, indexDir: String): Int =
    BandedHashIndex.compact(spark, indexDir, spec)
}

/** INCREMENTAL video frame-hash index — the last modality onto the
  * generic [[BandedHashIndex]] protocol (the r19 verdict noted video
  * frame hashes had no incremental index; every append re-paired
  * history). The trick that preserves [[VideoHash.nearDupPairs]]'
  * share semantic EXACTLY: postings are the day's DISTINCT
  * (video, frame dHash) pairs keyed by the MINIMUM radix-packed frame
  * key (vid·100 + frame_no), so each ledger frame-pair row corresponds
  * to exactly one distinct (hash_a, hash_b) near-match — and the video
  * pair rule becomes a plain COUNT over ledger rows per video pair
  * against the share threshold ([[aggregate]]).
  *
  * Per-append completeness: a video's frames arrive atomically with
  * its day, so every frame pair of a video pair lands in the LATER
  * video's batch — each append's aggregated output is the COMPLETE
  * (a_id, b_id, n_shared) for exactly the video pairs new that day,
  * and the union over appends equals the one-shot
  * [[VideoHash.nearDupPairs]] (oracle-gated by q189 against q175's
  * replay).
  *
  * The hot-frame DF cap is enforced on each append's delta (a frame
  * hash hot WITHIN the day drops before banding); a hash that becomes
  * hot only ACROSS days keeps pairing — bounded by per-day-df·days,
  * the incremental trade, stated rather than hidden. Same-video frame
  * self-pairs the banded join may emit are dropped in [[aggregate]].
  */
object VideoHashIndex {

  /** The frame dHash, banded + verified; ham emitted as ham_d. */
  val spec: BandedHashIndex.Spec = BandedHashIndex.Spec("dhash",
    Seq("dhash" -> "ham_d"))

  /** Demux + hash + index the day's videos; return the VIDEO pairs new
    * with this batch: (a_id, b_id, n_shared), a_id < b_id, threshold
    * applied. Same publish/idempotence contract as every instance
    * ([[BandedHashIndex.append]]).
    */
  def append(spark: SparkSession, indexDir: String, videos: DataFrame,
             idCol: String, blobCol: String, frames: Int = 8,
             minShared: Int = VideoHash.DefaultMinShared,
             maxDf: Int = VideoHash.DefaultMaxDf,
             maxHamming: Int = VideoHash.DefaultMaxHamming,
             bands: Int = VideoHash.DefaultMaxHamming + 1,
             batchId: Option[Long] = None): DataFrame = {
    val fh = VideoHash.frameHashes(spark, videos, idCol, blobCol, frames)
    // one posting per distinct (video, hash), keyed by min frame key —
    // cached: feeds the day-local DF aggregate AND the cap join over
    // the whole demux+decode lineage
    val perVid = OpCache.cache(fh.filter(col("dhash").isNotNull)
      .groupBy(col(idCol).cast("long").as("vid"), col("dhash"))
      .agg(min(col(idCol).cast("long") * 100 + col("frame_no")).as("hid")))
    val capped = perVid.join(
        perVid.groupBy(col("dhash")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxDf).select(col("dhash")),
        Seq("dhash"))
      .select(col("hid"), col("dhash"))
    aggregate(
      BandedHashIndex.append(spark, indexDir, capped, spec, maxHamming,
        bands, batchId),
      minShared)
  }

  /** Ledger frame pairs → the video pair rule: count distinct
    * near-matching hash pairs (= ledger rows, by the min-fkey posting
    * construction) per video pair, threshold, same-video rows dropped.
    */
  def aggregate(framePairs: DataFrame,
                minShared: Int = VideoHash.DefaultMinShared): DataFrame =
    framePairs
      .select(expr("a_id DIV 100").as("av"), expr("b_id DIV 100").as("bv"))
      .filter(col("av") =!= col("bv"))
      .select(least(col("av"), col("bv")).as("a_id"),
        greatest(col("av"), col("bv")).as("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  /** The accumulated VIDEO pairs over the whole ledger. */
  def pairs(spark: SparkSession, indexDir: String,
            minShared: Int = VideoHash.DefaultMinShared): DataFrame =
    aggregate(BandedHashIndex.pairs(spark, indexDir, spec), minShared)

  /** See [[BandedHashIndex.compact]]. Returns postings dirs folded. */
  def compact(spark: SparkSession, indexDir: String): Int =
    BandedHashIndex.compact(spark, indexDir, spec)
}
