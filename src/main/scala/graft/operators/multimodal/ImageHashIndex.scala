package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
