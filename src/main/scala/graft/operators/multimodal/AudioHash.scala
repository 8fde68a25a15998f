package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.plans.EnergyDiffHash

/** One decoded energy-profile row ([[AudioHash.energies]]); stub rows
  * (undecodable / shorter than one sample per window) carry None.
  */
final case class AudioEnergyRow(doc_id: Long, sample_rate: Option[Int],
    n_samples: Option[Long], energy: Option[Array[Long]])

/** AUDIO perceptual-hash near-duplication — the sound leg of the
  * multimodal dedup family (SURVEY §2 item 41g), completing what 41b/41c
  * did for images: [[graft.pipelines.BinaryEmbeddingPipeline]]'s audio
  * identity is EXACT (a fingerprint over the verbatim PCM16 samples), so
  * a volume-scaled or re-headered copy of the same recording fingerprints
  * differently — precisely the near-miss a perceptual hash exists to
  * collapse. The design restricts the chromaprint idea to integer ops so
  * an external engine replays every bit from the raw WAV bytes:
  *
  *  1. [[energies]] — REAL decode through `javax.sound.sampled`
  *     ([[BinaryPipeline.audioFeatures]]' codec path: format negotiation
  *     + frame accounting, 16-bit mono PCM only), reduced to a fixed
  *     [[graft.plans.EnergyDiffHash.Windows]]-entry ENERGY PROFILE:
  *     window w covers samples [w·n DIV W, (w+1)·n DIV W) and scores
  *     Σ|s| (exact int64 — n·32768 stays far under 2^63 for any real
  *     payload).
  *  2. [[hashes]] — the [[graft.plans.EnergyDiffHash]] codegen
  *     expression folds the profile into a 56-bit difference hash
  *     (bit b ⇔ E[b+1] > E[b]) inside whole-stage codegen.
  *  3. [[nearDupPairs]] — the SAME banded Hamming retrieval the image
  *     leg proved ([[ImageHash.bandedIdPairs]]): exact at
  *     maxHamming < bands by pigeonhole, ids-only through the band join
  *     and candidate distinct.
  *
  * What the hash is invariant to, honestly: amplitude scaling and
  * re-encoding/re-headering preserve energy COMPARISONS exactly or
  * near-exactly (a truncating integer volume scale can flip a bit where
  * two windows' energies nearly tie — radius 2 absorbs it); a genuine
  * resample preserves the time-local energy profile of STRUCTURED audio
  * (speech/music), though not of synthetic white noise, whose profile
  * is all ties. A different recording shares ~28 of 56 bits in
  * expectation — far outside any sane radius.
  *
  * Scale shape: decode + profile is one narrow CPU pass (no shuffle);
  * banding shuffles bands·n (id, band, key) rows; background collisions
  * on ~19-bit band keys stay subquadratic to ~1.5M distinct recordings
  * per band population (the 41c arithmetic, identical).
  */
object AudioHash {

  /** Hash width in bits. */
  val Bits: Int = EnergyDiffHash.Bits

  /** Default Hamming radius / band count — the image leg's proven
    * setting: 3 bands of ⌈56/3⌉ bits, exact at radius 2.
    */
  val DefaultMaxHamming = 2

  /** (idCol, sample_rate, n_samples, energy) — one row per input;
    * payloads the audio codec rejects, non-PCM16/non-mono formats and
    * streams shorter than one sample per window carry null features
    * (the [[BinaryPipeline]] stub-labeling contract: never fail the
    * task on a corrupt payload).
    */
  def energies(spark: SparkSession, df: DataFrame, idCol: String,
               blobCol: String): DataFrame = {
    import spark.implicits._
    val w = EnergyDiffHash.Windows
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        decodeProfile(blob) match {
          case Some((rate, n, e)) =>
            AudioEnergyRow(id, Some(rate), Some(n), Some(e))
          case None => AudioEnergyRow(id, None, None, None)
        }
      })
      .toDF()
      .withColumnRenamed("doc_id", idCol)
  }

  /** (sampleRate, nSamples, window energies) via the real AudioSystem
    * decode; None when no reader accepts the payload, it is not 16-bit
    * mono PCM, or n < Windows (no way to fill every window).
    */
  private[multimodal] def decodeProfile(blob: Array[Byte])
      : Option[(Int, Long, Array[Long])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(blob))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.getSampleRate <= 0) return None
        val bytes = in.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(bytes).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = bytes.length / 2
        val w = EnergyDiffHash.Windows
        if (n < w) return None
        val e = new Array[Long](w)
        var i = 0
        // window index by the SAME integer split the oracle replays:
        // sample i belongs to window floor(i·W/n) — equivalently window
        // w spans [w·n DIV W, (w+1)·n DIV W); walk boundaries instead of
        // dividing per sample
        var win = 0
        var boundary = (1L * n / w).toInt // exclusive end of window 0
        while (i < n) {
          while (i >= boundary) { win += 1; boundary = ((win + 1).toLong * n / w).toInt }
          val s = bb.getShort.toLong
          e(win) += math.abs(s)
          i += 1
        }
        Some((fmt.getSampleRate.toInt, n.toLong, e))
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => None // corrupt: stub path
    }

  /** (idCol, sample_rate, n_samples, ehash): [[energies]] folded by the
    * codegen difference hash; null profile → null hash.
    */
  def hashes(spark: SparkSession, df: DataFrame, idCol: String,
             blobCol: String): DataFrame =
    energies(spark, df, idCol, blobCol)
      .select(col(idCol), col("sample_rate"), col("n_samples"),
        ColumnBridge.column(EnergyDiffHash(
          ColumnBridge.expression(col("energy")))).as("ehash"))

  /** Exact Hamming-≤maxHamming pairs via band-bucket retrieval over the
    * ehash: (a_id, b_id, ham_e), a_id < b_id, undecodable rows (null
    * hash) excluded. Same exactness argument as the image leg
    * (maxHamming < bands ⇒ pigeonhole), same ids-only candidate path.
    */
  def nearDupPairs(hashes: DataFrame, idCol: String,
                   maxHamming: Int = DefaultMaxHamming,
                   bands: Int = DefaultMaxHamming + 1): DataFrame = {
    require(bands >= 1 && bands <= Bits, s"bands in [1,$Bits], got $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"banded retrieval is exact only for maxHamming < bands, " +
        s"got maxHamming=$maxHamming bands=$bands")
    // cached: the banded frame feeds both join sides over the whole
    // decode+profile lineage — one decode pass, guaranteed
    val h = graft.operators.OpCache.cache(
      hashes.filter(col("ehash").isNotNull)
        .select(col(idCol).as("hid"), col("ehash")))
    // verify AT the band join, dedup the post-cut narrow projection —
    // the load-bearing order ImageHash.nearDupPairs documents (the 100×
    // probe measured a 25× candidate-to-pair ratio on correlated
    // corpora; deduping pre-cut pushes all of it through the exchange)
    val banded = ImageHash.bandedPostings(h, "hid", bands, hashCol = "ehash")
    val a = banded.select(col("band"), col("key"), col("hid").as("a_id"),
      col("ehash").as("a_e"))
    val b = banded.select(col("band"), col("key"), col("hid").as("b_id"),
      col("ehash").as("b_e"))
    a.join(b, Seq("band", "key"))
      .filter(col("a_id") < col("b_id") &&
        bit_count(col("a_e").bitwiseXOR(col("b_e"))) <= maxHamming)
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_e").bitwiseXOR(col("b_e"))).cast("int").as("ham_e"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(min(col("ham_e")).as("ham_e"))
  }
}
