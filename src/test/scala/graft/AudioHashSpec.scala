package graft

import org.apache.spark.sql.functions._

import graft.operators.multimodal.{AudioHash, Wav}
import graft.plans.EnergyDiffHash

/** [[AudioHash]]: the invariants the q173/q174 oracle gates cannot
  * phrase — byte-disjoint re-headered twins hash identically, a
  * volume-scaled twin is CAUGHT while a distinct recording is NOT, the
  * hand-computable ramp hash, and the stub contract for undecodable /
  * non-PCM16 / too-short payloads.
  */
class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  private val N = 400

  private def wav(seed: Long, rate: Int = 8000, div: Int = 1) =
    Wav.encodeScaled(N, rate, seed, div)

  private def hashOf(rows: Seq[(Long, Array[Byte])]) =
    AudioHash.hashes(spark, rows.toDF("doc_id", "blob"), "doc_id", "blob")

  test("re-headered twins (different rate) are byte-disjoint yet hash identically") {
    val a = wav(7L, rate = 8000)
    val b = wav(7L, rate = 16000)
    assert(!java.util.Arrays.equals(a, b), "different rates must differ in bytes")
    val h = hashOf(Seq(1L -> a, 2L -> b, 3L -> wav(9L)))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(3))).toMap
    assert(h(1L)._1 == 8000 && h(2L)._1 == 16000,
      "the real decode must surface each header's rate")
    assert(h(1L)._2 == h(2L)._2,
      "identical samples under different headers must hash identically")
    assert(h(1L)._2 != h(3L)._2, "distinct recordings must differ")
  }

  test("a volume-scaled twin is caught; a distinct recording is not") {
    val rows = Seq(10L -> wav(5L), 11L -> wav(5L, div = 4), 20L -> wav(6L))
    val pairs = AudioHash.nearDupPairs(hashOf(rows), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.map(p => (p._1, p._2)) == Set((10L, 11L)),
      s"expected exactly the quieter twin pair, got $pairs")
    assert(pairs.head._3 <= AudioHash.DefaultMaxHamming)
  }

  test("a strictly ramping recording sets every difference bit") {
    // |sample| grows with the window index: sample i = i/4 (all
    // nonnegative, N/57 >= 4 samples per window), so window energies
    // strictly increase and all 56 bits set
    val n = 57 * 4
    val b = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(Wav.encodeScaled(1, 8000, 0L, 1), 0, 44) // reuse a canonical header
    b.position(4); b.putInt(36 + 2 * n)            // RIFF size
    b.position(40); b.putInt(2 * n)                // data size
    b.position(44)
    (0 until n).foreach(i => b.putShort((i / 4).toShort))
    val h = hashOf(Seq(100L -> b.array())).head()
    assert(h.getLong(3) == (1L << 56) - 1,
      s"ramp ehash must be all-ones, got ${h.getLong(3).toHexString}")
  }

  /** A WAV with caller-supplied samples — the canonical header with
    * patched sizes (the ramp test's trick, factored).
    */
  private def wavOf(samples: Array[Short], rate: Int): Array[Byte] = {
    val n = samples.length
    val b = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(Wav.encodeScaled(1, rate, 0L, 1), 0, 44)
    b.position(4); b.putInt(36 + 2 * n)
    b.position(40); b.putInt(2 * n)
    b.position(44)
    samples.foreach(b.putShort)
    b.array()
  }

  test("a genuine 2:1 resample of STRUCTURED audio stays within the radius") {
    // The scaladoc claims resample robustness for structured audio
    // (time-local energy), not white noise — measure it: a slow
    // amplitude envelope (2.3 cycles across the 57 windows, adjacent
    // window means separated by >> the discretization noise), decimated
    // 2:1 with time alignment preserved. Window w of both signals
    // covers the same TIME span, so the energy comparisons — and hence
    // the hash — must survive the sample-rate change.
    val n = 11400 // 200 samples/window full, 100 decimated
    def env(t: Double): Double = 600.0 + 500.0 * math.sin(2 * math.Pi * 2.3 * t)
    val full = Array.tabulate(n)(i =>
      (env(i.toDouble / n) * (if (i % 2 == 0) 1 else -1)).toShort)
    val half = Array.tabulate(n / 2)(j => full(2 * j))
    val h = hashOf(Seq(1L -> wavOf(full, 16000), 2L -> wavOf(half, 8000)))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val d = java.lang.Long.bitCount(h(1L) ^ h(2L))
    assert(d <= AudioHash.DefaultMaxHamming,
      s"2:1 decimation drifted $d bits — outside the banded radius")
    // and the banded retrieval actually pairs them
    val pairs = AudioHash.nearDupPairs(
      hashOf(Seq(1L -> wavOf(full, 16000), 2L -> wavOf(half, 8000))),
      "doc_id").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)),
      "the resampled twin must surface as a near-dup pair")
  }

  test("undecodable, non-mono-PCM16 and too-short payloads carry null hashes and never pair") {
    val junk = Array.fill[Byte](64)(42)
    val short = Wav.encodeScaled(EnergyDiffHash.Windows - 1, 8000, 3L, 1)
    val rows = hashOf(Seq(1L -> wav(3L), 2L -> junk, 3L -> short))
    val byId = rows.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).isNullAt(1) && byId(2L).isNullAt(3), "junk -> null")
    assert(byId(3L).isNullAt(3),
      "fewer samples than windows cannot fill a profile")
    assert(AudioHash.nearDupPairs(rows, "doc_id").count() == 0)
  }

  test("banded retrieval rejects maxHamming >= bands loudly") {
    val e = intercept[IllegalArgumentException] {
      AudioHash.nearDupPairs(hashOf(Seq(1L -> wav(1L))), "doc_id",
        maxHamming = 3, bands = 3)
    }
    assert(e.getMessage.contains("exact only for maxHamming < bands"))
  }
}
