package graft

import org.apache.spark.sql.functions._

import graft.operators.multimodal.{Avi, BinaryPipeline, Bmp, Wav}
import graft.pipelines.MediaCurationPipeline

/** [[MediaCurationPipeline]] — the invariants the q183 oracle gate
  * cannot phrase: ladder MASS CONSERVATION (every decodable input is
  * accounted for by exactly one keeper), the rung ORDER (a cross-codec
  * exact twin and a patched perceptual twin collapse into ONE keeper
  * carrying all their mass), junk exclusion, and the SPI economics
  * (inference runs once per KEEPER — never per raw item).
  */
class MediaCurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val W = 27
  private val H = 14

  private def bmp(seed: Long) = Bmp.encode(W, H, seed)
  private def patched(seed: Long) =
    Bmp.encodePatched(W, H, seed, W / 9, H / 7, 128)

  private def embeddings = Tables.embeddings(spark, sf("0.001"))

  private def run(rows: Seq[(Long, Array[Byte])], model: String = "stub") =
    MediaCurationPipeline.run(rows.toDF("doc_id", "blob"), embeddings,
      "doc_id", "blob", threshold = 0.4, trainIters = 2,
      dims = if (model == "stub") 64 else 4, model = model)

  test("exact + perceptual rungs collapse into one keeper carrying all the mass") {
    val png = BinaryPipeline.transcode(spark,
        Seq(2L -> bmp(7L)).toDF("doc_id", "blob"), "doc_id", "blob", "png")
      .collect().head.getAs[Array[Byte]]("blob")
    val rows = Seq(
      1L -> bmp(7L),      // keeper
      2L -> png,          // exact twin (byte-disjoint codec)
      3L -> patched(7L),  // perceptual twin (Hamming <= 1)
      9L -> bmp(8L),      // unrelated
      6L -> Array.fill[Byte](32)(9)) // junk: dropped at decode
    val out = run(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 9L),
      s"exactly the two distinct pictures survive, got ${out.keySet}")
    assert(out(1L) == (3L, 2L),
      "keeper 1 carries 3 raw items across 2 perceptual members")
    assert(out(9L) == (1L, 1L))
    assert(out.values.map(_._1).sum == 4,
      "mass conservation: every decodable input accounted once")
  }

  test("SPI path: inference runs once per KEEPER, never per raw item") {
    TestBinaryEmbedder.reset()
    val rows = Seq(1L -> bmp(3L), 2L -> bmp(3L), 3L -> patched(3L),
      4L -> bmp(4L))
    val out = run(rows, model = "graft-test-binary").collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 4L))
    assert(TestBinaryEmbedder.blobsSeen.get() == 2,
      s"only the 2 keepers may pay inference, saw ${TestBinaryEmbedder.blobsSeen.get()}")
    assert(out.forall(_.isNullAt(3)), "SPI path carries no stub vec_id")
  }

  test("stub path consults the lookup table; keeper keys are its own fingerprint") {
    val out = run(Seq(1L -> bmp(11L), 2L -> bmp(12L))).collect()
    assert(out.forall(!_.isNullAt(3)), "stub path must carry vec_ids")
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("runMixed: per-modality rungs, one keeper per cluster, mass conserved") {
    val png = BinaryPipeline.transcode(spark,
        Seq(2L -> bmp(7L)).toDF("doc_id", "blob"), "doc_id", "blob", "png")
      .collect().head.getAs[Array[Byte]]("blob")
    val rows = Seq(
      // image leg: exact cross-codec twin + patched perceptual twin
      1L -> bmp(7L), 2L -> png, 3L -> patched(7L),
      // audio leg: re-headered twin (rate lives in the EXACT fp, so it
      // survives exact dedup and must collapse PERCEPTUALLY) + a
      // volume-div-4 twin caught by the energy hash
      10L -> Wav.encodeScaled(400, 8000, 5L, 1),
      11L -> Wav.encodeScaled(400, 16000, 5L, 1),
      12L -> Wav.encodeScaled(400, 8000, 5L, 4),
      // video leg: byte-identical twin (exact) + a 3-frame overlap
      // (exactly the share threshold — perceptual)
      20L -> Avi.encode(16, 12, 6, 100L),
      21L -> Avi.encode(16, 12, 6, 100L),
      22L -> Avi.encode(16, 12, 6, 103L),
      // junk: dropped at decode
      30L -> Array.fill[Byte](64)(9))
    val out = MediaCurationPipeline.runMixed(rows.toDF("doc_id", "blob"),
        embeddings, "doc_id", "blob", threshold = 0.4, trainIters = 2,
        dims = 64)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet == Set(1L, 10L, 20L),
      s"one keeper per modality cluster, got ${out.keySet}")
    assert(out(1L) == ("image", 3L, 2L),
      s"image keeper: 3 raw items over 2 perceptual members: ${out(1L)}")
    assert(out(10L) == ("audio", 3L, 3L),
      s"audio keeper: re-headered + scaled twins collapse perceptually: ${out(10L)}")
    assert(out(20L) == ("video", 3L, 2L),
      s"video keeper: exact twin + threshold overlap: ${out(20L)}")
    assert(out.values.map(_._2).sum == 9,
      "mass conservation: every decodable input accounted exactly once")
  }
}
