package graft

import org.apache.spark.sql.functions._

import graft.operators.multimodal.{BinaryPipeline, Bmp}
import graft.pipelines.{BinaryEmbeddingPipeline, Embedders}

/** The [[graft.pipelines.BinaryEmbedder]] SPI (pluggable bytes→vector
  * inference for the q168 chain): with [[TestBinaryEmbedder]] on the
  * test classpath, passing its key routes the embed stage through
  * partition-side batch inference over (payload, sniffed mime) — the
  * stub lookup is never consulted — while the default key keeps the
  * deterministic stub the q168 oracle replays. Plus the contract the
  * gate exercises indirectly: content dedup groups BYTE-DISJOINT
  * re-encodes of one picture on BOTH paths.
  */
class BinaryEmbedderSpiSpec extends SparkSpec {
  import spark.implicits._

  private val dummyLookup = Seq((0L, Seq(1.0f, 0f, 0f, 0f)))
    .toDF("vec_id", "embedding")

  private def runChain(media: org.apache.spark.sql.DataFrame, model: String) =
    BinaryEmbeddingPipeline.run(media, dummyLookup, "doc_id", "blob",
      threshold = 0.9, trainIters = 1, dims = 4, model = model)

  test("ServiceLoader discovers the test binary embedder per JVM") {
    assert(Embedders.byModelBinary.contains("graft-test-binary"))
    assert(!Embedders.byModelBinary.contains(BinaryEmbeddingPipeline.StubModel))
  }

  test("registered model upgrades the embed stage; near-dups flow from REAL decoded content") {
    TestBinaryEmbedder.reset()
    // docs 1 and 2: different pixels (different seeds → different content
    // fingerprints, so exact dedup CANNOT merge them) but the SAME width
    // → TestBinaryEmbedder gives them one vector → semantic dedup drops
    // the higher id; doc 3 has a different width (mod 4) and survives
    val media = Seq(
      (1L, Bmp.encode(16, 12, 1L)),
      (2L, Bmp.encode(16, 12, 2L)),
      (3L, Bmp.encode(19, 12, 3L)))
      .toDF("doc_id", "blob")
    val out = runChain(media, "graft-test-binary")
      .select("doc_id", "n_dups", "vec_id", "kept").collect()
    assert(TestBinaryEmbedder.calls.get() > 0, "embedder never invoked")
    assert(TestBinaryEmbedder.blobsSeen.get() == 3L)
    assert(TestBinaryEmbedder.mimes.contains("image/bmp"),
      "sniffed mime must ride into the batch")
    assert(out.forall(_.isNullAt(2)), "no stub lookup: honest null vec_id")
    assert(out.forall(_.getLong(1) == 1L), "three distinct contents")
    val kept = out.map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(kept(1L) && !kept(2L) && kept(3L),
      s"same-width images must collapse semantically, got $kept")
  }

  test("unregistered model keeps the deterministic stub join") {
    TestBinaryEmbedder.reset()
    val media = Seq((1L, Bmp.encode(16, 12, 1L)), (2L, Bmp.encode(20, 14, 2L)))
      .toDF("doc_id", "blob")
    val out = runChain(media, BinaryEmbeddingPipeline.StubModel)
      .select("doc_id", "vec_id").collect()
    assert(TestBinaryEmbedder.calls.get() == 0, "stub path must not run inference")
    assert(out.nonEmpty && out.forall(r => !r.isNullAt(1) && r.getLong(1) == 0L))
  }

  test("byte-disjoint re-encodes of one picture form ONE content group") {
    val bmp = Seq((1L, Bmp.encode(16, 12, 7L))).toDF("doc_id", "blob")
    val png = BinaryPipeline.transcode(spark,
        Seq((2L, Bmp.encode(16, 12, 7L))).toDF("doc_id", "blob"),
        "doc_id", "blob", "png")
      .select(col("doc_id"), col("blob"))
    val out = runChain(bmp.unionByName(png), BinaryEmbeddingPipeline.StubModel)
      .select("doc_id", "n_dups").collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L &&
      out.head.getLong(1) == 2L,
      "BMP and its PNG twin must collapse into one min-id content group")
  }

  test("audio twins collapse by decoded samples; modalities never collide") {
    import graft.operators.multimodal.Wav
    val media = Seq(
      (1L, Wav.encode(100, 8000, 5L)),
      (2L, Wav.encode(100, 8000, 5L)), // identical samples → one group
      (3L, Wav.encode(100, 8000, 6L)), // distinct samples → own group
      (4L, Bmp.encode(16, 12, 5L)))    // an image never merges with audio
      .toDF("doc_id", "blob")
    val out = runChain(media, BinaryEmbeddingPipeline.StubModel)
      .select("doc_id", "n_dups").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L, 4L -> 1L),
      s"audio twins must collapse, modalities must stay apart: $out")
  }

  test("undecodable payloads are dropped before the embed stage") {
    val junk = Array.fill[Byte](32)(9)
    val media = Seq((1L, Bmp.encode(16, 12, 1L)), (2L, junk))
      .toDF("doc_id", "blob")
    val out = runChain(media, BinaryEmbeddingPipeline.StubModel)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L))
  }
}
