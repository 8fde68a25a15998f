package graft

import org.apache.spark.sql.functions._

import graft.pipelines.{Embedders, EmbeddingPipeline}

/** The [[graft.pipelines.Embedder]] SPI (pluggable inference upgrade for
  * the q124 chain): with [[TestEmbedder]] on the test classpath
  * (registered through META-INF/services exactly as a production model
  * jar would be), passing its model key routes the embed stage through
  * partition-side batch inference — the stub lookup table is never
  * consulted — while the default key keeps the deterministic stub the
  * q124 oracle replays.
  */
class EmbedderSpiSpec extends SparkSpec {
  import spark.implicits._

  private val dummyLookup = Seq((0L, Seq(1.0f, 0f, 0f, 0f)))
    .toDF("vec_id", "embedding")

  private def runChain(docs: org.apache.spark.sql.DataFrame, model: String,
                       dims: Int = 4) =
    EmbeddingPipeline.run(docs, dummyLookup, "doc_id", "text",
      chunkTokens = 64, overlap = 0, threshold = 0.9, trainIters = 1,
      dims = dims, model = model)

  test("ServiceLoader discovers the test embedder per JVM") {
    assert(Embedders.byModel.contains("graft-test"))
    assert(!Embedders.byModel.contains(EmbeddingPipeline.StubModel))
  }

  test("registered model upgrades the embed stage; near-dups flow from REAL vectors") {
    TestEmbedder.reset()
    // doc 1 and doc 2 share a first word -> TestEmbedder gives them the
    // SAME vector -> semantic dedup must drop the higher chunk id; their
    // TEXTS differ, so exact dedup cannot be what collapsed them
    val docs = Seq(
      (1L, "alpha one two"), (2L, "alpha nine eight"),
      (3L, "beta one two"), (4L, "gamma four five"))
      .toDF("doc_id", "text")
    val out = runChain(docs, "graft-test")
      .select("doc_id", "vec_id", "kept").collect()
    assert(TestEmbedder.calls.get() > 0, "embedder never invoked")
    assert(TestEmbedder.textsSeen.get() == 4L)
    // no stub lookup: the honest null id on every row
    assert(out.forall(_.isNullAt(1)))
    val kept = out.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(kept(1L), "doc 1 (min chunk id of the forced near-dup pair) must survive")
    assert(!kept(2L), "doc 2 duplicates doc 1 in embedder space and must drop")
  }

  test("unregistered model keeps the deterministic stub join") {
    TestEmbedder.reset()
    val docs = Seq((1L, "alpha one two"), (2L, "beta three four"))
      .toDF("doc_id", "text")
    val out = runChain(docs, EmbeddingPipeline.StubModel)
      .select("doc_id", "vec_id").collect()
    assert(TestEmbedder.calls.get() == 0, "stub path must not run inference")
    // stub ids come from the md5 lookup against the 1-key dummy table
    assert(out.nonEmpty && out.forall(r => !r.isNullAt(1) && r.getLong(1) == 0L))
  }

  test("inference runs in bounded batches over partitions") {
    TestEmbedder.reset()
    val docs = (1 to 200).map(i => (i.toLong, s"word$i tail text"))
      .toDF("doc_id", "text")
    runChain(docs, "graft-test").collect()
    assert(TestEmbedder.textsSeen.get() == 200L)
    assert(TestEmbedder.maxBatch.get() <= Embedders.BatchSize,
      s"batch of ${TestEmbedder.maxBatch.get()} exceeds the public batch shape")
  }

  test("dims mismatch fails loudly before inference") {
    val docs = Seq((1L, "alpha one")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](runChain(docs, "graft-test", dims = 32))
  }
}
