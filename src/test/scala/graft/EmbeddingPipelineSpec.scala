package graft

import org.apache.spark.sql.functions._

import graft.pipelines.EmbeddingPipeline
import graft.queries.{IvfQueries, SimilarityQueries}

/** Composition guards for the q124 embedding pipeline: the oracle gate
  * proves end-to-end values; these pin the STRUCTURAL claims the chain's
  * Scaladoc makes (stage order, dedup accounting, stage-vs-composition
  * consistency) with readable failures.
  */
class EmbeddingPipelineSpec extends SparkSpec {

  private lazy val out = EmbeddingPipeline.run(
    Tables.documents(spark, sf("0.001")), Tables.embeddings(spark, sf("0.001")),
    "doc_id", "text", chunkTokens = 32, overlap = 8,
    threshold = IvfQueries.SemThreshold, trainIters = IvfQueries.TrainIters,
    dims = SimilarityQueries.Dims).cache()

  test("exact-dedup accounting: n_dups sums back to the raw chunk count") {
    val rawChunks = Tables.documents(spark, sf("0.001"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(explode(graft.functions.TextFns.chunked(col("text"), 32, 8)).as("c"))
      .count()
    val sumDups = out.agg(sum(col("n_dups"))).head.getLong(0)
    assert(sumDups == rawChunks,
      s"fingerprint groups lost chunks: sum(n_dups)=$sumDups raw=$rawChunks")
    // survivors are distinct fingerprints — the embed stage paid once per
    // distinct chunk, which is the dedup-before-embed economics claim
    assert(out.count() < rawChunks)
  }

  test("survivor is the earliest chunk: no output chunk has a smaller-id twin") {
    // re-derive fingerprints and check every surviving (doc_id, chunk_no)
    // is the min chunk_id of its group
    val chunks = Tables.documents(spark, sf("0.001"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        explode(graft.functions.TextFns.chunked(col("text"), 32, 8)).as("c"))
      .select(
        (col("doc_id") * EmbeddingPipeline.ChunkIdStride + col("c.chunk_no"))
          .as("chunk_id"),
        md5(col("c.chunk_text").cast("binary")).as("fp"))
    val minIds = chunks.groupBy("fp").agg(min("chunk_id").as("chunk_id"))
      .select("chunk_id")
    val outIds = out.select(
      (col("doc_id") * EmbeddingPipeline.ChunkIdStride + col("chunk_no"))
        .as("chunk_id"))
    assert(outIds.exceptAll(minIds).count() == 0)
    assert(minIds.exceptAll(outIds).count() == 0)
  }

  test("composed kept flags equal the staged semantic-dedup run on the same corpus") {
    // rebuild the chunk-vector corpus by hand (the pipeline's stages 1-3),
    // run q121's operator directly, and require flag-for-flag equality —
    // composition must not change stage-4 semantics
    val emb = Tables.embeddings(spark, sf("0.001"))
    val nVecs = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
    val corpus = Tables.documents(spark, sf("0.001"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        explode(graft.functions.TextFns.chunked(col("text"), 32, 8)).as("c"))
      .select(
        (col("doc_id") * EmbeddingPipeline.ChunkIdStride + col("c.chunk_no"))
          .as("chunk_id"),
        md5(col("c.chunk_text").cast("binary")).as("fp"))
      .groupBy("fp").agg(min("chunk_id").as("chunk_id"))
      .withColumn("vec_id",
        conv(substring(md5(col("fp").cast("binary")), 1, 8), 16, 10)
          .cast("long") % nVecs)
      .join(emb.select("vec_id", "embedding"), Seq("vec_id"))
      .select(col("chunk_id"), col("embedding"))
    val staged = graft.operators.dedup.SemanticDedup.flaggedAdaptive(
        corpus, "chunk_id", "embedding", IvfQueries.SemThreshold,
        IvfQueries.TrainIters, SimilarityQueries.Dims)
      .select(col("vec_id").as("chunk_id"), col("cluster_id"), col("kept"))
    val composed = out.select(
      (col("doc_id") * EmbeddingPipeline.ChunkIdStride + col("chunk_no"))
        .as("chunk_id"),
      col("cluster_id"), col("kept"))
    assert(composed.exceptAll(staged).count() == 0 &&
      staged.exceptAll(composed).count() == 0)
  }
}
