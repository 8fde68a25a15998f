package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.dedup.SemanticDedup

/** End-to-end EMBEDDING-side curation — the similarity-space analog of
  * [[CurationPipeline]] (which is lexical): the chunk → dedup → embed →
  * cluster → semantic-dedup chain an RAG-index / training-corpus build
  * runs, composed from the library's gated operators in one call.
  *
  *  1. token-window CHUNKING ([[TextFns.chunked]], the q94 operator):
  *     fixed-size overlapping windows over the normalized text.
  *  2. chunk-grain EXACT dedup on the chunk fingerprint (md5), min
  *     chunk_id survivor with a duplicate count — the cheap lexical pass
  *     runs BEFORE the embed stage so duplicated boilerplate windows
  *     never pay for inference (at 100 TB, embedding cost dominates
  *     everything upstream of it; deduping first is the whole economics
  *     of the stage order).
  *  3. EMBED each surviving chunk. Production would run model inference
  *     (`mapInPandas` batches) or join a chunk-keyed embedding store
  *     co-partitioned on the fingerprint; this library has no model in
  *     the container, so the stand-in is a DETERMINISTIC lookup into the
  *     `embeddings` table keyed by `md5(fp) mod n_vecs` — honest about
  *     being a stub, while the plumbing around it (dedup-before-embed,
  *     dim-sized broadcast join, downstream clustering) is the real
  *     design and is what the oracle replays.
  *  4. SemDeDup-style SEMANTIC dedup over the chunk vectors
  *     ([[SemanticDedup.flaggedAdaptive]], the q121 operator):
  *     occupancy-adaptive trained k-means cells + within-cell min-id-wins
  *     near-identical drop.
  *
  * Chunk ids are `doc_id * ChunkIdStride + chunk_no` — pure arithmetic
  * (engine-replayable, no global row_number, which would be a
  * single-partition window at scale) and order-preserving within a
  * document, so min-id-wins keeps the EARLIEST occurrence.
  *
  * Scale shape: stage 1 is a codegen projection; stage 2 is ONE shuffle
  * on the fingerprint (map-side partial min/count); stage 3 is a
  * broadcast join (the embedding table here is dim-sized; a real store
  * would be co-partitioned on the key instead); stage 4 is the q121
  * shape — broadcast-probe assignment, cell-bounded pair scan. Nothing
  * O(chunks²) anywhere.
  */
object EmbeddingPipeline {

  /** Spacing of chunk ids within a document; bounds chunk_no, not doc
    * count. 10^5 chunks/doc ≈ 2.4M tokens at the q94 stride — far above
    * any real document, and doc ids stay exact up to ~9·10^13.
    */
  val ChunkIdStride = 100000L

  /** @param docs       (idCol: long, textCol: string) corpus
    * @param embeddings (vec_id: long, embedding: array<float>) lookup
    *                   table for the stub embed stage; vec_ids must be
    *                   dense from 0 (the testdata contract)
    * @return one row per chunk SURVIVING exact dedup:
    *         (doc_id, chunk_no, n_dups, vec_id, cluster_id, kept) —
    *         kept = survived semantic dedup too.
    */
  /** `oracleFlatLadder = true` (gate runs only) asserts the chunk corpus
    * is still inside the flat cell-ladder regime the q124 DuckDB oracle
    * replays — past it [[SemanticDedup.flaggedAdaptive]] would correctly
    * switch to the two-level assignment and the gate would hash-mismatch;
    * the require turns that divergence into a clear failure. Production
    * leaves it false and takes the two-level rung (q133's gated path).
    */
  /** The default routing key: no [[Embedder]] ships in this container,
    * so the default takes the deterministic stub join. An environment
    * with a registered model passes its key and the chain upgrades with
    * no pipeline code change (EmbedderSpiSpec drives both paths).
    */
  val StubModel = "stub"

  /** `knownChunks`: the exact SURVIVING-chunk count when the caller
    * already holds it (e.g. a driver that just materialized the chunk
    * store) — forwarded to the semantic-dedup ladder so it skips its own
    * `count()` pass over the cached chunk frame (one fewer job; must be
    * exact — the oracle replays the cell ladder from the same n).
    */
  def run(docs: DataFrame, embeddings: DataFrame, idCol: String,
          textCol: String, chunkTokens: Int, overlap: Int,
          threshold: Double, trainIters: Int, dims: Int,
          oracleFlatLadder: Boolean = false,
          model: String = StubModel,
          knownChunks: Option[Long] = None): DataFrame = {
    val registered = Embedders.byModel.get(model)
    registered.foreach(e => require(e.dims == dims,
      s"embedder '$model' emits ${e.dims}-dim vectors, pipeline wants $dims"))
    // the SPI path must ship the chunk TEXT to the inference stage; the
    // stub path ships only the 32-char fingerprint — don't widen its
    // shuffle for a capability it doesn't use
    val textCols =
      if (registered.isDefined) Seq(col("c.chunk_text").as("chunk_text"))
      else Seq.empty
    val chunks = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol),
        explode(TextFns.chunked(col(textCol), chunkTokens, overlap)).as("c"))
      .select(Seq(
        (col(idCol) * ChunkIdStride + col("c.chunk_no")).as("chunk_id"),
        md5(col("c.chunk_text").cast("binary")).as("fp")) ++ textCols: _*)
    // exact chunk dedup: min-id survivor + dup count in one fingerprint
    // aggregate (map-side partial; never a window sort). The fingerprint
    // determines the text, so any_value is exact on the SPI path.
    val survAggs = Seq(min(col("chunk_id")).as("chunk_id"),
      count(lit(1)).as("n_dups")) ++
      (if (registered.isDefined)
        Seq(first(col("chunk_text")).as("chunk_text")) else Seq.empty)
    val surv = chunks.groupBy(col("fp")).agg(survAggs.head, survAggs.tail: _*)
    val withVec = graft.operators.OpCache.cache(registered match {
      case Some(_) =>
        // partition-side BATCH inference: resolve the embedder PER JVM by
        // key (never serialize the instance — the BlobDecoders loader
        // discipline), one embed() call per ≤BatchSize texts
        val sp = docs.sparkSession
        import sp.implicits._
        surv.select(col("chunk_id"), col("n_dups"), col("chunk_text"))
          .as[(Long, Long, String)]
          .mapPartitions { it =>
            lazy val emb = Embedders.byModel.getOrElse(model,
              throw new IllegalStateException(
                s"embedder '$model' not registered on this executor JVM"))
            it.grouped(Embedders.BatchSize).flatMap { g =>
              val vecs = emb.embed(g.map(_._3))
              require(vecs.length == g.length,
                s"embedder '$model' returned ${vecs.length} vectors for ${g.length} texts")
              g.iterator.zip(vecs.iterator).map { case ((id, nd, _), v) =>
                (id, nd, v)
              }
            }
          }
          .toDF("chunk_id", "n_dups", "embedding")
          // no stub lookup happened; the id column stays honest
          .withColumn("vec_id", lit(null).cast("long"))
          .select(col("chunk_id"), col("n_dups"), col("vec_id"),
            col("embedding"))
      case None =>
        // bounded scalar (one aggregate row): the stub keyspace size,
        // empty/sparse lookup tables rejected loudly
        val nVecs = Embedders.stubKeyspaceSize(embeddings)
        surv
          .withColumn("vec_id",
            conv(substring(md5(col("fp").cast("binary")), 1, 8), 16, 10)
              .cast("long") % nVecs)
          .join(broadcast(embeddings.select(col("vec_id"), col("embedding"))),
            Seq("vec_id"))
          .select(col("chunk_id"), col("n_dups"), col("vec_id"),
            col("embedding"))
    })
    // semantic dedup consumes the corpus several times (count, train,
    // assign, pair-scan); the cache above keeps the chunk/dedup lineage
    // single-run
    val flags = SemanticDedup.flaggedAdaptive(
        withVec.select(col("chunk_id"), col("embedding")),
        "chunk_id", "embedding", threshold, trainIters, dims,
        oracleFlatLadder = oracleFlatLadder, knownN = knownChunks)
      .withColumnRenamed("vec_id", "chunk_id")
    withVec.select(col("chunk_id"), col("n_dups"), col("vec_id"))
      .join(flags, Seq("chunk_id"))
      .select(
        expr(s"chunk_id DIV $ChunkIdStride").as("doc_id"),
        (col("chunk_id") % ChunkIdStride).cast("int").as("chunk_no"),
        col("n_dups"), col("vec_id"), col("cluster_id"), col("kept"))
  }
}
