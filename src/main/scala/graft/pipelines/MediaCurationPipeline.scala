package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.operators.OpCache
import graft.operators.dedup.{DupClusters, SemanticDedup}
import graft.operators.multimodal.{BinaryPipeline, ImageHash}
import graft.plans.ImageGridHash

/** The COMPLETE image-dedup LADDER in one pipeline — what a LAION-class
  * curation run actually executes, every rung cheaper than the next so
  * each one shrinks the population the more expensive rung sees:
  *
  *  1. DECODE ONCE — one `ImageIO.read` per payload yields BOTH
  *     identities: the exact content fingerprint (md5 over decoded
  *     pixels, [[BinaryEmbeddingPipeline.imageFpOf]]) AND the 9×7
  *     perceptual luminance grid ([[ImageHash.gridOf]]). Running the
  *     exact and perceptual stages as separate operators would decode
  *     the corpus twice — at 100 TB the decode IS the floor, so the
  *     single pass is the pipeline's reason to exist as a composition.
  *  2. EXACT content dedup — byte-disjoint re-encodes of one picture
  *     collapse on the fingerprint (min-id survivor, group size kept).
  *  3. PERCEPTUAL near-dup — the 41b/41c/41e chain over the exact
  *     survivors: codegen grid dHash, banded Hamming pairs
  *     (verify-at-join), pre-contracted CC clusters, min-id keeper per
  *     cluster; singletons keep themselves. `n_source_items` aggregates
  *     the exact-group masses across each cluster — the raw-item count
  *     every keeper represents.
  *  4. EMBED the keepers (the [[BinaryEmbedder]] SPI / honest
  *     deterministic stub — dedup-before-embed ordering, twice over:
  *     only perceptual keepers ever pay inference) → SEMANTIC dedup
  *     ([[SemanticDedup.flaggedAdaptive]], the q121 operator).
  *
  * One row per perceptual keeper:
  * (doc_id, n_source_items, n_perceptual, vec_id, cluster_id, kept).
  * Non-image / undecodable payloads drop at stage 1 (a production run
  * quarantines them via [[BinaryPipeline.decodeFeatures]] first).
  *
  * Scale shape: one narrow decode pass; one fingerprint shuffle with
  * map-side partials; the 41c banded join (bands·survivors postings,
  * popcount cut AT the join); CC over the pair relation (pre-contracted,
  * star-depth rounds); broadcast stub join or partition-batched
  * inference over KEEPERS only; then the q121 cell-confined shape.
  * Nothing O(n²), and the decode runs exactly once.
  */
object MediaCurationPipeline {

  /** One row per perceptual keeper — see the object doc. */
  def run(media: DataFrame, embeddings: DataFrame, idCol: String,
          blobCol: String, threshold: Double, trainIters: Int, dims: Int,
          maxHamming: Int = ImageHash.DefaultMaxHamming,
          bands: Int = ImageHash.DefaultMaxHamming + 1,
          oracleFlatLadder: Boolean = false,
          model: String = BinaryEmbeddingPipeline.StubModel): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val registered = Embedders.byModelBinary.get(model)
    registered.foreach(e => require(e.dims == dims,
      s"binary embedder '$model' emits ${e.dims}-dim vectors, pipeline wants $dims"))
    val keepBlob = registered.isDefined
    // stage 1: ONE decode per payload -> both identities (+ the payload
    // itself only on the SPI path, which needs a representative to infer)
    val decoded = media
      .select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        BinaryPipeline.sniff(blob).flatMap { _ =>
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(blob)))
          catch { case scala.util.control.NonFatal(_) => None }
        }.map { img =>
          (id, BinaryEmbeddingPipeline.imageFpOf(img), ImageHash.gridOf(img),
            if (keepBlob) blob else Array.emptyByteArray)
        }
      })
      .toDF(idCol, "fp", "grid", "__blob")
    // stage 2: exact content dedup — min-id survivor; the grid (and the
    // SPI payload) ride via min-struct: group members are
    // content-identical, the min pick is just deterministic
    val exact = OpCache.cache(decoded.groupBy(col("fp")).agg(
      min(col(idCol)).as("doc_id"),
      count(lit(1)).as("n_exact"),
      min(struct(col(idCol), col("grid"))).getField("grid").as("grid"),
      min(struct(col(idCol), col("__blob"))).getField("__blob").as("__blob")))
    // stage 3: perceptual clusters over the exact survivors
    def hash(d: Boolean) = ColumnBridge.column(
      ImageGridHash(ColumnBridge.expression(col("grid")), dhash = d))
    val hashes = exact.select(col("doc_id"), hash(d = true).as("dhash"),
      hash(d = false).as("ahash"))
    val pairs = ImageHash.nearDupPairs(hashes, "doc_id", maxHamming, bands)
    val comps = DupClusters.components(pairs, "a_id", "b_id")
    val withRep = exact.join(
        comps.select(col("node").as("doc_id"), col("cluster_rep"),
          col("cluster_size")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("fp"), col("n_exact"), col("__blob"),
        coalesce(col("cluster_rep"), col("doc_id")).as("rep"),
        coalesce(col("cluster_size"), lit(1L)).as("n_perceptual"))
    // the keeper row carries the whole cluster's raw-item mass; its own
    // fp keys the stub embed (min-struct: the keeper's OWN fingerprint)
    val keepers = OpCache.cache(withRep.groupBy(col("rep")).agg(
        sum(col("n_exact")).as("n_source_items"),
        min(col("n_perceptual")).as("n_perceptual"),
        min(struct(col("doc_id"), col("fp"))).getField("fp").as("fp"),
        min(struct(col("doc_id"), col("__blob"))).getField("__blob")
          .as("__blob"))
      .withColumnRenamed("rep", "doc_id"))
    // stage 4: embed keepers (stub join / SPI batches), then SemDeDup
    val withVec = OpCache.cache(registered match {
      case Some(_) =>
        keepers.select(col("doc_id"), col("n_source_items"),
            col("n_perceptual"), col("__blob"))
          .as[(Long, Long, Long, Array[Byte])]
          .mapPartitions { it =>
            lazy val emb = Embedders.byModelBinary.getOrElse(model,
              throw new IllegalStateException(
                s"binary embedder '$model' not registered on this executor JVM"))
            it.grouped(Embedders.BatchSize).flatMap { g =>
              val vecs = emb.embed(g.map(r => (r._4,
                BinaryPipeline.sniff(r._4).getOrElse("application/octet-stream"))))
              require(vecs.length == g.length,
                s"binary embedder '$model' returned ${vecs.length} vectors " +
                  s"for ${g.length} payloads")
              g.iterator.zip(vecs.iterator).map { case ((id, ns, np, _), v) =>
                (id, ns, np, v)
              }
            }
          }
          .toDF("doc_id", "n_source_items", "n_perceptual", "embedding")
          .withColumn("vec_id", lit(null).cast("long"))
      case None =>
        val nVecs = Embedders.stubKeyspaceSize(embeddings)
        keepers
          .withColumn("vec_id",
            conv(substring(col("fp"), 1, 8), 16, 10).cast("long") % nVecs)
          .join(broadcast(embeddings.select(col("vec_id"), col("embedding"))),
            Seq("vec_id"))
          .select(col("doc_id"), col("n_source_items"), col("n_perceptual"),
            col("embedding"), col("vec_id"))
    })
    val flags = SemanticDedup.flaggedAdaptive(
        withVec.select(col("doc_id"), col("embedding")),
        "doc_id", "embedding", threshold, trainIters, dims,
        oracleFlatLadder = oracleFlatLadder)
      .withColumnRenamed("vec_id", "doc_id")
    withVec.select(col("doc_id"), col("n_source_items"), col("n_perceptual"),
        col("vec_id"))
      .join(flags, Seq("doc_id"))
      .select(col("doc_id"), col("n_source_items"), col("n_perceptual"),
        col("vec_id"), col("cluster_id"), col("kept"))
  }
}
