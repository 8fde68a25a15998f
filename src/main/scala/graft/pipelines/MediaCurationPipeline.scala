package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.operators.OpCache
import graft.operators.dedup.{DupClusters, SemanticDedup}
import graft.operators.multimodal.{AudioHash, Avi, BinaryPipeline, Bmp,
  ImageHash, VideoHash}
import graft.plans.{EnergyDiffHash, ImageGridHash}

/** One decoded mixed-modality identity row — [[MediaCurationPipeline
  * .runMixed]]'s stage-1 output: the modality-dispatched exact
  * fingerprint plus exactly the perceptual feature that modality's pair
  * rule needs (image grid / audio energy profile / per-frame grids),
  * all from ONE decode of the payload.
  */
final case class MixedDecoded(doc_id: Long, modality: String, fp: String,
    grid: Option[Array[Int]], energy: Option[Array[Long]],
    fgrids: Option[Seq[Seq[Int]]], blob: Array[Byte])

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

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Audio identities from ONE `javax.sound` decode: the EXACT content
    * fingerprint (string-identical to
    * [[BinaryEmbeddingPipeline]]'s wav fingerprint —
    * `md5("wav:rate:n:s0:s1:…")` over the decoded PCM16 samples) AND
    * the [[EnergyDiffHash.Windows]]-window energy profile
    * ([[AudioHash.decodeProfile]]'s integer split, verbatim: window w
    * spans samples [w·n DIV W, (w+1)·n DIV W), scores Σ|s|). None for
    * undecodable / non-PCM16-mono / shorter-than-one-sample-per-window
    * payloads (the ladder needs BOTH identities, so the profile's
    * n ≥ Windows floor governs).
    */
  private[pipelines] def audioIdentities(blob: Array[Byte])
      : Option[(String, Array[Long])] =
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
        val sb = new java.lang.StringBuilder(n * 7 + 24)
        sb.append("wav:").append(fmt.getSampleRate.toInt).append(':')
          .append(n)
        val e = new Array[Long](w)
        var i = 0
        var win = 0
        var boundary = (1L * n / w).toInt
        while (i < n) {
          while (i >= boundary) {
            win += 1; boundary = ((win + 1).toLong * n / w).toInt
          }
          val s = bb.getShort.toLong
          sb.append(':').append(s)
          e(win) += math.abs(s)
          i += 1
        }
        Some((md5Hex(sb.toString), e))
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => None // corrupt: drop path
    }

  /** Video identities from ONE demux pass: sample ≤ `maxFrames` evenly
    * spaced frames ([[BinaryPipeline.frameSample]]'s index rule,
    * src = f·n DIV k), decode each once, and derive BOTH the EXACT
    * fingerprint — `md5("avi:w:h:m:" + frames.map(lums ":"-joined)
    * .mkString("|"))` over the decoded per-pixel luminances (row-major
    * top-down, r+g+b — the image fingerprint's pixel walk per frame) —
    * AND each frame's perceptual grid ([[ImageHash.gridOf]]). None when
    * the container or ANY sampled frame fails to decode (both
    * identities or neither — a half-fingerprinted video would collapse
    * with nothing).
    */
  private[pipelines] def videoIdentities(blob: Array[Byte], maxFrames: Int)
      : Option[(String, Seq[Seq[Int]])] =
    Avi.demux(blob).flatMap { case (w, h, spans) =>
      val n = spans.length
      val srcIdxs =
        if (n <= maxFrames) 0 until n
        else (0 until maxFrames).map(f => (f.toLong * n / maxFrames).toInt)
      val frames = srcIdxs.flatMap { src =>
        val (off, len) = spans(src)
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
          Bmp.wrapDib(w, h, java.util.Arrays.copyOfRange(blob, off, off + len)))))
        catch { case scala.util.control.NonFatal(_) => None }
      }
      if (frames.length != srcIdxs.length) None
      else {
        val sb = new java.lang.StringBuilder(frames.length * w * h * 4 + 24)
        sb.append("avi:").append(w).append(':').append(h).append(':')
          .append(frames.length).append(':')
        var fi = 0
        frames.foreach { img =>
          if (fi > 0) sb.append('|')
          var y = 0
          var first = true
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              if (!first) sb.append(':')
              first = false
              sb.append(((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                (rgb & 0xff))
              x += 1
            }
            y += 1
          }
          fi += 1
        }
        Some((md5Hex(sb.toString),
          frames.map(img => ImageHash.gridOf(img).toSeq)))
      }
    }

  /** The THREE-MODALITY ladder (round 20 — the r19 verdict's #4): one
    * corpus, one binary column, heterogeneous payloads (the q172
    * mixed-table shape), every rung modality-dispatched:
    *
    *  1. DECODE ONCE per payload, dispatching on the sniffed container:
    *     images yield (pixel fingerprint, perceptual grid); WAV audio
    *     yields (sample fingerprint, energy profile) from one
    *     `javax.sound` pass ([[audioIdentities]]); AVI video yields
    *     (sampled-frame fingerprint, per-frame grids) from one demux
    *     ([[videoIdentities]]). Fingerprint pre-images are
    *     modality-tagged, so exact groups can never cross modalities.
    *  2. EXACT content dedup over the union — min-id survivor, group
    *     mass kept, the perceptual features riding by min-struct.
    *  3. PERCEPTUAL pairs per modality over the exact survivors: the
    *     41c banded grid-dHash pairs (images), the 41g banded energy
    *     hash pairs (audio), the 41h Hamming-tolerant frame share rule
    *     (video) — then ONE pre-contracted CC over the pair union
    *     (pairs never cross modalities, so components stay pure) and a
    *     min-id keeper per cluster carrying `n_source_items`.
    *  4. EMBED the keepers ONCE (SPI batches or the deterministic stub
    *     join) → ONE [[SemanticDedup.flaggedAdaptive]] pass over the
    *     union — the q172 discipline: one semantic space, not three.
    *
    * One row per perceptual keeper: (doc_id, modality, n_source_items,
    * n_perceptual, vec_id, cluster_id, kept). Undecodable payloads drop
    * at stage 1. Scale shape: one narrow decode pass; one fingerprint
    * shuffle with map-side partials; per-modality banded pair joins
    * (never all-pairs, never cross-modality); CC over the union pair
    * relation; inference/stub-join over KEEPERS only; the q121
    * cell-confined semantic shape.
    */
  def runMixed(media: DataFrame, embeddings: DataFrame, idCol: String,
               blobCol: String, threshold: Double, trainIters: Int,
               dims: Int, frames: Int = 8,
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
    // stage 1: ONE decode per payload, modality-dispatched
    val decoded = media
      .select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        def kept = if (keepBlob) blob else Array.emptyByteArray
        BinaryPipeline.sniff(blob).flatMap {
          case "audio/wav" =>
            audioIdentities(blob).map { case (fp, e) =>
              MixedDecoded(id, "audio", fp, None, Some(e), None, kept) }
          case "video/avi" =>
            videoIdentities(blob, frames).map { case (fp, gs) =>
              MixedDecoded(id, "video", fp, None, None, Some(gs), kept) }
          case _ =>
            (try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(blob)))
            catch { case scala.util.control.NonFatal(_) => None }).map { img =>
              MixedDecoded(id, "image", BinaryEmbeddingPipeline.imageFpOf(img),
                Some(ImageHash.gridOf(img)), None, None, kept) }
        }
      })
      .toDF()
    // stage 2: exact content dedup — min-id survivor; modality is a
    // function of fp (tagged pre-images), min is just deterministic
    val exact = OpCache.cache(decoded.groupBy(col("fp")).agg(
      min(col("doc_id")).as("doc_id"),
      min(col("modality")).as("modality"),
      count(lit(1)).as("n_exact"),
      min(struct(col("doc_id"), col("grid"))).getField("grid").as("grid"),
      min(struct(col("doc_id"), col("energy"))).getField("energy").as("energy"),
      min(struct(col("doc_id"), col("fgrids"))).getField("fgrids").as("fgrids"),
      min(struct(col("doc_id"), col("blob"))).getField("blob").as("__blob")))
    // stage 3: per-modality perceptual pairs over the exact survivors
    def gridHash(c: org.apache.spark.sql.Column, d: Boolean) =
      ColumnBridge.column(ImageGridHash(ColumnBridge.expression(c), dhash = d))
    val imgPairs = ImageHash.nearDupPairs(
      exact.filter(col("modality") === "image")
        .select(col("doc_id"), gridHash(col("grid"), d = true).as("dhash"),
          gridHash(col("grid"), d = false).as("ahash")),
      "doc_id", maxHamming, bands)
    val audPairs = AudioHash.nearDupPairs(
      exact.filter(col("modality") === "audio")
        .select(col("doc_id"), ColumnBridge.column(EnergyDiffHash(
          ColumnBridge.expression(col("energy")))).as("ehash")),
      "doc_id")
    val vidPairs = VideoHash.nearDupPairs(
      exact.filter(col("modality") === "video")
        .select(col("doc_id"),
          posexplode(col("fgrids")).as(Seq("frame_no", "fgrid")))
        .select(col("doc_id"), col("frame_no"),
          gridHash(col("fgrid"), d = true).as("dhash"),
          gridHash(col("fgrid"), d = false).as("ahash")),
      "doc_id")
    val pairs = OpCache.cache(imgPairs.select(col("a_id"), col("b_id"))
      .unionByName(audPairs.select(col("a_id"), col("b_id")))
      .unionByName(vidPairs.select(col("a_id"), col("b_id"))))
    val comps = DupClusters.components(pairs, "a_id", "b_id")
    val withRep = exact.join(
        comps.select(col("node").as("doc_id"), col("cluster_rep"),
          col("cluster_size")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("modality"), col("fp"), col("n_exact"),
        col("__blob"),
        coalesce(col("cluster_rep"), col("doc_id")).as("rep"),
        coalesce(col("cluster_size"), lit(1L)).as("n_perceptual"))
    val keepers = OpCache.cache(withRep.groupBy(col("rep")).agg(
        min(col("modality")).as("modality"),
        sum(col("n_exact")).as("n_source_items"),
        min(col("n_perceptual")).as("n_perceptual"),
        min(struct(col("doc_id"), col("fp"))).getField("fp").as("fp"),
        min(struct(col("doc_id"), col("__blob"))).getField("__blob")
          .as("__blob"))
      .withColumnRenamed("rep", "doc_id"))
    // stage 4: embed keepers once, then ONE SemDeDup pass over the union
    val withVec = OpCache.cache(registered match {
      case Some(_) =>
        keepers.select(col("doc_id"), col("modality"),
            col("n_source_items"), col("n_perceptual"), col("__blob"))
          .as[(Long, String, Long, Long, Array[Byte])]
          .mapPartitions { it =>
            lazy val emb = Embedders.byModelBinary.getOrElse(model,
              throw new IllegalStateException(
                s"binary embedder '$model' not registered on this executor JVM"))
            it.grouped(Embedders.BatchSize).flatMap { g =>
              val vecs = emb.embed(g.map(r => (r._5,
                BinaryPipeline.sniff(r._5).getOrElse("application/octet-stream"))))
              require(vecs.length == g.length,
                s"binary embedder '$model' returned ${vecs.length} vectors " +
                  s"for ${g.length} payloads")
              g.iterator.zip(vecs.iterator).map {
                case ((id, m, ns, np, _), v) => (id, m, ns, np, v)
              }
            }
          }
          .toDF("doc_id", "modality", "n_source_items", "n_perceptual",
            "embedding")
          .withColumn("vec_id", lit(null).cast("long"))
      case None =>
        val nVecs = Embedders.stubKeyspaceSize(embeddings)
        keepers
          .withColumn("vec_id",
            conv(substring(col("fp"), 1, 8), 16, 10).cast("long") % nVecs)
          .join(broadcast(embeddings.select(col("vec_id"), col("embedding"))),
            Seq("vec_id"))
          .select(col("doc_id"), col("modality"), col("n_source_items"),
            col("n_perceptual"), col("embedding"), col("vec_id"))
    })
    val flags = SemanticDedup.flaggedAdaptive(
        withVec.select(col("doc_id"), col("embedding")),
        "doc_id", "embedding", threshold, trainIters, dims,
        oracleFlatLadder = oracleFlatLadder)
      .withColumnRenamed("vec_id", "doc_id")
    withVec.select(col("doc_id"), col("modality"), col("n_source_items"),
        col("n_perceptual"), col("vec_id"))
      .join(flags, Seq("doc_id"))
      .select(col("doc_id"), col("modality"), col("n_source_items"),
        col("n_perceptual"), col("vec_id"), col("cluster_id"), col("kept"))
  }
}
