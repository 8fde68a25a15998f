package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.OpCache
import graft.operators.dedup.SemanticDedup
import graft.operators.multimodal.BinaryPipeline

/** End-to-end MULTIMODAL embedding curation — the bytes→vector arm of
  * [[EmbeddingPipeline]] (which is text→vector): decode → content-dedup
  * → embed → semantic-dedup over a BINARY media column, so decoded
  * image/audio CONTENT flows into the SemDeDup/ANN family (LAION-class
  * corpora dedup images before any training step; a lexical fingerprint
  * over the bytes cannot even see that a BMP→PNG re-encode is the same
  * picture).
  *
  *  1. REAL decode (javax.imageio, magic-sniffed) → CONTENT fingerprint:
  *     md5 over `"w:h:l0:l1:…"` where l_p is the r+g+b luminance of
  *     pixel p in row-major order — a pure function of the DECODED
  *     pixels, so byte-disjoint re-encodes of one picture fingerprint
  *     identically. Payloads no reader decodes are dropped (no content
  *     to embed; a production run quarantines them via
  *     [[BinaryPipeline.decodeFeatures]]' labeled stub rows first).
  *  2. exact CONTENT dedup on the fingerprint — min-id survivor + dup
  *     count, one partial-agg shuffle. Dedup-before-embed is the stage
  *     order's whole economics: at corpus scale, model inference
  *     dominates everything upstream, so duplicated media must never
  *     pay for it ([[EmbeddingPipeline]]'s contract, verbatim).
  *  3. EMBED each surviving content group. No vision/audio model ships
  *     in this container, so the stub is the established deterministic
  *     lookup — `embeddings` keyed by `md5(fp) mod n_vecs` — honest
  *     about being a stub while everything around it (decode-derived
  *     key, dedup-before-embed, downstream clustering) is the real
  *     design the oracle replays. An environment with a real encoder
  *     registers a [[BinaryEmbedder]]
  *     (`META-INF/services/graft.pipelines.BinaryEmbedder`) and passes
  *     its key: the stage switches to partition-side BATCH inference
  *     over (representative payload, sniffed mime) with NO pipeline
  *     code change (the [[Embedder]] SPI discipline; the representative
  *     is the group's min-id member — group members are
  *     content-identical by construction of the fingerprint).
  *  4. SemDeDup semantic dedup over the content vectors
  *     ([[SemanticDedup.flaggedAdaptive]], the q121 operator) —
  *     near-identical MEDIA (not just byte- or pixel-identical)
  *     collapses.
  *
  * Scale shape: stage 1 is one narrow CPU pass (decode cost is the
  * pipeline's floor at any scale); stage 2 one fingerprint shuffle with
  * map-side partials; stage 3 a broadcast join (stub) or partition-side
  * batched inference (SPI); stage 4 the q121 cell-confined shape.
  * Nothing O(n²) anywhere.
  */
object BinaryEmbeddingPipeline {

  /** Default routing key — no [[BinaryEmbedder]] ships here, so the
    * default takes the deterministic stub join.
    */
  val StubModel = "stub"

  /** md5-hex content fingerprint of a decodable payload (None when no
    * codec accepts it): the DECODED-content identity the dedup stage
    * groups on. Images fingerprint their pixel luminances
    * (`"w:h:l0:l1:…"`, row-major); WAV audio fingerprints its decoded
    * PCM16 samples (`"wav:rate:n:s0:s1:…"` — through the real
    * AudioSystem codec path, so a re-containerized identical recording
    * fingerprints identically). The modality tags cannot collide: image
    * fingerprints start with a digit, audio with `wav:`.
    */
  private[pipelines] def contentFingerprint(blob: Array[Byte]): Option[String] =
    BinaryPipeline.sniff(blob).flatMap {
      case "audio/wav" => wavFingerprint(blob)
      case _           => imageFingerprint(blob)
    }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def imageFingerprint(blob: Array[Byte]): Option[String] =
    (try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(blob)))
    catch { case scala.util.control.NonFatal(_) => None }).map(imageFpOf)

  /** The image content fingerprint from an ALREADY-decoded frame —
    * exposed so single-decode pipelines ([[MediaCurationPipeline]])
    * derive it and the perceptual grid from ONE ImageIO.read.
    */
  private[pipelines] def imageFpOf(img: java.awt.image.BufferedImage): String = {
    val w = img.getWidth
    val h = img.getHeight
    val sb = new java.lang.StringBuilder(w * h * 4 + 16)
    sb.append(w).append(':').append(h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sb.append(':').append(
          ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff))
        x += 1
      }
      y += 1
    }
    md5Hex(sb.toString)
  }

  /** Decoded-sample fingerprint via the real javax.sound codec path
    * (the [[BinaryPipeline.audioFeatures]] decode discipline: format
    * negotiation + frame accounting, not byte peeking); 16-bit mono
    * PCM only — anything else is the undecodable case.
    */
  private def wavFingerprint(blob: Array[Byte]): Option[String] =
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
        val sb = new java.lang.StringBuilder(n * 7 + 24)
        sb.append("wav:").append(fmt.getSampleRate.toInt).append(':')
          .append(n)
        var i = 0
        while (i < n) {
          sb.append(':').append(bb.getShort.toInt)
          i += 1
        }
        if (n == 0) None else Some(md5Hex(sb.toString))
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => None // corrupt: drop path
    }

  /** One row per content group SURVIVING the exact dedup:
    * (doc_id, n_dups, vec_id, cluster_id, kept) — doc_id the group's
    * min id, vec_id the stub lookup key (null on the SPI path), kept =
    * survived semantic dedup too.
    */
  def run(media: DataFrame, embeddings: DataFrame, idCol: String,
          blobCol: String, threshold: Double, trainIters: Int, dims: Int,
          oracleFlatLadder: Boolean = false,
          model: String = StubModel): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val registered = Embedders.byModelBinary.get(model)
    registered.foreach(e => require(e.dims == dims,
      s"binary embedder '$model' emits ${e.dims}-dim vectors, pipeline wants $dims"))
    val keepBlob = registered.isDefined
    // stage 1: decode + fingerprint, batched per partition; only the SPI
    // path ships payloads past this point (the stub needs the 32-char fp)
    val fps = media
      .select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        contentFingerprint(blob).map(fp =>
          (id, fp, if (keepBlob) blob else Array.emptyByteArray))
      })
      .toDF(idCol, "fp", "__blob")
    // stage 2: exact content dedup — min-id survivor + dup count; the
    // SPI path keeps the MIN-ID member's payload as the group
    // representative (deterministic; members are content-identical)
    val survAggs = Seq(min(col(idCol)).as("doc_id"),
      count(lit(1)).as("n_dups")) ++
      (if (keepBlob)
        Seq(min(struct(col(idCol), col("__blob"))).getField("__blob")
          .as("__blob")) else Seq.empty)
    val surv = fps.groupBy(col("fp")).agg(survAggs.head, survAggs.tail: _*)
    // stage 3: embed
    val withVec = OpCache.cache(registered match {
      case Some(_) =>
        surv.select(col("doc_id"), col("n_dups"), col("__blob"))
          .as[(Long, Long, Array[Byte])]
          .mapPartitions { it =>
            lazy val emb = Embedders.byModelBinary.getOrElse(model,
              throw new IllegalStateException(
                s"binary embedder '$model' not registered on this executor JVM"))
            it.grouped(Embedders.BatchSize).flatMap { g =>
              val vecs = emb.embed(g.map(r => (r._3,
                BinaryPipeline.sniff(r._3).getOrElse("application/octet-stream"))))
              require(vecs.length == g.length,
                s"binary embedder '$model' returned ${vecs.length} vectors " +
                  s"for ${g.length} payloads")
              g.iterator.zip(vecs.iterator).map { case ((id, nd, _), v) =>
                (id, nd, v)
              }
            }
          }
          .toDF("doc_id", "n_dups", "embedding")
          .withColumn("vec_id", lit(null).cast("long"))
          .select(col("doc_id"), col("n_dups"), col("vec_id"),
            col("embedding"))
      case None =>
        // bounded scalar (one aggregate row): the stub keyspace size,
        // empty/sparse lookup tables rejected loudly
        val nVecs = Embedders.stubKeyspaceSize(embeddings)
        surv
          .withColumn("vec_id",
            conv(substring(col("fp"), 1, 8), 16, 10).cast("long") % nVecs)
          .join(broadcast(embeddings.select(col("vec_id"), col("embedding"))),
            Seq("vec_id"))
          .select(col("doc_id"), col("n_dups"), col("vec_id"),
            col("embedding"))
    })
    // stage 4: semantic dedup over the content vectors (consumes the
    // corpus several times — the cache keeps the decode lineage single-run)
    val flags = SemanticDedup.flaggedAdaptive(
        withVec.select(col("doc_id"), col("embedding")),
        "doc_id", "embedding", threshold, trainIters, dims,
        oracleFlatLadder = oracleFlatLadder)
      .withColumnRenamed("vec_id", "doc_id")
    withVec.select(col("doc_id"), col("n_dups"), col("vec_id"))
      .join(flags, Seq("doc_id"))
      .select(col("doc_id"), col("n_dups"), col("vec_id"),
        col("cluster_id"), col("kept"))
  }
}
