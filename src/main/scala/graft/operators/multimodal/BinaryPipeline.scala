package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Features extracted from one opaque media blob. */
final case class MediaFeatures(doc_id: Long, byte_len: Int, width: Int,
                               height: Int, aspect_ratio: Double,
                               checksum: Long, format: String)

/** Minimal 24-bit uncompressed BMP writer — a pure-JVM way to materialize
  * REAL image bytes (parseable by any codec, javax.imageio included) with
  * fully deterministic content, so decode paths can be verified end-to-end
  * without external image libraries.
  */
object Bmp {
  /** Deterministic pixel byte at offset `i` for seed `s`. The seed is
    * bounded (mod 9973) and the arithmetic stays far below 2^63, so an
    * external oracle (DuckDB int64, which errors on overflow instead of
    * wrapping) can reproduce every byte with plain integer ops.
    */
  /** Shared LCG core for the deterministic media generators — ONE copy of
    * the constants, which must stay in lockstep with every DuckDB oracle
    * that replays them (q30/q95/q96).
    */
  private[multimodal] def lcg(seed: Long, i: Long): Long =
    ((seed % 9973L) * 2654435761L + i * 1103515245L + 12345L) / 65536L

  def pixelByte(seed: Long, i: Long): Int = (lcg(seed, i) % 256L).toInt

  /** Wrap a raw bottom-up BGR24 pixel array (rows padded to 4 bytes — the
    * DIB layout AVI '00db' frames carry verbatim) in a standard 54-byte
    * BMP header.
    */
  def wrapDib(width: Int, height: Int, pixelData: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val total = 54 + pixelData.length
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(total)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(pixelData.length).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    b.put(pixelData)
    b.array()
  }

  /** The deterministic DIB pixel payload for (dims, seed) — what both the
    * BMP encoder and the AVI frames carry.
    */
  def dibPayload(width: Int, height: Int, seed: Long): Array[Byte] = {
    val rowSize = (3 * width + 3) / 4 * 4 // rows pad to 4-byte boundaries
    val imgSize = rowSize * height
    val data = new Array[Byte](imgSize)
    var i = 0
    while (i < imgSize) {
      data(i) = pixelByte(seed, i.toLong).toByte
      i += 1
    }
    data
  }

  def encode(width: Int, height: Int, seed: Long): Array[Byte] =
    wrapDib(width, height, dibPayload(width, height, seed))

  /** [[dibPayload]] with a deterministic rectangular PATCH: pixels whose
    * IMAGE coordinates satisfy x < pw ∧ y < ph (top-down coords — y = 0
    * is the top row, i.e. the LAST stored DIB row) carry `value` in all
    * three channels instead of the LCG byte; row padding stays LCG. The
    * image near-dup gates plant SMALL perceptual perturbations with it —
    * every byte still externally predictable (the oracle adds one CASE
    * to the LCG replay).
    */
  def dibPayloadPatched(width: Int, height: Int, seed: Long,
                        pw: Int, ph: Int, value: Int): Array[Byte] = {
    val rowSize = (3 * width + 3) / 4 * 4
    val data = new Array[Byte](rowSize * height)
    var i = 0
    while (i < data.length) {
      val row = i / rowSize // DIB rows are bottom-up
      val colB = i % rowSize
      val inPatch = colB < 3 * width && colB / 3 < pw &&
        height - 1 - row < ph
      data(i) = (if (inPatch) value else pixelByte(seed, i.toLong)).toByte
      i += 1
    }
    data
  }

  def encodePatched(width: Int, height: Int, seed: Long,
                    pw: Int, ph: Int, value: Int): Array[Byte] =
    wrapDib(width, height, dibPayloadPatched(width, height, seed, pw, ph, value))
}

/** Minimal uncompressed-DIB AVI writer and demuxer — pure-JVM REAL video:
  * a RIFF('AVI ') container with hdrl (avih + strl: 'vids'/'DIB ' strh,
  * BITMAPINFOHEADER strf) and a movi list of '00db' frames whose payloads
  * are exactly [[Bmp.dibPayload]] — so a demuxed frame re-wrapped by
  * [[Bmp.wrapDib]] is byte-identical to `Bmp.encode(w, h, seed+frame)`
  * and every decoded pixel is externally predictable. DIB-in-AVI is a
  * standard layout any real AVI player accepts; nothing here is a toy
  * format, only a deliberately codec-free one.
  */
object Avi {
  def encode(width: Int, height: Int, frames: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && frames > 0,
      s"bad shape ${width}x$height x$frames")
    val rowSize = (3 * width + 3) / 4 * 4
    val imgSize = rowSize * height
    // a LIST's size field covers its 4-byte type plus contents
    val strlListSize = 4 + (8 + 56) + (8 + 40)            // strh + strf
    val hdrlListSize = 4 + (8 + 56) + (8 + strlListSize)  // avih + LIST(strl)
    val moviListSize = 4 + frames * (8 + imgSize)         // imgSize is even
    val riffSize = 4 + (8 + hdrlListSize) + (8 + moviListSize)
    val b = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); b.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); b.putInt(hdrlListSize); fourcc("hdrl")
    fourcc("avih"); b.putInt(56)
    b.putInt(100000)            // microseconds per frame (10 fps)
      .putInt(imgSize * 10)     // max bytes/sec
      .putInt(0).putInt(0)      // padding, flags
      .putInt(frames).putInt(0) // total frames, initial frames
      .putInt(1)                // streams
      .putInt(imgSize)          // suggested buffer
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); b.putInt(strlListSize); fourcc("strl")
    fourcc("strh"); b.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    b.putInt(0).putInt(0).putInt(0)       // flags, prio/lang, initial
      .putInt(1).putInt(10)               // scale, rate → 10 fps
      .putInt(0).putInt(frames)           // start, length
      .putInt(imgSize).putInt(-1).putInt(0) // bufsize, quality, samplesize
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    fourcc("strf"); b.putInt(40)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(imgSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    fourcc("LIST"); b.putInt(moviListSize); fourcc("movi")
    var f = 0
    while (f < frames) {
      fourcc("00db"); b.putInt(imgSize)
      b.put(Bmp.dibPayload(width, height, seed + f))
      f += 1
    }
    b.array()
  }

  /** RIFF chunk-walking demux: (width, height, frame (offset, length)
    * spans into the blob). Spans, not copies — callers sample a handful
    * of frames, so the whole movi list must not be duplicated in memory.
    * Only UNCOMPRESSED '00db' frames whose length matches the strf
    * geometry exactly are accepted: a truncated frame or a compressed
    * '00dc' payload wrapped as a DIB would be a malformed BMP crashing
    * downstream decoders — the opposite of the stub contract. None when
    * nothing validates; corrupt containers take the caller's stub path,
    * never fail the task.
    */
  def demux(blob: Array[Byte]): Option[(Int, Int, Vector[(Int, Int)])] = {
    def le32(p: Int): Int =
      (blob(p) & 0xff) | ((blob(p + 1) & 0xff) << 8) |
        ((blob(p + 2) & 0xff) << 16) | ((blob(p + 3) & 0xff) << 24)
    def cc(p: Int): String = new String(blob, p, 4, "US-ASCII")
    if (blob.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ") return None
    try {
      var w = -1
      var h = -1
      val frames = Vector.newBuilder[(Int, Int)]
      def walk(start: Int, end: Int): Unit = {
        var p = start
        while (p + 8 <= end) {
          val id = cc(p)
          val size = le32(p + 4)
          if (size < 0 || p + 8 + size > end) return // truncated: stop
          if (id == "LIST") walk(p + 12, p + 8 + size)
          else if (id == "strf" && size >= 40) {
            w = le32(p + 8 + 4); h = le32(p + 8 + 8)
          } else if (id == "00db")
            frames += ((p + 8, size))
          p += 8 + size + (size & 1) // chunks pad to even
        }
      }
      walk(12, math.min(blob.length, 8 + le32(4)))
      if (w <= 0 || h <= 0) return None
      val expected = (3 * w + 3) / 4 * 4 * h
      val fs = frames.result().filter(_._2 == expected)
      if (fs.nonEmpty) Some((w, h, fs)) else None
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }
}

/** One decoded-audio feature row ([[BinaryPipeline.audioFeatures]]);
  * stub rows carry None features.
  */
final case class AudioRow(doc_id: Long, source: String,
    sample_rate: Option[Int], n_samples: Option[Long],
    duration_ms: Option[Long], sum_sq: Option[Long], peak: Option[Long],
    rms: Option[Double])

/** Minimal PCM16 mono WAV writer — the pure-JVM way to materialize a REAL
  * audio payload with deterministic content: a canonical 44-byte RIFF
  * header plus little-endian 16-bit samples from [[Wav.sampleValue]]
  * (same engine-reproducible LCG family as [[Bmp.pixelByte]], so an
  * external oracle predicts every decoded sample with plain integer ops).
  */
object Wav {
  /** 16-bit signed sample i of the deterministic stream for `seed` (same
    * LCG core as [[Bmp.pixelByte]], different reduction).
    */
  def sampleValue(seed: Long, i: Long): Int =
    ((Bmp.lcg(seed, i) % 65536L) - 32768L).toInt

  def encode(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] =
    encodeScaled(nSamples, sampleRate, seed, 1)

  /** [[encode]] with a VOLUME divisor: sample i = sampleValue/div with
    * Java truncating division (symmetric in sign, so
    * |s/div| = |s| div div exactly — the form an external oracle replays
    * as `abs(s) // div` with a nonnegative operand, no floor-vs-trunc
    * ambiguity). The audio near-dup gates plant quieter twins of one
    * recording with it — every decoded sample still externally
    * predictable.
    */
  def encodeScaled(nSamples: Int, sampleRate: Int, seed: Long,
                   div: Int): Array[Byte] = {
    require(nSamples > 0 && sampleRate > 0, s"bad shape $nSamples@$sampleRate")
    require(div >= 1, s"volume divisor must be >= 1, got $div")
    val dataSize = 2 * nSamples
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      b.putShort((sampleValue(seed, i.toLong) / div).toShort)
      i += 1
    }
    b.array()
  }
}

/** Minimal animated-GIF writer over javax.imageio — the pure-JVM way to
  * materialize a REAL multi-frame media payload with deterministic content.
  * Frames are TYPE_BYTE_INDEXED (palette indices stored verbatim by GIF's
  * LZW — no quantization), so the encode→decode round trip is pixel-exact
  * and externally predictable from [[Bmp.pixelByte]].
  */
object Gif {
  def encodeAnimated(width: Int, height: Int, frames: Int,
                     seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && frames > 0,
      s"bad shape ${width}x$height x$frames")
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            raster.setSample(x, y, 0,
              Bmp.pixelByte(seed + f, (y.toLong * width + x)))
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }
}

/** Multimodal column plumbing (SURVEY §2 item 41): media payloads ride as
  * opaque `binary` columns with typed metadata; decode/feature-extract runs
  * batched per partition via `mapPartitions` (the Scala analog of a Pandas
  * mapInPandas UDF — one iterator per partition, no per-row driver calls,
  * arbitrary native libs usable inside).
  *
  * Decode is REAL for the formats the JVM ships codecs for (BMP/PNG/JPEG/
  * GIF via javax.imageio — magic-byte sniffed, then parsed); payloads that
  * are not images fall back to a clearly-labeled deterministic stub
  * ('fake/raw') standing in for codecs this container lacks (video/audio).
  */
object BinaryPipeline {

  // keep ImageIO off its disk cache: blobs are small in-memory arrays
  javax.imageio.ImageIO.setUseCache(false)

  /** ONE home for container detection — every stage branches off this
    * (graft-wide: the binary-embedding pipeline sniffs mimes for its
    * SPI batches too).
    */
  private[graft] def sniff(blob: Array[Byte]): Option[String] = {
    def at(i: Int) = blob(i) & 0xff
    def riffType(t: String) = blob.length >= 12 && at(0) == 'R' && at(1) == 'I' &&
      at(2) == 'F' && at(3) == 'F' && new String(blob, 8, 4, "US-ASCII") == t
    if (blob.length >= 4 && at(0) == 'B' && at(1) == 'M') Some("image/bmp")
    else if (blob.length >= 4 && at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G')
      Some("image/png")
    else if (blob.length >= 2 && at(0) == 0xff && at(1) == 0xd8) Some("image/jpeg")
    else if (blob.length >= 4 && at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8')
      Some("image/gif")
    else if (riffType("AVI ")) Some("video/avi")
    else if (riffType("WAVE")) Some("audio/wav")
    // lossy containers: no pure-JVM codec, but sniffing them lets an
    // SPI-registered BlobDecoder upgrade their rows; without a decoder
    // they keep the generic stub tags ("fake/raw" / "bytes-stub")
    else if (blob.length >= 12 && new String(blob, 4, 4, "US-ASCII") == "ftyp")
      Some("video/mp4")
    else if (blob.length >= 4 && at(0) == 0x1a && at(1) == 0x45 &&
      at(2) == 0xdf && at(3) == 0xa3) Some("video/webm")
    else if (blob.length >= 4 && at(0) == 'O' && at(1) == 'g' &&
      at(2) == 'g' && at(3) == 'S') Some("audio/ogg")
    else if (blob.length >= 3 && at(0) == 'I' && at(1) == 'D' && at(2) == '3')
      Some("audio/mp3")
    else None
  }

  /** Deterministic fake decode for non-image payloads: derives "image"
    * dimensions from metadata and a byte checksum from the payload.
    */
  private def stubDecode(docId: Long, blob: Array[Byte], nChars: Long): MediaFeatures = {
    val width = (nChars % 640 + 1).toInt
    val height = (nChars % 480 + 1).toInt
    val checksum = blob.take(64).foldLeft(0L)((acc, b) => acc + (b & 0xff)) % 9973L
    MediaFeatures(docId, blob.length, width, height,
      width.toDouble / height, checksum, "fake/raw")
  }

  /** Real decode: parse the image, report true dimensions and a checksum
    * over the first ≤64 decoded pixels (row-major, r+g+b summed).
    */
  private def decodeOne(docId: Long, blob: Array[Byte], nChars: Long): MediaFeatures =
    sniff(blob).flatMap { fmt =>
      // an SPI-registered decoder for this container wins (the upgrade
      // path for lossy codecs the bare JVM lacks); a decoder throwing on
      // a magic-matching-but-malformed payload is the stub case, not a
      // task failure
      BlobDecoders.byFormat.get(fmt)
        .flatMap(d => try d.features(docId, blob, nChars)
                      catch { case scala.util.control.NonFatal(_) => None })
        .orElse(
      (try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob)))
       catch { case scala.util.control.NonFatal(_) => None })
        .map { img =>
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0L
          var i = 0
          val n = math.min(64, w * h)
          while (i < n) {
            val rgb = img.getRGB(i % w, i / w)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            i += 1
          }
          MediaFeatures(docId, blob.length, w, h, w.toDouble / h, sum % 9973L, fmt)
        })
    }.getOrElse(stubDecode(docId, blob, nChars))

  /** df must expose (idCol: long, blobCol: binary, metaCol: long). */
  def decodeFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                     blobCol: String, metaCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"),
        col(metaCol).cast("long"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions(_.map { case (id, blob, meta) => decodeOne(id, blob, meta) })
      .toDF()
  }

  /** Materialize REAL (deterministic) BMP payloads from per-row dimension/
    * seed columns — the write-side counterpart of [[decodeFeatures]], and
    * the way specs/queries obtain genuine image bytes without external
    * libraries. Output: (idCol, blob, metaCol passthrough).
    */
  def encodeBmp(spark: SparkSession, df: DataFrame, idCol: String,
                wCol: String, hCol: String, seedCol: String,
                metaCol: String): DataFrame = {
    import spark.implicits._
    // spread before the CPU-bound per-row encode — same single-split trap
    // the q95 probe measured at 12× (applies to every encode stage)
    df.select(col(idCol).cast("long"), col(wCol).cast("int"),
        col(hCol).cast("int"), col(seedCol).cast("long"),
        col(metaCol).cast("long"))
      .repartition(col(idCol))
      .as[(Long, Int, Int, Long, Long)]
      .mapPartitions(_.map { case (id, w, h, seed, meta) =>
        (id, Bmp.encode(w, h, seed), meta)
      })
      .toDF(idCol, "blob", metaCol)
  }

  /** [[encodeBmp]] with the deterministic corner patch
    * ([[Bmp.encodePatched]]): per-row (pwCol, phCol) give the patch
    * rectangle (0 × anything = unpatched), `patchValue` the per-channel
    * byte. The image near-dup gates use it to plant replayable
    * perturbations.
    */
  def encodeBmpPatched(spark: SparkSession, df: DataFrame, idCol: String,
                       wCol: String, hCol: String, seedCol: String,
                       pwCol: String, phCol: String,
                       patchValue: Int): DataFrame = {
    import spark.implicits._
    // spread before the CPU-bound per-row encode (single-split input
    // trap — the q95 probe's 12× lesson, same as encodeBmp)
    df.select(col(idCol).cast("long"), col(wCol).cast("int"),
        col(hCol).cast("int"), col(seedCol).cast("long"),
        col(pwCol).cast("int"), col(phCol).cast("int"))
      .repartition(col(idCol))
      .as[(Long, Int, Int, Long, Int, Int)]
      .mapPartitions(_.map { case (id, w, h, seed, pw, ph) =>
        (id, Bmp.encodePatched(w, h, seed, pw, ph, patchValue))
      })
      .toDF(idCol, "blob")
  }

  /** TRANSCODE stage: decode real images and re-encode through any
    * ImageIO writer (`format` = "png"/"bmp"/"gif"...). Lossless writers
    * preserve every decoded pixel, so perceptual hashes computed after a
    * transcode must equal the original's — the cross-codec invariance
    * the image-dedup gate exercises. Non-decodable payloads pass
    * through untouched with a `passthrough` label (the [[resize]]
    * honesty contract). Output: (idCol, blobCol, transform).
    */
  def transcode(spark: SparkSession, df: DataFrame, idCol: String,
                blobCol: String, format: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .repartition(col(idCol)) // CPU-bound decode+encode: spread first
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val real = sniff(blob).flatMap { _ =>
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob)))
          catch { case scala.util.control.NonFatal(_) => None }
        }.flatMap { img =>
          val buf = new java.io.ByteArrayOutputStream()
          // write() returns false when no writer handles (img, format) —
          // that is the passthrough case, not a half-written payload
          if (javax.imageio.ImageIO.write(img, format, buf))
            Some(buf.toByteArray)
          else None
        }
        real match {
          case Some(bytes) => (id, bytes, s"transcoded-$format")
          case None        => (id, blob, s"passthrough-$format")
        }
      })
      .toDF(idCol, blobCol, "transform")
  }

  /** WAV encoder stage ([[Wav.encode]] batched per partition, like
    * [[encodeBmp]]): one deterministic PCM16 payload per row.
    */
  def encodeWav(spark: SparkSession, df: DataFrame, idCol: String,
                nCol: String, rateCol: String, seedCol: String): DataFrame = {
    import spark.implicits._
    // small compressed parquet arrives as ONE split; the per-row encode is
    // CPU-bound and must spread first (same lesson as the shingle
    // pipelines — the 10× probe measured 12× without this)
    df.select(col(idCol).cast("long"), col(nCol).cast("int"),
        col(rateCol).cast("int"), col(seedCol).cast("long"))
      .repartition(col(idCol))
      .as[(Long, Int, Int, Long)]
      .mapPartitions(_.map { case (id, n, rate, seed) =>
        (id, Wav.encode(n, rate, seed))
      })
      .toDF(idCol, "blob")
  }

  /** [[encodeWav]] with a per-row VOLUME divisor column
    * ([[Wav.encodeScaled]]) — the audio near-dup gates' way to plant
    * replayable quieter twins (div = 1 is the unscaled recording).
    */
  def encodeWavScaled(spark: SparkSession, df: DataFrame, idCol: String,
                      nCol: String, rateCol: String, seedCol: String,
                      divCol: String): DataFrame = {
    import spark.implicits._
    // spread before the CPU-bound per-row encode (single-split input
    // trap — the q95 probe's 12× lesson)
    df.select(col(idCol).cast("long"), col(nCol).cast("int"),
        col(rateCol).cast("int"), col(seedCol).cast("long"),
        col(divCol).cast("int"))
      .repartition(col(idCol))
      .as[(Long, Int, Int, Long, Int)]
      .mapPartitions(_.map { case (id, n, rate, seed, div) =>
        (id, Wav.encodeScaled(n, rate, seed, div))
      })
      .toDF(idCol, "blob")
  }

  /** Resize stage: decodes real images, scales them with AWT (area-capable
    * bilinear via Graphics2D), re-encodes as BMP; non-image payloads pass
    * through a labeled stub path. Runs per partition — same batch shape a
    * native codec call would use.
    */
  def resize(spark: SparkSession, df: DataFrame, idCol: String,
             blobCol: String, targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val real = sniff(blob).flatMap { _ =>
          // same guard as decodeOne: a reader throwing on a magic-matching
          // but malformed payload (now including lossy-container magics) is
          // the passthrough case, never a task failure
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob)))
          catch { case scala.util.control.NonFatal(_) => None }
        }.map { img =>
          val out = new java.awt.image.BufferedImage(targetW, targetH,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
          } finally g.dispose()
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "bmp", buf)
          buf.toByteArray
        }
        real match {
          case Some(bytes) => (id, bytes, targetW, targetH, s"resized-${targetW}x$targetH")
          // undecodable payloads pass through untouched — label them so no
          // consumer mistakes them for genuinely rescaled images
          case None => (id, blob, targetW, targetH, s"passthrough-${targetW}x$targetH")
        }
      })
      .toDF(idCol, blobCol, "width", "height", "transform")
  }

  /** Frame-sampling stage: REAL for animated GIF (the one multi-frame
    * container the JVM ships a codec for) — up to `frames` evenly spaced
    * frames are decoded via ImageIO and re-encoded as BMP, `src_frame`
    * recording each sample's original frame index. Video containers
    * (mp4/webm/audio) remain a labeled STUB — no pure-JVM codec exists —
    * slicing the payload into `frames` equal byte windows with
    * source='bytes-stub'. One input row → N output rows, preserving
    * partition-batched execution (the iterator never materializes the
    * whole partition).
    */
  def frameSample(spark: SparkSession, df: DataFrame, idCol: String,
                  blobCol: String, frames: Int): DataFrame = {
    import spark.implicits._
    require(frames > 0, "frames must be positive")
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        val real = sniff(blob) match {
          case Some("video/avi") => aviFrames(id, blob, frames)
          case Some("image/gif") => gifFrames(id, blob, frames)
          // lossy containers: an SPI-registered decoder upgrades them
          case Some(f) =>
            BlobDecoders.byFormat.get(f).flatMap(d =>
              try d.frames(id, blob, frames)
              catch { case scala.util.control.NonFatal(_) => None })
          case None => None
        }
        real.getOrElse {
          val window = math.max(1, blob.length / frames)
          (0 until math.min(frames, blob.length)).iterator.map { f =>
            val start = f * window
            (id, f, f,
              blob.slice(start, math.min(start + window, blob.length)),
              "bytes-stub")
          }
        }
      })
      .toDF(idCol, "frame_no", "src_frame", "frame_bytes", "source")
  }

  /** REAL audio feature extraction: WAV payloads decode through
    * `javax.sound.sampled.AudioSystem` (the JVM's actual audio codec
    * path — format negotiation, frame accounting — not a byte-peeking
    * shortcut) into PCM16 samples, batched per partition like the image
    * stages. Emitted per row: sample_rate, n_samples, duration_ms (exact
    * integer), sum_sq and peak (exact longs over the decoded samples) and
    * rms (ONE division + sqrt over the exact moments — correctly-rounded
    * IEEE, deterministic anywhere). Non-WAV/undecodable payloads take the
    * labeled stub row (source='bytes-stub', null features) — mp3/ogg/mp4
    * stay stubs, no pure-JVM codec exists.
    */
  def audioFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                    blobCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        wavFeatures(blob) match {
          case Some((rate, n, sumSq, peak)) =>
            AudioRow(id, "audio/wav", Some(rate), Some(n),
              Some(n * 1000L / rate), Some(sumSq), Some(peak),
              Some(math.sqrt(sumSq.toDouble / n)))
          case None =>
            AudioRow(id, "bytes-stub", None, None, None, None, None, None)
        }
      })
      .toDF()
      .withColumnRenamed("doc_id", idCol)
  }

  /** (sampleRate, nSamples, Σs², max|s|) via the real AudioSystem decode;
    * None when no reader accepts the payload or it is not 16-bit PCM.
    */
  private def wavFeatures(blob: Array[Byte])
      : Option[(Int, Long, Long, Long)] = {
    if (!sniff(blob).contains("audio/wav")) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(blob))
      try {
        val fmt = in.getFormat
        // rate guard: a header declaring 0/negative Hz would divide-by-
        // zero the duration downstream — that is a corrupt payload, stub
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.getSampleRate <= 0) return None
        val bytes = in.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(bytes).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        var sumSq = 0L
        var peak = 0L
        var n = 0L
        while (bb.remaining() >= 2) {
          val s = bb.getShort.toLong
          sumSq += s * s
          if (math.abs(s) > peak) peak = math.abs(s)
          n += 1
        }
        if (n == 0) None
        else Some((fmt.getSampleRate.toInt, n, sumSq, peak))
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => None // corrupt: stub path
    }
  }

  /** REAL video demux: walk the AVI container ([[Avi.demux]]), sample ≤ k
    * evenly spaced DIB frames, re-wrap each as a standalone BMP. Corrupt
    * containers fall back to the stub path.
    */
  private def aviFrames(id: Long, blob: Array[Byte], k: Int)
      : Option[Iterator[(Long, Int, Int, Array[Byte], String)]] =
    Avi.demux(blob).map { case (w, h, spans) =>
      val n = spans.length
      val srcIdxs =
        if (n <= k) 0 until n
        else (0 until k).map(f => (f.toLong * n / k).toInt)
      srcIdxs.zipWithIndex.map { case (src, ord) =>
        val (off, len) = spans(src) // copy ONLY the sampled frames
        (id, ord, src,
          Bmp.wrapDib(w, h, java.util.Arrays.copyOfRange(blob, off, off + len)),
          "avi")
      }.iterator
    }

  /** AVI encoder stage ([[Avi.encode]] batched per partition): one
    * deterministic DIB-frames video payload per row.
    */
  def encodeAvi(spark: SparkSession, df: DataFrame, idCol: String,
                wCol: String, hCol: String, framesCol: String,
                seedCol: String): DataFrame = {
    import spark.implicits._
    // spread before the CPU-bound per-row encode (single-split input trap,
    // measured live by the q95 probe)
    df.select(col(idCol).cast("long"), col(wCol).cast("int"),
        col(hCol).cast("int"), col(framesCol).cast("int"),
        col(seedCol).cast("long"))
      .repartition(col(idCol))
      .as[(Long, Int, Int, Int, Long)]
      .mapPartitions(_.map { case (id, w, h, n, seed) =>
        (id, Avi.encode(w, h, n, seed))
      })
      .toDF(idCol, "blob")
  }

  /** Decode ≤ `k` evenly spaced frames of an animated GIF; None when the
    * payload sniffs as GIF but no reader can parse it (falls back to the
    * stub path rather than failing the partition).
    */
  private def gifFrames(id: Long, blob: Array[Byte], k: Int)
      : Option[Iterator[(Long, Int, Int, Array[Byte], String)]] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(blob))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); return None }
    val reader = readers.next()
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      if (n <= 0) return None
      val srcIdxs =
        if (n <= k) 0 until n
        else (0 until k).map(f => (f.toLong * n / k).toInt)
      // materialized before the reader is disposed (the map is strict)
      Some(srcIdxs.zipWithIndex.map { case (src, ord) =>
        val img = reader.read(src)
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "bmp", buf)
        (id, ord, src, buf.toByteArray, "gif")
      }.iterator)
    } catch {
      // a blob can carry the GIF magic yet have a truncated/corrupt body:
      // the reader registers (so the no-reader escape above is not taken)
      // but getNumImages/read throws — that is precisely the unparseable
      // case the stub fallback exists for, not a reason to fail the task
      case scala.util.control.NonFatal(_) => None
    } finally {
      reader.dispose()
      iis.close()
    }
  }
}
