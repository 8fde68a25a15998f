package graft

import graft.operators.multimodal.{BlobDecoder, MediaFeatures}

/** Test-classpath SPI decoder registered via
  * src/test/resources/META-INF/services — proves the BlobDecoder upgrade
  * path end-to-end: an environment that ships an mp4 codec jar sees its
  * rows leave the stub path with no code change, exactly like an ImageIO
  * plugin. "Decodes" the synthetic ftyp payloads MultimodalSpiSpec
  * builds (width/height read from two fixed header bytes; checksum over
  * the payload tail), deterministic so the spec predicts every field.
  */
final class TestMp4Decoder extends BlobDecoder {
  override def format: String = "video/mp4"

  override def features(docId: Long, blob: Array[Byte],
                        nChars: Long): Option[MediaFeatures] = {
    if (blob.length < 14) return None
    val w = blob(12) & 0xff
    val h = blob(13) & 0xff
    if (w == 0 || h == 0) return None
    val checksum = blob.drop(14).foldLeft(0L)((a, b) => a + (b & 0xff)) % 9973L
    Some(MediaFeatures(docId, blob.length, w, h, w.toDouble / h, checksum,
      "video/mp4"))
  }

  override def frames(docId: Long, blob: Array[Byte], maxFrames: Int)
      : Option[Iterator[(Long, Int, Int, Array[Byte], String)]] = {
    if (blob.length < 14) return None
    val payload = blob.drop(14)
    val n = math.min(maxFrames, math.max(1, payload.length / 4))
    Some((0 until n).iterator.map { f =>
      (docId, f, f, payload.slice(f * 4, f * 4 + 4), "video/mp4")
    })
  }
}
