package graft

import org.apache.spark.sql.functions._

import graft.operators.multimodal.{BinaryPipeline, BlobDecoders}

/** The BlobDecoder SPI (pluggable lossy-codec upgrade path): with
  * [[TestMp4Decoder]] on the test classpath (registered through
  * META-INF/services exactly as a production codec jar would be),
  * ftyp-magic payloads leave the stub path in decodeFeatures AND
  * frameSample, while unregistered containers keep their honest stub
  * rows.
  */
class MultimodalSpiSpec extends SparkSpec {
  import spark.implicits._

  /** A synthetic "mp4": 4-byte size + 'ftyp' + brand + flags, then the
    * two header bytes TestMp4Decoder reads as dimensions, then payload.
    */
  private def fakeMp4(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    val head = Array[Byte](0, 0, 0, 20, 'f', 't', 'y', 'p',
      'i', 's', 'o', 'm', w.toByte, h.toByte)
    head ++ payload
  }

  test("ServiceLoader discovers the test decoder per JVM") {
    assert(BlobDecoders.byFormat.contains("video/mp4"))
    // nothing registered for the other lossy sniffs — their rows stay stubs
    assert(!BlobDecoders.byFormat.contains("video/webm"))
  }

  test("decodeFeatures upgrades registered containers, stubs the rest") {
    val mp4 = fakeMp4(64, 32, Array.tabulate(16)(i => (i * 7).toByte))
    val webm = Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte) ++
      Array.tabulate(16)(i => i.toByte)
    val df = Seq((1L, mp4, 100L), (2L, webm, 100L))
      .toDF("doc_id", "blob", "n_chars")
    val out = BinaryPipeline.decodeFeatures(spark, df, "doc_id", "blob", "n_chars")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // registered: real decode through the SPI, format tag = container
    assert(out(1L).getAs[String]("format") == "video/mp4")
    assert(out(1L).getAs[Int]("width") == 64)
    assert(out(1L).getAs[Int]("height") == 32)
    val expectedSum = Array.tabulate(16)(i => (i * 7).toByte)
      .foldLeft(0L)((a, b) => a + (b & 0xff)) % 9973L
    assert(out(1L).getAs[Long]("checksum") == expectedSum)
    // unregistered lossy container: honest stub
    assert(out(2L).getAs[String]("format") == "fake/raw")
  }

  test("frameSample upgrades registered containers, stubs the rest") {
    val payload = Array.tabulate(12)(i => (i + 1).toByte)
    val mp4 = fakeMp4(8, 8, payload)
    val webm = Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte) ++ payload
    val df = Seq((1L, mp4), (2L, webm)).toDF("doc_id", "blob")
    val out = BinaryPipeline.frameSample(spark, df, "doc_id", "blob", frames = 3)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    // registered: 3 real 4-byte frames, source = container
    val f1 = out(1L).sortBy(_.getAs[Int]("frame_no"))
    assert(f1.length == 3 && f1.forall(_.getAs[String]("source") == "video/mp4"))
    assert(f1(0).getAs[Array[Byte]]("frame_bytes").toSeq == payload.slice(0, 4).toSeq)
    // unregistered: byte-window stub rows, honestly labeled
    assert(out(2L).forall(_.getAs[String]("source") == "bytes-stub"))
  }
}
