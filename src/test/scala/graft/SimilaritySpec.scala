package graft

import graft.operators.similarity.{CosineTopK, LshAnn}

class SimilaritySpec extends SparkSpec {

  test("LSH ANN recall@10 vs brute-force cosine is usable") {
    val vecs = Tables.embeddings(spark, sf("0.001"))
    val exact = CosineTopK.search(vecs, "vec_id", "embedding", _ < 10, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = LshAnn.search(vecs, "vec_id", "embedding", _ < 10, 10, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == 100, s"expected 10 queries x 10 neighbors, got ${exact.size}")
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"LSH recall@10 = $recall")
    // measured 0.38 @10 on this corpus (round 11); floor within ~0.1
    assert(recall >= 0.3, s"LSH recall regressed: $recall (measured 0.38)")
  }

  test("IVF ANN recall@10 vs brute force is usable and bounded by probe count") {
    val vecs = Tables.embeddings(spark, sf("0.001"))
    val exact = CosineTopK.search(vecs, "vec_id", "embedding", _ < 10, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.operators.similarity.IvfAnn.search(vecs, "vec_id", "embedding",
        _ < 10, 10, nCentroids = 8, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    info(s"IVF recall@10 = $recall")
    // measured 0.82 @10 with trained centroids (round 11)
    assert(recall >= 0.7, s"IVF recall regressed: $recall (measured 0.82)")
  }

  test("NSW graph ANN recall@10 vs brute force beats the bucketed paths' floor") {
    val vecs = Tables.embeddings(spark, sf("0.001"))
    val exact = CosineTopK.search(vecs, "vec_id", "embedding", _ < 10, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nsw = graft.operators.similarity.NswAnn.search(
        vecs, "vec_id", "embedding", _ < 10, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nsw.size == 100, s"expected 10 queries x 10 neighbors, got ${nsw.size}")
    val recall = exact.intersect(nsw).size.toDouble / exact.size
    info(s"NSW recall@10 = $recall")
    // measured 0.98 @10 with trained hubs (round 11)
    assert(recall >= 0.9, s"NSW recall regressed: $recall (measured 0.98)")
    // determinism: a second run (fresh plan) reproduces the identical set
    val again = graft.operators.similarity.NswAnn.search(
        vecs, "vec_id", "embedding", _ < 10, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == nsw)
  }

  test("PQ ANN recall@10 vs brute force is usable; codes compress 64 floats to one int") {
    val vecs = Tables.embeddings(spark, sf("0.001"))
    val exact = CosineTopK.search(vecs, "vec_id", "embedding", _ < 10, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = graft.operators.similarity.PqAnn.search(
        vecs, "vec_id", "embedding", _ < 10, k = 10, rerank = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq.size == 100, s"expected 10 queries x 10 neighbors, got ${pq.size}")
    val recall = exact.intersect(pq).size.toDouble / exact.size
    info(s"PQ recall@10 = $recall")
    // measured 0.70 @10 at rerank=50 with trained codewords (round 11)
    assert(recall >= 0.6, s"PQ recall regressed: $recall (measured 0.70)")
    // determinism across fresh plans
    val again = graft.operators.similarity.PqAnn.search(
        vecs, "vec_id", "embedding", _ < 10, k = 10, rerank = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == pq)
  }

  test("multimodal pipeline REAL-decodes a BMP per document") {
    val out = queries.SimilarityQueries.q30Multimodal(spark, sf("0.001"))
    val n = Tables.documents(spark, sf("0.001")).count()
    assert(out.count() == n)
    val row = out.orderBy("doc_id").head()
    assert(row.getAs[Int]("byte_len") > 54, "real BMP bytes, not raw text")
    assert(row.getAs[Double]("aspect_ratio") > 0)
    assert(row.getAs[String]("format") == "image/bmp")
  }

  test("decodeFeatures parses real PNG bytes and falls back to the stub for non-images") {
    import spark.implicits._
    import graft.operators.multimodal.BinaryPipeline
    // a real 7x5 PNG written by the JVM codec
    val img = new java.awt.image.BufferedImage(7, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(2, 3, 0x123456)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray
    val df = Seq((1L, png, 99L), (2L, "not an image".getBytes("UTF-8"), 42L))
      .toDF("doc_id", "blob", "meta")
    val out = BinaryPipeline.decodeFeatures(spark, df, "doc_id", "blob", "meta")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("width") == 7 && out(1L).getAs[Int]("height") == 5)
    assert(out(1L).getAs[String]("format") == "image/png")
    // stub path: dimensions derive from metadata, format labeled fake
    assert(out(2L).getAs[String]("format") == "fake/raw")
    assert(out(2L).getAs[Int]("width") == 43 && out(2L).getAs[Int]("height") == 43)
  }

  test("resize really rescales decodable images") {
    import spark.implicits._
    import graft.operators.multimodal.{Bmp, BinaryPipeline}
    val df = Seq((1L, Bmp.encode(32, 16, seed = 7L))).toDF("doc_id", "blob")
    val resized = BinaryPipeline.resize(spark, df, "doc_id", "blob", 8, 8)
    val blob = resized.head().getAs[Array[Byte]]("blob")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    assert(back.getWidth == 8 && back.getHeight == 8, "re-decoded resized BMP")
  }

  test("multimodal resize and frame-sample stages keep batch plumbing intact") {
    import org.apache.spark.sql.functions._
    val d = Tables.documents(spark, sf("0.001"))
      .select(col("doc_id"), col("text").cast("binary").as("blob")).limit(20)
    val resized = graft.operators.multimodal.BinaryPipeline
      .resize(spark, d, "doc_id", "blob", 224, 224)
    assert(resized.count() == 20)
    // text payloads are not decodable images: labeled passthrough
    assert(resized.select("transform").head().getString(0) == "passthrough-224x224")
    val frames = graft.operators.multimodal.BinaryPipeline
      .frameSample(spark, d, "doc_id", "blob", frames = 4)
    assert(frames.count() == 80, "one row per sampled frame")
    val fl = frames.filter(col("doc_id") === frames.select("doc_id").head().getLong(0))
      .orderBy("frame_no").collect()
    assert(fl.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(fl.forall(_.getAs[Array[Byte]]("frame_bytes").nonEmpty))
    // text payloads are not a multi-frame container: labeled stub path
    assert(fl.forall(_.getAs[String]("source") == "bytes-stub"))
  }

  test("frameSample decodes REAL animated-GIF frames, evenly sampled, pixel-exact") {
    import spark.implicits._
    import graft.operators.multimodal.{BinaryPipeline, Bmp, Gif}
    val (w, h) = (8, 6)
    val gif = Gif.encodeAnimated(w, h, frames = 10, seed = 7L)
    val df = Seq((1L, gif)).toDF("doc_id", "blob")
    val out = BinaryPipeline.frameSample(spark, df, "doc_id", "blob", frames = 4)
      .orderBy("frame_no").collect()
    // 4 evenly spaced samples out of 10 source frames, all real-decoded
    assert(out.map(r => (r.getInt(1), r.getInt(2), r.getString(4))).toSeq ==
      Seq((0, 0, "gif"), (1, 2, "gif"), (2, 5, "gif"), (3, 7, "gif")),
      out.mkString(","))
    out.foreach { r =>
      val src = r.getInt(2)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("frame_bytes")))
      assert(img.getWidth == w && img.getHeight == h)
      // reference frame: same deterministic generator, same indexed palette
      // — GIF stores palette indices verbatim, so the round trip must be
      // pixel-exact, not approximately equal
      val ref = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
      for (y <- 0 until h; x <- 0 until w)
        ref.getRaster.setSample(x, y, 0, Bmp.pixelByte(7L + src, y.toLong * w + x))
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRGB(x, y) == ref.getRGB(x, y),
          s"pixel ($x,$y) of sampled frame $src diverged")
    }
    // a 3-frame GIF sampled at k=4 yields all 3 real frames, no padding
    val small = Seq((2L, Gif.encodeAnimated(w, h, frames = 3, seed = 11L)))
      .toDF("doc_id", "blob")
    val sm = BinaryPipeline.frameSample(spark, small, "doc_id", "blob", frames = 4)
      .orderBy("frame_no").collect()
    assert(sm.map(r => (r.getInt(1), r.getInt(2))).toSeq ==
      Seq((0, 0), (1, 1), (2, 2)))
    // GIF magic + corrupt body: the reader registers but parsing throws —
    // must fall back to the stub path, not fail the task
    val corrupt = "GIF89a".getBytes("US-ASCII") ++ Array.fill[Byte](40)(0x5a)
    val cr = BinaryPipeline.frameSample(spark,
        Seq((3L, corrupt)).toDF("doc_id", "blob"), "doc_id", "blob", frames = 2)
      .collect()
    assert(cr.nonEmpty && cr.forall(_.getString(4) == "bytes-stub"))
  }

  test("AVI round trip: demuxed frames are byte-identical BMPs, evenly sampled") {
    import spark.implicits._
    import graft.operators.multimodal.{Avi, BinaryPipeline, Bmp}
    val (w, h) = (16, 12)
    val avi = Avi.encode(w, h, frames = 7, seed = 5L)
    // direct demux: every frame span equals the deterministic DIB
    val Some((dw, dh, spans)) = Avi.demux(avi)
    assert(dw == w && dh == h && spans.length == 7)
    spans.zipWithIndex.foreach { case ((off, len), f) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(avi, off, off + len),
        Bmp.dibPayload(w, h, 5L + f)), s"frame $f")
    }
    // through the pipeline: k=3 of 7 → sources 0, 2, 4; wrapped frames
    // are byte-identical to Bmp.encode and ImageIO-decodable
    val out = BinaryPipeline.frameSample(spark,
        Seq((1L, avi)).toDF("doc_id", "blob"), "doc_id", "blob", frames = 3)
      .orderBy("frame_no").collect()
    assert(out.map(r => (r.getInt(1), r.getInt(2), r.getString(4))).toSeq ==
      Seq((0, 0, "avi"), (1, 2, "avi"), (2, 4, "avi")))
    out.foreach { r =>
      val src = r.getInt(2)
      val bytes = r.getAs[Array[Byte]]("frame_bytes")
      assert(java.util.Arrays.equals(bytes, Bmp.encode(w, h, 5L + src)))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth == w && img.getHeight == h)
    }
    // RIFF/AVI magic with a corrupt body: stub path, not a task failure
    val corrupt = "RIFF????AVI ".getBytes("US-ASCII") ++ Array.fill[Byte](30)(9)
    val cr = BinaryPipeline.frameSample(spark,
        Seq((2L, corrupt)).toDF("doc_id", "blob"), "doc_id", "blob", frames = 2)
      .collect()
    assert(cr.nonEmpty && cr.forall(_.getString(4) == "bytes-stub"))
  }

  test("audioFeatures REAL-decodes WAV via AudioSystem; stats exact; stubs labeled") {
    import spark.implicits._
    import graft.operators.multimodal.{BinaryPipeline, Wav}
    val n = 123
    val wav = Wav.encode(n, 8000, seed = 7L)
    val expectSamples = (0 until n).map(i => Wav.sampleValue(7L, i.toLong))
    val expSumSq = expectSamples.map(s => s.toLong * s).sum
    val expPeak = expectSamples.map(s => math.abs(s.toLong)).max
    val out = BinaryPipeline.audioFeatures(spark,
        Seq((1L, wav), (2L, "not audio at all".getBytes("UTF-8")),
          (3L, "RIFF".getBytes("US-ASCII") ++ Array.fill[Byte](20)(3)))
          .toDF("doc_id", "blob"),
        "doc_id", "blob")
      .collect().map(r => r.getLong(0) -> r).toMap
    val ok = out(1L)
    assert(ok.getString(1) == "audio/wav" && ok.getInt(2) == 8000)
    assert(ok.getLong(3) == n && ok.getLong(4) == n * 1000L / 8000)
    assert(ok.getLong(5) == expSumSq && ok.getLong(6) == expPeak)
    assert(ok.getDouble(7) == math.sqrt(expSumSq.toDouble / n))
    // non-audio and corrupt-RIFF payloads take the labeled stub row
    assert(out(2L).getString(1) == "bytes-stub" && out(2L).isNullAt(5))
    assert(out(3L).getString(1) == "bytes-stub")
  }
}
