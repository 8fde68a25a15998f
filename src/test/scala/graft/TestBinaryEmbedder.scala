package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import graft.pipelines.BinaryEmbedder

/** Test-classpath BINARY SPI embedder (registered via
  * src/test/resources/META-INF/services) — proves the bytes→vector
  * upgrade path: an environment shipping a CLIP-class encoder jar sees
  * [[graft.pipelines.BinaryEmbeddingPipeline]]'s embed stage leave the
  * stub-join path with no pipeline code change. Deterministic — a pure
  * function of the DECODED image width — so the spec forces semantic
  * near-dups through the real stage; static counters observe the batch
  * shape and the sniffed mimes (one JVM in local mode).
  */
final class TestBinaryEmbedder extends BinaryEmbedder {
  override def model: String = "graft-test-binary"
  override def dims: Int = 4

  override def embed(blobs: Seq[(Array[Byte], String)]): Seq[Array[Float]] = {
    TestBinaryEmbedder.calls.incrementAndGet()
    TestBinaryEmbedder.blobsSeen.addAndGet(blobs.length)
    blobs.foreach { case (_, mime) => TestBinaryEmbedder.mimes.add(mime) }
    blobs.map { case (blob, _) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(blob))
      // one-hot on the decoded WIDTH: same-width images become semantic
      // dups even when their pixels (and fingerprints) differ
      val v = Array.fill(4)(0.0f)
      v(img.getWidth % 4) = 1.0f
      v
    }
  }
}

object TestBinaryEmbedder {
  val calls = new AtomicInteger(0)
  val blobsSeen = new AtomicLong(0L)
  val mimes = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def reset(): Unit = { calls.set(0); blobsSeen.set(0L); mimes.clear() }
}
