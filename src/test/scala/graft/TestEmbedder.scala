package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import graft.pipelines.Embedder

/** Test-classpath SPI embedder registered via
  * src/test/resources/META-INF/services — proves the [[Embedder]]
  * upgrade path end-to-end: an environment that ships a model jar sees
  * the q124 chain's embed stage leave the stub-join path with no
  * pipeline code change. Deterministic (a pure function of the text) so
  * EmbedderSpiSpec predicts the geometry; static counters observe the
  * partition-side batch shape (one JVM in local mode).
  */
final class TestEmbedder extends Embedder {
  override def model: String = "graft-test"
  override def dims: Int = 4

  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    TestEmbedder.calls.incrementAndGet()
    TestEmbedder.textsSeen.addAndGet(texts.length)
    TestEmbedder.maxBatch.accumulateAndGet(texts.length, math.max)
    texts.map { t =>
      // identical vector for texts sharing a first word — lets the spec
      // force semantic near-dups through the REAL embed stage; one-hot
      // so unrelated words land (mostly) orthogonal
      val w = t.trim.split("\\s+").headOption.getOrElse("")
      val h = w.hashCode & 0x7fffffff
      val v = Array.fill(4)(0.0f)
      v(h % 4) = (h % 9 + 1).toFloat
      v
    }
  }
}

object TestEmbedder {
  val calls = new AtomicInteger(0)
  val textsSeen = new AtomicLong(0L)
  val maxBatch = new AtomicInteger(0)

  def reset(): Unit = { calls.set(0); textsSeen.set(0L); maxBatch.set(0) }
}
