package graft.pipelines

/** SPI for environment-provided embedding models — the inference-side
  * sibling of [[graft.operators.multimodal.BlobDecoder]]: this container
  * ships no model, so [[EmbeddingPipeline]]'s embed stage is an honestly
  * deterministic stub lookup; an environment that HAS one (an ONNX/JNI
  * encoder jar, a co-deployed inference runtime) registers an `Embedder`
  * through `META-INF/services/graft.pipelines.Embedder` and the chain
  * upgrades with no pipeline code change. Discovery is PER JVM via
  * `java.util.ServiceLoader` — the model jar rides the executor
  * classpath like an ImageIO plugin, so a 1000-executor deployment picks
  * it up on every JVM with zero driver-side mutable state to ship;
  * executors re-resolve by `model` key, never deserialize an instance.
  *
  * The inference contract is the public batch shape: the pipeline calls
  * [[Embedder.embed]] once per ≤[[Embedders.BatchSize]] group of chunk
  * texts inside `mapPartitions`, so a real model amortizes
  * tokenize/forward cost across the batch exactly as production
  * inference does (GPU feeders want large dense batches; the group size
  * is the knob).
  */
trait Embedder {

  /** The model key this embedder serves — [[EmbeddingPipeline.run]]
    * routes by it; unregistered keys keep the deterministic stub.
    */
  def model: String

  /** Output dimensionality; checked loudly against the pipeline's
    * configured dims before any inference runs.
    */
  def dims: Int

  /** Batch inference: one `dims`-length vector per input text, in input
    * order. Called with ≤ [[Embedders.BatchSize]] texts per invocation.
    */
  def embed(texts: Seq[String]): Seq[Array[Float]]
}

/** The MULTIMODAL sibling of [[Embedder]] — bytes → vector (a CLIP-class
  * image/audio encoder): [[BinaryEmbeddingPipeline]]'s embed stage routes
  * by the same ServiceLoader-keyed discipline
  * (`META-INF/services/graft.pipelines.BinaryEmbedder`), batched per
  * partition so a real model amortizes decode+forward across the batch.
  * Each input is (payload, sniffed mime) — the mime lets one embedder
  * dispatch per container without re-sniffing.
  */
trait BinaryEmbedder {

  /** The model key [[BinaryEmbeddingPipeline.run]] routes by. */
  def model: String

  /** Output dimensionality; checked loudly before any inference runs. */
  def dims: Int

  /** Batch inference: one `dims`-length vector per (payload, mime), in
    * input order. Called with ≤ [[Embedders.BatchSize]] items.
    */
  def embed(blobs: Seq[(Array[Byte], String)]): Seq[Array[Float]]
}

object Embedders {

  /** Texts per [[Embedder.embed]] call — the micro-batch granularity of
    * partition-side inference.
    */
  val BatchSize = 64

  /** Per-JVM embedder table, resolved once per executor from the
    * classpath (the [[graft.operators.multimodal.BlobDecoders]] loader
    * discipline: thread-context loader first so `--jars`-shipped model
    * jars are visible when graft rides the system classpath).
    */
  lazy val byModel: Map[String, Embedder] = {
    import scala.jdk.CollectionConverters._
    val loader = Option(Thread.currentThread().getContextClassLoader)
      .getOrElse(classOf[Embedder].getClassLoader)
    java.util.ServiceLoader.load(classOf[Embedder], loader)
      .iterator().asScala.map(e => e.model -> e).toMap
  }

  /** Per-JVM [[BinaryEmbedder]] table — same loader discipline. */
  lazy val byModelBinary: Map[String, BinaryEmbedder] = {
    import scala.jdk.CollectionConverters._
    val loader = Option(Thread.currentThread().getContextClassLoader)
      .getOrElse(classOf[BinaryEmbedder].getClassLoader)
    java.util.ServiceLoader.load(classOf[BinaryEmbedder], loader)
      .iterator().asScala.map(e => e.model -> e).toMap
  }

  /** The stub keyspace size, with the contract checked LOUDLY: the stub
    * embed stage keys `hash(fp) mod nVecs` into the lookup table, so the
    * table must be non-empty (an empty one previously surfaced as an
    * opaque NPE off a null max) and its vec_id keyspace must be exactly
    * the CONTIGUOUS [0, max] — a sparse keyspace would silently DROP
    * every survivor whose hash lands on a hole at the inner join, the
    * one failure a dedup pipeline cannot absorb. One bounded aggregate
    * row (min/max/distinct-count over the dim-sized lookup table).
    */
  def stubKeyspaceSize(embeddings: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.functions._
    val r = embeddings.agg(min(col("vec_id")), max(col("vec_id")),
      count_distinct(col("vec_id")), count(lit(1))).head()
    require(!r.isNullAt(1) && r.getLong(3) > 0,
      "stub embed stage needs a non-empty embeddings lookup table " +
        "(no vec_id rows found) — pass the embeddings parquet or register " +
        "a real Embedder/BinaryEmbedder SPI")
    val (lo, hi, nd, n) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    require(lo == 0L && nd == hi + 1 && n == nd,
      s"stub embed stage requires a contiguous, duplicate-free vec_id " +
        s"keyspace [0, max]: got min=$lo max=$hi distinct=$nd rows=$n — " +
        "a hole would silently drop every survivor hashing onto it")
    hi + 1
  }
}
