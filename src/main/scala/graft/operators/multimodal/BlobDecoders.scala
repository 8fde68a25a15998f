package graft.operators.multimodal

/** SPI for environment-provided media decoders — the upgrade path for
  * containers the bare JVM cannot decode (mp4/webm/mp3/ogg …). Decoders
  * are discovered PER JVM via `java.util.ServiceLoader`
  * (`META-INF/services/graft.operators.multimodal.BlobDecoder` on the
  * classpath), the cluster-honest registration mechanism: a codec jar
  * rides the executor classpath exactly like an ImageIO plugin, so a
  * 1000-executor deployment picks it up on every JVM with zero
  * driver-side mutable state to ship. Rows whose container has no
  * registered decoder keep their honestly-labeled stub path and `source`
  * tag — the SPI adds capability, never hides its absence.
  */
trait BlobDecoder {

  /** The sniffed container this decoder upgrades (e.g. "video/mp4" —
    * must match a [[BinaryPipeline.sniff]] tag).
    */
  def format: String

  /** Feature-decode for [[BinaryPipeline.decodeFeatures]]; None = payload
    * unreadable by this decoder → the row falls back to the stub.
    */
  def features(docId: Long, blob: Array[Byte], nChars: Long): Option[MediaFeatures]

  /** Frame extraction for [[BinaryPipeline.frameSample]]: up to
    * `maxFrames` evenly spaced frames as
    * (doc_id, frame_no, src_frame, frame_bytes, source) rows. Default
    * None = this decoder does not handle frame containers.
    */
  def frames(docId: Long, blob: Array[Byte],
             maxFrames: Int): Option[Iterator[(Long, Int, Int, Array[Byte], String)]] =
    None
}

object BlobDecoders {

  /** Per-JVM decoder table, resolved once per executor from the
    * classpath. A decoder jar registering a format already sniffed is
    * consulted BEFORE the built-in ImageIO path, so an environment can
    * also override the default image handling if it ships something
    * better.
    */
  lazy val byFormat: Map[String, BlobDecoder] = {
    import scala.jdk.CollectionConverters._
    // thread-context loader first: when graft rides the executor SYSTEM
    // classpath and the codec jar arrives via --jars, only the task's
    // context (user) loader can see the jar's META-INF/services entry —
    // the defining loader is the parent and would resolve empty, silently
    // stubbing every row. Fall back to the defining loader for plain
    // embedding (no TCCL set).
    val loader = Option(Thread.currentThread().getContextClassLoader)
      .getOrElse(classOf[BlobDecoder].getClassLoader)
    java.util.ServiceLoader.load(classOf[BlobDecoder], loader)
      .iterator().asScala.map(d => d.format -> d).toMap
  }
}
