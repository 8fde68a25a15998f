package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Features extracted from one opaque media blob. */
final case class MediaFeatures(doc_id: Long, byte_len: Int, width: Int,
                               height: Int, aspect_ratio: Double,
                               checksum: Long, format: String)

/** Multimodal column plumbing (SURVEY §2 item 41): media payloads ride as
  * opaque `binary` columns with typed metadata; decode/feature-extract runs
  * batched per partition via `mapPartitions` (the Scala analog of a Pandas
  * mapInPandas UDF — one iterator per partition, no per-row driver calls,
  * arbitrary native libs usable inside).
  *
  * The DECODE STEP IS A DETERMINISTIC STUB — this container has no image/
  * audio codecs. The Spark-side contract (schema, binary transport,
  * partition-batched execution, typed output Encoder) is real and tested;
  * swap `stubDecode` for a real codec call in production.
  */
object BinaryPipeline {

  /** Deterministic fake decode: derives "image" dimensions from metadata
    * and a byte checksum from the payload (stands in for pixel stats).
    */
  private def stubDecode(docId: Long, blob: Array[Byte], nChars: Long): MediaFeatures = {
    val width = (nChars % 640 + 1).toInt
    val height = (nChars % 480 + 1).toInt
    val checksum = blob.take(64).foldLeft(0L)((acc, b) => acc + (b & 0xff)) % 9973L
    MediaFeatures(docId, blob.length, width, height,
      width.toDouble / height, checksum, "fake/raw")
  }

  /** df must expose (idCol: long, blobCol: binary, metaCol: long). */
  def decodeFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                     blobCol: String, metaCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"),
        col(metaCol).cast("long"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions(_.map { case (id, blob, meta) => stubDecode(id, blob, meta) })
      .toDF()
  }

  /** Resize stage (STUB): a real implementation hands each batch to a
    * native imaging lib; the stub scales the fake dimensions and re-emits
    * the payload untouched. Runs per partition — same batch shape a codec
    * call would use.
    */
  def resize(spark: SparkSession, df: DataFrame, idCol: String,
             blobCol: String, targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        (id, blob, targetW, targetH, s"resized-${targetW}x$targetH")
      })
      .toDF(idCol, blobCol, "width", "height", "transform")
  }

  /** Frame-sampling stage (STUB): a real implementation decodes a video
    * container and emits one row per sampled frame; the stub slices the
    * payload into `frames` equal byte windows. One input row → N output
    * rows, preserving partition-batched execution (the iterator never
    * materializes the whole partition).
    */
  def frameSample(spark: SparkSession, df: DataFrame, idCol: String,
                  blobCol: String, frames: Int): DataFrame = {
    import spark.implicits._
    require(frames > 0, "frames must be positive")
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        val window = math.max(1, blob.length / frames)
        (0 until math.min(frames, blob.length)).iterator.map { f =>
          val start = f * window
          (id, f, blob.slice(start, math.min(start + window, blob.length)))
        }
      })
      .toDF(idCol, "frame_no", "frame_bytes")
  }
}
