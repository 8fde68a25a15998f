package graft.sources.dsv2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, IsNotNull, LessThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 connector for the raw-zone JSONL layout — the deepest
  * extension tier after custom Expressions ([[graft.plans.DotProduct]]):
  * a full `TableProvider` whose scan PUSHES filters and column pruning
  * INTO the source, so predicates run per line during the read and only
  * the required fields are ever materialized. On the reference's raw
  * zone (crawler JSON at warehouse scale) that is the difference between
  * parsing every field of every snapshot and touching only the lines and
  * fields a query needs.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.dsv2.RawJsonSource")
  *     .schema(schema).option("path", dir).load()
  * }}}
  *
  * Scale shape: one InputPartition per file (the raw zone is written in
  * crawl-chunk files, the natural parallel unit); pushed filters are
  * re-reported through `Scan.description`, so `.explain` shows exactly
  * what reached the source. Supported pushdown: IsNotNull / EqualTo /
  * GreaterThan / LessThan on top-level string, long, double and boolean
  * fields — everything else stays residual in Spark (correctness never
  * depends on the source honoring a filter; Spark re-applies residuals).
  * Corrupt lines are skipped at the source (the permissive contract of
  * [[graft.sources.RawZone]]).
  */
class RawJsonSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft raw-json requires an explicit schema (inference would cost a full scan)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("option 'path' is required"))
    new RawJsonTable(schema, path)
  }
}

private[dsv2] class RawJsonTable(schema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-raw-json($path)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RawJsonScanBuilder(schema, path)
}

private[dsv2] class RawJsonScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  private def pushable(f: Filter): Boolean = f match {
    case IsNotNull(a)      => fullSchema.fieldNames.contains(a)
    case EqualTo(a, _)     => fullSchema.fieldNames.contains(a)
    case GreaterThan(a, _) => fullSchema.fieldNames.contains(a)
    case LessThan(a, _)    => fullSchema.fieldNames.contains(a)
    case _                 => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(pushable)
    // everything returned here is evaluated AGAIN by Spark — pushed
    // filters are a scan reduction, never the correctness boundary
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new RawJsonScan(path, required, pushed)
}

private[dsv2] class RawJsonScan(path: String, required: StructType,
                                pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-raw-json PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // hidden-name filter applies to DIRECTORIES too: _temporary attempt
    // files and _spark_metadata logs under a crashed/streaming writer's
    // output are valid JSON lines that are NOT data (the built-in reader
    // excludes them; emitting them would mean duplicate/phantom rows)
    def files(dir: Path): Seq[Path] =
      fs.listStatus(dir).toSeq.flatMap { s =>
        val name = s.getPath.getName
        if (name.startsWith("_") || name.startsWith(".")) Nil
        else if (s.isDirectory) files(s.getPath)
        else Seq(s.getPath)
      }
    files(p).map(f => RawJsonInputPartition(f.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    new RawJsonReaderFactory(required, pushed, conf)
  }
}

private[dsv2] case class RawJsonInputPartition(file: String) extends InputPartition

private[dsv2] class RawJsonReaderFactory(required: StructType,
    pushed: Array[Filter], conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RawJsonPartitionReader(
      partition.asInstanceOf[RawJsonInputPartition].file, required, pushed, conf)
}

private[dsv2] class RawJsonPartitionReader(file: String, required: StructType,
    pushed: Array[Filter], conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val in = {
    val p = new Path(file)
    new java.io.BufferedReader(new java.io.InputStreamReader(
      p.getFileSystem(conf.value).open(p), java.nio.charset.StandardCharsets.UTF_8))
  }
  private var row: InternalRow = _

  private def fieldValue(node: JsonNode, name: String, dt: DataType): Any = {
    val f = node.get(name)
    if (f == null || f.isNull) null
    else dt match {
      case LongType    => if (f.isIntegralNumber) f.asLong() else null
      case DoubleType  => if (f.isNumber) f.asDouble() else null
      case BooleanType => if (f.isBoolean) f.asBoolean() else null
      case StringType  =>
        UTF8String.fromString(if (f.isTextual) f.asText() else f.toString)
      case _ => null // unsupported types read as null (documented surface)
    }
  }

  /** Evaluate one pushed filter against the raw node (source-side skip).
    * A comparison we cannot do EXACTLY (null field, type surprise,
    * integral beyond long) conservatively PASSES — Spark's residual
    * filter is the correctness boundary and will re-drop; a false drop
    * here would be a silently missing row nothing can resurrect.
    */
  private def passes(node: JsonNode, f: Filter): Boolean = f match {
    case IsNotNull(a) => { val v = node.get(a); v != null && !v.isNull }
    case EqualTo(a, v) => compare(node.get(a), v).forall(_ == 0)
    case GreaterThan(a, v) => compare(node.get(a), v).forall(_ > 0)
    case LessThan(a, v) => compare(node.get(a), v).forall(_ < 0)
    case _ => true
  }

  private def compare(f: JsonNode, v: Any): Option[Int] = {
    if (f == null || f.isNull) return None // residual drops null comparisons
    v match {
      // UTF8String order, NOT Java String compareTo: Spark compares UTF-8
      // bytes, and UTF-16 surrogate pairs sort differently (e.g. U+1F600
      // vs U+E000) — a source disagreeing with the engine's order would
      // falsely drop rows
      case s: String if f.isTextual =>
        Some(UTF8String.fromString(f.asText()).compareTo(UTF8String.fromString(s)))
      // exact integral compare where both sides are longs: a double
      // round-trip collapses values above 2^53
      case n @ (_: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
                _: java.lang.Byte) if f.isIntegralNumber && f.canConvertToLong =>
        Some(java.lang.Long.compare(f.asLong(), n.asInstanceOf[Number].longValue()))
      case n: Number if f.isNumber && !n.isInstanceOf[java.lang.Long] &&
          !n.isInstanceOf[java.lang.Integer] =>
        Some(java.lang.Double.compare(f.asDouble(), n.doubleValue()))
      case b: java.lang.Boolean if f.isBoolean =>
        Some(java.lang.Boolean.compare(f.asBoolean(), b))
      case _ => None
    }
  }

  override def next(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      val node =
        try mapper.readTree(line)
        catch { case _: Exception => null } // corrupt line: skip at source
      if (node != null && node.isObject && pushed.forall(passes(node, _))) {
        row = InternalRow.fromSeq(
          required.fields.toSeq.map(f => fieldValue(node, f.name, f.dataType)))
        return true
      }
      line = in.readLine()
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
