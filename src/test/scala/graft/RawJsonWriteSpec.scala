package graft.sources.dsv2

import java.nio.file.Files

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Contracts of the DSv2 WRITE path beyond q164's round-trip gate: the
  * two-phase commit protocol (speculative twins, job abort), overwrite
  * vs append semantics, and the loud type/value guards. Lives in the
  * connector's package to drive the protocol objects directly.
  */
class RawJsonWriteSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.sources.dsv2.RawJsonSource"

  private def tmp() = Files.createTempDirectory("rawjson-write").toString + "/t"

  private val schema2 = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType)))

  private def readBack(path: String, sch: StructType = schema2) =
    spark.read.format(Fmt).schema(sch).option("path", path).load()

  test("round-trip: all four types, nulls, unicode and embedded newlines") {
    val path = tmp()
    val sch = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("d", DoubleType), StructField("b", BooleanType)))
    val df = Seq(
      (Option(1L), Option("plain"), Option(1.5), Option(true)),
      (Option(2L), Option("tiếng Việt 中文 \"quoted\"\nline2\ttab"), Option(-0.0), Option(false)),
      (Option(3L), Option.empty[String], Option.empty[Double], Option.empty[Boolean]),
      (Option.empty[Long], Option("null id"), Option(1e300), Option(true)))
      .toDF("id", "s", "d", "b")
    df.write.format(Fmt).mode("overwrite").option("path", path).save()
    val back = readBack(path, sch)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("overwrite truncates previous visible files; append adds") {
    val path = tmp()
    Seq((1L, "a")).toDF("id", "s").write.format(Fmt)
      .mode("overwrite").option("path", path).save()
    Seq((2L, "b")).toDF("id", "s").write.format(Fmt)
      .mode("append").option("path", path).save()
    assert(readBack(path).select("id").as[Long].collect().toSet == Set(1L, 2L))
    Seq((3L, "c")).toDF("id", "s").write.format(Fmt)
      .mode("overwrite").option("path", path).save()
    assert(readBack(path).select("id").as[Long].collect().toSet == Set(3L))
  }

  test("speculative twin: only the committed attempt's file is published") {
    val path = tmp()
    val bw = new RawJsonWriteBuilder(schema2, path, "specidspec")
      .build().toBatch
    val factory = bw.createBatchWriterFactory(null)
    // two attempts of partition 0 — e.g. a speculative duplicate
    val w1 = factory.createWriter(0, 101L)
    val w2 = factory.createWriter(0, 202L)
    w1.write(InternalRow(1L, UTF8String.fromString("committed")))
    w2.write(InternalRow(9L, UTF8String.fromString("speculative-loser")))
    val m1 = w1.commit()
    w2.abort()
    bw.commit(Array(m1))
    val rows = readBack(path).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "committed")),
      s"only the committed attempt may publish, got ${rows.toSeq}")
  }

  test("job abort leaves the target untouched and no staging residue") {
    val path = tmp()
    Seq((1L, "keep")).toDF("id", "s").write.format(Fmt)
      .mode("overwrite").option("path", path).save()
    val bw = new RawJsonWriteBuilder(schema2, path, "abortspec")
      .build().toBatch
    val factory = bw.createBatchWriterFactory(null)
    val w = factory.createWriter(0, 1L)
    w.write(InternalRow(2L, UTF8String.fromString("doomed")))
    w.commit()
    bw.abort(Array.empty)
    assert(readBack(path).select("id").as[Long].collect().toSeq == Seq(1L))
    val dir = new java.io.File(path)
    assert(!dir.listFiles().exists(_.getName.startsWith(".staging")),
      "staging residue after job abort")
  }

  test("unsupported column types and non-finite doubles fail loudly") {
    val path = tmp()
    val tsEx = intercept[Exception] {
      Seq((1L, new java.sql.Timestamp(0L))).toDF("id", "ts")
        .write.format(Fmt).mode("overwrite").option("path", path).save()
    }
    assert(tsEx.getMessage != null)
    val nanEx = intercept[Exception] {
      Seq((1L, Double.NaN)).toDF("id", "d")
        .write.format(Fmt).mode("overwrite").option("path", path).save()
    }
    assert(nanEx.getMessage != null)
    // a failed job must not have published anything
    assert(!new java.io.File(path).exists() ||
      readBack(path, StructType(Seq(StructField("id", LongType)))).count() == 0)
  }
}
