package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{CleanZone, RawZone, TrendsCsv}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("RawZone reads date-partitioned JSON and quarantines corrupt records") {
    val dir = Files.createTempDirectory("rawzone").toString
    val day = s"$dir/snapshot_date=2026-01-21"
    new java.io.File(day).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$day/part1.json"),
      """{"product_id": 1, "price": "1.000.000 VND"}
        |{"product_id": 2, "price": "250.000"}
        |{bad json line}""".stripMargin)
    val df = RawZone.read(spark, dir, date = Some("2026-01-21")).cache()
    assert(df.filter(col("product_id").isNotNull).count() == 2)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
  }

  test("CleanZone dynamic partition overwrite replaces only touched days") {
    val path = Files.createTempDirectory("cleanzone").toString + "/fact"
    val day1 = Seq((1L, "2026-01-01", 10.0), (2L, "2026-01-01", 20.0))
      .toDF("id", "snapshot_date", "price")
    val day2 = Seq((3L, "2026-01-02", 30.0)).toDF("id", "snapshot_date", "price")
    CleanZone.writePartitioned(day1, path, Seq("snapshot_date"))
    CleanZone.writePartitioned(day2, path, Seq("snapshot_date"))
    // re-run day1 with corrected data: day2 must survive
    val day1Fixed = Seq((1L, "2026-01-01", 11.0)).toDF("id", "snapshot_date", "price")
    CleanZone.writePartitioned(day1Fixed, path, Seq("snapshot_date"))
    val out = CleanZone.read(spark, path)
    assert(out.count() == 2)
    assert(out.filter(col("snapshot_date") === "2026-01-02").count() == 1)
    assert(out.filter(col("price") === 11.0).count() == 1)
  }

  test("CleanZone isolated write: concurrent two-day writers don't clobber") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val path = Files.createTempDirectory("cleanzone-iso").toString + "/fact"
    val day1 = Seq((1L, "2026-01-01", 10.0), (2L, "2026-01-01", 20.0))
      .toDF("id", "snapshot_date", "price")
    val day2 = Seq((3L, "2026-01-02", 30.0)).toDF("id", "snapshot_date", "price")
    // two genuinely concurrent jobs against the same table root — the
    // reference gets this safety from BigQuery's $day decorator atomicity
    val writes = Seq(day1, day2).map(df => Future(
      CleanZone.writePartitionedIsolated(df, path, Seq("snapshot_date"))))
    Await.result(Future.sequence(writes), 120.seconds)
    val out = CleanZone.read(spark, path)
    assert(out.count() == 3)
    assert(out.filter(col("snapshot_date") === "2026-01-01").count() == 2)
    assert(out.filter(col("snapshot_date") === "2026-01-02").count() == 1)
    // re-run day1 with corrected data: only day1 is replaced
    val day1Fixed = Seq((1L, "2026-01-01", 11.0)).toDF("id", "snapshot_date", "price")
    CleanZone.writePartitionedIsolated(day1Fixed, path, Seq("snapshot_date"))
    val after = CleanZone.read(spark, path)
    assert(after.count() == 2)
    assert(after.filter(col("price") === 11.0).count() == 1)
    assert(after.filter(col("snapshot_date") === "2026-01-02").count() == 1)
  }

  test("readWithQuarantine routes corrupt lines to an auditable text dir") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val dir = Files.createTempDirectory("rawq").toString
    val day = s"$dir/snapshot_date=2026-02-01"
    new java.io.File(day).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$day/part1.json"),
      """{"product_id": 1, "price": "88"}
        |{totally broken
        |{"product_id": 2, "price": "99"}""".stripMargin)
    val q = s"$dir-quarantine"
    val schema = new StructType().add("product_id", LongType).add("price", StringType)
    val clean = RawZone.readWithQuarantine(spark, dir, schema, q,
      date = Some("2026-02-01"))
    assert(clean.count() == 2 && !clean.columns.contains("_corrupt_record"))
    val quarantined = spark.read.text(q).collect().map(_.getString(0))
    assert(quarantined.toSeq == Seq("{totally broken"),
      "the ORIGINAL bad line, verbatim")
    // REPLAY idempotency: re-running the same day overwrites its
    // quarantine slot instead of appending duplicate audit lines
    RawZone.readWithQuarantine(spark, dir, schema, q,
      date = Some("2026-02-01")).count()
    val replayed = spark.read.text(q).collect().map(_.getString(0))
    assert(replayed.toSeq == Seq("{totally broken"),
      "replaying a day must not duplicate quarantined lines")
  }

  test("readMerged unions drifted partition schemas; absent columns read null") {
    val dir = Files.createTempDirectory("drift").toString
    Seq((1L, 10.0)).toDF("id", "price")
      .write.parquet(s"$dir/snapshot_date=2026-01-01")
    Seq((2L, 20.0, "tiki_now")).toDF("id", "price", "badge") // field gained
      .write.parquet(s"$dir/snapshot_date=2026-01-02")
    val merged = CleanZone.readMerged(spark, dir)
    assert(merged.columns.contains("badge"))
    assert(merged.filter(col("badge").isNull).count() == 1)
    assert(merged.filter(col("badge") === "tiki_now").count() == 1)
  }

  test("ORC format round-trips through the partitioned writer") {
    val dir = Files.createTempDirectory("orczone").toString + "/t"
    val df = Seq((1L, "2026-01-01", 5.0), (2L, "2026-01-02", 6.0))
      .toDF("id", "snapshot_date", "price")
    CleanZone.writePartitioned(df, dir, Seq("snapshot_date"), format = "orc")
    val back = CleanZone.readFormat(spark, dir, "orc")
    assert(back.count() == 2)
    assert(back.select(sum(col("price"))).head().getDouble(0) == 11.0)
  }

  test("Compaction rewrites many small files into few; content identical; idempotent") {
    import graft.sources.Compaction
    val dir = Files.createTempDirectory("compact").toString + "/part"
    val df = (1L to 1000L).toDF("id")
    df.repartition(20).write.parquet(dir) // 20 tiny files
    def nFiles = new java.io.File(dir).listFiles
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(nFiles == 20)
    val written = Compaction.compactDir(spark, dir, targetBytes = 1L << 20)
    assert(written == 1, s"1 MiB target over ~KB of data -> one file, got $written")
    assert(nFiles == 1)
    // content exactly preserved
    assert(spark.read.parquet(dir).collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 1000L))
    // re-run is a no-op (already compacted)
    assert(Compaction.compactDir(spark, dir, targetBytes = 1L << 20) == 0)
  }

  test("Compaction preserves drifted schemas (mergeSchema read, no column loss)") {
    import graft.sources.Compaction
    val dir = Files.createTempDirectory("compactdrift").toString + "/part"
    Seq((1L, 10.0)).toDF("id", "price").repartition(2).write.parquet(dir)
    Seq((2L, 20.0, "tiki_now")).toDF("id", "price", "badge")
      .repartition(2).write.mode("append").parquet(dir)
    assert(Compaction.compactDir(spark, dir, targetBytes = 1L << 20) == 1)
    val back = CleanZone.readMerged(spark, dir)
    assert(back.columns.contains("badge"), "drifted column must survive compaction")
    assert(back.filter(col("badge") === "tiki_now").count() == 1)
    assert(back.count() == 2)
    // no stray sibling dirs visible to partition discovery
    val parent = new java.io.File(dir).getParentFile
    assert(parent.listFiles.map(_.getName).forall(n =>
      n == "part" || n.startsWith(".")), parent.listFiles.map(_.getName).toSeq)
  }

  test("TrendsCsv reads the wide format ready for melting") {
    val f = Files.createTempDirectory("trends").toString + "/trends.csv"
    Files.writeString(java.nio.file.Paths.get(f),
      """date,iphone,samsung,isPartial
        |2026-01-01,55,<1,False
        |2026-01-02,60,12,True""".stripMargin)
    val df = TrendsCsv.read(spark, f)
    assert(df.columns.toSeq == Seq("date", "iphone", "samsung", "isPartial"))
    assert(df.count() == 2)
    val melted = graft.operators.Melt.wideToLong(df.withColumn("date", col("date").cast("string")),
      Seq("date", "isPartial"), Seq("iphone" -> "iphone", "samsung" -> "samsung"),
      varName = "keyword", valueName = "score", valueType = "string")
    assert(melted.count() == 4)
    assert(melted.filter(col("score") === "<1").count() == 1)
  }

  test("Upsert.mergePruned rewrites only touched partitions; others stay byte-identical") {
    import graft.operators.Upsert
    val base = Files.createTempDirectory("prunedmerge").toString + "/t"
    Seq((1L, "2026-01-01", 10.0), (2L, "2026-01-01", 20.0),
        (3L, "2026-01-02", 30.0), (4L, "2026-01-03", 40.0),
        // key 3 also exists in an UNTOUCHED partition — must not merge
        (3L, "2026-01-01", 99.0))
      .toDF("k", "day", "v")
      .write.partitionBy("day").parquet(base)

    def files(day: String): Map[String, (Long, Array[Byte])] = {
      val d = new java.io.File(s"$base/day=$day")
      d.listFiles.filter(_.getName.endsWith(".parquet")).map { f =>
        f.getName -> (f.length, Files.readAllBytes(f.toPath))
      }.toMap
    }
    val before01 = files("2026-01-01")
    val before03 = files("2026-01-03")

    val delta = Seq((3L, "2026-01-02", 31.0), (5L, "2026-01-02", 50.0))
      .toDF("k", "day", "v")
    val touched = Upsert.mergePruned(base, delta, Seq("k"), "day")
    assert(touched == Seq("2026-01-02"))

    // untouched partitions: same file names, same bytes
    val after01 = files("2026-01-01")
    val after03 = files("2026-01-03")
    assert(after01.keySet == before01.keySet && after03.keySet == before03.keySet)
    assert(after01.forall { case (n, (len, bytes)) =>
      before01(n)._1 == len && java.util.Arrays.equals(before01(n)._2, bytes) })
    assert(after03.forall { case (n, (len, bytes)) =>
      before03(n)._1 == len && java.util.Arrays.equals(before03(n)._2, bytes) })

    // merged content: update applied, insert landed, cross-partition key 3
    // rows in day 01 untouched
    val back = spark.read.parquet(base)
    assert(back.filter(col("day") === "2026-01-02").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((3L, 31.0), (5L, 50.0)))
    assert(back.filter(col("k") === 3 && col("day") === "2026-01-01")
      .head().getDouble(1) == 99.0)
    assert(back.count() == 6)
  }
}
