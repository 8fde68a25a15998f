package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.pipelines.Backfill
import graft.pipelines.Backfill.{AlreadyComplete, DaySources, Failed, Succeeded, UpstreamFailed}
import graft.sources.EmptySourceException

/** Backfill driver semantics (VERDICT r3 next-round #1 and #2): date-range
  * catchup over the four DAGs, per-task retries and markers, resume after a
  * mid-range failure converging to the clean single-pass warehouse, and the
  * pre-load empty-source guard.
  */
class BackfillSpec extends SparkSpec {
  import spark.implicits._

  private val dates = Seq("2026-01-21", "2026-01-22", "2026-01-23")

  private def writeRawDay(rawZone: String, date: String): Unit = {
    val day = s"$rawZone/snapshot_date=$date"
    new java.io.File(day).mkdirs()
    val px = 25 + dates.indexOf(date) // date-varying price so days differ
    Files.writeString(Paths.get(s"$day/p.json"),
      s"""{"product_id": 1, "sku": "S1", "name": "Phone X", "brand": "Apple", "price": "$px.000.000", "original_price": "27.000.000", "discount_rate": "-7%", "quantity_sold": "Đã bán 1.5k", "rating": 4.8, "review_count": 120, "seller": "Tiki", "seller_id": 1, "thumbnail_url": "t", "product_url": "p", "badges": ["tiki_now"], "category_path": "1789 > 1795", "_category_url": "https://tiki.vn/dien-thoai/c1795", "_extracted_at": "${date}T01:00:00.000Z"}
         |{"product_id": 2, "sku": "S2", "name": "Cable", "brand": "N", "price": "120.000", "original_price": null, "discount_rate": null, "quantity_sold": "Đã bán 99", "rating": 4.1, "review_count": 7, "seller": "A", "seller_id": 2, "thumbnail_url": "t", "product_url": "p", "badges": [], "category_path": "1789", "_category_url": "https://tiki.vn/phu-kien/c1789", "_extracted_at": "${date}T02:00:00.000Z"}""".stripMargin)
  }

  private def writeTrendsCsv(root: String, date: String): String = {
    val csv = s"$root/trends_$date.csv"
    val score = 70 + dates.indexOf(date)
    Files.writeString(Paths.get(csv),
      s"""date,dien thoai,isPartial
         |$date,$score,False""".stripMargin)
    csv
  }

  private def keywordMap =
    Seq((1L, 1795L, "dien-thoai", "dien thoai", true))
      .toDF("mapping_id", "tiki_category_id", "tiki_category_name",
        "trend_keyword", "is_active")

  private def mkFixture(): (String, String, String => DaySources) = {
    val root = Files.createTempDirectory("backfill").toString
    val rawZone = s"$root/raw"
    dates.foreach(writeRawDay(rawZone, _))
    val csvs = dates.map(d => d -> writeTrendsCsv(root, d)).toMap
    val sources = (d: String) => DaySources(
      trendsCsv = Some(csvs(d)),
      // day 2's fx fetch "failed" → fallback arm, same on every pass
      fxRate = if (d == dates(1)) None else Some(25432.5 + dates.indexOf(d)))
    (root, rawZone, sources)
  }

  private val tables = Seq("fact_daily_snapshot", "dim_products",
    "dim_categories", "fact_google_trends", "dim_exchange_rate",
    "analytics_product_market_daily")

  private def tableDump(wh: String, name: String): Seq[String] = {
    val df = spark.read.parquet(s"$wh/$name")
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
  }

  test("clean 3-day backfill runs 4 tasks per day green, oldest first") {
    val (_, rawZone, sources) = mkFixture()
    val wh = Files.createTempDirectory("bf_clean").toString + "/wh"
    val report = Backfill.run(spark,
      Backfill.Config(rawZone, wh, keywordMap, sources), dates)
    assert(report.ok, s"failures: ${report.failures}")
    assert(report.runs.size === 12)
    assert(report.runs.forall(_.status == Succeeded))
    assert(report.runs.map(_.date) === dates.flatMap(d => Seq.fill(4)(d)),
      "execution dates must run oldest-first, tasks grouped per day")
    // three days of facts and mart landed
    assert(spark.read.parquet(s"$wh/fact_daily_snapshot")
      .select("snapshot_date").distinct().count() === 3)
    assert(spark.read.parquet(s"$wh/analytics_product_market_daily")
      .select("date").distinct().count() === 3)
  }

  test("day-2 failure: later dates still run; resume converges to the clean single pass") {
    val (_, rawZone, sources) = mkFixture()

    // reference warehouse: one clean pass over the full range
    val whClean = Files.createTempDirectory("bf_ref").toString + "/wh"
    assert(Backfill.run(spark,
      Backfill.Config(rawZone, whClean, keywordMap, sources), dates).ok)

    // broken pass: day 2's trends CSV path does not exist → trends fails
    // after retries, analytics is skipped as upstream-failed; days 1 and 3
    // run to completion (depends_on_past=False)
    val wh = Files.createTempDirectory("bf_resume").toString + "/wh"
    val broken = (d: String) =>
      if (d == dates(1)) sources(d).copy(trendsCsv = Some("/nonexistent/t.csv"))
      else sources(d)
    val r1 = Backfill.run(spark,
      Backfill.Config(rawZone, wh, keywordMap, broken, retries = 1), dates)
    val byKey = r1.runs.map(t => (t.date, t.task) -> t).toMap
    assert(byKey((dates(1), "trends")).status.isInstanceOf[Failed])
    assert(byKey((dates(1), "trends")).attempts === 2, "1 retry = 2 attempts")
    assert(byKey((dates(1), "analytics")).status === UpstreamFailed)
    assert(byKey((dates(1), "tiki")).status === Succeeded)
    assert(byKey((dates(1), "fx")).status === Succeeded)
    for (d <- Seq(dates(0), dates(2)); t <- Seq("tiki", "trends", "fx", "analytics"))
      assert(byKey((d, t)).status === Succeeded, s"$d/$t")

    // resume with the fixed source: completed tasks skip via markers, only
    // day-2 trends + analytics actually run
    val r2 = Backfill.run(spark,
      Backfill.Config(rawZone, wh, keywordMap, sources), dates)
    assert(r2.ok, s"resume failures: ${r2.failures}")
    val rerun = r2.runs.filter(_.status == Succeeded)
    assert(rerun.map(t => (t.date, t.task)).toSet ===
      Set((dates(1), "trends"), (dates(1), "analytics")))
    assert(r2.runs.count(_.status == AlreadyComplete) === 10)

    // the resumed warehouse is table-for-table identical to the clean pass
    for (t <- tables)
      assert(tableDump(wh, t) === tableDump(whClean, t), s"table $t diverged")
  }

  test("re-running a fully complete range is a no-op: all markers hit, warehouse unchanged") {
    val (_, rawZone, sources) = mkFixture()
    val wh = Files.createTempDirectory("bf_idem").toString + "/wh"
    val cfg = Backfill.Config(rawZone, wh, keywordMap, sources)
    assert(Backfill.run(spark, cfg, dates).ok)
    val before = tables.map(t => t -> tableDump(wh, t)).toMap
    val rerun = Backfill.run(spark, cfg, dates)
    assert(rerun.ok)
    assert(rerun.runs.forall(_.status == AlreadyComplete),
      s"every task must skip via marker, got ${rerun.runs.map(_.status).distinct}")
    for (t <- tables)
      assert(tableDump(wh, t) === before(t), s"table $t changed on no-op rerun")
  }

  test("empty raw day refuses the overwrite and leaves prior partitions intact") {
    val (_, rawZone, sources) = mkFixture()
    val wh = Files.createTempDirectory("bf_guard").toString + "/wh"
    assert(Backfill.run(spark,
      Backfill.Config(rawZone, wh, keywordMap, sources), Seq(dates(0))).ok)
    val day1Fact = tableDump(wh, "fact_daily_snapshot")
    assert(day1Fact.nonEmpty)

    // an empty raw dir for day 2 (upstream crawler produced nothing)
    val emptyDay = s"$rawZone/snapshot_date=${dates(1)}"
    org.apache.commons.io.FileUtils.cleanDirectory(new java.io.File(emptyDay))
    intercept[EmptySourceException] {
      graft.pipelines.TikiDailyPipeline.run(spark, rawZone, wh, dates(1))
    }
    val r = Backfill.run(spark,
      Backfill.Config(rawZone, wh, keywordMap, sources, retries = 0), Seq(dates(1)))
    val tiki = r.runs.find(t => t.task == "tiki").get
    assert(tiki.status match {
      case Failed(e) => e.isInstanceOf[EmptySourceException]
      case _ => false
    }, s"expected EmptySourceException failure, got ${tiki.status}")
    // yesterday's fact partition untouched
    assert(tableDump(wh, "fact_daily_snapshot") === day1Fact)
  }

  test("dateRange is inclusive, ordered, and rejects inverted ranges") {
    assert(Backfill.dateRange("2026-01-30", "2026-02-02") ===
      Seq("2026-01-30", "2026-01-31", "2026-02-01", "2026-02-02"))
    assert(Backfill.dateRange("2026-01-21", "2026-01-21") === Seq("2026-01-21"))
    intercept[IllegalArgumentException] {
      Backfill.dateRange("2026-01-22", "2026-01-21")
    }
  }
}
