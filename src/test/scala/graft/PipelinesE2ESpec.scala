package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipelines.{AnalyticsPipeline, FxPipeline, TikiDailyPipeline, TrendsPipeline}

/** All four reference DAGs composed end-to-end into the mart:
  * tiki products + google trends + fx rates → golden-join analytics table.
  */
class PipelinesE2ESpec extends SparkSpec {
  import spark.implicits._

  test("four-DAG flow builds the analytics mart with all trend-signal arms") {
    val root = Files.createTempDirectory("four_dags").toString
    val rawZone = s"$root/raw"
    val wh = s"$root/warehouse"
    val date = "2026-01-21"

    // DAG 1: tiki daily products
    val day = s"$rawZone/snapshot_date=$date"
    new java.io.File(day).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$day/p.json"),
      """{"product_id": 1, "sku": "S1", "name": "Phone X", "brand": "Apple", "price": "25.000.000", "original_price": "27.000.000", "discount_rate": "-7%", "quantity_sold": "Đã bán 1.5k", "rating": 4.8, "review_count": 120, "seller": "Tiki", "seller_id": 1, "thumbnail_url": "t", "product_url": "p", "badges": ["tiki_now"], "category_path": "1789 > 1795", "_category_url": "https://tiki.vn/dien-thoai/c1795", "_extracted_at": "2026-01-21T01:00:00.000Z"}
        |{"product_id": 2, "sku": "S2", "name": "Cable", "brand": "N", "price": "120.000", "original_price": null, "discount_rate": null, "quantity_sold": "Đã bán 99", "rating": 4.1, "review_count": 7, "seller": "A", "seller_id": 2, "thumbnail_url": "t", "product_url": "p", "badges": [], "category_path": "1789", "_category_url": "https://tiki.vn/phu-kien/c1789", "_extracted_at": "2026-01-21T02:00:00.000Z"}""".stripMargin)
    TikiDailyPipeline.run(spark, rawZone, wh, date)

    // DAG 2: google trends (keyword dien-thoai has data for the date)
    val csv = s"$root/trends.csv"
    Files.writeString(java.nio.file.Paths.get(csv),
      s"""date,dien thoai,isPartial
         |$date,77,False
         |2026-01-20,70,False""".stripMargin)
    assert(TrendsPipeline.run(spark, csv, s"$wh/fact_google_trends") == 2)

    // DAG 3: fx rate (real fetch for the date)
    assert(FxPipeline.run(spark, Some(25432.5), date, s"$wh/dim_exchange_rate") == 1)

    // DAG 4: analytics golden join; category 1795 mapped, 1789 unmapped
    val keywordMap = Seq((1L, 1795L, "dien-thoai", "dien thoai", true))
      .toDF("mapping_id", "tiki_category_id", "tiki_category_name",
        "trend_keyword", "is_active")
    val (rows, quality) = AnalyticsPipeline.run(spark, wh, date, keywordMap)
    assert(rows == 2)

    val mart = spark.read.parquet(s"$wh/analytics_product_market_daily")
    val byId = mart.collect().map(r => r.getAs[String]("product_id") -> r).toMap
    assert(byId("1").getAs[String]("trend_signal_status") == "Full Data")
    assert(byId("1").getAs[Long]("google_trend_score") == 77L)
    assert(byId("1").getAs[Double]("fx_rate") == 25432.5)
    // 25_000_000 / 25432.5 = 982.99 USD (exact integer cent rounding)
    assert(byId("1").getAs[Double]("price_usd_real") == 982.99)
    assert(byId("2").getAs[String]("trend_signal_status") == "Unmapped")
    assert(quality.filter(col("passed") === false).count() == 0)
  }
}
