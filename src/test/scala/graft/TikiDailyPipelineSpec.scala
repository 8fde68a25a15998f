package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipelines.TikiDailyPipeline

/** Drives the composed daily pipeline on raw JSON shaped exactly like the
  * reference crawler's output (TikiCrawler extractor fields).
  */
class TikiDailyPipelineSpec extends SparkSpec {

  private def writeRaw(dir: String, date: String, lines: String): Unit = {
    val day = s"$dir/snapshot_date=$date"
    new java.io.File(day).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$day/products.json"), lines)
  }

  test("day 1 + rerun + day 2: idempotent facts, merged dims, quality gate") {
    val root = Files.createTempDirectory("tiki_pipeline").toString
    val rawZone = s"$root/raw"
    val warehouse = s"$root/warehouse"

    writeRaw(rawZone, "2026-01-21",
      """{"product_id": 1, "sku": "S1", "name": "Phone X", "brand": "Apple", "price": "25.000.000 VND", "original_price": "27.000.000", "discount_rate": "-7%", "quantity_sold": "Đã bán 1.5k", "rating": 4.8, "review_count": 120, "seller": "Tiki Trading", "seller_id": 1, "thumbnail_url": "http://t/1.jpg", "product_url": "http://p/1", "badges": ["tiki_now"], "category_path": "1789 > 1795", "_category_url": "https://tiki.vn/dien-thoai/c1795", "_extracted_at": "2026-01-21T01:00:00.000Z"}
        |{"product_id": 1, "sku": "S1", "name": "Phone X", "brand": "Apple", "price": "24.500.000 VND", "original_price": "27.000.000", "discount_rate": "-9%", "quantity_sold": "Đã bán 1.6k", "rating": 4.8, "review_count": 125, "seller": "Tiki Trading", "seller_id": 1, "thumbnail_url": "http://t/1.jpg", "product_url": "http://p/1", "badges": ["tiki_now"], "category_path": "1789 > 1795", "_category_url": "https://tiki.vn/dien-thoai/c1795", "_extracted_at": "2026-01-21T09:00:00.000Z"}
        |{"product_id": 2, "sku": "S2", "name": "Cable", "brand": "NoName", "price": "120.000", "original_price": null, "discount_rate": null, "quantity_sold": "Đã bán 99", "rating": 4.1, "review_count": 7, "seller": "Shop A", "seller_id": 2, "thumbnail_url": "http://t/2.jpg", "product_url": "http://p/2", "badges": [], "category_path": "1789", "_category_url": "https://tiki.vn/phu-kien/c1789", "_extracted_at": "2026-01-21T02:00:00.000Z"}
        |{"product_id": 3, "sku": "S3", "name": "Broken", "brand": "X", "price": null, "original_price": null, "discount_rate": null, "quantity_sold": null, "rating": null, "review_count": null, "seller": "Shop B", "seller_id": 3, "thumbnail_url": null, "product_url": null, "badges": [], "category_path": null, "_category_url": "https://tiki.vn/x/c1", "_extracted_at": "2026-01-21T03:00:00.000Z"}""".stripMargin)

    val r1 = TikiDailyPipeline.run(spark, rawZone, warehouse, "2026-01-21")
    // product 1 deduped to latest snapshot; product 3 dropped (null price)
    assert(r1.factRows == 2)
    assert(r1.dimProductRows == 2)
    assert(r1.dimCategoryRows == 2) // 1795 (leaf of path) and 1789
    val fact = spark.read.parquet(s"$warehouse/fact_daily_snapshot")
    val p1 = fact.filter(col("product_id") === 1).head()
    assert(p1.getAs[Long]("current_price") == 24500000L, "latest snapshot wins")
    assert(p1.getAs[Long]("sales_volume_acc") == 1600L)
    assert(p1.getAs[Boolean]("tiki_now"))
    val quality = r1.quality.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(quality("invalid_price") == 0 && quality("null_product_id") == 0)

    // rerun the same day — byte-identical state, no duplicates
    val r1b = TikiDailyPipeline.run(spark, rawZone, warehouse, "2026-01-21")
    assert(r1b.factRows == 2 && r1b.dimProductRows == 2)
    assert(spark.read.parquet(s"$warehouse/fact_daily_snapshot").count() == 2)

    // day 2: product 1 price changes, product 4 appears
    writeRaw(rawZone, "2026-01-22",
      """{"product_id": 1, "sku": "S1", "name": "Phone X", "brand": "Apple", "price": "23.900.000 VND", "original_price": "27.000.000", "discount_rate": "-11%", "quantity_sold": "Đã bán 1.7k", "rating": 4.8, "review_count": 130, "seller": "Tiki Trading", "seller_id": 1, "thumbnail_url": "http://t/1.jpg", "product_url": "http://p/1", "badges": ["tiki_now"], "category_path": "1789 > 1795", "_category_url": "https://tiki.vn/dien-thoai/c1795", "_extracted_at": "2026-01-22T01:00:00.000Z"}
        |{"product_id": 4, "sku": "S4", "name": "Charger", "brand": "Anker", "price": "450.000", "original_price": "500.000", "discount_rate": "-10%", "quantity_sold": "Đã bán 2tr", "rating": 4.9, "review_count": 999, "seller": "Anker VN", "seller_id": 4, "thumbnail_url": "http://t/4.jpg", "product_url": "http://p/4", "badges": [], "category_path": "1789", "_category_url": "https://tiki.vn/phu-kien/c1789", "_extracted_at": "2026-01-22T01:30:00.000Z"}""".stripMargin)
    val r2 = TikiDailyPipeline.run(spark, rawZone, warehouse, "2026-01-22")
    assert(r2.factRows == 2)
    assert(r2.dimProductRows == 3, "dim MERGE: update product 1, insert 4, keep 2")
    val allFacts = spark.read.parquet(s"$warehouse/fact_daily_snapshot")
    assert(allFacts.count() == 4, "day 1 partition untouched by day 2 write")
    assert(allFacts.filter(col("product_id") === 4).head()
      .getAs[Long]("sales_volume_acc") == 2000000L)
  }
}
