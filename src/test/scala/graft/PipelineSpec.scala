package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Melt, StarSchema, Upsert}
import graft.sources.TrendsCsv

/** End-to-end composition specs mirroring the reference DAGs. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("StarSchema.split: fact keeps grain, dims deduplicate with first/last stamps") {
    val snap = Seq(
      (1L, "2026-01-01", 100L, "Phone X", "Apple", 10L, "Electronics"),
      (1L, "2026-01-02", 110L, "Phone X", "Apple", 10L, "Electronics"),
      (2L, "2026-01-01", 50L, "Cable", "NoName", 20L, "Accessories"))
      .toDF("product_id", "snapshot_date", "current_price", "name", "brand_name",
        "category_id", "category_name")
    val out = StarSchema.split(snap,
      factCols = Seq("snapshot_date", "product_id", "current_price"),
      dimKey = "product_id", dimCols = Seq("name", "brand_name", "category_id"),
      catKey = "category_id", catCols = Seq("category_name"),
      updatedAtCol = "snapshot_date")
    assert(out.fact.count() == 3)
    val dim = out.dimProducts.orderBy("product_id").collect()
    assert(dim.length == 2)
    assert(dim(0).getAs[String]("created_at") == "2026-01-01")
    assert(dim(0).getAs[String]("updated_at") == "2026-01-02")
    assert(out.dimCategories.count() == 2)
    // missing column padded with null, like the reference
    val padded = StarSchema.split(snap.drop("brand_name"),
      factCols = Seq("snapshot_date", "product_id", "current_price"),
      dimKey = "product_id", dimCols = Seq("name", "brand_name", "category_id"),
      catKey = "category_id", catCols = Seq("category_name"),
      updatedAtCol = "snapshot_date")
    assert(padded.dimProducts.filter(col("brand_name").isNull).count() == 2)
  }

  test("StarSchema.split: attributes are the LATEST row's tuple, never a per-column max chimera") {
    // product 1 renamed Zebra->Apple and moved category 30->10 on day 2:
    // lexicographic max would keep ("Zebra", 30) — a stale mix; SCD1 keeps
    // the whole day-2 tuple. Null-keyed rows are dropped.
    val snap = Seq(
      (Some(1L), "2026-01-01", "Zebra Phone", "BrandA", 30L),
      (Some(1L), "2026-01-02", "Apple Phone", "BrandA", 10L),
      (Option.empty[Long], "2026-01-02", "Ghost", "BrandX", 99L))
      .toDF("product_id", "snapshot_date", "name", "brand_name", "category_id")
    val out = StarSchema.split(snap,
      factCols = Seq("snapshot_date", "product_id"),
      dimKey = "product_id", dimCols = Seq("name", "brand_name", "category_id"),
      catKey = "category_id", catCols = Seq("brand_name"),
      updatedAtCol = "snapshot_date")
    val dim = out.dimProducts.collect()
    assert(dim.length == 1, "null-key row dropped")
    val r = dim.head
    assert(r.getAs[String]("name") == "Apple Phone")
    assert(r.getAs[Long]("category_id") == 10L)
    assert(r.getAs[String]("created_at") == "2026-01-01")
    assert(r.getAs[String]("updated_at") == "2026-01-02")
  }

  test("Upsert.merge with composite key (date, keyword) like the trends staging MERGE") {
    val target = Seq(("2026-01-01", "iphone", 50L), ("2026-01-01", "samsung", 40L))
      .toDF("date", "keyword", "score")
    val staging = Seq(("2026-01-01", "iphone", 55L), ("2026-01-02", "iphone", 60L))
      .toDF("date", "keyword", "score")
    val merged = Upsert.merge(target, staging, keys = Seq("date", "keyword"))
    val out = merged.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2026-01-01", "iphone") -> 55L,   // updated from staging
      ("2026-01-01", "samsung") -> 40L,  // untouched
      ("2026-01-02", "iphone") -> 60L))  // inserted
  }

  test("trends DAG end-to-end: CSV -> melt -> clean -> aggregate -> merge") {
    val f = Files.createTempDirectory("trends_e2e").toString + "/raw.csv"
    Files.writeString(java.nio.file.Paths.get(f),
      """date,iphone,samsung,isPartial
        |2026-01-01,55,<1,False
        |2026-01-01,57,3,False
        |2026-01-02,60,12,True""".stripMargin)
    val wide = TrendsCsv.read(spark, f).withColumn("date", col("date").cast("string"))
    val long = Melt.wideToLong(wide, Seq("date", "isPartial"),
      Seq("iphone" -> "iphone", "samsung" -> "samsung"),
      varName = "keyword", valueName = "score_text", valueType = "string")
    val cleaned = long.withColumn("score",
        coalesce(regexp_replace(col("score_text"), "<1", "0").cast("long"), lit(0L)))
      .groupBy("date", "keyword")
      .agg(max("score").as("score"), max("isPartial").as("is_partial"))
    val target = Seq(("2026-01-01", "iphone", 50L, false))
      .toDF("date", "keyword", "score", "is_partial")
    val merged = Upsert.merge(target, cleaned, keys = Seq("date", "keyword"))
    val out = merged.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2026-01-01", "iphone") -> 57L,   // max of the two raw rows, upserted
      ("2026-01-01", "samsung") -> 3L,   // "<1" handled, max wins
      ("2026-01-02", "iphone") -> 60L,
      ("2026-01-02", "samsung") -> 12L))
  }
}
