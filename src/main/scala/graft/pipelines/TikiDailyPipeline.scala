package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CleanFns
import graft.operators.{Dedup, QualityChecks, StarSchema, Upsert}
import graft.sources.{CleanZone, RawZone}

/** The reference's full daily product pipeline as ONE composed call —
  * everything transform_tiki.py + load_to_bq.py do per day:
  * raw crawler JSON → rename → parse/clean → dedup-latest → null gate →
  * star split → partitioned fact write (idempotent) → dim MERGE →
  * quality report.
  *
  * A user of the reference runs this instead of the Airflow tiki_dag; each
  * stage is the library operator the DAG task maps to (SURVEY §2 items
  * 1-12, 16-19, 25).
  */
object TikiDailyPipeline {

  final case class Result(factRows: Long, dimProductRows: Long,
                          dimCategoryRows: Long, quality: DataFrame)

  /** Cleans one day of raw crawler JSON into the star schema
    * (transform_tiki.py:411 transform_data).
    */
  def clean(raw: DataFrame): DataFrame = {
    val renamed = raw
      .withColumnRenamed("_extracted_at", "extracted_at")
      .withColumnRenamed("thumbnail_url", "image_url")
      .withColumnRenamed("seller", "seller_name")
      .withColumnRenamed("brand", "brand_name")
      .withColumnRenamed("quantity_sold", "sales_volume")
      .withColumnRenamed("rating", "rating_average")
    renamed
      .withColumn("snapshot_date", CleanFns.toSnapshotDate(col("extracted_at")))
      .withColumn("product_id", col("product_id").cast("long"))
      .withColumn("seller_id", col("seller_id").cast("long"))
      .withColumn("current_price", CleanFns.cleanPrice(col("price")))
      .withColumn("original_price", CleanFns.cleanPrice(col("original_price")))
      .withColumn("discount_rate", CleanFns.parseDiscountRate(col("discount_rate")))
      .withColumn("sales_volume_acc", CleanFns.parseSalesVolume(col("sales_volume")))
      .withColumn("rating_average", col("rating_average").cast("double"))
      .withColumn("review_count", col("review_count").cast("long"))
      .withColumn("category_id",
        coalesce(CleanFns.categoryLeaf(col("category_path")),
          CleanFns.extractCategoryId(col("_category_url"))))
      .withColumn("root_category_id", CleanFns.categoryRoot(col("category_path")))
      .withColumn("category_depth", CleanFns.categoryDepth(col("category_path")))
      .withColumn("category_name", CleanFns.extractUrlKey(col("_category_url")))
      .withColumn("inventory_status", CleanFns.inventoryStatus(col("current_price")))
      .withColumn("tiki_now", CleanFns.hasBadge(col("badges"), "tiki_now"))
      .withColumn("extracted_at", to_timestamp(col("extracted_at")))
  }

  def run(spark: SparkSession, rawZonePath: String, warehousePath: String,
          date: String): Result = {
    val rawAll = RawZone.read(spark, rawZonePath, date = Some(date))
    // the corrupt column only exists in the inferred schema if bad rows
    // were actually present
    val raw =
      if (rawAll.columns.contains("_corrupt_record"))
        rawAll.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
      else rawAll

    val cleaned = clean(raw)

    // dedup keep-most-recent per product (transform_tiki.py:582), then
    // critical-field gate (:595)
    val deduped = QualityChecks.dropNullKeys(
      Dedup.latestByKey(cleaned, Seq("product_id"),
        Seq(col("extracted_at").desc, col("sku").desc)),
      Seq("product_id", "current_price"))

    val split = StarSchema.split(deduped,
      factCols = Seq("snapshot_date", "product_id", "current_price",
        "original_price", "discount_rate", "sales_volume_acc", "review_count",
        "rating_average", "inventory_status", "tiki_now", "extracted_at"),
      dimKey = "product_id",
      dimCols = Seq("sku", "name", "brand_name", "image_url", "product_url",
        "seller_id", "seller_name", "category_id", "root_category_id",
        "category_depth"),
      catKey = "category_id",
      catCols = Seq("category_name", "root_category_id", "category_depth"),
      updatedAtCol = "extracted_at")

    // idempotent daily fact write (load_to_bq.py WRITE_TRUNCATE per
    // partition); dims MERGE into the running tables (load_to_bq.py:273)
    CleanZone.writePartitioned(split.fact, s"$warehousePath/fact_daily_snapshot",
      Seq("snapshot_date"))
    val dimPath = s"$warehousePath/dim_products"
    val mergedDims = mergeInto(spark, dimPath, split.dimProducts,
      keys = Seq("product_id"), preserveCols = Seq("created_at"))
    val catPath = s"$warehousePath/dim_categories"
    val mergedCats = mergeInto(spark, catPath, split.dimCategories,
      keys = Seq("category_id"), keepCols = Seq("category_name"))

    // quality gate (analytics_dag.py ASSERT block) over today's fact rows
    val quality = QualityChecks.report(split.fact, Seq(
      QualityChecks.Check("invalid_price",
        col("current_price").isNull || col("current_price") <= 0),
      QualityChecks.Check("null_product_id", col("product_id").isNull),
      QualityChecks.Check("null_snapshot_date", col("snapshot_date").isNull)))

    Result(split.fact.count(), mergedDims, mergedCats, quality)
  }

  /** MERGE `delta` into the parquet table at `path` (create if absent). */
  private def mergeInto(spark: SparkSession, path: String, delta: DataFrame,
                        keys: Seq[String], keepCols: Seq[String] = Nil,
                        preserveCols: Seq[String] = Nil): Long = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        Upsert.merge(spark.read.parquet(path), delta, keys, keepCols, preserveCols)
      else delta
    val staging = s"$path-staging"
    merged.write.mode("overwrite").parquet(staging)
    val target = new org.apache.hadoop.fs.Path(path)
    val backup = new org.apache.hadoop.fs.Path(s"$path-backup")
    if (fs.exists(target)) { fs.delete(backup, true); fs.rename(target, backup) }
    fs.rename(new org.apache.hadoop.fs.Path(staging), target)
    fs.delete(backup, true)
    spark.read.parquet(path).count()
  }
}
