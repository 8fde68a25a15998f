package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (hash-clustered, pre-sorted) table layout for co-located joins
  * (reference bigquery_schema.sql CLUSTER BY product_id/brand_name — the
  * BigQuery analog of Spark bucketing).
  *
  * Two tables bucketed on their join key with the same bucket count join
  * WITHOUT any shuffle: at 100 TB the shuffle of a fact-fact join is
  * usually the single largest cost in the pipeline, and bucketing moves it
  * to write time where it is paid once.
  */
object Bucketed {

  def write(df: DataFrame, table: String, path: String, key: String,
            buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.format("parquet").mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
