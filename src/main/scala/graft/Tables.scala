package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata layout: one parquet file per table under
  * a scale-factor directory (see TESTDATA.md). Columns are pruned and filters
  * pushed down by Catalyst at the scan, so operators should select/filter as
  * early as possible and let the optimizer do the rest.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  /** events.parquet has shipped `ts` in three physical layouts across driver
    * testdata generations: parquet TIMESTAMP(NANOS) (readable only as a
    * nanosecond long via spark.sql.legacy.parquet.nanosAsLong), naive
    * timestamp[us] (read as TIMESTAMP_NTZ), and proper TIMESTAMP. Normalize
    * all three to session-zoned TimestampType here so downstream timestamp
    * arithmetic (unix_micros, casts to double) is layout-independent. The
    * session timezone is pinned UTC (GraftSession), so the NTZ cast is
    * value-preserving; the nanos path uses integer division (a double
    * division would lose precision above 2^53 ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    // runtime-settable: callers' sessions (e.g. the driver's smoke check)
    // may not have configured this at build time
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        // the NTZ→TIMESTAMP cast re-interprets the naive value in the
        // SESSION timezone — value-preserving only under UTC. Fail loudly
        // rather than silently shifting event times (and rather than
        // mutating the caller's session out from under them); GraftSession
        // and SparkEntry.entry both pin UTC, so every shipped entry point
        // satisfies this.
        graft.operators.TimeCols.requireUtc(spark)
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
