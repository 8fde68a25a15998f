package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** Timestamp-layout polymorphism for operators that do raw timestamp
  * arithmetic. Parquet sources can surface event times as TIMESTAMP or as
  * TIMESTAMP_NTZ (naive `timestamp[us]` files), and Spark's `unix_micros` /
  * numeric casts accept only the former. Under graft's pinned-UTC session
  * ([[graft.GraftSession]]) the NTZ→TIMESTAMP cast is value-preserving, so
  * operators route their internal arithmetic through these helpers instead
  * of constraining callers' schemas. Output columns keep the caller's
  * original type — only the internal math normalizes.
  */
object TimeCols {

  /** Exact microseconds-since-epoch for a TIMESTAMP or TIMESTAMP_NTZ column. */
  def micros(df: DataFrame, tsCol: String): Column = {
    if (df.schema(tsCol).dataType == TimestampNTZType)
      requireUtc(df.sparkSession)
    microsOf(col(tsCol), df.schema(tsCol).dataType)
  }

  /** The NTZ→TIMESTAMP cast in [[microsOf]]/[[secondsOf]] re-interprets the
    * naive value in the session timezone — value-preserving only under UTC.
    * Operators with a session at hand call this before casting an NTZ
    * column so a non-UTC session fails loudly instead of silently shifting
    * event times.
    */
  def requireUtc(spark: org.apache.spark.sql.SparkSession): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone",
      java.util.TimeZone.getDefault.getID)
    // accept every zero-offset spelling (UTC, Etc/UTC, GMT, +00:00, Z):
    // all are value-preserving; rejecting them would fail correct configs
    val normalized = scala.util.Try(java.time.ZoneId.of(tz).normalized())
    require(normalized.toOption.contains(java.time.ZoneOffset.UTC),
      s"TIMESTAMP_NTZ arithmetic requires spark.sql.session.timeZone=UTC, got $tz")
  }

  def microsOf(c: Column, dt: DataType): Column = dt match {
    case TimestampNTZType => unix_micros(c.cast(TimestampType))
    case _                => unix_micros(c)
  }

  /** Seconds-since-epoch as a double (micro-precision), the legacy
    * `cast(ts as double)` formulation, NTZ-tolerant.
    */
  def secondsOf(c: Column, dt: DataType): Column = dt match {
    case TimestampNTZType => c.cast(TimestampType).cast("double")
    case _                => c.cast("double")
  }
}
