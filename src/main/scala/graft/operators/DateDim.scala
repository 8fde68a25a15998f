package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calendar (date-dimension) generator — the standard warehouse utility
  * every BI layer joins against (reference bigquery_schema.sql partitions
  * every fact by day; the serving layer needs the day's attributes).
  *
  * Engine-portability is the design constraint: `weekofyear`/`dayofweek`
  * conventions differ across engines (Spark's dayofweek is Sunday=1,
  * DuckDB's is Sunday=0, ISO weeks split years differently), so the
  * day-of-week here is ANCHOR ARITHMETIC — days since a known Monday,
  * mod 7 — which every engine computes identically, and week_index is
  * a running Monday-week counter from the same anchor rather than any
  * engine's week-of-year.
  *
  * Generated from one `sequence` literal exploded — bounded by the
  * calendar, no table scan; broadcast it against facts.
  */
object DateDim {

  private val MondayAnchor = "1970-01-05" // a known Monday

  def build(spark: SparkSession, start: String, end: String): DataFrame = {
    val anchored = datediff(col("day"), to_date(lit(MondayAnchor)))
    spark.range(1)
      .select(explode(sequence(to_date(lit(start)), to_date(lit(end)))).as("day"))
      .select(col("day"),
        year(col("day")).as("year"),
        quarter(col("day")).as("quarter"),
        month(col("day")).as("month"),
        dayofmonth(col("day")).as("day_of_month"),
        (((anchored % 7) + 7) % 7 + 1).as("iso_dow"), // 1=Mon .. 7=Sun
        ((((anchored % 7) + 7) % 7 + 1) >= 6).as("is_weekend"),
        trunc(col("day"), "month").as("month_start"),
        floor(anchored / 7).cast("long").as("week_index"))
  }
}
