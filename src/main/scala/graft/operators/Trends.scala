package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Google-Trends specific row filters (reference
  * transform_google_trends.py keeps the `isPartial` flag; downstream
  * dashboards drop partial final days before aggregation — this is that
  * drop as an operator instead of an ad-hoc WHERE).
  */
object Trends {

  /** Keep only fully-observed days: rows whose partial flag is true are
    * dropped; a NULL flag counts as complete (the reference's CSV omits the
    * flag for historical rows).
    */
  def completeDays(df: DataFrame, flagCol: Column): DataFrame =
    df.filter(!coalesce(flagCol.cast("boolean"), lit(false)))
}
