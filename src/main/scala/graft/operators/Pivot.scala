package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Long→wide pivot — the inverse of [[Melt.wideToLong]] (the reference
  * melts its Google-Trends CSV wide→long, transform_google_trends.py:68;
  * serving layers want the trip back: one row per date, one column per
  * keyword).
  *
  * Values are EXPLICIT by contract. Spark's implicit-values pivot first
  * runs a separate distinct-scan job to discover the output header — a
  * whole extra pass over the fact at 100 TB, and a nondeterministic column
  * set besides (new keys appearing upstream silently widen the schema).
  * With the list pinned, the pivot is ONE partial-agg-friendly shuffle:
  * map-side, each input row contributes to exactly one (group, value)
  * cell, so the exchange carries at most |groups|×|values| cells per
  * partition regardless of input size.
  */
object Pivot {

  /** `df.groupBy(groupCols).pivot(pivotCol, values).agg(aggs…)` — output
    * columns are named `<value>_<aggAlias>` (Spark's convention when
    * multiple aggs are supplied). Cells with no input rows are null, not
    * zero — callers wanting COUNT(*)-like semantics coalesce explicitly.
    */
  def toWide(df: DataFrame, groupCols: Seq[String], pivotCol: String,
             values: Seq[Any], aggs: Seq[Column]): DataFrame = {
    require(values.nonEmpty, "pivot needs an explicit, non-empty value list")
    require(aggs.nonEmpty, "pivot needs at least one aggregate")
    df.groupBy(groupCols.map(col): _*)
      .pivot(pivotCol, values)
      .agg(aggs.head, aggs.tail: _*)
  }
}
