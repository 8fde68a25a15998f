package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dashboard/mart window operators (reference README "Analytics layer /
  * Looker Studio" query shapes over analytics_product_market_daily).
  *
  * All of these shuffle once on the partition key and sort within
  * partitions — no global sorts. Orderings must be total (unique tiebreak
  * column last) for run-to-run determinism.
  */
object Analytics {

  /** Top-N rows per group by a total ordering (e.g. top products per brand). */
  def topNPerGroup(df: DataFrame, groupCols: Seq[String],
                   ordering: Seq[Column], n: Int,
                   rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }

  /** value / sum(value) over the group, as double (deterministic division
    * of exact per-group sums — never divide inside a running double sum).
    */
  def shareOfTotal(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   shareCol: String = "share"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn(shareCol,
      col(valueCol).cast(DoubleType) / sum(col(valueCol)).over(w).cast(DoubleType))
  }

  /** Day-over-day delta via lag (price-history analysis on the reference's
    * fact_daily_snapshot grain).
    */
  def dayOverDay(df: DataFrame, partitionCols: Seq[String], orderCol: Column,
                 valueCol: String, deltaCol: String = "delta"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCol)
    df.withColumn(deltaCol,
      col(valueCol).cast(DoubleType) - lag(col(valueCol), 1).over(w).cast(DoubleType))
  }

  /** Rolling mean over the previous `size` rows (inclusive). Computed as
    * exact windowed sum / windowed count so partition order can't perturb
    * the float result.
    */
  def rollingAvg(df: DataFrame, partitionCols: Seq[String], orderCol: Column,
                 valueCol: String, size: Int,
                 avgCol: String = "rolling_avg"): DataFrame = {
    require(size >= 1, s"window size must be >= 1, got $size")
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCol)
      .rowsBetween(-(size - 1), Window.currentRow)
    df.withColumn(avgCol,
      sum(col(valueCol)).over(w).cast(DoubleType) /
        count(col(valueCol)).over(w))
  }
}
