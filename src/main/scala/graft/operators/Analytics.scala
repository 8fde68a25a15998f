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

  /** Cohort retention: users grouped by the day of their FIRST event, then
    * distinct active users per (cohort_day, day_offset) cell — the classic
    * retention triangle.
    *
    * Two shuffles, both on bounded keys: first-touch is a partial-agg
    * min per user; the join back to the fact co-partitions on the user key
    * (both sides already hashed on it, AQE handles user-count skew); the
    * final cell aggregation's distinct is per-cell bounded. No windows, no
    * global sorts — the shape survives a 1000× user count.
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val ev = df.filter(col(tsCol).isNotNull)
      .select(col(userCol), to_date(col(tsCol)).as("__day"))
    val firstTouch = ev.groupBy(col(userCol))
      .agg(min(col("__day")).as("cohort_day"))
    ev.join(firstTouch, userCol)
      .groupBy(col("cohort_day"),
        datediff(col("__day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col(userCol)).as("active_users"))
  }

  /** First-order transition matrix over each user's event sequence: counts
    * of consecutive (from_type → to_type) bigrams — the user-journey /
    * Markov-path dashboard family.
    *
    * One shuffle on the user key (lag window, per-user bounded), then a
    * partial-agg count on the |types|² matrix — the exchange after the
    * window carries matrix cells, not events. `orderCols` must totally
    * order each user's events (ts plus a unique tiebreak) or bigrams are
    * nondeterministic under ties.
    */
  def transitionMatrix(df: DataFrame, userCol: String, typeCol: String,
                       orderCols: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty, "transitionMatrix needs ordering columns")
    val w = Window.partitionBy(col(userCol)).orderBy(orderCols: _*)
    df.withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("transitions"))
  }

  /** Per-key activity-coverage audit: for each key, the active span
    * (first..last day), how many distinct days were active, and how many
    * were MISSED inside the span — the completeness complement of the
    * retention triangle ("which users/feeds went dark mid-span"), and the
    * per-entity analog of the backfill driver's missing-partition problem.
    *
    * Pure arithmetic on ONE partial-agg pass (min/max/distinct-day count
    * per key) — the calendar is never exploded, so the cost is the
    * aggregation's, independent of span length.
    */
  def coverageGaps(df: DataFrame, keyCol: String, dateCol: String): DataFrame =
    df.filter(col(dateCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("first_day"), max(col(dateCol)).as("last_day"),
        countDistinct(col(dateCol)).as("active_days"))
      .withColumn("span_days",
        (datediff(col("last_day"), col("first_day")) + 1).cast("long"))
      .withColumn("missing_days", col("span_days") - col("active_days"))

  /** Time-weighted average: each observation weighted by its holding time
    * (micros until the NEXT observation of the same key — the last one
    * carries no duration), the metric that answers "what was the average
    * price/rate OVER TIME" where a row-mean overweights bursty ticks.
    * The reference's FX-rate feed is exactly such an irregular series.
    *
    * One shuffle on the key (lead window), then exact decimal Σ(v·w) and
    * long Σw per key with a single double division at the edge — the same
    * moment discipline as [[graft.operators.Stats]]. Keys with a single
    * observation have no holding time and produce no output row.
    * `tieCols` must break timestamp ties into a total order: under a tie
    * one row gets zero duration and the other the gap, so WHICH is which
    * must be deterministic or Σ(v·w) isn't.
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
                      valueCol: Column, tieCols: Seq[String]): DataFrame = {
    val base = df.filter(col(tsCol).isNotNull)
      .select(col(keyCol) +: TimeCols.micros(df, tsCol).as("__t") +:
        valueCol.cast("decimal(18,2)").as("__v") +: tieCols.map(col): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t") +: tieCols.map(col): _*)
    base
      .withColumn("__w", lead(col("__t"), 1).over(w) - col("__t"))
      .filter(col("__w").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__v") * col("__w")).as("__sv"), sum(col("__w")).as("__sw"))
      .select(col(keyCol), col("n_intervals"),
        (col("__sv").cast("double") / col("__sw").cast("double")).as("twap"))
  }
}
