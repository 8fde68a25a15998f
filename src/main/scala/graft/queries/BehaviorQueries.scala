package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.{Analytics, Funnel}

/** User-behavior analytics over the events stream: cohort retention (q74)
  * and ordered funnel conversion (q76) — the two dashboard families the
  * reference's Looker layer serves beyond plain aggregates.
  */
object BehaviorQueries {

  /** q74: retention triangle — users by first-touch day, distinct active
    * users per (cohort_day, day_offset) ([[Analytics.cohortRetention]]).
    */
  def q74CohortRetention(spark: SparkSession, dir: String): DataFrame =
    Analytics.cohortRetention(Tables.events(spark, dir), "user_id", "ts")
      .select(col("cohort_day"), col("day_offset").cast("int").as("day_offset"),
        col("active_users"))

  def q74Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE ts IS NOT NULL
      |), f AS (
      |  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY 1
      |)
      |SELECT f.cohort_day, CAST(ev.day - f.cohort_day AS INTEGER) AS day_offset,
      |  COUNT(DISTINCT ev.user_id) AS active_users
      |FROM ev JOIN f USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  private val FunnelStages = Seq("view", "click", "purchase")

  /** q76: ordered funnel view → click → purchase ([[Funnel.stageCounts]]):
    * stage i counts at the minimum event time of its type STRICTLY after
    * stage i-1's reach time. The oracle replays the same min-chain as
    * three dependent aggregate CTEs; the typed per-user state machine and
    * the SQL must agree on every user.
    */
  def q76Funnel(spark: SparkSession, dir: String): DataFrame =
    Funnel.stageCounts(Tables.events(spark, dir), "user_id", "ts",
      "event_type", FunnelStages)

  def q76Oracle: String =
    s"""WITH e AS (
       |  SELECT user_id, ts, event_type FROM events WHERE ts IS NOT NULL
       |), s1 AS (
       |  SELECT user_id, MIN(ts) AS t FROM e WHERE event_type = '${FunnelStages(0)}' GROUP BY 1
       |), s2 AS (
       |  SELECT e.user_id, MIN(e.ts) AS t FROM e JOIN s1 USING (user_id)
       |  WHERE e.event_type = '${FunnelStages(1)}' AND e.ts > s1.t GROUP BY 1
       |), s3 AS (
       |  SELECT e.user_id, MIN(e.ts) AS t FROM e JOIN s2 USING (user_id)
       |  WHERE e.event_type = '${FunnelStages(2)}' AND e.ts > s2.t GROUP BY 1
       |)
       |SELECT * FROM (
       |  SELECT 1 AS stage_no, '${FunnelStages(0)}' AS stage, (SELECT COUNT(*) FROM s1) AS users
       |  UNION ALL
       |  SELECT 2, '${FunnelStages(1)}', (SELECT COUNT(*) FROM s2)
       |  UNION ALL
       |  SELECT 3, '${FunnelStages(2)}', (SELECT COUNT(*) FROM s3)
       |) WHERE users > 0""".stripMargin

  /** q82: first-order event-transition matrix
    * ([[Analytics.transitionMatrix]]): counts of consecutive
    * (from → to) event-type bigrams per user, totally ordered by
    * (ts, event_id) so ties are deterministic in both engines.
    */
  def q82Transitions(spark: SparkSession, dir: String): DataFrame =
    Analytics.transitionMatrix(
      Tables.events(spark, dir).filter(col("ts").isNotNull),
      "user_id", "event_type", Seq(col("ts"), col("event_id")))

  def q82Oracle: String =
    """WITH seq AS (
      |  SELECT event_type, lag(event_type) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events WHERE ts IS NOT NULL
      |)
      |SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS transitions
      |FROM seq WHERE prev IS NOT NULL
      |GROUP BY 1, 2""".stripMargin

  /** q83: rolling z-score anomaly days ([[graft.operators.Stats.rollingZ]])
    * — each day's event-value total against the mean/σ of the 7 preceding
    * days, moments exact in decimal, one textually-mirrored double
    * formula at the edge (sqrt and ÷ are correctly-rounded IEEE ops, so
    * the oracle's identical expression agrees bitwise). Null z = warm-up
    * rows (< 7 prior days) or a zero-variance baseline.
    */
  def q83AnomalyDays(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Stats
    val daily = Tables.events(spark, dir).filter(col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast(DecimalType(18, 2))).as("day_value"))
      .select(col("day"),
        (col("day_value") * 100).cast("long").as("value_cents"))
    Stats.rollingZ(daily, col("day"), col("value_cents"), n = 7)
      .select(col("day"), col("value_cents"), col("z"),
        coalesce(abs(col("z")) > 2.0, lit(false)).as("is_anomaly"))
  }

  def q83Oracle: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS value_cents
      |  FROM events WHERE ts IS NOT NULL GROUP BY 1
      |), m AS (
      |  SELECT day, value_cents,
      |    SUM(CAST(value_cents AS DECIMAL(18,0))) OVER w AS s1,
      |    SUM(CAST(value_cents AS DECIMAL(18,0)) * CAST(value_cents AS DECIMAL(18,0))) OVER w AS s2,
      |    COUNT(value_cents) OVER w AS cnt
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
      |), z AS (
      |  -- decimal moments reach double via VARCHAR: DuckDB's direct
      |  -- decimal→double cast double-rounds above 2^53 (s2 ≈ 7·(1e9)²
      |  -- exceeds it); the string parse is correctly rounded, matching
      |  -- Spark's Decimal.toDouble (same trap as q67)
      |  SELECT day, value_cents, cnt,
      |    (CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
      |      - CAST(CAST(s1 AS VARCHAR) AS DOUBLE) * CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(cnt AS DOUBLE))
      |      / (CAST(cnt AS DOUBLE) - 1.0) AS var,
      |    (CAST(value_cents AS DOUBLE) - CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(cnt AS DOUBLE)) AS dev
      |  FROM m
      |)
      |SELECT day, value_cents,
      |  CASE WHEN cnt = 7 AND var > 0 THEN dev / sqrt(var) END AS z,
      |  COALESCE(abs(CASE WHEN cnt = 7 AND var > 0 THEN dev / sqrt(var) END) > 2.0, FALSE) AS is_anomaly
      |FROM z""".stripMargin

  /** q86: per-user activity-coverage audit ([[Analytics.coverageGaps]]) —
    * users who went dark for days inside their own active span. Pure
    * arithmetic on one partial-agg pass; the calendar is never exploded.
    */
  def q86ActivityGaps(spark: SparkSession, dir: String): DataFrame =
    Analytics.coverageGaps(
        Tables.events(spark, dir).filter(col("ts").isNotNull)
          .select(col("user_id"), to_date(col("ts")).as("day")),
        "user_id", "day")
      .filter(col("missing_days") > 0)

  def q86Oracle: String =
    """SELECT user_id, MIN(day) AS first_day, MAX(day) AS last_day,
      |  COUNT(DISTINCT day) AS active_days,
      |  CAST(MAX(day) - MIN(day) + 1 AS BIGINT) AS span_days,
      |  CAST(MAX(day) - MIN(day) + 1 AS BIGINT) - COUNT(DISTINCT day) AS missing_days
      |FROM (SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE ts IS NOT NULL)
      |GROUP BY user_id
      |HAVING CAST(MAX(day) - MIN(day) + 1 AS BIGINT) - COUNT(DISTINCT day) > 0""".stripMargin

  /** q89: per-user time-weighted average event value
    * ([[Analytics.timeWeightedAvg]]) — each observation weighted by its
    * holding time, the irregular-series mean a row-average gets wrong.
    * Exact decimal Σ(v·w) with the VARCHAR decimal→double route (micros
    * weights push the moment past 2^53).
    */
  def q89Twap(spark: SparkSession, dir: String): DataFrame =
    Analytics.timeWeightedAvg(
      Tables.events(spark, dir), "user_id", "ts", col("value"),
      tieCols = Seq("event_id"))

  def q89Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS t, CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events WHERE ts IS NOT NULL
      |), w AS (
      |  SELECT user_id, v,
      |    lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t AS w
      |  FROM e
      |)
      |SELECT user_id, COUNT(*) AS n_intervals,
      |  CAST(CAST(SUM(v * w) AS VARCHAR) AS DOUBLE) /
      |    CAST(CAST(SUM(w) AS VARCHAR) AS DOUBLE) AS twap
      |FROM w WHERE w IS NOT NULL
      |GROUP BY user_id""".stripMargin
}
