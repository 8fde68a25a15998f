package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
}
