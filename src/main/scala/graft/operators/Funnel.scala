package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: how many users reached
  * stage i, where stage i counts only at the MINIMUM event time of its type
  * STRICTLY after the time stage i-1 was reached (the standard funnel
  * min-chain — a purchase logged before the user's first view does not
  * convert the view).
  *
  * The reference's events surface (trends + crawler snapshots) feeds
  * exactly this dashboard family (README "Looker analytics"); the operator
  * generalizes it to any stage list.
  *
  * Shape: the scan is pruned to stage-typed events (pushed filter), then
  * ONE shuffle on the user key into a typed `mapGroups` — per-user state is
  * that user's stage events only, bounded like [[graft.streaming.Sessionize]],
  * never by table size. The per-stage reach counts are a k-row aggregate of
  * the per-user output. This is the genuine per-group imperative case
  * (k sequential dependent minima), not expressible as one aggregation.
  */
object Funnel {

  /** Per-user furthest stage reached: (user_id, reach) with reach in
    * [0, stages.length]. Timestamps compare at microsecond grain
    * (`unix_micros` — exact, no double rounding).
    */
  def userReach(df: DataFrame, userCol: String, tsCol: String,
                typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"duplicate stage in $stages")
    Funnel.requireIntegralId(df.schema(userCol).dataType, userCol)
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    // null users are droppable by definition (no identity to funnel) and
    // would NPE the primitive-Long encoder below
    val ev = df
      .filter(col(tsCol).isNotNull && col(typeCol).isin(stages: _*))
      .select(col(userCol).cast("long").as("__u"), TimeCols.micros(df, tsCol),
        col(typeCol))
      .filter(col("__u").isNotNull)
      .as[(Long, Long, String)]
    val stageArr = stages.toArray
    ev.groupByKey(_._1)
      .mapGroups { (user, it) =>
        val evs = it.toArray // bounded: this user's stage events only
        var prev = Long.MinValue
        var reach = 0
        var stalled = false
        var s = 0
        while (s < stageArr.length && !stalled) {
          val stage = stageArr(s)
          var best = Long.MaxValue
          var i = 0
          while (i < evs.length) {
            val t = evs(i)._2
            if (evs(i)._3 == stage && t > prev && t < best) best = t
            i += 1
          }
          if (best == Long.MaxValue) stalled = true
          else { prev = best; reach += 1 }
          s += 1
        }
        (user, reach)
      }
      .toDF(userCol, "reach")
  }

  /** Funnel summary: (stage_no, stage, users) — users whose reach covers
    * the stage. A user with reach r contributes to stages 1..r via a
    * `sequence` explode (zero extra shuffles beyond the final k-row agg).
    */
  def stageCounts(df: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, stages: Seq[String]): DataFrame = {
    userReach(df, userCol, tsCol, typeCol, stages)
      .filter(col("reach") >= 1)
      .select(explode(sequence(lit(1), col("reach"))).as("stage_no"))
      .groupBy(col("stage_no"))
      .agg(count(lit(1)).as("users"))
      .select(col("stage_no").cast("int").as("stage_no"),
        element_at(lit(stages.toArray), col("stage_no")).as("stage"),
        col("users"))
  }

  /** Loud schema guard shared with [[graft.streaming.StreamingFunnel]]: the
    * funnel keys on `cast(user, long)`, so a string/UUID id column would
    * cast to null row-by-row and the funnel would return EMPTY instead of
    * failing — the silent-drop trap. Non-numeric ids must be hashed to
    * long (e.g. `xxhash64`) by the caller, a deliberate identity decision.
    */
  private[graft] def requireIntegralId(dt: org.apache.spark.sql.types.DataType,
                                       name: String): Unit = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"funnel user column '$name' must be integral, got ${t.catalogString}; " +
          "hash non-numeric ids to long (e.g. xxhash64) before calling")
    }
  }
}
