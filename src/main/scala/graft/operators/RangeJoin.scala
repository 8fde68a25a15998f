package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join: attribute point rows (events, readings,
  * trades) to the interval rows that contain them (sessions, validity
  * windows, campaigns).
  *
  * Spark-first: with an equi-key alongside the range condition (the normal
  * case — intervals belong to a user/device/symbol), this COMPOSES as a
  * plain join: Catalyst extracts the equi-conjunct into a hash/sort-merge
  * join and evaluates the BETWEEN as the join's residual filter — one
  * shuffle on the key, per-key-bounded comparison work, no custom operator
  * needed. That composition is exactly what this helper pins down: it
  * REFUSES the keyless case, because without an equi-conjunct Spark
  * silently falls back to BroadcastNestedLoop/cartesian — O(points ×
  * intervals) at 100 TB. Keyless range joins need an interval-bucketing
  * rewrite (quantize both sides to bucket keys, equi-join, exact-filter);
  * build that deliberately if a real keyless case appears rather than
  * letting the planner fan out.
  */
object RangeJoin {
  /** @param joinType "inner" (default) or "left" (points keep a row even
    *                 outside every interval).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pointCol: String,
                      startCol: String, endCol: String,
                      joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty,
      "keyless range join would plan as a cartesian/nested-loop product — " +
        "add an equi-key or write an interval-bucketed rewrite deliberately")
    require(joinType == "inner" || joinType == "left",
      s"unsupported join type '$joinType'")
    val dup = points.columns.toSet
      .intersect(intervals.columns.toSet -- keys)
    require(dup.isEmpty,
      s"non-key columns collide across sides: ${dup.mkString(", ")} — rename them")
    val cond: Column = keys.map(k => points(k) === intervals(k))
      .reduce(_ && _) &&
      points(pointCol) >= intervals(startCol) &&
      points(pointCol) <= intervals(endCol)
    val joined = points.join(intervals, cond, joinType)
    // keep one copy of each key (the point side's — identical under the
    // equi-condition; null-extended rows of a left join have no right key)
    keys.foldLeft(joined)((df, k) => df.drop(intervals(k)))
  }
}
