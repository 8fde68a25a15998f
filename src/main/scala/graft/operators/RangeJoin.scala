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

  /** The deliberate KEYLESS rewrite [[pointInInterval]] points to: quantize
    * the numeric domain into `bucketWidth`-sized buckets, explode each
    * interval into the buckets it spans, compute each point's single
    * bucket, and equi-join on the bucket id — a hash-partitionable shuffle
    * join with an exact BETWEEN residual, instead of the cartesian product
    * Spark plans for a bare range condition. A point meets an interval in
    * exactly one bucket (its own), so no post-join dedup is needed.
    *
    * Cost model: intervals replicate span/width (+1) times; points never
    * replicate. Pick `bucketWidth` near the median interval span. An
    * interval spanning more than `maxBucketsPerInterval` buckets raises AT
    * RUNTIME (codegen'd raise_error, no extra pass): one domain-wide
    * interval would otherwise replicate into the entire bucket space and
    * recreate the cartesian blowup this rewrite exists to avoid.
    *
    * Numeric domains only (prices, epochs, ids); inclusive on both bounds.
    */
  def bucketedKeyless(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      bucketWidth: Double,
                      maxBucketsPerInterval: Long = 1000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val dup = points.columns.toSet.intersect(intervals.columns.toSet)
    require(dup.isEmpty,
      s"columns collide across sides: ${dup.mkString(", ")} — rename them")
    require(!points.columns.contains("__bucket") && !intervals.columns.contains("__bucket"),
      "'__bucket' is reserved by bucketedKeyless")
    val lo = floor(col(startCol) / bucketWidth).cast("long")
    val hi = floor(col(endCol) / bucketWidth).cast("long")
    val guardedHi = when(col(endCol) < col(startCol),
      // raw-bounds check, not bucket indices: a sub-bucket inversion would
      // slip a hi==lo comparison, and bucket-crossing inversions must not
      // reach sequence() — it would infer step -1 and replicate the corrupt
      // row DOWNWARD through the bucket space
      raise_error(concat(lit("inverted interval (end < start): ["),
        col(startCol), lit(", "), col(endCol), lit("]"))))
      .when(hi - lo >= maxBucketsPerInterval,
        raise_error(concat(
          lit(s"interval spans >= $maxBucketsPerInterval buckets of width $bucketWidth: ["),
          col(startCol), lit(", "), col(endCol),
          lit("] — widen bucketWidth or split the interval"))))
      .otherwise(hi)
    val ib = intervals.withColumn("__bucket", explode(sequence(lo, guardedHi)))
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    pb.join(ib, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
