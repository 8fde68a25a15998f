package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: enrich each left row with the most recent right row at or
  * before its timestamp, per key — the time-series lookup (latest rate /
  * last click / price as-of trade) that plain equi-joins can't express and
  * range joins express at O(|left|·|right-per-key|) fan-out.
  *
  * Spark-first formulation (Spark has no ASOF JOIN): tag both sides, UNION
  * them, and run one `last(..., ignoreNulls)` window over (keys) ordered by
  * (ts, side) — right rows sort BEFORE left rows at equal ts, so the match
  * is at-or-before inclusive. Cost = ONE shuffle on the join keys (exactly
  * what any join here would pay) and zero fan-out: no range-condition
  * explosion, no per-left-row scan of right history. This is the standard
  * scale-safe as-of shape.
  *
  * The right payload travels as a single struct, so every enriched column
  * comes from the SAME right row even when payload fields are null.
  *
  * Contract:
  *   - right rows with null `rightTs` are dropped (nothing is "as of null");
  *     left rows with null `leftTs` pass through unenriched.
  *   - right must be unique per (keys, rightTs) — equal-timestamp right
  *     rows have no defined winner in ANY engine's as-of semantics
  *     (DuckDB's ASOF JOIN included); pre-aggregate to one row per key+ts
  *     (e.g. keep the max event id) to make the join deterministic.
  */
object AsOfJoin {
  def leftAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    val reserved = Seq("__ts", "__side", "__r", "__match")
    reserved.foreach(c => require(!left.columns.contains(c),
      s"left already has a '$c' column; rename it — leftAsOf uses it internally"))
    val payload = right.columns.filterNot(c => keys.contains(c))
    payload.foreach(c => require(!left.columns.contains(prefix + c),
      s"output column '$prefix$c' collides with a left column; pick another prefix"))

    // null-key right rows can match nothing under SQL join semantics, but
    // Window.partitionBy groups null keys into ONE partition — drop them
    // here or a null-key left row would be "enriched" from them
    val rTagged = right
      .filter(col(rightTs).isNotNull && keys.map(col(_).isNotNull).reduce(_ && _))
      .select(keys.map(col) :+ col(rightTs).cast("timestamp").as("__ts") :+
        struct(payload.map(col): _*).as("__r"): _*)
      .withColumn("__side", lit(0))
    val lTagged = left
      .withColumn("__ts", col(leftTs).cast("timestamp"))
      .withColumn("__side", lit(1))
    // right rows at ts == left ts must be visible to that left row: order by
    // (ts, side) with right side 0 < left side 1
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc_nulls_first, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      // a null left ts sorted to the partition head and matched nothing —
      // which is the documented pass-through-unenriched contract
      .select(left.columns.map(col) ++
        payload.map(c => col(s"__match.$c").as(prefix + c)): _*)
  }
}
