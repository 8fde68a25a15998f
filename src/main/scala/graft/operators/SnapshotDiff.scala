package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff: the change set between two keyed snapshots of the same
  * entity table (the daily-snapshot warehouse's CDC primitive — "what
  * appeared / disappeared / changed between day A and day B" without any
  * change log, which is exactly the position the reference's
  * fact_daily_snapshot design is in).
  *
  * One full-outer shuffle join on the keys; change classification is a
  * null-safe comparison of every non-key column (`<=>`, so null→value and
  * value→null count as changes, null→null does not). Unchanged rows are
  * dropped — at 100 TB the change set is the small output, the point of
  * diffing snapshots instead of scanning them.
  *
  * Output: keys, `change_type` ('added' | 'removed' | 'changed'), and each
  * value column twice as `before_<c>` / `after_<c>`.
  */
object SnapshotDiff {
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(before.columns.sameElements(after.columns),
      s"snapshots must share a schema: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val valueCols = before.columns.filterNot(keys.contains).toSeq
    // loud-failure guards like the sibling operators: emitted/internal
    // names must not collide with inputs or the output silently corrupts
    val emitted = Seq("change_type", "__b", "__a") ++
      valueCols.flatMap(c => Seq(s"before_$c", s"after_$c"))
    emitted.foreach(c => require(!before.columns.contains(c),
      s"input column '$c' collides with a name diff() emits; rename it"))
    val b = before.select(keys.map(col) ++
      valueCols.map(c => col(c).as(s"before_$c")) :+ lit(1).as("__b"): _*)
    val a = after.select(keys.map(col) ++
      valueCols.map(c => col(c).as(s"after_$c")) :+ lit(1).as("__a"): _*)
    val joined = b.join(a, keys, "full_outer")
    val anyValueChanged = valueCols
      .map(c => !(col(s"before_$c") <=> col(s"after_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined
      .withColumn("change_type",
        when(col("__b").isNull, "added")
          .when(col("__a").isNull, "removed")
          .when(anyValueChanged, "changed"))
      .filter(col("change_type").isNotNull)
      .select((keys.map(col) :+ col("change_type")) ++
        valueCols.map(c => col(s"before_$c")) ++
        valueCols.map(c => col(s"after_$c")): _*)
  }

  /** The inverse operator: apply a [[diff]] change set to the `before`
    * snapshot, reconstructing `after` exactly — `applyChanges(b, diff(b, a),
    * keys) == a` row-for-row. This is how a 100 TB warehouse ships state:
    * full snapshots move once, then only the (small) change sets travel and
    * replay downstream.
    *
    * One keyed join (the change set is the small side — broadcast-able by
    * AQE at real scale): keys absent from the changes keep their `before`
    * values, 'removed' keys drop, 'added'/'changed' keys take the
    * `after_*` values.
    */
  def applyChanges(before: DataFrame, changes: DataFrame,
                   keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "applyChanges needs at least one key column")
    val valueCols = before.columns.filterNot(keys.contains).toSeq
    val needed = "change_type" +: valueCols.map(c => s"after_$c")
    needed.foreach(c => require(changes.columns.contains(c),
      s"changes frame lacks column '$c' — not a diff() output for this snapshot schema"))
    val ch = changes.select(keys.map(col) ++
      (col("change_type") +: valueCols.map(c => col(s"after_$c"))): _*)
    before.join(ch, keys, "full_outer")
      .filter(col("change_type").isNull || col("change_type") =!= "removed")
      .select(keys.map(col) ++ valueCols.map(c =>
        when(col("change_type").isNotNull, col(s"after_$c"))
          .otherwise(col(c)).as(c)): _*)
  }
}
