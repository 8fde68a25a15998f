package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2: collapse a keyed snapshot series into
  * versioned validity intervals.
  *
  * The reference warehouse keeps dims current-state-only via MERGE
  * (load_to_bq.py:273 — SCD1, history overwritten). This is the sibling the
  * reference's daily fact_daily_snapshot design implies but never builds:
  * derive, from the snapshots themselves, WHEN each attribute state began
  * and ended ("what was this product's category last March"), with no
  * change log required.
  *
  * Shape: one shuffle on the key columns, then two stacked windows over the
  * SAME partitioning (lag to find change points, then lead/row_number over
  * the filtered change rows) — Catalyst plans a single Exchange; the second
  * window reuses the first's hash partitioning. Per-key state is bounded by
  * that key's snapshot count, never by table size, so the plan holds at
  * 100 TB exactly like any windowed dedup.
  *
  * Contract: `ordCol` must be unique per key (pre-aggregate snapshots to
  * the key×ord grain first — see [[Dedup.latestByKey]]); attribute equality
  * is null-safe (`<=>` over a struct), so null→value transitions open a new
  * version and null→null does not.
  */
object Scd2 {

  /** Emit one row per (key, version): the attribute state plus
    * `valid_from` (first ord where it held), `valid_to` (ord of the NEXT
    * state; null for the current one — the half-open interval convention,
    * so `valid_from <= t < valid_to` point-in-time lookups compose with
    * [[RangeJoin.pointInInterval]]), `version` (1-based per key) and
    * `is_current`.
    */
  def history(df: DataFrame, keyCols: Seq[String], ordCol: String,
              attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "history needs at least one key column")
    require(attrCols.nonEmpty, "history needs at least one tracked attribute")
    val emitted = Seq("valid_from", "valid_to", "version", "is_current", "__prev")
    emitted.foreach(c => require(!df.columns.contains(c),
      s"input column '$c' collides with a name history() emits; rename it"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(ordCol))
    val state: Column = struct(attrCols.map(col): _*)
    // change points: first snapshot of a key, or attr state differing from
    // the previous snapshot's (null-safe — lag(struct) is null only on the
    // first row, a struct of nulls is not null)
    val changes = df
      .withColumn("__prev", lag(state, 1).over(w))
      .filter(col("__prev").isNull || !(state <=> col("__prev")))
      .drop("__prev")
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(ordCol))
      .withColumn("valid_to", lead(col(ordCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
