package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality summary a warehouse runs
  * over every landed table: row count, null count, exact distinct count,
  * min/max per column, in a SINGLE aggregation job (one scan; Spark plans
  * the multi-column distinct via its Expand rewrite, costing one shuffled
  * pass per profiled table regardless of column count).
  *
  * min/max aggregate on the column's native type (numeric/date ordering,
  * not lexicographic) and only the RESULT is rendered to string for the
  * uniform output schema. Profile long/string/date columns for cross-engine
  * stability; floating-point columns render engine-dependently — cast them
  * to exact types (cents) first.
  *
  * Output: one row per column — (column, n_rows, n_nulls, n_distinct,
  * min_value, max_value).
  */
object Profiler {
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(
      lit(c).as("column"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__nn_$c")).as("n_nulls"),
      col(s"__d_$c").as("n_distinct"),
      col(s"__min_$c").as("min_value"),
      col(s"__max_$c").as("max_value")))
    wide.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }
}
