package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame re-expression of the reference's BigQuery MERGE patterns
  * (load_to_bq.py:273 dim_products SCD1; load_to_bq.py:393 dim_categories
  * hybrid; trends_dag.py:653 staging→fact).
  *
  * MERGE = full-outer join on the key + per-column resolution:
  *   - matched        → source value (SCD1 update), or COALESCE(target,
  *                      source) for "keep manual edits" columns
  *   - target-only    → target value (row preserved)
  *   - source-only    → source value (insert)
  *
  * Scale: one shuffle on the merge key for both sides; when the source
  * (daily delta) is small relative to the target, Catalyst/AQE broadcasts
  * it. The source must be unique per key (dedupe upstream — reference does
  * the same with staging tables).
  */
object Upsert {

  /** SCD1 merge. @param keepCols columns where the target value survives a
    * match when non-null (reference's COALESCE(T.c, S.c) hybrid columns,
    * e.g. manually curated category_name; also created_at-style columns via
    * preserveCols which always keep the matched target value).
    */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
            keepCols: Seq[String] = Nil, preserveCols: Seq[String] = Nil): DataFrame = {
    Seq("__tgt" -> target, "__src" -> source).foreach { case (m, df) =>
      require(!df.columns.contains(m),
        s"input already has a $m column; rename it — merge uses it as a side marker")
    }
    // Explicit aliases: target and source frequently share lineage (e.g. a
    // delta derived from the same base table), which would otherwise trip
    // Spark's ambiguous-self-join resolution.
    val t = target.withColumn("__tgt", lit(true)).alias("__t")
    val s = source.withColumn("__src", lit(true)).alias("__s")
    def tc(c: String) = col(s"__t.`$c`")
    def sc(c: String) = col(s"__s.`$c`")
    val joined = t.join(s, keys, "full_outer")
    val tCols = target.columns.filterNot(keys.contains).toSeq
    val sCols = source.columns.filterNot(keys.contains).toSet
    val matched = tc("__tgt").isNotNull && sc("__src").isNotNull

    val resolved = tCols.map { c =>
      if (!sCols.contains(c)) tc(c).as(c) // target-only column
      else {
        val onMatch =
          if (preserveCols.contains(c)) tc(c)
          else if (keepCols.contains(c)) coalesce(tc(c), sc(c))
          else sc(c)
        when(matched, onMatch)
          .when(tc("__tgt").isNotNull, tc(c))
          .otherwise(sc(c)).as(c)
      }
    }
    val srcOnly = source.columns.filterNot(c => keys.contains(c) || tCols.contains(c))
      .map(c => sc(c).as(c)).toSeq
    joined.select(keys.map(col) ++ resolved ++ srcOnly: _*)
  }
}
