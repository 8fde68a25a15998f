package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Star-schema split of a cleaned snapshot into fact + dimension frames
  * (reference transform_tiki.py:601-775: FACT_SCHEMA / DIM_PRODUCTS_SCHEMA /
  * DIM_CATEGORIES_SCHEMA).
  *
  * One pass over the input per output frame, all narrow projections; the
  * caller persists the input if it is expensive to recompute. Missing
  * columns are padded with typed nulls exactly like the reference's
  * "missing column → NULL" loop.
  */
object StarSchema {

  final case class Split(fact: DataFrame, dimProducts: DataFrame,
                         dimCategories: DataFrame)

  private def select(df: DataFrame, cols: Seq[String]): DataFrame = {
    val present = df.columns.toSet
    df.select(cols.map(c =>
      if (present(c)) col(c) else lit(null).as(c)): _*)
  }

  /** @param snapshot      cleaned snapshot rows (one per product-day)
    * @param factCols      daily-metric columns (reference FACT_SCHEMA)
    * @param dimKey        dimension natural key (product_id)
    * @param dimCols       slowly-changing attribute columns
    * @param catKey        category key column
    * @param catCols       category attribute columns
    * @param updatedAtCol  timestamp used for created_at/updated_at stamps
    */
  def split(snapshot: DataFrame, factCols: Seq[String], dimKey: String,
            dimCols: Seq[String], catKey: String, catCols: Seq[String],
            updatedAtCol: String): Split = {
    require(catCols.nonEmpty, "catCols must name at least one attribute column")
    val fact = select(snapshot, factCols)
    val dimAggs = dimCols.map(c => max(col(c)).as(c)) ++ Seq(
      min(col(updatedAtCol)).as("created_at"),
      max(col(updatedAtCol)).as("updated_at"))
    val dimProducts = select(snapshot, (dimKey +: dimCols) :+ updatedAtCol)
      .groupBy(col(dimKey))
      .agg(dimAggs.head, dimAggs.tail: _*)
    val catAggs = catCols.map(c => max(col(c)).as(c))
    val dimCategories = select(snapshot, catKey +: catCols)
      .filter(col(catKey).isNotNull)
      .groupBy(col(catKey))
      .agg(catAggs.head, catAggs.tail: _*)
    Split(fact, dimProducts, dimCategories)
  }
}
