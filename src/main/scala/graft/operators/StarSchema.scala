package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Star-schema split of a cleaned snapshot into fact + dimension frames
  * (reference transform_tiki.py:601-775: FACT_SCHEMA / DIM_PRODUCTS_SCHEMA /
  * DIM_CATEGORIES_SCHEMA).
  *
  * Dimension attributes take LATEST-row (SCD1) semantics, like the
  * reference's sort-desc + drop_duplicates: the whole attribute tuple comes
  * from the single newest snapshot row per key (never a per-column max,
  * which could stitch a "chimera" row out of different days).
  * created_at/updated_at still aggregate over the full history.
  *
  * Missing columns are padded with string-typed nulls (the reference's
  * "missing column → NULL" loop; its dim attributes are STRING columns) —
  * pre-cast the input if a non-string pad type is needed. NullType padding
  * would crash any downstream parquet write.
  */
object StarSchema {

  final case class Split(fact: DataFrame, dimProducts: DataFrame,
                         dimCategories: DataFrame)

  private def select(df: DataFrame, cols: Seq[String]): DataFrame = {
    val present = df.columns.toSet
    df.select(cols.map(c =>
      if (present(c)) col(c) else lit(null).cast("string").as(c)): _*)
  }

  /** @param snapshot      cleaned snapshot rows (one per product-day)
    * @param factCols      daily-metric columns (reference FACT_SCHEMA)
    * @param dimKey        dimension natural key (product_id)
    * @param dimCols       slowly-changing attribute columns
    * @param catKey        category key column
    * @param catCols       category attribute columns
    * @param updatedAtCol  timestamp ordering the snapshots; the newest row
    *                      supplies the attributes (ties break by the
    *                      attribute values themselves, making the choice
    *                      deterministic) and min/max stamp created/updated
    */
  def split(snapshot: DataFrame, factCols: Seq[String], dimKey: String,
            dimCols: Seq[String], catKey: String, catCols: Seq[String],
            updatedAtCol: String): Split = {
    require(catCols.nonEmpty, "catCols must name at least one attribute column")
    val fact = select(snapshot, factCols)
    // null keys can never match in a downstream MERGE (null != null in the
    // join) and would accumulate one orphan row per run — drop them here,
    // matching the reference's critical-field dropna
    val dimBase = select(snapshot, (dimKey +: dimCols) :+ updatedAtCol)
      .filter(col(dimKey).isNotNull)
    val latest = Dedup.latestByKey(dimBase, Seq(dimKey),
        col(updatedAtCol).desc +: dimCols.map(c => col(c).desc_nulls_last))
      .drop(updatedAtCol)
    val dates = dimBase.groupBy(col(dimKey)).agg(
      min(col(updatedAtCol)).as("created_at"),
      max(col(updatedAtCol)).as("updated_at"))
    // dim-scale equi-join on the key both sides just shuffled/grouped on —
    // AQE broadcasts the smaller side
    val dimProducts = latest.join(dates, Seq(dimKey))
    val catBase = select(snapshot, (catKey +: catCols) :+ updatedAtCol)
      .filter(col(catKey).isNotNull)
    val dimCategories = Dedup.latestByKey(catBase, Seq(catKey),
        col(updatedAtCol).desc +: catCols.map(c => col(c).desc_nulls_last))
      .drop(updatedAtCol)
    Split(fact, dimProducts, dimCategories)
  }
}
