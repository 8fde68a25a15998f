package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-most-recent deduplication (reference transform_tiki.py:582:
  * sort_values(desc) + drop_duplicates(keep='first') — a global sort in
  * pandas).
  *
  * Spark-first: one hash shuffle on the dedup key and a per-key sort
  * (window row_number), never a global sort. At 100 TB this is the minimal
  * movement for exact latest-per-key; skewed keys are handled by AQE.
  * The ordering MUST be a total order per key (add a unique id as the last
  * tiebreaker) or results are nondeterministic across runs/cluster layouts.
  */
object Dedup {
  def latestByKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    require(!df.columns.contains("__rn"),
      "input already has a __rn column; rename it — latestByKey would clobber it")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
