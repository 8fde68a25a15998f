package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents to
  * token-budgeted packs.
  *
  * Scale shape: a single global running sum would serialize on one
  * partition, so documents first land in `buckets` deterministic
  * hash-buckets (the same md5 bucketing as [[Sampling]] — reproducible,
  * never rand()) and the running-sum window packs WITHIN each bucket.
  * Each bucket's packs fill independently — the standard distributed
  * packing layout (pack identity = (bucket, pack_id)).
  *
  * A document longer than the budget gets a pack of its own (the running
  * sum still advances past it); packs are start-offset based, so a doc is
  * assigned to the pack its first token falls into.
  */
object Packing {
  def byTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, buckets: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(buckets > 0, s"buckets must be positive: $buckets")
    val bucketed = df.withColumn("pack_bucket",
      Sampling.hashBucket(col(idCol), buckets))
    val w = Window.partitionBy(col("pack_bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn("__cum", sum(col(tokenCol).cast("long")).over(w))
      .withColumn("pack_id",
        expr(s"(__cum - CAST(`$tokenCol` AS LONG)) DIV ${budget}L"))
      .drop("__cum")
  }
}
