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
  * Assignment is START-OFFSET based: a doc joins the pack its first token
  * falls into, so a pack containing a doc that crosses the budget boundary
  * EXCEEDS the budget (and the next boundary-aligned pack may be empty).
  * This is the cheap deterministic variant — sizing buffers from packs
  * must tolerate overflow by up to one document; capacity-strict first-fit
  * packing needs per-bucket sequential state (a mapPartitions pass), not a
  * window. `idCol` must be unique per row or the running sum's tie order —
  * and therefore pack assignment — is nondeterministic.
  */
object Packing {
  def byTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, buckets: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(buckets > 0, s"buckets must be positive: $buckets")
    Seq("pack_bucket", "pack_id", "__cum").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column; rename it — byTokenBudget emits it"))
    val bucketed = df.withColumn("pack_bucket",
      Sampling.hashBucket(col(idCol), buckets, ":pack"))
    val w = Window.partitionBy(col("pack_bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn("__cum", sum(col(tokenCol).cast("long")).over(w))
      .withColumn("pack_id",
        expr(s"(__cum - CAST(`$tokenCol` AS LONG)) DIV ${budget}L"))
      .drop("__cum")
  }
}
