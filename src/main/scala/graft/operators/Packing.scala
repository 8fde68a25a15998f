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
  private def requireCleanColumns(df: DataFrame, emitted: Seq[String]): Unit =
    emitted.foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column; rename it — packing emits it"))

  def byTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, buckets: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(buckets > 0, s"buckets must be positive: $buckets")
    requireCleanColumns(df, Seq("pack_bucket", "pack_id", "__cum"))
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

  /** Capacity-STRICT greedy packing: documents are packed in `idCol` order
    * within each deterministic hash-bucket, and a pack CLOSES as soon as
    * the next document would push it past `budget` — so no multi-document
    * pack ever exceeds the budget (the guarantee [[byTokenBudget]]'s
    * start-offset variant deliberately trades away). A single document
    * larger than the whole budget forms its own oversize singleton pack:
    * no assignment does better without splitting documents. Null token
    * counts pack as 0.
    *
    * Scale shape: the sequential close-and-open state cannot be a window
    * expression, so this is the sanctioned mapPartitions case — rows hash
    * to `buckets` partitions and sort (bucket, id) WITHIN each partition;
    * one streaming pass then packs every bucket independently. No global
    * sort, no driver state, memory O(1) per partition.
    */
  def byTokenBudgetStrict(df: DataFrame, idCol: String, tokenCol: String,
                          budget: Long, buckets: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(buckets > 0, s"buckets must be positive: $buckets")
    requireCleanColumns(df, Seq("pack_bucket", "pack_id"))
    val shaped = df
      .withColumn("pack_bucket", Sampling.hashBucket(col(idCol), buckets, ":pack"))
      .repartition(col("pack_bucket"))
      .sortWithinPartitions(col("pack_bucket"), col(idCol))
    val outSchema = shaped.schema
      .add("pack_id", org.apache.spark.sql.types.LongType, nullable = false)
    val bucketIdx = shaped.schema.fieldIndex("pack_bucket")
    val tokenIdx = shaped.schema.fieldIndex(tokenCol)
    shaped.mapPartitions { rows =>
      // several buckets share a partition; the sort makes each contiguous,
      // so one (bucket, packId, used) state machine suffices
      var curBucket: Any = null
      var packId = 0L
      var used = 0L
      rows.map { row =>
        val bucket = row.get(bucketIdx)
        if (bucket != curBucket) { curBucket = bucket; packId = 0L; used = 0L }
        val tokRaw = row.get(tokenIdx)
        val tok = if (tokRaw == null) 0L else tokRaw.asInstanceOf[Number].longValue
        if (used > 0 && used + tok > budget) { packId += 1; used = 0L }
        used += tok
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ packId)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
