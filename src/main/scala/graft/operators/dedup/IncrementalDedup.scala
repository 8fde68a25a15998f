package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Incremental (against-history) exact dedup — the shape a DAILY ingest
  * pipeline actually runs: today's batch dedupes against the corpus
  * already accepted WITHOUT re-scanning or re-hashing history. History
  * participates as its fingerprint set only (at 100 TB: a small
  * fingerprint table maintained incrementally — append today's survivors
  * — while the documents themselves never move again).
  *
  * Two stages, both bounded by today's batch size plus the fingerprint
  * table: (1) within-batch exact dedup (min-id survivor per fingerprint,
  * one partial-agg shuffle); (2) anti-join of the survivors against the
  * history fingerprints (broadcast when small, shuffle otherwise — it is
  * a narrow 1-column frame either way).
  */
object IncrementalDedup {

  /** Rows of `today` that are new w.r.t. `historyFingerprints` (a frame
    * with a `fingerprint` column, e.g. yesterday's [[fingerprints]]
    * output), deduped within the batch (min id per fingerprint). Null-text
    * docs carry a null fingerprint and survive as themselves — nothing to
    * compare, same contract as the rest of the dedup family.
    */
  def newDocs(today: DataFrame, historyFingerprints: DataFrame,
              idCol: String, textCol: String): DataFrame = {
    // cached: the null-text and survivor branches both consume the
    // fingerprinted batch — uncached, the md5 projection runs twice
    val fp = graft.operators.OpCache.cache(
      today.withColumn("fingerprint", TextFns.fingerprint(col(textCol))))
    val nullText = fp.filter(col("fingerprint").isNull)
    val survivors = fp.filter(col("fingerprint").isNotNull)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("fingerprint")).orderBy(col(idCol))))
      .filter(col("__rn") === 1).drop("__rn")
    survivors
      .join(historyFingerprints.select(col("fingerprint")).distinct(),
        Seq("fingerprint"), "left_anti")
      .unionByName(nullText)
  }

  /** The fingerprint set of a corpus — what [[newDocs]] consumes as
    * history and what the ingest pipeline appends each day.
    */
  def fingerprints(df: DataFrame, textCol: String): DataFrame =
    df.select(TextFns.fingerprint(col(textCol)).as("fingerprint"))
      .filter(col("fingerprint").isNotNull)
      .distinct()
}
