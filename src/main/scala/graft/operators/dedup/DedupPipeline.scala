package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full production near-dup flow as ONE call — what a user of the
  * library actually runs over a corpus:
  *
  *   1. [[MinHashLSH.candidatePairs]] — banded candidate generation,
  *      O(docs × bands), bucket-size-guarded (never all-pairs)
  *   2. exact n-gram Jaccard VERIFY on the candidates only (array
  *      intersection over the shingle-hash sets — the expensive exact
  *      check pays only for pairs the LSH surfaced)
  *   3. [[DupClusters.components]] — transitive closure of verified pairs
  *   4. survivor selection: min doc id per cluster; unclustered docs
  *      (including null-text docs, which have nothing to hash) survive as
  *      themselves
  *
  * The verify step reuses the SAME hash-frame plan MinHashLSH caches
  * internally, so the md5 shingle pipeline still runs once (Spark's
  * CacheManager deduplicates plan-identical cache() calls).
  *
  * Contract note: a pair is deduplicated iff the LSH surfaces it AND the
  * exact Jaccard clears `threshold` — banding recall bounds the pipeline's
  * recall (measured in DedupSpec); the oracle mirrors the same two-stage
  * semantics exactly.
  *
  * @return one row per input doc: (doc_id, survivor_doc_id, is_survivor)
  */
object DedupPipeline {
  def dedupe(docs: DataFrame, idCol: String, textCol: String,
             threshold: Double): DataFrame = {
    val verified = MinHashLSH.verifiedPairs(docs, idCol, textCol, threshold)
    val comp = DupClusters.components(verified, "doc_a", "doc_b")
    docs.select(col(idCol).as("doc_id"))
      .join(comp.select(col("node").as("doc_id"), col("cluster_rep")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_rep"), col("doc_id")).as("survivor_doc_id"))
      .withColumn("is_survivor", col("doc_id") === col("survivor_doc_id"))
  }
}
