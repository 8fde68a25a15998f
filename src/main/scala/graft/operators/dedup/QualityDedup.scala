package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.TopK

/** Quality-aware near-dup cluster dedup — the curation DECISION the dedup
  * family feeds (FineWeb/RefinedWeb keep one document per near-duplicate
  * cluster, chosen by QUALITY, not by id): cluster documents by
  * transitive near-duplicate pairs ([[NGramJaccard]] → [[DupClusters]]),
  * then within each cluster keep the single document with the highest
  * [[TextFns.qualityScore]] (ties → lowest id — deterministic reruns).
  * Min-id survivorship ([[DupClusters]], [[DedupPipeline]]) answers
  * "which copy is canonical"; this answers the training-set question
  * "which copy is worth keeping" — a boilerplate-stripped duplicate can
  * easily outscore the first-crawled copy.
  *
  * Output: one row per input document —
  * (idCol, cluster_rep, cluster_size, quality_score, kept). Documents in
  * no near-dup pair are singletons (cluster_rep = own id, size 1, kept).
  * Null-text documents shingle to nothing, so they are singletons with
  * quality 0 — kept, because dropping requires evidence of a duplicate.
  *
  * Scale shape: every stage reuses an existing scale path — the pair
  * candidates are doc-frequency-capped shingle joins (the q21 shape),
  * the transitive closure is [[DupClusters]]' O(log n) alternating
  * rounds, quality is a pure codegen projection, and the per-cluster
  * argmax is [[TopK.perGroup]]'s k-bounded partial aggregation (k = 1:
  * one winner row per cluster per mapper crosses the shuffle — a hot
  * mega-cluster never concentrates a sort). No new shuffle grain.
  */
object QualityDedup {

  /** Candidate-generation routing: `banded = false` (default, q148's
    * gated arm) uses the EXACT doc-frequency-capped shingle join
    * ([[NGramJaccard.pairs]]) — full recall at threshold, cost driven by
    * shingle co-occurrence; `banded = true` routes through MinHash-LSH
    * banding + exact verify ([[MinHashLSH.verifiedPairs]], the
    * [[DedupPipeline]] two-stage) — candidate cost O(docs × bands)
    * regardless of shingle skew, recall bounded by banding (measured in
    * QualityDedupSpec). The banded arm is the WIDE-corpus path: q148's
    * 100× probe put the exact candidate stage at 63× (the steepest
    * round-16 scaling), and banding is what caps it. Everything past
    * pair generation is shared.
    */
  def keepBest(docs: DataFrame, idCol: String, textCol: String,
               threshold: Double, banded: Boolean = false): DataFrame = {
    val pairs =
      if (banded) MinHashLSH.verifiedPairs(docs, idCol, textCol, threshold)
      else NGramJaccard.pairs(docs, idCol, textCol, threshold)
    val comp = DupClusters.components(pairs, "doc_a", "doc_b")
      .withColumnRenamed("node", idCol)
    // cached: the quality projection is three full-text regex passes and
    // feeds BOTH output branches (clustered join + singleton anti-join) —
    // uncached it computed twice, which the 100x probe measured as ~240s
    // of pure waste at sf10 (the q141 lesson at document grain)
    val qual = graft.operators.OpCache.cache(docs.select(col(idCol),
      TextFns.qualityScore(col(textCol)).as("quality_score")))
    val clustered = graft.operators.OpCache.cache(
      qual.join(comp, Seq(idCol)))
    val winners = TopK.perGroup(clustered, Seq("cluster_rep"),
        sortCol = "quality_score", idCol = idCol, k = 1)
      .select(col(idCol).as("__winner"))
    val clusteredOut = clustered
      .join(winners, clustered(idCol) === winners("__winner"), "left")
      .select(col(idCol), col("cluster_rep"), col("cluster_size"),
        col("quality_score"), col("__winner").isNotNull.as("kept"))
    val singletons = qual
      .join(comp.select(col(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol), col(idCol).as("cluster_rep"),
        lit(1L).as("cluster_size"), col("quality_score"),
        lit(true).as("kept"))
    clusteredOut.unionByName(singletons)
  }
}
