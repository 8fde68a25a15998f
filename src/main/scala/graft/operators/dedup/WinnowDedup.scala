package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.OpCache

/** Winnowing-based near-duplicate CLUSTERING — the dedup composition that
  * joins document fingerprinting (SURVEY item 40) to duplicate-cluster
  * resolution (item 65): per-document winnow fingerprints (rolling
  * w-window minima over the ordered shingle-hash sequence; Schleimer/
  * Wilkerson/Aiken, SIGMOD'03) → doc-frequency-capped fingerprint index →
  * candidate pairs sharing ≥ `minShared` selected windows → connected
  * components. Reference rationale: transform_tiki.py:582 resolves
  * duplicate snapshots at file grain; winnowing is the content-grain
  * equivalent — it catches partial/contained overlap that whole-document
  * hashing (item 40's md5 mode) misses.
  *
  * Scale shape: fingerprints are a ~1/w sample of the shingle stream, so
  * the self-join index is w× smaller than NGramJaccard's; the hot-key cap
  * uses the same groupBy-partial-agg + anti-join guard as
  * [[NGramJaccard]] (never a window over the hot key); pair frames are
  * ids-only. All stages bucketed/banded — no O(n²) anywhere.
  */
object WinnowDedup {

  /** (doc_id, fingerprint) — DISTINCT winnow minima per document, the same
    * selection q32 gates. Null-text docs contribute no fingerprints (and
    * so surface as implicit singletons downstream).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   window: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // small compressed parquet = ONE input split; the md5 shingle pipeline
    // is CPU-bound and must spread before the narrow per-row work
    val d = docs.filter(col(textCol).isNotNull).repartition(col(idCol))
    val hashSeq = ColumnBridge.column(graft.plans.ShingleHash(
      ColumnBridge.expression(col(textCol)), distinct = false))
    val hl = d.select(col(idCol).as("doc_id"), hashSeq.as("hs"))
    val m = size(col("hs"))
    val w = lit(window)
    val minima = when(m >= window,
      array_distinct(transform(sequence(lit(0), m - w),
        i => array_min(slice(col("hs"), i + 1, w)))))
      .otherwise(array(array_min(col("hs"))))
    hl.select(col("doc_id"), explode(minima).as("fingerprint"))
  }

  /** Near-dup clusters: (node, cluster_rep, cluster_size) for every doc
    * sharing ≥ `minShared` capped fingerprint windows with another,
    * transitively closed; survivor = min id ([[DupClusters]] contract).
    */
  def clusters(docs: DataFrame, idCol: String, textCol: String,
               window: Int = 4, minShared: Int = 2,
               maxDocFreq: Long = NGramJaccard.DefaultMaxShingleDocFreq)
      : DataFrame = {
    // feeds the frequency aggregate, the anti-join probe and both pair
    // sides — cache keeps the shingle pipeline single-run
    val fps = OpCache.cache(fingerprints(docs, idCol, textCol, window))
    // boilerplate guard: groupBy gets map-side partial agg (a window over
    // the hot fingerprint would be the skew it exists to prevent); the
    // over-cap set is tiny, so the anti-join broadcasts
    val hot = fps.groupBy(col("fingerprint")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)
      .select(col("fingerprint"))
    val kept = OpCache.cache(fps.join(hot, Seq("fingerprint"), "left_anti"))
    val pairs = kept.alias("a").join(kept.alias("b"),
        col("a.fingerprint") === col("b.fingerprint") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_a"), col("doc_b"))
    DupClusters.components(pairs, "doc_a", "doc_b")
  }
}
