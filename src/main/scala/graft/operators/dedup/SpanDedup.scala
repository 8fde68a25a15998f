package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** EXACT-SUBSTRING span removal (Lee et al. 2021, "Deduplicating Training
  * Data Makes Language Models Better", the ExactSubstr discipline): when a
  * token window recurs ANYWHERE in the corpus, remove the duplicated SPAN
  * from every document and keep the rest — the span grain none of the
  * whole-document family (#30-34, #36e) covers: boilerplate quotes,
  * licence blocks and templated headers rarely make two documents
  * near-identical, but every copy still trains the model on the same
  * bytes twice.
  *
  * Rule: token j of a document is removed iff some window of `spanTokens`
  * consecutive tokens covering j has a window HASH that occurs ≥ 2 times
  * corpus-wide (including twice within one document — self-repetition is
  * duplication too, the paper's convention). Documents shorter than
  * `spanTokens` carry no window and pass through unchanged. Matching is
  * on the 31-bit [[graft.plans.ShingleHash]] md5 hashes, not the raw
  * grams — the oracle replays the identical hashes, and a 31-bit
  * collision (p ≈ n²/2³² over distinct grams) costs a spuriously removed
  * span, never a kept duplicate — the conservative side for training
  * data. The reference discipline uses ~50-token spans over BPE ids;
  * `spanTokens` is that knob over whitespace tokens.
  *
  * Scale shape, all linear: one ordered-window projection (native
  * ShingleHash, no per-window string allocation beyond the hash pass);
  * one shuffle on the window hash for the occurrence count (map-side
  * partial); one hash-keyed semi-join back (the duplicated-hash frame is
  * corpus-derived, NOT broadcast — at 100 TB it can be large; a
  * [[graft.operators.BloomFilter]] pre-pass can cut the probe volume);
  * one doc-keyed aggregate of duplicated positions (bounded by document
  * length); one per-row array reconstruction. Never O(corpus²), never a
  * global sort.
  */
object SpanDedup {

  /** @return one row per non-null-id/text doc with non-empty normalized
    *         text: (idCol, n_tokens, n_removed, clean_text) — clean_text
    *         is the space-joined surviving tokens (empty string if the
    *         whole document was duplicated spans).
    */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                           spanTokens: Int): DataFrame = {
    require(spanTokens >= 2, s"span width must be >= 2, got $spanTokens")
    import graft.operators.OpCache
    // base feeds the window explode AND the final reconstruction
    val base = OpCache.cache(docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), TextFns.normalizeText(col(textCol)).as("__norm"))
      .filter(length(col("__norm")) > 0)
      .withColumn("__toks", split(col("__norm"), " "))
      .withColumn("__n", size(col("__toks"))))
    // occ feeds the count AND the join back
    val occ = OpCache.cache(base
      .filter(col("__n") >= spanTokens)
      .select(col(idCol), posexplode(
        TextShingles.shingleHashesAll(col("__norm"), spanTokens)))
      .select(col(idCol), col("pos"), col("col").as("__h")))
    val dups = occ.groupBy(col("__h")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2).select(col("__h"))
    val dupPos = occ.join(dups, Seq("__h"))
      .groupBy(col(idCol)).agg(collect_list(col("pos")).as("__dup"))
    val span = spanTokens - 1
    base.join(dupPos, Seq(idCol), "left")
      .withColumn("__dup", coalesce(col("__dup"), array().cast("array<int>")))
      .withColumn("__kept", filter(col("__toks"),
        (t, j) => !exists(col("__dup"), p => p <= j && j <= p + span)))
      .select(col(idCol),
        col("__n").cast("long").as("n_tokens"),
        (col("__n") - size(col("__kept"))).cast("long").as("n_removed"),
        array_join(col("__kept"), " ").as("clean_text"))
  }
}
