package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Sampling
import graft.operators.dedup.LineDedup

/** End-to-end TRAINING-DATA curation — the LLM-side analog of
  * [[TikiDailyPipeline]]: the corpus-build workflow a C4/RefinedWeb-style
  * pipeline runs, composed from the library's gated operators in one call.
  *
  *  1. C4-style line cleaning ([[LineDedup.cleanRelative]]): per-document
  *     first-occurrence line dedup + cross-corpus boilerplate removal at a
  *     permille-of-documents frequency threshold.
  *  2. language ID over the CLEANED text; keep `keepLangs`.
  *  3. heuristic quality score over the cleaned text; keep ≥ `minQuality`.
  *  4. exact dedup on the normalized cleaned text — min doc_id survives.
  *  5. deterministic md5-bucketed train/eval split (reproducible across
  *     engines/runs — contamination-auditable).
  *  6. whitespace token count (the budgeting input packing consumes).
  *
  * Stage ORDER mirrors production corpus builds and the scale argument:
  * line cleaning first (language/quality must read the text a model would
  * actually train on), the cheap per-document filters BEFORE the dedup
  * shuffle (fewer rows pay the exchange), the split LAST so dedup cannot
  * leak a duplicate pair across splits (the q50 contamination discipline).
  *
  * Scale shape: stages 2/3/6 are pure projections (codegen'd, no
  * exchange); stage 1 is LineDedup's two bounded aggregates; stage 4 is
  * ONE shuffle on the text fingerprint (min-aggregate + semi-join back,
  * never a window sort); stage 5 is a projection. Total: the line-grain
  * shuffles of stage 1 plus one doc-grain shuffle — nothing O(corpus²).
  */
object CurationPipeline {

  /** @param docs     (idCol, linesCol) frame — linesCol an array of line
    *                 strings (split real corpora on newlines; the gate
    *                 synthesizes lines for the newline-free testdata)
    * @return one row per SURVIVING document:
    *         (idCol, lang, quality_score, n_tokens, split_name)
    */
  def run(docs: DataFrame, idCol: String, linesCol: String,
          permilleOfDocs: Int, keepLangs: Seq[String], minQuality: Double,
          trainPct: Int): DataFrame = {
    require(keepLangs.nonEmpty, "keepLangs must name at least one language")
    val cleaned = LineDedup.cleanRelative(docs, idCol, linesCol, permilleOfDocs)
    val scored = cleaned
      .withColumn("lang", TextFns.languageId(col("clean_text")))
      .withColumn("quality_score", TextFns.qualityScore(col("clean_text")))
      .filter(col("lang").isin(keepLangs: _*) &&
        col("quality_score") >= minQuality)
    // exact dedup, min-id survivor: a fingerprint min-aggregate plus a
    // (fp, id) equi-join back — partial-combines map-side, no window sort.
    // CACHED: both join sides consume it — uncached, the whole line-clean
    // + scoring lineage would execute twice (OpCache: scope-released)
    val fingered = graft.operators.OpCache.cache(
      scored.withColumn("__fp", TextFns.fingerprint(col("clean_text"))))
    val survivors = fingered.join(
      fingered.groupBy(col("__fp")).agg(min(col(idCol)).as(idCol)),
      Seq("__fp", idCol))
    Sampling.deterministicSplit(survivors, idCol, trainPct)
      .select(col(idCol), col("lang"), col("quality_score"),
        TextFns.tokenCountWs(col("clean_text")).as("n_tokens"),
        col("split_name"))
  }

  /** The SPAN-GRAIN curation chain — [[run]]'s sibling composing the
    * round-13 operator additions in production order:
    *
    *  1. per-source document CAP ([[Sampling.capPerSource]]) FIRST —
    *     domain balancing cuts volume before anything else pays for it;
    *  2. exact-substring SPAN removal
    *     ([[graft.operators.dedup.SpanDedup]]) over the capped corpus —
    *     duplicate counting deliberately runs on what survived the cap
    *     (a span duplicated only via capped-away documents is NOT
    *     removed; the oracle pins this ordering);
    *  3. Gopher-style rule FILTER ([[graft.functions.QualityRules]])
    *     over the CLEANED text — rules must judge what a model would
    *     train on, the same read-after-clean discipline as [[run]];
    *  4. exact dedup on the cleaned text's fingerprint, min-id survivor
    *     (span removal canonicalizes near-copies into exact copies —
    *     dedup AFTER it catches strictly more);
    *  5. deterministic md5 split LAST (contamination-auditable).
    *
    * Scale shape: stage 1 is TopK's map-side k-buffers; stage 2 is
    * SpanDedup's linear hash-count/join-back; stage 3 per-row; stage 4
    * one fingerprint shuffle; stage 5 a projection. The id-keyed stage
    * joins shuffle on the doc id — fact-grain, AQE-handled.
    *
    * @return one surviving row per document:
    *         (idCol, sourceCol, n_words, n_removed, split_name)
    */
  def runSpanGrain(docs: DataFrame, idCol: String, textCol: String,
                   sourceCol: String, cap: Int, spanTokens: Int,
                   th: graft.functions.QualityRules.Thresholds,
                   trainPct: Int): DataFrame = {
    import graft.operators.dedup.SpanDedup
    import graft.functions.QualityRules
    // capped feeds span removal AND the source join-back
    val capped = graft.operators.OpCache.cache(
      Sampling.capPerSource(
        docs.select(col(idCol), col(sourceCol), col(textCol)),
        idCol, sourceCol, cap).drop("cap_rank"))
    // cleaned feeds the rules, the fingerprint dedup AND the output —
    // uncached, the whole span-removal lineage would run three times
    val cleaned = graft.operators.OpCache.cache(
      SpanDedup.removeDuplicateSpans(capped, idCol, textCol, spanTokens)
        .join(capped.select(col(idCol), col(sourceCol)), Seq(idCol)))
    // cached before the passed-filter: a lazy report would collapse the
    // stats projection into one interpreted Filter condition that
    // re-evaluates the whole-text normalize regex per rule (the q177
    // 19-evals-per-row measurement — see CurationFunnel's rules stage);
    // the cache is doc-grain numerics, and the projection computes
    // normalize once under codegen CSE
    val scored = graft.operators.OpCache.cache(
        QualityRules.report(cleaned, idCol, "clean_text", th))
      .filter(col("passed"))
      .select(col(idCol), col("n_words"))
    val kept = cleaned.join(scored, Seq(idCol))
    val survivors = kept.join(
      kept.withColumn("__fp", TextFns.fingerprint(col("clean_text")))
        .groupBy(col("__fp")).agg(min(col(idCol)).as(idCol))
        .select(col(idCol)),
      Seq(idCol))
    Sampling.deterministicSplit(survivors, idCol, trainPct)
      .select(col(idCol), col(sourceCol), col("n_words"),
        col("n_removed"), col("split_name"))
  }
}
