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
}
