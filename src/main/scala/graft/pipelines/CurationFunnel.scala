package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{QualityRules, TextFns}
import graft.operators.{NbClassifier, NgramLm, OpCache}

/** Curation FUNNEL report — per-document drop attribution across the
  * composed filter chain (the FineWeb/RefinedWeb reporting discipline:
  * a production curation run publishes not just the survivors but WHY
  * every document fell and at which stage, because filter tuning and
  * corpus audits both start from that table; RefinedWeb's Figure 2 and
  * FineWeb's ablation tables are exactly per-stage removal-rate
  * accounts). Each stage sees only the previous stage's survivors — the
  * pipeline order, not four independent flags: the LM TRAINS on the
  * already-cleaned corpus (CCNet trains after dedup for the same
  * reason), so stage order changes the model, which is why a funnel is
  * a first-class composition and not a join of the per-stage gates.
  *
  * Stage order (first failure wins, every non-null-id doc attributed):
  *   1. `invalid`     — null/empty normalized text: no content to judge;
  *   2. `exact_dedup` — not the min-id survivor of its md5(norm)
  *                      fingerprint group (#30's rule);
  *   3. `rules`       — fails the Gopher doc-grain rule set (#38b);
  *   4. `lm`          — below the CCNet LM keep cut (#38c), LM trained
  *                      on the rule-passing survivors' target stratum;
  *   5. `classifier`  — NB margin non-positive (#38d), fitted on the
  *                      RAW corpus strata (GPT-3's shape: the negative
  *                      class IS raw crawl, so the model sees it
  *                      pre-filter) and applied frozen to survivors;
  *   6. `kept`.
  *
  * Scale shape: each constituent keeps its own shipped scale path (the
  * composition adds no new shuffle grain); between stages a survivor
  * id-set semi-join narrows the corpus (ids only — never wide rows —
  * and each id set is cached because it feeds both the next stage and
  * the final attribution); the attribution is one left-join cascade of
  * the four id sets with a first-match CASE.
  */
object CurationFunnel {

  /** (doc_id, stage) for every non-null-id document of `docs`. */
  def stages(docs: DataFrame, idCol: String, textCol: String,
             posPred: Column, negPred: Column,
             th: QualityRules.Thresholds, lmKeepPct: Int): DataFrame = {
    val base = docs.filter(col(idCol).isNotNull)
    val norm = TextFns.normalizeText(col(textCol))
    val valid = base.filter(col(textCol).isNotNull && length(norm) > 0)
    val validIds = OpCache.cache(valid.select(col(idCol)))
    // stage 2: exact dedup — min id per content fingerprint
    val d1 = OpCache.cache(valid
      .select(col(idCol), TextFns.fingerprint(col(textCol)).as("__fp"))
      .groupBy(col("__fp")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol)))
    val s1 = valid.join(d1, Seq(idCol), "left_semi")
    // stage 3: Gopher doc-grain rules over dedup survivors
    val d2 = OpCache.cache(QualityRules.report(s1, idCol, textCol, th)
      .filter(col("passed")).select(col("doc_id").as(idCol)))
    val s2 = s1.join(d2, Seq(idCol), "left_semi")
    // stage 4: LM filter, trained on the surviving target stratum
    val d3 = OpCache.cache(NgramLm.flagged(s2, idCol, textCol, posPred,
      lmKeepPct).filter(col("keep")).select(col("doc_id").as(idCol)))
    // stage 5: NB classifier — FITTED ON THE RAW CORPUS, applied to the
    // survivors (GPT-3's shape: the negative stratum IS raw crawl, so
    // the model must see it pre-filter; and a frozen raw-corpus fit
    // cannot lose a whole training stratum to an upstream cut). ONE
    // shared tokenization serves fit AND score: the survivors' counts
    // are an id semi-join of the cached flagged (doc, w) frame, not a
    // second corpus-wide tokenize+shuffle (fitAndScoreIds) — s3's id set
    // IS d3, so the semi-join needs no extra materialization
    val d4 = OpCache.cache(
      NbClassifier.fitAndScoreIds(docs, idCol, textCol, posPred, negPred, d3)
        .filter(col("pred")).select(col("doc_id").as(idCol)))
    def flag(ids: DataFrame, name: String): DataFrame =
      ids.withColumn(name, lit(true))
    base.select(col(idCol))
      .join(flag(validIds, "__valid"), Seq(idCol), "left")
      .join(flag(d1, "__d1"), Seq(idCol), "left")
      .join(flag(d2, "__d2"), Seq(idCol), "left")
      .join(flag(d3, "__d3"), Seq(idCol), "left")
      .join(flag(d4, "__d4"), Seq(idCol), "left")
      .select(col(idCol),
        when(col("__valid").isNull, "invalid")
          .when(col("__d1").isNull, "exact_dedup")
          .when(col("__d2").isNull, "rules")
          .when(col("__d3").isNull, "lm")
          .when(col("__d4").isNull, "classifier")
          .otherwise("kept").as("stage"))
  }

  /** The stage-count rollup (stage, n_docs) — the published funnel
    * table; dim-sized (≤ 6 rows) whatever the corpus.
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
             posPred: Column, negPred: Column,
             th: QualityRules.Thresholds, lmKeepPct: Int): DataFrame =
    stages(docs, idCol, textCol, posPred, negPred, th, lmKeepPct)
      .groupBy(col("stage")).agg(count(lit(1)).as("n_docs"))
}
