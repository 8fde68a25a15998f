package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{QualityRules, TextFns}
import graft.operators.{NbClassifier, NgramLm, OpCache}

/** One PLUGGABLE funnel stage: `pass(survivors, raw)` returns the ids
  * (first column of the returned frame) that SURVIVE this stage.
  * `survivors` is the previous stage's surviving corpus slice (full
  * rows — a stage may tokenize, score, or join it); `raw` is the
  * UNFILTERED corpus for stages whose models/reference sets must see
  * data upstream cuts would hide (the NB classifier fits on raw; a
  * decontamination stage derives its benchmark set from raw). Stage
  * names become attribution labels, so they must be unique and must
  * not collide with the built-in 'invalid'/'kept'.
  */
final case class FunnelStage(name: String,
    pass: (DataFrame, DataFrame) => DataFrame)

/** Curation FUNNEL report — per-document drop attribution across the
  * composed filter chain (the FineWeb/RefinedWeb reporting discipline:
  * a production curation run publishes not just the survivors but WHY
  * every document fell and at which stage, because filter tuning and
  * corpus audits both start from that table; RefinedWeb's Figure 2 and
  * FineWeb's ablation tables are exactly per-stage removal-rate
  * accounts). Each stage sees only the previous stage's survivors — the
  * pipeline order, not independent flags: the LM TRAINS on the
  * already-cleaned corpus (CCNet trains after dedup for the same
  * reason), so stage order changes the model, which is why a funnel is
  * a first-class composition and not a join of the per-stage gates.
  *
  * Round 18: the chain is PLUGGABLE ([[FunnelStage]] / [[stagesOf]]) —
  * production funnels splice decontamination/PII/policy stages into the
  * standard dedup→rules→LM→classifier spine, and because downstream
  * models train on upstream survivors, splicing is a SEMANTIC change
  * the composition must own (the LM behind a spliced decontamination
  * stage trains on a different stratum), not a post-hoc flag join. The
  * standard chain ([[standardStages]] plus the built-in 'invalid') is
  * the q163 gate; a decontamination-spliced chain is gated separately
  * (q170), its oracle replaying the WHOLE re-ordered cascade.
  *
  * Stage order of the STANDARD chain (first failure wins, every
  * non-null-id doc attributed):
  *   1. `invalid`     — null/empty normalized text (built-in: no
  *                      content for any stage to judge);
  *   2. `exact_dedup` — not the min-id survivor of its md5(norm)
  *                      fingerprint group (#30's rule);
  *   3. `rules`       — fails the Gopher doc-grain rule set (#38b);
  *   4. `lm`          — below the CCNet LM keep cut (#38c), LM trained
  *                      on the rule-passing survivors' target stratum;
  *   5. `classifier`  — NB margin non-positive (#38d), fitted on the
  *                      RAW corpus strata (GPT-3's shape: the negative
  *                      class IS raw crawl, so the model sees it
  *                      pre-filter) and applied frozen to survivors —
  *                      fit AND score off ONE shared tokenization
  *                      ([[NbClassifier.fitAndScoreIds]]);
  *   6. `kept`.
  *
  * Scale shape: each constituent keeps its own shipped scale path (the
  * composition adds no new shuffle grain); between stages a survivor
  * id-set semi-join narrows the corpus (ids only — never wide rows —
  * and each id set is cached because it feeds both the next stage and
  * the final attribution); the attribution is one left-join cascade of
  * the stage id sets with a first-match CASE.
  */
object CurationFunnel {

  /** The standard five-stage spine (after the built-in 'invalid'):
    * exact_dedup → rules → lm → classifier — q163's chain, exposed as a
    * stage list so callers splice around it.
    */
  def standardStages(idCol: String, textCol: String,
                     posPred: Column, negPred: Column,
                     th: QualityRules.Thresholds,
                     lmKeepPct: Int): Seq[FunnelStage] = Seq(
    FunnelStage("exact_dedup", (surv, _) =>
      surv.select(col(idCol), TextFns.fingerprint(col(textCol)).as("__fp"))
        .groupBy(col("__fp")).agg(min(col(idCol)).as(idCol))
        .select(col(idCol))),
    // the stats frame is CACHED before the passed-filter: filtering the
    // lazy report lets Catalyst collapse the stats projection into one
    // Filter CONDITION, where every rule re-evaluates the whole-text
    // normalize regex separately and the oversized condition falls out
    // of codegen (no CSE interpreted) — measured 19 normalize evals/row
    // and 8.8 s of q177's 17 s in that one interpreted filter. The cache
    // is doc-grain numerics (id + 6 stats + flag), spillable at any
    // scale, and the projection computes normalize ONCE per row under
    // codegen subexpression elimination.
    FunnelStage("rules", (surv, _) =>
      OpCache.cache(QualityRules.report(surv, idCol, textCol, th))
        .filter(col("passed")).select(col("doc_id").as(idCol))),
    FunnelStage("lm", (surv, _) =>
      NgramLm.flagged(surv, idCol, textCol, posPred, lmKeepPct)
        .filter(col("keep")).select(col("doc_id").as(idCol))),
    // FITTED ON THE RAW CORPUS, applied to the survivors (GPT-3's
    // shape: the negative stratum IS raw crawl, so the model must see
    // it pre-filter; and a frozen raw-corpus fit cannot lose a whole
    // training stratum to an upstream cut). ONE shared tokenization
    // serves fit AND score (fitAndScoreIds)
    FunnelStage("classifier", (surv, raw) =>
      NbClassifier.fitAndScoreIds(raw, idCol, textCol, posPred, negPred,
        surv.select(col(idCol)))
        .filter(col("pred")).select(col("doc_id").as(idCol))))

  /** PII saturation stage (SURVEY §2 item 57c — the RefinedWeb/FineWeb
    * discipline): documents with more than `maxPii` PII spans across
    * the four families ([[TextFns.piiTotal]]: email, phone, IPv4,
    * ID-number) are DROPPED — a document that is mostly contact records
    * is not prose worth redacting; light hits are left for the
    * redaction transform (#57/57b) downstream of curation. A pure
    * codegen projection + filter (regexp counts over the survivor
    * slice), spliced anywhere in the spine via [[stagesOf]].
    */
  def piiStage(idCol: String, textCol: String, maxPii: Int): FunnelStage = {
    require(maxPii >= 0, s"maxPii must be >= 0, got $maxPii")
    FunnelStage("pii", (surv, _) =>
      surv.filter(TextFns.piiTotal(col(textCol)) <= maxPii)
        .select(col(idCol)))
  }

  /** (doc_id, stage) for every non-null-id document of `docs`, through
    * an ARBITRARY stage chain: built-in 'invalid' first, then each
    * [[FunnelStage]] in order over the previous stage's survivors,
    * 'kept' last.
    */
  def stagesOf(docs: DataFrame, idCol: String, textCol: String,
               chain: Seq[FunnelStage]): DataFrame = {
    val names = chain.map(_.name)
    require(names.distinct.size == names.size,
      s"stage names must be unique, got $names")
    require(!names.contains("invalid") && !names.contains("kept"),
      "'invalid' and 'kept' are the built-in first/last labels")
    val base = docs.filter(col(idCol).isNotNull)
    val norm = TextFns.normalizeText(col(textCol))
    val valid0 = base.filter(col(textCol).isNotNull && length(norm) > 0)
    val sc = docs.sparkSession.sparkContext
    // Spread a narrower-than-cores corpus before the CPU-bound per-row
    // stages (the §2.5 unsplittable-input fix, and BinaryPipeline's
    // "spread before the encode" lesson): every funnel stage runs
    // regex/tokenizer work over the survivor rows, and a single-split
    // source (one small parquet file = one scan task) serializes ALL of
    // it — measured 7.4 s of q177's PII+rules regexes on one core with
    // 31 idle. Guarded by the scan's actual parallelism: at warehouse
    // scale the source has thousands of splits and this is a no-op, so
    // nothing here shuffles a 100 TB corpus.
    val valid =
      if (valid0.rdd.getNumPartitions >= sc.defaultParallelism) valid0
      else valid0.repartition(sc.defaultParallelism, col(idCol))
    // stage id frames are CHECKPOINTED, not cached (round-20 driver-gap
    // measurement): every stage's plan embeds ALL previous stages'
    // lineage through the cached id frames (cache substitution happens
    // after analysis), so a k-stage funnel re-analyzes O(k²) lineage on
    // every action — ~6 s of q177's 15 s was Catalyst walking 7 KB
    // expression strings. The checkpoint truncates each stage's plan to
    // an RDD-scan leaf; blocks release with the query's OpCache scope.
    val validIds = OpCache.checkpoint(valid.select(col(idCol)))
    var surv = valid
    val stageIds = chain.map { st =>
      sc.setJobDescription(s"funnel: stage ${st.name}")
      val out = st.pass(surv, docs)
      val ids = OpCache.checkpoint(out.select(col(out.columns.head).as(idCol)))
      surv = surv.join(ids, Seq(idCol), "left_semi")
      sc.setJobDescription(null)
      st.name -> ids
    }
    def flag(ids: DataFrame, name: String): DataFrame =
      ids.withColumn(name, lit(true))
    val joined = stageIds.zipWithIndex.foldLeft(
      base.select(col(idCol))
        .join(flag(validIds, "__valid"), Seq(idCol), "left")) {
      case (acc, ((_, ids), i)) =>
        acc.join(flag(ids, s"__s$i"), Seq(idCol), "left")
    }
    val attribution = stageIds.zipWithIndex.foldLeft(
      when(col("__valid").isNull, "invalid")) {
      case (c, ((name, _), i)) => c.when(col(s"__s$i").isNull, name)
    }.otherwise("kept")
    joined.select(col(idCol), attribution.as("stage"))
  }

  /** The standard chain — q163's gate shape. */
  def stages(docs: DataFrame, idCol: String, textCol: String,
             posPred: Column, negPred: Column,
             th: QualityRules.Thresholds, lmKeepPct: Int): DataFrame =
    stagesOf(docs, idCol, textCol,
      standardStages(idCol, textCol, posPred, negPred, th, lmKeepPct))

  /** The stage-count rollup (stage, n_docs) — the published funnel
    * table; dim-sized (≤ stages+2 rows) whatever the corpus.
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
             posPred: Column, negPred: Column,
             th: QualityRules.Thresholds, lmKeepPct: Int): DataFrame =
    stages(docs, idCol, textCol, posPred, negPred, th, lmKeepPct)
      .groupBy(col("stage")).agg(count(lit(1)).as("n_docs"))
}
