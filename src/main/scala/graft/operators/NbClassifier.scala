package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bag-of-words quality CLASSIFIER — the "train a cheap classifier to
  * separate a trusted reference corpus from raw crawl" curation leg
  * (GPT-3 appendix A and LLaMA both filter CommonCrawl with a linear
  * fastText-style classifier; CCNet ships the same role via its LM).
  * This is the generative twin: multinomial Naive Bayes with add-one
  * smoothing (McCallum & Nigam 1998, "A Comparison of Event Models for
  * Naive Bayes Text Classification") — two class-conditional unigram
  * models over a SHARED training vocabulary, decision = which class
  * predicts the document better. Training is counting, so the model
  * fits the repo's exact-arithmetic discipline where a discriminative
  * SGD fit (fastText's) never could: every parameter is an integer
  * count and the oracle replays the whole fit.
  *
  * Exact-arithmetic scoring (the [[NgramLm]] discipline): per token,
  * each class's add-one-smoothed conditional
  * `P(w|c) = (n_c(w)+1) / (N_c+V)` becomes the scaled integer
  * `s_c(w) = (SScale·(n_c(w)+1)) DIV (N_c+V) ≤ SScale` (numerator ≤
  * denominator: n_c(w) ≤ N_c and the +1 is absorbed by V ≥ 1), the doc
  * score under class c is the exact BIGINT sum Σ count·s_c over its
  * token multiset — the arithmetic-mean surrogate for the log-product
  * NB decision, same shape as [[NgramLm]]'s perplexity surrogate — and
  * the decision is the SIGN of an integer: `margin = pos − neg`,
  * `pred = margin > 0` (exact ties → negative: a doc the reference
  * model cannot strictly prefer stays filtered). `margin_per_tok` is
  * the difference of the two non-negative per-token integer means
  * (each a single DIV of non-negatives — no floor-vs-trunc ambiguity
  * to replay). Equal class priors: the production knob is the decision
  * threshold, not the prior (GPT-3 thresholds on the classifier score
  * with a Pareto draw; a deterministic engine exposes the margin and
  * lets the pipeline cut).
  *
  * Scale shape: ONE (doc, w) partial-agg shuffle builds the token
  * multiset (the q54 tf shape); both class count tables and the (N, V)
  * scalars reuse that cached frame; scoring is ONE model join (vocab is
  * TRAINING-corpus-sized — the trusted reference is curated and small
  * next to the corpus being scored, so broadcast is the usual route; the
  * DEFAULT is AUTO via [[JoinRouting]] — the fit's already-collected
  * vocabulary size v is the model table's EXACT row count, sized against
  * the session's autoBroadcastJoinThreshold, with
  * `broadcastCounts = Some(true/false)` as the override) and one per-doc
  * agg. Overflow is loud twice: a require
  * keeps `SScale·(N_c+V)` inside BIGINT at train time, and the
  * per-doc RScale product raise_errors past ~9·10⁹ tokens per document
  * (Long.MaxValue / (SScale·RScale) — the [[Dsir]] spt guard shape).
  */
object NbClassifier {

  /** Per-token score scale: s_c carries 6 digits of the rational. */
  val SScale = 1000000L

  /** Per-token mean scale for the final integer divisions. */
  val RScale = 1000L

  /** A FROZEN fitted model: the per-word class count table (w, np, nn —
    * training vocabulary only) plus the training scalars. Everything a
    * detached scorer needs ([[scoreWith]]) — in particular the
    * streaming twin, which scores micro-batches against a model fitted
    * once batch-side.
    */
  case class NbModel(counts: DataFrame, nPos: Long, nNeg: Long, v: Long)

  /** (doc_id, w, c, <flag per stratum>) unigram multiset for all docs
    * with non-empty normalized text; the class flags are doc-constant
    * (empty `strata` = scoring-only frame).
    */
  private def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                          strata: Seq[(String, Column)]): DataFrame = {
    val norm = graft.functions.TextFns.normalizeText(col(textCol))
    val flags = strata.map { case (n, p) => p.as(n) }
    val base = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        length(norm) > 0)
      .select(col(idCol).as("doc_id") +:
        explode(split(norm, " ")).as("w") +: flags: _*)
    base.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"),
        strata.map { case (n, _) => first(col(n)).as(n) }: _*)
  }

  /** Fit the two class-conditional models from a prepared, flagged
    * token-count frame — the shared core of [[score]] and [[fit]].
    */
  private def modelFrom(cnt: DataFrame): NbModel = {
    val byClass = cnt.groupBy(col("w"))
      .agg(sum(when(col("__pos"), col("c")).otherwise(lit(0L))).as("np"),
        sum(when(col("__neg"), col("c")).otherwise(lit(0L))).as("nn"))
      .filter(col("np") > 0 || col("nn") > 0) // training vocabulary only
    val tot = byClass.agg(
      coalesce(sum(col("np")), lit(0L)).as("npos"),
      coalesce(sum(col("nn")), lit(0L)).as("nneg"),
      count(lit(1)).as("v")).head()
    val (nPos, nNeg, v) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    require(nPos > 0, "positive training stratum is empty — no model to fit")
    require(nNeg > 0, "negative training stratum is empty — no model to fit")
    val worst = math.max(nPos, nNeg) + v
    require(worst < Long.MaxValue / SScale,
      s"training corpus too large for exact arithmetic (Npos=$nPos " +
        s"Nneg=$nNeg V=$v): SScale*(N+V) would overflow BIGINT — lower SScale")
    NbModel(OpCache.cache(byClass), nPos, nNeg, v)
  }

  /** Fit a frozen model on `docs`' labeled strata — the detachable half
    * of [[score]], for scorers that run elsewhere (the streaming gate).
    */
  def fit(docs: DataFrame, idCol: String, textCol: String,
          posPred: Column, negPred: Column): NbModel =
    modelFrom(OpCache.cache(tokenCounts(docs, idCol, textCol,
      Seq("__pos" -> posPred, "__neg" -> negPred))))

  /** Score a prepared token-count frame under a frozen model. */
  private def scoreCnt(m: NbModel, cnt: DataFrame,
                       broadcastCounts: Option[Boolean]): DataFrame = {
    // auto-routing (JoinRouting): the model table is EXACTLY v rows (the
    // training vocabulary — a scalar the fit already collected), sized
    // against the session's autoBroadcastJoinThreshold; the knob overrides
    val bc = JoinRouting.route(cnt.sparkSession, broadcastCounts, m.v)
    val model = bc(m.counts.select(col("w").as("__mw"),
      col("np").as("__np"), col("nn").as("__nn")))
    // out-of-vocabulary tokens carry count 0 in both classes — the add-one
    // numerator alone, the standard smoothed unseen-word treatment
    val sPos = expr(s"($SScale * (coalesce(__np, 0L) + 1)) DIV ${m.nPos + m.v}")
    val sNeg = expr(s"($SScale * (coalesce(__nn, 0L) + 1)) DIV ${m.nNeg + m.v}")
    val scored = cnt
      .join(model, col("w") === col("__mw"), "left")
      .select(col("doc_id"), col("c"), sPos.as("sp"), sNeg.as("sn"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tok"),
        sum(expr("c * sp")).as("pos_score"),
        sum(expr("c * sn")).as("neg_score"))
    // each score ≤ SScale·n_tok: the RScale product wraps only past
    // ~9·10⁹ tokens per doc (Long.MaxValue / (SScale·RScale)) — fail
    // loudly instead of silently (Dsir's guard)
    def perTok(scoreCol: String): Column =
      when(col(scoreCol) > lit(Long.MaxValue / RScale),
        raise_error(concat(
          lit(s"NbClassifier: $scoreCol * $RScale overflows BIGINT for doc_id "),
          col("doc_id").cast("string"),
          lit(" — lower SScale or split the document"))))
        .otherwise(expr(s"($scoreCol * $RScale) DIV n_tok"))
    scored.select(col("doc_id"), col("n_tok"), col("pos_score"),
      col("neg_score"),
      (col("pos_score") - col("neg_score")).as("margin"),
      (perTok("pos_score") - perTok("neg_score")).as("margin_per_tok"),
      (col("pos_score") > col("neg_score")).as("pred"))
  }

  /** Score ANY document frame under a FROZEN model — a pure per-doc
    * function of the model (one token-multiset agg + one broadcast
    * model join + one per-doc agg), so any batching of a corpus scores
    * identically to the single pass: the monoid contract the streaming
    * twin rides.
    */
  def scoreWith(m: NbModel, docs: DataFrame, idCol: String,
                textCol: String,
                broadcastCounts: Option[Boolean] = None): DataFrame =
    scoreCnt(m, tokenCounts(docs, idCol, textCol, Seq.empty), broadcastCounts)

  /** Fit on `docs`' labeled strata and score ONLY the documents whose
    * ids appear in `scoreIds` (single-column id frame) — from ONE shared
    * tokenization: the flagged (doc, w) count frame is built once,
    * cached, and serves BOTH the class-count fit and the survivor
    * scoring (the survivors' token counts are a doc-keyed semi-join of
    * the full frame — tokenization is per-document, so this is
    * value-identical to re-tokenizing the subset). This is the
    * [[NgramLm.contrastiveFlagged]] shared-gram-shuffle discipline
    * applied across fit/score: the funnel's classifier stage (q163)
    * previously tokenized the corpus twice — `fit` over ALL docs, then
    * `scoreWith` re-tokenizing the survivors — and the corpus-wide
    * tokenize+shuffle is the stage's dominant cost.
    */
  def fitAndScoreIds(docs: DataFrame, idCol: String, textCol: String,
                     posPred: Column, negPred: Column, scoreIds: DataFrame,
                     broadcastCounts: Option[Boolean] = None): DataFrame = {
    val cnt = OpCache.cache(tokenCounts(docs, idCol, textCol,
      Seq("__pos" -> posPred, "__neg" -> negPred)))
    val m = modelFrom(cnt)
    val ids = scoreIds.select(col(scoreIds.columns.head).as("doc_id"))
    scoreCnt(m, cnt.join(ids, Seq("doc_id"), "left_semi"), broadcastCounts)
  }

  /** Score every document under both class models:
    * (doc_id, n_tok, pos_score, neg_score, margin, margin_per_tok,
    * pred). `posPred`/`negPred` mark the training strata (rows of
    * `docs`); rows matching neither train nothing but are still
    * scored — the classifier generalizes from seed labels, which is
    * the entire point of the fastText curation pattern. A row matching
    * BOTH trains both classes (the caller's label noise to own).
    * ONE token-multiset shuffle serves training AND scoring (the frame
    * is cached with its flags).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            posPred: Column, negPred: Column,
            broadcastCounts: Option[Boolean] = None): DataFrame = {
    val cnt = OpCache.cache(tokenCounts(docs, idCol, textCol,
      Seq("__pos" -> posPred, "__neg" -> negPred)))
    scoreCnt(modelFrom(cnt), cnt, broadcastCounts)
  }

  /** Survivors only — the filter a curation pipeline composes. */
  def select(docs: DataFrame, idCol: String, textCol: String,
             posPred: Column, negPred: Column): DataFrame =
    score(docs, idCol, textCol, posPred, negPred)
      .filter(col("pred"))
      .drop("pred")
}
