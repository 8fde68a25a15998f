package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.dedup.TextShingles

/** Gopher-style corpus QUALITY RULES (Rae et al. 2021, "Scaling Language
  * Models: ... Gopher", appendix A1.1/A1.2 — the production document-filter
  * discipline C4/MassiveText-class builds apply, distinct from
  * [[TextFns.qualityScore]]'s single blended score: each rule is a named
  * boolean with its measured statistic, so a curation run can report WHY a
  * document fell and tune thresholds per-rule).
  *
  * Implemented rule set (the subset whose statistics are exactly
  * replayable from the normalized text; thresholds are the paper's):
  *  - `n_words` in [MinWords, MaxWords]          (A1.1: 50..100k)
  *  - `mean_word_len` in [MinMeanLen, MaxMeanLen] (A1.1: 3..10)
  *  - `symbol_ratio` ≤ MaxSymbolRatio             (A1.1: '#'/'...' per word ≤ 0.1)
  *  - `alpha_frac` ≥ MinAlphaFrac                 (A1.1: ≥80% words have a letter)
  *  - `n_stops` ≥ MinStops                        (A1.1: ≥2 of 8 designated stop words)
  *  - `top_bigram_frac` ≤ MaxTopBigramFrac        (A1.2: most-frequent 2-gram ≤ 20%)
  * Line-grain rules (A1.1's bullet/ellipsis line fractions, A1.2's
  * duplicate-line and duplicate-paragraph fractions) are [[lineReport]]:
  * they take a caller-built lines array (the corpus is newline-free, so
  * line construction is the gate's tokenizer concern — the q109
  * discipline) and measure each statistic per document.
  *
  * All statistics derive from ONE normalization (lower, collapse
  * whitespace, trim — [[TextFns.normalizeText]], the corpus-wide
  * convention every oracle replays); tokens are its single-space splits.
  * Scale shape: pure per-row projections — no shuffle, no state; the
  * array lambdas are interpreted (not codegen) but document-bounded, and
  * the whole frame stays one narrow scan. [[TextFns.qualityScore]] is
  * the codegen'd cheap pass; this is the audit-grade rule set.
  */
object QualityRules {
  val MinWords = 50L
  val MaxWords = 100000L
  val MinMeanLen = 3.0
  val MaxMeanLen = 10.0
  val MaxSymbolRatio = 0.1
  val MinAlphaFrac = 0.8
  val MinStops = 2L
  val MaxTopBigramFrac = 0.2

  /** The paper's 8 designated stop words (A1.1). */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Tunable rule thresholds, defaulting to the paper's. Production runs
    * tune per-corpus (the paper's own appendix notes the rules were
    * hand-fit to MassiveText); the q127 gate passes minStops = 1 because
    * the synthetic corpus's vocabulary carries only one of the eight
    * designated stop words — with the paper default the `passed` column
    * would be constant-false and the gate degenerate.
    */
  final case class Thresholds(minWords: Long = MinWords,
                              maxWords: Long = MaxWords,
                              minMeanLen: Double = MinMeanLen,
                              maxMeanLen: Double = MaxMeanLen,
                              maxSymbolRatio: Double = MaxSymbolRatio,
                              minAlphaFrac: Double = MinAlphaFrac,
                              minStops: Long = MinStops,
                              maxTopBigramFrac: Double = MaxTopBigramFrac)

  /** Per-document rule report: one row per non-null-text doc —
    * (idCol, n_words, mean_word_len, symbol_ratio, alpha_frac, n_stops,
    * top_bigram_frac, passed). Statistics are integer-derived doubles
    * (single divisions of exact counts), so both engines compute them
    * bit-identically.
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
             th: Thresholds = Thresholds()): DataFrame = {
    val norm = TextFns.normalizeText(col(textCol))
    val out = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .withColumn("__norm", norm)
      .filter(length(col("__norm")) > 0)
      .withColumn("__w", split(col("__norm"), " "))
      .withColumn("n_words", size(col("__w")).cast("long"))
      // mean word length = non-space chars / words: exact ints, one division
      .withColumn("mean_word_len",
        (length(col("__norm")) - (col("n_words") - 1)).cast("double") /
          col("n_words"))
      // '#' occurrences + '...' occurrences (counted like the paper:
      // symbol hits per word)
      .withColumn("symbol_ratio",
        ((length(col("__norm")) -
            length(regexp_replace(col("__norm"), "#", ""))) +
          (length(col("__norm")) -
            length(regexp_replace(col("__norm"), "\\.\\.\\.", ""))) / 3)
          .cast("double") / col("n_words"))
      .withColumn("alpha_frac",
        size(filter(col("__w"), w => w.rlike("[a-z]"))).cast("double") /
          col("n_words"))
      .withColumn("n_stops",
        size(array_intersect(array_distinct(col("__w")),
          array(StopWords.map(lit): _*))).cast("long"))
      // ordered non-distinct word-2-grams; a 1-token doc hashes the whole
      // text to ONE pseudo-bigram (frac 1.0 — it fails n_words anyway)
      .withColumn("__bg", TextShingles.shingleHashesAll(col(textCol), 2))
      .withColumn("top_bigram_frac",
        array_max(transform(array_distinct(col("__bg")),
          h => size(filter(col("__bg"), x => x === h)))).cast("double") /
          size(col("__bg")))
    out.select(col(idCol), col("n_words"), col("mean_word_len"),
        col("symbol_ratio"), col("alpha_frac"), col("n_stops"),
        col("top_bigram_frac"),
        (col("n_words").between(th.minWords, th.maxWords) &&
          col("mean_word_len").between(th.minMeanLen, th.maxMeanLen) &&
          col("symbol_ratio") <= th.maxSymbolRatio &&
          col("alpha_frac") >= th.minAlphaFrac &&
          col("n_stops") >= th.minStops &&
          col("top_bigram_frac") <= th.maxTopBigramFrac).as("passed"))
  }

  // -----------------------------------------------------------------------
  // Line-grain rules (Rae et al. 2021 A1.1 bullet/ellipsis lines, A1.2
  // duplicate lines/paragraphs)
  // -----------------------------------------------------------------------

  /** The paper's line-grain thresholds: fail a document whose lines are
    * > 90% bullet-started or > 30% ellipsis-ended (A1.1), or whose
    * duplicate-line / duplicate-paragraph fraction exceeds 30% (A1.2).
    * Like [[Thresholds]], production tunes per corpus; the q127 gate
    * passes tighter values so both polarities occur on the synthetic
    * decorated lines.
    */
  final case class LineThresholds(maxBulletFrac: Double = 0.9,
                                  maxEllipsisFrac: Double = 0.3,
                                  maxDupLineFrac: Double = 0.3,
                                  maxDupParaFrac: Double = 0.3)

  /** Bullet markers counted by the A1.1 rule. */
  val BulletPrefixes: Seq[String] = Seq("- ", "* ", "• ")

  /** Per-document LINE-GRAIN rule report over `docs(idCol, linesCol:
    * array<string>)`: (idCol, n_lines, bullet_line_frac,
    * ellipsis_line_frac, dup_line_frac, dup_para_frac, passed_lines).
    * Paragraphs are consecutive non-overlapping line PAIRS (odd tail line
    * = its own paragraph) — the synthesized-grain analog of the paper's
    * blank-line paragraph splits, chosen because it is exactly replayable
    * from the same lines array in any engine. Duplicate fractions are
    * (n − n_distinct) / n. All statistics are single divisions of exact
    * counts; pure per-row array work, document-bounded, zero shuffles.
    */
  def lineReport(docs: DataFrame, idCol: String, linesCol: String,
                 th: LineThresholds = LineThresholds()): DataFrame = {
    val isBullet = (l: Column) => BulletPrefixes
      .map(p => l.startsWith(p)).reduce(_ || _)
    docs
      .filter(col(idCol).isNotNull && col(linesCol).isNotNull)
      .filter(size(col(linesCol)) > 0)
      .withColumn("n_lines", size(col(linesCol)).cast("long"))
      .withColumn("__paras", transform(
        sequence(lit(1), ((size(col(linesCol)) + 1) / 2).cast("int")),
        j => when(j * 2 <= size(col(linesCol)),
          concat(element_at(col(linesCol), (j * 2 - 1).cast("int")),
            lit("\n"), element_at(col(linesCol), (j * 2).cast("int"))))
          .otherwise(element_at(col(linesCol), (j * 2 - 1).cast("int")))))
      .withColumn("bullet_line_frac",
        size(filter(col(linesCol), isBullet)).cast("double") / col("n_lines"))
      .withColumn("ellipsis_line_frac",
        size(filter(col(linesCol), l => l.endsWith("...")))
          .cast("double") / col("n_lines"))
      .withColumn("dup_line_frac",
        (col("n_lines") - size(array_distinct(col(linesCol))))
          .cast("double") / col("n_lines"))
      .withColumn("dup_para_frac",
        (size(col("__paras")) - size(array_distinct(col("__paras"))))
          .cast("double") / size(col("__paras")))
      .select(col(idCol), col("n_lines"), col("bullet_line_frac"),
        col("ellipsis_line_frac"), col("dup_line_frac"), col("dup_para_frac"),
        (col("bullet_line_frac") <= th.maxBulletFrac &&
          col("ellipsis_line_frac") <= th.maxEllipsisFrac &&
          col("dup_line_frac") <= th.maxDupLineFrac &&
          col("dup_para_frac") <= th.maxDupParaFrac).as("passed_lines"))
  }
}
