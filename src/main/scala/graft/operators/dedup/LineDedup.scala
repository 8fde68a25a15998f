package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4-style corpus LINE cleaning (Raffel et al. 2020 §2.2's "we removed
  * any line that appeared more than …" / RefinedWeb's line-dedup pass),
  * the intra-document + cross-corpus complement of the document-level
  * dedup family: a training corpus's worst repetition usually lives in
  * boilerplate LINES (nav bars, cookie banners, license headers) that
  * document-level near-dup never catches because the surrounding text
  * differs.
  *
  * Two passes over a line-grain frame, both defined exactly:
  *   1. per-document first-occurrence dedup — a repeated line keeps only
  *      its earliest position (order-preserving);
  *   2. corpus boilerplate removal — lines whose DOCUMENT frequency
  *      (distinct docs containing the line, after pass 1) exceeds
  *      `maxDocFreq` are dropped everywhere.
  * Documents whose every line drops disappear from the output (the C4
  * empty-doc rule).
  *
  * Scale shape: explode to line grain; pass 1 is a MIN-position
  * aggregate keyed (doc, line) — partial-combines map-side, no sort;
  * pass 2 is a count aggregate on the line (map-side partial combine
  * absorbs boilerplate skew) and a shuffle join back; reassembly is one
  * shuffle on the doc id with an in-row sort. Nothing is ever
  * corpus-quadratic. For corpora where lines are long, substitute the
  * [[graft.plans.ShingleHash]] of the line as the frequency join key to
  * keep shuffle rows narrow.
  */
object LineDedup {

  /** `docs(idCol, linesCol: array<string>)` → (idCol, clean_text,
    * n_lines, n_kept): cleaned text re-joined with '\n', raw and kept
    * line counts. Line construction (splitting, normalization) is the
    * caller's tokenizer concern.
    */
  def clean(docs: DataFrame, idCol: String, linesCol: String,
            maxDocFreq: Long): DataFrame = {
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    // null lines carry no content: excluded up front AND excluded from
    // n_lines, as a stated contract — letting them ride would instead
    // drop them SILENTLY at the frequency join (null keys never match),
    // leaving n_lines > n_kept with no dropped boilerplate to blame
    val nonNull = filter(col(linesCol), x => x.isNotNull)
    val raw = docs.select(col(idCol), nonNull.as(linesCol),
      size(nonNull).cast("long").as("n_lines"))
    val lines = raw.select(col(idCol), col("n_lines"),
      posexplode(col(linesCol)).as(Seq("__lpos", "__line")))
    // pass 1: earliest occurrence per (doc, line) — a MIN aggregate, not a
    // row_number window: the aggregate partial-combines map-side (a doc's
    // repeated lines collapse before the shuffle) and never sorts, where
    // the window formulation would sort every line of the hottest doc
    val firstOcc = lines.groupBy(col(idCol), col("__line"))
      .agg(min(col("__lpos")).as("__lpos"),
        first(col("n_lines")).as("n_lines"))
    // pass 2: document frequency (firstOcc is already distinct per doc)
    val dfreq = firstOcc.groupBy(col("__line"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select(col("__line"))
    val kept = firstOcc.join(dfreq, "__line")
    kept.groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__lpos"), col("__line")))),
            x => x.getField("__line")),
          "\n").as("clean_text"),
        first(col("n_lines")).as("n_lines"),
        count(lit(1)).as("n_kept"))
  }

  /** [[clean]] with the boilerplate threshold expressed as PERMILLE of the
    * corpus document count ("drop lines present in > 3.5% of documents" →
    * permille = 35) — the form that survives corpus growth. The document
    * count is one bounded aggregate; the derived absolute threshold is
    * exact integer arithmetic, replayable by any engine.
    */
  def cleanRelative(docs: DataFrame, idCol: String, linesCol: String,
                    permilleOfDocs: Int): DataFrame = {
    require(permilleOfDocs >= 1 && permilleOfDocs <= 1000,
      s"permille out of range: $permilleOfDocs")
    val nDocs = docs.select(col(idCol)).distinct().count()
    clean(docs, idCol, linesCol,
      math.max(nDocs * permilleOfDocs / 1000L, 1L))
  }
}
