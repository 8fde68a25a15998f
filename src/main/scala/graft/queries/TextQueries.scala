package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Text-analysis queries over the documents table (SURVEY §2 items 37-40). */
object TextQueries {

  /** q26: marker-word language ID with deterministic argmax. */
  def q26LangId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val markerCols = TextFns.LangMarkers.map { case (l, p) =>
      when(col("text").isNull, 0)
        .otherwise(size(regexp_extract_all(lower(col("text")), lit(p), lit(0))))
        .as(s"c_$l")
    }
    d.select(Seq(col("doc_id"), col("lang").as("source_lang"),
      TextFns.languageId(col("text")).as("predicted_lang")) ++ markerCols: _*)
  }

  /** Gate thresholds: paper defaults except minStops=1 (see
    * [[graft.functions.QualityRules.Thresholds]]) so both polarities of
    * `passed` occur on the synthetic corpus (251/500 pass at sf0.01).
    */
  private[queries] val Q127Th = graft.functions.QualityRules.Thresholds(minStops = 1)

  /** q127's line-grain thresholds: tightened from the paper defaults
    * (0.9/0.3/0.3/0.3) so both polarities occur on the decorated-line
    * corpus — the same knob-for-polarity precedent as minStops above.
    */
  private[queries] val Q127LineTh = graft.functions.QualityRules
    .LineThresholds(maxBulletFrac = 0.25, maxEllipsisFrac = 0.25,
      maxDupLineFrac = 0.2, maxDupParaFrac = 0.15)

  /** q127's LINE corpus: deterministic token-bigram lines (the q109
    * synthesis — the raw corpus is newline-free) with three DECORATIONS,
    * replayed verbatim by the oracle, that give every line rule a live
    * distribution: (a) every doc with doc_id % 4 = 0 repeats a fixed
    * bullet-started, ellipsis-ended boilerplate PARAGRAPH (two fixed
    * lines) at every third paragraph slot — the nav-bar/cookie-banner
    * shape A1.2 exists to catch; (b) sparse bullet prefixes at
    * (doc_id + lpos) % 7 = 0; (c) sparse ellipsis suffixes at
    * (doc_id + lpos) % 5 = 1.
    */
  private def q127Lines(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .withColumn("__toks", split(col("text"), " "))
      .withColumn("lines", expr(
        """transform(sequence(1, (size(__toks) + 1) div 2), i ->
          |  CASE WHEN doc_id % 4 = 0 AND ((i + 1) div 2) % 3 = 0 THEN
          |         CASE WHEN i % 2 = 1 THEN '- nav home ...'
          |              ELSE '- nav about ...' END
          |       WHEN (doc_id + i) % 7 = 0 THEN concat('- ',
          |         CASE WHEN 2 * i <= size(__toks)
          |              THEN concat(element_at(__toks, CAST(2 * i - 1 AS INT)), ' ',
          |                          element_at(__toks, CAST(2 * i AS INT)))
          |              ELSE element_at(__toks, CAST(2 * i - 1 AS INT)) END)
          |       WHEN (doc_id + i) % 5 = 1 THEN concat(
          |         CASE WHEN 2 * i <= size(__toks)
          |              THEN concat(element_at(__toks, CAST(2 * i - 1 AS INT)), ' ',
          |                          element_at(__toks, CAST(2 * i AS INT)))
          |              ELSE element_at(__toks, CAST(2 * i - 1 AS INT)) END, ' ...')
          |       ELSE CASE WHEN 2 * i <= size(__toks)
          |              THEN concat(element_at(__toks, CAST(2 * i - 1 AS INT)), ' ',
          |                          element_at(__toks, CAST(2 * i AS INT)))
          |              ELSE element_at(__toks, CAST(2 * i - 1 AS INT)) END
          |  END)""".stripMargin))
      .select(col("doc_id"), col("lines"))

  /** q127: Gopher-style quality RULES ([[graft.functions.QualityRules]] —
    * the per-rule production filter discipline, Rae et al. 2021 A1.1/A1.2,
    * vs q27's single blended score): the six text-grain rules joined with
    * the four LINE-grain rules ([[graft.functions.QualityRules.lineReport]]
    * over the decorated bigram lines). The oracle recomputes every
    * statistic with the identical arithmetic: exact counts, single
    * divisions, the n=2 ShingleHash pipeline for the top-bigram fraction,
    * and the same line/paragraph constructions.
    */
  def q127QualityRules(spark: SparkSession, dir: String): DataFrame = {
    val text = graft.functions.QualityRules.report(
      Tables.documents(spark, dir), "doc_id", "text", Q127Th)
    val lines = graft.functions.QualityRules.lineReport(
      q127Lines(spark, dir), "doc_id", "lines", Q127LineTh)
    text.join(lines, Seq("doc_id"))
  }

  /** CTE chain (for a WITH list) replaying
    * [[graft.functions.QualityRules.report]] over an arbitrary
    * (doc_id, text) subquery, ending in `qrstats(doc_id, n_words,
    * mean_word_len, symbol_ratio, alpha_frac, n_stops, top_bigram_frac,
    * passed)`. CTE names are qr-prefixed so composed oracles (q130) can
    * splice it after their own chains. Shared by q127 (raw documents)
    * and q130 (span-cleaned text) — the composed replay is
    * definitionally the per-stage replay.
    */
  private[queries] def qualityCtes(
      docSql: String, th: graft.functions.QualityRules.Thresholds): String = {
    val stops = graft.functions.QualityRules.StopWords
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""qrd AS (
       |  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
       |  FROM ($docSql) WHERE doc_id IS NOT NULL AND text IS NOT NULL
       |), qrt AS (
       |  SELECT doc_id, norm, string_split(norm, ' ') AS w
       |  FROM qrd WHERE length(norm) > 0
       |), qrbg AS (
       |  SELECT doc_id, CASE WHEN len(w) >= 2
       |    THEN list_transform(range(len(w)-1),
       |      i -> CAST('0x' || substr(md5(w[i+1] || ' ' || w[i+2]), 1, 8) AS BIGINT) % 2147483647)
       |    ELSE [CAST('0x' || substr(md5(norm), 1, 8) AS BIGINT) % 2147483647]
       |    END AS h
       |  FROM qrt
       |), qrstats AS (
       |  SELECT t.doc_id,
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(length(norm) - (len(w) - 1) AS DOUBLE) / len(w) AS mean_word_len,
       |    ((length(norm) - length(replace(norm, '#', '')))
       |      + (length(norm) - length(regexp_replace(norm, '\\.\\.\\.', '', 'g'))) / 3)
       |      / len(w) AS symbol_ratio,
       |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(w) AS alpha_frac,
       |    CAST(len(list_intersect(list_distinct(w), $stops)) AS BIGINT) AS n_stops,
       |    CAST(list_max(list_transform(list_distinct(b.h),
       |      g -> len(list_filter(b.h, x -> x = g)))) AS DOUBLE) / len(b.h) AS top_bigram_frac
       |  FROM qrt t JOIN qrbg b USING (doc_id)
       |)""".stripMargin
  }

  private[queries] def qualityPassedSql(
      th: graft.functions.QualityRules.Thresholds): String =
    s"""(n_words BETWEEN ${th.minWords} AND ${th.maxWords}
       |    AND mean_word_len BETWEEN ${th.minMeanLen} AND ${th.maxMeanLen}
       |    AND symbol_ratio <= ${th.maxSymbolRatio}
       |    AND alpha_frac >= ${th.minAlphaFrac}
       |    AND n_stops >= ${th.minStops}
       |    AND top_bigram_frac <= ${th.maxTopBigramFrac})""".stripMargin

  /** CTE chain replaying [[q127Lines]] + [[graft.functions.QualityRules
    * .lineReport]] over (doc_id, text) from `docSql`, ending in
    * `qlstats(doc_id, n_lines, bullet_line_frac, ellipsis_line_frac,
    * dup_line_frac, dup_para_frac)`.
    */
  private[queries] def lineCtes(docSql: String): String = {
    val bigram = "CASE WHEN 2*i <= len(w) THEN w[2*i-1] || ' ' || w[2*i] " +
      "ELSE w[2*i-1] END"
    s"""qld AS (
       |  SELECT doc_id, string_split(text, ' ') AS w
       |  FROM ($docSql) WHERE doc_id IS NOT NULL AND text IS NOT NULL
       |), qll AS (
       |  SELECT doc_id, list_transform(range(1, (len(w) + 1) // 2 + 1, 1), i ->
       |    CASE WHEN doc_id % 4 = 0 AND ((i + 1) // 2) % 3 = 0 THEN
       |           CASE WHEN i % 2 = 1 THEN '- nav home ...'
       |                ELSE '- nav about ...' END
       |         WHEN (doc_id + i) % 7 = 0 THEN '- ' || $bigram
       |         WHEN (doc_id + i) % 5 = 1 THEN $bigram || ' ...'
       |         ELSE $bigram
       |    END) AS ls
       |  FROM qld
       |), qlp AS (
       |  SELECT doc_id, ls, list_transform(range(1, (len(ls) + 1) // 2 + 1, 1), j ->
       |    CASE WHEN 2*j <= len(ls) THEN ls[2*j-1] || chr(10) || ls[2*j]
       |         ELSE ls[2*j-1] END) AS ps
       |  FROM qll WHERE len(ls) > 0
       |), qlstats AS (
       |  SELECT doc_id,
       |    CAST(len(ls) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(ls, x -> starts_with(x, '- ')
       |      OR starts_with(x, '* ') OR starts_with(x, '• '))) AS DOUBLE)
       |      / len(ls) AS bullet_line_frac,
       |    CAST(len(list_filter(ls, x -> ends_with(x, '...'))) AS DOUBLE)
       |      / len(ls) AS ellipsis_line_frac,
       |    CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE)
       |      / len(ls) AS dup_line_frac,
       |    CAST(len(ps) - len(list_distinct(ps)) AS DOUBLE)
       |      / len(ps) AS dup_para_frac
       |  FROM qlp
       |)""".stripMargin
  }

  def q127Oracle: String = {
    val lt = Q127LineTh
    s"""WITH ${qualityCtes("SELECT doc_id, text FROM documents", Q127Th)},
       |${lineCtes("SELECT doc_id, text FROM documents")}
       |SELECT t.doc_id, t.n_words, t.mean_word_len, t.symbol_ratio,
       |  t.alpha_frac, t.n_stops, t.top_bigram_frac,
       |  ${qualityPassedSql(Q127Th)} AS passed,
       |  l.n_lines, l.bullet_line_frac, l.ellipsis_line_frac,
       |  l.dup_line_frac, l.dup_para_frac,
       |  (l.bullet_line_frac <= ${lt.maxBulletFrac}
       |    AND l.ellipsis_line_frac <= ${lt.maxEllipsisFrac}
       |    AND l.dup_line_frac <= ${lt.maxDupLineFrac}
       |    AND l.dup_para_frac <= ${lt.maxDupParaFrac}) AS passed_lines
       |FROM qrstats t JOIN qlstats l ON l.doc_id = t.doc_id""".stripMargin
  }

  def q26Oracle: String =
    """WITH m AS (
      |  SELECT doc_id, lang AS source_lang,
      |    CAST(len(regexp_extract_all(lower(COALESCE(text, '')), '\b(the|and|of|to|a|in)\b')) AS INTEGER) AS c_en,
      |    CAST(len(regexp_extract_all(lower(COALESCE(text, '')), '\b(der|die|und|das|nicht)\b')) AS INTEGER) AS c_de,
      |    CAST(len(regexp_extract_all(lower(COALESCE(text, '')), '\b(el|la|los|que|es)\b')) AS INTEGER) AS c_es,
      |    CAST(len(regexp_extract_all(lower(COALESCE(text, '')), '\b(le|les|des|est|une)\b')) AS INTEGER) AS c_fr,
      |    CAST(len(regexp_extract_all(lower(COALESCE(text, '')), '[一-鿿]')) AS INTEGER) AS c_zh
      |  FROM documents
      |)
      |SELECT doc_id, source_lang,
      |  CASE WHEN greatest(c_en, c_de, c_es, c_fr, c_zh) <= 0 THEN 'unknown'
      |       WHEN c_en = greatest(c_en, c_de, c_es, c_fr, c_zh) THEN 'en'
      |       WHEN c_de = greatest(c_en, c_de, c_es, c_fr, c_zh) THEN 'de'
      |       WHEN c_es = greatest(c_en, c_de, c_es, c_fr, c_zh) THEN 'es'
      |       WHEN c_fr = greatest(c_en, c_de, c_es, c_fr, c_zh) THEN 'fr'
      |       WHEN c_zh = greatest(c_en, c_de, c_es, c_fr, c_zh) THEN 'zh'
      |       ELSE 'unknown' END AS predicted_lang,
      |  c_en, c_de, c_es, c_fr, c_zh
      |FROM m""".stripMargin

  /** q27: heuristic quality scoring (length/punct/stopword ratios). */
  def q27QualityScore(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"),
      TextFns.tokenCountWs(col("text")).as("n_tokens"),
      TextFns.alphaRatio(col("text")).as("alpha_ratio"),
      TextFns.stopwordRatio(col("text")).as("stopword_ratio"),
      TextFns.qualityScore(col("text")).as("quality_score"))
  }

  def q27Oracle: String =
    """WITH base AS (
      |  SELECT doc_id, text,
      |    CASE WHEN text IS NULL OR trim(text) = '' THEN 0
      |         ELSE CAST(len(regexp_extract_all(trim(text), '\S+')) AS INTEGER) END AS n_tokens,
      |    CASE WHEN text IS NULL OR length(text) = 0 THEN 0.0
      |         ELSE CAST(len(regexp_extract_all(lower(text), '[a-z]')) AS DOUBLE) / length(text) END AS alpha_ratio,
      |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS INTEGER) AS n_stops
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, n_tokens, alpha_ratio,
      |    CASE WHEN n_tokens = 0 THEN 0.0 ELSE LEAST(1.0, CAST(n_stops AS DOUBLE) / n_tokens) END AS stopword_ratio
      |  FROM base
      |)
      |SELECT doc_id, n_tokens, alpha_ratio, stopword_ratio,
      |  0.4 * alpha_ratio + 0.3 * stopword_ratio + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) AS quality_score
      |FROM r""".stripMargin

  /** q28: token counting — whitespace and BPE-ish regex. */
  def q28TokenCount(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"), col("n_chars"),
      TextFns.tokenCountWs(col("text")).as("ws_tokens"),
      TextFns.tokenCountBpe(col("text")).as("bpe_tokens"),
      length(col("text")).as("measured_chars"))
  }

  def q28Oracle: String =
    """SELECT doc_id, n_chars,
      |  CASE WHEN text IS NULL OR trim(text) = '' THEN 0
      |       ELSE CAST(len(regexp_extract_all(trim(text), '\S+')) AS INTEGER) END AS ws_tokens,
      |  CAST(len(regexp_extract_all(COALESCE(text, ''), '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INTEGER) AS bpe_tokens,
      |  CAST(length(text) AS INTEGER) AS measured_chars
      |FROM documents""".stripMargin

  /** q29: document fingerprinting — md5 of normalized text + duplicate
    * group size per fingerprint (the exact-dedup key).
    */
  def q29Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val fp = d.select(col("doc_id"),
      TextFns.fingerprint(col("text")).as("fingerprint"),
      length(TextFns.normalizeText(col("text"))).as("n_norm_chars"))
    fp.withColumn("dup_group_size",
      count(lit(1)).over(Window.partitionBy(col("fingerprint"))))
  }

  def q29Oracle: String =
    """WITH fp AS (
      |  SELECT doc_id,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
      |    CAST(length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS INTEGER) AS n_norm_chars
      |  FROM documents
      |)
      |SELECT doc_id, fingerprint, n_norm_chars,
      |  COUNT(*) OVER (PARTITION BY fingerprint) AS dup_group_size
      |FROM fp""".stripMargin

  /** q53: within-document repetition — duplicate 3-gram ratio, the
    * Gopher/RefinedWeb-style quality signal that catches boilerplate loops
    * and degenerate generations. Ordered NON-distinct shingle hashes
    * (every occurrence counts) vs their distinct set; ratio 0 = no repeats.
    * Zero-shuffle narrow per-row work after the parallelizing repartition.
    */
  def q53Repetition(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.dedup.TextShingles
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .repartition(col("doc_id"))
      .select(col("doc_id"), TextShingles.shingleHashesAll(col("text")).as("hs"))
      .select(col("doc_id"),
        size(col("hs")).as("n_ngrams"),
        size(array_distinct(col("hs"))).as("n_distinct_ngrams"))
      .withColumn("dup_ngram_ratio",
        lit(1.0d) - col("n_distinct_ngrams").cast("double") / col("n_ngrams"))
  }

  def q53Oracle: String =
    """WITH docs AS (
      |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
      |  FROM documents WHERE text IS NOT NULL
      |), toks AS (
      |  SELECT doc_id, norm, string_split(norm, ' ') AS t FROM docs
      |), sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 3
      |    THEN list_transform(range(len(t)-2), i -> array_to_string(t[i+1:i+3], ' '))
      |    ELSE [norm] END AS shingles
      |  FROM toks
      |), hl AS (
      |  SELECT doc_id, list_transform(shingles,
      |    s -> CAST('0x' || substr(md5(s),1,8) AS BIGINT) % 2147483647) AS hashes
      |  FROM sh
      |)
      |SELECT doc_id,
      |  CAST(len(hashes) AS INTEGER) AS n_ngrams,
      |  CAST(len(list_distinct(hashes)) AS INTEGER) AS n_distinct_ngrams,
      |  1.0 - CAST(len(list_distinct(hashes)) AS DOUBLE) / len(hashes) AS dup_ngram_ratio
      |FROM hl""".stripMargin

  /** q54: TF-IDF head terms — top 3 per document by a RATIONAL idf
    * (tf·N/df): ln() is libm-dependent and would break bitwise cross-engine
    * agreement, while int-valued doubles multiply/divide exactly. Partial-
    * agg term counts, broadcast scalar corpus size, per-doc window (bounded
    * by the doc's vocabulary — never a global sort).
    */
  def q54TfIdf(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val terms = d.repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(split(TextFns.normalizeText(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df_docs"))
    val n = d.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term").join(broadcast(n), lit(true))
      .withColumn("score",
        (col("tf").cast("double") * col("n_docs").cast("double"))
          / col("df_docs").cast("double"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term").asc)))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df_docs"),
        col("score"), col("rank"))
  }

  def q54Oracle: String =
    """WITH terms AS (
      |  SELECT doc_id, term FROM (
      |    SELECT doc_id,
      |      unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
      |    FROM documents WHERE text IS NOT NULL
      |  ) WHERE len(term) > 0
      |), tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2
      |), dfreq AS (
      |  SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY 1
      |), n AS (
      |  SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL
      |), scored AS (
      |  SELECT doc_id, term, tf, df_docs,
      |    (CAST(tf AS DOUBLE) * CAST(n_docs AS DOUBLE)) / CAST(df_docs AS DOUBLE) AS score
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
      |)
      |SELECT doc_id, term, tf, df_docs, score, rank FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
      |    ORDER BY score DESC, term ASC) AS INTEGER) AS rank
      |  FROM scored
      |) WHERE rank <= 3""".stripMargin

  /** q84: inverted-index postings — one row per term: document frequency
    * and the first 20 doc ids of the sorted posting list (emitted as a
    * '-'-joined string, the exact representation both engines can build).
    * The (term, doc) distinct is a partial-agg shuffle on the term; the
    * posting-list cap bounds every output row, the standard guard against
    * stopword-grade terms exploding a row (at full corpus scale the cap
    * is what keeps the index frame navigable).
    */
  def q84Postings(spark: SparkSession, dir: String): DataFrame = {
    val termDocs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(TextFns.normalizeText(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    termDocs.groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq"),
        array_join(
          slice(transform(sort_array(collect_set(col("doc_id"))),
            _.cast("string")), 1, 20), "-").as("postings_head"))
  }

  /** q94: overlapping token-window chunking ([[TextFns.chunked]]) — 32-
    * token windows every 24 tokens (8 overlap), one row per chunk. The
    * RAG/pre-training splitter as pure per-row array expressions; the
    * oracle rebuilds the identical windows with DuckDB list slicing.
    */
  def q94Chunks(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(TextFns.chunked(col("text"), sizeTokens = 32, overlap = 8)).as("c"))
      .select(col("doc_id"), col("c.chunk_no").cast("int").as("chunk_no"),
        col("c.chunk_text"), col("c.n_tokens").cast("int").as("n_tokens"))

  def q94Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
      |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
      |  FROM documents WHERE text IS NOT NULL
      |), starts AS (
      |  SELECT doc_id, t, unnest(range(0, GREATEST(len(t) - 1, 0) + 1, 24)) AS s
      |  FROM toks WHERE len(norm) > 0
      |)
      |SELECT doc_id, CAST(s // 24 AS INTEGER) AS chunk_no,
      |  array_to_string(t[s + 1 : s + 32], ' ') AS chunk_text,
      |  CAST(LEAST(len(t) - s, 32) AS INTEGER) AS n_tokens
      |FROM starts
      |WHERE s = 0 OR s < len(t) - 8""".stripMargin

  /** q132's literal query set: terms drawn from the synthetic vocabulary
    * (df 380-400 of 500 docs at sf0.01 — every query matches both many
    * and partially-matching docs, so the pivot, the missing-term zero,
    * and the tie-broken top-k all carry weight). The oracle repeats the
    * set verbatim.
    */
  val Bm25Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("spark", "join"),
    2 -> Seq("hash", "merge", "sort"),
    3 -> Seq("stream", "window"))
  val Bm25TopK = 10

  /** q132: BM25 ranking ([[graft.operators.Bm25]] — the retrieval scorer
    * on top of q54's term statistics and q84's postings): top-10 docs per
    * literal query, rational ln-free idf, k1/b at the Okapi defaults. The
    * oracle replays document lengths, avgdl, tf, df, every per-term
    * contribution in pinned evaluation order, the explicit left-to-right
    * term sum, and the (score DESC, doc_id ASC) top-k.
    */
  def q132Bm25(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Bm25.rank(Tables.documents(spark, dir), "doc_id", "text",
      Bm25Queries, Bm25TopK)

  def q132Oracle: String = {
    import graft.operators.Bm25.{B, K1}
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    val allTerms = Bm25Queries.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString(", ")
    val perQuery = Bm25Queries.map { case (qid, ts) =>
      val slot = (t: String) => s"max(CASE WHEN term = '$t' THEN c END)"
      val matched = ts.map(t => s"CASE WHEN ${slot(t)} IS NULL THEN 0 ELSE 1 END")
        .mkString(" + ")
      val score = ts.map(t => s"COALESCE(${slot(t)}, 0.0)").mkString(" + ")
      s"""SELECT $qid AS query_id, doc_id,
         |    CAST($matched AS INTEGER) AS n_terms_matched,
         |    $score AS score
         |  FROM contrib WHERE term IN (${ts.map(t => s"'$t'").mkString(", ")})
         |  GROUP BY doc_id""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH base AS (
       |  SELECT doc_id, string_split($norm, ' ') AS w
       |  FROM documents
       |  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND length($norm) > 0
       |), dl AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM base
       |), stats AS (
       |  SELECT COUNT(*) AS n,
       |    CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
       |  FROM dl
       |), tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(w) AS term FROM base) GROUP BY 1, 2
       |), dfreq AS (
       |  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
       |), contrib AS (
       |  SELECT t.doc_id, t.term,
       |    ((CAST(s.n - f.df AS DOUBLE) + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))
       |      * ((CAST(t.tf AS DOUBLE) * ${K1 + 1.0}) /
       |         (CAST(t.tf AS DOUBLE) + $K1 * (${1.0 - B} + $B *
       |          (CAST(d.dl AS DOUBLE) / s.avgdl)))) AS c
       |  FROM tf t
       |  JOIN dfreq f USING (term)
       |  JOIN dl d ON d.doc_id = t.doc_id
       |  CROSS JOIN stats s
       |  WHERE t.term IN ($allTerms)
       |), scored AS (
       |  $perQuery
       |)
       |SELECT query_id, doc_id, n_terms_matched, score, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
       |  FROM scored) t
       |WHERE rank <= $Bm25TopK""".stripMargin
  }

  /** q134's hybrid-retrieval shape: the three q132 term queries, each
    * paired with the query EMBEDDING whose vec_id equals the query id
    * (the testdata contract aligns doc_id and vec_id spaces). Each leg
    * over-retrieves to depth [[HybridLegK]] and the fusion keeps
    * [[HybridTopK]].
    */
  val HybridVecIds: Seq[Long] = Bm25Queries.map(_._1.toLong)
  val HybridLegK = 20
  val HybridTopK = 10

  /** q134: reciprocal-rank fusion of the BM25 sparse leg (q132's exact
    * machinery at depth 20) with the brute-force dense cosine leg (q24's
    * machinery at depth 20) — [[graft.operators.Rrf]]. The oracle replays
    * both legs end-to-end (every BM25 contribution, every cosine) plus
    * the pinned two-term fusion sum and the (rrf DESC, doc_id ASC) cut.
    */
  def q134HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val sparse = graft.operators.Bm25
      .rank(Tables.documents(spark, dir), "doc_id", "text",
        Bm25Queries, HybridLegK)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val dense = graft.operators.similarity.CosineTopK
      .search(Tables.embeddings(spark, dir), "vec_id", "embedding",
        v => v.isin(HybridVecIds: _*), HybridLegK)
      .select(col("query_id").cast("int").as("query_id"),
        col("neighbor_id").as("doc_id"), col("rank"))
    graft.operators.Rrf.fuse(Seq("sparse" -> sparse, "dense" -> dense),
      HybridTopK)
  }

  def q134Oracle: String = {
    import graft.operators.Bm25.{B, K1}
    import graft.operators.Rrf.K0
    val dims = 64
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    val allTerms = Bm25Queries.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString(", ")
    val perQuery = Bm25Queries.map { case (qid, ts) =>
      val slot = (t: String) => s"max(CASE WHEN term = '$t' THEN c END)"
      val score = ts.map(t => s"COALESCE(${slot(t)}, 0.0)").mkString(" + ")
      s"""SELECT $qid AS query_id, doc_id, $score AS score
         |  FROM contrib WHERE term IN (${ts.map(t => s"'$t'").mkString(", ")})
         |  GROUP BY doc_id""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    val dot = (1 to dims)
      .map(i => s"CAST(q.e[$i] AS DOUBLE)*CAST(c.e[$i] AS DOUBLE)")
      .mkString(" + ")
    val sumsq = (1 to dims)
      .map(i => s"CAST(e[$i] AS DOUBLE)*CAST(e[$i] AS DOUBLE)")
      .mkString(" + ")
    val vecIds = HybridVecIds.mkString(", ")
    s"""WITH base AS (
       |  SELECT doc_id, string_split($norm, ' ') AS w
       |  FROM documents
       |  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND length($norm) > 0
       |), dl AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM base
       |), stats AS (
       |  SELECT COUNT(*) AS n,
       |    CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
       |  FROM dl
       |), tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(w) AS term FROM base) GROUP BY 1, 2
       |), dfreq AS (
       |  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
       |), contrib AS (
       |  SELECT t.doc_id, t.term,
       |    ((CAST(s.n - f.df AS DOUBLE) + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))
       |      * ((CAST(t.tf AS DOUBLE) * ${K1 + 1.0}) /
       |         (CAST(t.tf AS DOUBLE) + $K1 * (${1.0 - B} + $B *
       |          (CAST(d.dl AS DOUBLE) / s.avgdl)))) AS c
       |  FROM tf t
       |  JOIN dfreq f USING (term)
       |  JOIN dl d ON d.doc_id = t.doc_id
       |  CROSS JOIN stats s
       |  WHERE t.term IN ($allTerms)
       |), sparse_scored AS (
       |  $perQuery
       |), sparse AS (
       |  SELECT query_id, doc_id, rank FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS rank
       |    FROM sparse_scored) t
       |  WHERE rank <= $HybridLegK
       |), nv AS (
       |  SELECT vec_id, embedding AS e, sqrt($sumsq) AS nrm FROM embeddings
       |), dense AS (
       |  SELECT query_id, doc_id, rank FROM (
       |    SELECT CAST(q.vec_id AS INTEGER) AS query_id, c.vec_id AS doc_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ($dot) / (q.nrm * c.nrm) DESC, c.vec_id ASC) AS rank
       |    FROM nv q JOIN nv c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id IN ($vecIds)) t
       |  WHERE rank <= $HybridLegK
       |), fused AS (
       |  SELECT COALESCE(s.query_id, d.query_id) AS query_id,
       |    COALESCE(s.doc_id, d.doc_id) AS doc_id,
       |    CAST(CASE WHEN s.rank IS NULL THEN 0 ELSE 1 END +
       |         CASE WHEN d.rank IS NULL THEN 0 ELSE 1 END AS INTEGER) AS n_legs,
       |    COALESCE(1.0 / ($K0.0 + CAST(s.rank AS DOUBLE)), 0.0) +
       |    COALESCE(1.0 / ($K0.0 + CAST(d.rank AS DOUBLE)), 0.0) AS rrf
       |  FROM sparse s FULL OUTER JOIN dense d
       |    ON s.query_id = d.query_id AND s.doc_id = d.doc_id
       |)
       |SELECT query_id, doc_id, n_legs, rrf, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf DESC, doc_id ASC) AS INTEGER) AS rank
       |  FROM fused) t
       |WHERE rank <= $HybridTopK""".stripMargin
  }

  /** q137's merge budget: 8 rounds exercises the interesting regimes at
    * gate scale — early rounds merge inside distinct characters, later
    * rounds chain onto previously-merged symbols and the `</w>` marker.
    */
  val BpeMergeSteps = 8

  /** q137: distributed BPE merge training ([[graft.operators.BpeTrain]]
    * — the tokenizer-trainer pass): the first 8 learned merges with
    * their pair counts. The oracle replays the word-frequency table, the
    * symbol encoding, and ALL 8 rounds — each round's pair explode,
    * integer-weighted count, (count DESC, pair ASC) argmax, and the
    * symbol-exact greedy merge fold (`list_reduce` over the delimited
    * symbol string — the same merge-with-last lambda the engine folds
    * with `aggregate`) — as unrolled CTE stages.
    */
  def q137BpeMerges(spark: SparkSession, dir: String): DataFrame =
    graft.operators.BpeTrain.merges(Tables.documents(spark, dir), "text",
      BpeMergeSteps)

  def q137Oracle: String = {
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    val stages = (1 to BpeMergeSteps).map { k =>
      val p = k - 1
      s"""p$k AS (
         |  SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(CASE WHEN len(a) >= 2
         |      THEN list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])
         |      ELSE CAST([] AS VARCHAR[]) END) AS pair, f
         |    FROM (SELECT string_split(s, '|') AS a, f FROM w$p))
         |  GROUP BY 1
         |), m$k AS (
         |  SELECT pair, cnt,
         |    string_split(pair, ' ')[1] AS l, string_split(pair, ' ')[2] AS r
         |  FROM p$k ORDER BY cnt DESC, pair ASC LIMIT 1
         |), w$k AS (
         |  SELECT list_reduce(string_split(w.s, '|'), (acc, x) -> CASE
         |    WHEN (acc = m.l OR substr(acc, length(acc) - length(m.l)) = '|' || m.l)
         |      AND x = m.r
         |    THEN substr(acc, 1, length(acc) - length(m.l)) || m.l || m.r
         |    ELSE acc || '|' || x END) AS s, f
         |  FROM w$p w CROSS JOIN m$k m
         |)""".stripMargin
    }.mkString(", ")
    val sel = (1 to BpeMergeSteps).map(k =>
      s"SELECT $k AS step, pair, replace(pair, ' ', '') AS merged, " +
        s"cnt AS pair_count FROM m$k").mkString("\nUNION ALL\n")
    s"""WITH vocab AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS f FROM (
       |    SELECT unnest(string_split($norm, ' ')) AS word
       |    FROM documents WHERE text IS NOT NULL)
       |  WHERE regexp_matches(word, '^[a-z0-9]+$$')
       |  GROUP BY 1
       |), w0 AS (
       |  SELECT array_to_string(regexp_extract_all(word, '.') || ['</w>'], '|') AS s, f
       |  FROM vocab
       |), $stages
       |$sel""".stripMargin
  }

  /** q138: BPE ENCODING under the q137-trained merges
    * ([[graft.operators.BpeTrain.encodeVocab]]) — the apply half of the
    * tokenizer story: the full tokenized vocabulary (word, corpus
    * frequency, token count, the `|`-joined symbol sequence), every
    * word's complete encoding gated. Training reuses q137's exact
    * configuration; the learned list is a bounded driver collect (8
    * rows), then encoding is one corpus vocab pass + a single
    * all-folds-collapsed projection.
    */
  def q138BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val learned = graft.operators.BpeTrain
      .merges(docs, "text", BpeMergeSteps)
      .orderBy(col("step")).collect()
      .map { r =>
        val Array(l, rt) = r.getString(1).split(" ", 2)
        (l, rt)
      }.toSeq
    graft.operators.BpeTrain.encodeVocab(docs, "text", learned)
  }

  /** q138's oracle: q137's training replay with the WORD carried through
    * every merge stage, then the tokenized-vocab readout. The pair-count
    * and argmax stages are textually identical to q137's (they project
    * the word away before exploding pairs); only the fold stages keep the
    * word key.
    */
  /** The WITH-body replaying q137's training with the WORD carried through
    * every merge stage (vocab, w0, all [[BpeMergeSteps]] unrolled rounds) —
    * `w$BpeMergeSteps` holds (word, s, f). Shared by q138's tokenized-vocab
    * readout and q140's doc-grain token-count chain.
    */
  private[queries] def bpeEncodeCtes: String = {
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    val stages = (1 to BpeMergeSteps).map { k =>
      val p = k - 1
      s"""p$k AS (
         |  SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(CASE WHEN len(a) >= 2
         |      THEN list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])
         |      ELSE CAST([] AS VARCHAR[]) END) AS pair, f
         |    FROM (SELECT string_split(s, '|') AS a, f FROM w$p))
         |  GROUP BY 1
         |), m$k AS (
         |  SELECT pair, cnt,
         |    string_split(pair, ' ')[1] AS l, string_split(pair, ' ')[2] AS r
         |  FROM p$k ORDER BY cnt DESC, pair ASC LIMIT 1
         |), w$k AS (
         |  SELECT w.word, list_reduce(string_split(w.s, '|'), (acc, x) -> CASE
         |    WHEN (acc = m.l OR substr(acc, length(acc) - length(m.l)) = '|' || m.l)
         |      AND x = m.r
         |    THEN substr(acc, 1, length(acc) - length(m.l)) || m.l || m.r
         |    ELSE acc || '|' || x END) AS s, f
         |  FROM w$p w CROSS JOIN m$k m
         |)""".stripMargin
    }.mkString(", ")
    s"""vocab AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS f FROM (
       |    SELECT unnest(string_split($norm, ' ')) AS word
       |    FROM documents WHERE text IS NOT NULL)
       |  WHERE regexp_matches(word, '^[a-z0-9]+$$')
       |  GROUP BY 1
       |), w0 AS (
       |  SELECT word,
       |    array_to_string(regexp_extract_all(word, '.') || ['</w>'], '|') AS s, f
       |  FROM vocab
       |), $stages""".stripMargin
  }

  def q138Oracle: String =
    s"""WITH $bpeEncodeCtes
       |SELECT word, f, CAST(len(string_split(s, '|')) AS INTEGER) AS n_tokens,
       |  s AS tokens
       |FROM w$BpeMergeSteps""".stripMargin

  /** q150's round/batch shape: 2 rounds × 4 merges ≡ q137's 8-merge
    * budget, so the two trainers are directly comparable; the greedy
    * selector scans the top 4·4 = 16 candidate pairs per round
    * ([[graft.operators.BpeTrain.CandidateFactor]]).
    */
  val BpeBatchRounds = 2
  val BpeBatchSize = 4

  /** q150: BATCHED BPE training
    * ([[graft.operators.BpeTrain.mergesBatched]] — the production answer
    * to the sequential trainer's 30k-jobs driver-latency wall): per round
    * the 4 highest-count pairwise SYMBOL-DISJOINT merges apply at once.
    * The oracle replays both rounds completely — pair counts, the ranked
    * 16-pair candidate window, all four greedy disjoint selections (each
    * a NOT-EXISTS-guarded rank-min), and the four merge folds — so the
    * batched semantics (round-start counts, within-window selection) are
    * pinned end-to-end, not just spot-checked.
    */
  def q150BpeBatched(spark: SparkSession, dir: String): DataFrame =
    graft.operators.BpeTrain.mergesBatched(Tables.documents(spark, dir),
      "text", BpeBatchRounds, BpeBatchSize)

  def q150Oracle: String = {
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    val window = graft.operators.BpeTrain.CandidateFactor * BpeBatchSize
    // fold of one selected merge s over the symbol string w.s — identity
    // when the selection CTE is empty (LEFT JOIN ON TRUE, s.l NULL)
    def foldStage(k: Int, j: Int): String = {
      val prev = if (j == 1) s"w${k - 1}e" else s"w${k}_${j - 1}"
      s"""w${k}_$j AS (
         |  SELECT CASE WHEN s.l IS NULL THEN w.s
         |    ELSE list_reduce(string_split(w.s, '|'), (acc, x) -> CASE
         |      WHEN (acc = s.l OR substr(acc, length(acc) - length(s.l)) = '|' || s.l)
         |        AND x = s.r
         |      THEN substr(acc, 1, length(acc) - length(s.l)) || s.l || s.r
         |      ELSE acc || '|' || x END) END AS s, w.f
         |  FROM $prev w LEFT JOIN s${k}_$j s ON TRUE
         |)""".stripMargin
    }
    // greedy selection j within round k: rank-min candidate whose symbols
    // are disjoint from every earlier selection this round
    def selStage(k: Int, j: Int): String = {
      val guards = (1 until j).map(i =>
        s"AND NOT EXISTS (SELECT 1 FROM s${k}_$i s WHERE c.l IN (s.l, s.r) OR c.r IN (s.l, s.r))")
        .mkString(" ")
      s"""s${k}_$j AS (
         |  SELECT * FROM c$k c WHERE TRUE $guards ORDER BY rk LIMIT 1
         |)""".stripMargin
    }
    val rounds = (1 to BpeBatchRounds).map { k =>
      val src = if (k == 1) "w0" else s"w${k - 1}_$BpeBatchSize"
      val cand =
        s"""p$k AS (
           |  SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt FROM (
           |    SELECT unnest(CASE WHEN len(a) >= 2
           |      THEN list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])
           |      ELSE CAST([] AS VARCHAR[]) END) AS pair, f
           |    FROM (SELECT string_split(s, '|') AS a, f FROM $src))
           |  GROUP BY 1
           |), c$k AS (
           |  SELECT * FROM (
           |    SELECT pair, cnt, string_split(pair, ' ')[1] AS l,
           |      string_split(pair, ' ')[2] AS r,
           |      row_number() OVER (ORDER BY cnt DESC, pair ASC) AS rk
           |    FROM p$k) t
           |  WHERE rk <= $window
           |), w${k - 1}e AS (SELECT s, f FROM $src)""".stripMargin
      val sels = (1 to BpeBatchSize).map(j => selStage(k, j)).mkString(", ")
      val folds = (1 to BpeBatchSize).map(j => foldStage(k, j)).mkString(", ")
      s"$cand, $sels, $folds"
    }.mkString(", ")
    val sel = (for (k <- 1 to BpeBatchRounds; j <- 1 to BpeBatchSize) yield
      s"SELECT $k AS round, $j AS sel, pair, replace(pair, ' ', '') AS merged, " +
        s"cnt AS pair_count FROM s${k}_$j").mkString("\nUNION ALL\n")
    s"""WITH vocab AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS f FROM (
       |    SELECT unnest(string_split($norm, ' ')) AS word
       |    FROM documents WHERE text IS NOT NULL)
       |  WHERE regexp_matches(word, '^[a-z0-9]+$$')
       |  GROUP BY 1
       |), w0 AS (
       |  SELECT array_to_string(regexp_extract_all(word, '.') || ['</w>'], '|') AS s, f
       |  FROM vocab
       |), $rounds
       |$sel""".stripMargin
  }

  /** q151's merge budget: 6 byte-level rounds — enough to chain merged
    * hex symbols ("20" + "74" → "2074" → longer) past the 2-hex alphabet.
    */
  val ByteMergeSteps = 6

  /** q151: BYTE-LEVEL pre-tokenized BPE — training + encoding
    * ([[graft.operators.BpeTrain.byteMerges]] /
    * [[graft.operators.BpeTrain.byteEncodeVocab]], the GPT-2/Llama-class
    * tokenizer grain): the pinned lookahead-free GPT-2 regex classes
    * pre-tokenize the RAW text, each pre-token becomes its UTF-8 bytes as
    * 2-hex-digit symbols, and 6 merges train + apply at pre-token-vocab
    * grain. Gated output is the full tokenized pre-token vocabulary
    * (pretok, f, n_tokens, tokens); the oracle replays pre-tokenization,
    * the hex byte split, and all 6 training rounds + folds in DuckDB.
    */
  def q151BpeBytes(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val learned = graft.operators.BpeTrain
      .byteMerges(docs, "text", ByteMergeSteps)
      .orderBy(col("step")).collect()
      .map { r =>
        val Array(l, rt) = r.getString(1).split(" ", 2)
        (l, rt)
      }.toSeq
    graft.operators.BpeTrain.byteEncodeVocab(docs, "text", learned)
  }

  /** [[BytePreTokPattern]] as a DuckDB literal: standard-SQL quoting only
    * ('' for the contraction quote) — DuckDB literals do not process
    * backslash escapes.
    */
  private[queries] def bytePreTokDuck: String =
    graft.operators.BpeTrain.BytePreTokPattern.replace("'", "''")

  /** The WITH-body replaying q151's byte-level training with the PRE-TOKEN
    * carried through every merge stage (pvocab, b0, all [[ByteMergeSteps]]
    * unrolled rounds) — `b$ByteMergeSteps` holds (pretok, s, f). Shared by
    * q151's tokenized-vocab readout and q155's per-source byte-grain
    * accounting chain.
    */
  private[queries] def byteEncodeCtes: String = {
    val pat = bytePreTokDuck
    val stages = (1 to ByteMergeSteps).map { k =>
      val p = k - 1
      s"""p$k AS (
         |  SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(CASE WHEN len(a) >= 2
         |      THEN list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])
         |      ELSE CAST([] AS VARCHAR[]) END) AS pair, f
         |    FROM (SELECT string_split(s, '|') AS a, f FROM b$p))
         |  GROUP BY 1
         |), m$k AS (
         |  SELECT pair, cnt,
         |    string_split(pair, ' ')[1] AS l, string_split(pair, ' ')[2] AS r
         |  FROM p$k ORDER BY cnt DESC, pair ASC LIMIT 1
         |), b$k AS (
         |  SELECT w.pretok, list_reduce(string_split(w.s, '|'), (acc, x) -> CASE
         |    WHEN (acc = m.l OR substr(acc, length(acc) - length(m.l)) = '|' || m.l)
         |      AND x = m.r
         |    THEN substr(acc, 1, length(acc) - length(m.l)) || m.l || m.r
         |    ELSE acc || '|' || x END) AS s, f
         |  FROM b$p w CROSS JOIN m$k m
         |)""".stripMargin
    }.mkString(", ")
    s"""pvocab AS (
       |  SELECT pretok, CAST(COUNT(*) AS BIGINT) AS f FROM (
       |    SELECT unnest(regexp_extract_all(text, '$pat')) AS pretok
       |    FROM documents WHERE text IS NOT NULL)
       |  GROUP BY 1
       |), b0 AS (
       |  SELECT pretok,
       |    array_to_string(regexp_extract_all(lower(hex(encode(pretok))), '..'), '|') AS s,
       |    f
       |  FROM pvocab
       |), $stages""".stripMargin
  }

  def q151Oracle: String =
    s"""WITH $byteEncodeCtes
       |SELECT pretok, f, CAST(len(string_split(s, '|')) AS INTEGER) AS n_tokens,
       |  s AS tokens
       |FROM b$ByteMergeSteps""".stripMargin

  def q84Oracle: String =
    """WITH raw AS (
      |  SELECT doc_id,
      |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
      |  FROM documents WHERE text IS NOT NULL
      |), td AS (
      |  SELECT DISTINCT doc_id, term FROM raw
      |)
      |SELECT term, COUNT(*) AS doc_freq,
      |  array_to_string(list_sort(list(doc_id))[1:20], '-') AS postings_head
      |FROM td
      |WHERE len(term) > 0
      |GROUP BY term""".stripMargin
}
