package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis functions for LLM-training-data pipelines (SURVEY §2
  * items 37-40). Pure built-in expression compositions: codegen'd,
  * shuffle-free, and recomputable in the DuckDB oracle.
  *
  * Float discipline: every ratio is a single division of two exact integer
  * counts, and score weighting uses one fixed left-to-right expression, so
  * results are bitwise deterministic across engines and partitionings.
  */
object TextFns {

  /** Whitespace token count = number of \S+ runs. Counting matches (like
    * the oracle) rather than splitting sidesteps split()'s kept empty
    * strings around leading/trailing whitespace that trim (ASCII-space
    * only) does not remove. Empty/blank → 0.
    */
  def tokenCountWs(text: Column): Column =
    when(text.isNull, 0)
      .otherwise(size(regexp_extract_all(text, lit("""\S+"""), lit(0))))

  /** BPE-ish token count: letter runs, single digits, punctuation marks.
    * A cheap upper-bound proxy for byte-pair tokenizer counts.
    */
  def tokenCountBpe(text: Column): Column =
    when(text.isNull, 0)
      .otherwise(size(regexp_extract_all(text, lit("""[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"""), lit(0))))

  private def countMatches(text: Column, pattern: String): Column =
    when(text.isNull, 0)
      .otherwise(size(regexp_extract_all(lower(text), lit(pattern), lit(0))))

  /** Marker-word counts per language used by [[languageId]]. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> """\b(the|and|of|to|a|in)\b""",
    "de" -> """\b(der|die|und|das|nicht)\b""",
    "es" -> """\b(el|la|los|que|es)\b""",
    "fr" -> """\b(le|les|des|est|une)\b""",
    "zh" -> """[一-鿿]""")

  /** N-gram/marker-word language ID. Deterministic argmax: first language
    * in [[LangMarkers]] order reaching the max count wins; all-zero →
    * "unknown".
    */
  def languageId(text: Column): Column = {
    val counts = LangMarkers.map { case (l, p) => l -> countMatches(text, p) }
    val maxCount = greatest(counts.map(_._2): _*)
    counts.foldLeft(when(maxCount <= 0, "unknown")) { case (acc, (l, c)) =>
      acc.when(c === maxCount, l)
    }.otherwise("unknown")
  }

  /** Alphabetic-character ratio (0 for empty). */
  def alphaRatio(text: Column): Column = {
    val len = length(text)
    when(text.isNull || len === 0, 0.0d)
      .otherwise(countMatches(text, "[a-z]").cast(DoubleType) / len)
  }

  /** Stopword-token ratio, clamped to [0,1] (0 when no tokens). The clamp
    * matters: the numerator counts word-boundary matches while the
    * denominator counts whitespace runs, so "a,a,a,a" has 4 matches in 1
    * token — without the clamp the ratio (and [[qualityScore]]) would
    * exceed their documented ranges.
    */
  def stopwordRatio(text: Column): Column = {
    val stops = countMatches(text, """\b(the|a|an|and|or|of|to|in|is|it)\b""")
    val toks = tokenCountWs(text)
    when(toks === 0, 0.0d)
      .otherwise(least(lit(1.0d), stops.cast(DoubleType) / toks))
  }

  /** Heuristic document quality score in [0,1]:
    * 0.4·alpha_ratio + 0.3·stopword_ratio + 0.3·min(1, tokens/100).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(lit(1.0d), tokenCountWs(text).cast(DoubleType) / 100.0d)
    lit(0.4d) * alphaRatio(text) + lit(0.3d) * stopwordRatio(text) +
      lit(0.3d) * lenScore
  }

  /** Normalized text (lowercase, collapsed whitespace) — the dedup key.
    * Collapse BEFORE trimming: trim strips ASCII spaces only, so a leading/
    * trailing tab or newline would survive a trim-first order as a residual
    * space and split fingerprints for texts equal up to trailing whitespace.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), """\s+""", " "))

  /** Content fingerprint: md5 of normalized text. */
  def fingerprint(text: Column): Column = md5(normalizeText(text).cast("binary"))

  private val EmailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val UrlPattern = """https?://[^\s]+"""

  /** Training-data scrubbing: replace email addresses and URLs with
    * placeholder tokens (the standard pre-training PII/link hygiene pass).
    * Patterns stay in the regex subset both Spark and the DuckDB oracle
    * implement identically.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      UrlPattern, "<URL>")

  /** Count of email-shaped / URL-shaped spans (pre-redaction audit). */
  def emailCount(text: Column): Column = countRaw(text, EmailPattern)
  def urlCount(text: Column): Column = countRaw(text, UrlPattern)

  // --- PII scrubbing (SURVEY §2 item 57b): the production curation
  // families beyond email/URL hygiene — RefinedWeb's PII pass and
  // FineWeb's pipeline both scrub phone numbers, IP addresses and
  // ID-shaped numbers before training. Patterns stay in the common
  // subset Java regex and RE2 evaluate identically (no lookaround, no
  // backrefs; \b is the ASCII word boundary in both), so a DuckDB
  // oracle replays both the counts and the redacted text bitwise.

  private val PhonePattern =
    """(\+\d{1,2}[- ])?\(?\d{3}\)?[- ]\d{3}[- ]\d{4}"""
  private val Ipv4Pattern = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  private val IdNumPattern = """\b\d{3}-\d{2}-\d{4}\b"""

  /** The (pattern, placeholder) chain of [[piiRedact]], applied in
    * order. Email runs FIRST (an address is the only family containing
    * letters — scrubbing it cannot create or destroy a later match);
    * phone before ID before IP, so a full phone span is consumed as a
    * phone and never re-parsed piecemeal. Exposed for oracle builders.
    */
  val PiiChain: Seq[(String, String)] = Seq(
    EmailPattern -> "<EMAIL>",
    PhonePattern -> "<PHONE>",
    IdNumPattern -> "<ID>",
    Ipv4Pattern  -> "<IP>")

  /** Scrub all PII families to placeholder tokens. */
  def piiRedact(text: Column): Column =
    PiiChain.foldLeft(text) { case (t, (p, repl)) =>
      regexp_replace(t, p, repl)
    }

  /** Per-family span counts over the RAW text (pre-redaction audit —
    * independent counts, computed before any placeholder insertion).
    */
  def phoneCount(text: Column): Column = countRaw(text, PhonePattern)
  def ipCount(text: Column): Column = countRaw(text, Ipv4Pattern)
  def idNumCount(text: Column): Column = countRaw(text, IdNumPattern)

  /** Total PII spans across all four families — the funnel-stage drop
    * statistic (documents saturated with PII are removed, not
    * redacted, in production curation).
    */
  def piiTotal(text: Column): Column =
    emailCount(text) + phoneCount(text) + ipCount(text) + idNumCount(text)

  private def countRaw(text: Column, pattern: String): Column =
    when(text.isNull, 0)
      .otherwise(size(regexp_extract_all(text, lit(pattern), lit(0))))

  /** Overlapping token-window chunks — the RAG/pre-training document
    * splitter: normalized tokens sliced into windows of `sizeTokens`
    * starting every `sizeTokens - overlap` tokens, as an array of
    * (chunk_no, chunk_text, n_tokens) structs for the caller to
    * posexplode. Pure per-row array expressions (sequence/filter/
    * transform/slice) — zero shuffle, fully codegen-compatible, and
    * reproducible in any engine with list slicing (the oracle rebuilds
    * the identical windows). The final window is allowed to run short;
    * a start is kept iff it is 0 or lies before `n_tokens − overlap` —
    * every token still lands in ≥1 chunk, and a start inside the final
    * overlap zone (whose window would be a strict SUFFIX of the previous
    * chunk — pure duplicate content in a RAG/pre-training index) is not
    * emitted. Short docs therefore yield exactly one chunk; empty or
    * whitespace-only text yields none.
    */
  def chunked(text: Column, sizeTokens: Int, overlap: Int): Column = {
    require(sizeTokens > 0 && overlap >= 0 && overlap < sizeTokens,
      s"need 0 <= overlap < size, got size=$sizeTokens overlap=$overlap")
    val step = sizeTokens - overlap
    val norm = normalizeText(text)
    val toks = split(norm, " ")
    val n = size(toks)
    val starts = filter(
      sequence(lit(0), greatest(n - 1, lit(0)), lit(step)),
      s => s === 0 || s < n - overlap)
    // blank-doc guard hoisted OUTSIDE the per-element lambda: null array →
    // explode drops the row, and length(norm) evaluates once per row, not
    // once per candidate start
    when(length(norm) > 0,
      transform(starts, (s, i) => struct(
        i.as("chunk_no"),
        array_join(slice(toks, s + 1, lit(sizeTokens)), " ").as("chunk_text"),
        least(n - s, lit(sizeTokens)).as("n_tokens"))))
  }
}
