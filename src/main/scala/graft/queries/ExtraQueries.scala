package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns
import graft.operators.Sampling
import graft.operators.similarity.{CosinePairs, VectorFns}

/** Round-1 widening: embedding near-dup (SURVEY §2 item 34 as a standalone
  * query) and winnowing fingerprints (item 40's rolling-hash variant).
  */
object ExtraQueries {

  /** q31: embedding-cosine near-duplicate pairs via [[CosinePairs.banded]]
    * — LSH bucket candidates + exact-cosine verify, never an unblocked
    * O(n²) self-join. The oracle mirrors the banding bit-for-bit (the LCG
    * plane weights are embedded as double literals, the sign sums are
    * in-element-order), so the driver gate checks the banded semantics
    * exactly; recall vs the brute-force all-pairs baseline is measured in
    * CosinePairsSpec (it is data-dependent: the testdata's qualifying pairs
    * sit at the decision boundary — min cosine 0.4000 vs threshold 0.4 —
    * where no banding scheme can be both complete and sub-quadratic).
    */
  val CosineThreshold = 0.4

  def q31EmbeddingDedup(spark: SparkSession, dir: String): DataFrame =
    CosinePairs.banded(Tables.embeddings(spark, dir), "vec_id", "embedding",
      threshold = CosineThreshold, dims = SimilarityQueries.Dims)

  def q31Oracle: String = {
    val dims = SimilarityQueries.Dims
    def pairDot(a: String, b: String) = (1 to dims)
      .map(i => s"CAST($a.embedding[$i] AS DOUBLE)*CAST($b.embedding[$i] AS DOUBLE)")
      .mkString(" + ")
    val sumsq = (1 to dims)
      .map(i => s"CAST(embedding[$i] AS DOUBLE)*CAST(embedding[$i] AS DOUBLE)")
      .mkString(" + ")
    // same LCG weights, same in-element-order sign sums as LshAnn.bucketKey;
    // the adaptive variant mirrors the occupancy-bounded bucket width
    // (CosinePairs.banded's default) via the same integer ladder
    val (bitsCte, bucketCols, anyBucket) =
      SimilarityQueries.lshBucketSqlAdaptive("embeddings")
    s"""WITH nb AS (
       |  $bitsCte
       |), v AS (
       |  SELECT vec_id, embedding, sqrt($sumsq) AS nrm,
       |    $bucketCols
       |  FROM embeddings, nb
       |), pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM v a JOIN v b ON a.vec_id < b.vec_id AND ($anyBucket)
       |)
       |SELECT p.vec_a, p.vec_b,
       |  (${pairDot("va", "vb")}) / (va.nrm * vb.nrm) AS cosine
       |FROM pairs p
       |JOIN v va ON p.vec_a = va.vec_id
       |JOIN v vb ON p.vec_b = vb.vec_id
       |WHERE (${pairDot("va", "vb")}) / (va.nrm * vb.nrm) >= $CosineThreshold""".stripMargin
  }

  /** q32: winnowing fingerprints — per document, the distinct set of
    * rolling w-window minima over the (ordered, non-distinct) shingle hash
    * sequence. The standard local-fingerprint selection for plagiarism-style
    * overlap detection; emitted exploded (doc_id, fingerprint) for joining.
    */
  val WinnowWindow = 4

  def q32WinnowFingerprint(spark: SparkSession, dir: String): DataFrame =
    graft.operators.dedup.WinnowDedup.fingerprints(
      Tables.documents(spark, dir), "doc_id", "text", WinnowWindow)

  /** The winnow-fingerprint CTE chain (docs → shingles → ordered hashes →
    * window minima → exploded (doc_id, fingerprint)), shared by the q32
    * and q70 oracles — both must select the identical fingerprints.
    */
  private def winnowCtes: String =
    s"""WITH docs AS (
       |  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm FROM documents
       |), toks AS (
       |  SELECT doc_id, norm, string_split(norm, ' ') AS t FROM docs
       |), sh AS (
       |  SELECT doc_id, CASE WHEN len(t) >= 3
       |    THEN list_transform(range(len(t)-2), i -> array_to_string(t[i+1:i+3], ' '))
       |    ELSE [norm] END AS shingles
       |  FROM toks
       |), hseq AS (
       |  SELECT doc_id, list_transform(shingles,
       |    s -> CAST('0x' || substr(md5(s),1,8) AS BIGINT) % 2147483647) AS hs
       |  FROM sh
       |), minima AS (
       |  SELECT doc_id, CASE WHEN len(hs) >= $WinnowWindow
       |    THEN list_distinct(list_transform(range(len(hs) - $WinnowWindow + 1),
       |      i -> list_min(hs[i+1:i+$WinnowWindow])))
       |    ELSE [list_min(hs)] END AS fps
       |  FROM hseq
       |), fp AS (
       |  SELECT doc_id, unnest(fps) AS fingerprint FROM minima
       |)""".stripMargin

  def q32Oracle: String =
    s"""$winnowCtes
       |SELECT doc_id, fingerprint FROM fp""".stripMargin

  /** q70: winnowing-based near-dup clusters
    * ([[graft.operators.dedup.WinnowDedup.clusters]]) — fingerprint windows
    * → doc-frequency-capped index → ≥2-shared-window candidate pairs →
    * connected components; the composition of items 40 and 65.
    */
  val WinnowMinShared = 2

  def q70WinnowDedup(spark: SparkSession, dir: String): DataFrame =
    graft.operators.dedup.WinnowDedup.clusters(
        Tables.documents(spark, dir), "doc_id", "text",
        window = WinnowWindow, minShared = WinnowMinShared)
      .select(col("node").as("doc_id"), col("cluster_rep"), col("cluster_size"))

  def q70Oracle: String = {
    val cap = graft.operators.dedup.NGramJaccard.DefaultMaxShingleDocFreq
    s"""${winnowCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |hot AS (
       |  SELECT fingerprint FROM fp GROUP BY 1 HAVING COUNT(*) > $cap
       |),
       |kept AS (
       |  SELECT fp.doc_id, fp.fingerprint FROM fp
       |  WHERE fingerprint NOT IN (SELECT fingerprint FROM hot)
       |),
       |jpairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b
       |    ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= $WinnowMinShared
       |),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM jpairs
       |  UNION SELECT doc_b, doc_a FROM jpairs
       |),
       |reach AS (
       |  SELECT src AS node, dst AS r FROM edges
       |  UNION
       |  SELECT rc.node, e.dst FROM reach rc JOIN edges e ON rc.r = e.src
       |),
       |comp AS (
       |  SELECT node AS doc_id, MIN(r) AS cluster_rep FROM reach GROUP BY node
       |)
       |SELECT c.doc_id, c.cluster_rep, cnt.cluster_size
       |FROM comp c
       |JOIN (SELECT cluster_rep, COUNT(*) AS cluster_size
       |      FROM comp GROUP BY 1) cnt USING (cluster_rep)""".stripMargin
  }

  /** q45: unit-normalized embeddings — the standard ANN preprocessing pass
    * (pre-normalized vectors make cosine = plain dot product). The norm is
    * computed once per row and the element scaling is in-order, so every
    * output double is bitwise reproducible in the oracle.
    */
  def q45UnitVectors(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      // null-embedding contract made explicit on BOTH engines: without the
      // filter, a null vec yields null nrm, which the oracle's nrm <> 0 /
      // nrm = 0 branches BOTH drop while Spark would emit dims null rows —
      // a latent row-count divergence the moment the data grows nulls
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"),
        VectorFns.norm(col("embedding")).as("nrm"))
      .select(col("vec_id"),
        // zero-norm guard: engines disagree on x/0.0 (Spark non-ANSI nulls
        // the element, DuckDB yields inf/nan) — a zero vector has no unit
        // direction, so emit null by contract
        when(col("nrm") === 0.0d, lit(null))
          .otherwise(VectorFns.scale(col("embedding"), col("nrm"))).as("unit"),
        col("nrm"))
      // gate as scalars, one row per element: the driver's pandas compare
      // cannot sort list columns (VERDICT r2 #4). posexplode_outer keeps the
      // zero-norm contract visible as a single (null idx, null value) row.
      .select(col("vec_id"),
        posexplode_outer(col("unit")).as(Seq("idx", "unit_value")),
        col("nrm"))

  def q45Oracle: String = {
    val dims = SimilarityQueries.Dims
    val sumsq = (1 to dims)
      .map(i => s"CAST(embedding[$i] AS DOUBLE)*CAST(embedding[$i] AS DOUBLE)")
      .mkString(" + ")
    s"""WITH n AS (
       |  SELECT vec_id, embedding, sqrt($sumsq) AS nrm FROM embeddings
       |  WHERE embedding IS NOT NULL
       |)
       |SELECT vec_id, CAST(g.i AS INT) AS idx,
       |  CAST(embedding[g.i + 1] AS DOUBLE) / nrm AS unit_value, nrm
       |FROM n CROSS JOIN (SELECT unnest(range($dims)) AS i) g
       |WHERE nrm <> 0
       |UNION ALL
       |SELECT vec_id, CAST(NULL AS INT) AS idx,
       |  CAST(NULL AS DOUBLE) AS unit_value, nrm
       |FROM n WHERE nrm = 0""".stripMargin
  }

  /** q46: PII/link scrubbing (pre-training text hygiene): emails and URLs
    * redact to placeholder tokens, with pre-redaction audit counts. The
    * contact spans are synthesized deterministically so the oracle can
    * rebuild the identical input.
    */
  def q46RedactedDocs(spark: SparkSession, dir: String): DataFrame = {
    val contact = concat(coalesce(col("text"), lit("")),
      lit(" Contact: user"), col("doc_id").cast("string"),
      lit("@example.com or http://link.example/"), col("doc_id").cast("string"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TextFns.redact(contact).as("clean_text"),
      TextFns.emailCount(contact).as("n_emails"),
      TextFns.urlCount(contact).as("n_urls"))
  }

  def q46Oracle: String = {
    val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
    val url = """https?://[^\s]+"""
    s"""WITH src AS (
       |  SELECT doc_id,
       |    COALESCE(text, '') || ' Contact: user' || CAST(doc_id AS VARCHAR)
       |      || '@example.com or http://link.example/' || CAST(doc_id AS VARCHAR) AS contact
       |  FROM documents
       |)
       |SELECT doc_id,
       |  regexp_replace(regexp_replace(contact, '$email', '<EMAIL>', 'g'), '$url', '<URL>', 'g') AS clean_text,
       |  CAST(len(regexp_extract_all(contact, '$email')) AS INTEGER) AS n_emails,
       |  CAST(len(regexp_extract_all(contact, '$url')) AS INTEGER) AS n_urls
       |FROM src""".stripMargin
  }

  /** Planted PII suffix shared by the q176/q177 gates — every ~7th
    * document (doc_id % 7 = 3, CASE-first so the overlap with the light
    * class resolves identically in both engines) is SATURATED with PII
    * (2 phones + 1 ID number + 1 IPv4 = 4 spans), every ~5th
    * (doc_id % 5 = 1) carries one id-derived email; plain `||`/concat
    * keeps null texts null (the funnel's 'invalid' contract must not be
    * disturbed by the plant).
    */
  private[queries] def piiSuffix: Column =
    when(col("doc_id") % 7 === 3,
      lit(" call (555) 123-4567 or +1 555-123-4567 id 123-45-6789 host 10.0.0.1"))
      .when(col("doc_id") % 5 === 1,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com")))
      .otherwise(lit(""))

  private[queries] val piiSuffixSql: String =
    """CASE WHEN doc_id % 7 = 3
      |       THEN ' call (555) 123-4567 or +1 555-123-4567 id 123-45-6789 host 10.0.0.1'
      |     WHEN doc_id % 5 = 1
      |       THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |     ELSE '' END""".stripMargin

  /** The [[TextFns.PiiChain]] as a chained DuckDB regexp_replace over
    * column expression `t` — ONE source of truth for patterns and
    * order (a drifted pattern diverges q176's clean_text hash).
    */
  private[queries] def piiRedactSql(t: String): String =
    TextFns.PiiChain.foldLeft(t) { case (acc, (p, repl)) =>
      s"regexp_replace($acc, '$p', '$repl', 'g')"
    }

  /** Per-family count SQL over possibly-null column `t`. */
  private[queries] def piiCountSql(t: String, pattern: String): String =
    s"CASE WHEN $t IS NULL THEN 0 ELSE " +
      s"CAST(len(regexp_extract_all($t, '$pattern')) AS INTEGER) END"

  /** q176: PII scrubbing across the production families (§2 item 57b —
    * phones, IPv4, ID numbers, plus #57's emails): placeholder
    * redaction and per-family audit counts, all regexes in the
    * Java∩RE2 subset so the oracle replays the REDACTED TEXT bitwise,
    * not just the counts. The planted suffix ([[piiSuffix]]) makes the
    * expected spans predictable while the regexes still sweep the full
    * document text.
    */
  def q176PiiStats(spark: SparkSession, dir: String): DataFrame = {
    val t = concat(col("text"), piiSuffix)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TextFns.piiRedact(t).as("clean_text"),
      TextFns.emailCount(t).as("n_emails"),
      TextFns.phoneCount(t).as("n_phones"),
      TextFns.idNumCount(t).as("n_ids"),
      TextFns.ipCount(t).as("n_ips"))
  }

  def q176Oracle: String = {
    val Seq(email, phone, idnum, ip) = TextFns.PiiChain.map(_._1)
    s"""WITH src AS (
       |  SELECT doc_id, text || $piiSuffixSql AS t FROM documents
       |)
       |SELECT doc_id,
       |  ${piiRedactSql("t")} AS clean_text,
       |  ${piiCountSql("t", email)} AS n_emails,
       |  ${piiCountSql("t", phone)} AS n_phones,
       |  ${piiCountSql("t", idnum)} AS n_ids,
       |  ${piiCountSql("t", ip)} AS n_ips
       |FROM src""".stripMargin
  }

  /** q47: deterministic train/eval split — assignment comes from md5 of
    * the id (reproducible across engines/runs/shuffles; never rand()), so
    * a document keeps its split forever and contamination is auditable.
    */
  def q47TrainSplit(spark: SparkSession, dir: String): DataFrame =
    Sampling.deterministicSplit(Tables.documents(spark, dir), "doc_id", trainPct = 90)
      .groupBy(col("split_name"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))

  def q47Oracle: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8) AS BIGINT) % 100 AS bucket
      |  FROM documents
      |)
      |SELECT CASE WHEN bucket < 90 THEN 'train' ELSE 'eval' END AS split_name,
      |  COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM b
      |GROUP BY 1""".stripMargin

  /** q55: deterministic HyperLogLog over lineitem.l_orderkey — all 256
    * (bucket, register) rows plus the raw estimate and the exact distinct,
    * every value bitwise engine-independent (see
    * [[graft.operators.HllSketch]]). The estimate column rides on each
    * register row so one hash-gated result covers sketch AND readout.
    */
  def q55HllDistinct(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.HllSketch
    val li = Tables.lineitem(spark, dir)
    // the register frame feeds BOTH the estimate aggregate and the final
    // join — cache it or the full lineitem md5/bucket/rho scan runs twice
    val regs = graft.operators.OpCache.cache(
      HllSketch.registers(li, col("l_orderkey")))
    val est = HllSketch.estimate(regs)
      .join(li.agg(countDistinct(col("l_orderkey")).as("n_distinct_exact")), lit(true))
    regs.join(broadcast(est), lit(true))
      .select(col("bucket"), col("register"), col("hll_estimate"),
        col("n_zero_registers"), col("n_distinct_exact"))
  }

  /** q56: as-of join — each purchase event enriched with the user's most
    * recent click at or before it ([[graft.operators.AsOfJoin]]'s
    * union-window formulation; the oracle uses DuckDB's NATIVE `ASOF LEFT
    * JOIN`, so two independent as-of implementations must agree row-for-row).
    * Clicks pre-aggregate to one row per (user, ts) — the determinism
    * contract both engines' as-of semantics need.
    */
  def q56AsOfClicks(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      // unique per (user, ts): keep the max event_id's row (struct max
      // compares fields in order; event_id is globally unique)
      .agg(max(struct(col("event_id"), col("value"))).as("s"))
      .select(col("user_id"), col("ts").as("click_ts"),
        col("s.event_id").as("click_event_id"), col("s.value").as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    AsOfJoin.leftAsOf(purchases, clicks, keys = Seq("user_id"),
      leftTs = "ts", rightTs = "click_ts")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"), col("value"),
        col("asof_click_ts").cast("timestamp_ntz").as("asof_click_ts"),
        col("asof_click_event_id"), col("asof_click_value"))
  }

  def q56Oracle: String =
    """WITH clicks AS (
      |  SELECT user_id, ts AS click_ts, event_id AS click_event_id, value AS click_value
      |  FROM (
      |    SELECT user_id, ts, event_id, value,
      |      row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_type = 'click' AND ts IS NOT NULL
      |  ) WHERE rn = 1
      |), purch AS (
      |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
      |)
      |SELECT p.event_id, p.user_id, p.ts, p.value,
      |  c.click_ts AS asof_click_ts,
      |  c.click_event_id AS asof_click_event_id,
      |  c.click_value AS asof_click_value
      |FROM purch p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.click_ts""".stripMargin

  def q55Oracle: String = {
    import graft.operators.HllSketch.{HashBits, M, MaxRho, Pow2Scale}
    s"""WITH h AS (
       |  SELECT md5(CAST(l_orderkey AS VARCHAR)) AS hx
       |  FROM lineitem WHERE l_orderkey IS NOT NULL
       |), br AS (
       |  SELECT CAST(CAST('0x' || substr(hx, 1, 2) AS BIGINT) AS INTEGER) AS bucket,
       |         CAST('0x' || substr(hx, 3, ${HashBits / 4}) AS BIGINT) AS v
       |  FROM h
       |), present AS (
       |  SELECT bucket,
       |    MAX(CASE WHEN v = 0 THEN $MaxRho ELSE $MaxRho - length(bin(v)) END) AS register
       |  FROM br GROUP BY bucket
       |), regs AS (
       |  SELECT CAST(g.range AS INTEGER) AS bucket,
       |    CAST(COALESCE(p.register, 0) AS INTEGER) AS register
       |  FROM range($M) g LEFT JOIN present p ON g.range = p.bucket
       |), est AS (
       |  -- every literal CAST to DOUBLE: DuckDB types bare decimal literals
       |  -- as DECIMAL and would do exact-decimal arithmetic where Spark's
       |  -- lit(0.7213d) chain is IEEE double ops
       |  SELECT ((CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(${M.toDouble} AS DOUBLE))) * CAST(${M.toDouble * M.toDouble} AS DOUBLE) * ${Pow2Scale.toDouble})
       |      -- register sum routed through VARCHAR: SUM(BIGINT) is HUGEINT in
       |      -- DuckDB and its direct DOUBLE cast is not correctly rounded
       |      -- above 2^53 (1-ulp off), where Spark's Decimal.toDouble is;
       |      -- strtod parses correctly rounded in both engines (same fix as
       |      -- the q67 moment readout)
       |      / CAST(CAST(SUM(1::BIGINT << ($MaxRho - register)) AS VARCHAR) AS DOUBLE) AS hll_estimate,
       |    COUNT(CASE WHEN register = 0 THEN 1 END) AS n_zero_registers
       |  FROM regs
       |), exact AS (
       |  SELECT COUNT(DISTINCT l_orderkey) AS n_distinct_exact FROM lineitem
       |)
       |SELECT bucket, register, hll_estimate, n_zero_registers, n_distinct_exact
       |FROM regs CROSS JOIN est CROSS JOIN exact""".stripMargin
  }
}
