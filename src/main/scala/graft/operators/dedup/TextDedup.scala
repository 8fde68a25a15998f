package graft.operators.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Shared shingling/hashing for the text-dedup family (SURVEY §2 items
  * 30-33). The shingle hash is the first 32 bits of md5 mod a 31-bit prime —
  * chosen because it is bit-identical reproducible in any engine (the DuckDB
  * oracle recomputes it), unlike engine-private hash functions.
  */
object TextShingles {
  /** 31-bit prime modulus keeps a*h+b inside Long without overflow. */
  val P = 2147483647L

  /** Distinct word-3-gram shingle hashes of the normalized text as
    * array<long>. Documents shorter than 3 tokens hash the whole text.
    * Narrow (per-row) computation — no shuffle, scales linearly.
    *
    * Consumers repartition the input first: a small compressed parquet
    * arrives as ONE split, and this per-row pipeline is CPU-bound — without
    * a repartition it runs on a single core no matter how many the cluster
    * has.
    */
  def shingleHashes(text: Column): Column = shingleHashes(text, 3)

  /** Width-parameterized variant: n is the shingle width in tokens —
    * [[Decontaminate]] threads the production 8–13-gram discipline
    * through here; everything else uses the 3-gram default.
    */
  def shingleHashes(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.ShingleHash(ColumnBridge.expression(text),
      distinct = true, n = n))
  }

  /** Ordered NON-distinct variant: every 3-gram occurrence hashes, in
    * document order — the input for within-document repetition measures
    * (duplicate-shingle ratio), where collapsing repeats would erase the
    * signal being measured.
    */
  def shingleHashesAll(text: Column): Column = shingleHashesAll(text, 3)

  /** Width-parameterized ordered variant (n-token windows, every
    * occurrence, document order) — [[graft.functions.QualityRules]]'
    * top-bigram rule runs this at n=2.
    */
  def shingleHashesAll(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.ShingleHash(ColumnBridge.expression(text),
      distinct = false, n = n))
  }

  /** Reference composed-builtins formulation (kept for cross-checking the
    * native expression; identical output INCLUDING null text → null, which
    * the naive composition would instead turn into [null]).
    */
  def shingleHashesBuiltins(text: Column): Column = {
    val norm = TextFns.normalizeText(text)
    val toks = split(norm, " ")
    val n = size(toks)
    val shingles = when(n >= 3,
      transform(sequence(lit(0), n - 3), i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
      .otherwise(array(norm))
    when(text.isNull, lit(null).cast("array<long>"))
      .otherwise(array_distinct(transform(shingles, s =>
        conv(substring(md5(s.cast("binary")), 1, 8), 16, 10).cast("long") % P)))
  }
}

/** Exact deduplication by content hash (hash-groupBy; one shuffle on the
  * fingerprint). Survivor = lowest doc id per group (deterministic).
  */
object ExactDedup {
  def groups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextFns.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("survivor_doc_id"),
        count(lit(1)).as("dup_count"),
        min(length(col(textCol))).as("min_len"),
        max(length(col(textCol))).as("max_len"))
}

/** N-gram Jaccard near-duplicate pairs via an inverted shingle index
  * (explode + equi-join on shingle hash), exact |A∩B| / |A∪B| from integer
  * counts.
  *
  * Scale note: this is the EXACT near-dup operator — cost is bounded by the
  * candidate-pair volume of the inverted index. For 100 TB corpora use
  * [[MinHashLSH]] (banded, tunable) as the scale path and this as the
  * verifier on its candidates.
  */
object NGramJaccard {
  /** A shingle shared by k documents contributes k·(k−1)/2 rows to the
    * candidate join: one boilerplate 3-gram in a million docs is ~5·10¹¹
    * pairs. Shingles above this document frequency carry no dedup signal
    * (they are the corpus's stop-phrases), so they are removed from the
    * feature universe — intersections AND sizes — keeping the output an
    * exact Jaccard over the filtered sets and bounding any bucket's join
    * fan-out at DefaultMaxShingleDocFreq².
    */
  val DefaultMaxShingleDocFreq = 100000L

  def pairs(df: DataFrame, idCol: String, textCol: String,
            threshold: Double,
            maxShingleDocFreq: Long = DefaultMaxShingleDocFreq): DataFrame = {
    import graft.operators.OpCache
    // hs feeds the frequency aggregate AND the anti-join probe; caching it
    // keeps the md5-shingle pipeline single-run.
    val hs = OpCache.cache(
      df.filter(col(textCol).isNotNull).repartition(col(idCol))
        .select(col(idCol).as("doc_id"),
          explode(TextShingles.shingleHashes(col(textCol))).as("h")))
    // Document-frequency cap via groupBy+count: the hash aggregate gets
    // map-side PARTIAL aggregation, so a boilerplate shingle shared by
    // millions of docs reduces inside each task before the shuffle. (A
    // count(...).over(partitionBy(h)) window would instead route every row
    // of the hot key to one reducer with no partial agg — the guard itself
    // becoming the skewed single-task spill it exists to prevent.) The
    // over-cap key set is tiny by construction, so the anti-join broadcasts.
    val hot = hs.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDocFreq)
      .select(col("h"))
    // kept feeds three plan branches (both join sides + sizes).
    val kept = OpCache.cache(hs.join(hot, Seq("h"), "left_anti"))
    // |A| over the capped universe (hashes are distinct per doc)
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shared = kept.alias("a").join(kept.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.alias("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.alias("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        (col("n_shared").cast("double") /
          (col("sa.n") + col("sb.n") - col("n_shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}

/** MinHash signatures + LSH banding (the 100 TB near-dup path: candidate
  * generation cost is O(docs × bands), never O(docs²)).
  *
  * 16 permutations (a_j·h + b_j) mod P in 4 bands × 4 rows. Constants are
  * fixed so any engine reproduces the signatures exactly.
  */
object MinHashLSH {
  import TextShingles.P
  val NumHashes = 16
  val Bands = 4
  val RowsPerBand: Int = NumHashes / Bands
  val As: Seq[Long] = (1 to NumHashes).map(j => (2654435761L * j) % P)
  val Bs: Seq[Long] = (1 to NumHashes).map(j => (40503L * j * j + 17) % P)

  /** (doc_id, sig) from a materialized (doc_id, hashes) frame. The hash
    * frame must be cached/materialized BEFORE fanning out into 16 minhash
    * expressions: projection collapse would otherwise inline the whole
    * md5-shingle pipeline into every signature slot (higher-order
    * functions get no codegen subexpression elimination), i.e. 16× the
    * scan cost.
    */
  private def signaturesFromHashes(hl: DataFrame): DataFrame = {
    val sigCols = As.zip(Bs).map { case (a, b) =>
      array_min(transform(col("hashes"), h => (lit(a) * h + lit(b)) % P))
    }
    hl.select(col("doc_id"), array(sigCols: _*).as("sig"))
  }

  private[dedup] def hashFrame(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull).repartition(col(idCol))
      .select(col(idCol).as("doc_id"),
        TextShingles.shingleHashes(col(textCol)).as("hashes"))

  /** doc_id, sig: array<long>[16]. */
  def signatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    signaturesFromHashes(graft.operators.OpCache.cache(hashFrame(df, idCol, textCol)))

  /** A band bucket holding k documents yields k·(k−1)/2 candidate pairs;
    * buckets beyond this size are degenerate (corpus boilerplate hashing to
    * one band key) and are dropped from candidate generation — their
    * members remain pair-able through their other, more selective bands.
    */
  val DefaultMaxBucketSize = 10000L

  /** Candidate near-dup pairs: docs sharing at least one band bucket, with
    * the MinHash-estimated Jaccard (agreeing rows / 16).
    *
    * Caching: the hash frame (where the expensive md5 work lives) plus the
    * tiny over-cap bucket set; the signature projection over the cached
    * hashes is cheap enough to recompute per join branch. Both caches are
    * released by an enclosing [[graft.operators.OpCache.scoped]] block.
    */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     maxBucketSize: Long = DefaultMaxBucketSize): DataFrame = {
    import graft.operators.OpCache
    val sig = signaturesFromHashes(OpCache.cache(hashFrame(df, idCol, textCol)))
    val bandIds = array((0 until Bands).map(lit): _*)
    // Keep the bucket self-join NARROW (ids + band key only): common
    // shingles make minhash slots collide across many docs, so bucket
    // blowup is real — wide rows (two 16-slot sigs) through that join
    // dominate runtime. Re-attach sigs only to the deduped pairs.
    val entries = sig.select(col("doc_id"), col("sig"), explode(bandIds).as("band_id"))
      .select(col("doc_id"), col("band_id"),
        array_join(transform(
          slice(col("sig"), col("band_id") * RowsPerBand + 1, lit(RowsPerBand)),
          _.cast("string")), "-").as("band_key"))
    // Bucket-size guard via groupBy+count, same reasoning as NGramJaccard's
    // doc-frequency cap: partial aggregation reduces a degenerate bucket
    // map-side, where a windowed count would single-reduce it. The over-cap
    // bucket set is tiny (cached — it feeds both self-join branches) and
    // broadcast anti-joins against the narrow band entries.
    val big = OpCache.cache(
      entries.groupBy(col("band_id"), col("band_key"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > maxBucketSize)
        .select(col("band_id"), col("band_key")))
    val bands = entries.join(big, Seq("band_id", "band_key"), "left_anti")
    val pairs = bands.alias("a").join(bands.alias("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    pairs
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), _ === _), x => x))
          .cast("double") / NumHashes).as("est_jaccard"))
  }

  /** Banded candidates + exact n-gram Jaccard VERIFY on the candidates
    * only — the two-stage near-dup pair generator [[DedupPipeline]] runs
    * (and [[QualityDedup]]'s banded arm reuses): the expensive exact
    * check pays only for pairs the LSH surfaced, so pair cost is
    * O(docs × bands), never all-pairs. Banding recall bounds recall
    * (measured in DedupSpec / QualityDedupSpec); a pair is emitted iff
    * the LSH surfaces it AND its exact shingle Jaccard ≥ `threshold`.
    *
    * The verify step reuses the SAME hash-frame plan [[candidatePairs]]
    * caches internally, so the md5 shingle pipeline still runs once
    * (Spark's CacheManager deduplicates plan-identical cache() calls).
    *
    * @return verified (doc_a, doc_b) pairs, doc_a < doc_b
    */
  def verifiedPairs(docs: DataFrame, idCol: String, textCol: String,
                    threshold: Double): DataFrame = {
    val cands = candidatePairs(docs, idCol, textCol)
      .select(col("doc_a"), col("doc_b"))
    val hashes = graft.operators.OpCache.cache(
      hashFrame(docs, idCol, textCol))
    cands
      .join(hashes.select(col("doc_id").as("doc_a"), col("hashes").as("ha")), "doc_a")
      .join(hashes.select(col("doc_id").as("doc_b"), col("hashes").as("hb")), "doc_b")
      .withColumn("n_inter", size(array_intersect(col("ha"), col("hb"))))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (size(col("ha")) + size(col("hb")) - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"))
  }
}

/** SimHash 32-bit signatures over shingle hashes: bit b is set when the
  * majority of features have bit b set. Hamming distance between signatures
  * approximates cosine similarity of the feature sets.
  */
object SimHash {
  val Bits = 32

  def signatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Array-level bit counting: zero shuffle (vs explode + groupBy), one
    // row per doc throughout. Null-text docs are dropped: there is nothing
    // to fingerprint, and carrying them produces a nonsense (0, -1)
    // signature row. Materialize (cache) the hash arrays first —
    // the 32 bit-count folds would otherwise each inline the md5-shingle
    // pipeline (no codegen CSE for higher-order functions).
    val hl = graft.operators.OpCache.cache(
      df.filter(col(textCol).isNotNull).repartition(col(idCol))
        .select(col(idCol).as("doc_id"),
          TextShingles.shingleHashes(col(textCol)).as("hashes")))
    val bitCounts = (0 until Bits).map { b =>
      aggregate(col("hashes"), lit(0L),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(1L)).as(s"bit_$b")
    }
    val counted = hl.select(col("doc_id") +: size(col("hashes")).cast("long").as("n_features") +: bitCounts: _*)
    val sim = (0 until Bits).map(b =>
        when(col(s"bit_$b") * 2 > col("n_features"), lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    counted.select(col("doc_id"), sim.as("simhash"), col("n_features"))
  }
}
