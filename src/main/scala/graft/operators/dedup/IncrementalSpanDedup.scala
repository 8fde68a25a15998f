package graft.operators.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.OpCache

/** INCREMENTAL exact-substring span removal — the daily-maintenance form
  * of [[SpanDedup]] (the #104/#93 discipline applied to the span grain):
  * each day's document delta is ingested WITHOUT re-hashing or
  * re-cleaning the accumulated corpus, yet the maintained output stays
  * EXACTLY equal to a from-scratch [[SpanDedup.removeDuplicateSpans]]
  * over the union of every delta — the convergence contract the q131
  * oracle replays batch-side.
  *
  * Why this exists: at 100 TB you never re-run span dedup over the whole
  * corpus because a day of crawl arrived. But span duplication is a
  * GLOBAL property — a window that was unique yesterday becomes
  * duplicated the moment today's crawl carries its second copy, and the
  * OLD document holding the first copy must lose the span too (Lee et
  * al. 2021's corpus-wide ≥2 rule, [[SpanDedup]]'s contract). So the
  * state machine tracks, per window hash, how many occurrences the
  * corpus has seen, and re-cleans exactly the old documents whose hash
  * set gained a member.
  *
  * State under `root` (all parquet, all engine-replayable):
  *  - `counts/seg=K/` — window-hash occurrence counts, APPEND-ONLY
  *    segments (one per ingested day); the logical count is the
  *    segment-sum per hash. Appending a narrow delta frame beats
  *    rewriting a corpus-sized count table every day; segment fan-in is
  *    the [[graft.sources.Compaction]] lever (#49e), and reads are one
  *    partial-agg shuffle either way.
  *  - `postings/` — DISTINCT (hash, doc_id) pairs, append-only (only new
  *    docs add postings). This is the inverted index that answers "which
  *    OLD docs must re-clean" without scanning the corpus: the
  *    crossing-hash semi-join is bounded by the postings of the crossing
  *    hashes, not by history size. Corpus-scale honesty: the table is
  *    token-window-grain (≈ corpus-sized); at 100 TB it is hash-bucket
  *    partitioned so the semi-join prunes to the buckets the day's
  *    crossings touch, and a [[graft.operators.BloomFilter]] pre-pass
  *    cuts the probe volume further.
  *  - `docs/` — accumulated normalized text, append-only: the token
  *    source for re-cleans (re-read SELECTIVELY via a doc-id semi-join,
  *    never scanned whole).
  *  - `clean/vK/` — the maintained output (same schema as
  *    [[SpanDedup.removeDuplicateSpans]]); each append MERGEs the
  *    changed-doc rows (today's docs + re-cleaned old docs) over the
  *    previous version — the #16 SCD1 discipline, version-swapped
  *    because a parquet dir cannot feed its own overwrite.
  *
  * Per-append cost: O(delta windows) hashing + one segment append + a
  * crossing-bounded re-clean — never O(history). The only history-sized
  * reads are the counts segment-sum (narrow (h,c) rows) and the clean
  * MERGE's carry-over of unchanged rows; both are the same shape the
  * incremental-agg (#93) and MERGE (#16) gates already pay, and both
  * partition-prune at scale (#108's mergePruned).
  *
  * Equality argument (why N appends ≡ one batch): counts only grow, so a
  * hash enters the duplicated set D = {h : count ≥ 2} at most once. Every
  * doc is cleaned on arrival against the then-current D, and re-cleaned
  * whenever one of ITS hashes crosses into D (postings finds it); a doc
  * whose hash set never gains a D-member keeps a clean text that is
  * already correct under the final D. Self-repeats (one doc carrying a
  * window twice) are occurrence counts ≥ 2 on day one, so they are in D
  * from the doc's first cleaning.
  */
object IncrementalSpanDedup {

  /** Bounded per-append audit (driver-side scalars, each one aggregate
    * row): what the spec pins to prove the re-clean path really fires.
    */
  final case class AppendStats(deltaDocs: Long, crossingHashes: Long,
                               recleanedOldDocs: Long)

  private def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def emptyLike(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(ddl))

  private def readOr(spark: SparkSession, dir: String, ddl: String): DataFrame =
    if (dirExists(spark, dir)) spark.read.parquet(dir) else emptyLike(spark, ddl)

  /** Latest clean version under `root` (0 = none yet). Listing + max is
    * deterministic and needs no marker file.
    */
  private def cleanVersion(spark: SparkSession, root: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$root/clean")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") => n.drop(1).toInt }
      .foldLeft(0)(math.max)
  }

  /** The maintained output: one row per ingested doc,
    * (idCol, n_tokens, n_removed, clean_text) — [[SpanDedup]]'s schema.
    */
  def result(spark: SparkSession, root: String, idCol: String): DataFrame = {
    val v = cleanVersion(spark, root)
    readOr(spark, s"$root/clean/v$v",
      s"$idCol long, n_tokens long, n_removed long, clean_text string")
  }

  /** Fold the count segments back to one (#49e's compaction discipline
    * applied to the span-count state): the logical count is already the
    * segment-sum, so compaction is a pure layout rewrite — one
    * partial-agg shuffle over the narrow (h, c) rows into a single
    * `seg=0`, swapped in with the retire-then-rename discipline. Run it
    * on whatever cadence keeps the per-append segment fan-in bounded;
    * the maintained output is invariant (spec-pinned).
    */
  def compactCounts(spark: SparkSession, root: String): Unit = {
    if (!dirExists(spark, s"$root/counts")) return
    val merged = spark.read.parquet(s"$root/counts")
      .groupBy(col("__h")).agg(sum(col("__c")).as("__c"))
    merged.write.mode("overwrite").parquet(s"$root/counts_tmp/seg=0")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/counts"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$root/counts_tmp"),
      new org.apache.hadoop.fs.Path(s"$root/counts"))
    (): Unit
  }

  /** Ingest one day's delta; updates every state table and the maintained
    * clean output. Returns the bounded audit scalars.
    */
  def append(spark: SparkSession, root: String, delta: DataFrame,
             idCol: String, textCol: String, spanTokens: Int): AppendStats = {
    require(spanTokens >= 2, s"span width must be >= 2, got $spanTokens")
    OpCache.scoped {
      // --- delta projections (SpanDedup's base/occ shapes) ---
      val base = OpCache.cache(delta
        .filter(col(idCol).isNotNull && col(textCol).isNotNull)
        .select(col(idCol).cast("long").as(idCol),
          TextFns.normalizeText(col(textCol)).as("__norm"))
        .filter(length(col("__norm")) > 0))
      val occ = OpCache.cache(base
        .filter(size(split(col("__norm"), " ")) >= spanTokens)
        .select(col(idCol), posexplode(
          TextShingles.shingleHashesAll(col("__norm"), spanTokens)))
        .select(col(idCol), col("pos"), col("col").as("__h")))
      val deltaCounts = OpCache.cache(
        occ.groupBy(col("__h")).agg(count(lit(1)).as("__c")))

      // --- crossing hashes: unique (or absent) before, duplicated now ---
      val oldCounts = readOr(spark, s"$root/counts", "__h int, __c long")
        .groupBy(col("__h")).agg(sum(col("__c")).as("__c"))
      val crossing = OpCache.cache(deltaCounts
        .join(oldCounts.withColumnRenamed("__c", "__old"), Seq("__h"), "left")
        .withColumn("__old", coalesce(col("__old"), lit(0L)))
        .filter(col("__old") < 2 && col("__old") + col("__c") >= 2)
        .select(col("__h")))

      // --- old docs to re-clean: postings of the crossing hashes ---
      val postings = readOr(spark, s"$root/postings", s"__h int, $idCol long")
      val affected = OpCache.cache(postings.join(crossing, Seq("__h"))
        .select(col(idCol)).distinct()
        .join(base.select(col(idCol)), Seq(idCol), "left_anti"))

      // --- re-clean set: all delta docs + affected old docs (text from
      // the docs state, read via a selective semi-join, never whole) ---
      val oldNorm = readOr(spark, s"$root/docs", s"$idCol long, __norm string")
        .join(affected, Seq(idCol))
      val toClean = OpCache.cache(base.unionByName(oldNorm)
        .withColumn("__toks", split(col("__norm"), " "))
        .withColumn("__n", size(col("__toks"))))

      // --- duplicated-position sets under the POST-append counts ---
      val newDups = oldCounts.withColumnRenamed("__c", "__old")
        .join(deltaCounts, Seq("__h"), "full")
        .filter(coalesce(col("__old"), lit(0L)) +
          coalesce(col("__c"), lit(0L)) >= 2)
        .select(col("__h"))
      val cleanOcc = toClean
        .filter(col("__n") >= spanTokens)
        .select(col(idCol), posexplode(
          TextShingles.shingleHashesAll(col("__norm"), spanTokens)))
        .select(col(idCol), col("pos"), col("col").as("__h"))
      val dupPos = cleanOcc.join(newDups, Seq("__h"))
        .groupBy(col(idCol)).agg(collect_list(col("pos")).as("__dup"))
      val span = spanTokens - 1
      val changed = toClean.join(dupPos, Seq(idCol), "left")
        .withColumn("__dup", coalesce(col("__dup"), array().cast("array<int>")))
        .withColumn("__kept", filter(col("__toks"),
          (t, j) => !exists(col("__dup"), p => p <= j && j <= p + span)))
        .select(col(idCol),
          col("__n").cast("long").as("n_tokens"),
          (col("__n") - size(col("__kept"))).cast("long").as("n_removed"),
          array_join(col("__kept"), " ").as("clean_text"))

      // --- audits BEFORE the state writes consume the cached frames ---
      val stats = AppendStats(
        deltaDocs = base.count(),
        crossingHashes = crossing.count(),
        recleanedOldDocs = affected.count())

      // --- state updates (delta-only appends + one versioned MERGE) ---
      val seg = cleanVersion(spark, root) // counts segment K = append index
      deltaCounts.write.mode("overwrite")
        .parquet(s"$root/counts/seg=${seg + 1}")
      occ.select(col("__h"), col(idCol)).distinct()
        .write.mode("append").parquet(s"$root/postings")
      base.write.mode("append").parquet(s"$root/docs")
      val prev = result(spark, root, idCol)
      prev.join(changed.select(col(idCol)), Seq(idCol), "left_anti")
        .unionByName(changed)
        .write.mode("overwrite").parquet(s"$root/clean/v${seg + 1}")
      stats
    }
  }
}
