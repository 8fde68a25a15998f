package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.OpCache

/** INCREMENTAL image-hash index — the daily-append discipline (#30h's
  * incremental span state, #36f's incremental IVF) for the 41c banded
  * Hamming retrieval: a production image-dedup pipeline does not re-pair
  * yesterday's billion images when today's crawl lands; it keeps the
  * banded hash index ON DISK, assigns only the delta, and re-pairs only
  * the buckets the delta touches.
  *
  * Layout under `indexDir` (BOTH tables batch-keyed, so appends are
  * idempotent and rollback-able per batch):
  *   - `postings/batch=N/band=B/` — the persisted band-bucket postings
  *     (key, hid, dhash, ahash) WITH the hash columns riding, so the
  *     popcount verify executes AT the delta-vs-store bucket join (the
  *     load-bearing order [[ImageHash.nearDupPairs]] documents:
  *     correlated corpora produce ~25× more bucket candidates than true
  *     pairs, and the cut must kill them before any exchange). 16 extra
  *     bytes per posting row buys that — the LSH-index trade every
  *     production system makes;
  *   - `pairs/batch=N/` — the PAIRS LEDGER: each append's newly-formed
  *     pairs, frozen; published LAST, so it doubles as the batch's
  *     applied marker (the streaming sink's retry no-op).
  *
  * [[append]] hashes the day's images, pairs them against themselves AND
  * against the stored postings sharing a band key, persists the result
  * as this batch's ledger entry, THEN appends the delta postings — so
  * the returned frame is exactly the pairs NEW with this batch, and the
  * union of every append's output equals the one-shot batch pairing of
  * the full corpus ([[ImageHash.nearDupPairs]]): a pair is new precisely
  * when its later member arrives (the q126/q131 batching-invariance
  * contract, oracle-gated by q178).
  *
  * Contracts: image ids must be NEW each append (the zone discipline —
  * exact/content dedup runs upstream; re-appending an id would duplicate
  * its postings and re-emit its pairs). The returned frame reads the
  * batch's OWN frozen ledger dir — never the live postings path: a lazy
  * plan over the postings would re-pair against every LATER append when
  * finally evaluated (Spark refreshes file indexes on write — caught
  * live as a 3.5× over-count), and the ledger is also the production
  * artifact: downstream CC clustering consumes the pair log
  * incrementally instead of rescanning history.
  *
  * Scale shape: the delta-vs-index join touches only stored buckets
  * whose (band, key) a delta image shares — a hash-partitioned exchange
  * of the delta postings plus the matching index rows; at warehouse
  * scale the postings table is bucketed by `key` so that join is
  * storage-co-located (here partitioned by `band` — the layout knob, not
  * the contract). Nothing rescans yesterday's pairs.
  */
object ImageHashIndex {

  private def postingsSchema = StructType(Seq(
    StructField("band", IntegerType), StructField("key", LongType),
    StructField("hid", LongType), StructField("dhash", LongType),
    StructField("ahash", LongType)))

  private def pairsSchema = StructType(Seq(
    StructField("a_id", LongType), StructField("b_id", LongType),
    StructField("ham_d", IntegerType), StructField("ham_a", IntegerType)))

  /** Hash + index the day's images; return the pairs NEW with this
    * batch: (a_id, b_id, ham_d, ham_a), a_id < b_id by ID (not arrival).
    *
    * `batchId`: None (the daily-driver path) auto-numbers by ledger
    * count; Some(id) (the STREAMING foreachBatch path) keys both tables
    * by the stream's batch id and makes the append IDEMPOTENT — a
    * retried micro-batch whose publish completed returns its frozen
    * ledger without touching anything, and a partially-published crash
    * (one table's batch dir present without the other's) is rolled back
    * and redone. Publish protocol: both tables stage under hidden dirs
    * (invisible to the parquet reads), postings rename first, the PAIRS
    * rename LAST — the pairs dir is the applied marker, so the marker
    * can never exist without the postings it was computed against.
    */
  def append(spark: SparkSession, indexDir: String, images: DataFrame,
             idCol: String, blobCol: String,
             maxHamming: Int = ImageHash.DefaultMaxHamming,
             bands: Int = ImageHash.DefaultMaxHamming + 1,
             batchId: Option[Long] = None): DataFrame = {
    require(bands >= 1 && bands <= ImageHash.Bits,
      s"bands in [1,${ImageHash.Bits}], got $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"banded retrieval is exact only for maxHamming < bands, " +
        s"got maxHamming=$maxHamming bands=$bands")
    val postPath = s"$indexDir/postings"
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bid = batchId.getOrElse(nextBatchId(spark, s"$indexDir/pairs").toLong)
    val pairsDir = new org.apache.hadoop.fs.Path(s"$indexDir/pairs/batch=$bid")
    val postDir = new org.apache.hadoop.fs.Path(s"$postPath/batch=$bid")
    if (fs.exists(pairsDir)) {
      // the marker publishes LAST, so its presence proves the postings
      // landed too — a retried applied batch is a pure read
      return spark.read.schema(pairsSchema).parquet(pairsDir.toString)
    }
    // crashed partial publish (postings without the marker): roll back
    // so the pair computation below sees a store WITHOUT this batch
    if (fs.exists(postDir))
      require(fs.delete(postDir, true), s"rollback $postDir failed")
    // the delta postings feed three consumers (both dd sides, dx, the
    // persist) over the whole decode+hash lineage — decode once
    val deltaPost = OpCache.cache(ImageHash.bandedPostings(
      ImageHash.hashes(spark, images, idCol, blobCol)
        .filter(col("dhash").isNotNull)
        .select(col(idCol).cast("long").as("hid"), col("dhash"),
          col("ahash")),
      "hid", bands)
      .select(col("band"), col("key"), col("hid"), col("dhash"),
        col("ahash")))
    val storedPost = readPostings(spark, postPath)
    def sided(df: DataFrame, s: String): DataFrame =
      df.select(col("band"), col("key"), col("hid").as(s + "_id"),
        col("dhash").as(s + "_d"), col("ahash").as(s + "_a"))
    val ham = bit_count(col("a_d").bitwiseXOR(col("b_d")))
    // delta×delta plus delta×stored, popcount-verified AT each bucket
    // join; pair ids ordered by ID so arrival order never shows
    val dd = sided(deltaPost, "a").join(sided(deltaPost, "b"),
        Seq("band", "key"))
      .filter(col("a_id") < col("b_id") && ham <= maxHamming)
    val dx = sided(deltaPost, "a").join(sided(storedPost, "b"),
        Seq("band", "key"))
      .filter(ham <= maxHamming)
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"),
        col("a_d"), col("b_d"), col("a_a"), col("b_a"))
    val pairs = dd.select(col("a_id"), col("b_id"), col("a_d"),
        col("b_d"), col("a_a"), col("b_a"))
      .unionByName(dx)
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_d").bitwiseXOR(col("b_d"))).cast("int").as("ham_d"),
        bit_count(col("a_a").bitwiseXOR(col("b_a"))).cast("int").as("ham_a"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(min(col("ham_d")).as("ham_d"), min(col("ham_a")).as("ham_a"))
    // Publish protocol (the SwapWrite discipline over two tables):
    //   1. STAGE the pairs — this EXECUTES the pair plan against the
    //      pre-append store (hidden staging dirs are invisible to the
    //      storedPost read);
    //   2. publish the postings (stage + rename);
    //   3. rename the pairs staging into place LAST — the applied
    //      marker, so it can never exist without the postings it was
    //      computed against. A crash in any window leaves either hidden
    //      stagings (deleted and redone on retry) or postings without
    //      the marker (rolled back at the top of this method).
    def stage(df: DataFrame, staging: org.apache.hadoop.fs.Path,
              partitionCols: Seq[String]): Unit = {
      if (fs.exists(staging))
        require(fs.delete(staging, true), s"delete stale $staging failed")
      val w = df.write.mode("error")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(staging.toString)
    }
    def rename(staging: org.apache.hadoop.fs.Path,
               target: org.apache.hadoop.fs.Path): Unit = {
      fs.mkdirs(target.getParent)
      require(fs.rename(staging, target), s"publish $staging -> $target failed")
    }
    val pairsStaging =
      new org.apache.hadoop.fs.Path(s"$indexDir/pairs/.staging_$bid")
    val postStaging =
      new org.apache.hadoop.fs.Path(s"$postPath/.staging_$bid")
    stage(pairs, pairsStaging, Nil)
    stage(deltaPost, postStaging, Seq("band"))
    rename(postStaging, postDir)
    rename(pairsStaging, pairsDir)
    spark.read.schema(pairsSchema).parquet(pairsDir.toString)
  }

  /** All published postings batches (the hidden stagings and the
    * `batch=` partition column stripped): the store the delta joins.
    */
  private def readPostings(spark: SparkSession, postPath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(postPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("batch="))
    // explicit schema: an all-junk batch publishes an EMPTY postings dir
    // (no parquet footer to infer from), which is still a valid store
    if (hasData)
      spark.read.schema(postingsSchema).parquet(postPath)
        .select(col("band").cast("int").as("band"), col("key"), col("hid"),
          col("dhash"), col("ahash"))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], postingsSchema)
  }

  /** The full pairs LEDGER (every batch's new pairs, `batch` stripped) —
    * what downstream CC clustering consumes.
    */
  def pairs(spark: SparkSession, indexDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/pairs")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("batch="))
    require(hasData, s"no published ledger batches under $p")
    spark.read.schema(pairsSchema).parquet(p.toString)
      .select(col("a_id"), col("b_id"), col("ham_d").cast("int").as("ham_d"),
        col("ham_a").cast("int").as("ham_a"))
  }

  /** Fold every published postings batch into ONE `batch=<maxId>` dir —
    * the table-maintenance step a daily-append index needs (the #49e
    * compaction discipline, and the same reason the stream-offset file
    * log compacts): each append adds a batch dir, and at crawl cadence
    * the delta-vs-store join's file listing grows linearly with history.
    * The PAIRS ledger is untouched — its entries are frozen facts (and
    * the idempotence markers for streaming retries, which therefore
    * keep no-oping across compactions). Folding into the MAX covered id
    * can never collide with a future append: stream batch ids only
    * grow, and the manual path numbers by ledger count, which
    * compaction does not change.
    *
    * Swap protocol = [[graft.sources.Compaction.compactDir]]'s
    * retire-then-rename over the postings ROOT: stage the folded copy
    * as a hidden sibling, retire the live root, rename the staging in,
    * delete the retired copy — an in-process failure restores the old
    * root, and no window exists where readers see doubled rows. Returns
    * the number of batch dirs folded (0 = already compact, free to
    * re-run). Single-writer discipline, like [[append]].
    */
  def compact(spark: SparkSession, indexDir: String): Int = {
    val postRoot = new org.apache.hadoop.fs.Path(s"$indexDir/postings")
    val fs = postRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(postRoot)) return 0
    val batchDirs = fs.listStatus(postRoot).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith("batch="))
    if (batchDirs.length < 2) return 0
    val maxId = batchDirs.map(_.getPath.getName.stripPrefix("batch=").toLong).max
    val uuid = java.util.UUID.randomUUID
    val staging = new org.apache.hadoop.fs.Path(
      postRoot.getParent, s".postings-compact-$uuid")
    val retired = new org.apache.hadoop.fs.Path(
      postRoot.getParent, s".postings-retired-$uuid")
    readPostings(spark, postRoot.toString)
      .write.mode("error").partitionBy("band")
      .parquet(s"$staging/batch=$maxId")
    def mustRename(from: org.apache.hadoop.fs.Path,
                   to: org.apache.hadoop.fs.Path): Unit =
      require(fs.rename(from, to), s"rename $from -> $to failed")
    try {
      mustRename(postRoot, retired)
      try mustRename(staging, postRoot)
      catch {
        case scala.util.control.NonFatal(e) =>
          require(fs.rename(retired, postRoot),
            s"swap AND restore failed — data intact at $retired and $staging")
          throw e
      }
      require(fs.delete(retired, true), s"delete $retired failed")
    } finally {
      if (fs.exists(staging) && fs.exists(postRoot)) fs.delete(staging, true)
    }
    batchDirs.length
  }

  /** Next ledger batch number = count of existing `batch=` dirs. */
  private def nextBatchId(spark: SparkSession, pairsPath: String): Int = {
    val p = new org.apache.hadoop.fs.Path(pairsPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(s =>
      s.isDirectory && s.getPath.getName.startsWith("batch="))
  }
}
