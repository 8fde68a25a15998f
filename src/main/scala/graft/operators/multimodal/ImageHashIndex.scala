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
  * Layout under `indexDir`:
  *   - `postings/` — (key, hid, dhash, ahash) partitioned by `band`:
  *     the persisted band-bucket postings WITH the hash columns riding,
  *     so the popcount verify executes AT the delta-vs-store bucket
  *     join (the load-bearing order [[ImageHash.nearDupPairs]]
  *     documents: correlated corpora produce ~25× more bucket
  *     candidates than true pairs, and the cut must kill them before
  *     any exchange). 16 extra bytes per posting row buys that — the
  *     LSH-index trade every production system makes;
  *   - `pairs/batch=N/` — the PAIRS LEDGER: each append's newly-formed
  *     pairs, frozen.
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

  private def readOrEmpty(spark: SparkSession, path: String,
                          schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Hash + index the day's images; return the pairs NEW with this
    * batch: (a_id, b_id, ham_d, ham_a), a_id < b_id by ID (not arrival).
    */
  def append(spark: SparkSession, indexDir: String, images: DataFrame,
             idCol: String, blobCol: String,
             maxHamming: Int = ImageHash.DefaultMaxHamming,
             bands: Int = ImageHash.DefaultMaxHamming + 1): DataFrame = {
    require(bands >= 1 && bands <= ImageHash.Bits,
      s"bands in [1,${ImageHash.Bits}], got $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"banded retrieval is exact only for maxHamming < bands, " +
        s"got maxHamming=$maxHamming bands=$bands")
    val postPath = s"$indexDir/postings"
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
    val storedPost = readOrEmpty(spark, postPath, postingsSchema)
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
    // ledger write EXECUTES the pair plan against the pre-append store;
    // only then does the delta land in the index. mode("error"): a batch
    // dir collision means two appends raced — fail, never interleave.
    val batchId = nextBatchId(spark, s"$indexDir/pairs")
    val batchDir = s"$indexDir/pairs/batch=$batchId"
    pairs.write.mode("error").parquet(batchDir)
    deltaPost.write.mode("append").partitionBy("band").parquet(postPath)
    spark.read.schema(pairsSchema).parquet(batchDir)
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
