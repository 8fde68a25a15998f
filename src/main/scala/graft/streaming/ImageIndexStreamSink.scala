package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.multimodal.{AudioHashIndex, ImageHashIndex}

/** STREAMING image-hash index maintenance — the q152/q161 sink
  * discipline applied to [[ImageHashIndex]]: a `foreachBatch` sink that
  * appends each micro-batch of crawled images to the on-disk banded
  * index, pairing only the buckets the batch touches. The maintained
  * state is append-only (hashing is a pure per-image function), so
  * per-batch I/O is O(delta) — never a corpus rewrite.
  *
  * Exactly-once rides [[ImageHashIndex.append]]'s batch-keyed publish
  * protocol verbatim: both tables stage hidden, the pairs ledger dir
  * renames last and IS the applied marker — a foreachBatch retry of an
  * applied batch returns the frozen ledger without touching anything, a
  * crashed partial publish rolls back and redoes. The monoid contract
  * (gate-pinned by q181): after ANY batching of the corpus, the ledger
  * union equals the one-shot batch pairing — a pair lands exactly once,
  * in its later member's batch, ordered by id not arrival.
  */
object ImageIndexStreamSink {

  /** The `foreachBatch` body. Idempotent per batchId. */
  def appendBatch(indexDir: String, idCol: String, blobCol: String)
                 (batch: DataFrame, batchId: Long): Unit = {
    ImageHashIndex.append(batch.sparkSession, indexDir, batch,
      idCol, blobCol, batchId = Some(batchId))
    ()
  }

  /** The accumulated pairs ledger — the stream's queryable output. */
  def readPairs(spark: org.apache.spark.sql.SparkSession,
                indexDir: String): DataFrame =
    ImageHashIndex.pairs(spark, indexDir)
}

/** The audio twin — [[graft.operators.multimodal.AudioHashIndex]]
  * driven by `foreachBatch` with the identical exactly-once contract
  * (the generic [[graft.operators.multimodal.BandedHashIndex]] publish
  * protocol both modalities now share): a retried micro-batch no-ops on
  * the pairs-ledger marker, a crashed partial publish rolls back and
  * redoes, and the ledger union over any batching equals the one-shot
  * [[graft.operators.multimodal.AudioHash.nearDupPairs]].
  */
object AudioIndexStreamSink {

  /** The `foreachBatch` body. Idempotent per batchId. */
  def appendBatch(indexDir: String, idCol: String, blobCol: String)
                 (batch: DataFrame, batchId: Long): Unit = {
    AudioHashIndex.append(batch.sparkSession, indexDir, batch,
      idCol, blobCol, batchId = Some(batchId))
    ()
  }

  /** The accumulated pairs ledger — the stream's queryable output. */
  def readPairs(spark: org.apache.spark.sql.SparkSession,
                indexDir: String): DataFrame =
    AudioHashIndex.pairs(spark, indexDir)
}
