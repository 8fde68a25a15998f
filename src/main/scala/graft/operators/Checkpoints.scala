package graft.operators

import org.apache.spark.sql.DataFrame

/** localCheckpoint with an explicit release handle — for ITERATIVE
  * operators ([[PageRank]], [[BpeTrain]]) that checkpoint a frame per
  * round to truncate lineage. A bare `localCheckpoint()` per round never
  * releases the prior round's blocks, so storage grows linearly with the
  * round count: fine at 5 PageRank rounds or a gate's 8 BPE merges, but a
  * realistic 30k-merge tokenizer run would pin thousands of dead copies
  * of the vocab frame. Spark exposes no public unpersist on a
  * checkpointed Dataset, so the handle diffs the context's persistent-RDD
  * registry around the (eager) checkpoint and unpersists exactly the
  * blocks that call pinned.
  *
  * Contract: the checkpoint is EAGER (materialized before return), and
  * the caller releases round k's handle only AFTER round k+1's checkpoint
  * materializes — the standard alternating-frame discipline. The registry
  * diff assumes no CONCURRENT persist on the same SparkContext between
  * entry and exit — this is a HARD requirement, not advisory: a plain
  * `cache()` swept into the diff would merely be released early and
  * recompute from lineage, but another `localCheckpoint()` swept in has
  * its lineage TRUNCATED, so early unpersist destroys the only copy and
  * later reads fail with missing-block errors. Driver-side iterative
  * loops are single-threaded today; any future concurrent caller must
  * serialize checkpoint creation or use separate SparkContexts.
  */
object Checkpoints {

  /** Eagerly localCheckpoint `df`; returns the checkpointed frame and a
    * release thunk that unpersists the blocks this checkpoint pinned.
    * Safe to call the thunk more than once.
    */
  def releasable(df: DataFrame): (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cp = df.localCheckpoint()
    val pinned = sc.getPersistentRDDs.keySet -- before
    val release = () => pinned.foreach { id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    }
    (cp, release)
  }
}
