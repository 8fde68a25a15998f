package graft

import org.apache.spark.sql.functions._

import graft.operators.{BpeTrain, Checkpoints}

/** Contracts of the releasable-checkpoint handle the iterative operators
  * (PageRank, BpeTrain) lean on for O(1)-in-rounds storage: the
  * checkpointed frame is correct, release really unpersists the pinned
  * blocks, releasing is idempotent, and a multi-round trainer run leaves
  * no dead vocab copies behind.
  */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def pinnedCount: Int = spark.sparkContext.getPersistentRDDs.size

  test("releasable checkpoints eagerly, release unpersists, idempotent") {
    val before = pinnedCount
    val (cp, release) = Checkpoints.releasable(
      Seq(1L, 2L, 3L).toDF("x").withColumn("y", col("x") * 2))
    assert(pinnedCount > before, "checkpoint pinned no blocks")
    // the frame is correct and re-readable
    assert(cp.agg(sum("y")).head().getLong(0) == 12L)
    release()
    assert(pinnedCount == before, "release left blocks pinned")
    release() // safe to call twice
    assert(pinnedCount == before)
    // a released checkpoint's data is gone by contract; callers hold the
    // alternating-frame discipline (release k only after k+1 is live)
  }

  test("a multi-round BPE training run leaves no pinned vocab copies") {
    val before = pinnedCount
    val docs = Seq("low lower lowest low low", "new newer newest new",
      "wide wider widest wide").toDF("text")
    val merges = BpeTrain.merges(docs, "text", numMerges = 6)
    assert(merges.count() == 6)
    assert(pinnedCount == before,
      s"merge rounds leaked checkpoint blocks: $before -> $pinnedCount")
  }
}
