package graft

import org.apache.spark.sql.functions._

import graft.operators.dedup.{DupClusters, IncrementalClusters}

/** [[IncrementalClusters]]: the invariants the q186 batching-invariance
  * gate cannot phrase — re-label CONFINEMENT (an append that bridges two
  * old clusters writes exactly the bridged components' members, nothing
  * else), idempotent batch retries, latest-wins resolution across
  * appends, equivalence to one-shot CC on random edge batchings, and
  * marker-preserving compaction.
  */
class IncrementalClustersSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("incclusters").toString

  private def append(dir: String, edges: Seq[(Long, Long)],
                     batchId: Option[Long] = None) =
    IncrementalClusters.append(spark, dir,
      edges.toDF("a_id", "b_id"), "a_id", "b_id", batchId)

  private def clustersOf(dir: String): Map[Long, (Long, Long)] =
    IncrementalClusters.clusters(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("a bridging append re-labels exactly the bridged components") {
    val dir = tmpDir()
    // three disjoint clusters: {1,2}, {5,6}, {8,9}
    append(dir, Seq((1L, 2L), (5L, 6L), (8L, 9L)))
    // bridge {1,2} and {5,6}; {8,9} must be untouched AND unwritten
    val delta = append(dir, Seq((2L, 5L))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(delta == Set((5L, 1L), (6L, 1L)),
      s"the delta must contain exactly the re-labeled members of the " +
        s"bridged component (2's rep is already 1; 8/9 are untouched): $delta")
    assert(clustersOf(dir) == Map(
      1L -> (1L, 4L), 2L -> (1L, 4L), 5L -> (1L, 4L), 6L -> (1L, 4L),
      8L -> (8L, 2L), 9L -> (8L, 2L)))
  }

  test("a new node below the old minimum re-labels the whole component") {
    val dir = tmpDir()
    append(dir, Seq((5L, 6L)))
    val delta = append(dir, Seq((1L, 6L))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(delta == Set((1L, 1L), (5L, 1L), (6L, 1L)),
      s"the smaller newcomer becomes the rep and every member re-labels: $delta")
  }

  test("edges within one component write nothing") {
    val dir = tmpDir()
    append(dir, Seq((1L, 2L), (2L, 3L)))
    assert(append(dir, Seq((1L, 3L))).count() == 0,
      "a delta edge between already-merged nodes must produce no rows")
    assert(clustersOf(dir)(3L) == (1L, 3L))
  }

  test("a retried applied batch no-ops and returns the frozen delta") {
    val dir = tmpDir()
    append(dir, Seq((1L, 2L)), batchId = Some(0L))
    append(dir, Seq((2L, 5L)), batchId = Some(1L))
    // retry batch 1 with DIFFERENT edges: frozen delta, state untouched
    val retried = append(dir, Seq((8L, 9L)), batchId = Some(1L)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(retried == Set((5L, 1L)),
      s"retry must return the originally-applied delta: $retried")
    assert(!clustersOf(dir).contains(8L),
      "the retried rows must never have entered the state")
  }

  test("any batching equals the one-shot CC (random graph)") {
    val rnd = new scala.util.Random(20L)
    val edges = Seq.fill(120)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val dir = tmpDir()
    edges.grouped(25).foreach(b => append(dir, b))
    val inc = clustersOf(dir)
    val oneShot = DupClusters.components(
        edges.toDF("a", "b"), "a", "b").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(inc == oneShot,
      s"incremental folds must equal the one-shot closure")
  }

  test("compaction folds the state; markers and labels survive") {
    val dir = tmpDir()
    append(dir, Seq((1L, 2L)), batchId = Some(0L))
    append(dir, Seq((2L, 5L)), batchId = Some(1L))
    val before = clustersOf(dir)
    assert(IncrementalClusters.compact(spark, dir) == 2)
    assert(IncrementalClusters.compact(spark, dir) == 0, "idempotent re-run")
    assert(clustersOf(dir) == before, "the fold must not move labels")
    // the batch dirs survive as markers: a retry of batch 0 still no-ops
    assert(append(dir, Seq((8L, 9L)), batchId = Some(0L)).count() == 0,
      "a retry of a folded batch must no-op on its sentinel marker")
    assert(!clustersOf(dir).contains(8L))
    // and a genuinely new batch still folds against the compacted state
    append(dir, Seq((5L, 7L)), batchId = Some(2L))
    assert(clustersOf(dir)(7L) == (1L, 4L)) // {1,2,5,7}
  }

  test("auto-numbering skips ledger id gaps (max+1, not count)") {
    val dir = tmpDir()
    append(dir, Seq((1L, 2L)), batchId = Some(0L))
    append(dir, Seq((5L, 6L)), batchId = Some(2L)) // gap: stream-driven ids
    // count-based numbering would compute id 2 and silently return the
    // frozen batch-2 delta instead of appending
    val delta = append(dir, Seq((8L, 9L))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(delta == Set((8L, 8L), (9L, 8L)),
      s"the gap-spanning append must land as a NEW batch: $delta")
  }
}
