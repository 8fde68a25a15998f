package graft

import org.apache.spark.sql.functions._

import graft.operators.similarity.IvfIncremental
import graft.queries.{IvfQueries, SimilarityQueries}

/** Guards for the q126 incremental-IVF contract beyond what the oracle
  * replays: maintenance must be batching-invariant (appending in any
  * split equals one batch append — the frozen-centroid argument made
  * executable), the appended vectors must actually be searchable, and a
  * day's append must not touch base state.
  */
class IvfIncrementalSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf("0.001"))

  private lazy val base = emb.filter(col("vec_id") % IvfQueries.DeltaMod =!= 0)
  private lazy val delta = emb.filter(col("vec_id") % IvfQueries.DeltaMod === 0)

  private def build() = IvfIncremental.build(base, "vec_id", "embedding",
    IvfQueries.NCentroids, IvfQueries.TrainIters, SimilarityQueries.Dims)

  private def results(idx: IvfIncremental.Index) =
    IvfIncremental.search(idx, _ < 10, SimilarityQueries.K, IvfQueries.Probes)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("append is batching-invariant: two half-deltas equal one full delta") {
    val oneShot = results(
      IvfIncremental.append(build(), delta, "vec_id", "embedding"))
    val d1 = delta.filter(col("vec_id") % (2 * IvfQueries.DeltaMod) === 0)
    val d2 = delta.filter(col("vec_id") % (2 * IvfQueries.DeltaMod) =!= 0)
    val twoStep = results(
      IvfIncremental.append(
        IvfIncremental.append(build(), d1, "vec_id", "embedding"),
        d2, "vec_id", "embedding"))
    assert(oneShot == twoStep)
    assert(oneShot.nonEmpty)
  }

  test("appended vectors are live in the index: delta ids appear as neighbors") {
    val appended = IvfIncremental.append(build(), delta, "vec_id", "embedding")
    val res = results(appended)
    assert(res.exists { case (_, n, _) => n % IvfQueries.DeltaMod == 0 },
      "no delta vector surfaced as a neighbor — append not searchable")
    // delta ids < 10 also act as queries
    assert(res.exists { case (q, _, _) => q % IvfQueries.DeltaMod == 0 })
  }

  test("persisted index: cluster_id-partitioned layout prunes to the probed cells") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_").toString
    try {
      val idx = IvfIncremental.append(build(), delta, "vec_id", "embedding")
      IvfIncremental.writeAssigned(idx, dir)
      val read = IvfIncremental.readAssigned(spark, dir)
      // pruning checks run FIRST: the search below OpCaches the read
      // frame, and CacheManager would then serve any same-plan scan from
      // InMemoryRelation — hiding the parquet scan these assertions probe.
      // The probe's defining property: a cell filter becomes a PARTITION
      // filter on the scan — only the probed directories are read
      val probed = read.filter(col("cluster_id").isin(0L, 3L))
      val plan = probed.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("PartitionFilters") &&
        plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cluster_id[^\\]]*\\].*"),
        s"cluster_id filter did not reach the scan's partition filters:\n$plan")
      // pruning is real, not just planned: the probed scan lists at most
      // the 2 probed cell directories, while an unfiltered scan lists all
      def partitionCount(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.selectedPartitions.partitionCount
        }.head
      val full = partitionCount(read)
      val pruned = partitionCount(probed)
      assert(pruned <= 2 && full > pruned,
        s"pruning ineffective: $pruned of $full partitions scanned")
      // searching the disk-backed table equals searching the in-memory one
      val fromDisk = results(idx.copy(assigned = read))
      assert(fromDisk == results(idx))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("append costs O(delta): the base assignment frame is reused untouched") {
    val idx = build()
    val appended = IvfIncremental.append(idx, delta, "vec_id", "embedding")
    // the appended table restricted to base ids IS the base table — no
    // base row was reassigned or recomputed
    val baseRows = idx.assigned.select("vid", "cluster_id")
    val appendedBaseRows = appended.assigned
      .filter(col("vid") % IvfQueries.DeltaMod =!= 0)
      .select("vid", "cluster_id")
    assert(appendedBaseRows.exceptAll(baseRows).count() == 0 &&
      baseRows.exceptAll(appendedBaseRows).count() == 0)
  }
}
