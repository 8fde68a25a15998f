package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** INCREMENTAL IVF index maintenance — the similarity-side sibling of the
  * incremental-dedup (#104) and partition-pruned-MERGE (#108) disciplines:
  * append a daily embedding delta to a trained IVF index WITHOUT a full
  * rebuild, and search the maintained index as if it were built in one
  * pass.
  *
  * The index is two artifacts, matching how production vector warehouses
  * persist IVF state:
  *  - the FROZEN trained centroids (a k·dims int64 array — a tiny offline
  *    artifact; production retrains on a slow cadence, never per delta);
  *  - the assignment table (vid, vec, nrm, cluster_id), which at scale is
  *    a parquet table partitioned by `cluster_id` so probes prune
  *    partitions.
  *
  * [[append]] assigns ONLY the delta (the [[IvfAnn.assignViaProbe]]
  * codegen broadcast fold — zero shuffle on either side) and unions it
  * into the table; base rows are never touched or re-read, which is the
  * entire point: a day's maintenance costs O(delta), not O(corpus). At
  * the warehouse layer the union is a partition append (the #19
  * partition-overwrite discipline on `cluster_id`/date).
  *
  * Because centroids are frozen, assignment is a pure per-vector
  * function: append-then-search is EXACTLY equal to assigning the union
  * corpus in one batch pass — order- and batching-invariant (spec-pinned:
  * append(d1)+append(d2) ≡ append(d1∪d2)), and the q126 oracle replays
  * train-on-base → assign-union → probe → re-rank in DuckDB. Drift
  * between frozen centroids and a growing corpus is the operator's
  * documented trade-off; when cell occupancy skews, rebuild offline with
  * [[IvfAnn.searchTrained]]'s training path and swap the artifacts.
  */
object IvfIncremental {

  /** A maintained IVF index: frozen quantized centroids + the assignment
    * table. `cents` is the one-row broadcastable centroid frame both
    * probing and (re)assignment derive from `trained`.
    */
  final case class Index(trained: Array[Array[Long]], cents: DataFrame,
                         assigned: DataFrame)

  /** Build the initial index: train on `base` (optionally modulus-sampled
    * like [[IvfAnn.assignTrainedSampled]]), assign every base vector.
    */
  def build(base: DataFrame, idCol: String, vecCol: String,
            nCentroids: Int, trainIters: Int, dims: Int,
            sampleModulus: Int = 1): Index = {
    require(sampleModulus >= 1, s"bad sample modulus $sampleModulus")
    val v = graft.operators.OpCache.cache(project(base, idCol, vecCol))
    val sample =
      if (sampleModulus == 1) v else v.filter(col("vid") % sampleModulus === 0)
    val qz = graft.operators.OpCache.cache(
      KMeansExact.quantized(sample, "vid", "vec", dims))
    val trained = KMeansExact.train(qz, nCentroids, trainIters, dims)
    Index(trained, IvfAnn.trainedCentroidRow(v, trained),
      IvfAnn.assignViaProbe(v, trained))
  }

  /** Append a delta: assign the NEW vectors with the frozen centroids and
    * union them into the assignment table. O(delta) work; the base
    * assignment is reused as-is.
    */
  def append(index: Index, delta: DataFrame, idCol: String,
             vecCol: String): Index =
    index.copy(assigned = index.assigned.unionByName(
      IvfAnn.assignViaProbe(project(delta, idCol, vecCol), index.trained)))

  /** Top-k probe search over the maintained index (same contract as
    * [[IvfAnn.search]]: probe the `probes` closest cells, exact cosine
    * re-rank). Appended vectors participate as queries AND neighbors.
    *
    * Cache lifecycle contract: the assignment frame is pinned via
    * [[graft.operators.OpCache.cache]], which registers it for release
    * only when the CALLER runs inside `OpCache.scoped { ... }` (Verify
    * and Bench wrap every query that way; q126 therefore leaks nothing).
    * A long-lived session calling this directly must wrap the call AND
    * its terminal action in `OpCache.scoped`, or the cached assignment
    * lineage persists until session-level cache eviction.
    */
  def search(index: Index, queryPred: Column => Column, k: Int,
             probes: Int): DataFrame =
    IvfAnn.searchAssigned(graft.operators.OpCache.cache(index.assigned),
      index.cents, queryPred, k, probes)

  private def project(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("vid"), col(vecCol).as("vec"),
      VectorFns.norm(col(vecCol)).as("nrm"))

  /** Assign a delta against FROZEN trained centroids without touching any
    * index state — the pure per-vector function both [[append]] and the
    * streaming maintenance sink
    * ([[graft.streaming.IvfStreamSink]]) ride: broadcast-centroid codegen
    * probe, zero shuffle on either side.
    */
  def assignDelta(delta: DataFrame, trained: Array[Array[Long]],
                  idCol: String, vecCol: String): DataFrame =
    IvfAnn.assignViaProbe(project(delta, idCol, vecCol), trained)

  /** Persist the assignment table PARTITIONED BY cluster_id — the
    * warehouse layout the IVF design argument rests on: a probe that
    * touches `probes` cells reads `probes` directories and Spark's
    * partition pruning skips every other file (IvfIncrementalSpec pins
    * `PartitionFilters` + the selected-partition count in the scan node).
    * A daily [[append]] then writes ONLY the delta's cell directories
    * (dynamic partition overwrite — the #19 discipline), so maintenance
    * I/O is O(delta) like the compute.
    */
  def writeAssigned(index: Index, path: String): Unit =
    index.assigned.write.partitionBy("cluster_id")
      .mode("overwrite").parquet(path)

  /** Read a persisted assignment table back into searchable form.
    * Partition-column type inference would narrow cluster_id to INT (its
    * values are small); cast it back to LONG so the frame is
    * schema-identical to what [[build]]/[[append]] produce and unions
    * with in-memory deltas stay legal.
    */
  def readAssigned(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame = {
    val df = spark.read.parquet(path)
    df.select(col("vid"), col("vec"), col("nrm"),
      col("cluster_id").cast("long").as("cluster_id"))
  }
}
