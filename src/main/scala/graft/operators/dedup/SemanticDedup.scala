package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.similarity.{IvfAnn, VectorFns}

/** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
  * arXiv:2303.09540 — the embedding-space complement of the lexical dedup
  * family): cluster the embedding space with trained k-means, then drop,
  * WITHIN each cluster, every vector that has a near-identical neighbor
  * (cosine above `threshold`) carrying a smaller id. Near-duplicate pair
  * work is confined to cells — never the corpus cross product — which is
  * the published method's entire point: semantic duplicates land in the
  * same cluster, so the quadratic pair scan runs on cell-sized frames.
  *
  * Keep rule: deterministic min-id-wins PER PAIR (a vector is dropped iff
  * a smaller-id vector above the threshold shares its cluster) — ids are
  * stable, so reruns keep identical survivors. This is SemDeDup's
  * keep-one-per-pair-relation discipline, not transitive-closure
  * clustering ([[DupClusters]] exists for that). Note the rule tests
  * against ALL smaller-id above-threshold neighbors, kept or dropped: a
  * chain a~b~c with cos(a,c) below the threshold keeps ONLY a — b drops
  * against a, and c drops against b even though b itself was dropped.
  * (Testing only against kept vectors would keep c; both disciplines
  * appear in practice, this operator and its oracle pin the former.)
  *
  * Approximation contract: a duplicate pair SPLIT by the cluster
  * boundary is missed. How often that happens depends on the threshold
  * regime: at SemDeDup's usual ~0.95 (truly near-identical embeddings)
  * duplicates co-locate almost surely; at low thresholds — where pairs
  * are merely related, like the test corpus whose max pair cosine is
  * ~0.48 — boundary splits are common and `nCentroids` is the recall/cost
  * dial (SemanticDedupSpec measures 0.62 at k=2 vs 0.30 at k=8 on that
  * corpus). Raise `nCentroids` to shrink cells (cost) at the price of
  * more boundary splits (recall), exactly the paper's trade-off; use the
  * exact banded path ([[graft.operators.similarity.CosinePairs]]) when a
  * low-threshold band needs full recall.
  *
  * Scale shape: per-cell pairs are O((n/k)²); hold n/k constant by
  * scaling `nCentroids` with the corpus (the IVF/NSW occupancy
  * discipline) and total pair mass stays linear in n. The pair join
  * carries (id, vec, nrm) only; assignment is the zero-corpus-shuffle
  * broadcast fold ([[IvfAnn.assignTrained]]), so the operator's only
  * corpus-keyed Exchange is the cluster-id shuffle for the self-join.
  */
object SemanticDedup {

  /** Base cell count (n ≤ BaseCells·TargetCell keeps it — all shipped
    * test scale factors land here, so the ladder changes nothing locally).
    */
  val BaseCells = 8
  /** Cell cap: assignment scores every cell per vector (n·k work), so k
    * is bounded like [[graft.operators.similarity.NswAnn.MaxHubs]].
    * Coverage is MaxCells·TargetCell ≈ 1.05M vectors; past it, cells
    * grow linearly and pair mass grows with them (the 100× probe of the
    * q124 chunk corpus measured the first ~30% overshoot as a mild 1.3×
    * — not a cliff, but the trend). Raising the cap alone would push the
    * flat n·k assignment toward quadratic; the next rung is a TWO-LEVEL
    * assignment (coarse cells ≤256, then fine cells trained within each
    * coarse cell) making assignment n·(k_c + k_f) while the ladder keeps
    * scaling — the standard IVF hierarchy, left for the next decade of
    * corpus growth.
    */
  val MaxCells = 4096
  /** Target cell occupancy: cells grow with the corpus so the per-cell
    * pair scan stays ~TargetCell² per cell. A FIXED cell count saturates
    * quadratically — the round-12 100× probe measured exactly that
    * (200k vectors / 8 cells = 25k-vector cells → 198× wall-clock at
    * 100× data). Integer doubling ladder, NOT a float log: the DuckDB
    * oracle must pick the identical count on every engine.
    */
  val TargetCell = 256

  def adaptiveCells(n: Long): Int = {
    require(MaxCells >= BaseCells && (MaxCells & (MaxCells - 1)) == 0 &&
      (BaseCells & (BaseCells - 1)) == 0,
      s"MaxCells=$MaxCells must be a power-of-2 multiple of BaseCells=$BaseCells")
    var k = BaseCells
    while (n > k.toLong * TargetCell && k < MaxCells) k <<= 1
    k
  }

  /** (vec_id, cluster_id, kept) with OCCUPANCY-ADAPTIVE cells and a
    * capped training sample ([[graft.operators.similarity.NswAnn
    * .trainModulus]]): the production entry — pair mass stays ~n·TargetCell
    * and training stays TrainCap-bounded as the corpus grows.
    */
  def flaggedAdaptive(vectors: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, trainIters: Int,
                      dims: Int): DataFrame = {
    val n = vectors.count()
    flagged(vectors, idCol, vecCol, threshold, adaptiveCells(n), trainIters,
      dims, graft.operators.similarity.NswAnn.trainModulus(n))
  }

  /** (vec_id, cluster_id, kept): every input vector flagged. Survivors =
    * `filter(col("kept"))`; the full frame is returned so an audit sees
    * WHAT was dropped and from which cell.
    */
  def flagged(vectors: DataFrame, idCol: String, vecCol: String,
              threshold: Double, nCentroids: Int, trainIters: Int,
              dims: Int, sampleModulus: Int = 1): DataFrame = {
    val assigned = graft.operators.OpCache.cache(
      IvfAnn.assignTrainedSampled(vectors, idCol, vecCol, nCentroids,
        trainIters, dims, sampleModulus))
    val a = assigned.select(col("cluster_id"), col("vid").as("a_id"),
      col("vec").as("a_vec"), col("nrm").as("a_nrm"))
    val b = assigned.select(col("cluster_id"), col("vid").as("b_id"),
      col("vec").as("b_vec"), col("nrm").as("b_nrm"))
    val dropped = a.join(b, Seq("cluster_id"))
      .filter(col("a_id") < col("b_id"))
      .filter(VectorFns.cosine(VectorFns.dot(col("a_vec"), col("b_vec")),
        col("a_nrm"), col("b_nrm")) > threshold)
      .select(col("b_id").as("vid")).distinct()
    assigned.select(col("vid"), col("cluster_id"))
      .join(dropped.withColumn("__dropped", lit(true)), Seq("vid"), "left")
      .select(col("vid").as("vec_id"), col("cluster_id"),
        coalesce(!col("__dropped"), lit(true)).as("kept"))
  }
}
