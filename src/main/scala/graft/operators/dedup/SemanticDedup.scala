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
  /** FLAT-ladder cell cap = the coarse-cell count of the two-level rung:
    * one-level assignment scores every cell per vector (n·k work), so the
    * flat ladder stops here; past MaxCoarse·TargetCell ≈ 65k vectors the
    * ladder keeps doubling TOTAL cells but splits them `kc = MaxCoarse`
    * coarse × `kf` fine ([[graft.operators.similarity.KMeansTwoLevel]] —
    * the standard IVF hierarchy), so assignment stays n·(kc + kf) while
    * occupancy holds at TargetCell. Below the boundary kf = 1 and the
    * path (and every shipped oracle) is EXACTLY the flat ladder.
    */
  val MaxCoarse = 256
  /** Fine-cells-per-coarse-cell cap: total-cell coverage is
    * MaxCoarse·MaxFine·TargetCell = 2^20·256 ≈ 268M vectors. The binding
    * cost at the cap is the fine-centroid broadcast and the per-iteration
    * driver collect — kc·kf·dims doubles, ~0.5 GB at dims 64 (the
    * [[graft.operators.similarity.KMeansTwoLevel]] scaladoc's documented
    * trade); past it, fine centroids must become a join table, not a
    * broadcast — a different operator, out of this ladder's scope.
    */
  val MaxFine = 4096
  /** Target cell occupancy: cells grow with the corpus so the per-cell
    * pair scan stays ~TargetCell² per cell. A FIXED cell count saturates
    * quadratically — the round-12 100× probe measured exactly that
    * (200k vectors / 8 cells = 25k-vector cells → 198× wall-clock at
    * 100× data). Integer doubling ladder, NOT a float log: the DuckDB
    * oracle must pick the identical count on every engine.
    */
  val TargetCell = 256

  /** (coarse, fine) cell counts for a corpus of n vectors: total cells
    * double from BaseCells while occupancy exceeds TargetCell (the same
    * integer ladder as before — the DuckDB oracle replays it as a CASE
    * chain); while the total fits MaxCoarse the split is (total, 1) — the
    * FLAT regime, bit-identical to the pre-two-level ladder — and past it
    * the total factors as MaxCoarse coarse × (total/MaxCoarse) fine.
    */
  def adaptiveTwoLevel(n: Long): (Int, Int) = {
    require(MaxCoarse >= BaseCells && (MaxCoarse & (MaxCoarse - 1)) == 0 &&
      (MaxFine & (MaxFine - 1)) == 0 && (BaseCells & (BaseCells - 1)) == 0,
      s"cell caps must be powers of two: base=$BaseCells coarse=$MaxCoarse fine=$MaxFine")
    var k = BaseCells.toLong
    while (n > k * TargetCell && k < MaxCoarse.toLong * MaxFine) k <<= 1
    if (k <= MaxCoarse) (k.toInt, 1) else (MaxCoarse, (k / MaxCoarse).toInt)
  }

  /** Flat-regime cell count (kf = 1): kept as the named form the one-level
    * oracles replay.
    */
  def adaptiveCells(n: Long): Int = {
    val (kc, kf) = adaptiveTwoLevel(n)
    require(kf == 1, s"n=$n is past the flat ladder (kc=$kc kf=$kf); " +
      "use adaptiveTwoLevel")
    kc
  }

  /** (vec_id, cluster_id, kept) with OCCUPANCY-ADAPTIVE cells and a
    * capped training sample ([[graft.operators.similarity.NswAnn
    * .trainModulus]]): the production entry — pair mass stays ~n·TargetCell
    * and training stays TrainCap-bounded as the corpus grows. Below
    * MaxCoarse·TargetCell occupancy the assignment is the flat trained
    * ladder (every shipped SF; bit-identical to the pre-two-level path);
    * past it the TWO-LEVEL rung takes over (q133 pins that path's full
    * oracle replay at forced knobs).
    */
  /** `knownN`: the exact corpus row count, when the CALLER already knows
    * it (a composition that just counted/built the frame) — skips the
    * ladder's own `count()`, one fewer corpus pass. The value must be
    * the exact count: the cell/modulus ladders are replayed by oracles
    * from the same n, so a wrong knownN diverges the gate loudly.
    */
  def flaggedAdaptive(vectors: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, trainIters: Int, dims: Int,
                      oracleFlatLadder: Boolean = false,
                      knownN: Option[Long] = None): DataFrame = {
    val n = knownN.getOrElse(vectors.count())
    require(n >= 0, s"knownN must be non-negative, got $n")
    val (kc, kf) = adaptiveTwoLevel(n)
    if (oracleFlatLadder) require(kf == 1,
      s"corpus n=$n is past the flat-ladder boundary " +
        s"(${MaxCoarse.toLong * TargetCell}): the caller's DuckDB oracle " +
        "replays only the flat cell ladder, so the two-level assignment " +
        "would hash-mismatch the gate even though the engine is correct — " +
        "run without oracleFlatLadder (production) or gate the two-level " +
        "path via its forced-knob replay (q133)")
    val m = graft.operators.similarity.NswAnn.trainModulus(n)
    if (kf == 1) flagged(vectors, idCol, vecCol, threshold, kc, trainIters,
      dims, m)
    else flaggedTwoLevel(vectors, idCol, vecCol, threshold, kc, kf,
      trainIters, dims, m)
  }

  /** (vec_id, cluster_id, kept): every input vector flagged. Survivors =
    * `filter(col("kept"))`; the full frame is returned so an audit sees
    * WHAT was dropped and from which cell.
    */
  def flagged(vectors: DataFrame, idCol: String, vecCol: String,
              threshold: Double, nCentroids: Int, trainIters: Int,
              dims: Int, sampleModulus: Int = 1): DataFrame =
    flagFromAssigned(graft.operators.OpCache.cache(
      IvfAnn.assignTrainedSampled(vectors, idCol, vecCol, nCentroids,
        trainIters, dims, sampleModulus)), threshold)

  /** [[flagged]] with the TWO-LEVEL assignment
    * ([[graft.operators.similarity.KMeansTwoLevel]]): kc coarse × kf fine
    * cells, cluster_id = gid·kf + fid. The drop rule, pair confinement,
    * and output shape are identical — only the cell function changes,
    * which is exactly the ladder contract.
    */
  def flaggedTwoLevel(vectors: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, kc: Int, kf: Int, trainIters: Int,
                      dims: Int, sampleModulus: Int = 1): DataFrame =
    flagFromAssigned(graft.operators.OpCache.cache(
      IvfAnn.assignTrainedTwoLevel(vectors, idCol, vecCol, kc, kf,
        trainIters, dims, sampleModulus)), threshold)

  /** The SemDeDup drop rule over any (vid, vec, nrm, cluster_id) frame:
    * within-cluster pairs only, min-id-wins per pair, kept flags for the
    * whole corpus.
    */
  private def flagFromAssigned(assigned: DataFrame,
                               threshold: Double): DataFrame = {
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
