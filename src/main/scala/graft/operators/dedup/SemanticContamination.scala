package graft.operators.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.OpCache
import graft.operators.similarity.{IvfAnn, VectorFns}

/** SEMANTIC eval-train contamination audit — the embedding-space twin of
  * the n-gram contamination audit (#61/q51) and decontamination (#30d):
  * n-gram overlap catches verbatim leakage, but a paraphrased or
  * template-rewritten eval item shares almost no 8-grams with its train
  * twin while sitting on top of it in embedding space (the reason
  * SemDeDup-style semantic checks entered eval hygiene alongside exact
  * matching). For every EVAL-split vector: its nearest TRAIN-split
  * neighbor by cosine, and a contaminated flag when that similarity
  * exceeds the near-dup threshold.
  *
  * Scale shape — the [[SemanticDedup]] cell confinement, not an
  * eval×train all-pairs (which is corpus-quadratic the moment the eval
  * split scales with the corpus): assign the WHOLE corpus to trained
  * centroids ([[IvfAnn.assignTrainedSampled]] — exact-Lloyd training on
  * a deterministic modulus sample, broadcast-centroid codegen probes,
  * zero corpus-side shuffle), then pair eval×train WITHIN each cell
  * only. Recall is bounded by the cell assignment exactly as SemDeDup's
  * is — a cross-cell near-dup is missed, the documented trade the cell
  * ladder (#36e) tunes — and every arithmetic step (training,
  * assignment, the left-fold cosines) is the established bitwise
  * oracle-replayable discipline.
  *
  * The per-eval nearest-train reduce is `min(struct(-cos, t_id))` — a
  * plain partial-agg (no per-eval window sort): smallest negated cosine
  * = largest cosine, ties → lowest train id, the (cos DESC, id ASC)
  * rank-1 the oracle replays. Eval vectors whose cell holds no train
  * row surface with a NULL neighbor and `contaminated = false` — no
  * evidence, no flag.
  */
object SemanticContamination {

  /** One row per eval vector: (vec_id, cluster_id, nn_train_id,
    * nn_cosine, contaminated). `evalPred` marks the eval split as a
    * pure function of the (long-castable) id — deterministic hash
    * membership (the q47 discipline), so the split itself is
    * replayable.
    */
  def audit(vectors: DataFrame, idCol: String, vecCol: String,
            evalPred: Column => Column, threshold: Double, nCentroids: Int,
            trainIters: Int, dims: Int, sampleModulus: Int = 1): DataFrame =
    reduceNearestTrain(
      IvfAnn.assignTrainedSampled(vectors, idCol, vecCol, nCentroids,
        trainIters, dims, sampleModulus), evalPred, threshold)

  /** [[audit]] with OCCUPANCY-ADAPTIVE cells and the capped training
    * sample — the production entry, mirroring
    * [[SemanticDedup.flaggedAdaptive]]: cell count doubles from the base
    * while occupancy exceeds the target (pair mass stays ~n·TargetCell —
    * a FIXED cell count saturates into the quadratic regime, measured:
    * k=8 over the 200k-vector probe corpus ran 525 s where the ladder
    * runs the same audit in cell-bounded time), training stays
    * TrainCap-bounded via the modulus sample, and past the flat
    * boundary the two-level assignment rung takes over. The knob ladder
    * is the one the oracle replays as integer CASE ladders (the q121
    * discipline).
    */
  /** `knownN`: exact corpus row count when the caller already holds it —
    * skips the ladder's own `count()` pass ([[SemanticDedup
    * .flaggedAdaptive]]'s contract: must be exact, oracles replay the
    * ladders from the same n).
    */
  def auditAdaptive(vectors: DataFrame, idCol: String, vecCol: String,
                    evalPred: Column => Column, threshold: Double,
                    trainIters: Int, dims: Int,
                    oracleFlatLadder: Boolean = false,
                    knownN: Option[Long] = None): DataFrame = {
    val n = knownN.getOrElse(vectors.count())
    require(n >= 0, s"knownN must be non-negative, got $n")
    val (kc, kf) = SemanticDedup.adaptiveTwoLevel(n)
    if (oracleFlatLadder) require(kf == 1,
      s"corpus n=$n is past the flat-ladder boundary: the caller's oracle " +
        "replays only the flat cell ladder — run without oracleFlatLadder " +
        "(production) or gate the two-level path at forced knobs")
    val m = graft.operators.similarity.NswAnn.trainModulus(n)
    val assigned =
      if (kf == 1)
        IvfAnn.assignTrainedSampled(vectors, idCol, vecCol, kc, trainIters,
          dims, m)
      else
        IvfAnn.assignTrainedTwoLevel(vectors, idCol, vecCol, kc, kf,
          trainIters, dims, m)
    reduceNearestTrain(assigned, evalPred, threshold)
  }

  /** The cell-confined nearest-train reduce over any (vid, vec, nrm,
    * cluster_id) frame — shared by both entries.
    */
  private def reduceNearestTrain(assignedRaw: DataFrame,
                                 evalPred: Column => Column,
                                 threshold: Double): DataFrame = {
    val assigned = OpCache.cache(
      assignedRaw.withColumn("__eval", evalPred(col("vid"))))
    val ev = assigned.filter(col("__eval"))
      .select(col("cluster_id"), col("vid").as("e_id"),
        col("vec").as("e_vec"), col("nrm").as("e_nrm"))
    val tr = assigned.filter(!col("__eval"))
      .select(col("cluster_id"), col("vid").as("t_id"),
        col("vec").as("t_vec"), col("nrm").as("t_nrm"))
    val best = ev.join(tr, Seq("cluster_id"))
      .select(col("e_id"),
        struct((-VectorFns.cosine(VectorFns.dot(col("e_vec"), col("t_vec")),
          col("e_nrm"), col("t_nrm"))).as("nc"), col("t_id").as("tid"))
          .as("p"))
      .groupBy(col("e_id"))
      .agg(min(col("p")).as("m"))
      .select(col("e_id"), col("m.tid").as("nn_train_id"),
        (-col("m.nc")).as("nn_cosine"))
    ev.select(col("e_id").as("vec_id"), col("cluster_id"))
      .join(best.withColumnRenamed("e_id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster_id"), col("nn_train_id"),
        col("nn_cosine"),
        coalesce(col("nn_cosine") > lit(threshold), lit(false))
          .as("contaminated"))
  }
}
