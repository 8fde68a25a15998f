package graft.operators.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.OpCache
import graft.plans.{CentroidSet, KMeansAssign}

/** Prototype-distance DATA PRUNING over an embedding column (Sorscher et
  * al. 2022, "Beyond neural scaling laws: beating power law scaling via
  * data pruning"): cluster the corpus with k-means, measure each
  * example's distance to its assigned centroid, and keep the HARDEST
  * (farthest) slice — in the abundant-data regime, prototypical
  * examples near a centroid are the redundant ones, and pruning them
  * beats random pruning. The embedding-space complement of
  * [[graft.operators.dedup.SemanticDedup]]: SemDeDup drops docs too
  * close to EACH OTHER, this drops docs too close to their CLUSTER
  * CENTER.
  *
  * Exact arithmetic end-to-end (the [[KMeansExact]] discipline): the
  * corpus quantizes to int64 fixed-point, training is the
  * oracle-replayable exact Lloyd loop, the assignment/distance probe is
  * the codegen'd broadcast [[KMeansAssign]] (argmin int64 squared-L2,
  * ties → lowest cid), and the per-cluster cut is the exact-rank
  * threshold (the q149/[[graft.operators.Dsir]] tail, per group): keep
  * dist ≥ the (n_c − (n_c·keepPct) DIV 100 + 1)-th smallest distance in
  * cluster c; threshold ties all survive (≥ keepPct% kept per cluster).
  * A cluster too small for its cut (n_c·keepPct < 100) keeps nothing —
  * the rank exceeds n_c, deterministically, in both engines.
  *
  * Scale shape: one quantized-corpus cache; training is k·dims-bounded
  * driver state per iteration; assignment is one codegen scan (zero
  * corpus-side shuffle — centroids broadcast); the threshold rides a
  * (cid, dist) partial-agg (duplicate radii collapse map-side) and a
  * window PARTITIONED BY cid over that DISTINCT-radius frame — hash
  * exchange on k keys, never a single partition (the
  * [[graft.operators.Quantiles.exactDiscretePerGroup]] shape); the k-row
  * threshold table broadcasts back. Nothing is corpus-quadratic.
  */
object PrototypePrune {

  /** Every vector flagged: (vec_id, cid, dist, keep). `keep` = the
    * top-keepPct%-farthest-per-cluster cut described above.
    */
  def flagged(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
              iters: Int, dims: Int, keepPct: Int): DataFrame = {
    require(keepPct >= 1 && keepPct <= 100, s"keepPct in [1,100], got $keepPct")
    val spark = vecs.sparkSession
    val qz = OpCache.cache(KMeansExact.quantized(vecs, idCol, vecCol, dims))
    val cents = KMeansExact.train(qz, k, iters, dims)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val bc = spark.sparkContext.broadcast(
      CentroidSet(cents.flatten, cents.length, dims))
    val a = ColumnBridge.column(KMeansAssign(
      ColumnBridge.expression(col("qvec")), bc))
    // cached: feeds the radius counts, the per-cluster sizes, AND the
    // final readout — one assignment scan, three consumers
    val asg = OpCache.cache(qz.select(col("vid").as("vec_id"),
      a.getField("cid").as("cid"), a.getField("dist").as("dist")))
    val cnt = asg.groupBy(col("cid"), col("dist")).agg(count(lit(1)).as("c"))
    val cum = cnt.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("cid")).orderBy(col("dist"))))
    val n = asg.groupBy(col("cid")).agg(count(lit(1)).as("n"))
    val thr = cum.join(n, Seq("cid"))
      .filter(col("cum") >= expr(s"n - ((n * $keepPct) DIV 100) + 1"))
      .groupBy(col("cid")).agg(min(col("dist")).as("__thr"))
    asg.join(broadcast(thr), Seq("cid"), "left")
      .select(col("vec_id"), col("cid"), col("dist"),
        coalesce(col("dist") >= col("__thr"), lit(false)).as("keep"))
  }

  /** Survivors only — the corpus the training run reads. */
  def select(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int, dims: Int, keepPct: Int): DataFrame =
    flagged(vecs, idCol, vecCol, k, iters, dims, keepPct)
      .filter(col("keep"))
      .select("vec_id", "cid", "dist")
}
