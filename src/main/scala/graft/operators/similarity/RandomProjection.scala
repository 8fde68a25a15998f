package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection — the dimensionality-reduction
  * step a 100 TB embedding pipeline runs BEFORE the ANN/dedup family when
  * the source dims are wide: project each vector onto `outDims` fixed
  * pseudo-random hyperplanes (scaled by 1/√outDims, the textbook JL
  * estimator, so pairwise distances are preserved in expectation with
  * distortion O(√(ln n / outDims))). The reduced frame then feeds the
  * LSH/IVF/SemDeDup ladders at a fraction of the dot-product cost and
  * 1/(dims/outDims) the storage.
  *
  * Determinism discipline: weights come from the same fixed-LCG family as
  * [[LshAnn.weight]] (own seed namespace — reducing and bucketing the same
  * corpus must not correlate), so any engine can regenerate the exact
  * matrix from the (outDim, dim) indices; each output coordinate is ONE
  * in-element-order dot product (the codegen'd [[graft.plans.DotProduct]]
  * fold) followed by ONE multiply by the scale literal — the same pinned
  * IEEE chain the q24 oracle replays, bitwise reproducible. Scale shape:
  * a pure whole-stage-codegen projection, zero shuffles, column pruning
  * drops everything but the vector.
  */
object RandomProjection {

  /** Deterministic pseudo-random weight in [-0.5, 0.5) for output
    * coordinate `outDim`, input dimension `dim`. Public so an external
    * oracle can reproduce the exact matrix. Seed multiplier keeps the
    * LCG product far from Long overflow at any sane width.
    */
  def weight(outDim: Int, dim: Int): Double = {
    val seed = outDim.toLong * 100003L + dim
    val x = (1103515245L * seed + 12345L) % 2147483648L
    x.toDouble / 2147483648.0d - 0.5d
  }

  /** (idCol as vid, proj) — `proj` the `outDims`-element array of scaled
    * plane projections, in output-coordinate order.
    */
  def project(vectors: DataFrame, idCol: String, vecCol: String,
              dims: Int, outDims: Int): DataFrame = {
    require(outDims >= 1 && outDims <= dims,
      s"outDims $outDims must be in [1, $dims]")
    val scale = 1.0d / math.sqrt(outDims.toDouble)
    def coord(j: Int): Column = {
      val w = array((0 until dims).map(d => lit(weight(j, d))): _*)
      VectorFns.dot(col(vecCol), w) * lit(scale)
    }
    vectors.select(col(idCol).cast("long").as("vid"),
      array((0 until outDims).map(coord): _*).as("proj"))
  }
}
