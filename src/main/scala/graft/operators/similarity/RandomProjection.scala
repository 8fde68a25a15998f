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
  * Determinism discipline: weights come from a fixed splitmix64 mix of
  * the (outDim, dim) index (own seed namespace — reducing and bucketing
  * the same corpus must not correlate), so any engine can regenerate the
  * exact matrix; each output coordinate is ONE
  * in-element-order dot product (the codegen'd [[graft.plans.DotProduct]]
  * fold) followed by ONE multiply by the scale literal — the same pinned
  * IEEE chain the q24 oracle replays, bitwise reproducible. Scale shape:
  * a pure whole-stage-codegen projection, zero shuffles, column pruning
  * drops everything but the vector.
  */
object RandomProjection {

  /** Deterministic pseudo-random weight in [-0.5, 0.5) for output
    * coordinate `outDim`, input dimension `dim` — a splitmix64
    * finalization over the (outDim, dim) index, NOT the single-step LCG
    * the LSH planes use: one LCG step is an affine sawtooth in the seed,
    * which is fine for sign buckets but correlates the rows of a JL
    * matrix (RandomProjectionSpec measured only 73% of pairwise distance
    * ratios inside the chi-square band before the mixer; 97% is the
    * i.i.d. expectation). Public so an external oracle can reproduce the
    * exact matrix — though gates embed the printed literals, so only
    * Scala-side determinism is load-bearing.
    */
  def weight(outDim: Int, dim: Int): Double = {
    var z = outDim.toLong * 0x9E3779B97F4A7C15L +
      dim.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL
    z ^= (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble - 0.5d
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
