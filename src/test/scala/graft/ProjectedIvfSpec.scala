package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.operators.similarity.{CosineTopK, IvfAnn, RandomProjection}

/** The production reduced-space ladder (q147: project → trained IVF)
  * beyond its bitwise oracle gate: RECALL on a CLUSTERED corpus. The gate
  * corpus is i.i.d. uniform, where every pairwise cosine concentrates at
  * the same value and ANY reduction destroys rank order (measured
  * recall@10 = 0.06 at q144 — distance concentration, not a defect);
  * real embedding corpora are clustered, and there the JL projection
  * preserves the cluster geometry the IVF ladder needs. This corpus
  * makes that claim measurable: 100 well-separated centers × 4 members
  * with small deterministic within-cluster noise — a query's true top-3
  * IS its 3 cluster-mates (cosine ≈0.99 vs ≤0.48 cross-cluster), so
  * recall measures whether CLUSTER-STRUCTURE rank order survives
  * reduction. (Ranking WITHIN a cluster of near-identical vectors is
  * deliberately not measured — that ordering is pure noise at any width,
  * the same concentration regime as the i.i.d. gate corpus.)
  */
class ProjectedIvfSpec extends SparkSpec {

  private val Dims = 64
  private val OutDims = 16
  private val Centers = 100
  private val PerCenter = 4

  /** Deterministic clustered corpus: center c is a unit-ish vector from
    * the splitmix stream (namespace offset 1000 — disjoint from the JL
    * matrix's own (j, d) indices); member m adds 0.05-scaled noise keyed
    * by (member, dim). Same generator both for the frame and the
    * driver-side ground truth.
    */
  private def vecOf(id: Long): Array[Double] = {
    val c = (id / PerCenter).toInt
    Array.tabulate(Dims) { d =>
      RandomProjection.weight(1000 + c, d) +
        0.05 * RandomProjection.weight(2000 + id.toInt, d)
    }
  }

  private lazy val corpus = {
    val rows = (0L until (Centers * PerCenter).toLong).map(i =>
      Row(i, vecOf(i).toSeq))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(DoubleType), nullable = false))))
  }

  test("projected IVF keeps high recall vs the unprojected exact top-k on clustered data") {
    val k = 3 // = PerCenter - 1: the true neighbor set is the cluster
    val exact = CosineTopK.search(corpus, "vec_id", "embedding", _ < 12, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val proj = RandomProjection.project(corpus, "vec_id", "embedding",
      Dims, OutDims)
    val reduced = IvfAnn.searchTrained(proj, "vid", "proj", _ < 12, k = k,
        nCentroids = 8, probes = 2, trainIters = 3, dims = OutDims)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(reduced).size.toDouble / exact.size
    info(s"projected-IVF recall@$k vs unprojected exact = $recall")
    // cluster-mates dominate at any width (same-cluster min cosine 0.99
    // vs cross-cluster max 0.48 in reduced space — the margin test
    // below); 0.8 leaves room for IVF cell-boundary misses while still
    // failing if reduction ever breaks clustered rank order
    assert(recall >= 0.8, s"reduced-space recall collapsed: $recall")
  }

  test("projection preserves cluster separation: same-cluster vs cross-cluster cosine margin") {
    val proj = RandomProjection.project(corpus, "vec_id", "embedding",
        Dims, OutDims)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      }
      d / math.sqrt(na * nb)
    }
    // sampled same-cluster pairs vs cross-cluster pairs, in reduced space
    val same = for (c <- 0 until Centers; m <- 1 until PerCenter)
      yield cos(proj(c.toLong * PerCenter), proj(c.toLong * PerCenter + m))
    val cross = for (c <- 0 until (Centers - 1); m <- 0 until PerCenter)
      yield cos(proj(c.toLong * PerCenter + m), proj((c + 1).toLong * PerCenter + m))
    val sMin = same.min
    val cMax = cross.max
    info(s"reduced-space same-cluster min=$sMin cross-cluster max=$cMax")
    assert(sMin > cMax,
      s"reduction merged clusters: same-min $sMin <= cross-max $cMax")
  }
}
