package graft

import org.apache.spark.sql.functions._

import graft.operators.similarity.{CosinePairs, VectorFns}
import graft.queries.{ExtraQueries, SimilarityQueries}

/** The brute-force all-pairs formulation lives HERE, as the oracle
  * reference for the banded operator — it is deliberately absent from the
  * operator itself (an unblocked O(n²) self-join is a scale-killer; see
  * SURVEY §4).
  */
class CosinePairsSpec extends SparkSpec {

  private def brute(dir: String) = {
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VectorFns.norm(col("embedding")).as("nrm"))
    v.alias("a").join(v.alias("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        VectorFns.cosine(
          VectorFns.dot(col("a.embedding"), col("b.embedding")),
          col("a.nrm"), col("b.nrm")).as("cosine"))
      .filter(col("cosine") >= ExtraQueries.CosineThreshold)
  }

  test("banded pairs are a subset of brute force with identical cosines; recall reported") {
    val dir = sf("0.001")
    val exact = brute(dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val banded = CosinePairs.banded(Tables.embeddings(spark, dir),
        "vec_id", "embedding", ExtraQueries.CosineThreshold,
        SimilarityQueries.Dims)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(banded.nonEmpty, "banding must surface at least some pairs")
    banded.foreach { case (pair, cos) =>
      assert(exact.contains(pair), s"banded pair $pair not in brute force")
      assert(exact(pair) == cos, s"cosine mismatch for $pair")
    }
    val recall = banded.length.toDouble / exact.size
    info(f"banded recall vs brute force = $recall%.3f " +
      f"(${banded.length}/${exact.size}; threshold pairs sit at the " +
      "decision boundary on this data, so partial recall is expected)")
    assert(recall >= 0.2, s"banded recall collapsed: $recall")
  }
}
