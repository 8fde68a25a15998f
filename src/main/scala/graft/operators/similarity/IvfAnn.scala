package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN: partition the corpus into `nCentroids` cells by
  * nearest centroid; a query probes only its `probes` closest cells and
  * pays exact cosine on those candidates.
  *
  * Scale shape: assignment is one broadcast pass over the corpus (centroid
  * set is tiny); the cell index is a plain column usable as a partition/
  * bucket key, so at 100 TB the probe reads only matching cells
  * (partition pruning), unlike LSH's multi-table union.
  *
  * Centroid "training" here is deterministic (first `nCentroids` vector
  * ids) — swap in k-means offline in production; the operator contract
  * (assign → probe → exact re-rank) is unchanged.
  */
object IvfAnn {

  /** (vid, vec, nrm, cluster_id): each vector tagged with its nearest
    * centroid (ties → lowest centroid id).
    */
  def assign(vectors: DataFrame, idCol: String, vecCol: String,
             nCentroids: Int): DataFrame = {
    val v = vectors.select(col(idCol).as("vid"), col(vecCol).as("vec"),
      VectorFns.norm(col(vecCol)).as("nrm"))
    val cents = v.filter(col("vid") < nCentroids)
      .select(col("vid").as("cid"), col("vec").as("cvec"), col("nrm").as("cnrm"))
    val scored = v.join(broadcast(cents), lit(true))
      .select(col("vid"), col("vec"), col("nrm"), col("cid"),
        VectorFns.cosine(VectorFns.dot(col("vec"), col("cvec")),
          col("nrm"), col("cnrm")).as("ccos"))
    val w = Window.partitionBy("vid").orderBy(col("ccos").desc, col("cid").asc)
    scored.withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .select(col("vid"), col("vec"), col("nrm"), col("cid").as("cluster_id"))
  }

  /** Approximate top-k: probe the `probes` nearest cells per query, exact
    * cosine re-rank within them.
    */
  def search(vectors: DataFrame, idCol: String, vecCol: String,
             queryPred: Column => Column, k: Int,
             nCentroids: Int, probes: Int): DataFrame = {
    val assigned = assign(vectors, idCol, vecCol, nCentroids).cache()
    val cents = assigned.filter(col("vid") < nCentroids)
      .select(col("vid").as("cid"), col("vec").as("cvec"), col("nrm").as("cnrm"))
    val queries = assigned.filter(queryPred(col("vid")))
      .select(col("vid").as("query_id"), col("vec").as("qvec"), col("nrm").as("qnrm"))
    val probed = queries.join(broadcast(cents), lit(true))
      .select(col("query_id"), col("qvec"), col("qnrm"), col("cid"),
        VectorFns.cosine(VectorFns.dot(col("qvec"), col("cvec")),
          col("qnrm"), col("cnrm")).as("ccos"))
    val pw = Window.partitionBy("query_id").orderBy(col("ccos").desc, col("cid").asc)
    val probeCells = probed.withColumn("prank", row_number().over(pw))
      .filter(col("prank") <= probes)
      .select(col("query_id"), col("qvec"), col("qnrm"), col("cid"))
    val cands = probeCells.join(assigned,
        probeCells("cid") === assigned("cluster_id") &&
          col("query_id") =!= assigned("vid"))
      .select(col("query_id"), col("vid").as("neighbor_id"),
        VectorFns.cosine(VectorFns.dot(col("qvec"), col("vec")),
          col("qnrm"), col("nrm")).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
