package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN: partition the corpus into `nCentroids` cells by
  * nearest centroid; a query probes only its `probes` closest cells and
  * pays exact cosine on those candidates.
  *
  * Scale shape: the centroid set is packed into ONE broadcast row (an array
  * of (cid, cvec, cnrm) structs), so assignment is a per-row argmax fold —
  * zero joins, zero shuffles on the corpus side (the only Exchange in the
  * assignment plan is the tiny centroid collect_list). The cell id is a
  * plain column usable as a partition/bucket key, so at 100 TB the probe
  * reads only matching cells (partition pruning), unlike LSH's multi-table
  * union.
  *
  * Centroid "training" here is deterministic (first `nCentroids` vector
  * ids) — swap in k-means offline in production; the operator contract
  * (assign → probe → exact re-rank) is unchanged.
  */
object IvfAnn {

  /** One-row frame holding every centroid in a cid-ascending struct array.
    * collect_list feeds a single-group aggregate: the Exchange moves
    * `nCentroids` rows, nothing corpus-sized.
    */
  private def centroidArray(v: DataFrame, nCentroids: Int): DataFrame =
    v.filter(col("vid") < nCentroids)
      .select(struct(col("vid").cast("long").as("cid"), col("vec").as("cvec"),
        col("nrm").as("cnrm")).as("c"))
      .agg(array_sort(collect_list(col("c"))).as("cents"))

  private def cosTo(vec: Column, nrm: Column, c: Column): Column =
    VectorFns.cosine(VectorFns.dot(vec, c.getField("cvec")),
      nrm, c.getField("cnrm"))

  /** (vid, vec, nrm, cluster_id): each vector tagged with its nearest
    * centroid (ties → lowest centroid id; the fold scans cids ascending and
    * keeps strictly-better scores, which is exactly row_number over
    * (ccos DESC, cid ASC) = 1).
    */
  def assign(vectors: DataFrame, idCol: String, vecCol: String,
             nCentroids: Int): DataFrame = {
    val v = vectors.select(col(idCol).as("vid"), col(vecCol).as("vec"),
      VectorFns.norm(col(vecCol)).as("nrm"))
    assignFrom(v, centroidArray(v, nCentroids))
  }

  /** Same, from a pre-projected corpus and prebuilt centroid row — lets
    * [[search]] build both exactly once.
    */
  private[similarity] def assignFrom(v: DataFrame, cents: DataFrame): DataFrame =
    v.join(broadcast(cents), lit(true))
      .withColumn("best", aggregate(
        col("cents"),
        struct(lit(Double.NegativeInfinity).as("cos"), lit(-1L).as("cid")),
        (acc, c) => {
          val cc = cosTo(col("vec"), col("nrm"), c)
          when(cc > acc.getField("cos"),
            struct(cc.as("cos"), c.getField("cid").as("cid"))).otherwise(acc)
        }))
      .select(col("vid"), col("vec"), col("nrm"),
        col("best").getField("cid").as("cluster_id"))

  /** Approximate top-k: probe the `probes` nearest cells per query, exact
    * cosine re-rank within them. Probe selection is the same broadcast
    * array fold (sort the per-query centroid scores in-row, slice the top
    * `probes`) — no corpus-side window.
    */
  def search(vectors: DataFrame, idCol: String, vecCol: String,
             queryPred: Column => Column, k: Int,
             nCentroids: Int, probes: Int): DataFrame = {
    val v = vectors.select(col(idCol).as("vid"), col(vecCol).as("vec"),
      VectorFns.norm(col(vecCol)).as("nrm"))
    searchWith(v, centroidArray(v, nCentroids), queryPred, k, probes)
  }

  /** [[search]] with TRAINED centroids: `trainIters` exact-integer Lloyd
    * iterations ([[KMeansExact]]) replace the first-K-ids convention, so
    * recall survives corpora whose early ids are unrepresentative (the
    * seeds still start there, but the refinement walks them onto the real
    * cluster structure). Every training step is oracle-replayable — q33
    * gates this path end-to-end, training included.
    */
  /** Trained-centroid ASSIGNMENT alone — the clustering front half
    * [[graft.operators.dedup.SemanticDedup]] builds on: (vid, vec, nrm,
    * cluster_id) with each vector tagged by its nearest trained centroid,
    * via the same zero-corpus-shuffle broadcast fold as [[assign]].
    */
  def assignTrained(vectors: DataFrame, idCol: String, vecCol: String,
                    nCentroids: Int, trainIters: Int, dims: Int): DataFrame =
    assignTrainedSampled(vectors, idCol, vecCol, nCentroids, trainIters,
      dims, sampleModulus = 1)

  /** [[assignTrained]] with a deterministic TRAINING SAMPLE (`vid % m ==
    * 0`, the [[NswAnn.trainModulus]] discipline): training cost stays
    * sample·k·dims-bounded regardless of corpus size while the ASSIGNMENT
    * still covers every vector. Oracle-replayable — the sample predicate
    * is plain modulo arithmetic.
    */
  def assignTrainedSampled(vectors: DataFrame, idCol: String, vecCol: String,
                           nCentroids: Int, trainIters: Int, dims: Int,
                           sampleModulus: Int): DataFrame = {
    require(sampleModulus >= 1, s"bad sample modulus $sampleModulus")
    val v = graft.operators.OpCache.cache(
      vectors.select(col(idCol).as("vid"), col(vecCol).as("vec"),
        VectorFns.norm(col(vecCol)).as("nrm")))
    val sample =
      if (sampleModulus == 1) v else v.filter(col("vid") % sampleModulus === 0)
    val qz = graft.operators.OpCache.cache(
      KMeansExact.quantized(sample, "vid", "vec", dims))
    val trained = KMeansExact.train(qz, nCentroids, trainIters, dims)
    assignViaProbe(v, trained)
  }

  /** [[assignTrainedSampled]]'s TWO-LEVEL sibling ([[KMeansTwoLevel]] —
    * the rung past the flat cell ladder): train kc coarse cells, then kf
    * fine cells within each, and assign the full corpus with two
    * broadcast probes (kc + kf scans per row instead of kc·kf).
    * cluster_id = coarse·kf + fine.
    */
  def assignTrainedTwoLevel(vectors: DataFrame, idCol: String, vecCol: String,
                            kc: Int, kf: Int, trainIters: Int, dims: Int,
                            sampleModulus: Int): DataFrame = {
    require(sampleModulus >= 1, s"bad sample modulus $sampleModulus")
    val v = graft.operators.OpCache.cache(
      vectors.select(col(idCol).as("vid"), col(vecCol).as("vec"),
        VectorFns.norm(col(vecCol)).as("nrm")))
    val sample =
      if (sampleModulus == 1) v else v.filter(col("vid") % sampleModulus === 0)
    val qz = graft.operators.OpCache.cache(
      KMeansExact.quantized(sample, "vid", "vec", dims))
    val tl = KMeansTwoLevel.train(qz, kc, kf, trainIters, dims)
    KMeansTwoLevel.assign(v, tl, kf)
  }

  /** Trained-centroid assignment through the codegen'd
    * [[graft.plans.HubTopTwo]] broadcast probe (slot i1 = argmax cosine,
    * strict `>` with cids scanned ascending — exactly the fold's and the
    * oracle's (cos DESC, cid ASC) tiebreak). The interpreted `aggregate()`
    * fold and the k·dims-LITERAL centroid row are both fine at 8 cells
    * and a CPU/plan bomb at the adaptive ladder cap (4096 cells × 64 dims
    * = 262k literal nodes; the HubTopTwo lesson — 108 s interpreted at
    * H=512); the probe is two tight primitive loops inside whole-stage
    * codegen and one ~2 MB broadcast.
    */
  private[similarity] def assignViaProbe(v: DataFrame,
                             trained: Array[Array[Long]]): DataFrame = {
    val k = trained.length
    val dim = trained.head.length
    val flat = new Array[Double](k * dim)
    val nrms = new Array[Double](k)
    trained.zipWithIndex.foreach { case (c, j) =>
      val (w, nrm) = KMeansExact.dequantize(c)
      System.arraycopy(w, 0, flat, j * dim, dim)
      nrms(j) = nrm
    }
    val bc = v.sparkSession.sparkContext.broadcast(
      graft.plans.HubSet(Array.tabulate(k)(_.toLong), nrms, flat, dim))
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val best2 = ColumnBridge.column(graft.plans.HubTopTwo(
      ColumnBridge.expression(col("vec")),
      ColumnBridge.expression(col("nrm")), bc))
    v.select(col("vid"), col("vec"), col("nrm"),
      best2.getField("i1").as("cluster_id"))
  }

  def searchTrained(vectors: DataFrame, idCol: String, vecCol: String,
                    queryPred: Column => Column, k: Int, nCentroids: Int,
                    probes: Int, trainIters: Int, dims: Int): DataFrame = {
    val v = graft.operators.OpCache.cache(
      vectors.select(col(idCol).as("vid"), col(vecCol).as("vec"),
        VectorFns.norm(col(vecCol)).as("nrm")))
    val qz = graft.operators.OpCache.cache(
      KMeansExact.quantized(v, "vid", "vec", dims))
    val trained = KMeansExact.train(qz, nCentroids, trainIters, dims)
    searchWith(v, trainedCentroidRow(v, trained), queryPred, k, probes)
  }

  /** One-row cents frame from trained quantized centroids: cvec/cnrm are
    * the exact dequantized doubles both engines derive from the int64
    * training state (k·dims literals — centroid-count-bounded, the same
    * plan-size argument as the probe knobs).
    */
  private[similarity] def trainedCentroidRow(v: DataFrame,
                                 cents: Array[Array[Long]]): DataFrame = {
    val structs = cents.zipWithIndex.map { case (c, j) =>
      val (w, nrm) = KMeansExact.dequantize(c)
      struct(lit(j.toLong).as("cid"),
        array(w.toIndexedSeq.map(lit): _*).as("cvec"),
        lit(nrm).as("cnrm"))
    }
    v.sparkSession.range(1).select(array(structs.toIndexedSeq: _*).as("cents"))
  }

  private def searchWith(v: DataFrame, cents: DataFrame,
                         queryPred: Column => Column, k: Int,
                         probes: Int): DataFrame =
    searchAssigned(assignFrom(v, cents).cache(), cents, queryPred, k, probes)

  /** Probe + exact re-rank over an ALREADY-assigned corpus (vid, vec,
    * nrm, cluster_id) — the back half of [[search]], split out so an
    * incrementally-maintained assignment table ([[IvfIncremental]]) can
    * be searched without re-assigning anything. Caller caches `assigned`
    * if its lineage is expensive (it is consumed twice: queries +
    * candidates).
    */
  private[similarity] def searchAssigned(assigned: DataFrame, cents: DataFrame,
                                         queryPred: Column => Column, k: Int,
                                         probes: Int): DataFrame = {
    val queries = assigned.filter(queryPred(col("vid")))
      .select(col("vid").as("query_id"), col("vec").as("qvec"), col("nrm").as("qnrm"))
    val probeCells = queries.join(broadcast(cents), lit(true))
      .withColumn("scored", transform(col("cents"), c =>
        struct(cosTo(col("qvec"), col("qnrm"), c).as("cos"),
          c.getField("cid").as("cid"))))
      .withColumn("probe", slice(array_sort(col("scored"), (l, r) =>
        when(l.getField("cos") > r.getField("cos"), lit(-1))
          .when(l.getField("cos") < r.getField("cos"), lit(1))
          .when(l.getField("cid") < r.getField("cid"), lit(-1))
          .when(l.getField("cid") > r.getField("cid"), lit(1))
          .otherwise(lit(0))), 1, probes))
      .select(col("query_id"), col("qvec"), col("qnrm"),
        explode(col("probe").getField("cid")).as("cid"))
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
