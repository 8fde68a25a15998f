package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph ANN: greedy BEAM SEARCH over a deterministic navigable-small-world
  * style neighbor graph — the known answer where banding/IVF stay
  * candidate-volume-bound (dense-cluster corpora: q31's 10× probe showed
  * intrinsic similar-pair mass dominating any bucketing; a graph walk pays
  * per-query O(rounds · beam · degree) regardless of cluster density).
  *
  * The graph is NSW-shaped but built deterministically (no sequential
  * random insertion — that would serialize construction AND be
  * irreproducible across engines):
  *   - short-range edges: each node's top-M cosine neighbors WITHIN its
  *     IVF-style cell (nearest-hub assignment; per-cell self-join, the
  *     same bounded-block pair generation as the dedup family);
  *   - long-range edges: each node links to its 2 nearest hubs — the
  *     navigable shortcuts that let a walk cross cells.
  *
  * Search: seed the beam with the query's top-B hubs, then `Rounds` rounds
  * of expand-neighbors → exact-cosine score → keep top-B (ties by node id,
  * so every step is deterministic and an external engine can replay the
  * walk EXACTLY — the q100 DuckDB oracle rebuilds graph and beam
  * bit-for-bit).
  *
  * Scale shape: construction is one broadcast hub fold (zero corpus-side
  * shuffle, IvfAnn's argmax pattern) + one per-cell bounded self-join; the
  * edge list is O(n·(M+2)) ids. Each search round is one shuffle join of
  * the (|Q|·B)-row beam against the edge list (degree-bounded fan-out) and
  * a per-query window over ≤ B·(M+3) rows — never a corpus-wide sort. At
  * 100 TB the edge list partitions by src and the beam broadcasts.
  */
object NswAnn {
  /** Base hub count (first-N-ids "training", the IvfAnn convention — swap
    * in k-means or reservoir sampling offline; contract unchanged). */
  val BaseHubs = 16
  /** Hub-count cap (beam0 scores every hub per query — keep it bounded). */
  val MaxHubs = 4096
  /** Target cell occupancy: hubs grow with the corpus so the per-cell
    * self-join stays ~TargetCell² per cell. A FIXED hub count saturates
    * quadratically — the 100× probe measured exactly that (200k vectors /
    * 16 hubs = 12.5k-node cells = 2.5B candidate pairs; the same
    * occupancy cliff LshAnn.adaptivePlanes exists to avoid). Integer
    * doubling ladder, NOT a float log: the DuckDB oracle must pick the
    * identical count on every engine. n ≤ 8192 keeps the historical 16
    * hubs, so all driver-tested scale factors are unchanged.
    */
  val TargetCell = 512

  def adaptiveHubs(n: Long): Int = {
    // MaxHubs must sit ON the doubling ladder or the loop could overshoot
    // it while the oracle's ELSE clause pins exactly MaxHubs — divergent
    // graphs, gate failure. Pin the invariant, don't trust tuning.
    require(MaxHubs >= BaseHubs && (MaxHubs & (MaxHubs - 1)) == 0 &&
      (BaseHubs & (BaseHubs - 1)) == 0,
      s"MaxHubs=$MaxHubs must be a power-of-2 multiple of BaseHubs=$BaseHubs")
    var h = BaseHubs
    while (n > h.toLong * TargetCell && h < MaxHubs) h <<= 1
    h
  }
  /** Short-range out-degree (top-M in-cell neighbors). */
  val M = 6
  /** Long-range out-degree (nearest hubs per node). */
  val HubLinks = 2
  /** Beam width per query. */
  val Beam = 16
  /** Fixed expansion rounds — fixed so the oracle can unroll the walk. */
  val Rounds = 3

  private def projected(vectors: DataFrame, idCol: String, vecCol: String) =
    vectors.select(col(idCol).cast("long").as("vid"), col(vecCol).as("vec"),
      VectorFns.norm(col(vecCol)).as("nrm"))

  /** Deterministic training-sample modulus: vid % m == 0 keeps roughly
    * n/m rows, m doubling until the sample fits TrainCap — bounds the
    * k-means training cost (sample · hubs · dims) regardless of corpus
    * size, mirrored as a CASE ladder in the oracle like [[adaptiveHubs]].
    * MaxModulus covers ~10^11 rows at the cap before the sample grows
    * again (by then hub training is the least of the plan's knobs).
    */
  val TrainCap = 65536
  val MaxModulus = 1 << 20

  def trainModulus(n: Long): Int = {
    var m = 1
    while (n > m.toLong * TrainCap && m < MaxModulus) m <<= 1
    m
  }

  /** Collect the hub set driver-side (bounded: ≤ MaxHubs rows, ~2 MB of
    * doubles at the cap) and broadcast it once — the [[graft.plans
    * .BloomProbe]] transport. cid-ascending so the scan order equals the
    * oracle's cid tiebreak.
    */
  private def collectHubs(v: DataFrame, hubPred: Column): graft.plans.HubSet = {
    val rows = v.filter(hubPred)
      .select(col("vid"), col("vec"), col("nrm"))
      .collect().sortBy(_.getLong(0))
    val dim = if (rows.isEmpty) 0
      else rows.head.getSeq[Any](1).length
    val vecs = new Array[Double](rows.length * dim)
    rows.zipWithIndex.foreach { case (r, h) =>
      // null element = 0 contribution (DotProduct's skip convention)
      val e = VectorFns.collectElems(r, 1, nullAsZero = true)
      var i = 0
      while (i < dim) { vecs(h * dim + i) = e(i); i += 1 }
    }
    graft.plans.HubSet(rows.map(_.getLong(0)), rows.map(_.getDouble(2)),
      vecs, dim)
  }

  /** Per-node hub ranking via the codegen'd [[graft.plans.HubTopTwo]]
    * broadcast probe: (vid, vec, nrm, cell, hub_links[]) where cell =
    * nearest hub, hub_links = top-2 hubs under strict `>` with cids
    * scanned ascending — exactly row_number over (cos DESC, cid ASC)
    * = 1, 2, the order the oracle replays. An `aggregate()` HOF fold
    * here runs interpreted per hub and dominated the 100× probe (108 s)
    * once the ladder grew H to 512; the native expression is two tight
    * loops inside whole-stage codegen.
    */
  private def withHubs(v: DataFrame,
                       hubSet: org.apache.spark.broadcast.Broadcast[graft.plans.HubSet]): DataFrame = {
    require(HubLinks == 2, s"the two-slot hub probe encodes HubLinks=2, got $HubLinks")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val best2 = ColumnBridge.column(graft.plans.HubTopTwo(
      ColumnBridge.expression(col("vec")),
      ColumnBridge.expression(col("nrm")), hubSet))
    v.withColumn("best2", best2)
      .select(col("vid"), col("vec"), col("nrm"),
        col("best2").getField("i1").as("cell"),
        array(col("best2").getField("i1"), col("best2").getField("i2"))
          .as("hub_links"))
  }

  /** Directed edge list (src, dst): per-cell top-M short-range edges plus
    * the long-range hub links. Distinct — a hub can also be an in-cell
    * neighbor.
    */
  def edges(vectors: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // cached like search()'s projection: the ladder count, the hub
    // collect, and both self-join sides would otherwise each re-fold the
    // per-row norms from the source
    val v = graft.operators.OpCache.cache(projected(vectors, idCol, vecCol))
    edgesFrom(v, col("vid") < adaptiveHubs(v.count()))
  }

  /** Same, from an already-projected (vid, vec, nrm) frame — [[search]]
    * passes its cached projection so the corpus norms are computed once,
    * not re-folded by a second projection.
    */
  private def edgesFrom(v: DataFrame, hubPred: Column): DataFrame = {
    val hs = collectHubs(v, hubPred)
    // no hubs (e.g. a corpus whose ids all exceed nHubs — the first-N-ids
    // convention found nothing): no graph, empty edge list — not a
    // per-row length-mismatch crash in the probe expression
    if (hs.size == 0)
      return v.limit(0).select(col("vid").as("src"), col("vid").as("dst"))
    val hubSet = v.sparkSession.sparkContext.broadcast(hs)
    val h = withHubs(v, hubSet)
    val a = h.select(col("vid").as("src"), col("vec").as("svec"),
      col("nrm").as("snrm"), col("cell"))
    val b = h.select(col("vid").as("dst"), col("vec").as("dvec"),
      col("nrm").as("dnrm"), col("cell"))
    val inCell = a.join(b, Seq("cell")).filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        VectorFns.cosine(VectorFns.dot(col("svec"), col("dvec")),
          col("snrm"), col("dnrm")).as("cosine"))
    // Ranking choice, stated honestly: the hub ladder bounds MEAN cell
    // occupancy (~TargetCell); a heavily clustered corpus can still
    // concentrate mass in one cell, and that cliff lives in the per-cell
    // JOIN above (pair mass ~occupancy² — the same intrinsic-cluster
    // residual q31 documents), which neither ranking strategy changes.
    // Given the join's output, the window's codegen'd sort beat TopK's
    // object-hash aggregation ~5x at the 100x probe; TopK's remaining
    // advantage (k-per-src-per-mapper shuffle reduction) only matters
    // once a cell is already pathologically hot — at which point re-split
    // the cell (finer hubs / salting) rather than rank its n² pairs.
    val wShort = Window.partitionBy("src")
      .orderBy(col("cosine").desc, col("dst").asc)
    val short = inCell.withColumn("__r", row_number().over(wShort))
      .filter(col("__r") <= M).select(col("src"), col("dst"))
    val long = h.select(col("vid").as("src"),
        explode(col("hub_links")).as("dst"))
      // -1 = an unfilled fold slot (corpus with fewer hubs than HubLinks)
      .filter(col("src") =!= col("dst") && col("dst") >= 0)
    short.unionByName(long).distinct()
  }

  /** Approximate top-k per query (same output shape as [[CosineTopK]]):
    * (query_id, neighbor_id, cosine, rank).
    */
  def search(vectors: DataFrame, idCol: String, vecCol: String,
             queryPred: Column => Column, k: Int,
             knownN: Option[Long] = None): DataFrame = {
    val v = graft.operators.OpCache.cache(
      projected(vectors, idCol, vecCol))
    // knownN: exact corpus count a composition already holds — skips the
    // ladder's own count() pass (SemanticDedup.flaggedAdaptive's contract)
    val nHubs = adaptiveHubs(knownN.getOrElse(v.count())) // bounded scalar
    searchWhere(v, col("vid") < nHubs, queryPred, k)
  }

  /** [[search]] with TRAINED hubs: k-means over a deterministic
    * vid-modulus sample ([[trainModulus]] — bounds training cost at any
    * corpus size), then the per-cluster MEDOIDS become the hub set —
    * hubs must be real graph vertices, so the virtual centroids are
    * snapped back onto corpus rows ([[KMeansExact.medoids]]). Cells,
    * edges and every beam round then run the unchanged graph contract
    * with `vid ∈ medoids` replacing `vid < nHubs`; the q100 oracle
    * replays sample ladder, every training iteration, the medoid pick,
    * and the walk bit-for-bit. Empty clusters surface no medoid, so the
    * hub count can land under the ladder target — an accepted trade
    * (the ladder bounds MEAN occupancy either way).
    */
  def searchTrained(vectors: DataFrame, idCol: String, vecCol: String,
                    queryPred: Column => Column, k: Int, trainIters: Int,
                    dims: Int, knownN: Option[Long] = None): DataFrame = {
    val v = graft.operators.OpCache.cache(
      projected(vectors, idCol, vecCol))
    val n = knownN.getOrElse(v.count()) // bounded driver scalar
    val nHubs = adaptiveHubs(n)
    val m = trainModulus(n)
    val qzs = graft.operators.OpCache.cache(KMeansExact.quantized(
      v.filter(col("vid") % m === 0), "vid", "vec", dims))
    val cents = KMeansExact.train(qzs, nHubs, trainIters, dims)
    val hubVids = KMeansExact.medoids(qzs, cents) // bounded: ≤ nHubs ids
    searchWhere(v, col("vid").isin(hubVids.toIndexedSeq: _*), queryPred, k)
  }

  private def searchWhere(v: DataFrame, hubPred: Column,
                          queryPred: Column => Column, k: Int): DataFrame = {
    val e = graft.operators.OpCache.cache(edgesFrom(v, hubPred))
    val queries = v.filter(queryPred(col("vid")))
      .select(col("vid").as("query_id"), col("vec").as("qvec"),
        col("nrm").as("qnrm"))

    def topB(beam: DataFrame): DataFrame = {
      // per-query candidate set is ≤ B·(M+3) rows by construction — the
      // window is bounded by beam/degree knobs, not data
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("node").asc)
      beam.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= Beam).drop("__r")
    }

    // seed: the query's top-B hubs
    val hubFrame = v.filter(hubPred)
      .select(col("vid").as("node"), col("vec").as("nvec"), col("nrm").as("nnrm"))
    var beam = topB(queries.join(broadcast(hubFrame), lit(true))
      .select(col("query_id"),
        col("node"),
        VectorFns.cosine(VectorFns.dot(col("qvec"), col("nvec")),
          col("qnrm"), col("nnrm")).as("cosine")))

    var round = 0
    while (round < Rounds) {
      val frontier = beam.select(col("query_id"), col("node"))
        .join(e, col("node") === col("src"))
        .select(col("query_id"), col("dst").as("node"))
        .join(v, col("node") === col("vid"))
        .join(queries.select(col("query_id"), col("qvec"), col("qnrm")),
          Seq("query_id"))
        .select(col("query_id"), col("node"),
          VectorFns.cosine(VectorFns.dot(col("qvec"), col("vec")),
            col("qnrm"), col("nrm")).as("cosine"))
      beam = topB(beam.unionByName(frontier)
        .dropDuplicates("query_id", "node"))
      // checkpoint the lineage each round (tiny frame): Rounds-fold nested
      // plans otherwise re-plan/re-execute the whole prefix per round
      beam = graft.operators.OpCache.cache(beam)
      round += 1
    }

    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("node").asc)
    beam.filter(col("node") =!= col("query_id"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("node").as("neighbor_id"),
        col("cosine"), col("rank"))
  }
}
