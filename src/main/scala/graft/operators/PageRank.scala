package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-integer PageRank by power iteration — the graph-centrality
  * scorer web-scale curation pipelines weight documents with (CCNet /
  * RefinedWeb rank Common Crawl hosts by centrality before filtering;
  * the reference's affinity mart (q88) stops at co-occurrence counts,
  * this closes the loop to a stationary importance score).
  *
  * Exact-arithmetic discipline (the q54/q67 rule — floats never cross an
  * aggregate): ranks are BIGINTs scaled by [[Scale]]; every step is
  * integer multiply / truncating integer division (`DIV`) / integer SUM,
  * so results are bit-replayable on any engine — float PageRank sums
  * per-edge doubles in shuffle order and is not. The truncation loses at
  * most 1/[[Scale]] of mass per edge per iteration (documented, both
  * engines identical). With damping d = [[DampNum]]/[[DampDen]]:
  * {{{
  *   base    = Scale DIV n
  *   r_0(v)  = base
  *   r_k(v)  = ((DampDen−DampNum)·base) DIV DampDen
  *           + (DampNum · (Σ_{u→v} (r_{k−1}(u) DIV deg(u))
  *                         + dangling_{k−1} DIV n)) DIV DampDen
  * }}}
  * where `dangling` is the summed rank of zero-out-degree nodes,
  * redistributed uniformly.
  *
  * Scale shape: one iteration = one src-keyed join of the rank frame to
  * the (edge, deg) frame plus one dst-keyed integer-SUM shuffle — the
  * standard Pregel-on-DataFrames step, linear in |E| per iteration. The
  * (edge, deg) frame AND the has-out-edges node set the dangling
  * anti-join probes are each localCheckpointed ONCE and re-read every
  * round (the DupClusters lineage rule — an anti-join against the
  * UN-checkpointed degree frame would recompute the full edge derivation
  * per round); each iteration's rank frame is localCheckpointed so the
  * plan does not grow with k (rank is consumed twice per round —
  * contribution join and dangling sum), and the PRIOR round's checkpoint
  * blocks are released once the new one materializes
  * ([[Checkpoints.releasable]]), so storage is O(1) in the round count.
  * Driver state: the node count, one long. The dangling mass is a 1-row
  * broadcast cross-join, never a per-iteration collect.
  *
  * Hot-key skew (the web-graph power-law in-degree case): the dst-keyed
  * SUM needs no salting because Spark's HashAggregate IS the two-phase
  * salted sum — a map-side partial aggregate runs before the exchange,
  * so a hub's reducer receives at most one partial row per upstream
  * partition, never the edge volume (PageRankSkewSpec measures 9 shuffle
  * rows for a 20k-edge star graph and pins the partial_sum plan shape).
  * The remaining skew surface is the contribution join's src side (a
  * high-OUT-degree hub lands its edge list in one sort-merge partition),
  * which AQE skew-join splitting covers — [[graft.GraftSession]] ships
  * `spark.sql.adaptive.skewJoin.enabled=true`.
  */
object PageRank {

  /** Rank fixed-point scale: ranks carry 12 integer digits of mass. */
  val Scale = 1000000000000L
  val DampNum = 85L
  val DampDen = 100L

  /** Iterate `iterations` rounds over the DISTINCT (src, dst) edge set
    * (multi-edges collapse — simple-digraph PageRank; pre-weight edges
    * upstream if multiplicity should count). Returns (node, pr) with pr
    * the scaled integer rank after the last round.
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iterations: Int): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // (src, dst, deg): built once, re-read every iteration
    val ew = e.join(outdeg, "src").localCheckpoint()
    // the dangling anti-join's probe set, derived from the CHECKPOINTED
    // frame (never the raw outdeg lineage, which would replay the full
    // edge derivation every round) and itself checkpointed once
    val hasOut = ew.select(col("src").as("node")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count() // the one driver scalar
    require(n > 0, "empty graph")
    val base = Scale / n
    val base15 = ((DampDen - DampNum) * base) / DampDen
    var rank = nodes.select(col("node"), lit(base).as("r"))
    var releaseRank: () => Unit = () => ()
    for (_ <- 1 to iterations) {
      val sums = ew
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("r DIV deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      val dang = rank
        .join(hasOut, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L)).as("d"))
      val (next, releaseNext) = Checkpoints.releasable(nodes
        .join(sums, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          expr(s"${base15}L + (($DampNum * (coalesce(s, 0L) + (d DIV ${n}L)))" +
            s" DIV $DampDen)").as("r")))
      releaseRank() // prior round's blocks, released after `next` is live
      rank = next
      releaseRank = releaseNext
    }
    rank.select(col("node"), col("r").as("pr"))
  }
}
