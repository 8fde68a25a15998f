package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-CLUSTER resolution: connected components over a near-dup pair
  * list — the step a real dedup pipeline ends with. Pair generators
  * ([[NGramJaccard]], [[MinHashLSH]], CosinePairs) emit edges; transitive
  * closure groups them ("A≈B, B≈C ⇒ one cluster"), and the canonical
  * survivor per cluster is its minimum id (deterministic: the fixpoint is
  * unique regardless of iteration order, so any engine agrees).
  *
  * Algorithm: iterative min-label propagation — each node starts as its own
  * representative; every round each node takes the min of its own and its
  * neighbors' labels; fixpoint in `diameter` rounds. Per round the work is
  * ONE edge⋈label shuffle join + a partial-agg min — the classic map-reduce
  * CC formulation (cf. Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC'14 — whose large-star/small-star variant is the upgrade
  * path if corpus components ever have large diameters; near-dup clusters
  * are dense blobs with tiny diameters, so plain propagation converges in a
  * handful of rounds).
  *
  * Iteration mechanics on Spark: each round's labels are
  * `localCheckpoint`ed — without truncation the lineage (and Catalyst
  * analysis time) grows per round and a failure would recompute the whole
  * chain. Label/edge frames are id-pairs only — tiny relative to the corpus
  * the pairs came from.
  *
  * Output: (node, cluster_rep, cluster_size) for every node that appears in
  * at least one pair; unpaired documents are implicitly their own
  * singleton clusters and are not materialized.
  */
object DupClusters {

  /** Partition-local PRE-CONTRACTION (the "local contraction" optimization
    * of the MapReduce-CC literature, cf. Kiveris et al. SoCC'14 §6): run
    * union-find INSIDE each arriving edge partition and emit one
    * (node → local-representative) star edge per distinct non-root node.
    * A union-find forest spans exactly the partition's connectivity, so
    * the GLOBAL component structure — and therefore the unique min-id
    * fixpoint both CC variants converge to — is unchanged, while the edge
    * set the global rounds shuffle collapses by the partition-local
    * clustering factor (near-dup pair generators emit bucket-adjacent
    * edges, so one partition often holds whole clusters) and the residual
    * graph's DIAMETER collapses too (each local component becomes a
    * depth-1 star), cutting global rounds.
    *
    * Runs NARROW — no repartition: it exploits whatever locality the
    * generator's partitioning already has; worst case (zero locality) it
    * emits ≤ one edge per input edge endpoint and the global rounds see
    * what they saw before. Memory is the distinct-nodes-per-partition
    * hash map — the same order as a shuffle hash table over the
    * partition. Nulls are dropped (no identity to merge — both variants'
    * documented contract); a self-loop registers its node but emits no
    * edge (the node surfaces as a singleton via the separate node
    * universe).
    */
  private def precontract(raw: DataFrame): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(raw.schema)
    raw.mapPartitions { it =>
      val parent = new java.util.HashMap[Any, Any]()
      def find(a: Any): Any = {
        if (!parent.containsKey(a)) { parent.put(a, a); a }
        else {
          var root = a
          while (parent.get(root) != root) root = parent.get(root)
          var cur = a // path compression: value updates only, no new keys
          while (parent.get(cur) != cur) {
            val nxt = parent.get(cur); parent.put(cur, root); cur = nxt
          }
          root
        }
      }
      it.foreach { r =>
        val x = r.get(0)
        val y = r.get(1)
        if (x != null && y != null) {
          val rx = find(x)
          val ry = find(y)
          if (rx != ry) parent.put(rx, ry)
        }
      }
      import scala.jdk.CollectionConverters._
      // value-only mutation (path compression) during iteration is safe:
      // find() inserts no keys for already-registered nodes
      parent.keySet().iterator().asScala.flatMap { k =>
        val r = find(k)
        if (r == k) None else Some(org.apache.spark.sql.Row(k, r))
      }
    }
  }

  def components(pairs: DataFrame, aCol: String, bCol: String,
                 maxIter: Int = 50): DataFrame = {
    require(aCol != bCol, s"pair columns must differ, got '$aCol' twice")
    // null ids carry no identity to merge: edges touching a null are dropped,
    // but the NON-null side of such a pair still surfaces as its own
    // singleton — the same contract componentsAlternating implements, so the
    // two documented-equivalent variants agree on null-id input
    val nodes = pairs.select(col(aCol).as("node"))
      .unionByName(pairs.select(col(bCol).as("node")))
      .filter(col("node").isNotNull)
      .distinct()
    val sc = pairs.sparkSession.sparkContext
    sc.setJobDescription("dup-clusters: precontract")
    // pre-contraction replaces the raw edge set with partition-local
    // stars BEFORE the first shuffle: the distinct and every propagation
    // round below run on the contracted (usually far smaller, always
    // shallower) graph; the fixpoint is identical (see precontract)
    val contracted = precontract(
      pairs.select(col(aCol).as("x"), col(bCol).as("y")))
    // (no checkpoint here: the first pass now has exactly one consumer —
    // the distinct feeding the second pass — so the narrow pipeline runs
    // once either way and checkpointing it would only add a job)
    // SECOND contraction, after one exchange (round-20 measurement: the
    // chained-dup gates ran EIGHT propagation rounds per CC call, and
    // each round is a full contracted-edge-set shuffle — at scale rounds
    // are the dominant shuffle bytes of the closure): the distinct's
    // exchange re-groups the first pass's star edges into size-coalesced
    // partitions, so one more NARROW union-find pass collapses every
    // chain the partition-local first pass couldn't see. Star edges
    // preserve connectivity (precontract's contract), so contracting
    // twice reaches the identical unique min-id fixpoint — measured
    // rounds dropped 8 → ≤3 on the video-chain gates.
    val contracted2 = precontract(contracted.distinct())
      .localCheckpoint()
    val edges = contracted2
      .select(col("x").as("src"), col("y").as("dst"))
      .unionByName(contracted2.select(col("y").as("src"), col("x").as("dst")))
      .distinct()
      .localCheckpoint() // re-read every round; never recompute the pair gen
    var labels = nodes
      .withColumn("rep", col("node"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    val labelSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node",
        labels.schema("node").dataType),
      org.apache.spark.sql.types.StructField("rep",
        labels.schema("rep").dataType)))
    implicit val labelEnc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(labelSchema)
    while (!converged && iter < maxIter) {
      iter += 1
      sc.setJobDescription(s"dup-clusters: round $iter")
      val nbrMin = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(col("src")).agg(min(col("rep")).as("nbr_rep"))
      // the decrease flag rides the SAME projection the round already
      // checkpoints ("no label decreased" — labels only ever decrease,
      // making that the fixpoint test), and since round 20 the flag is
      // COUNTED DURING the checkpoint materialization through an
      // accumulator instead of a second per-round action over the
      // materialized blocks: one action per round, not two. Accumulator
      // double-count under task retry cannot flip the decision — it is
      // only ever compared against ZERO, and a retried task reports
      // change iff a change exists. The narrow row pass sits on the
      // label frame (pair-graph-sized, never the corpus) — precontract's
      // altitude.
      val changed = sc.longAccumulator(s"dup-clusters-changed-$iter")
      val next = labels.alias("l")
        .join(nbrMin, col("l.node") === nbrMin("src"), "left")
        .select(col("l.node").as("node"),
          least(col("l.rep"), coalesce(col("nbr_rep"), col("l.rep"))).as("rep"),
          (col("nbr_rep") < col("l.rep")).as("__changed"))
        .mapPartitions { it =>
          it.map { r =>
            if (!r.isNullAt(2) && r.getBoolean(2)) changed.add(1L)
            org.apache.spark.sql.Row(r.get(0), r.get(1))
          }
        }
        .localCheckpoint()
      converged = changed.value == 0L
      labels = next
    }
    sc.setJobDescription(null)
    require(converged,
      s"connected components did not converge in $maxIter rounds — a " +
        "component with diameter beyond maxIter; raise maxIter or switch " +
        "to the large-star/small-star variant")
    val sizes = labels.groupBy(col("rep")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "rep")
      .select(col("node"), col("rep").as("cluster_rep"), col("cluster_size"))
  }

  /** The O(log n)-round variant: alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the upgrade path [[components]]' scaladoc names for graphs
    * whose components have LARGE DIAMETERS (chained near-dups), where
    * plain min-label propagation needs diameter rounds.
    *
    *   - large-star(u): connect every neighbor v > u to m = min(N(u) ∪ u)
    *   - small-star(u): connect every neighbor v < u, and u itself, to m
    *
    * Each half-round is one groupBy-min + join-back over the edge list;
    * the edge set monotonically contracts toward stars centered on each
    * component's minimum, reaching the same unique fixpoint as
    * [[components]] (equivalence is spec-asserted on random graphs; a
    * 64-node path converging within 12 rounds — far under its 63
    * diameter — is the log-round evidence).
    */
  def componentsAlternating(pairs: DataFrame, aCol: String, bCol: String,
                            maxIter: Int = 25): DataFrame = {
    require(aCol != bCol, s"pair columns must differ, got '$aCol' twice")
    // node universe BEFORE canonicalization: self-loop-only nodes must
    // still come out as singleton clusters (matching [[components]]);
    // null ids are dropped on both variants' paths (no identity to merge)
    val nodes = pairs.select(col(aCol).as("node"))
      .unionByName(pairs.select(col(bCol).as("node")))
      .filter(col("node").isNotNull)
      .distinct()
    // canonical undirected edge set, self-loops dropped
    def canonical(df: DataFrame): DataFrame = df
      .filter(col("x").isNotNull && col("y").isNotNull)
      .select(least(col("x"), col("y")).as("lo"), greatest(col("x"), col("y")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    def bidirectional(df: DataFrame): DataFrame =
      df.select(col("lo").as("u"), col("hi").as("v"))
        .unionByName(df.select(col("hi").as("u"), col("lo").as("v")))
    def star(edges: DataFrame, large: Boolean): DataFrame = {
      val nbr = bidirectional(edges)
      val m = nbr.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u").as("mu"), least(col("u"), col("mv")).as("m"))
      val withM = nbr.join(m, col("u") === col("mu"))
      val rewired =
        if (large) withM.filter(col("v") > col("u"))
          .select(col("v").as("x"), col("m").as("y"))
        else withM.filter(col("v") < col("u"))
          .select(col("v").as("x"), col("m").as("y"))
          .unionByName(m.select(col("mu").as("x"), col("m").as("y")))
      canonical(rewired).localCheckpoint()
    }
    // pre-contraction before the first global round: the alternating
    // stars then start from partition-locally-collapsed edges (identical
    // fixpoint — see precontract; canonical consumes the narrow pass once)
    var edges = canonical(precontract(
      pairs.select(col(aCol).as("x"), col(bCol).as("y")))).localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      iter += 1
      val next = star(star(edges, large = true), large = false)
      converged = next.exceptAll(edges).isEmpty && edges.exceptAll(next).isEmpty
      edges = next
    }
    require(converged,
      s"alternating star did not converge in $maxIter rounds — raise maxIter")
    // converged edges form stars around each component's min node;
    // edge-less nodes (self-loop-only inputs) rejoin as their own reps
    val nbr = bidirectional(edges)
    val starred = nbr.groupBy(col("u").as("node"))
      .agg(min(col("v")).as("mn"))
      .select(col("node"), least(col("node"), col("mn")).as("rep"))
    val labels = nodes.join(starred, Seq("node"), "left")
      .select(col("node"), coalesce(col("rep"), col("node")).as("rep"))
    val sizes = labels.groupBy(col("rep")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "rep")
      .select(col("node"), col("rep").as("cluster_rep"), col("cluster_size"))
  }
}
