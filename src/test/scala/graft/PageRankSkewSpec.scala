package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** The hot-key question on PageRank's dst-keyed SUM (the r15 stretch):
  * does a power-law in-degree (the real web-graph case — one page every
  * host links to) concentrate a reducer? The answer, pinned here, is that
  * it structurally cannot: Spark's HashAggregate is ALREADY the salted
  * two-phase SUM — a partial aggregate runs on the map side of the
  * exchange, so the hub's reducer receives at most ONE partial row per
  * upstream partition, never the edge volume. A hand-rolled
  * (dst, salt)-keyed pre-aggregation would duplicate machinery the
  * engine codegens natively. The remaining skew surface is the
  * contribution JOIN's src side (a hub SOURCE lands its whole edge list
  * in one sort-merge partition), which is AQE skew-join territory —
  * GraftSession ships `spark.sql.adaptive.skewJoin.enabled=true`.
  *
  * The spec drives both claims on a Zipf-shaped graph: a hub dst that
  * every node links to (in-degree n−1) plus a sparse uniform remainder.
  */
class PageRankSkewSpec extends SparkSpec {
  import spark.implicits._

  private val N = 20000L

  /** Star-plus-ring Zipf caricature: every node u>0 links to hub 0, and
    * u links to u+1 (ring) so nothing dangles and ranks are nontrivial.
    */
  private def zipfEdges = {
    val star = spark.range(1, N).select(col("id").as("src"), lit(0L).as("dst"))
    val ring = spark.range(0, N)
      .select(col("id").as("src"), ((col("id") + 1) % N).as("dst"))
    star.union(ring)
  }

  test("the dst-keyed SUM is two-phase in the plan: a partial aggregate precedes the exchange") {
    // PageRank.run checkpoints each round, so the returned frame's plan
    // is a checkpoint scan; replicate the iteration body's contribution
    // sum VERBATIM (PageRank.scala's loop) and assert on ITS plan
    val e = zipfEdges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ew = e.join(outdeg, "src")
    val rank = e.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1000000L).as("r"))
    val sums = ew.join(rank.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"), expr("r DIV deg").as("c"))
      .groupBy("node").agg(sum(col("c")).as("s"))
    val plan = sums.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the contribution sum: partial_sum on the map side of its shuffle —
    // the engine-native form of the "salted two-phase SUM"; a plan that
    // shipped raw per-edge rows to the dst reducer would drop this marker
    assert(plan.contains("partial_sum"),
      s"no map-side partial aggregate in the PageRank contribution sum:\n$plan")
  }

  test("hub in-degree of n-1 computes correctly and its SUM shuffle carries partials, not edges") {
    val hub = PageRank.run(zipfEdges, "src", "dst", iterations = 3)
      .orderBy(desc("pr")).limit(3).collect()
    // the hub must dominate: it receives (n-1) contributions per round
    assert(hub.head.getLong(0) == 0L, s"hub not top-ranked: ${hub.toSeq}")

    // the LOAD claim, measured deterministically (wall-clock ratios flake
    // on a shared sandbox): on a pure star graph (every node -> hub, so
    // dst cardinality is 2 and the hub holds ~|E| contributions) the agg
    // exchange must ship MAP-SIDE PARTIALS — O(maps x distinct dst) rows
    // — never the |E| per-edge rows a one-phase plan would send the hub's
    // reducer. AQE off so the executed plan exposes the raw exchange.
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    try {
      val star = spark.range(1, N).select(col("id").as("src"), lit(0L).as("dst"))
        .union(Seq((0L, 1L)).toDF("src", "dst"))
      val e = star
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull).distinct()
      val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      val ew = e.join(outdeg, "src")
      val rank = e.select(col("src").as("node")).distinct()
        .select(col("node"), lit(1000000L).as("r"))
      val sums = ew.join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("r DIV deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      assert(sums.collect().length == 2) // dst domain: the hub and node 1
      def unwrap(p: org.apache.spark.sql.execution.SparkPlan): org.apache.spark.sql.execution.SparkPlan =
        p match {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec => unwrap(w.child)
          case i: org.apache.spark.sql.execution.InputAdapter => unwrap(i.child)
          case other => other
        }
      val aggShuffleRows = sums.queryExecution.executedPlan.collect {
        case ex: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if unwrap(ex.child).isInstanceOf[
            org.apache.spark.sql.execution.aggregate.BaseAggregateExec] =>
          ex.metrics("shuffleRecordsWritten").value
      }
      assert(aggShuffleRows.nonEmpty, "no exchange above a partial aggregate found")
      val rows = aggShuffleRows.min
      info(s"|E|=${N + 1} edges; agg exchange shipped $rows partial rows")
      assert(rows < 500,
        s"agg exchange shipped $rows rows for ${N + 1} edges — partial " +
          "aggregation is not bounding the hot dst key")
    } finally spark.conf.set(aqeKey, prior)
  }
}
