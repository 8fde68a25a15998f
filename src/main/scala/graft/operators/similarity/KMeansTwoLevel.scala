package graft.operators.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{CentroidSet, GroupedCentroidSet, GroupedHubSet,
  HubArgmaxGrouped, HubSet, HubTopTwo, KMeansAssign, KMeansAssignGrouped}

/** TWO-LEVEL (coarse → fine) k-means — the assignment rung ABOVE the flat
  * cell ladder (the standard IVF hierarchy): train `kc` coarse cells over
  * the sample, then `kf` fine cells WITHIN each coarse cell, so assigning
  * a vector costs kc + kf centroid scans instead of kc·kf. The flat
  * ladder's wall is exactly this product: at
  * [[graft.operators.dedup.SemanticDedup]]'s old MaxCells=4096 the n·k
  * assignment was already the dominant term, and the cell ladder capped
  * at ~1.05M vectors of coverage; two-level moves the same
  * TargetCell-occupancy discipline to kc·kf total cells (2^20 at the
  * caps — ~268M vectors) while the per-row probe stays a few hundred
  * scans.
  *
  * Every step keeps [[KMeansExact]]'s oracle-replayable arithmetic:
  *  - COARSE training is literally [[KMeansExact.train]];
  *  - the sample's coarse assignment (for fine training) is the same
  *    int64 argmin-L2 probe, FINAL coarse centroids, ties → lowest cid;
  *  - FINE seeds are, per coarse cell, the kf lowest sample vids in that
  *    cell (deterministic; cells with fewer members seed fewer, empty
  *    cells seed none);
  *  - fine Lloyd iterations assign each sample row among ITS coarse
  *    cell's fine centroids only (ties → lowest fine id) and update with
  *    the exact integer floor-mean; empty fine cells keep their centroid;
  *  - the CORPUS assignment is cosine argmax over the dequantized coarse
  *    centroids (gid — [[HubTopTwo]]'s slot i1, the q121 discipline),
  *    then cosine argmax over that cell's dequantized fine centroids
  *    ([[HubArgmaxGrouped]]; an unseeded cell collapses to fine id 0);
  *    cluster_id = gid·kf + fid.
  *
  * Scale shape: training is sample·(kc + kf)·dims work with
  * (kc·kf)-bounded driver collects per iteration; assignment is two
  * broadcast codegen probes — zero corpus shuffles. The resident centroid
  * state is kc·kf·dims doubles: ~0.5 GB broadcast at the 2^20-cell cap
  * with dims 64 — the documented cost of this rung; past it, fine
  * centroids stop being a broadcast and become a join table, which is a
  * different operator.
  */
object KMeansTwoLevel {

  /** Trained two-level centroids: `coarse` is kc quantized vectors (the
    * [[KMeansExact.train]] artifact); `fine(g)` is coarse cell g's fine
    * centroids (≤ kf, possibly empty for cells no sample row reached),
    * fine id = index.
    */
  final case class TwoLevel(coarse: Array[Array[Long]],
                            fine: Array[Array[Array[Long]]]) {
    def kc: Int = coarse.length
  }

  /** Train on a quantized sample ([[KMeansExact.quantized]]): coarse via
    * [[KMeansExact.train]], then `iters` grouped fine Lloyd iterations.
    */
  def train(qz: DataFrame, kc: Int, kf: Int, iters: Int,
            dims: Int): TwoLevel = {
    require(kc > 0 && kf > 0 && iters >= 0 && dims > 0,
      s"bad two-level kmeans shape kc=$kc kf=$kf iters=$iters dims=$dims")
    val spark = qz.sparkSession
    val coarse = KMeansExact.train(qz, kc, iters, dims)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // the sample's coarse cell, against the FINAL coarse centroids —
    // computed once (coarse centroids are frozen from here on)
    val bcC = spark.sparkContext.broadcast(
      CentroidSet(coarse.flatten, coarse.length, dims))
    val gidCol = ColumnBridge.column(KMeansAssign(
      ColumnBridge.expression(col("qvec")), bcC)).getField("cid")
    val zg = graft.operators.OpCache.cache(
      qz.select(col("vid"), col("qvec"), gidCol.as("gid")))
    // fine seeds: per coarse cell, the kf lowest vids (a per-cell window
    // over the TrainCap-bounded sample; the collect is ≤ kc·kf rows)
    val w = Window.partitionBy(col("gid")).orderBy(col("vid"))
    val seedRows = zg
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= kf)
      .select(col("gid"), col("rn"), col("qvec"))
      .collect() // bounded: ≤ kc·kf rows of dims longs
    val fine: Array[Array[Array[Long]]] = {
      val buf = Array.fill(kc)(scala.collection.mutable.ArrayBuffer
        .empty[(Int, Array[Long])])
      seedRows.foreach { r =>
        buf(r.getLong(0).toInt) += ((r.getInt(1), r.getSeq[Long](2).toArray))
      }
      buf.map(_.sortBy(_._1).map(_._2).toArray)
    }
    var it = 0
    while (it < iters) {
      val offsets = fine.scanLeft(0)(_ + _.length)
      val bcF = spark.sparkContext.broadcast(
        GroupedCentroidSet(offsets, fine.flatten.flatten, dims))
      val fidCol = ColumnBridge.column(KMeansAssignGrouped(
        ColumnBridge.expression(col("qvec")),
        ColumnBridge.expression(col("gid")), bcF)).getField("cid")
      val sums = (0 until dims).map(i =>
        sum(element_at(col("qvec"), i + 1)).as(s"s$i"))
      val rows = zg.groupBy(col("gid"), fidCol.as("fcid"))
        .agg(count(lit(1)).as("cnt"), sums: _*)
        .collect() // bounded: ≤ kc·kf rows of dims longs
      bcF.destroy()
      val next = fine.map(_.map(_.clone()))
      rows.foreach { r =>
        val g = r.getLong(0).toInt
        val f = r.getLong(1).toInt
        val cnt = r.getLong(2)
        var i = 0
        while (i < dims) {
          val s = r.getLong(i + 3)
          val m = ((s % cnt) + cnt) % cnt // exact floor-mean (KMeansExact)
          next(g)(f)(i) = (s - m) / cnt
          i += 1
        }
      }
      fine.indices.foreach(g => fine(g) = next(g))
      it += 1
    }
    bcC.destroy()
    TwoLevel(coarse, fine)
  }

  /** Two-level cosine assignment of a projected corpus (vid, vec, nrm):
    * (vid, vec, nrm, cluster_id) with cluster_id = gid·kf + fid — two
    * broadcast codegen probes, zero corpus shuffles (the
    * [[IvfAnn.assignViaProbe]] transport, sliced).
    */
  def assign(v: DataFrame, tl: TwoLevel, kf: Int): DataFrame = {
    val dims = tl.coarse.head.length
    val spark = v.sparkSession
    val cNrms = new Array[Double](tl.kc)
    val cFlat = new Array[Double](tl.kc * dims)
    tl.coarse.zipWithIndex.foreach { case (c, j) =>
      val (wts, nrm) = KMeansExact.dequantize(c)
      System.arraycopy(wts, 0, cFlat, j * dims, dims)
      cNrms(j) = nrm
    }
    val bcC = spark.sparkContext.broadcast(
      HubSet(Array.tabulate(tl.kc)(_.toLong), cNrms, cFlat, dims))
    val offsets = tl.fine.scanLeft(0)(_ + _.length)
    val total = offsets.last
    val fNrms = new Array[Double](total)
    val fFlat = new Array[Double](total * dims)
    var j = 0
    tl.fine.foreach(_.foreach { c =>
      val (wts, nrm) = KMeansExact.dequantize(c)
      System.arraycopy(wts, 0, fFlat, j * dims, dims)
      fNrms(j) = nrm
      j += 1
    })
    val bcF = spark.sparkContext.broadcast(
      GroupedHubSet(offsets, fNrms, fFlat, dims))
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val gid = ColumnBridge.column(HubTopTwo(
      ColumnBridge.expression(col("vec")),
      ColumnBridge.expression(col("nrm")), bcC)).getField("i1")
    val fid = ColumnBridge.column(HubArgmaxGrouped(
      ColumnBridge.expression(col("vec")),
      ColumnBridge.expression(col("nrm")),
      ColumnBridge.expression(col("gid")), bcF))
    v.select(col("vid"), col("vec"), col("nrm"), gid.as("gid"))
      .select(col("vid"), col("vec"), col("nrm"),
        (col("gid") * lit(kf.toLong) + fid).as("cluster_id"))
  }

  // ---------------------------------------------------------------------
  // DuckDB oracle generation: the SAME two-level training + assignment as
  // a CTE chain, composing KMeansExact.oracleCtes for the coarse half.
  // ---------------------------------------------------------------------

  /** CTE chain replaying [[train]] end-to-end: coarse training (the
    * [[KMeansExact.oracleCtes]] chain under prefix `{p}c`), the sample's
    * final coarse assignment `{p}casg(vid, gid)`, fine seeds
    * `{p}fit0(gid, fcid, c0..)`, `iters` grouped fine iterations, and the
    * dequantized fine weights `{p}fcw(gid, fcid, w0.., cnrm)` (the coarse
    * weights are `{p}ccw` from the spliced chain). Same splice contract
    * as [[KMeansExact.oracleCtes]]: no leading WITH, trailing comma.
    */
  def oracleCtes(p: String, fromSql: String, idExpr: String, vecExpr: String,
                 kc: Int, kf: Int, iters: Int, dims: Int): String = {
    val ds = 0 until dims
    val coarse = KMeansExact.oracleCtes(s"${p}c", fromSql, idExpr, vecExpr,
      kc, iters, dims)
    val sb = new StringBuilder(coarse)
    val cdist = ds.map(i => s"(z.q$i - c.c$i) * (z.q$i - c.c$i)").mkString(" + ")
    sb ++= s"""${p}casg AS MATERIALIZED (
      |  SELECT vid, cid AS gid FROM (
      |    SELECT z.vid, c.cid,
      |      row_number() OVER (PARTITION BY z.vid ORDER BY ($cdist) ASC, c.cid ASC) AS rn
      |    FROM ${p}cqz z CROSS JOIN ${p}cit$iters c) t
      |  WHERE rn = 1
      |),
      |${p}fit0 AS MATERIALIZED (
      |  SELECT gid, CAST(rn - 1 AS BIGINT) AS fcid,
      |    ${ds.map(i => s"q$i AS c$i").mkString(", ")} FROM (
      |    SELECT a.gid, z.vid, ${ds.map(i => s"z.q$i").mkString(", ")},
      |      row_number() OVER (PARTITION BY a.gid ORDER BY z.vid) AS rn
      |    FROM ${p}casg a JOIN ${p}cqz z USING (vid)) t
      |  WHERE rn <= $kf
      |),
      |""".stripMargin
    for (t <- 0 until iters) {
      val fdist = ds.map(i => s"(z.q$i - c.c$i) * (z.q$i - c.c$i)").mkString(" + ")
      val sums = ds.map(i => s"SUM(z.q$i) AS s$i").mkString(", ")
      val upd = ds.map(i =>
        s"CASE WHEN s.cnt IS NULL THEN i.c$i ELSE " +
          s"CAST((s.s$i - ((s.s$i % s.cnt + s.cnt) % s.cnt)) // s.cnt AS BIGINT) END AS c$i")
        .mkString(",\n    ")
      sb ++= s"""${p}fasg$t AS MATERIALIZED (
        |  SELECT vid, gid, fcid FROM (
        |    SELECT z.vid, a.gid, c.fcid,
        |      row_number() OVER (PARTITION BY z.vid ORDER BY ($fdist) ASC, c.fcid ASC) AS rn
        |    FROM ${p}cqz z JOIN ${p}casg a USING (vid)
        |      JOIN ${p}fit$t c ON c.gid = a.gid) t
        |  WHERE rn = 1
        |),
        |${p}fsum$t AS MATERIALIZED (
        |  SELECT a.gid, a.fcid, COUNT(*) AS cnt, $sums
        |  FROM ${p}fasg$t a JOIN ${p}cqz z USING (vid) GROUP BY a.gid, a.fcid
        |),
        |${p}fit${t + 1} AS MATERIALIZED (
        |  SELECT i.gid, i.fcid,
        |    $upd
        |  FROM ${p}fit$t i LEFT JOIN ${p}fsum$t s
        |    ON s.gid = i.gid AND s.fcid = i.fcid
        |),
        |""".stripMargin
    }
    val ws = ds.map(i =>
      s"CAST(c$i AS DOUBLE) / ${KMeansExact.Scale}.0 AS w$i").mkString(", ")
    val nrm = ds.map(i => s"w$i * w$i").mkString(" + ")
    sb ++= s"""${p}fcw AS MATERIALIZED (
      |  SELECT gid, fcid, ${ds.map(i => s"w$i").mkString(", ")}, sqrt($nrm) AS cnrm
      |  FROM (SELECT gid, fcid, $ws FROM ${p}fit$iters)
      |),
      |""".stripMargin
    sb.result()
  }
}
