package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.{CentroidSet, KMeansAssign}

/** Deterministic, ORACLE-REPLAYABLE k-means (Lloyd) training for the ANN
  * family's centroids/codewords/hubs — the upgrade from the first-K-ids
  * seeding convention ([[IvfAnn]]/[[NswAnn]]/[[PqAnn]]), which degrades
  * recall when early ids are unrepresentative of the corpus.
  *
  * Every arithmetic step is EXACT so an external engine (the DuckDB
  * oracle) replays every iteration bit-for-bit — the adaptive-ladder
  * discipline applied to training:
  *   - vectors quantize to fixed-point int64 at 2^20 (`floor(x · 2^20)` —
  *     the same double multiply+floor in any IEEE engine);
  *   - assignment is argmin SQUARED-L2 over int64 (ties → lowest cid) via
  *     the codegen'd broadcast [[KMeansAssign]] probe;
  *   - the update is the exact integer floor-mean: `(s − mod(s, n)) / n`
  *     divides an exact multiple, so any engine's integer division agrees;
  *     empty clusters keep their centroid;
  *   - iteration count is FIXED (no convergence test — a float epsilon
  *     would be engine-dependent).
  *
  * Scale shape: one quantized-corpus cache; per iteration one codegen'd
  * scan + a k-row aggregate collect (bounded by k·dims longs, a knob —
  * the [[graft.operators.GlobalRank]] bounded-driver-state argument). The
  * quantization bound is DIMS-AWARE ([[maxQFor]]): the largest power-of-2
  * per-element magnitude keeping the worst-case Σ diff² inside int64 —
  * 2^27 at dims 64 (|x| up to 128), shrinking one bit per dims doubling;
  * louder inputs must pre-scale, and the check is loud, not clamping.
  */
object KMeansExact {

  val ScaleBits = 20
  val Scale: Long = 1L << ScaleBits

  /** Largest power-of-2 bound B on quantized |q| such that the worst-case
    * squared distance dims · (2B)² stays ≤ 2^62 (headroom bit under
    * Long.Max): exact BigInt check, no float edge. DuckDB errors on BIGINT
    * overflow while Java wraps — the loud quantize-time bound is what
    * keeps the two engines in the same arithmetic domain.
    */
  def maxQFor(dims: Int): Long = {
    require(dims > 0, s"dims must be positive, got $dims")
    var b = 1L << 30
    while (b > 1 && BigInt(dims) * 4 * b * b > (BigInt(1) << 62)) b >>= 1
    b
  }

  /** (vid, qvec array<long>): `floor(x · 2^20)` per element, loud on
    * overflow-risk magnitudes (the dims-aware [[maxQFor]] bound) and on
    * null elements (squared distance has no skip-consistent null
    * semantics — the [[PqAnn]] dense-vector discipline).
    */
  def quantized(v: DataFrame, idCol: String, vecCol: String,
                dims: Int): DataFrame = {
    val maxQ = maxQFor(dims)
    v.select(col(idCol).cast("long").as("vid"),
      transform(col(vecCol), x => {
        val q = floor(x.cast("double") * lit(Scale.toDouble)).cast("long")
        when(q.isNull, raise_error(lit(
          "kmeans quantize: null element — training requires dense vectors")))
          .when(abs(q) >= lit(maxQ), raise_error(concat(
            lit("kmeans quantize: |x| too large for exact int64 distance: "),
            x.cast("string"))))
          .otherwise(q)
      }).as("qvec"))
  }

  /** `iters` exact Lloyd iterations over a quantized corpus, seeded from
    * the k LOWEST vids (deterministic total order). Returns the k
    * centroids as quantized int64 vectors, cid = array index in seed-vid
    * order.
    */
  def train(qz: DataFrame, k: Int, iters: Int, dims: Int): Array[Array[Long]] = {
    require(k > 0 && iters >= 0 && dims > 0, s"bad kmeans shape k=$k iters=$iters dims=$dims")
    val spark = qz.sparkSession
    val seedRows = qz.orderBy(col("vid")).limit(k)
      .collect() // bounded: k rows
    require(seedRows.nonEmpty, "kmeans needs a non-empty corpus")
    var cents: Array[Array[Long]] = seedRows.map { r =>
      val q = r.getSeq[Long](1)
      require(q.length == dims, s"vector dim ${q.length} != declared $dims")
      q.toArray
    }
    import org.apache.spark.sql.graftbridge.ColumnBridge
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(
        CentroidSet(cents.flatten, cents.length, dims))
      val asg = ColumnBridge.column(KMeansAssign(
        ColumnBridge.expression(col("qvec")), bc)).getField("cid")
      val sums = (0 until dims).map(i =>
        sum(element_at(col("qvec"), i + 1)).as(s"s$i"))
      val rows = qz.groupBy(asg.as("cid"))
        .agg(count(lit(1)).as("cnt"), sums: _*)
        .collect() // bounded: ≤ k rows of dims longs
      bc.destroy()
      val next = cents.map(_.clone())
      rows.foreach { r =>
        val cid = r.getLong(0).toInt
        val cnt = r.getLong(1)
        var i = 0
        while (i < dims) {
          val s = r.getLong(i + 2)
          // exact floor-mean: subtract the nonnegative remainder so the
          // division is an exact multiple — any engine's integer division
          // (floor or trunc) then agrees
          val m = ((s % cnt) + cnt) % cnt
          next(cid)(i) = (s - m) / cnt
          i += 1
        }
      }
      cents = next
      it += 1
    }
    cents
  }

  /** MEDOID per cluster: assign the quantized corpus to the trained
    * centroids one last time and take, per cid, the row with the least
    * (dist, vid) — `min(struct(dist, vid))` is a plain aggregate (no
    * single-partition window) and the lexicographic struct order IS the
    * (dist ASC, vid ASC) rank-1 the oracle replays. Returns the medoid
    * vids ascending (≤ k — clusters that attracted no rows have none).
    * Medoids turn virtual centroids back into REAL corpus rows — what
    * [[NswAnn]] hubs must be, since beam nodes are graph vertices.
    */
  def medoids(qz: DataFrame, cents: Array[Array[Long]]): Array[Long] = {
    val spark = qz.sparkSession
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val bc = spark.sparkContext.broadcast(
      CentroidSet(cents.flatten, cents.length, cents.head.length))
    val asg = ColumnBridge.column(KMeansAssign(
      ColumnBridge.expression(col("qvec")), bc))
    val rows = qz.select(col("vid"), asg.as("a"))
      .groupBy(col("a").getField("cid").as("cid"))
      .agg(min(struct(col("a").getField("dist").as("dist"),
        col("vid").as("vid"))).as("m"))
      .select(col("m").getField("vid"))
      .collect() // bounded: ≤ k rows
    bc.destroy()
    rows.map(_.getLong(0)).sorted
  }

  /** Dequantize one centroid: weights `c / 2^20` (EXACT — power-of-two
    * divide) and the L2 norm accumulated left-associated in element order
    * (the [[VectorFns]] discipline, = the oracle's `sqrt(w0*w0 + …)`).
    */
  def dequantize(c: Array[Long]): (Array[Double], Double) = {
    val w = c.map(_.toDouble / Scale.toDouble)
    var ss = 0.0d
    var i = 0
    while (i < w.length) { ss += w(i) * w(i); i += 1 }
    (w, math.sqrt(ss))
  }

  // ---------------------------------------------------------------------
  // DuckDB oracle generation: the SAME training, as a CTE chain. Every CTE
  // is MATERIALIZED — the iteration chain references each level twice and
  // un-materialized CTEs re-execute (exponential unroll).
  // ---------------------------------------------------------------------

  /** CTE chain replaying [[quantized]]+[[train]]: emits `{p}qz`,
    * `{p}it0..{p}it{iters}` (quantized int64 centroids c0..c{dims-1}) and
    * `{p}cw` (dequantized double weights w0..w{dims-1} + `cnrm`), reading
    * vectors from `fromSql` (must expose `{idExpr}` and the 1-based array
    * `{vecExpr}`). `offset` trains on the sub-vector starting at that
    * 0-based element (the [[PqAnn]] per-subspace slices; slicing before or
    * after quantization is the same elementwise floor). Returned WITHOUT a
    * leading WITH and WITH a trailing comma, so callers splice it into
    * their own chain.
    *
    * `kSql` overrides the seed count with an SQL scalar expression (e.g. a
    * `(SELECT h FROM ladder)` adaptive-knob subquery — [[NswAnn]]'s hub
    * count); `withMedoids` appends `{p}fasg` (final assignment of every
    * {p}qz row to the trained centroids, with its integer distance) and
    * `{p}med` (per-cid medoid vid under (dist ASC, vid ASC) — the
    * [[medoids]] replay).
    */
  def oracleCtes(p: String, fromSql: String, idExpr: String, vecExpr: String,
                 k: Int, iters: Int, dims: Int, offset: Int = 0,
                 kSql: String = null, withMedoids: Boolean = false): String = {
    val ds = 0 until dims
    val kExpr = if (kSql == null) k.toString else kSql
    val qCols = ds.map(i =>
      s"CAST(FLOOR(CAST($vecExpr[${offset + i + 1}] AS DOUBLE) * ${Scale}.0) AS BIGINT) AS q$i")
      .mkString(",\n    ")
    val sb = new StringBuilder
    sb ++= s"""${p}qz AS MATERIALIZED (
      |  SELECT $idExpr AS vid,
      |    $qCols
      |  FROM $fromSql
      |),
      |${p}it0 AS MATERIALIZED (
      |  SELECT cid, ${ds.map(i => s"q$i AS c$i").mkString(", ")} FROM (
      |    SELECT CAST(row_number() OVER (ORDER BY vid) - 1 AS BIGINT) AS cid,
      |      ${ds.map(i => s"q$i").mkString(", ")}
      |    FROM ${p}qz) t
      |  WHERE cid < ($kExpr)
      |),
      |""".stripMargin
    for (t <- 0 until iters) {
      val dist = ds.map(i => s"(z.q$i - c.c$i) * (z.q$i - c.c$i)").mkString(" + ")
      val sums = ds.map(i => s"SUM(z.q$i) AS s$i").mkString(", ")
      val upd = ds.map(i =>
        s"CASE WHEN s.cnt IS NULL THEN i.c$i ELSE " +
          s"CAST((s.s$i - ((s.s$i % s.cnt + s.cnt) % s.cnt)) // s.cnt AS BIGINT) END AS c$i")
        .mkString(",\n    ")
      sb ++= s"""${p}asg$t AS MATERIALIZED (
        |  SELECT vid, cid FROM (
        |    SELECT z.vid, c.cid,
        |      row_number() OVER (PARTITION BY z.vid ORDER BY ($dist) ASC, c.cid ASC) AS rn
        |    FROM ${p}qz z CROSS JOIN ${p}it$t c) t
        |  WHERE rn = 1
        |),
        |${p}sum$t AS MATERIALIZED (
        |  SELECT a.cid, COUNT(*) AS cnt, $sums
        |  FROM ${p}asg$t a JOIN ${p}qz z USING (vid) GROUP BY a.cid
        |),
        |${p}it${t + 1} AS MATERIALIZED (
        |  SELECT i.cid,
        |    $upd
        |  FROM ${p}it$t i LEFT JOIN ${p}sum$t s USING (cid)
        |),
        |""".stripMargin
    }
    val ws = ds.map(i => s"CAST(c$i AS DOUBLE) / ${Scale}.0 AS w$i").mkString(", ")
    val nrm = ds.map(i => s"w$i * w$i").mkString(" + ")
    sb ++= s"""${p}cw AS MATERIALIZED (
      |  SELECT cid, ${ds.map(i => s"w$i").mkString(", ")}, sqrt($nrm) AS cnrm
      |  FROM (SELECT cid, $ws FROM ${p}it$iters)
      |),
      |""".stripMargin
    if (withMedoids) {
      val dist = ds.map(i => s"(z.q$i - c.c$i) * (z.q$i - c.c$i)").mkString(" + ")
      sb ++= s"""${p}fasg AS MATERIALIZED (
        |  SELECT vid, cid, dist FROM (
        |    SELECT z.vid, c.cid, ($dist) AS dist,
        |      row_number() OVER (PARTITION BY z.vid ORDER BY ($dist) ASC, c.cid ASC) AS rn
        |    FROM ${p}qz z CROSS JOIN ${p}it$iters c) t
        |  WHERE rn = 1
        |),
        |${p}med AS MATERIALIZED (
        |  SELECT cid, vid FROM (
        |    SELECT cid, vid,
        |      row_number() OVER (PARTITION BY cid ORDER BY dist ASC, vid ASC) AS rn
        |    FROM ${p}fasg) t
        |  WHERE rn = 1
        |),
        |""".stripMargin
    }
    sb.result()
  }
}
