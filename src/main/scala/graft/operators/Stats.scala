package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-moment statistics: Pearson correlation computed from EXACT decimal
  * integer moments (Σx, Σy, Σx², Σy², Σxy over integer-scaled inputs) with
  * ONE fixed-order double formula at the end — unlike `corr()`, whose
  * float accumulation depends on partition order and whose co-moment
  * algorithm is engine-private, this is bitwise reproducible anywhere.
  *
  * Scale shape: the five moments are a single partial-agg pass (each
  * partition collapses to five numbers before the shuffle), and moment
  * sets MERGE by addition — per-partition/per-day moments combine without
  * re-reading data, like the sketches.
  *
  * Inputs must be integral-valued columns (scale money to cents first);
  * rows where either side is null are excluded pairwise, the standard
  * correlation contract.
  */
object Stats {
  def pearson(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    // 18-digit operands: their products stay inside decimal-38 on every
    // engine (38x38 would bind-fail in DuckDB and lose exactness anywhere)
    val d = df.filter(xCol.isNotNull && yCol.isNotNull)
      .select(xCol.cast("decimal(18,0)").as("x"), yCol.cast("decimal(18,0)").as("y"))
    val m = d.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    // The readout is the ONLY floating-point step; operation order below is
    // mirrored textually in the oracle SQL so both engines round
    // identically. Cross-engine caveat (hit at sf0.1): each moment-to-
    // double conversion must be CORRECTLY ROUNDED — Spark's Decimal
    // .toDouble is; DuckDB's direct decimal cast double-rounds above 2^53,
    // so the oracle routes moments through VARCHAR before casting.
    val nD = col("n").cast("double")
    def dbl(c: String) = col(c).cast("double")
    m.select(col("n"),
      ((nD * dbl("sxy") - dbl("sx") * dbl("sy")) /
        sqrt((nD * dbl("sxx") - dbl("sx") * dbl("sx")) *
          (nD * dbl("syy") - dbl("sy") * dbl("sy")))).as("pearson_r"))
  }

  /** Chi-square contingency cells for two categorical columns: per cell
    * the observed count, the exact expected-count RATIONAL (row_total ·
    * col_total as numerator over N — integers, no division drift), and
    * the cell's χ² contribution (o − e)²/e as ONE fixed-order double
    * formula over those exact integers.
    *
    * Deliberately emits CELLS, not the summed statistic: a sum of double
    * terms is partition-order-dependent, while each cell's term is a
    * deterministic function of exact integers. The cell frame is bounded
    * by |A|·|B| (category cardinalities), so summing it in a fixed order
    * downstream is trivial where the caller wants the scalar.
    *
    * Shape: one partial-agg pass for the contingency counts (cached — the
    * marginals, N and the final join all branch from it), two
    * broadcast-sized marginal frames joined back onto the cell frame.
    */
  def chiSquareCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
    val cells = OpCache.cache(
      base.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("o")))
    val rowTot = cells.groupBy(col(aCol)).agg(sum(col("o")).as("__r"))
    val colTot = cells.groupBy(col(bCol)).agg(sum(col("o")).as("__c"))
    // loud bound enforcement, not just a comment: the long products below
    // wrap silently past N ≈ 3·10⁹ under non-ANSI evaluation
    val n = cells.agg(sum(col("o")).as("__n"))
      .filter(when(col("__n") > 3000000000L, raise_error(concat(
          lit("chiSquareCells: N = "), col("__n").cast("string"),
          lit(" exceeds the exact-arithmetic bound (~3e9 rows); "),
          lit("pre-aggregate or sample first")))).otherwise(lit(true)))
    // (o - r·c/N)²/(r·c/N) == (o·N - r·c)² / (r·c·N): exact long products
    // inside decimals, one double division at the edge. 19-digit operands:
    // |num| ≤ N² needs the N guard above, and 19×19 keeps the square
    // inside decimal-38 on EVERY engine (DuckDB refuses a 38×38 multiply)
    val num = (col("o") * col("__n") - col("__r") * col("__c"))
      .cast("decimal(19,0)")
    val den = (col("__r") * col("__c")).cast("decimal(19,0)") * col("__n")
    cells
      .join(rowTot, Seq(aCol)).join(colTot, Seq(bCol)).join(broadcast(n), lit(true))
      .select(col(aCol), col(bCol), col("o"),
        col("__r").as("row_total"), col("__c").as("col_total"), col("__n").as("n"),
        ((num * num).cast("double") / den.cast("double")).as("chi2_term"))
  }

  /** Rolling z-score anomaly signal over an ORDERED series: each row's
    * value against the mean/stddev of the `n` PRECEDING rows (current row
    * excluded — the anomaly must not contaminate its own baseline).
    *
    * Same exact-moment discipline as [[pearson]]: the windowed Σx and Σx²
    * accumulate as exact decimals (`valueCol` must be integral-valued —
    * scale money to cents first) and ONE fixed-order double formula reads
    * them out; sqrt/÷ are correctly-rounded IEEE ops, so any engine
    * mirroring the textual formula agrees bitwise. Rows with an incomplete
    * window or zero variance get a null z.
    *
    * The window is GLOBAL (no partition key) by design: the input is an
    * already-aggregated series (e.g. revenue per day), bounded by the
    * calendar, not by data volume — the same bounded-smallness argument as
    * the histogram sketch's cumulative pass. Never point this at raw rows;
    * aggregate to the series grain first.
    */
  def rollingZ(df: DataFrame, orderCol: Column, valueCol: Column,
               n: Int, zCol: String = "z"): DataFrame = {
    require(n >= 2, s"baseline window must have >= 2 rows, got $n")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(orderCol).rowsBetween(-n, -1)
    val x = valueCol.cast("decimal(18,0)")
    val s1 = sum(x).over(w)
    val s2 = sum(x * x).over(w)
    val cnt = count(x).over(w)
    val nD = cnt.cast("double")
    // textual formula mirrored by oracles: var = (s2 - s1*s1/n) / (n-1)
    val variance = (s2.cast("double") -
      s1.cast("double") * s1.cast("double") / nD) / (nD - lit(1.0))
    val z = (x.cast("double") - s1.cast("double") / nD) / sqrt(variance)
    df.withColumn(zCol, when(cnt === n && variance > 0, z))
  }
}
