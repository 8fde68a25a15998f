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
}
