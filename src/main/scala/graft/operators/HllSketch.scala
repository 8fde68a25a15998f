package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog distinct-count sketch (Flajolet et al. 2007),
  * built so ANY engine reproduces it bit-for-bit — unlike
  * `approx_count_distinct`, whose xxHash64 registers are Spark-private.
  *
  * Determinism choices:
  *   - hash = md5 of the value's string form: 8 bucket bits (2 hex chars) +
  *     56 value bits (14 hex chars), both via string/integer ops only
  *   - rho (leftmost-1 position) from integer bit-length (`bin` string
  *     length) — no floating point, no engine-private hash
  *   - the register sum Σ2^(-r) is EXACT integer arithmetic: each term is
  *     2^(MaxRho - r) (a long), summed as DECIMAL(38,0); the estimate does
  *     ONE double division at the end. No float accumulation order to
  *     disagree on.
  *
  * Scale shape: registers are one partial-agg groupBy over [[M]]=256 keys —
  * the map side collapses every partition to ≤256 rows, the shuffle carries
  * nothing, and sketches MERGE by register-wise max ([[merge]]), which is
  * what makes HLL the 100 TB distinct-count: per-partition/per-day sketches
  * combine without re-reading data.
  *
  * The raw estimate carries HLL's documented small-range bias (no linear-
  * counting correction: that branch needs ln(), which is libm-dependent and
  * would break cross-engine agreement — and the REGISTERS are the
  * operator's real contract; corrections are presentation).
  */
object HllSketch {
  val Precision = 8
  val M: Int = 1 << Precision // 256 registers
  val HashBits = 56
  val MaxRho: Int = HashBits + 1 // 57 = all value bits zero
  /** 2^MaxRho — the exact-integer scale of the register sum. */
  val Pow2Scale: Long = 1L << MaxRho

  /** Per-row (bucket, rho) projection — the shared front half of the batch
    * sketch and the streaming maintenance path
    * ([[graft.streaming.StreamOps.streamingHllRegisters]]). Null values
    * are dropped (nothing to count).
    */
  def bucketRho(df: DataFrame, valueCol: Column): DataFrame = {
    val h = md5(valueCol.cast("string").cast("binary"))
    val bucket = conv(substring(h, 1, 2), 16, 10).cast("int")
    val v = conv(substring(h, 3, HashBits / 4), 16, 10).cast("long")
    // bin() renders without leading zeros, so its length IS the bit length
    val rho = when(v === 0L, lit(MaxRho)).otherwise(lit(MaxRho) - length(bin(v)))
    df.filter(valueCol.isNotNull)
      .select(bucket.as("bucket"), rho.as("rho"))
  }

  /** All M (bucket, register) rows; buckets no value hashed into hold 0. */
  def registers(df: DataFrame, valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    val present = bucketRho(df, valueCol)
      .groupBy(col("bucket")).agg(max(col("rho")).as("register"))
    spark.range(0, M).select(col("id").cast("int").as("bucket"))
      .join(present, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("register"), lit(0)).cast("int").as("register"))
  }

  /** Sketch union: register-wise max. `registers(a ∪ b) == merge` exactly. */
  def merge(regsA: DataFrame, regsB: DataFrame): DataFrame =
    regsA.unionByName(regsB)
      .groupBy(col("bucket")).agg(max(col("register")).as("register"))

  /** One row: the raw HLL estimate from a register frame. The whole
    * alpha·m²·2^MaxRho numerator is written as explicit double ops (mirrored
    * textually in the oracle SQL) so both engines round identically.
    */
  def estimate(regs: DataFrame): DataFrame = {
    // alpha_m · m² · 2^MaxRho, every factor derived from M so a Precision
    // change cannot leave the readout on stale constants (the oracle SQL
    // interpolates the same values)
    val numerator = (lit(0.7213d) / (lit(1.0d) + lit(1.079d) / lit(M.toDouble))) *
      lit(M.toDouble * M.toDouble) * lit(Pow2Scale.toDouble)
    regs.agg(
        sum(expr(s"shiftleft(1L, $MaxRho - register)")
          .cast("decimal(38,0)")).as("s"),
        count(when(col("register") === 0, 1)).as("n_zero_registers"))
      .select((numerator / col("s").cast("double")).as("hll_estimate"),
        col("n_zero_registers"))
  }
}
