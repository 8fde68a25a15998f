package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution has hot keys that AQE's
  * skew-join split cannot fix (e.g. a single key holding >1 executor-memory
  * of rows on the build side).
  *
  * Salted join: the skewed (large) side gets a random-but-deterministic
  * salt in [0, buckets); the small side is replicated `buckets` times; the
  * join key becomes (key, salt). Each hot key's rows then spread over
  * `buckets` reducers instead of one.
  */
object Skew {

  /** Deterministic per-row salt derived from stable columns (NOT rand() —
    * retries/speculative tasks must salt identically or rows duplicate).
    */
  def salt(buckets: Int, stableCols: Column*): Column =
    pmod(hash(stableCols: _*), lit(buckets))

  private val SupportedJoinTypes =
    Set("inner", "left", "leftouter", "left_outer", "leftsemi", "left_semi",
      "leftanti", "left_anti")

  /** Inner/left salted equi-join of `big` (skewed) with `small` on
    * `keyCol`. `saltSource` must be stable, high-cardinality columns of
    * `big` (e.g. the row's unique id).
    *
    * Right/full outer are rejected: an unmatched `small` row would surface
    * once per salt bucket (`buckets` duplicates), silently corrupting the
    * result.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
                 buckets: Int, saltSource: Seq[String],
                 joinType: String = "inner"): DataFrame = {
    require(SupportedJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left joins only, got '$joinType': " +
        "unmatched small-side rows would duplicate once per salt bucket")
    val salted = big.withColumn("__salt", salt(buckets, saltSource.map(col): _*))
    val replicated = small
      .withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(keyCol, "__salt"), joinType).drop("__salt")
  }
}
