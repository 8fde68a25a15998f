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

  /** Inner/left salted equi-join of `big` (skewed) with `small` on
    * `keyCol`. `saltSource` must be stable, high-cardinality columns of
    * `big` (e.g. the row's unique id).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
                 buckets: Int, saltSource: Seq[String],
                 joinType: String = "inner"): DataFrame = {
    val salted = big.withColumn("__salt", salt(buckets, saltSource.map(col): _*))
    val replicated = small
      .withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(keyCol, "__salt"), joinType).drop("__salt")
  }
}
