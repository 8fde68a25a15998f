package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleave keys — the multi-dimensional DATA LAYOUT
  * primitive: sort/cluster a table by the interleaved bits of two columns
  * and every stored chunk covers a small rectangle of the (a, b) space, so
  * file/row-group min-max stats prune scans filtered on EITHER dimension —
  * the property a single-column sort gives only its leading column. This
  * is how 100 TB tables stay scannable for two access patterns at once.
  *
  * The key is a pure integer expression (shift/and/or folds — codegen'd,
  * engine-reproducible); [[layoutBy]] applies it as range partitioning +
  * in-partition sort, the write-side layout step.
  */
object ZOrder {
  /** Interleaved key of two non-negative integral columns: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Values ≥ 2^bits raise at
    * runtime — truncating high bits would silently break the locality
    * contract.
    */
  def key(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    val bound = 1L << bits
    // nulls raise too: they would otherwise null the whole key silently
    // and collapse into one unclustered nulls-first range partition
    def checked(c: Column) =
      when(c.isNull || c.cast("long") < 0 || c.cast("long") >= bound,
        raise_error(concat(lit(s"zorder input null or out of [0, $bound): "),
          coalesce(c.cast("string"), lit("null")))))
        .otherwise(c.cast("long"))
    val (ca, cb) = (checked(a), checked(b))
    (0 until bits).map { i =>
      shiftleft(shiftright(ca, i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(cb, i).bitwiseAND(1L), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Range-partition + sort by the z-key: each output partition covers a
    * compact rectangle of (a, b) — the layout to write parquet from so
    * min-max stats prune on both columns.
    */
  def layoutBy(df: DataFrame, a: Column, b: Column, bits: Int,
               partitions: Int): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1: $partitions")
    require(!df.columns.contains("__zkey"),
      "'__zkey' is reserved by layoutBy; rename the input column")
    val keyed = df.withColumn("__zkey", key(a, b, bits))
    keyed.repartitionByRange(partitions, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
  }
}
