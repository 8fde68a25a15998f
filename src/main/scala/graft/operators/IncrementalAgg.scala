package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of additive aggregates — the reason a 100 TB
  * warehouse never re-scans history: yesterday's agg STATE plus today's
  * partition's agg DELTA merge by addition into today's state, in a job
  * whose cost is proportional to |state| + |delta|, not to the history.
  *
  * This is the mergeable-aggregate contract ([[HllSketch]]/
  * [[CountMinSketch]]'s `merge`) applied to plain sums and counts: any
  * aggregate expressible as a commutative monoid (sum, count, min, max —
  * and avg as sum+count) maintains this way. The reference's daily
  * partition-append loads (load_to_bq.py:143) set up exactly this shape;
  * the operator closes the loop by folding each day into the running mart
  * without the full-table GROUP BY.
  *
  * One keyed full-outer join (state ⋈ delta — the delta side is one
  * partition's agg, broadcast-able); absent keys on either side contribute
  * identity (0 for sums/counts), so `merge(agg(D1), agg(D2)) ==
  * agg(D1 ∪ D2)` exactly — decimal/long addition is associative, the same
  * reason the aggregate was partial-agg friendly in the first place.
  */
object IncrementalAgg {

  /** Merge two agg frames of identical schema on `keys`; every non-key
    * column must be additive (sum/count). Missing keys take the other
    * side's values.
    *
    * Keys join NULL-SAFELY (`<=>`): a GROUP BY emits one row for the null
    * key group, so state and delta can both legitimately carry it — a
    * plain equi-join (USING) would never match those rows and the null
    * group would accumulate one extra row per merge instead of summing,
    * breaking the monoid contract.
    */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    require(state.columns.sameElements(delta.columns),
      s"agg schemas must match: ${state.columns.mkString(",")} vs ${delta.columns.mkString(",")}")
    val valueCols = state.columns.filterNot(keys.contains).toSeq
    val s = state.select(keys.map(k => col(k).as(s"__sk_$k")) ++
      valueCols.map(c => col(c).as(s"__s_$c")): _*)
    val d = delta.select(keys.map(k => col(k).as(s"__dk_$k")) ++
      valueCols.map(c => col(c).as(s"__d_$c")): _*)
    val cond = keys.map(k => col(s"__sk_$k") <=> col(s"__dk_$k")).reduce(_ && _)
    s.join(d, cond, "full_outer")
      .select(keys.map(k =>
        coalesce(col(s"__sk_$k"), col(s"__dk_$k")).as(k)) ++ valueCols.map { c =>
        // identity-coalesced addition: a key absent from one side keeps
        // the other side's value unchanged. The final cast pins the
        // output to the STATE's column type (decimal addition re-derives
        // precision/scale, which would otherwise drift every merge);
        // merged totals must fit that type — the same sizing obligation
        // the original aggregate already carried.
        when(col(s"__s_$c").isNull, col(s"__d_$c"))
          .when(col(s"__d_$c").isNull, col(s"__s_$c"))
          .otherwise(col(s"__s_$c") + col(s"__d_$c"))
          .cast(state.schema(c).dataType).as(c)
      }: _*)
  }
}
