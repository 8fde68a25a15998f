package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Star-schema enrichment join ("Golden Join" in the reference:
  * dags/analytics_dag.py:97-160 — fact LEFT JOIN product/category/keyword/
  * trends/fx dims).
  *
  * Spark-first design: each dimension is LEFT-joined onto the fact in
  * sequence; dimensions small enough to replicate are broadcast so the fact
  * side never shuffles for them. At 100 TB the fact only shuffles for
  * fact-to-fact joins (handled by AQE sort-merge with skew mitigation);
  * dim lookups stay map-side.
  */
object GoldenJoin {

  /** One dimension to enrich with.
    * @param cond  join condition built from (factSoFar, dim)
    * @param hint  "broadcast" to replicate the dim (default), "shuffle" for
    *              large dims that must co-partition with the fact.
    */
  final case class Dim(df: DataFrame, cond: (DataFrame, DataFrame) => Column,
                       hint: String = "broadcast")

  def leftEnrich(fact: DataFrame, dims: Seq[Dim]): DataFrame =
    dims.foldLeft(fact) { (acc, d) =>
      // a typo'd hint must not silently take the shuffle path: at scale an
      // un-broadcast dim lookup shuffles the whole fact with no error
      require(d.hint == "broadcast" || d.hint == "shuffle",
        s"unknown join hint '${d.hint}' (use \"broadcast\" or \"shuffle\")")
      // column names must stay unique across the accumulated fact and each
      // dim: cond's acc("c") would otherwise throw AMBIGUOUS_REFERENCE (or
      // worse, later select the wrong side). Fail with the offenders named.
      val dup = acc.columns.toSet.intersect(d.df.columns.toSet)
      require(dup.isEmpty,
        s"dim columns collide with the enriched fact: ${dup.mkString(", ")} — rename them before joining")
      val dim = if (d.hint == "broadcast") broadcast(d.df) else d.df
      acc.join(dim, d.cond(acc, dim), "left")
    }
}
