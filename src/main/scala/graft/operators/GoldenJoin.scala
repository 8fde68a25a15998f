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
    * @param alias prefix for auto-renamed colliding columns; defaults to
    *              `dim<position>` (1-based position in the dims list).
    */
  final case class Dim(df: DataFrame, cond: (DataFrame, DataFrame) => Column,
                       hint: String = "broadcast", alias: Option[String] = None)

  /** Column names must stay unique across the accumulated fact and each
    * dim — cond's acc("c") would otherwise throw AMBIGUOUS_REFERENCE (or
    * worse, later select the wrong side). A dim column whose name already
    * exists on the enriched fact is auto-renamed to `<alias>_<name>`
    * BEFORE the condition is built, so `cond` receives the renamed frame
    * (reference colliding columns through their prefixed name). The rename
    * is per-column and deterministic; a prefixed name that itself collides
    * fails loudly rather than cascading.
    */
  def leftEnrich(fact: DataFrame, dims: Seq[Dim]): DataFrame =
    dims.zipWithIndex.foldLeft(fact) { case (acc, (d, i)) =>
      // a typo'd hint must not silently take the shuffle path: at scale an
      // un-broadcast dim lookup shuffles the whole fact with no error
      require(d.hint == "broadcast" || d.hint == "shuffle",
        s"unknown join hint '${d.hint}' (use \"broadcast\" or \"shuffle\")")
      val accCols = acc.columns.toSet
      val prefix = d.alias.getOrElse(s"dim${i + 1}")
      val renamed = d.df.columns.foldLeft(d.df) { (df2, c) =>
        if (!accCols(c)) df2
        else {
          val nc = s"${prefix}_$c"
          require(!accCols(nc) && !d.df.columns.contains(nc),
            s"auto-alias $nc for colliding dim column '$c' still collides — rename explicitly")
          df2.withColumnRenamed(c, nc)
        }
      }
      val dim = if (d.hint == "broadcast") broadcast(renamed) else renamed
      acc.join(dim, d.cond(acc, dim), "left")
    }
}
