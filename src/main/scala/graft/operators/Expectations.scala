package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-table data-quality expectation suite — the dbt-test / Great-
  * Expectations surface over warehouse tables, generalizing the
  * single-table ASSERT gate ([[QualityChecks]], reference
  * analytics_dag.py:172-240) to the checks that need a SECOND table or a
  * grouping: referential integrity (orphan foreign keys), key uniqueness,
  * accepted values, range membership.
  *
  * Each expectation reduces to a VIOLATION-ROWS frame; [[report]] counts
  * each one and unions the single-row results. Every count is a bounded
  * aggregate job (anti-joins and group-counts shuffle on their keys like
  * any join/agg — no new shapes), and the report itself is |checks| rows.
  */
object Expectations {

  /** Rows of `child` whose FK tuple has no match in `parent` (null FKs
    * violate too — a null key cannot reference anything). The anti-join
    * broadcasts when the parent is dim-sized; at fact-scale it shuffles on
    * the key like the join it guards.
    */
  def orphans(child: DataFrame, childKeys: Seq[String],
              parent: DataFrame, parentKeys: Seq[String]): DataFrame = {
    require(childKeys.nonEmpty && childKeys.length == parentKeys.length,
      s"key arity mismatch: $childKeys vs $parentKeys")
    val p = parent.select(parentKeys.zip(childKeys).map { case (pk, ck) =>
      col(pk).as(ck) }: _*)
    val nullFk = childKeys.map(col(_).isNull).reduce(_ || _)
    child.filter(nullFk)
      .unionByName(child.filter(!nullFk).join(p, childKeys, "left_anti"))
  }

  /** Key groups appearing more than once (one row per duplicated key). */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Rows whose column is outside the accepted set (nulls violate). */
  def notAccepted(df: DataFrame, c: String, accepted: Seq[Any]): DataFrame =
    df.filter(!col(c).isin(accepted: _*) || col(c).isNull)

  /** Rows failing an arbitrary row predicate (`predicate` marks GOOD rows). */
  def violating(df: DataFrame, predicate: Column): DataFrame =
    df.filter(!coalesce(predicate, lit(false)))

  /** One row per expectation: (check_name, violations, passed). */
  def report(items: Seq[(String, DataFrame)]): DataFrame = {
    require(items.nonEmpty, "no expectations given")
    items.map { case (name, bad) =>
      bad.agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check_name"), col("violations"),
          (col("violations") === 0L).as("passed"))
    }.reduce(_ unionByName _)
  }
}
