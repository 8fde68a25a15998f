package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gate (reference dags/analytics_dag.py:172-240 ASSERT block
  * and transform_tiki.py:595 null validation).
  *
  * Spark-first: all checks collapse into ONE aggregation pass over the data
  * (a single partial-agg job), instead of one scan per ASSERT like the
  * reference runs. `report` returns one row per check so callers can fail a
  * pipeline on `violations > 0` rows.
  */
object QualityChecks {

  /** Two polarities, matching the reference's ASSERT block:
    *   - zero-violations (`minCount` empty): `predicate` marks a BAD row;
    *     the check passes when no row matches (e.g. "no negative prices").
    *   - min-count (`minCount = Some(m)`): `predicate` marks a GOOD row;
    *     the check passes when at least `m` rows match (the reference's
    *     "at least some data was inserted" / "some products have trend
    *     data" checks, analytics_dag.py:204,222). Reported `violations` is
    *     the shortfall max(0, m - matches), so `passed = violations == 0`
    *     holds uniformly for both polarities.
    */
  final case class Check(name: String, predicate: Column,
                         minCount: Option[Long] = None)

  object Check {
    /** Min-count polarity: pass iff ≥ `min` rows match `evidence`. */
    def atLeast(name: String, evidence: Column, min: Long = 1L): Check =
      Check(name, evidence, Some(min))
  }

  private val SafeName = "^[A-Za-z][A-Za-z0-9_]*$".r

  /** One row per check: (check_name, violations, passed). Single job.
    * Check names are interpolated into a stack() expression, so they are
    * restricted to identifier characters.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    checks.foreach(c => require(SafeName.matches(c.name) && c.name != "__total",
      s"check name must be a plain identifier, got: '${c.name}'"))
    val aggs = checks.map { c =>
      // coalesce: sum over an empty frame is null, which must read as
      // "0 matches" (fails a min-count check rather than silently passing)
      val matches = coalesce(sum(when(c.predicate, 1L).otherwise(0L)), lit(0L))
      c.minCount match {
        case None      => matches.as(c.name)
        case Some(min) => greatest(lit(0L), lit(min) - matches).as(c.name)
      }
    } :+ count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val longRows = checks
      .map { c => s"'${c.name}', CAST(`${c.name}` AS BIGINT)" }
      .mkString(", ")
    wide.selectExpr(s"stack(${checks.size}, $longRows) AS (check_name, violations)",
        "__total AS total_rows")
      .withColumn("passed", col("violations") === 0L)
  }

  /** Drop rows with null critical fields (ref transform_tiki.py:595). */
  def dropNullKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.na.drop("any", keys)

  /** Join-cardinality guard: returns `df` unchanged but FAILS THE JOB the
    * moment any key tuple occurs more than once — wrap a dim before an
    * enrichment join and a fan-out bug (the classic silent row-multiplier:
    * a "1:N" join that was supposed to be N:1) dies loudly at the first
    * duplicate instead of shipping doubled metrics downstream.
    *
    * Cost: one partial-agg count on the keys plus a join back — dim-sized,
    * the same price as the upsert that usually precedes it. The error
    * carries the offending key via a codegen'd raise_error, so the guard
    * stays distributed (no driver-side validation scan).
    */
  def requireUniqueKeys(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "requireUniqueKeys needs at least one key column")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
    // the raise_error rides in a FILTER predicate: a projected-then-dropped
    // column would be pruned by Catalyst without ever evaluating the check
    val checked = counts.filter(
      when(col("__n") > 1, raise_error(concat(
          lit(s"duplicate key in supposedly-unique dim (${keys.mkString(",")}): "),
          concat_ws(",", keys.map(k => col(k).cast("string")): _*))))
        .otherwise(lit(true)))
      .select(keys.map(k => col(k).as(s"__k_$k")): _*)
    // null-SAFE semi-join: the plain `keys` join would silently drop a
    // null-keyed row (e.g. an "unknown member" dim row) — the guard must
    // return df unchanged, and null-keyed duplicates must still trip it
    val cond = keys.map(k => df(k) <=> checked(s"__k_$k")).reduce(_ && _)
    df.join(checked, cond, "left_semi")
  }
}
