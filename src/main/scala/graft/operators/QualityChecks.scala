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

  final case class Check(name: String, violation: Column)

  private val SafeName = "^[A-Za-z][A-Za-z0-9_]*$".r

  /** One row per check: (check_name, violations, passed). Single job.
    * Check names are interpolated into a stack() expression, so they are
    * restricted to identifier characters.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    checks.foreach(c => require(SafeName.matches(c.name) && c.name != "__total",
      s"check name must be a plain identifier, got: '${c.name}'"))
    val aggs = checks.map(c => sum(when(c.violation, 1L).otherwise(0L)).as(c.name)) :+
      count(lit(1)).as("__total")
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
}
