package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** FX-rate dimension build + currency normalization (reference
  * transform_fx_rate.py:31 and dags/analytics_dag.py:113).
  */
object FxRates {

  val FallbackRate = 25400.0 // ref dags/analytics_dag.py:57

  /** Daily rate dim derived from an observations table: one deterministic
    * rate per day key (max, exact decimal), with the reference's
    * from/to/source metadata shape (transform_fx_rate.py FACT schema).
    * Tiny by construction → always broadcast into normalization joins.
    */
  def daily(observations: DataFrame, dayKey: org.apache.spark.sql.Column,
            rateCol: org.apache.spark.sql.Column): DataFrame =
    observations
      .groupBy(dayKey.as("fx_day"))
      .agg(max(rateCol.cast(DecimalType(18, 2))).as("rate"))
      .withColumn("from_currency", lit("USD"))
      .withColumn("to_currency", lit("VND"))
      .withColumn("source", lit("derived"))

  /** Validation from transform_fx_rate.py:121 — nulls or non-positive rates
    * are defects.
    */
  def validate(fx: DataFrame): DataFrame =
    QualityChecks.report(fx, Seq(
      QualityChecks.Check("null_rate", col("rate").isNull),
      QualityChecks.Check("nonpositive_rate", col("rate") <= 0)))
}
