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

  /** USD price rounded to cents via EXACT integer half-up arithmetic.
    * ROUND(double_division, 2) is engine-divergent when the true quotient
    * lands exactly on a half-cent (it does, in real data): both this and
    * the DuckDB oracle compute floor((2·100·P_cents + R_cents) /
    * (2·R_cents)) in int64 instead — no float division at all.
    *
    * @param priceVnd 2-decimal money column (any numeric)
    * @param rate     nullable DECIMAL rate; falls back to [[FallbackRate]]
    */
  def usdPrice(df: DataFrame, priceVnd: org.apache.spark.sql.Column,
               rate: org.apache.spark.sql.Column, out: String): DataFrame =
    df.withColumn("__graft_pc", (priceVnd.cast(DecimalType(18, 2)) * 100).cast("long"))
      .withColumn("__graft_rc",
        // the one FallbackRate constant — an inlined 25400 here would
        // silently drift from the fx_rate column callers build with it
        (coalesce(rate, lit(FallbackRate).cast(DecimalType(18, 2))) * 100).cast("long"))
      .withColumn(out,
        // guard rate <= 0 explicitly: integer DIV by zero nulls silently in
        // non-ANSI Spark while other engines error — make "no valid rate →
        // null price" the defined cross-engine contract
        expr("CASE WHEN __graft_rc > 0 THEN " +
          "(2 * 100 * __graft_pc + __graft_rc) DIV (2 * __graft_rc) END") / 100.0d)
      .drop("__graft_pc", "__graft_rc")

  /** Carry the last observed rate forward across missing days — the
    * warehouse formulation of fx_rate_dag.py:74-129's "fall back to a
    * previous rate when today's fetch fails" (last_value-ignore-nulls over
    * the date ordering instead of a static constant).
    *
    * `calendar` holds one row per `dayCol` value to fill (e.g. the fact
    * table's distinct days); every (partitionCols) series is completed to
    * the full calendar and gap-filled independently. Adds `rate_filled`
    * (rateCol carried forward) and `rate_source` ('observed' | 'carried';
    * null when no prior observation exists).
    *
    * Scale: an FX dim is days × currency pairs — broadcast-tiny by
    * construction. The per-pair window sorts only that tiny dim; never
    * point this at a fact table.
    */
  /** carryForward is a DIM operator: the calendar×pairs expansion below is
    * only sane while the pair dim stays dim-sized. The bound covers every
    * real currency universe (230² ≈ 53k directed pairs) with headroom;
    * pointing the operator at a fact table fails loudly here instead of
    * going quadratic silently.
    */
  val DefaultMaxPairs = 100000L

  def carryForward(fx: DataFrame, calendar: DataFrame, dayCol: String,
                   rateCol: String = "rate",
                   partitionCols: Seq[String] = Nil,
                   maxPairs: Long = DefaultMaxPairs): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the window must see EVERY observation day, calendar member or not —
    // otherwise an fx fetch on a day absent from the calendar silently
    // vanishes and later days carry an older rate than the last observed
    val days = calendar.select(col(dayCol)).distinct()
      .unionByName(fx.select(col(dayCol)).distinct()).distinct()
    val series =
      if (partitionCols.isEmpty) days
      else {
        val pairs = fx.select(partitionCols.map(col): _*).distinct()
        // Enforce the dim contract LAZILY, inside the plan: a 1-row count
        // aggregate cross-joined in (BroadcastNestedLoopJoin with one row)
        // whose filter raise_errors when the series universe exceeds the
        // bound. Plan construction stays side-effect-free — callers that
        // never execute the result pay nothing — and the guard cannot be
        // pruned because it lives in a Filter condition.
        val guard = pairs.agg(count(lit(1)).as("__graft_n_pairs"))
        days.join(pairs, lit(true))
          .join(guard, lit(true))
          .filter(
            when(col("__graft_n_pairs") <= maxPairs, lit(true))
              .otherwise(raise_error(concat(
                lit("carryForward saw "), col("__graft_n_pairs").cast("string"),
                lit(s" distinct ${partitionCols.mkString("(", ",", ")")} series " +
                  s"(max $maxPairs): this is a dim-only operator — a series universe " +
                  "this large means a fact table was passed as fx; pre-aggregate it " +
                  "to a rate dim first")))))
          .drop("__graft_n_pairs")
      }
    val joined = series.join(fx, Seq(dayCol) ++ partitionCols, "left")
    // Pin the partition columns: currency pairs are routinely built with
    // lit(...) upstream, and Catalyst folds provably-constant partition
    // expressions OUT of the window spec — WindowExec then warns "No
    // Partition Defined". The non-foldable identity keeps the DECLARED keys
    // in the plan (graft.plans.Pin), so multi-pair callers hash-partition
    // correctly; a dim that truly holds one pair is still physically one
    // partition (tiny here by contract — see the Scale note above).
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val pinned = partitionCols.map(c =>
      ColumnBridge.column(graft.plans.Pin(ColumnBridge.expression(col(c)))))
    val w = Window.partitionBy(pinned: _*).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("rate_filled", last(col(rateCol), ignoreNulls = true).over(w))
      .withColumn("rate_source",
        when(col(rateCol).isNotNull, "observed")
          .when(col("rate_filled").isNotNull, "carried"))
      // output stays calendar-shaped; observation-only days fed the window
      .join(calendar.select(col(dayCol)).distinct(), Seq(dayCol), "left_semi")
  }

  /** Validation from transform_fx_rate.py:121 — nulls or non-positive rates
    * are defects.
    */
  def validate(fx: DataFrame): DataFrame =
    QualityChecks.report(fx, Seq(
      QualityChecks.Check("null_rate", col("rate").isNull),
      QualityChecks.Check("nonpositive_rate", col("rate") <= 0)))
}
