package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting/sampling for training-data pipelines.
  *
  * The bucket is derived from md5 of the row's id — NOT from rand() or an
  * engine-private hash — so the assignment is reproducible across runs,
  * engines (the DuckDB oracle recomputes it), cluster layouts, and
  * re-shuffles: a document keeps its split forever, which is what makes
  * train/eval contamination auditable. Pure per-row projection — no
  * shuffle at any scale.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from md5 of the id plus a per-purpose
    * salt (first 8 hex digits — same engine-reproducible trick as the
    * shingle hashes). The salt matters: if sampling and splitting shared
    * one unsalted hash, a 1/50 sample would keep only buckets {0,50} of
    * the split's 100 — and the eval split of the sampled corpus would be
    * EMPTY. Distinct salts make the two assignments independent.
    */
  def hashBucket(id: Column, buckets: Int, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt)).cast("binary")), 1, 8),
      16, 10).cast("long") % buckets

  /** Adds `split_name`: 'train' for trainPct% of rows, else 'eval'.
    * A null id has a null bucket, so the `when` falls through and every
    * null-id row lands in 'eval' — deterministic and contamination-safe
    * (a row with no identity can never be proven absent from train, so it
    * must not be there). Same convention in the q47 oracle.
    */
  def deterministicSplit(df: DataFrame, idCol: String, trainPct: Int,
                         splitCol: String = "split_name"): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100, s"trainPct out of range: $trainPct")
    df.withColumn(splitCol,
      when(hashBucket(col(idCol), 100, ":split") < trainPct, "train")
        .otherwise("eval"))
  }

  /** Deterministic ~1/`rate` sample: rows whose id-bucket is 0. */
  def deterministicSample(df: DataFrame, idCol: String, rate: Int): DataFrame = {
    require(rate >= 1, s"rate must be >= 1: $rate")
    df.filter(hashBucket(col(idCol), rate, ":sample") === 0)
  }

  /** STRATIFIED deterministic sample: a per-stratum keep-percentage (the
    * data-mixing primitive — "keep 100% of lang=de, 10% of lang=en").
    * Strata absent from `pctByStratum` fall back to `defaultPct`. The
    * bucket hash salts in the stratum, so the same id is kept or dropped
    * INDEPENDENTLY per stratum rather than whole ids vanishing from every
    * stratum at once. Still a pure per-row projection — no shuffle; the
    * pct map rides into the plan as a literal map lookup, no join.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       pctByStratum: Map[String, Int],
                       defaultPct: Int = 100): DataFrame = {
    (pctByStratum.values.toSeq :+ defaultPct).foreach(p =>
      require(p >= 0 && p <= 100, s"percentage out of range: $p"))
    val pct = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(stratumCol) === s, p).otherwise(acc)
    }
    // null strata form their own defaultPct segment: an un-coalesced null
    // stratum would null the hash concat and the null comparison would
    // silently sample those rows at 0% regardless of defaultPct
    df.filter(
      hashBucket(concat(col(idCol).cast("string"), lit(":"),
          coalesce(col(stratumCol), lit("<null>"))),
        100, ":stratum") < pct)
  }

  /** EXACTLY-k deterministic uniform sample: the k rows with the smallest
    * md5(id + salt) (id as tiebreak — total order, so the kept set is
    * unique). Rate-based sampling ([[deterministicSample]]) can't hit an
    * exact count ("budget is 10k eval documents"); hash-ranking can, stays
    * reproducible across engines/runs/layouts, and — because the hash
    * order is fixed — growing k only ever ADDS rows to the sample.
    *
    * Scale shape: orderBy+limit plans as TakeOrderedAndProject — each
    * partition keeps its local top-k and the driver merges P·k bounded
    * rows; no global sort of the data ever happens.
    */
  def deterministicExactK(df: DataFrame, idCol: String, k: Int,
                          salt: String): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    // null ids are excluded up front: a null id hashes to a null __h, and
    // ascending NULLS FIRST ordering would let null-id rows preferentially
    // fill the sample — with no id to tiebreak on, the "kept set is
    // unique" contract would be void for exactly those rows
    df.filter(col(idCol).isNotNull)
      .withColumn("__h",
        md5(concat(col(idCol).cast("string"), lit(salt)).cast("binary")))
      .orderBy(col("__h"), col(idCol))
      .limit(k)
      .drop("__h")
  }
}
