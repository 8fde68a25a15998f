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

  /** Exactly `kBySource(s)` rows per source, chosen by ascending salted
    * md5 rank (id tiebreak) — the per-stratum EXACT-COUNT twin of
    * [[stratifiedSample]]'s percentages, and the mechanism under the
    * source-mixing samplers below. Sources absent from the map contribute
    * nothing. Same reproducibility story as [[deterministicExactK]]: the
    * kept set is unique, engine-independent, and grows monotonically in k.
    *
    * Scale shape: per-group rank rides [[TopK.perGroup]]'s partial
    * aggregator (map-side k-row buffers, k rows per group per mapper in
    * the shuffle), NOT a row_number window — a window would sort every
    * row of the hottest source through one reducer. The hash keeps 13 hex
    * digits (52 bits) so it is EXACT in the double the aggregator sorts
    * by; 15+ digits would overflow the 2^53 mantissa and break ties
    * nondeterministically.
    */
  def mixExactPerSource(df: DataFrame, idCol: String, sourceCol: String,
                        kBySource: Map[String, Long],
                        salt: String = ":mix"): DataFrame = {
    require(kBySource.nonEmpty, "need at least one source count")
    kBySource.values.foreach(k =>
      require(k >= 0 && k <= Int.MaxValue, s"per-source k out of range: $k"))
    // same loudness convention as Dedup/Upsert: helper columns must not
    // silently clobber (or ambiguously duplicate) caller columns
    Seq("__mixh", "rank").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column; rename it — mixExactPerSource would clobber it"))
    val quotas = kBySource.filter(_._2 > 0L)
    if (quotas.isEmpty) return df.filter(lit(false))
    val maxK = quotas.values.max
    val hash = conv(substring(
        md5(concat(col(idCol).cast("string"), lit(salt)).cast("binary")), 1, 13),
      16, 10).cast("long")
    val kExpr = quotas.foldLeft(lit(0L)) { case (acc, (s, k)) =>
      when(col(sourceCol) === s, lit(k)).otherwise(acc)
    }
    // zero-quota sources are dropped BEFORE the rank: they would otherwise
    // pay map-side top-maxK buffering and shuffle only to be filtered out
    val kept = df.filter(col(idCol).isNotNull &&
      col(sourceCol).isin(quotas.keys.toSeq: _*))
    TopK.perGroup(kept.withColumn("__mixh", -hash),
        Seq(sourceCol), "__mixh", idCol, maxK.toInt)
      .filter(col("rank") <= kExpr)
      .drop("__mixh", "rank")
  }

  /** UNIFORM per-source document CAP over an OPEN source set — the
    * domain-balancing discipline web-corpus builds apply ("at most N
    * pages per domain"): unlike [[mixExactPerSource]]/[[weightedMix]],
    * which take an explicit source→quota map and therefore require the
    * source taxonomy up front, the cap applies to EVERY source the data
    * contains — at 100 TB the domain column has millions of values nobody
    * can enumerate, and the hot-domain tail is exactly what the cap
    * exists to cut. Keeps the `cap` rows with the smallest salted md5
    * rank (id tiebreak) per source; null sources form their own capped
    * group (the [[stratifiedSample]] `<null>` convention — dropping them
    * silently would exempt unattributed documents from balancing).
    *
    * Output = surviving rows plus `cap_rank` (1-based hash rank within
    * the source), so downstream can tighten the cap by filtering without
    * recomputation. Same scale shape as [[mixExactPerSource]]:
    * [[TopK.perGroup]]'s map-side k-row buffers — the hottest domain
    * ships k rows per mapper, never its full row set through one reducer.
    */
  def capPerSource(df: DataFrame, idCol: String, sourceCol: String,
                   cap: Int, salt: String = ":cap"): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    Seq("__mixh", "__src", "rank", "cap_rank").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column; rename it — capPerSource would clobber it"))
    val hash = conv(substring(
        md5(concat(col(idCol).cast("string"), lit(salt)).cast("binary")), 1, 13),
      16, 10).cast("long")
    TopK.perGroup(
        df.filter(col(idCol).isNotNull)
          .withColumn("__src", coalesce(col(sourceCol), lit("<null>")))
          .withColumn("__mixh", -hash),
        Seq("__src"), "__mixh", idCol, cap)
      .withColumnRenamed("rank", "cap_rank")
      .drop("__mixh", "__src")
  }

  /** WEIGHTED source mixing: a `totalK`-row budget split across sources
    * proportionally to explicit integer weights — "3 parts web to 1 part
    * code" — with floor division (the delivered total may undershoot
    * `totalK` by < #sources; exact integer arithmetic is what keeps the
    * allocation replayable in any engine). Each source's quota then fills
    * by deterministic hash rank via [[mixExactPerSource]].
    */
  def weightedMix(df: DataFrame, idCol: String, sourceCol: String,
                  weights: Map[String, Long], totalK: Long,
                  salt: String = ":mix"): DataFrame = {
    require(totalK > 0, s"budget must be positive: $totalK")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"weights must be positive: $weights")
    // BigInt quota arithmetic: totalK * w in Long can silently wrap for
    // large caller weights, and a double wrap can land back in a plausible
    // range — exact integers keep the allocation loud and replayable
    val sw = weights.values.map(BigInt(_)).sum
    mixExactPerSource(df, idCol, sourceCol,
      weights.map { case (s, w) =>
        s -> (BigInt(totalK) * w / sw).toLong
      }, salt)
  }

  /** TEMPERATURE source mixing (the multilingual-LM sampling exponent):
    * per-source quotas ∝ n_s^alpha, so alpha = 1 reproduces the natural
    * distribution and alpha → 0 flattens toward uniform — the knob that
    * keeps a 100:1 web/code corpus from drowning the minority source in
    * training. Quotas derive from exact per-source counts (one k-row
    * aggregate collect — sources are an operational taxonomy, never
    * data-sized) through integer weights `max(floor(n^alpha · 1024), 1)`.
    *
    * alpha = 0.5 (the default) computes n^alpha via `sqrt`, which IEEE
    * requires correctly rounded — the weight is bit-replayable in any
    * engine, which is what lets q107's DuckDB oracle recompute the whole
    * allocation. Other alphas go through `pow` (1-ulp, engine-dependent
    * at the floor boundary) — fine operationally, not oracle-exact.
    */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
                     totalK: Long, alpha: Double = 0.5,
                     salt: String = ":mix"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha out of (0,1]: $alpha")
    val counts = df
      .filter(col(idCol).isNotNull && col(sourceCol).isNotNull)
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect() // bounded: one row per source
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "no non-null sources to mix")
    val weights = counts.map { case (s, n) =>
      val raw =
        if (alpha == 0.5) math.sqrt(n.toDouble)
        else if (alpha == 1.0) n.toDouble
        else math.pow(n.toDouble, alpha)
      s -> math.max(math.floor(raw * 1024.0).toLong, 1L)
    }
    weightedMix(df, idCol, sourceCol, weights, totalK, salt)
  }
}
