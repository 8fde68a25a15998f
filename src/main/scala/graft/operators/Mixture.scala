package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Mixture materialization: EXECUTE the per-source token budget a mixture
  * recipe prescribes (the step after [[graft.operators.BpeTrain
  * .docTokenCounts]] measures and q141's accounting table reports): each
  * source contributes documents, in deterministic `idCol` order, until its
  * token quota is exhausted — the token-grain sibling of
  * [[Sampling.capPerSource]]'s doc-grain cap, with [[Packing]]'s
  * start-offset convention (a document whose FIRST token falls inside the
  * quota is kept whole, so a source may overshoot by at most one
  * document; exact-to-the-token truncation would split documents).
  *
  * The cut needs each document's cumulative token offset WITHIN its
  * source. A per-source window sort over the DATA is the natural Spark
  * expression but serializes every source into one partition — a
  * corpus-scale sort per source at 100 TB. This is instead the GROUPED
  * two-phase exact prefix sum ([[Quantiles]]' core, keyed): range-
  * partition by (source, id), one sorted local-cumsum pass per partition
  * (sums reset on source change), then per-(partition, source) TOTALS —
  * at most P rows per source — get their prefix offsets from a window
  * `partitionBy(src).orderBy(pid)` over the totals FRAME (each window
  * group is ≤ P rows — bounded per group, the case where a window IS the
  * right tool, per [[Quantiles]]' own doc) and join back on (pid, src).
  * Nothing touches the driver: the source domain may be open and
  * web-scale (millions of values — exactly why [[Sampling.capPerSource]]
  * exists), and the totals frame scales as a SHUFFLE, not driver memory.
  * All-integer arithmetic: the offsets and cumsums are BIGINT sums in a
  * pinned order, bit-replayable by any engine's per-source ordered
  * window.
  *
  * Rows with a NULL source are EXCLUDED (a document with no source can
  * draw no source's budget — [[Sampling.deterministicSplit]]'s
  * unattributable-row convention); null token counts draw 0. `idCol`
  * must be unique, non-null and long-castable — a value the cast nulls
  * (non-numeric string, overflow) fails LOUDLY at runtime via a
  * codegen'd raise_error rather than silently breaking the
  * deterministic-order contract.
  */
object Mixture {

  /** Per-source running token offsets: (idCol, srcCol, tokenCol order
    * pinned) → one row per non-null-source input row with `src_cum` =
    * the inclusive per-source cumulative token sum in `idCol` order.
    */
  def groupedPrefixSum(df: DataFrame, idCol: String, srcCol: String,
                       tokenCol: String, partitions: Int = 64): DataFrame = {
    val idL = col(idCol).cast("long")
    // a null cast (non-numeric id) would both NPE opaquely downstream and
    // silently break the deterministic-order contract — fail loudly with
    // the offending value instead (the KMeansExact/RangeJoin guard shape)
    val idGuarded = when(idL.isNull, raise_error(concat(
      lit(s"Mixture: idCol '$idCol' must be non-null and long-castable, got: "),
      coalesce(col(idCol).cast("string"), lit("NULL"))))).otherwise(idL)
    val base = df
      .filter(col(srcCol).isNotNull)
      .select(idGuarded.as("id"),
        col(srcCol).cast("string").as("src"),
        coalesce(col(tokenCol).cast("long"), lit(0L)).as("tok"))
    val ranged = base.repartitionByRange(partitions, col("src"), col("id"))
      .sortWithinPartitions(col("src"), col("id"))

    val cumSchema = StructType(Seq(
      StructField("pid", LongType, nullable = false),
      StructField("id", LongType),
      StructField("src", StringType),
      StructField("tok", LongType, nullable = false),
      StructField("local_cum", LongType, nullable = false)))
    val localCum = ranged.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      var curSrc: String = null
      var started = false
      var cum = 0L
      rows.map { r =>
        val src = r.getString(1)
        if (!started || src != curSrc) { cum = 0L; curSrc = src; started = true }
        cum += r.getLong(2)
        Row(pid, r.getLong(0), src, r.getLong(2), cum)
      }
    }(org.apache.spark.sql.Encoders.row(cumSchema))
    val cached = OpCache.cache(localCum)

    // per-(partition, source) totals stay DISTRIBUTED: the window group
    // is keyed by src and holds at most P rows, so the exclusive prefix
    // sum is a bounded per-group window, never a driver materialization —
    // the source domain may be open (millions of values at 100 TB)
    val totals = cached.groupBy(col("pid"), col("src"))
      .agg(max(col("local_cum")).as("t"))
    val offWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offDf = totals.select(col("pid"), col("src"),
      coalesce(sum(col("t")).over(offWin), lit(0L)).as("off"))

    cached.join(offDf, Seq("pid", "src"))
      .select(col("id").as(idCol), col("src").as(srcCol),
        col("tok").as(tokenCol),
        (col("local_cum") + col("off")).as("src_cum"))
  }

  /** The quota cut: keep each source's documents, in `idCol` order, while
    * the document's START offset (src_cum − tokens) is inside
    * `tokenQuotaPerSource`. Open source set — no per-source
    * configuration, exactly [[Sampling.capPerSource]]'s contract at token
    * grain. Output: (idCol, srcCol, tokenCol, src_cum) for the kept rows.
    */
  def materializeByQuota(df: DataFrame, idCol: String, srcCol: String,
                         tokenCol: String, tokenQuotaPerSource: Long,
                         partitions: Int = 64): DataFrame = {
    require(tokenQuotaPerSource > 0,
      s"quota must be positive: $tokenQuotaPerSource")
    groupedPrefixSum(df, idCol, srcCol, tokenCol, partitions)
      .filter(col("src_cum") - col(tokenCol) < tokenQuotaPerSource)
  }

  /** WEIGHTED quota cut — the non-uniform recipe (a DoReMi/Llama-style
    * mixture executes per-source weights, not a flat cap): source s gets
    * quota = budget·wₛ DIV Σw (exact integer division — no float share
    * enters the cut), then the same start-offset kept-whole rule as
    * [[materializeByQuota]]. Sources ABSENT from the weight map
    * contribute nothing (weight 0 ≡ unlisted — the closed-recipe
    * convention; use [[materializeByQuota]] for open-set balancing). The
    * weight table is recipe-sized and broadcasts.
    */
  def materializeByWeights(df: DataFrame, idCol: String, srcCol: String,
                           tokenCol: String, budget: Long,
                           weights: Map[String, Long],
                           partitions: Int = 64): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(weights.nonEmpty, "need at least one weighted source")
    require(weights.values.forall(_ >= 0), s"negative weight in $weights")
    val sumW = weights.values.sum
    require(sumW > 0, "weights sum to zero")
    require(weights.values.max <= Long.MaxValue / budget,
      s"budget x max weight overflows: $budget x ${weights.values.max}")
    val spark = df.sparkSession
    val qRows = weights.toSeq.sortBy(_._1).map { case (s, w) =>
      Row(s, budget * w / sumW)
    }
    val quotaDf = spark.createDataFrame(
      spark.sparkContext.parallelize(qRows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("src",
          StringType, nullable = false),
        org.apache.spark.sql.types.StructField("__quota",
          LongType, nullable = false))))
      .withColumnRenamed("src", srcCol)
    groupedPrefixSum(df, idCol, srcCol, tokenCol, partitions)
      .join(broadcast(quotaDf), Seq(srcCol))
      .filter(col("src_cum") - col(tokenCol) < col("__quota"))
      .drop("__quota")
  }
}
