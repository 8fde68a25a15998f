package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark n-gram DECONTAMINATION (the Brown et al. 2020 appendix-C /
  * The Pile / Llama training-set discipline, and the n-gram-grain
  * complement of the whole-document fingerprint audit #61): flag every
  * TRAINING document that shares any hashed shingle with a
  * BENCHMARK/eval set, so leaked evaluation examples can be excluded (or
  * the benchmark score caveated) BEFORE training. Distinct from #61's
  * contamination audit: that catches whole-document leaks across the
  * train/eval split, this catches partial/quoted overlap against an
  * EXTERNAL benchmark at n-gram grain — a benchmark answer pasted inside
  * a larger page still trips it.
  *
  * Shingles ride the native [[graft.plans.ShingleHash]] expression
  * (normalized word n-grams → 8-byte hashes). The width is a knob:
  * n=3 is the aggressive default, n=8..13 the production discipline
  * (GPT-3 appendix C uses 8-grams, The Pile 13-grams, Llama 2 similar) —
  * wider windows trade recall on short quotes for far fewer incidental
  * collisions. For SPARSER selection at wide n (sampled fingerprints
  * instead of every window) use [[WinnowDedup]], same discipline.
  *
  * Scale shape: benchmark sets are small (10²–10⁵ docs), so their
  * distinct shingle-hash frame is dim-sized and BROADCASTS to the
  * training scan — flagging is one broadcast join + one train-doc-keyed
  * aggregate; the 100 TB corpus is never shuffled on shingle hashes.
  * Per-doc hit COUNTS (not just booleans) come back so thresholded
  * policies ("drop at ≥ k collisions", the Pile's rule) stay expressible
  * downstream.
  */
object Decontaminate {

  /** (idCol, n_hits, contaminated) for every train doc with a non-null
    * id: n_hits = distinct benchmark shingles the document shares
    * (null/short texts shingle to nothing → 0, never dropped).
    *
    * @param shingleN n-gram window width; 3 by default, 8–13 for the
    *                 production benchmark-decontamination regimes.
    */
  def flag(train: DataFrame, bench: DataFrame, idCol: String,
           textCol: String, shingleN: Int = 3): DataFrame = {
    val benchShingles = bench
      .select(explode(TextShingles.shingleHashes(col(textCol), shingleN)).as("__h"))
      .distinct()
    val trainShingles = train
      .filter(col(idCol).isNotNull)
      .select(col(idCol), explode(TextShingles.shingleHashes(col(textCol), shingleN)).as("__h"))
    val hits = trainShingles.join(broadcast(benchShingles), Seq("__h"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("__h")).as("n_hits"))
    train.filter(col(idCol).isNotNull).select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0L).as("contaminated"))
  }
}
