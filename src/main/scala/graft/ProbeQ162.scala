package graft

import org.apache.spark.sql.functions._

/** Dev tool: time the PRODUCTION arm of the semantic contamination audit
  * (`ProbeQ162 <sfDir>`) — `auditAdaptive` WITHOUT the flat-ladder
  * guard, so past-boundary corpora route through the two-level
  * assignment rung exactly as production would (the gate arm refuses
  * there by design, since its oracle replays only the flat ladder).
  * Prints one JSON line with the chosen ladder knobs and the wall time.
  */
object ProbeQ162 {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val (kc, kf) = graft.operators.dedup.SemanticDedup.adaptiveTwoLevel(n)
    val m = graft.operators.similarity.NswAnn.trainModulus(n)
    val t0 = System.nanoTime()
    val out = graft.operators.dedup.SemanticContamination.auditAdaptive(
      emb, "vec_id", "embedding",
      vid => graft.operators.Sampling.hashBucket(
        vid, graft.queries.IvfQueries.ContamEvalBuckets, ":semsplit") === 0,
      graft.queries.IvfQueries.SemThreshold,
      graft.queries.IvfQueries.TrainIters,
      graft.queries.SimilarityQueries.Dims)
    val rows = out.count()
    val flagged = out.filter(col("contaminated")).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"q162_probe","sf":"$sfDir","n":$n,"kc":$kc,"kf":$kf,"modulus":$m,"eval_rows":$rows,"contaminated":$flagged,"sec":${math.round(sec * 100) / 100.0}}""")
    spark.stop()
  }
}
