package graft

import org.apache.spark.sql.functions._

/** Dev tool: time the PRODUCTION arm of the MIXED image+audio embedding
  * pipeline (`ProbeQ172 <sfDir>`, the q172 corpus) — `BinaryEmbeddingPipeline.run`
  * WITHOUT the flat-ladder guard, so past-boundary content-group
  * populations route through the two-level assignment rung exactly as
  * production would (the gate arm refuses there by design: its oracle
  * replays only the flat cell ladder, and a 100× corpus's ~110k content
  * groups sit past the 65,536-vector flat boundary). Prints one JSON
  * line with the survivor count, ladder knobs and wall time.
  */
object ProbeQ172 {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val out = graft.operators.OpCache.scoped {
      val res = graft.pipelines.BinaryEmbeddingPipeline.run(
        graft.queries.IvfQueries.q172Corpus(spark, sfDir),
        Tables.embeddings(spark, sfDir), "doc_id", "blob",
        threshold = graft.queries.IvfQueries.SemThreshold,
        trainIters = graft.queries.IvfQueries.TrainIters,
        dims = graft.queries.SimilarityQueries.Dims)
      val n = res.count()
      val kept = res.filter(col("kept")).count()
      (n, kept)
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val (kc, kf) = graft.operators.dedup.SemanticDedup.adaptiveTwoLevel(out._1)
    println(s"""{"metric":"q172_probe","sf":"$sfDir","survivors":${out._1},"kept":${out._2},"kc":$kc,"kf":$kf,"sec":${math.round(sec * 100) / 100.0}}""")
    spark.stop()
  }
}
