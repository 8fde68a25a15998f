package graft

import org.apache.spark.sql.functions._

/** Dev tool: time the PRODUCTION arm of the media-curation ladder
  * (`ProbeQ183 <sfDir>`) — [[graft.pipelines.MediaCurationPipeline]]
  * WITHOUT the flat-ladder guard, so past-boundary keeper populations
  * route through the two-level assignment rung exactly as production
  * would. Prints one JSON line with the keeper count and wall time.
  */
object ProbeQ183 {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val out = graft.operators.OpCache.scoped {
      val res = graft.pipelines.MediaCurationPipeline.run(
        graft.queries.SimilarityQueries.imageCorpus(spark, sfDir),
        Tables.embeddings(spark, sfDir), "doc_id", "blob",
        threshold = graft.queries.IvfQueries.SemThreshold,
        trainIters = graft.queries.IvfQueries.TrainIters,
        dims = graft.queries.SimilarityQueries.Dims)
      val n = res.count()
      val kept = res.filter(col("kept")).count()
      val mass = res.agg(sum(col("n_source_items"))).head.getLong(0)
      (n, kept, mass)
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"q183_probe","sf":"$sfDir","keepers":${out._1},"kept":${out._2},"raw_mass":${out._3},"sec":${math.round(sec * 100) / 100.0}}""")
    spark.stop()
  }
}
