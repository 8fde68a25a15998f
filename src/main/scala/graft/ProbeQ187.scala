package graft

import org.apache.spark.sql.functions._

/** Dev tool: time the PRODUCTION arm of the three-modality ladder
  * (`ProbeQ187 <sfDir>`) —
  * [[graft.pipelines.MediaCurationPipeline.runMixed]] WITHOUT the
  * flat-ladder guard, so past-boundary keeper populations route through
  * the two-level assignment rung exactly as production would. Prints
  * one JSON line with per-modality keeper counts and wall time.
  */
object ProbeQ187 {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val out = graft.operators.OpCache.scoped {
      val res = graft.pipelines.MediaCurationPipeline.runMixed(
        graft.queries.SimilarityQueries.mixedCorpus(spark, sfDir),
        Tables.embeddings(spark, sfDir), "doc_id", "blob",
        threshold = graft.queries.IvfQueries.SemThreshold,
        trainIters = graft.queries.IvfQueries.TrainIters,
        dims = graft.queries.SimilarityQueries.Dims)
      val byMod = res.groupBy(col("modality"))
        .agg(count(lit(1)).as("n"), sum(col("n_source_items")).as("mass"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val kept = res.filter(col("kept")).count()
      (byMod, kept)
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val mods = out._1.toSeq.sortBy(_._1).map { case (m, (n, mass)) =>
      s""""$m":{"keepers":$n,"raw_mass":$mass}""" }.mkString(",")
    println(s"""{"metric":"q187_probe","sf":"$sfDir",$mods,"kept":${out._2},"sec":${math.round(sec * 100) / 100.0}}""")
    spark.stop()
  }
}
