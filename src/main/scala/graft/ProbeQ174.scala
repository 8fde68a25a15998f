package graft

import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of the audio near-dup pipeline
  * (`ProbeQ174 <sfDir>`) — decode+profile+hash vs the verified pair
  * relation, plus the pair count (the planted-structure volume at this
  * SF). Prints one JSON line.
  */
object ProbeQ174 {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.multimodal.AudioHash
    graft.operators.OpCache.scoped {
      def t[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val corpus = graft.queries.SimilarityQueries.audioCorpus(spark, sfDir)
      val hashes = graft.operators.OpCache.cache(
        AudioHash.hashes(spark, corpus, "doc_id", "blob"))
      val (nHash, tHash) = t(hashes.count())
      val (nPairs, tPairs) = t(
        AudioHash.nearDupPairs(hashes, "doc_id").count())
      println(s"""{"n_hashes":$nHash,"t_hash":$tHash,""" +
        s""""n_pairs":$nPairs,"t_pairs":$tPairs}""")
    }
    spark.stop()
  }
}
