package graft

import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of the image near-dup pipeline
  * (`ProbeQ167 <sfDir>`) — decode+hash, banded candidate retrieval, and
  * the full verified pair relation, each timed separately so a scale
  * regression is attributable to a stage instead of the whole query.
  * Prints one JSON line.
  */
object ProbeQ167 {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.multimodal.ImageHash
    graft.operators.OpCache.scoped {
      def t[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val corpus = graft.queries.SimilarityQueries.imageCorpus(spark, sfDir)
      val hashes = graft.operators.OpCache.cache(
        ImageHash.hashes(spark, corpus, "doc_id", "blob"))
      val (nHash, tHash) = t(hashes.count())
      val h = graft.operators.OpCache.cache(
        hashes.filter(col("dhash").isNotNull)
          .select(col("doc_id").as("hid"), col("dhash"), col("ahash")))
      // raw candidate volume (pre-verify): the 25×-over-pairs number the
      // verify-at-join order exists to kill before any exchange
      val banded = ImageHash.bandedPostings(h, "hid", 3)
      val (nCand, tCand) = t(
        banded.select(col("band"), col("key"), col("hid").as("a_id"))
          .join(banded.select(col("band"), col("key"), col("hid").as("b_id")),
            Seq("band", "key"))
          .filter(col("a_id") < col("b_id"))
          .count())
      val (nPairs, tPairs) = t(
        ImageHash.nearDupPairs(hashes, "doc_id").count())
      println(s"""{"n_hashes":$nHash,"t_hash":$tHash,"n_cand":$nCand,""" +
        s""""t_cand":$tCand,"n_pairs":$nPairs,"t_pairs":$tPairs}""")
    }
    spark.stop()
  }
}
