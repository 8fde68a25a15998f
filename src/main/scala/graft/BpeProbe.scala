package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the batched-BPE driver-latency claim (q150's reason to
  * exist): wall-clock a ≥1k-merge training run under the sequential
  * trainer (one Spark job + 1-row collect per merge) vs the batched
  * trainer (top-B symbol-disjoint merges per round). The corpus
  * vocabulary is SYNTHESIZED from md5 hex (the shipped tables' ~30-word
  * vocabulary exhausts its pair space after a few dozen merges — the
  * probe needs a pair space that survives 1k+ merges, and the quantity
  * under test is the driver's per-round scheduling cost, which is
  * data-independent).
  *
  * Usage: runMain graft.BpeProbe <nDocs> <mode:seq|batch> <n> [batchSize]
  * seq: n = merges (one round each). batch: n = ROUNDS (up to batchSize
  * merges each; early rounds learn fewer — the symbol-disjoint cap is
  * ~alphabet/2, and the alphabet grows with the merges themselves).
  * Prints one JSON line: mode, merges learned, rounds, seconds.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toInt
    val mode = args(1)
    val merges = args(2).toInt
    val batch = if (args.length > 3) args(3).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 8 derived 8-hex-char words per doc: a dense, collision-rich pair
    // space (16-symbol alphabet, long words) that supports 1k+ merges
    val docs = spark.range(nDocs.toLong).select(
      concat_ws(" ", (0 until 8).map(i =>
        substring(md5(concat(col("id"), lit(s":$i"))), 1, 8)): _*).as("text"))
    val t0 = System.nanoTime()
    val (learned, rounds) = mode match {
      case "seq" =>
        (graft.operators.BpeTrain.merges(docs, "text", merges).count(), merges)
      case "batch" =>
        (graft.operators.BpeTrain.mergesBatched(docs, "text", merges, batch)
          .count(), merges)
      case other => sys.error(s"mode seq|batch, got $other")
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"mode":"$mode","merges_learned":$learned,"rounds":$rounds,"seconds":$sec%.1f}""")
    spark.stop()
  }
}
