package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a k× scale-up of a testdata directory for empirical
  * scale probes (`ScaleUp <srcDir> <dstDir> <factor>`). The bench-vs-scale
  * curve is the evidence that the 100 TB design arguments (candidate-pair
  * caps, band-bucket sizes, CC round counts, Expand multiplication) hold
  * beyond the driver's largest shipped scale factor.
  *
  * Replication is key-shifted so referential joins stay consistent within a
  * replica, and content-DECORRELATED across replicas so similarity/dedup
  * problem structure scales linearly instead of quadratically:
  *  - fact/dim keys shift by `r * (max(key)+1)` per replica r;
  *  - document text maps every token to a replica-suffixed token (within-
  *    replica shingle/near-dup structure identical, zero cross-replica
  *    candidates — 10 verbatim copies would instead turn every dup pair
  *    into a 10×-clique and superlinearly distort LSH/CC);
  *  - embeddings cyclically rotate by r dimensions (norms and within-replica
  *    cosine geometry preserved exactly; cross-replica vectors decorrelate).
  * region/nation stay fixed-size, as real dimension tables would.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")

    // max(key)+1 offsets keep replica key ranges disjoint
    def offsetOf(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    val custOff = offsetOf(tbl("customer"), "c_custkey")
    val suppOff = offsetOf(tbl("supplier"), "s_suppkey")
    val partOff = offsetOf(tbl("part"), "p_partkey")
    val ordOff = offsetOf(tbl("orders"), "o_orderkey")
    val evtOff = offsetOf(tbl("events"), "event_id")
    val userOff = offsetOf(tbl("events"), "user_id")
    val docOff = offsetOf(tbl("documents"), "doc_id")
    val vecOff = offsetOf(tbl("embeddings"), "vec_id")

    /** Cross-join with replica ids 0..factor-1 and shift `shifts` keys. */
    def replicate(df: DataFrame, shifts: Map[String, Long])
                 (extra: (DataFrame, Column) => DataFrame = (d, _) => d): DataFrame = {
      val reps = spark.range(factor).select(col("id").as("_rep"))
      val crossed = df.crossJoin(broadcast(reps))
      val shifted = shifts.foldLeft(crossed) { case (d, (k, off)) =>
        d.withColumn(k, col(k) + col("_rep") * off)
      }
      extra(shifted, col("_rep")).drop("_rep")
    }

    write(tbl("region"), "region")
    write(tbl("nation"), "nation")
    write(replicate(tbl("customer"), Map("c_custkey" -> custOff))(), "customer")
    write(replicate(tbl("supplier"), Map("s_suppkey" -> suppOff))(), "supplier")
    write(replicate(tbl("part"), Map("p_partkey" -> partOff))(), "part")
    write(replicate(tbl("orders"),
      Map("o_orderkey" -> ordOff, "o_custkey" -> custOff))(), "orders")
    write(replicate(tbl("lineitem"),
      Map("l_orderkey" -> ordOff, "l_partkey" -> partOff,
        "l_suppkey" -> suppOff))().repartition(32), "lineitem")
    write(replicate(tbl("events"),
      Map("event_id" -> evtOff, "user_id" -> userOff))(), "events")
    // token-level decorrelation: every non-space token gains a per-replica
    // suffix (replica 0 keeps the original text verbatim)
    write(replicate(tbl("documents"), Map("doc_id" -> docOff)) { (d, rep) =>
      d.withColumn("text",
          when(rep === 0, col("text")).otherwise(
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1x"), rep.cast("string")))))
        .withColumn("n_chars", length(col("text")))
    }.repartition(32), "documents")
    // dimension rotation: |v| and within-replica angles preserved exactly,
    // cross-replica vectors decorrelate
    write(replicate(tbl("embeddings"), Map("vec_id" -> vecOff)) { (d, rep) =>
      val e = col("embedding")
      val n = size(e)
      // rotate by rep MOD dims: factors beyond the dimension count wrap
      // (slice with rep >= n would otherwise compute a negative length);
      // replicas rep and rep+dims share a rotation but remain key-disjoint
      val r = rep % n
      d.withColumn("embedding",
        when(r === 0, e).otherwise(
          concat(slice(e, r + lit(1), n - r), slice(e, lit(1), r))))
    }, "embeddings")

    spark.stop()
  }
}
