package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession builder pre-configured with the
  * settings graft's semantics assume and the adaptive features a large
  * cluster needs. Use this (or mirror these settings) in any application
  * embedding the library.
  */
object GraftSession {

  /** @param shufflePartitions size to ~2-3× total executor cores, or rely
    *                          on AQE coalescing at scale.
    */
  def builder(master: String = "local[*]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // pandas-style coerce semantics (null on bad cast) — the reference's
      // cleaning contract; see SURVEY §4
      .config("spark.sql.ansi.enabled", "false")
      // testdata events.parquet ships TIMESTAMP(NANOS)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // write µs (BigQuery/DuckDB-compatible) timestamps, not INT96/ns —
      // keeps derived-timestamp outputs physically identical to the oracle
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // runtime re-planning: partition coalescing, skew-join splitting,
      // shuffle-to-broadcast demotion
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Coalesce post-shuffle partitions by the advisory SIZE, not the
      // core count (Spark's own docs recommend parallelismFirst=false):
      // with it true, a KiB-sized shuffle still fans out to ~cores
      // reduce tasks, and a query built from dozens of tiny exchanges
      // pays ~cores× the task-launch overhead per exchange while a
      // 100 TB shuffle is sized by bytes either way. Size-based
      // coalescing is the scale-adaptive choice in BOTH directions:
      // partition counts derive from data volume, not from whatever
      // local[] width the session happens to run at.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
}
