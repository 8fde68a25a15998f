package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Regression guard for the driver testdata's physical event-time layouts.
  *
  * The driver has shipped `events.parquet`'s `ts` in three forms across
  * rounds: parquet TIMESTAMP(NANOS) (read as a nanosecond long under
  * nanosAsLong), naive `timestamp[us]` (read as TIMESTAMP_NTZ — the layout
  * that silently broke q18/q57/q76/q89 in round 10), and proper TIMESTAMP.
  * Every spec elsewhere fabricates TimestampType events, so none of them
  * could catch a layout drift; this one materializes all three layouts on
  * disk, routes them through [[Tables.events]], and runs the actual
  * timestamp-arithmetic `SparkEntry.queries` end-to-end on each, asserting
  * identical results.
  */
class TablesLayoutSpec extends SparkSpec {

  private val EventQueries =
    Seq("q17_windowed_events", "q18_sessionize", "q57_errors_in_sessions",
      "q69_click_attribution", "q76_funnel", "q89_twap")

  private val OtherTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  /** A scale-factor dir whose events.parquet is `writeEvents`' layout and
    * whose other tables symlink the real sf0.001 data.
    */
  private def layoutDir(name: String)(writeEvents: (DataFrame, String) => Unit): String = {
    val dir = Files.createTempDirectory(s"graft-layout-$name").toFile
    // deleteOnExit alone is a no-op on a non-empty directory — recurse,
    // but NEVER through a symlink: the table links below point INTO the
    // shared /root/testdata fixture, and listFiles() follows links
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        if (!Files.isSymbolicLink(f.toPath))
          Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dir)
    }))
    OtherTables.foreach { t =>
      Files.createSymbolicLink(Paths.get(dir.getPath, s"$t.parquet"),
        Paths.get(sf("0.001"), s"$t.parquet"))
    }
    val canonical = Tables.events(spark, sf("0.001"))
      .withColumn("ts", col("ts").cast(TimestampType))
    writeEvents(canonical, s"${dir.getPath}/events.parquet")
    dir.getPath
  }

  private def run(q: String, dir: String): Seq[String] =
    SparkEntry.queries(q)(spark, dir)
      .collect().map(_.toString).sorted.toSeq

  test("Tables.events normalizes all three driver ts layouts to TIMESTAMP") {
    val tzDir = layoutDir("tz") { (ev, out) =>
      ev.coalesce(1).write.mode("overwrite").parquet(out)
    }
    val ntzDir = layoutDir("ntz") { (ev, out) =>
      ev.withColumn("ts", col("ts").cast(TimestampNTZType))
        .coalesce(1).write.mode("overwrite").parquet(out)
    }
    // TIMESTAMP(NANOS) surfaces through the scan as a nanos long under
    // spark.sql.legacy.parquet.nanosAsLong (set in SparkSpec), so a long
    // column IS the post-read shape of that layout
    val nanosDir = layoutDir("nanos") { (ev, out) =>
      ev.withColumn("ts", (unix_micros(col("ts")) * 1000L).cast(LongType))
        .coalesce(1).write.mode("overwrite").parquet(out)
    }

    for (d <- Seq(tzDir, ntzDir, nanosDir)) {
      val got = Tables.events(spark, d).schema("ts").dataType
      assert(got == TimestampType, s"layout at $d read back as $got")
    }

    for (q <- EventQueries) {
      val ref = run(q, tzDir)
      assert(ref.nonEmpty, s"$q returned no rows on the TIMESTAMP layout")
      assert(run(q, ntzDir) == ref, s"$q differs on the naive-micros layout")
      assert(run(q, nanosDir) == ref, s"$q differs on the nanos-long layout")
    }
  }

  test("operators accept TIMESTAMP_NTZ event times directly") {
    // operator-level NTZ polymorphism (TimeCols) — callers that bypass
    // Tables.events must not hit DATATYPE_MISMATCH either
    val ntz = Tables.events(spark, sf("0.001"))
      .withColumn("ts", col("ts").cast(TimestampNTZType))
    assert(graft.streaming.Sessionize.batch(ntz, 1800L).count() > 0)
    assert(graft.operators.Funnel.stageCounts(ntz, "user_id", "ts",
      "event_type", Seq("view", "cart", "purchase")).count() > 0)
    assert(graft.operators.Analytics.timeWeightedAvg(
      ntz.filter(col("event_type") === "fx_rate"), "user_id", "ts",
      col("value"), Seq("event_id")).count() >= 0)
  }
}
