package graft

/** Dev tool: apples-to-apples timing of the TRANSFORM stage against the
  * reference's pandas `transform_data` (`BaselineProbe <sfDir> [mult]`,
  * consumed by tools/baseline_bench.py → BASELINE_MEASURED.json).
  *
  * The reference function is in-memory pandas: it receives an
  * already-parsed DataFrame and returns fact/dim frames without touching
  * storage. The equivalent scope here is: raw JSON pre-read and CACHED
  * (load_raw_data is not timed on the reference side either), then the
  * SHIPPED transform chain — [[graft.pipelines.TikiDailyPipeline.dedupedOf]]
  * → [[graft.pipelines.TikiDailyPipeline.splitOf]], the same functions
  * `run` composes, so the probe cannot drift from the pipeline — with all
  * three outputs materialized through the noop sink (full evaluation, no
  * storage cost billed). The dedup result is cached exactly as the real
  * pipeline caches it, so the split's three consumers don't re-run the
  * parse lineage (pandas likewise computes the chain once). Same records
  * as q68 via the shared writeQ68Raw generator; `mult` replicates the key
  * set (pk + i·10⁹, mirrored by the python generator) to scale the
  * comparison past single-process fixed costs. Best-of-3, matching the
  * repo bench protocol.
  */
object BaselineProbe {
  def main(args: Array[String]): Unit = {
    val (sfDir, mult) = args match {
      case Array(d)    => (d, 1)
      case Array(d, m) => (d, scala.util.Try(m.toInt).getOrElse(
        sys.error(s"usage: BaselineProbe <sfDir> [mult]; mult must be an integer, got '$m'")))
      case _ => sys.error("usage: BaselineProbe <sfDir> [mult]")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_baseline_probe_${ProcessHandle.current().pid()}"
    // same lifecycle as PipelineQueries.scratch: repeated probe runs must
    // not strand full raw-zone copies in /tmp
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(base))
    }))

    queries.PipelineQueries.writeQ68Raw(spark, sfDir, base, mult)
    val raw = graft.sources.RawZone.read(spark, s"$base/raw",
      date = Some("2024-03-15")).cache()
    val nRaw = raw.count() // materialize the input outside the timed window
    // Order-free field hash over the parse-relevant columns, mirrored in
    // DuckDB by tools/baseline_bench.py over ITS generated frame: the
    // "exactly the same records" premise fails loudly instead of drifting
    // silently if either generator changes alone. Each hashed field is
    // EXPLICITLY cast to string and null-coalesced to a sentinel on BOTH
    // sides — concat_ws skips nulls while SQL '||' nulls the whole string,
    // so without the pin a single null field would silently diverge the
    // two checksums (the fields are generator-produced strings today; the
    // coalesce keeps the assertion honest if that ever changes).
    val rawChecksum = {
      import org.apache.spark.sql.functions._
      val hashed = Seq("product_id", "sku", "price", "quantity_sold",
        "rating", "review_count", "_extracted_at")
        .map(c => coalesce(col(c).cast("string"), lit("")))
      raw.select(
        sum(conv(substring(md5(concat_ws("|", hashed: _*).cast("binary")),
          1, 8), 16, 10).cast("long")))
        .head.getLong(0)
    }

    def once(): Unit = {
      val deduped = graft.pipelines.TikiDailyPipeline.dedupedOf(raw).cache()
      try {
        val split = graft.pipelines.TikiDailyPipeline.splitOf(deduped)
        Seq(split.fact, split.dimProducts, split.dimCategories)
          .foreach(_.write.format("noop").mode("overwrite").save())
      } finally deduped.unpersist()
    }

    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      once()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"""{"metric":"tiki_transform_equiv","sf":"$sfDir","mult":$mult,"n_raw_records":$nRaw,"raw_checksum":$rawChecksum,"transform_sec":${times.min}%.3f}""")
    spark.stop()
  }
}
