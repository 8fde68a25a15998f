package graft.pipelines

import java.time.LocalDate

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Date-range backfill driver over the four composed pipelines — the
  * reference's Airflow execution-date / catchup / retry semantics
  * (dags/tiki_dag.py:18-33: retries=2, max_active_runs=1, daily schedule;
  * dags/analytics_dag.py:271-282: runs at 10:00, strictly after the 09:00
  * upstreams) re-expressed as a library driver:
  *
  *   - one DAG-run per execution date, oldest first (catchup ordering);
  *     serial, the reference's `max_active_runs=1`
  *   - within a date: tiki, trends and fx are independent; analytics runs
  *     only after all three succeed (the schedule-offset dependency)
  *   - `depends_on_past=False`: a failed date does NOT block later dates —
  *     each day's tasks are idempotent against the running tables
  *   - per-task retries (default 2, the reference's `default_args`)
  *   - **resume**: each task success is recorded as a marker file under
  *     `<warehouse>/_backfill/<date>/<task>`; a rerun of the same range
  *     skips marked tasks and re-executes failed/missing ones. Because
  *     every task is idempotent (dynamic partition overwrite for facts,
  *     keyed MERGE for dims/trends/fx), re-running a task whose marker was
  *     lost mid-crash converges to the same warehouse — resume-after-kill
  *     equals a clean single pass (PipelinesE2ESpec asserts table-for-table
  *     equality).
  *
  * Scale: the driver is pure orchestration — every task is one Spark job
  * over ONE day's partition; a 1000-day backfill is 1000 bounded jobs, not
  * one O(history) job, and the markers make it restartable at day
  * granularity.
  */
object Backfill {

  /** Per-execution-date inputs for the source-fetching DAG legs.
    *
    * @param trendsCsv path of that day's Google-Trends CSV drop; None = no
    *                  drop scheduled (the trends leg no-ops that day)
    * @param fxRate    the day's fetched USD/VND rate; None = fetch failed,
    *                  record the fallback row (fx_rate_dag.py's fallback arm)
    */
  final case class DaySources(trendsCsv: Option[String] = None,
                              fxRate: Option[Double] = None)

  final case class Config(rawZone: String,
                          warehouse: String,
                          keywordMap: DataFrame,
                          sources: String => DaySources,
                          retries: Int = 2)

  sealed trait Status
  /** Ran and succeeded this invocation (attempt count recorded). */
  case object Succeeded extends Status
  /** Marker from a previous invocation — not re-run. */
  case object AlreadyComplete extends Status
  /** All attempts raised; last error kept. */
  final case class Failed(error: Throwable) extends Status
  /** Not attempted: an upstream task of the same date failed. */
  case object UpstreamFailed extends Status

  final case class TaskRun(date: String, task: String, status: Status,
                           attempts: Int) {
    def ok: Boolean = status == Succeeded || status == AlreadyComplete
  }

  final case class Report(runs: Seq[TaskRun]) {
    def ok: Boolean = runs.forall(_.ok)
    def failures: Seq[TaskRun] = runs.filterNot(_.ok)
  }

  /** Inclusive execution-date range, oldest first (catchup ordering). */
  def dateRange(from: String, to: String): Seq[String] = {
    val (a, b) = (LocalDate.parse(from), LocalDate.parse(to))
    require(!b.isBefore(a), s"backfill range end $to before start $from")
    Iterator.iterate(a)(_.plusDays(1)).takeWhile(!_.isAfter(b))
      .map(_.toString).toSeq
  }

  def run(spark: SparkSession, config: Config, dates: Seq[String]): Report =
    Report(dates.flatMap(runDay(spark, config, _)))

  private val UpstreamTasks = Seq("tiki", "trends", "fx")

  private def runDay(spark: SparkSession, config: Config,
                     date: String): Seq[TaskRun] = {
    val day = config.sources(date)
    val upstream = UpstreamTasks.map {
      case "tiki" => exec(spark, config, date, "tiki") {
        TikiDailyPipeline.run(spark, config.rawZone, config.warehouse, date)
      }
      case "trends" => exec(spark, config, date, "trends") {
        // no CSV drop scheduled for this date → the leg has nothing to do
        day.trendsCsv.foreach(csv =>
          TrendsPipeline.run(spark, csv, s"${config.warehouse}/fact_google_trends"))
      }
      case "fx" => exec(spark, config, date, "fx") {
        FxPipeline.run(spark, day.fxRate, date,
          s"${config.warehouse}/dim_exchange_rate")
      }
    }
    val analytics =
      if (upstream.forall(_.ok))
        exec(spark, config, date, "analytics") {
          AnalyticsPipeline.run(spark, config.warehouse, date, config.keywordMap)
        }
      else TaskRun(date, "analytics", UpstreamFailed, attempts = 0)
    upstream :+ analytics
  }

  /** Run one task with marker-skip and bounded retries. Never throws —
    * failures land in the report so later dates still run
    * (depends_on_past=False).
    */
  private def exec(spark: SparkSession, config: Config, date: String,
                   task: String)(body: => Unit): TaskRun = {
    val marker = new org.apache.hadoop.fs.Path(
      s"${config.warehouse}/_backfill/$date/$task")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) return TaskRun(date, task, AlreadyComplete, 0)
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= config.retries) {
      attempt += 1
      try {
        body
        // marker is written AFTER the task's own writes land; a crash
        // between the two re-runs an idempotent task — never skips one
        val out = fs.create(marker, true)
        try out.write(s"attempts=$attempt\n".getBytes("UTF-8"))
        finally out.close()
        return TaskRun(date, task, Succeeded, attempt)
      } catch {
        case NonFatal(e) => lastErr = e
      }
    }
    TaskRun(date, task, Failed(lastErr), attempt)
  }
}
