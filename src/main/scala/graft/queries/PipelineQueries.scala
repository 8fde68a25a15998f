package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipelines.TikiDailyPipeline
import graft.sources.CleanZone

/** Oracle gate for the COMPOSED reference DAGs (SURVEY §2 items 52-55):
  * the full tiki_dag day — raw crawler JSON → clean → dedup-latest → null
  * gate → star split → idempotent partitioned fact write → dim MERGE →
  * quality gate — driven end-to-end through [[TikiDailyPipeline.run]], with
  * the WRITTEN fact partition read back as the gated result.
  *
  * The raw snapshots are derived deterministically from `part` (two
  * snapshots per product, later one wins dedup; every ~97th product's
  * final snapshot has an unparseable price so the null-key gate drops it),
  * so the DuckDB oracle recomputes the expected fact partition from `part`
  * with plain arithmetic — an independent replay of the whole DAG's
  * semantics, not of its implementation.
  */
object PipelineQueries {

  private val q68Invocation = new AtomicInteger(0)

  /** Per-process scratch root; removed on JVM exit so repeated bench/verify
    * runs don't strand warehouse copies in /tmp (same lifecycle as
    * MartQueries' bucketed scratch).
    */
  private[queries] lazy val scratch: String = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_pipeline-${ProcessHandle.current().pid()}"
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(base))
    }))
    base
  }

  private val Date = "2024-03-15"

  /** Crawler-shaped snapshot record derived from `p_partkey`; `late` is the
    * dedup winner. Shared by q68 (tiki_dag), q103 (analytics_dag) and q112
    * (backfill), which differ only in how the category path/url derive from
    * the key and which execution date the snapshots carry.
    */
  private def snapRecord(late: Boolean, path: Column, catUrl: Column,
                         date: String = Date): Column = {
    val pk = col("p_partkey")
    def s(c: Column): Column = c.cast("string")
    val price =
      if (!late) concat(s(pk % 800 + 151), lit(".000 đ"))
      // the winner for every ~97th product is unparseable → cleanPrice
      // null → dropNullKeys removes the product from the day's fact
      else when(pk % 97 === 0, lit("khuyến mãi"))
        .otherwise(concat(s(pk % 800 + 150), lit(".000 VND")))
    // keep the integer part <= 999: "1000.000 VND" is not a valid
    // VN-thousand-separated literal and cleanPrice would read it as 1000
    val origPrice = concat(s(pk % 700 + (if (late) 250 else 300)), lit(".000 VND"))
    val discount = concat(lit("-"), s(pk % 80 + (if (late) 0 else 1)), lit("%"))
    val sold =
      if (late) concat(lit("Đã bán "), s(pk % 500), lit("k"))
      else concat(lit("Đã bán "), s(pk % 500))
    val rating =
      if (late) concat(s(pk % 4 + 1), lit("."), s(pk % 10)) else lit("1.0")
    val reviews = if (late) s(pk % 1000) else s(pk % 1000 + 5)
    val badges = when(pk % 2 === 0, array(lit("tiki_now"), lit("freeship")))
      .otherwise(array(lit("freeship")))
    val extractedAt =
      lit(if (late) s"${date}T16:30:00.000Z" else s"${date}T08:00:00.000Z")
    struct(
      s(pk).as("product_id"),
      concat(lit("SKU-"), s(pk), lit(if (late) "-1" else "-0")).as("sku"),
      concat(lit("Product "), s(pk)).as("name"),
      price.as("price"),
      origPrice.as("original_price"),
      discount.as("discount_rate"),
      sold.as("quantity_sold"),
      rating.as("rating"),
      reviews.as("review_count"),
      concat(lit("Brand "), s(pk % 50)).as("brand"),
      concat(lit("Seller "), s(pk % 30)).as("seller"),
      s(pk % 30).as("seller_id"),
      // seller_logo/category_name are carried because the reference's
      // transform_data selects them into dim_products
      // (transform_tiki.py:631) — the BaselineProbe comparison frames must
      // be column-identical to the pandas generator's. The Spark pipeline
      // itself never reads them (it derives the category from
      // _category_url instead, the crawler-payload semantics).
      concat(lit("http://t/s"), s(pk % 30), lit(".png")).as("seller_logo"),
      concat(lit("slug-"), s(pk % 25)).as("category_name"),
      concat(lit("http://t/"), s(pk), lit(".jpg")).as("thumbnail_url"),
      concat(lit("https://tiki.vn/p/"), s(pk)).as("product_url"),
      path.as("category_path"),
      catUrl.as("_category_url"),
      badges.as("badges"),
      extractedAt.as("_extracted_at"))
  }

  /** Write two JSON snapshots per product under `snapshot_date=<date>/`;
    * `partFilter` lets multi-day callers (q112) stratify the product set so
    * N daily raw zones cost what one full day does.
    */
  private def writeRawSnapshots(spark: SparkSession, dir: String, base: String,
                                path: Column, catUrl: Column,
                                date: String = Date,
                                partFilter: Column = lit(true)): Unit =
    writeRawSnapshotsFrom(
      Tables.part(spark, dir).filter(partFilter).select(col("p_partkey")),
      base, path, catUrl, date)

  /** Key-frame variant: `src` must carry `p_partkey` (BaselineProbe feeds a
    * replicated key set here to scale the transform-throughput comparison).
    */
  private[graft] def writeRawSnapshotsFrom(src: DataFrame, base: String,
                                           path: Column, catUrl: Column,
                                           date: String = Date): Unit =
    src.select(explode(array(
        snapRecord(late = false, path, catUrl, date),
        snapRecord(late = true, path, catUrl, date))).as("r"))
      .select("r.*")
      .coalesce(4)
      .write.mode("overwrite").json(s"$base/raw/snapshot_date=$date")

  /** q68's raw-snapshot derivation, shared with [[graft.BaselineProbe]] so
    * the reference-pandas baseline (tools/baseline_bench.py) and the Spark
    * transform probe time EXACTLY the same records. `mult` replicates the
    * key set with non-colliding offsets (pk + i·10⁹) to scale the
    * throughput comparison past single-process fixed costs; the python
    * generator mirrors the identical offset arithmetic.
    */
  private[graft] def writeQ68Raw(spark: SparkSession, dir: String,
                                 base: String, mult: Int = 1): Unit = {
    val pk = col("p_partkey")
    def s(c: Column): Column = c.cast("string")
    val path = when(pk % 3 === 0, s(pk % 25))
      .when(pk % 3 === 1, concat(s(pk % 25), lit(" > "), s(pk % 100 + 100)))
      .otherwise(concat(s(pk % 25), lit(" > "), s(pk % 100 + 100),
        lit(" > "), s(pk % 7 + 7)))
    val catUrl = concat(lit("https://tiki.vn/slug-"), s(pk % 25),
      lit("/c"), s(pk % 25))
    writeRawSnapshotsFrom(replicateKeys(spark, dir, mult), base, path, catUrl)
  }

  private def replicateKeys(spark: SparkSession, dir: String,
                            mult: Int): DataFrame = {
    val base = Tables.part(spark, dir).select(col("p_partkey"))
    if (mult == 1) base
    else base.crossJoin(
        broadcast(spark.range(mult).select(col("id").as("__i"))))
      .select((col("p_partkey") + col("__i") * 1000000000L).as("p_partkey"))
  }

  /** q68: tiki_dag end-to-end (ref dags/tiki_dag.py task chain:
    * transform_tiki.py:411 transform_data → load_to_bq.py:143 fact
    * WRITE_TRUNCATE → :273 dim MERGE → analytics_dag.py:172 ASSERT gate).
    */
  def q68TikiPipeline(spark: SparkSession, dir: String): DataFrame = {
    val inv = q68Invocation.incrementAndGet()
    val base = s"$scratch/q68_$inv"
    writeQ68Raw(spark, dir, base)

    TikiDailyPipeline.run(spark, s"$base/raw", s"$base/wh", Date)

    // the gated result is what the DAG actually WROTE, read back from the
    // warehouse — not an in-memory intermediate
    CleanZone.read(spark, s"$base/wh/fact_daily_snapshot")
      .select(col("snapshot_date"), col("product_id"), col("current_price"),
        col("original_price"), col("discount_rate"), col("sales_volume_acc"),
        col("review_count"), col("rating_average"), col("inventory_status"),
        col("tiki_now"), col("extracted_at").cast("timestamp_ntz").as("extracted_at"))
  }

  /** Independent DuckDB replay: the winner snapshot's parses, computed
    * arithmetically from the same `part` derivation.
    */
  def q68Oracle: String =
    s"""SELECT DATE '$Date' AS snapshot_date,
      |  p_partkey AS product_id,
      |  (p_partkey % 800 + 150) * 1000 AS current_price,
      |  (p_partkey % 700 + 250) * 1000 AS original_price,
      |  CAST(p_partkey % 80 AS INTEGER) AS discount_rate,
      |  (p_partkey % 500) * 1000 AS sales_volume_acc,
      |  p_partkey % 1000 AS review_count,
      |  CAST(CAST(p_partkey % 4 + 1 AS VARCHAR) || '.' || CAST(p_partkey % 10 AS VARCHAR) AS DOUBLE) AS rating_average,
      |  TRUE AS inventory_status,
      |  p_partkey % 2 = 0 AS tiki_now,
      |  TIMESTAMP '$Date 16:30:00' AS extracted_at
      |FROM part
      |WHERE p_partkey % 97 <> 0""".stripMargin

  private val q98Invocation = new AtomicInteger(0)

  /** q98: PARTITION-PRUNED MERGE ([[graft.operators.Upsert.mergePruned]],
    * ref load_to_bq.py:143 + :273) — orders land partitioned by year; a
    * delta touching ONLY the latest year (10% price updates at +1.00,
    * status 'U'; ~14% inserted keys at a non-colliding offset, status 'N')
    * merges through the pruned path, which rewrites the one touched
    * partition directory and never opens the others (byte-identity of
    * untouched partitions is spec-asserted in SourcesSpec). The gated
    * result is the WRITTEN table read back, aggregated per (year, status).
    */
  def q98MergePruned(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val inv = q98Invocation.incrementAndGet()
    val base = s"$scratch/q98_$inv/orders_by_year"

    val o = Tables.orders(spark, dir)
    val target = o.select(col("o_orderkey"),
      year(col("o_orderdate")).as("o_year"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("total_price"),
      col("o_orderstatus").as("status"))
    target.write.mode("overwrite").partitionBy("o_year").parquet(base)

    val maxYear = target.agg(max(col("o_year"))).head.getInt(0)
    val latest = target.filter(col("o_year") === maxYear)
    // +1.00 stays exact in DECIMAL(18,2) (a multiplicative bump would
    // re-derive precision differently in Spark vs DuckDB — q05's lesson)
    val updates = latest.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_year"),
        (col("total_price") + lit(new java.math.BigDecimal("1.00")))
          .cast(DecimalType(18, 2)).as("total_price"),
        lit("U").as("status"))
    val inserts = latest.filter(col("o_orderkey") % 7 === 0)
      .select((col("o_orderkey") + 1000000000000000L).as("o_orderkey"),
        col("o_year"), col("total_price"), lit("N").as("status"))

    graft.operators.Upsert.mergePruned(base, updates.unionByName(inserts),
      keys = Seq("o_orderkey"), partitionCol = "o_year")

    CleanZone.read(spark, base)
      .groupBy(col("o_year"), col("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("total_price")).cast(DoubleType).as("total"))
  }

  /** Independent replay: untouched years pass through; the latest year is
    * a full-outer merge with the same delta derivation.
    */
  def q98Oracle: String =
    """WITH my AS (SELECT MAX(year(o_orderdate)) AS y FROM orders),
      |tgt AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS total_price,
      |         o_orderstatus AS status
      |  FROM orders
      |), src AS (
      |  SELECT o_orderkey, o_year,
      |         CAST(total_price + CAST(1.00 AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS total_price,
      |         'U' AS status
      |  FROM tgt, my WHERE o_year = y AND o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 1000000000000000, o_year, total_price, 'N'
      |  FROM tgt, my WHERE o_year = y AND o_orderkey % 7 = 0
      |), untouched AS (
      |  SELECT o_orderkey, o_year, total_price, status FROM tgt, my
      |  WHERE o_year <> y
      |), touched AS (
      |  SELECT o_orderkey, o_year, total_price, status FROM tgt, my
      |  WHERE o_year = y
      |), mrg AS (
      |  SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
      |         COALESCE(t.o_year, s.o_year) AS o_year,
      |         CASE WHEN s.o_orderkey IS NOT NULL THEN s.total_price
      |              ELSE t.total_price END AS total_price,
      |         CASE WHEN s.o_orderkey IS NOT NULL THEN s.status
      |              ELSE t.status END AS status
      |  FROM touched t FULL OUTER JOIN src s
      |    ON t.o_orderkey = s.o_orderkey AND t.o_year = s.o_year
      |), final AS (
      |  SELECT * FROM untouched UNION ALL SELECT * FROM mrg
      |)
      |SELECT o_year, status, COUNT(*) AS n_orders,
      |  CAST(SUM(total_price) AS DOUBLE) AS total
      |FROM final GROUP BY 1, 2""".stripMargin

  private val q99Invocation = new AtomicInteger(0)

  /** q99: the DataSource V2 raw-JSON connector
    * ([[graft.sources.dsv2.RawJsonSource]]) driven through the oracle
    * gate — crawler-shaped JSONL (including corrupt lines every ~101st
    * product, skipped at the source per the permissive contract) is
    * generated deterministically from `part`, read back through the DSv2
    * scan with a pushed `price > 200000 AND active = true` predicate and
    * column pruning, and aggregated per brand. The DuckDB oracle replays
    * the generator arithmetic — an independent check that source-side
    * line skipping + filter pushdown lose and invent nothing.
    */
  def q99Dsv2Read(spark: SparkSession, dir: String): DataFrame = {
    val inv = q99Invocation.incrementAndGet()
    val base = s"$scratch/q99_$inv/raw"
    val pk = col("p_partkey")
    def s(c: Column): Column = c.cast("string")
    val line = when(pk % 101 === 0, lit("{broken"))
      .otherwise(concat(lit("{\"product_id\": "), s(pk),
        lit(", \"price\": "), s((pk % 800 + 150) * 1000),
        lit(", \"brand\": \"Brand "), s(pk % 50),
        lit("\", \"active\": "), s(pk % 3 === 0), lit("}")))
    Tables.part(spark, dir).select(line.as("value"))
      .coalesce(4).write.mode("overwrite").text(base)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("product_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("price",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("brand",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("active",
        org.apache.spark.sql.types.BooleanType)))
    spark.read.format("graft.sources.dsv2.RawJsonSource")
      .schema(schema).option("path", base).load()
      .filter(col("price") > 200000L && col("active") === true)
      .groupBy(col("brand"))
      .agg(count(lit(1)).as("n_rows"), sum(col("price")).as("total_price"))
  }

  def q99Oracle: String =
    """SELECT 'Brand ' || CAST(p_partkey % 50 AS VARCHAR) AS brand,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM((p_partkey % 800 + 150) * 1000) AS BIGINT) AS total_price
      |FROM part
      |WHERE p_partkey % 101 <> 0
      |  AND (p_partkey % 800 + 150) * 1000 > 200000
      |  AND p_partkey % 3 = 0
      |GROUP BY 1""".stripMargin

  private val q154Invocation = new AtomicInteger(0)

  /** q154: DSv2 AGGREGATE pushdown
    * ([[graft.sources.dsv2.RawJsonSource]] via
    * `SupportsPushDownAggregates` — the connector tier above q99's
    * filter/pruning pushdown): the per-brand COUNT/SUM/MIN/MAX aggregate
    * is PARTIALLY pushed into the source, which folds each raw file once
    * and ships ONE partial row per (file, brand) — at warehouse scale a
    * group-count-sized exchange instead of a row-count-sized one — while
    * Spark plans the final merge. Same deterministic crawler-shaped JSONL
    * generator as q99 (corrupt every ~101st line, skipped at source); no
    * filter, because this source reports every filter as a residual and
    * aggregation cannot run below a residual check. The DuckDB oracle
    * replays the generator arithmetic; RawJsonSourceSpec pins that the
    * pushdown actually FIRED (PushedAggregation in the scan node) and
    * that declined shapes (filtered, double-sum) fall back engine-side
    * with identical results.
    */
  def q154Dsv2Agg(spark: SparkSession, dir: String): DataFrame = {
    val inv = q154Invocation.incrementAndGet()
    val base = s"$scratch/q154_$inv/raw"
    val pk = col("p_partkey")
    def s(c: Column): Column = c.cast("string")
    val line = when(pk % 101 === 0, lit("{broken"))
      .otherwise(concat(lit("{\"product_id\": "), s(pk),
        lit(", \"price\": "), s((pk % 800 + 150) * 1000),
        lit(", \"brand\": \"Brand "), s(pk % 50),
        lit("\", \"active\": "), s(pk % 3 === 0), lit("}")))
    Tables.part(spark, dir).select(line.as("value"))
      .coalesce(4).write.mode("overwrite").text(base)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("product_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("price",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("brand",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("active",
        org.apache.spark.sql.types.BooleanType)))
    spark.read.format("graft.sources.dsv2.RawJsonSource")
      .schema(schema).option("path", base).load()
      .groupBy(col("brand"))
      .agg(count(col("product_id")).as("n_rows"),
        sum(col("price")).as("total_price"),
        min(col("price")).as("min_price"),
        max(col("price")).as("max_price"))
  }

  def q154Oracle: String =
    """SELECT 'Brand ' || CAST(p_partkey % 50 AS VARCHAR) AS brand,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM((p_partkey % 800 + 150) * 1000) AS BIGINT) AS total_price,
      |  CAST(MIN((p_partkey % 800 + 150) * 1000) AS BIGINT) AS min_price,
      |  CAST(MAX((p_partkey % 800 + 150) * 1000) AS BIGINT) AS max_price
      |FROM part
      |WHERE p_partkey % 101 <> 0
      |GROUP BY 1""".stripMargin

  private val q101Invocation = new AtomicInteger(0)

  /** q101: the continuous incremental-agg SINK driven end-to-end through
    * the oracle gate (SURVEY 44e — the streaming family's last all-spec
    * surface): events split into 5 deterministic micro-batches
    * (event_id % 5) fold one at a time through
    * [[graft.streaming.AggMaintenanceSink.maintainBatch]]'s swap-write
    * protocol into a running parquet mart; the LATEST batch is then
    * RE-APPLIED — foreachBatch's actual retry surface (Spark re-runs the
    * current batch after a sink failure, never an older one after newer
    * commits) — and must no-op via the applied-batch marker. The
    * gated result is the final WRITTEN state read back; the DuckDB oracle
    * aggregates all events directly — the merge(agg(B0..B4)) ==
    * agg(B0∪..∪B4) monoid contract plus retry idempotency, checked
    * against an engine that never saw the batching.
    */
  def q101AggMaintenance(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val inv = q101Invocation.incrementAndGet()
    val target = s"$scratch/q101_$inv/mart"
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
    def aggOf(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).as("total_value"))
    val sink = graft.streaming.AggMaintenanceSink
      .maintainBatch(target, Seq("user_id"), aggOf) _
    (0 to 4).foreach(b => sink(ev.filter(col("event_id") % 5 === b), b.toLong))
    sink(ev.filter(col("event_id") % 5 === 4), 4L) // retry of the latest batch
    CleanZone.read(spark, target)
      .select(col("user_id"), col("n_events"),
        col("total_value").cast(DoubleType).as("total_value"))
  }

  def q101Oracle: String =
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1""".stripMargin

  private val q103Invocation = new AtomicInteger(0)

  /** q103: analytics_dag end-to-end — the reference's CENTERPIECE DAG
    * (dags/analytics_dag.py:97-240: 5-way Golden Join over the warehouse
    * the tiki_dag wrote, VND→USD normalization with exact cent rounding,
    * trend-signal CASE, delete-write idempotent mart partition, ASSERT
    * gate) driven through [[graft.pipelines.AnalyticsPipeline.run]] on a
    * warehouse BUILT BY [[graft.pipelines.TikiDailyPipeline.run]] from raw
    * crawler JSON — two reference DAGs composed, storage round-trip
    * included. The gated result is the WRITTEN
    * `analytics_product_market_daily` partition read back.
    *
    * The raw snapshots reuse q68's generator with one change: every
    * category attribute (path shape, url slug) derives from the LEAF id
    * (pk % 40 + 10), so dim_categories rows are pure functions of
    * category_id and the oracle needs no dedup-tiebreak replay. The
    * keyword map activates 3 of every 4 categories (leaf % 4 != 1 →
    * otherwise 'Unmapped'), and the trends table scores 4 of every 5
    * mapped keywords (leaf % 5 == 2 → 'No Trend Data'), so all three
    * trend-signal arms appear. The DuckDB oracle replays the whole
    * composition — parse arithmetic, dedup winner, null-key drop, joins,
    * the exact integer half-up USD division — from `part` alone.
    */
  def q103AnalyticsDag(spark: SparkSession, dir: String): DataFrame = {
    val inv = q103Invocation.incrementAndGet()
    val base = s"$scratch/q103_$inv"
    val wh = s"$base/wh"

    val pk = col("p_partkey")
    def s(c: Column): Column = c.cast("string")
    val leaf = pk % 40 + 10
    // path ARM keyed off the leaf too: products sharing a category emit
    // identical (name, root, depth) tuples — dim dedup has nothing to break
    val path = when(leaf % 3 === 0, s(leaf))
      .when(leaf % 3 === 1, concat(s(leaf % 7), lit(" > "), s(leaf)))
      .otherwise(concat(s(leaf % 7), lit(" > "), s(leaf % 11 + 100),
        lit(" > "), s(leaf)))
    val catUrl = concat(lit("https://tiki.vn/slug-"), s(leaf), lit("/c"), s(leaf))
    writeRawSnapshots(spark, dir, base, path, catUrl)

    // DAG 1: tiki_dag builds fact_daily_snapshot + dim_products +
    // dim_categories in the warehouse
    TikiDailyPipeline.run(spark, s"$base/raw", wh, Date)

    // DAG 3 (fx_rate_dag): the day's validated rate lands in
    // dim_exchange_rate through the real pipeline entry
    graft.pipelines.FxPipeline.run(spark, Some(25432.5), Date,
      s"$wh/dim_exchange_rate")

    // fact_google_trends: deterministic per-keyword scores for the day
    // (trends_dag's OUTPUT contract; the CSV→melt→merge path itself is
    // q104's gate)
    val cats = spark.range(10, 50).select(col("id").as("cat"))
    cats.filter(col("cat") % 5 =!= 2)
      .select(to_date(lit(Date)).as("date"),
        concat(lit("kw-"), col("cat").cast("string")).as("keyword"),
        (col("cat") * 3 + 7).as("score"),
        lit(false).as("is_partial"))
      .write.mode("overwrite").parquet(s"$wh/fact_google_trends")

    // dim_keyword_mapping: category → trend keyword, 1-in-4 inactive
    val keywordMap = cats.select(
      col("cat").as("tiki_category_id"),
      concat(lit("kw-"), col("cat").cast("string")).as("trend_keyword"),
      (col("cat") % 4 =!= 1).as("is_active"))

    // DAG 4: the analytics mart build + ASSERT gate
    val (_, quality) = graft.pipelines.AnalyticsPipeline.run(
      spark, wh, Date, keywordMap)
    val failed = quality.filter(col("passed") === false).count()
    require(failed == 0, s"analytics_dag quality gate failed $failed checks")

    CleanZone.read(spark, s"$wh/analytics_product_market_daily")
      .select(col("date"), col("product_id"), col("product_name"),
        col("category_name"), col("price_vnd_real"), col("price_vnd_list"),
        col("discount_percentage"), col("price_usd_real"), col("fx_rate"),
        col("trend_keyword"), col("google_trend_score"),
        col("trend_signal_status"))
  }

  /** Independent replay of BOTH composed DAGs from `part`: winner-snapshot
    * parse arithmetic (q68's lesson), the leaf-keyed category slug, the
    * keyword/trends arm conditions, and the exact integer half-up USD
    * division (q02's formula) at rate 25432.50.
    */
  def q103Oracle: String =
    s"""WITH enr AS (
      |  SELECT p_partkey AS pk, (p_partkey % 40 + 10) AS leaf,
      |    (p_partkey % 800 + 150) * 1000 AS current_price,
      |    (p_partkey % 700 + 250) * 1000 AS original_price,
      |    p_partkey % 80 AS discount_rate
      |  FROM part WHERE p_partkey % 97 <> 0
      |), arms AS (
      |  SELECT pk, leaf, current_price, original_price, discount_rate,
      |    CASE WHEN leaf % 4 <> 1 THEN 'kw-' || CAST(leaf AS VARCHAR) END AS trend_keyword,
      |    CASE WHEN leaf % 4 <> 1 AND leaf % 5 <> 2 THEN leaf * 3 + 7 END AS score
      |  FROM enr
      |)
      |SELECT DATE '$Date' AS date,
      |  CAST(pk AS VARCHAR) AS product_id,
      |  'Product ' || CAST(pk AS VARCHAR) AS product_name,
      |  'slug-' || CAST(leaf AS VARCHAR) AS category_name,
      |  CAST(current_price AS DOUBLE) AS price_vnd_real,
      |  CAST(original_price AS DOUBLE) AS price_vnd_list,
      |  CAST(discount_rate AS DOUBLE) AS discount_percentage,
      |  ((2 * 100 * (current_price * 100) + 2543250)
      |    // (2 * 2543250)) / 100.0 AS price_usd_real,
      |  CAST(25432.5 AS DOUBLE) AS fx_rate,
      |  trend_keyword,
      |  CAST(score AS BIGINT) AS google_trend_score,
      |  CASE WHEN trend_keyword IS NULL THEN 'Unmapped'
      |       WHEN score IS NULL THEN 'No Trend Data'
      |       ELSE 'Full Data' END AS trend_signal_status
      |FROM arms""".stripMargin

  private val q104Invocation = new AtomicInteger(0)

  /** q104: trends_dag end-to-end (ref dags/trends_dag.py:595-687: pytrends
    * wide CSV → melt → "<1"/null cleaning → dedup-aggregate → staging
    * MERGE on (date, keyword)) driven through
    * [[graft.pipelines.TrendsPipeline.run]] TWICE with overlapping date
    * windows — run 1 covers days 1-10, run 2 re-fetches days 8-14 with
    * shifted scores — so the staging MERGE's both arms execute: days 1-7
    * survive from run 1, days 8-14 take run 2's updates. Each CSV also
    * carries a duplicate all-"<1" row per date (the dedup-aggregate must
    * fold it away) and renders score 0 as the literal "<1" (the cleaning
    * rule's real input). The gated result is the merged table read back
    * from disk; the oracle recomputes every cell from the closed-form
    * score formula, picking the winning run per day.
    */
  def q104TrendsDag(spark: SparkSession, dir: String): DataFrame = {
    val inv = q104Invocation.incrementAndGet()
    val base = s"$scratch/q104_$inv"
    new java.io.File(base).mkdirs()
    val table = s"$base/fact_google_trends"

    val keywords = (0 until 12).map(k => s"kw$k")
    def score(run: Int, d: Int, k: Int): Int = (d * 7 + k * 13 + run * 3) % 100
    def cell(s: Int): String = if (s == 0) "<1" else s.toString
    def csv(run: Int, days: Range): String = {
      val header = ("date" +: keywords :+ "isPartial").mkString(",")
      val rows = days.flatMap { d =>
        val date = f"2024-03-$d%02d"
        val partial = run == 1 && d == 10 || run == 2 && d == 14
        val main = (date +: keywords.indices.map(k => cell(score(run, d, k)))
          :+ (if (partial) "True" else "False")).mkString(",")
        // duplicate fetch row for the same date: all "<1", never partial —
        // the groupBy(date, keyword).max dedup-aggregate must fold it away
        val dup = (date +: keywords.indices.map(_ => "<1") :+ "False").mkString(",")
        Seq(main, dup)
      }
      (header +: rows).mkString("\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base/run1.csv"), csv(1, 1 to 10))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base/run2.csv"), csv(2, 8 to 14))

    graft.pipelines.TrendsPipeline.run(spark, s"$base/run1.csv", table)
    graft.pipelines.TrendsPipeline.run(spark, s"$base/run2.csv", table)

    CleanZone.read(spark, table)
      .select(col("date"), col("keyword"), col("score"), col("is_partial"))
  }

  /** Closed-form replay: day < 8 keeps run 1's scores, day >= 8 takes run
    * 2's MERGE update; only run 2's day 14 stays partial (run 1's partial
    * day 10 is overwritten by run 2's complete re-fetch).
    */
  def q104Oracle: String =
    """SELECT DATE '2024-02-29' + CAST(d AS INTEGER) AS date,
      |  'kw' || CAST(k AS VARCHAR) AS keyword,
      |  CAST((d * 7 + k * 13 + (CASE WHEN d >= 8 THEN 2 ELSE 1 END) * 3) % 100
      |    AS BIGINT) AS score,
      |  (d = 14) AS is_partial
      |FROM range(1, 15) t(d), range(0, 12) u(k)""".stripMargin

  private val q105Invocation = new AtomicInteger(0)

  /** q105: fx_rate_dag end-to-end (ref dags/fx_rate_dag.py:74-129: one
    * validated daily rate row — fetched or fallback — MERGEd into
    * dim_exchange_rate) driven through [[graft.pipelines.FxPipeline.run]]
    * once per day for 14 days: every 4th day's fetch "fails" (rate=None →
    * FallbackRate, source='Fallback'), then day 5 RE-RUNS with a corrected
    * rate — the MERGE update arm on a composite (date, from, to) key. The
    * gated result is the accumulated dim read back from disk.
    */
  def q105FxRateDag(spark: SparkSession, dir: String): DataFrame = {
    val inv = q105Invocation.incrementAndGet()
    val table = s"$scratch/q105_$inv/dim_exchange_rate"
    (1 to 14).foreach { d =>
      val rate = if (d % 4 == 0) None else Some(25000.0 + d * 10 + 0.5)
      graft.pipelines.FxPipeline.run(spark, rate, f"2024-03-$d%02d", table)
    }
    // corrected re-fetch for day 5: MERGE must UPDATE, not duplicate
    graft.pipelines.FxPipeline.run(spark, Some(26001.25), "2024-03-05", table)
    CleanZone.read(spark, table)
      .select(col("date"), col("from_currency"), col("to_currency"),
        col("rate"), col("source"))
  }

  def q105Oracle: String =
    """SELECT DATE '2024-02-29' + CAST(d AS INTEGER) AS date,
      |  'USD' AS from_currency, 'VND' AS to_currency,
      |  CAST(CASE WHEN d = 5 THEN 26001.25
      |            WHEN d % 4 = 0 THEN 25400.0
      |            ELSE 25000 + d * 10 + 0.5 END AS DOUBLE) AS rate,
      |  CASE WHEN d % 4 = 0 THEN 'Fallback'
      |       ELSE 'open.er-api.com' END AS source
      |FROM range(1, 15) t(d)""".stripMargin

  private val q106Invocation = new AtomicInteger(0)

  /** q106: the streaming UPSERT sink (SURVEY 44) driven end-to-end through
    * the oracle gate, the q101 protocol applied to keep-latest state:
    * events split into 5 deterministic micro-batches (event_id % 5), each
    * pre-reduced to its per-user winner by (ts, event_id) — the
    * deterministic shape a CDC feed hands foreachBatch — then folded
    * through [[graft.streaming.UpsertSink.mergeBatch]]'s swap-write MERGE
    * into a running parquet mart, LATEST batch re-applied (foreachBatch's
    * retry surface) and no-opped by the applied-batch marker. Final state:
    * each user's row from the HIGHEST batch that saw them, that batch's
    * (ts, event_id) winner — i.e. argmax by (batch, ts, event_id), which
    * the DuckDB oracle replays with one window over raw events, having
    * never seen the batching or the merges.
    */
  def q106UpsertSink(spark: SparkSession, dir: String): DataFrame = {
    val inv = q106Invocation.incrementAndGet()
    val target = s"$scratch/q106_$inv/state"
    // null user_ids are excluded as a defined contract: a full-outer MERGE
    // never matches NULL=NULL, so each batch's null-key winner would INSERT
    // a fresh row while the oracle's window groups all NULLs into one —
    // the same null-key discipline as q03's dropNullKeys
    val ev = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
    val sink = graft.streaming.UpsertSink.mergeBatch(target, Seq("user_id")) _
    (0 to 4).foreach { b =>
      val batch = graft.operators.Dedup.latestByKey(
        ev.filter(col("event_id") % 5 === b),
        Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
      sink(batch, b.toLong)
    }
    // retry of the applied latest batch must no-op via the marker
    sink(graft.operators.Dedup.latestByKey(
      ev.filter(col("event_id") % 5 === 4),
      Seq("user_id"), Seq(col("ts").desc, col("event_id").desc)), 4L)
    CleanZone.read(spark, target)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("event_type"), col("value"))
  }

  def q106Oracle: String =
    """SELECT user_id, event_id, ts, event_type, value
      |FROM (SELECT user_id, event_id, ts, event_type, value,
      |        row_number() OVER (PARTITION BY user_id
      |          ORDER BY event_id % 5 DESC, ts DESC, event_id DESC) AS rn
      |      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL) t
      |WHERE rn = 1""".stripMargin

  private val q112Invocation = new AtomicInteger(0)

  /** q112: the BACKFILL DRIVER ([[graft.pipelines.Backfill]], SURVEY 63 —
    * the reference's Airflow catchup / retry / depends_on_past contract,
    * tiki_dag.py:18-33) driven through a failure-and-resume scenario and
    * oracle-gated — the last composed surface without a cross-engine check.
    *
    * Two execution dates run through all four DAGs (tiki → trends → fx →
    * analytics) over q103-style leaf-keyed raw snapshots (1/3 product
    * stratum so the daily raw zones stay q103-day-cheap). Run 1's FIRST
    * date points at a MISSING trends CSV: the trends task exhausts its
    * retries and fails, analytics for that date is skipped as
    * UpstreamFailed, and — `depends_on_past=False` — the LAST date still
    * completes. Run 2 re-invokes the same range with the corrected source:
    * success markers skip the six completed tasks, the two missing ones
    * execute, and the converged warehouse must equal a clean single pass —
    * which is exactly what the DuckDB oracle computes (the q103 replay
    * generalized over per-day fx rates and trend scores, never having seen
    * the failure, the retries, or the resume). Day 17's fx fetch also
    * "fails" (rate=None) so the fallback-rate arm is part of the gated
    * surface. (Was three dates; the plain no-failure-arm day was cut for
    * harness cost — r15 task #7 — every scenario arm is still driven.)
    */
  def q112Backfill(spark: SparkSession, dir: String): DataFrame = {
    val inv = q112Invocation.incrementAndGet()
    val base = s"$scratch/q112_$inv"
    val wh = s"$base/wh"
    new java.io.File(base).mkdirs()

    val pk = col("p_partkey")
    def s(c: Column): Column = c.cast("string")
    val leaf = pk % 40 + 10
    // q103's leaf-keyed derivation: dim rows are pure functions of the
    // category, so the oracle needs no dedup-tiebreak replay
    val path = when(leaf % 3 === 0, s(leaf))
      .when(leaf % 3 === 1, concat(s(leaf % 7), lit(" > "), s(leaf)))
      .otherwise(concat(s(leaf % 7), lit(" > "), s(leaf % 11 + 100),
        lit(" > "), s(leaf)))
    val catUrl = concat(lit("https://tiki.vn/slug-"), s(leaf), lit("/c"), s(leaf))
    val days = Seq(16, 17)
    def dateOf(d: Int) = f"2024-03-$d%02d"
    days.foreach(d => writeRawSnapshots(spark, dir, base, path, catUrl,
      dateOf(d), partFilter = pk % 3 === 0))

    // one wide CSV drop per date (trends_dag's pytrends fetch shape);
    // leaf % 5 == 2 keywords never appear -> the 'No Trend Data' arm
    val leaves = (10 until 50).filterNot(_ % 5 == 2)
    def score(d: Int, l: Int): Int = (d * 7 + l * 13) % 100
    def cell(v: Int): String = if (v == 0) "<1" else v.toString
    days.foreach { d =>
      val header = ("date" +: leaves.map(l => s"kw-$l") :+ "isPartial").mkString(",")
      val row = (dateOf(d) +: leaves.map(l => cell(score(d, l)))
        :+ "False").mkString(",")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$base/trends_$d.csv"), s"$header\n$row")
    }

    val cats = spark.range(10, 50).select(col("id").as("cat"))
    val keywordMap = cats.select(
      col("cat").as("tiki_category_id"),
      concat(lit("kw-"), col("cat").cast("string")).as("trend_keyword"),
      (col("cat") % 4 =!= 1).as("is_active"))

    def sources(broken: Boolean): String => graft.pipelines.Backfill.DaySources =
      date => {
        val d = date.takeRight(2).toInt
        graft.pipelines.Backfill.DaySources(
          trendsCsv = Some(
            if (broken && d == 16) s"$base/missing.csv" else s"$base/trends_$d.csv"),
          fxRate = if (d == 17) None else Some(25000.0 + d * 10 + 0.5))
      }
    val range = graft.pipelines.Backfill.dateRange(dateOf(days.head), dateOf(days.last))
    val cfg = graft.pipelines.Backfill.Config(s"$base/raw", wh, keywordMap,
      sources(broken = true))

    val r1 = graft.pipelines.Backfill.run(spark, cfg, range)
    val failed = r1.failures.map(t => (t.date, t.task)).toSet
    require(failed == Set((dateOf(16), "trends"), (dateOf(16), "analytics")),
      s"unexpected run-1 failure surface: $failed")

    // resume: corrected source; markers skip the ten completed tasks
    val r2 = graft.pipelines.Backfill.run(spark,
      cfg.copy(sources = sources(broken = false)), range)
    require(r2.ok, s"resume left failures: ${r2.failures}")
    val skipped = r2.runs.count(_.status == graft.pipelines.Backfill.AlreadyComplete)
    require(skipped == 6, s"expected 6 marker-skipped tasks on resume, got $skipped")

    CleanZone.read(spark, s"$wh/analytics_product_market_daily")
      .select(col("date"), col("product_id"), col("product_name"),
        col("category_name"), col("price_vnd_real"), col("price_vnd_list"),
        col("discount_percentage"), col("price_usd_real"), col("fx_rate"),
        col("trend_keyword"), col("google_trend_score"),
        col("trend_signal_status"))
  }

  /** The q103 replay generalized over the three execution dates: per-day
    * fx rate (fallback on day 17), per-day trend scores, same parse
    * arithmetic and exact integer half-up USD division.
    */
  def q112Oracle: String =
    """WITH days AS (
      |  SELECT d, CASE WHEN d = 17 THEN 2540000
      |                 ELSE 2500050 + d * 1000 END AS r100
      |  FROM (VALUES (16), (17)) t(d)
      |), enr AS (
      |  SELECT p_partkey AS pk, (p_partkey % 40 + 10) AS leaf,
      |    (p_partkey % 800 + 150) * 1000 AS current_price,
      |    (p_partkey % 700 + 250) * 1000 AS original_price,
      |    p_partkey % 80 AS discount_rate
      |  FROM part WHERE p_partkey % 97 <> 0 AND p_partkey % 3 = 0
      |), arms AS (
      |  SELECT dd.d, dd.r100, pk, leaf, current_price, original_price, discount_rate,
      |    CASE WHEN leaf % 4 <> 1 THEN 'kw-' || CAST(leaf AS VARCHAR) END AS trend_keyword,
      |    CASE WHEN leaf % 4 <> 1 AND leaf % 5 <> 2
      |         THEN (dd.d * 7 + leaf * 13) % 100 END AS score
      |  FROM enr, days dd
      |)
      |SELECT make_date(2024, 3, d) AS date,
      |  CAST(pk AS VARCHAR) AS product_id,
      |  'Product ' || CAST(pk AS VARCHAR) AS product_name,
      |  'slug-' || CAST(leaf AS VARCHAR) AS category_name,
      |  CAST(current_price AS DOUBLE) AS price_vnd_real,
      |  CAST(original_price AS DOUBLE) AS price_vnd_list,
      |  CAST(discount_rate AS DOUBLE) AS discount_percentage,
      |  ((2 * 100 * (current_price * 100) + r100)
      |    // (2 * r100)) / 100.0 AS price_usd_real,
      |  CAST(r100 AS DOUBLE) / 100.0 AS fx_rate,
      |  trend_keyword,
      |  CAST(score AS BIGINT) AS google_trend_score,
      |  CASE WHEN trend_keyword IS NULL THEN 'Unmapped'
      |       WHEN score IS NULL THEN 'No Trend Data'
      |       ELSE 'Full Data' END AS trend_signal_status
      |FROM arms""".stripMargin

  private val q164Invocation = new AtomicInteger(0)

  /** q164: DSv2 WRITE round-trip — the connector's write tier
    * (`SupportsWrite` with a two-phase staged-commit protocol: tasks
    * stream to hidden attempt-unique staging files, task commit messages
    * name them, job commit publishes exactly the committed set by
    * rename). The gate writes the documents table through the connector
    * (truncating overwrite) and reads it back through the connector's
    * own scan; the oracle is the identity — a round-trip that drops,
    * duplicates, mangles or re-types ANY row/field hash-mismatches.
    * Unicode, embedded newlines and nulls all ride JSON escaping.
    * See [[graft.sources.dsv2.RawJsonSource]].
    */
  def q164Dsv2Roundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val inv = q164Invocation.incrementAndGet()
    val base = s"$scratch/q164_$inv/docs"
    // integral widths drift across corpus generators (the 100× probe
    // corpus carries n_chars as INT) — normalize to the connector's
    // long grain, the Tables.events layout-normalization discipline
    Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars").cast("long").as("n_chars"))
      .write.format("graft.sources.dsv2.RawJsonSource")
      .mode("overwrite").option("path", base).save()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.read.format("graft.sources.dsv2.RawJsonSource")
      .schema(schema).option("path", base).load()
  }

  def q164Oracle: String =
    "SELECT doc_id, text, lang, source, n_chars FROM documents"

  private val q169Invocation = new AtomicInteger(0)

  /** q169: DSv2 STREAMING read
    * ([[graft.sources.dsv2.RawJsonSource]] via `MICRO_BATCH_READ` — the
    * crawler-tail continuous-ingest tier above q99's batch read): crawl
    * chunks land in FOUR separate file drops into a watched raw zone,
    * and a running `readStream` over the connector consumes each drop
    * as its own micro-batch with FILE-GRANULAR offsets (an offset is
    * the sorted visible-file list; a batch reads exactly end \ start,
    * so a file is read exactly once however the drops interleave).
    * q99's deterministic crawler-shaped generator (corrupt every ~101st
    * line, skipped at source), partitioned `p_partkey % 4` across the
    * drops — the streamed union must equal the one-shot batch read, so
    * the oracle IS q99's aggregate over the full table: a dropped file,
    * a re-read file, or an offset slip diverges the count/sum. Offset
    * serialization, restart replay and hidden-file invisibility are
    * spec-pinned (RawJsonStreamSpec).
    *
    * Exactly-once holds END TO END here because both tiers hold their
    * half: the read tier replays a batch as exactly the same file set
    * (the offset log), and the sink is IDEMPOTENT — each micro-batch
    * overwrites its own batchId-keyed partition dir, so a retried batch
    * replaces itself instead of double-appending (foreachBatch alone is
    * at-least-once; a plain `mode("append")` would duplicate rows on
    * retry).
    */
  def q169Dsv2Stream(spark: SparkSession, dir: String): DataFrame = {
    val inv = q169Invocation.incrementAndGet()
    val base = s"$scratch/q169_$inv/raw"
    val out = s"$scratch/q169_$inv/rows"
    val ckpt = s"$scratch/q169_$inv/ckpt"
    val pk = col("p_partkey")
    def s(c: Column): Column = c.cast("string")
    val line = when(pk % 101 === 0, lit("{broken"))
      .otherwise(concat(lit("{\"product_id\": "), s(pk),
        lit(", \"price\": "), s((pk % 800 + 150) * 1000),
        lit(", \"brand\": \"Brand "), s(pk % 50),
        lit("\", \"active\": "), s(pk % 3 === 0), lit("}")))
    val src = Tables.part(spark, dir).select(pk.as("pk"), line.as("value"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("product_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("price",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("brand",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("active",
        org.apache.spark.sql.types.BooleanType)))
    val q = spark.readStream.format("graft.sources.dsv2.RawJsonSource")
      .schema(schema).option("path", base).load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        // idempotent: a retried batch OVERWRITES its own partition dir
        df.write.mode("overwrite").parquet(s"$out/batch=$batchId"); ()
      }
      .start()
    try {
      (0 until 4).foreach { b =>
        src.filter(col("pk") % 4 === b).select(col("value"))
          .coalesce(2).write.mode("overwrite").text(s"$base/chunk_$b")
        q.processAllAvailable() // drain exactly this drop's micro-batch
      }
    } finally q.stop()
    spark.read.parquet(out)
      .filter(col("price") > 200000L && col("active") === true)
      .groupBy(col("brand"))
      .agg(count(lit(1)).as("n_rows"), sum(col("price")).as("total_price"))
  }

  /** The streamed union must equal the batch read — q99's oracle. */
  def q169Oracle: String = q99Oracle
}
