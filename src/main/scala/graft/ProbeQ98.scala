package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Dev tool: phase-split timing for the q98 partition-pruned MERGE probe
  * (`ProbeQ98 <sfDir>`). BENCH_SF10's single q98 number lumped three very
  * different costs — materializing the full partitioned TARGET (the
  * harness: scales with the table, unavoidable, not the operator), the
  * pruned MERGE itself (the operator under test: scales with the touched
  * partition only), and the read-back aggregation (the gate) — which made
  * the 100× ratio read as a plan problem. This prints them separately as
  * one JSON line:
  * `{"metric":"q98_probe","sf":...,"target_write_sec":...,"merge_sec":...,
  *   "readback_agg_sec":...}`.
  */
object ProbeQ98 {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_probe_q98_${ProcessHandle.current().pid()}/orders_by_year"

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // phase 1 — harness: materialize the partitioned target (table-sized)
    val o = Tables.orders(spark, sfDir)
    val target = o.select(col("o_orderkey"),
      year(col("o_orderdate")).as("o_year"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("total_price"),
      col("o_orderstatus").as("status"))
    val (_, tWrite) = timed {
      target.write.mode("overwrite").partitionBy("o_year").parquet(base)
    }

    // delta derivation as q98 (latest-year updates + inserts) — but read
    // from the freshly WRITTEN partitioned target, so the delta's lineage
    // is partition-pruned to the one touched year, and MATERIALIZED before
    // the timer starts: leaving it lazy would re-run table-sized scans
    // inside the merge timing and re-create the cost mis-attribution this
    // probe exists to remove
    val written = spark.read.parquet(base)
    val maxYear = written.agg(max(col("o_year"))).head.getInt(0)
    val latest = written.filter(col("o_year") === maxYear)
    val updates = latest.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_year"),
        (col("total_price") + lit(new java.math.BigDecimal("1.00")))
          .cast(DecimalType(18, 2)).as("total_price"),
        lit("U").as("status"))
    val inserts = latest.filter(col("o_orderkey") % 7 === 0)
      .select((col("o_orderkey") + 1000000000000000L).as("o_orderkey"),
        col("o_year"), col("total_price"), lit("N").as("status"))
    val delta = updates.unionByName(inserts).cache()
    delta.count() // materialize outside the timed window

    // phase 2 — the operator under test: pruned merge (touched-partition-
    // sized; this is the number the 100x ratio should grade)
    // (mergePruned pins and unpersists the same cache entry internally,
    // so no unpersist here — the pre-materialization above is what matters)
    val (_, tMerge) = timed {
      graft.operators.Upsert.mergePruned(base, delta,
        keys = Seq("o_orderkey"), partitionCol = "o_year")
    }

    // phase 3 — the gate: read back + aggregate (table-sized scan)
    val (_, tAgg) = timed {
      graft.sources.CleanZone.read(spark, base)
        .groupBy(col("o_year"), col("status"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("total_price")).cast(DoubleType).as("total"))
        .write.format("noop").mode("overwrite").save()
    }

    println(f"""{"metric":"q98_probe","sf":"$sfDir","target_write_sec":$tWrite%.2f,"merge_sec":$tMerge%.2f,"readback_agg_sec":$tAgg%.2f}""")
    spark.stop()
  }
}
