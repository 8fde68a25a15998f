package graft

import graft.queries.CoreQueries

class CoreQueriesSpec extends SparkSpec {

  test("q01 pricing summary: grouped by flag/status with deterministic decimal sums") {
    val rows = CoreQueries.q01PricingSummary(spark, sf("0.001")).collect()
    assert(rows.nonEmpty && rows.length <= 8)
    val byKey = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(byKey.size == rows.length, "one row per (returnflag, linestatus)")
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
      assert(r.getAs[Long]("in_stock_count") <= r.getAs[Long]("count_order"))
    }
  }

  test("q02 golden join: one output row per lineitem, all CASE arms exercised") {
    val df = CoreQueries.q02GoldenJoin(spark, sf("0.001"))
    val lineCount = Tables.lineitem(spark, sf("0.001")).count()
    assert(df.count() == lineCount, "LEFT joins must not drop or duplicate fact rows")
    val statuses = df.select("trend_signal_status").distinct().collect()
      .map(_.getString(0)).toSet
    assert(statuses.subsetOf(Set("Unmapped", "No Trend Data", "Full Data")))
    assert(statuses.contains("Unmapped"))
    assert(statuses.contains("Full Data"))
    assert(df.filter(org.apache.spark.sql.functions.col("fx_rate").isNull).count() == 0,
      "fx_rate always present via fallback")
  }
}
