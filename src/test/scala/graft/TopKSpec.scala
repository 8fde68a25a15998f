package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, TopK}

class TopKSpec extends SparkSpec {

  test("partial-agg top-k equals the window formulation on real data") {
    val base = Tables.lineitem(spark, sf("0.001"))
      .select(col("l_partkey"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("uid"),
        col("l_extendedprice"))
    val windowed = Analytics.topNPerGroup(base, Seq("l_partkey"),
        Seq(col("l_extendedprice").desc, col("uid").asc), n = 3)
      .select("l_partkey", "uid", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val agged = TopK.perGroup(base, Seq("l_partkey"), "l_extendedprice", "uid", k = 3)
      .select("l_partkey", "uid", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(agged == windowed)
  }

  test("null and NaN sort values order exactly like the window desc formulation") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, Some(5.0)), ("a", 2L, None), ("a", 3L, Some(Double.NaN)),
      ("a", 4L, Some(7.0)), ("b", 5L, None), ("b", 6L, None))
      .toDF("g", "id", "v")
    val windowed = Analytics.topNPerGroup(df, Seq("g"),
        Seq(col("v").desc, col("id").asc), n = 2)
      .select("g", "id", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val agged = TopK.perGroup(df, Seq("g"), "v", "id", k = 2)
      .select("g", "id", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(agged == windowed)
    // Spark desc: NaN greatest, nulls last => a: (NaN id=3, 7.0 id=4)
    assert(agged == Set(("a", 3L, 1), ("a", 4L, 2), ("b", 5L, 1), ("b", 6L, 2)))
  }

  test("signed zero ties break by id, matching Spark SQL ordering") {
    import spark.implicits._
    val df = Seq(("a", 10L, 0.0), ("a", 1L, -0.0)).toDF("g", "id", "v")
    val top1 = TopK.perGroup(df, Seq("g"), "v", "id", k = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // Spark treats -0.0 == 0.0: the tie must break by id asc => id=1
    assert(top1 == Set(("a", 1L)))
  }

  test("non-atomic group column types are rejected, not silently mis-keyed") {
    import spark.implicits._
    val df = Seq((Array[Byte](1, 2), 1L, 1.0)).toDF("g", "id", "v")
    intercept[IllegalArgumentException] {
      TopK.perGroup(df, Seq("g"), "v", "id", k = 1)
    }
  }

  test("null group keys stay distinct from the literal string \"null\"") {
    import spark.implicits._
    val df = Seq((Option.empty[String], 1L, 1.0), (Some("null"), 2L, 2.0))
      .toDF("g", "id", "v")
    val out = TopK.perGroup(df, Seq("g"), "v", "id", k = 1)
    assert(out.count() == 2, "null key and \"null\" key are different groups")
  }

  test("top-k handles groups smaller than k and k=1") {
    import spark.implicits._
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 9.0), ("b", 3L, 1.0))
      .toDF("g", "id", "v")
    val top1 = TopK.perGroup(df, Seq("g"), "v", "id", k = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(top1 == Set(("a", 2L), ("b", 3L)))
    val top5 = TopK.perGroup(df, Seq("g"), "v", "id", k = 5)
    assert(top5.count() == 3)
  }
}
