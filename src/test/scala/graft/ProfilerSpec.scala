package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiler

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile reports rows/nulls/distinct/min/max per column in one pass") {
    val df = Seq(
      (1L, Option("b"), Option(10)),
      (2L, Option("a"), Option(10)),
      (3L, Option.empty[String], Option.empty[Int]))
      .toDF("id", "s", "n")
    val out = Profiler.profile(df, Seq("id", "s", "n"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(out("id") == (3L, 0L, 3L, "1", "3"))
    assert(out("s") == (3L, 1L, 2L, "a", "b"))
    assert(out("n") == (3L, 1L, 1L, "10", "10"),
      "min/max must use native ordering before string rendering")
  }

  test("unknown columns and empty column lists are refused; all-null column profiles sanely") {
    val df = Seq((1L, Option.empty[String])).toDF("id", "s")
    intercept[IllegalArgumentException] { Profiler.profile(df, Seq("nope")) }
    intercept[IllegalArgumentException] { Profiler.profile(df, Nil) }
    val row = Profiler.profile(df, Seq("s")).head
    assert(row.getLong(2) == 1L && row.getLong(3) == 0L && row.getString(4) == null)
  }
}
