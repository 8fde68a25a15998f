package graft

import org.apache.spark.sql.functions._

import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed and drops unchanged rows") {
    val before = Seq((1L, 10, "a"), (2L, 20, "b"), (3L, 30, "c"))
      .toDF("k", "n", "tag")
    val after = Seq((2L, 20, "b"), (3L, 31, "c"), (4L, 40, "d"))
      .toDF("k", "n", "tag")
    val out = SnapshotDiff.diff(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 3L -> "changed", 4L -> "added"),
      s"row 2 is unchanged and must not appear; got $out")
  }

  test("null transitions: null->value and value->null are changes, null->null is not") {
    val before = Seq((1L, Option(5)), (2L, Option.empty[Int]), (3L, Option.empty[Int]))
      .toDF("k", "v")
    val after = Seq((1L, Option.empty[Int]), (2L, Option(7)), (3L, Option.empty[Int]))
      .toDF("k", "v")
    val out = SnapshotDiff.diff(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "changed", 2L -> "changed"),
      s"null<=>null must be unchanged; got $out")
  }

  test("before/after values are carried on every change row") {
    val before = Seq((1L, 10)).toDF("k", "n")
    val after = Seq((1L, 11)).toDF("k", "n")
    val row = SnapshotDiff.diff(before, after, Seq("k")).head
    assert(row.getAs[Int]("before_n") == 10 && row.getAs[Int]("after_n") == 11)
    // added rows have null before_*; removed rows null after_*
    val added = SnapshotDiff.diff(before.limit(0), after, Seq("k")).head
    assert(added.getAs[Any]("before_n") == null && added.getAs[Int]("after_n") == 11)
  }

  test("schema mismatch, keyless calls, and emitted-name collisions are refused") {
    val a = Seq((1L, 1)).toDF("k", "n")
    val b = Seq((1L, 1)).toDF("k", "m")
    intercept[IllegalArgumentException] { SnapshotDiff.diff(a, b, Seq("k")) }
    intercept[IllegalArgumentException] { SnapshotDiff.diff(a, a, Nil) }
    val clash = Seq((1L, "x")).toDF("change_type", "n")
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(clash, clash, Seq("change_type"))
    }
    val prefixClash = Seq((1L, 1, 2)).toDF("k", "n", "before_n")
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(prefixClash, prefixClash, Seq("k"))
    }
  }
}
