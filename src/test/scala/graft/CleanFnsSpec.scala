package graft

import org.apache.spark.sql.functions.col
import graft.functions.CleanFns

/** Mirrors the reference's own unit coverage
  * (TikiTransform/tests/test_transform_logic.py).
  */
class CleanFnsSpec extends SparkSpec {
  import spark.implicits._

  private def run(values: Seq[String], fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Any] =
    values.toDF("v").select(fn(col("v")).as("r")).collect().map(r => if (r.isNullAt(0)) null else r.get(0)).toSeq

  test("parseSalesVolume: Vietnamese formats") {
    val in = Seq("Đã bán 1.5k", "Đã bán 100", "Đã bán 2tr", "Đã bán 1,5k",
      "Đã bán 10.000", "Đã bán 2.5tr", "bán 3 triệu", "Đã bán 1m", null, "", "no numbers")
    val out = run(in, CleanFns.parseSalesVolume _)
    assert(out == Seq(1500L, 100L, 2000000L, 1500L, 10000L, 2500000L, 3000000L, 1000000L, 0L, 0L, 0L))
  }

  test("parseSalesVolume: reference edge cases (test_transform_logic.py)") {
    // uppercase K, suffix text after/before the number, surrounding padding
    val in = Seq("Đã bán 1.2K", "1.5k sold", "sold 500", "  Đã bán 200  ",
      "Đã bán 2,5k", "Đã bán 1")
    assert(run(in, CleanFns.parseSalesVolume _) ==
      Seq(1200L, 1500L, 500L, 200L, 2500L, 1L))
  }

  test("parseDiscountRate: percent strings") {
    val in = Seq("-41%", "41%", "-25", null, "", "abc")
    assert(run(in, CleanFns.parseDiscountRate _) == Seq(41, 41, 25, 0, 0, 0))
  }

  test("cleanPrice: thousand separators and currency symbols") {
    val in = Seq("1.000.000 VND", "1.000.000", "250.000đ", "123456", "12.5", null, "", "abc")
    assert(run(in, CleanFns.cleanPrice _) == Seq(1000000L, 1000000L, 250000L, 123456L, 12L, null, null, null))
  }

  test("cleanPrice: reference edge cases — comma separators, $ prefix, N/A") {
    val in = Seq("1,000,000", "$1000", "N/A")
    assert(run(in, CleanFns.cleanPrice _) == Seq(1000000L, 1000L, null))
  }

  test("extractCategoryId: first /c match wins; bare paths parse") {
    val in = Seq("/c123/subcategory/c456", "/c9999",
      "https://tiki.vn/category/c1234?sort=price&order=asc")
    assert(run(in, CleanFns.extractCategoryId _) == Seq(123L, 9999L, 1234L))
  }

  test("extractCategoryId / extractUrlKey") {
    val in = Seq("https://tiki.vn/dien-thoai-may-tinh-bang/c1789",
      "https://tiki.vn/x/c1789?page=2", "https://tiki.vn/no-cat", null)
    assert(run(in, CleanFns.extractCategoryId _) == Seq(1789L, 1789L, null, null))
    assert(run(in, CleanFns.extractUrlKey _) == Seq("dien-thoai-may-tinh-bang", "x", null, null))
  }

  test("categoryPath leaf/root/depth") {
    val in = Seq("1815 > 28670 > 12296 > 4593", "1789", null, "")
    assert(run(in, CleanFns.categoryLeaf _) == Seq(4593L, 1789L, null, null))
    assert(run(in, CleanFns.categoryRoot _) == Seq(1815L, 1789L, null, null))
    assert(run(in, CleanFns.categoryDepth _) == Seq(4, 1, 0, 0))
  }

  test("toSnapshotDate") {
    val in = Seq("2026-01-18T16:49:55.805Z", "2026-01-18T16:49:55", "garbage", null)
    val out = run(in, CleanFns.toSnapshotDate _).map(v => if (v == null) null else v.toString)
    assert(out == Seq("2026-01-18", "2026-01-18", null, null))
  }

  test("toSnapshotDate: timezone offsets keep the written date; slashes rejected") {
    val in = Seq("2026-01-22T08:00:00+07:00", "2026/01/21")
    val out = run(in, CleanFns.toSnapshotDate _).map(v => if (v == null) null else v.toString)
    assert(out == Seq("2026-01-22", null))
  }
}
