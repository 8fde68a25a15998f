package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantiles

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("exactDiscrete matches the sorted-array definition on a known distribution") {
    // values 1..100 once each: q-th quantile = ceil(q*100)
    val df = (1 to 100).toDF("v")
    val out = Quantiles.exactDiscrete(df, col("v"),
        Seq(0.01, 0.5, 0.9, 0.99, 1.0), partitions = 7)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(out == Map(0.01 -> 1L, 0.5 -> 50L, 0.9 -> 90L, 0.99 -> 99L, 1.0 -> 100L))
  }

  test("exactDiscrete handles heavy duplication and skew across partitions") {
    // 9000 copies of 5, 999 of 7, 1 of 100 => p50=5, p99=7, p1.0=100
    val df = (Seq.fill(9000)(5) ++ Seq.fill(999)(7) ++ Seq(100)).toDF("v")
    val out = Quantiles.exactDiscrete(df, col("v"), Seq(0.5, 0.99, 1.0),
        partitions = 5)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(out == Map(0.5 -> 5L, 0.99 -> 7L, 1.0 -> 100L))
  }

  test("exactDiscrete agrees with a brute-force sort at every percentile") {
    val rnd = new scala.util.Random(11)
    val data = (1 to 5000).map(_ => rnd.nextInt(300).toLong)
    val sorted = data.sorted
    val qs = (1 to 100).map(_ / 100.0)
    val out = Quantiles.exactDiscrete(data.toDF("v"), col("v"), qs, partitions = 13)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    qs.foreach { q =>
      val expected = sorted(math.ceil(q * data.size).toInt - 1)
      assert(out(q) == expected, s"q=$q: ${out(q)} != $expected")
    }
  }

  test("exactDiscretePerGroup: each group gets its own independent quantiles") {
    val df = ((1 to 100).map(v => ("a", v)) ++ Seq(("b", 7), ("b", 9)))
      .toDF("g", "v")
    val out = Quantiles.exactDiscretePerGroup(df, "g", col("v"), Seq(0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("a", 0.5) -> 50L, ("a", 1.0) -> 100L,
      ("b", 0.5) -> 7L, ("b", 1.0) -> 9L))
  }

  test("nulls are excluded; invalid quantiles are refused") {
    val df = Seq(Some(1L), None, Some(3L)).toDF("v")
    val out = Quantiles.exactDiscrete(df, col("v"), Seq(1.0))
      .head.getLong(1)
    assert(out == 3L)
    intercept[IllegalArgumentException] {
      Quantiles.exactDiscrete(df, col("v"), Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      Quantiles.exactDiscrete(df, col("v"), Nil)
    }
  }
}
