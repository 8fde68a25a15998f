package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("pearson is exactly ±1 on perfectly linear data and ~0 on designed-orthogonal data") {
    val linear = (1 to 1000).map(i => (i.toLong, 3L * i + 7)).toDF("x", "y")
    assert(Stats.pearson(linear, col("x"), col("y")).head.getDouble(1) === 1.0)
    val anti = (1 to 1000).map(i => (i.toLong, -2L * i)).toDF("x", "y")
    assert(Stats.pearson(anti, col("x"), col("y")).head.getDouble(1) === -1.0)
    // x symmetric around 0, y = x² -> exactly zero covariance
    val orth = (-100 to 100).map(i => (i.toLong, (i.toLong * i))).toDF("x", "y")
    assert(math.abs(Stats.pearson(orth, col("x"), col("y")).head.getDouble(1)) < 1e-12)
  }

  test("pearson excludes pairwise nulls and is partition-order independent") {
    val df = Seq((Some(1L), Some(10L)), (Some(2L), None),
      (None, Some(30L)), (Some(3L), Some(30L))).toDF("x", "y")
    val r1 = Stats.pearson(df, col("x"), col("y")).head
    assert(r1.getLong(0) === 2L, "only fully-present pairs count")
    // exact moments make the result identical under any partitioning
    val big = (1 to 5000).map(i => (i.toLong, (i % 37).toLong)).toDF("x", "y")
    val a = Stats.pearson(big.repartition(3), col("x"), col("y")).head.getDouble(1)
    val b = Stats.pearson(big.repartition(31), col("x"), col("y")).head.getDouble(1)
    assert(java.lang.Double.doubleToLongBits(a) === java.lang.Double.doubleToLongBits(b),
      "decimal-exact moments must make the double readout bitwise stable")
  }
}
