package graft

import org.apache.spark.sql.functions._

import graft.operators.HllSketch

class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimate lands within HLL's expected error band on a known cardinality") {
    // m=256 -> standard error 1.04/sqrt(256) = 6.5%; assert within 4 sigma
    val n = 20000
    val df = (1 to n).map(i => s"user-$i").toDF("uid")
    val est = HllSketch.estimate(HllSketch.registers(df, col("uid")))
      .head.getDouble(0)
    assert(math.abs(est - n) / n < 0.26, s"estimate $est too far from $n")
  }

  test("sketches merge by register-wise max: sketch(A ∪ B) == merge(sketch(A), sketch(B))") {
    val a = (1 to 5000).map(i => s"k$i").toDF("v")
    val b = (3000 to 8000).map(i => s"k$i").toDF("v") // overlapping range
    val direct = HllSketch.registers(a.unionByName(b), col("v"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val merged = HllSketch.merge(
        HllSketch.registers(a, col("v")), HllSketch.registers(b, col("v")))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(direct === merged)
  }

  test("all M buckets always present; nulls ignored; duplicates don't move registers") {
    val df = Seq(Some("x"), Some("y"), None, Some("x")).toDF("v")
    val regs = HllSketch.registers(df, col("v"))
    assert(regs.count() === HllSketch.M)
    val dupFree = HllSketch.registers(Seq("x", "y").toDF("v"), col("v"))
    assert(regs.collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq ===
      dupFree.collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq,
      "HLL must be insensitive to duplicates and nulls")
  }
}
