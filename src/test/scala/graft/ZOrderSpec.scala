package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("key interleaves bits bijectively on a full small grid") {
    val grid = for { a <- 0 until 16; b <- 0 until 16 } yield (a.toLong, b.toLong)
    val out = grid.toDF("a", "b")
      .withColumn("z", ZOrder.key(col("a"), col("b"), bits = 4))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.values.toSet.size === grid.size, "z-keys must be distinct (bijective)")
    // spot-check the interleave definition: a=0b11, b=0b01 -> z=0b0111
    assert(out((3L, 1L)) === 7L)
    assert(out((0L, 1L)) === 2L, "b's bit 0 lands at position 1")
    assert(out((15L, 15L)) === 255L)
  }

  test("layoutBy clusters both dimensions: each partition covers a small rectangle") {
    val rnd = new scala.util.Random(3)
    val pts = (1 to 20000).map(_ => (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("a", "b")
    val parts = ZOrder.layoutBy(pts, col("a"), col("b"), bits = 10, partitions = 16)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("a") - min("a")).as("spanA"), (max("b") - min("b")).as("spanB"))
      .collect()
    val avgA = parts.map(_.getLong(1)).sum.toDouble / parts.length
    val avgB = parts.map(_.getLong(2)).sum.toDouble / parts.length
    // a single-column sort would give spanB ~ 1023 (unclustered); z-order
    // bounds BOTH dims well below the global range
    assert(avgA < 700, s"avg a-span $avgA not clustered")
    assert(avgB < 700, s"avg b-span $avgB not clustered")
  }

  test("out-of-range inputs raise instead of silently truncating") {
    val df = Seq((1L << 22, 1L)).toDF("a", "b")
    val e = intercept[Exception] {
      df.withColumn("z", ZOrder.key(col("a"), col("b"), bits = 22)).collect()
    }
    assert(e.getMessage.contains("zorder input"), s"got: ${e.getMessage}")
    intercept[IllegalArgumentException] { ZOrder.key(lit(1), lit(1), bits = 0) }
  }
}
