package graft

import org.apache.spark.sql.functions._

import graft.operators.CountMinSketch

class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._

  test("point estimates never undercount and are exact for dominant keys") {
    val data = (Seq.fill(500)("whale") ++ (1 to 2000).map(i => s"minnow-$i"))
      .toDF("v")
    val cms = CountMinSketch.sketch(data, col("v"))
    val queries = Seq("whale", "minnow-7", "absent").toDF("q")
    val est = CountMinSketch.estimate(cms, queries, col("q"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("whale") >= 500L && est("whale") <= 500L + 2000L / 1024 * 4 + 8,
      s"whale estimate ${est("whale")} out of band")
    assert(est("minnow-7") >= 1L)
    assert(est("absent") >= 0L, "absent keys may collide but never go negative")
    // the defining guarantee: est >= true for EVERY queried key
    assert(est("whale") >= 500L && est("minnow-7") >= 1L)
  }

  test("estimate treats missing cells of a SPARSE sketch as zero, not absent") {
    // a sparse state (e.g. streaming maintenance) omits untouched cells;
    // an absent key must read 0, never null or an inflated partial min
    val sparse = CountMinSketch.sketch(Seq("x").toDF("v"), col("v"))
      .filter(col("cnt") > 0)
    val est = CountMinSketch.estimate(sparse, Seq("x", "never-seen").toDF("q"), col("q"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("x") == 1L)
    assert(est("never-seen") == 0L, "absent keys read 0 against sparse sketches")
  }

  test("sketches merge by cell-wise sum: sketch(A ∪ B) == merge(sketch(A), sketch(B))") {
    val a = (1 to 1000).map(i => s"k${i % 50}").toDF("v")
    val b = (1 to 800).map(i => s"k${i % 30}").toDF("v")
    val direct = CountMinSketch.sketch(a.unionByName(b), col("v"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = CountMinSketch.merge(
        CountMinSketch.sketch(a, col("v")), CountMinSketch.sketch(b, col("v")))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(direct === merged)
  }

  test("matrix is always Depth×Width with total mass = Depth × non-null rows") {
    val data = Seq(Some("x"), Some("y"), None).toDF("v")
    val cms = CountMinSketch.sketch(data, col("v"))
    assert(cms.count() === CountMinSketch.Depth.toLong * CountMinSketch.Width)
    val mass = cms.agg(sum("cnt")).head.getLong(0)
    assert(mass === 2L * CountMinSketch.Depth, "each non-null value adds 1 per row")
  }
}
