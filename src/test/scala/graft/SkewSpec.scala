package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain-join result") {
    val big = Tables.lineitem(spark, sf("0.001"))
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
    val small = Tables.part(spark, sf("0.001")).select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = big.join(small, Seq("l_partkey")).count()
    val salted = Skew.saltedJoin(big, small, "l_partkey", buckets = 8,
      saltSource = Seq("l_orderkey", "l_linenumber"))
    assert(salted.count() == plain)
    // spot-check content equality on a sample key
    val k = big.select("l_partkey").head().getLong(0)
    val a = big.join(small, Seq("l_partkey")).filter(col("l_partkey") === k)
      .agg(sum("l_extendedprice")).head().getDouble(0)
    val b = salted.filter(col("l_partkey") === k)
      .agg(sum("l_extendedprice")).head().getDouble(0)
    assert(a == b)
  }

  test("salt is deterministic across evaluations") {
    val df = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val s1 = df.select(Skew.salt(16, col("a"), col("b"))).collect().map(_.getInt(0)).toSeq
    val s2 = df.select(Skew.salt(16, col("a"), col("b"))).collect().map(_.getInt(0)).toSeq
    assert(s1 == s2)
    assert(s1.forall(s => s >= 0 && s < 16))
  }
}
