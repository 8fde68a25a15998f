package graft

import org.apache.spark.sql.functions.col

import graft.operators.dedup.TextShingles

class ShingleHashSpec extends SparkSpec {

  test("native ShingleHash equals the composed-builtins pipeline on the corpus") {
    val d = Tables.documents(spark, sf("0.001"))
    val both = d.select(
      TextShingles.shingleHashes(col("text")).as("native"),
      TextShingles.shingleHashesBuiltins(col("text")).as("builtins"))
    val mismatches = both.filter(col("native") =!= col("builtins")).count()
    assert(mismatches == 0)
  }

  test("short and whitespace-heavy texts hash consistently") {
    import spark.implicits._
    val df = Seq("one two", "  padded   text with   runs  ", "a b c d")
      .toDF("text")
    val out = df.select(
      TextShingles.shingleHashes(col("text")).as("native"),
      TextShingles.shingleHashesBuiltins(col("text")).as("builtins"))
    assert(out.filter(col("native") =!= col("builtins")).count() == 0)
  }
}
