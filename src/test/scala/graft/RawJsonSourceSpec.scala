package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}

/** DataSource V2 raw-JSON connector: pushdown reaches the source, pruning
  * shrinks the read schema, results agree with the built-in JSON reader.
  */
class RawJsonSourceSpec extends SparkSpec {

  private val schema = new StructType()
    .add("product_id", LongType).add("price", DoubleType).add("name", StringType)

  private def writeCorpus(): String = {
    val dir = Files.createTempDirectory("dsv2raw").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.json"),
      """{"product_id": 1, "price": 10.5, "name": "ao thun"}
        |{"product_id": 2, "price": 99.0, "name": "giay"}
        |{corrupt line}""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$dir/b.json"),
      """{"product_id": 3, "name": "mu"}
        |{"product_id": 4, "price": 5.0, "name": "tat"}""".stripMargin)
    dir
  }

  private def readV2(dir: String) =
    spark.read.format("graft.sources.dsv2.RawJsonSource")
      .schema(schema).option("path", dir).load()

  test("reads JSONL across files, skips corrupt lines, agrees with spark.read.json") {
    val dir = writeCorpus()
    val v2 = readV2(dir).collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getString(2))).toSet
    val builtin = spark.read.schema(schema).json(dir)
      .filter(col("product_id").isNotNull).collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getString(2))).toSet
    assert(v2 == builtin && v2.size == 4)
  }

  test("filters push into the source and appear in the plan; residuals re-checked") {
    val dir = writeCorpus()
    val q = readV2(dir).filter(col("price") > 6.0 && col("name").isNotNull)
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("graft-raw-json PushedFilters: ["), plan)
    assert(plan.contains("GreaterThan(price,6.0)"), plan)
    assert(plan.contains("IsNotNull(name)"), plan)
    assert(q.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("column pruning reaches the read schema") {
    val dir = writeCorpus()
    val q = readV2(dir).select("name")
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("ReadSchema: struct<name:string>"), plan)
    assert(q.collect().map(_.getString(0)).toSet == Set("ao thun", "giay", "mu", "tat"))
  }

  test("hidden dirs are skipped; big-long comparisons are exact at the source") {
    val dir = writeCorpus()
    // a crashed writer's _temporary attempt holds a valid JSON line that
    // must NOT surface as data
    new java.io.File(s"$dir/_temporary/0").mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$dir/_temporary/0/part.json"),
      """{"product_id": 999, "price": 1.0, "name": "ghost"}""")
    assert(readV2(dir).filter(col("name") === "ghost").count() == 0)
    // 2^53 + 1: a double round-trip would collapse it onto 2^53 and a
    // source-side drop could never be resurrected by the residual
    Files.writeString(java.nio.file.Paths.get(s"$dir/c.json"),
      """{"product_id": 9007199254740993, "name": "big"}""")
    val kept = readV2(dir).filter(col("product_id") > 9007199254740992L).collect()
    assert(kept.map(_.getString(2)).toSeq == Seq("big"))
  }

  test("source-side equality pushdown keeps only matching lines") {
    val dir = writeCorpus()
    val q = readV2(dir).filter(col("product_id") === 3L)
    val rows = q.collect()
    assert(rows.length == 1 && rows.head.getString(2) == "mu")
    // missing field (price for id=3) reads null and fails a pushed comparison
    assert(readV2(dir).filter(col("price") < 6.0).collect()
      .map(_.getLong(0)).toSeq == Seq(4L))
  }

  // ------------------ aggregate pushdown (q154's surface) ------------------

  private val aggSchema = new StructType()
    .add("product_id", LongType).add("price", LongType).add("name", StringType)

  private def writeAggCorpus(): String = {
    val dir = Files.createTempDirectory("dsv2agg").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.json"),
      """{"product_id": 1, "price": 10, "name": "x"}
        |{"product_id": 2, "price": 99, "name": "y"}
        |{"product_id": 3, "name": "x"}
        |{corrupt}""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$dir/b.json"),
      """{"product_id": 4, "price": 5, "name": "x"}
        |{"product_id": 5, "price": 7, "name": "y"}""".stripMargin)
    dir
  }

  private def readAgg(dir: String) =
    spark.read.format("graft.sources.dsv2.RawJsonSource")
      .schema(aggSchema).option("path", dir).load()

  private def planOf(q: org.apache.spark.sql.DataFrame) =
    q.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  test("grouped count/sum/min/max pushes into the source and merges correctly") {
    val dir = writeAggCorpus()
    val q = readAgg(dir).groupBy(col("name"))
      .agg(count(col("price")).as("n_priced"), sum(col("price")).as("total"),
        min(col("price")).as("lo"), max(col("price")).as("hi"))
    val plan = planOf(q)
    assert(plan.contains("PushedAggregation"), plan)
    // count excludes the null-price doc 3; sums/extremes span BOTH files
    // (the engine's final merge over per-file partials)
    val out = q.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == Map("x" -> ((2L, 15L, 5L, 10L)), "y" -> ((2L, 106L, 7L, 99L))))
  }

  test("pushed aggregation equals the unpushed plan on string extremes and count(*)") {
    val dir = writeAggCorpus()
    val q = readAgg(dir).groupBy(col("name"))
      .agg(count(lit(1)).as("n"), min(col("name")).as("lo"))
    // whether or not count(1) translates to CountStar in this engine
    // version, results must equal the built-in JSON reader's
    val builtin = spark.read.schema(aggSchema).json(dir)
      .filter(col("product_id").isNotNull)
      .groupBy(col("name")).agg(count(lit(1)).as("n"), min(col("name")).as("lo"))
    assert(q.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet ==
      builtin.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet)
  }

  test("declined shapes stay engine-side with identical results") {
    val dir = writeAggCorpus()
    // filtered: this source reports every filter residual, so no aggregate
    // may run below the residual check — pushdown must NOT fire
    val filtered = readAgg(dir).filter(col("price") > 6L)
      .groupBy(col("name")).agg(sum(col("price")).as("total"))
    assert(!planOf(filtered).contains("PushedAggregation"), planOf(filtered))
    assert(filtered.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("x", 10L), ("y", 106L)))
    // global aggregation (no groupBy): declined — zero partial rows over
    // an empty source would merge to NULL where SQL wants count = 0
    val global = readAgg(dir).agg(count(col("price")).as("n"))
    assert(!planOf(global).contains("PushedAggregation"), planOf(global))
    assert(global.collect().head.getLong(0) == 4L)
    // distinct count: not decomposable into per-file partials — declined
    val dcnt = readAgg(dir).groupBy(col("name"))
      .agg(countDistinct(col("price")).as("n"))
    assert(!planOf(dcnt).contains("PushedAggregation"), planOf(dcnt))
    assert(dcnt.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("x", 2L), ("y", 2L)))
  }
}
