package graft
class EntrySmokeSpec extends SparkSpec {
  test("driver contract: entry returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      "every query has an oracle and vice versa")
  }
}
