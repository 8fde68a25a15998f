package graft

import java.nio.file.Files

import graft.sources.Bucketed

class BucketedSpec extends SparkSpec {

  test("co-bucketed tables join with zero shuffle") {
    val dir = Files.createTempDirectory("bucketed").toString
    val li = Tables.lineitem(spark, sf("0.001")).select("l_orderkey", "l_extendedprice")
    val o = Tables.orders(spark, sf("0.001")).select("o_orderkey", "o_totalprice")
    Bucketed.write(li, "li_b", s"$dir/li", "l_orderkey", buckets = 8,
      sortCols = Seq("l_orderkey"))
    Bucketed.write(o, "o_b", s"$dir/o", "o_orderkey", buckets = 8,
      sortCols = Seq("o_orderkey"))
    // broadcast would win at this toy size and hide the property under
    // test; at fact-fact scale neither side broadcasts and the bucketed
    // sort-merge path is exactly what runs
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.read(spark, "li_b")
        .join(Bucketed.read(spark, "o_b"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      assert(joined.count() == li.count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
