package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, FxRates, GoldenJoin, Melt, QualityChecks, Upsert}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("Dedup.latestByKey keeps exactly the newest row per key") {
    val df = Seq((1L, 10L, "old"), (1L, 20L, "new"), (2L, 5L, "only"))
      .toDF("k", "v", "tag")
    val out = Dedup.latestByKey(df, Seq("k"), Seq(col("v").desc)).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(out == Set((1L, "new"), (2L, "only")))
  }

  test("Melt.wideToLong expands each row without shuffle") {
    val df = Seq((1L, 2.0, 3.0)).toDF("id", "a", "b")
    val out = Melt.wideToLong(df, Seq("id"), Seq("a" -> "a", "b" -> "b"))
    assert(out.collect().map(r => (r.getString(1), r.getDouble(2))).toSet ==
      Set(("a", 2.0), ("b", 3.0)))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "melt must be shuffle-free")
  }

  test("Upsert.merge: update, preserve, keep and insert semantics") {
    val target = Seq((1, "t1", "manual", "keepme"), (2, "t2", null, "orig"))
      .toDF("k", "v", "curated", "created")
    val source = Seq((2, "s2", "auto"), (3, "s3", "auto")).toDF("k", "v", "curated")
    val out = Upsert.merge(target, source, Seq("k"),
      keepCols = Seq("curated"), preserveCols = Seq("created"))
    val rows = out.collect().map(r => (r.getInt(0),
      r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(rows == Set(
      (1, "t1", "manual", "keepme"),   // untouched target row
      (2, "s2", "auto", "orig"),       // matched: v updated, curated null→source, created preserved
      (3, "s3", "auto", null)))        // inserted from source
  }

  test("Upsert.merge keepCols prefers non-null target value") {
    val target = Seq((1, "manual")).toDF("k", "name")
    val source = Seq((1, "crawler")).toDF("k", "name")
    val out = Upsert.merge(target, source, Seq("k"), keepCols = Seq("name"))
    assert(out.collect().head.getString(1) == "manual")
  }

  test("QualityChecks.report runs all checks in one pass") {
    val df = Seq((1, 10.0), (2, -5.0), (3, 0.0)).toDF("id", "price")
    val rep = QualityChecks.report(df, Seq(
      QualityChecks.Check("nonpositive_price", col("price") <= 0),
      QualityChecks.Check("null_id", col("id").isNull)))
    val byName = rep.collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(byName("nonpositive_price") == (2L, false))
    assert(byName("null_id") == (0L, true))
    assert(rep.select("total_rows").head.getLong(0) == 3L)
  }

  test("FxRates.carryForward: gaps fill forward, leading gap stays null") {
    // day 9 is observed but NOT a calendar day: it must still feed the
    // window (day 10 carries 130), while the output stays calendar-shaped
    val fx = Seq((3, 100.0), (4, 110.0), (7, 120.0), (9, 130.0))
      .toDF("d", "rate").withColumn("rate", col("rate").cast("decimal(18,2)"))
    val cal = Seq(1, 2, 3, 4, 5, 6, 7, 8, 10).toDF("d")
    val rows = FxRates.carryForward(fx, cal, "d").collect()
    val out = rows
      .map(r => r.getInt(0) -> (Option(r.getDecimal(2)).map(_.doubleValue),
        Option(r.getString(3)))).toMap
    assert(!out.contains(9), "observation-only days don't appear in the output")
    assert(out(1) == (None, None), "no prior observation => null fill, null source")
    assert(out(2) == (None, None))
    assert(out(3) == (Some(100.0), Some("observed")))
    assert(out(5) == (Some(110.0), Some("carried")))
    assert(out(6) == (Some(110.0), Some("carried")))
    assert(out(7) == (Some(120.0), Some("observed")))
    assert(out(8) == (Some(120.0), Some("carried")))
    assert(out(10) == (Some(130.0), Some("carried")),
      "the day-9 observation carries into day 10 even though 9 is off-calendar")
  }

  test("FxRates.carryForward: constant partition columns stay in the window spec") {
    // from/to are literal-backed, exactly like q37's currency pair: without
    // the Pin guard Catalyst folds them out of the PARTITION BY and
    // WindowExec degrades to "No Partition Defined" (single partition).
    val fx = Seq((3, 100.0), (7, 120.0)).toDF("d", "rate")
      .withColumn("rate", col("rate").cast("decimal(18,2)"))
      .withColumn("fc", lit("USD")).withColumn("tc", lit("VND"))
    val cal = Seq(1, 3, 5, 7, 9).toDF("d")
    val out = FxRates.carryForward(fx, cal, "d", partitionCols = Seq("fc", "tc"))
    out.collect() // force the final (AQE) physical plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window "), s"expected a window node in:\n$plan")
    assert(plan.contains("pin("),
      s"partition columns were folded out of the window spec:\n$plan")
    // and the guard is a pure identity on the results
    val byDay = out.collect()
      .map(r => r.getInt(0) -> Option(r.getAs[java.math.BigDecimal]("rate_filled"))
        .map(_.doubleValue)).toMap
    assert(byDay(1).isEmpty && byDay(5).contains(100.0) && byDay(9).contains(120.0))
  }

  test("FxRates.carryForward: an oversized series universe raises (dim contract)") {
    // a "pair" universe the size of a fact table's key space must fail
    // loudly instead of crossing with the calendar
    val fake = spark.range(0, 50).toDF("k")
      .withColumn("d", (col("k") % 5).cast("int"))
      .withColumn("rate", lit(1.0).cast("decimal(18,2)"))
    val cal = Seq(1, 2, 3).toDF("d")
    // the guard is lazy (in-plan raise_error): construction is free, the
    // contract violation surfaces when the plan executes
    val frame = FxRates.carryForward(fake, cal, "d", partitionCols = Seq("k"), maxPairs = 10)
    // SparkRuntimeException is private[spark] in Spark 4.1 — intercept the
    // public supertype and pin the concrete class by name
    val e = intercept[RuntimeException] { frame.collect() }
    assert(e.getClass.getSimpleName == "SparkRuntimeException", e.getClass.getName)
    assert(e.getMessage.contains("dim-only"))
    // while a legitimate pair dim under the bound is untouched (q37 shape)
    val ok = FxRates.carryForward(fake.filter(col("k") < 3), cal, "d",
      partitionCols = Seq("k"), maxPairs = 10)
    assert(ok.select("k").distinct().count() == 3)
  }

  test("GoldenJoin auto-aliases colliding dim columns; conditions see the renamed frame") {
    import GoldenJoin.Dim
    val fact = Seq((1L, 10L), (2L, 20L)).toDF("pid", "cat_id")
    // both dims carry a 'label' column; the second also collides on the
    // FIRST dim's join-key name to prove renames happen before cond runs
    val d1 = Seq((10L, "cat-a"), (20L, "cat-b")).toDF("cat_key", "label")
    val d2 = Seq((1L, "p-one", "x")).toDF("pid", "label", "cat_key")
    val out = GoldenJoin.leftEnrich(fact, Seq(
      Dim(d1, (f, d) => f("cat_id") === d("cat_key")),
      Dim(d2, (f, d) => f("pid") === d("dim2_pid"), alias = Some("dim2"))))
    assert(out.columns.toSeq ===
      Seq("pid", "cat_id", "cat_key", "label",
        "dim2_pid", "dim2_label", "dim2_cat_key"))
    val byPid = out.collect().map(r => r.getLong(0) ->
      (r.getAs[String]("label"), r.getAs[String]("dim2_label"))).toMap
    assert(byPid(1L) == ("cat-a", "p-one"))
    assert(byPid(2L) == ("cat-b", null))
  }

  test("GoldenJoin auto-alias fails loudly when the prefixed name still collides") {
    import GoldenJoin.Dim
    val fact = Seq((1L, "a", "b")).toDF("k", "label", "dim1_label")
    val d = Seq((1L, "c")).toDF("dk", "label")
    val e = intercept[IllegalArgumentException] {
      GoldenJoin.leftEnrich(fact, Seq(Dim(d, (f, dd) => f("k") === dd("dk"))))
    }
    assert(e.getMessage.contains("still collides"))
  }

  test("QualityChecks min-count polarity: shortfall fails, evidence passes, empty input fails") {
    val df = Seq((1, "ok"), (2, "ok"), (3, "bad")).toDF("id", "status")
    val rep = QualityChecks.report(df, Seq(
      QualityChecks.Check.atLeast("some_ok", col("status") === "ok"),
      QualityChecks.Check.atLeast("three_bad", col("status") === "bad", min = 3L)))
    val byName = rep.collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(byName("some_ok") == (0L, true), "evidence present => 0 violations")
    assert(byName("three_bad") == (2L, false), "shortfall of 2 reported as violations")
    // empty input: a min-count check must FAIL, never silently pass
    val empty = df.filter(col("id") < 0)
    val emptyRep = QualityChecks.report(empty, Seq(
      QualityChecks.Check.atLeast("rows_inserted", lit(true))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(emptyRep("rows_inserted") == (1L, false))
  }
}
