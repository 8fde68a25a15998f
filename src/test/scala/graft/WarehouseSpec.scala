package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, BloomFilter, Expectations, Funnel,
  IncrementalAgg, Pivot, Quantiles, Sampling, Scd2, SnapshotDiff, Stats}
import graft.operators.dedup.EditDistance

/** Specs for the round-8 warehouse/behavior operators: SCD2 history,
  * pivot, CDC apply, bloom semi-join reduction, funnel, cohort retention
  * and edit-distance near-dup.
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("Scd2.history collapses runs, reopens on re-transition, half-open intervals") {
    val snaps = Seq(
      // key 1: A A B A — four snapshots, three versions (A re-opens)
      (1L, "2024-01-01", "A"), (1L, "2024-01-02", "A"),
      (1L, "2024-01-05", "B"), (1L, "2024-01-09", "A"),
      // key 2: single snapshot
      (2L, "2024-01-03", "X"))
      .toDF("k", "d", "attr").withColumn("d", to_date(col("d")))
    val h = Scd2.history(snaps, Seq("k"), "d", Seq("attr"))
      .select("k", "version", "attr", "valid_from", "valid_to", "is_current")
      .orderBy("k", "version").collect()
    assert(h.map(r => (r.getLong(0), r.getInt(1), r.getString(2),
      r.getDate(3).toString, Option(r.getDate(4)).map(_.toString), r.getBoolean(5))).toSeq == Seq(
      (1L, 1, "A", "2024-01-01", Some("2024-01-05"), false),
      (1L, 2, "B", "2024-01-05", Some("2024-01-09"), false),
      (1L, 3, "A", "2024-01-09", None, true),
      (2L, 1, "X", "2024-01-03", None, true)))
  }

  test("Scd2.history: null attribute states open versions null-safely") {
    val snaps = Seq((1L, "2024-01-01", Option("A")), (1L, "2024-01-02", None),
      (1L, "2024-01-03", None), (1L, "2024-01-04", Option("A")))
      .toDF("k", "d", "attr").withColumn("d", to_date(col("d")))
    val h = Scd2.history(snaps, Seq("k"), "d", Seq("attr"))
      .orderBy("version").collect()
    // A → null → (null stays) → A = three versions; null→null no change
    assert(h.map(r => (r.getInt(h.head.fieldIndex("version")),
      Option(r.getString(r.fieldIndex("attr"))))).toSeq ==
      Seq((1, Some("A")), (2, None), (3, Some("A"))))
  }

  test("Pivot.toWide pins explicit values; absent cells are null") {
    val df = Seq(("d1", "a", 1.0), ("d1", "a", 2.0), ("d2", "b", 5.0))
      .toDF("g", "p", "v")
    val wide = Pivot.toWide(df, Seq("g"), "p", Seq("a", "b", "c"),
      Seq(count(lit(1)).as("cnt"), sum(col("v")).as("val")))
    assert(wide.columns.toSeq == Seq("g", "a_cnt", "a_val", "b_cnt", "b_val", "c_cnt", "c_val"))
    val d1 = wide.filter(col("g") === "d1").collect().head
    assert(d1.getLong(1) == 2 && d1.getDouble(2) == 3.0)
    assert(d1.isNullAt(3) || d1.getLong(3) == 0) // count over no rows: null cell
    assert(d1.isNullAt(4))
  }

  test("SnapshotDiff.applyChanges reconstructs the after snapshot exactly") {
    val before = Seq((1L, 10, "x"), (2L, 20, "y"), (3L, 30, "z"), (4L, 40, null))
      .toDF("k", "n", "s")
    val after = Seq((1L, 10, "x"), (2L, 25, "y"), (4L, 40, "w"), (5L, 50, "v"))
      .toDF("k", "n", "s") // 1 unchanged, 2 changed, 3 removed, 4 null→value, 5 added
    val changes = SnapshotDiff.diff(before, after, Seq("k"))
    val rebuilt = SnapshotDiff.applyChanges(before, changes, Seq("k"))
    assert(rebuilt.columns.toSeq == before.columns.toSeq)
    val exp = after.collect().map(_.toSeq).toSet
    assert(rebuilt.collect().map(_.toSeq).toSet == exp)
  }

  test("BloomFilter: zero false negatives; bloom-then-join equals plain join") {
    val dim = (1L to 200L by 3).toDF("key")
    val fact = (1L to 1000L).map(i => (i, i % 7)).toDF("key", "grp")
    val bits = BloomFilter.build(dim, "key", m = 1 << 10, k = 3)
    val probed = fact.filter(BloomFilter.mightContain(col("key"), bits, 1 << 10, 3))
    // every true key passes (no false negatives)
    val trueKeys = fact.join(dim, "key")
    assert(probed.join(dim, "key").count() == trueKeys.count())
    // exact join after the bloom == exact join without it
    assert(probed.join(dim, "key").collect().map(_.toSeq).toSet ==
      trueKeys.collect().map(_.toSeq).toSet)
    // and the filter actually filters (some non-members dropped)
    assert(probed.count() < fact.count())
  }

  test("BloomProbe: broadcast transport matches literal positions at m=2^20; plan O(1) in m") {
    val dim = (1L to 500L by 2).toDF("key")
    val fact = (1L to 5000L).toDF("key")
    val m = 1 << 20
    val k = 3
    val bits = BloomFilter.build(dim, "key", m, k)
    val viaBroadcast = fact
      .filter(BloomFilter.mightContain(col("key"), bits, m, k))
      .collect().map(_.getLong(0)).toSet
    // reference: the same md5 positions probed through an inline array
    // literal (the pre-broadcast formulation)
    val lut = typedLit(bits.toSeq)
    val viaLiteral = fact
      .filter(BloomFilter.positions(col("key"), m, k)
        .map(p => element_at(lut, p.cast("int") + 1)).reduce(_ && _))
      .collect().map(_.getLong(0)).toSet
    assert(viaBroadcast == viaLiteral)
    // the plan carries the broadcast handle, not the bitmap: growing m
    // 256x must not grow the plan text
    def planLen(mm: Int): Int = {
      val b = BloomFilter.build(dim, "key", mm, k)
      fact.filter(BloomFilter.mightContain(col("key"), b, mm, k))
        .queryExecution.executedPlan.toString.length
    }
    val small = planLen(1 << 12)
    val large = planLen(1 << 20)
    assert(math.abs(large - small) < 200, s"plan size grew with m: $small -> $large")
  }

  test("coverageGaps: span vs active days, no calendar explode") {
    val ev = Seq((1L, "2024-01-01"), (1L, "2024-01-01"), (1L, "2024-01-05"),
      (2L, "2024-01-03"))
      .toDF("user_id", "day").withColumn("day", to_date(col("day")))
    val out = graft.operators.Analytics.coverageGaps(ev, "user_id", "day")
      .orderBy("user_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq ==
      Seq((1L, 2L, 5L, 3L), (2L, 1L, 1L, 0L))) // (active, span, missing)
  }

  test("timeWeightedAvg weights by holding time; ties resolved by tiebreak") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // 10.0 held 10s, 20.0 held 30s → twap = (10*10 + 20*30)/40 = 17.5
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, 2L, ts("2024-01-01 00:00:10"), 20.0),
      (1L, 3L, ts("2024-01-01 00:00:40"), 99.0), // last: no duration
      // user 2: two events at the SAME instant — tiebreak by event_id
      // gives the lower id zero duration deterministically
      (2L, 4L, ts("2024-01-01 00:00:00"), 5.0),
      (2L, 5L, ts("2024-01-01 00:00:00"), 7.0),
      (2L, 6L, ts("2024-01-01 00:00:10"), 9.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = graft.operators.Analytics.timeWeightedAvg(ev, "user_id", "ts",
        col("value"), tieCols = Seq("event_id")).orderBy("user_id").collect()
    assert(out(0).getLong(1) == 2 && out(0).getDouble(2) == 17.5)
    assert(out(1).getLong(1) == 2 && out(1).getDouble(2) == 7.0) // 5.0 zero-weighted
  }

  test("Affinity.coOccurrence: hand-computed lift; mega-baskets capped out") {
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 10L), // dup (1,10) collapses
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L))
      .toDF("basket", "item")
    val out = graft.operators.Affinity.coOccurrence(li, "basket", "item")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // (10,20): together in 2 of 3 baskets; n_10=3, n_20=2 → lift 2*3/(3*2)=1
    assert(out((10L, 20L)) == ((2L, 3L, 2L, 1.0)))
    assert(out((10L, 30L)) == ((1L, 3L, 1L, 1.0)))
    // a mega-basket is excluded entirely rather than exploding quadratically
    val withMega = li.unionByName(
      (1L to 50L).map(i => (9L, 1000L + i)).toDF("basket", "item"))
    val capped = graft.operators.Affinity.coOccurrence(withMega, "basket", "item",
      maxBasketSize = 10)
    assert(capped.filter(col("item_a") >= 1000L).count() == 0)
  }

  test("requireUniqueKeys passes unique dims and fails loudly on duplicates") {
    import graft.operators.QualityChecks
    val unique = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(QualityChecks.requireUniqueKeys(unique, Seq("k")).count() == 2)
    // a single null-keyed row is unique → passes AND is retained (the
    // null-unsafe join would silently delete it); duplicated nulls trip it
    val withNull = Seq((Some(1L), "a"), (None, "unknown-member")).toDF("k", "v")
    assert(QualityChecks.requireUniqueKeys(withNull, Seq("k")).count() == 2)
    val dupNull = Seq((Option.empty[Long], "a"), (Option.empty[Long], "b"))
      .toDF("k", "v")
    intercept[Exception] {
      QualityChecks.requireUniqueKeys(dupNull, Seq("k")).count()
    }
    val dup = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val e = intercept[Exception] {
      QualityChecks.requireUniqueKeys(dup, Seq("k")).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("duplicate key")), e.getMessage)
  }

  test("winsorize clips to exact percentile bounds") {
    import graft.operators.Cleanse
    val df = (1L to 100L).toDF("v")
    val out = Cleanse.winsorize(df, col("v"), "w", pLo = 0.05, pHi = 0.95)
      .select("v", "w", "w_lo", "w_hi").collect()
    assert(out.forall(r => r.getLong(2) == 5L && r.getLong(3) == 95L))
    assert(out.forall { r =>
      val (v, w) = (r.getLong(0), r.getLong(1))
      w == math.min(math.max(v, 5L), 95L)
    })
  }

  test("minMaxPerGroup scales to [0,1]; constant groups yield null") {
    import graft.operators.Cleanse
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("b", 7L), ("b", 7L))
      .toDF("g", "v")
    val out = Cleanse.minMaxPerGroup(df, "g", col("v"), "norm")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.toSet == Set(("a", 10L, Some(0.0)), ("a", 20L, Some(0.5)),
      ("a", 30L, Some(1.0)), ("b", 7L, None), ("b", 7L, None)))
  }

  test("IncrementalDedup: within-batch min-id survivor, history filter, null text survives") {
    import graft.operators.dedup.IncrementalDedup
    val history = Seq((1L, "seen before")).toDF("doc_id", "text")
    val today = Seq(
      (10L, "brand new"), (11L, "brand new"),   // in-batch dup: 10 survives
      (12L, "seen before"),                     // already in history: dropped
      (13L, null.asInstanceOf[String]))         // null text: survives as-is
      .toDF("doc_id", "text")
    val out = IncrementalDedup.newDocs(today,
        IncrementalDedup.fingerprints(history, "text"), "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out == Set(10L, 13L))
  }

  test("chiSquareCells matches a hand-computed 2x2 table") {
    import graft.operators.Stats
    // o: (a,x)=30 (a,y)=10 (b,x)=10 (b,y)=50; N=100, r_a=40 r_b=60, c_x=40 c_y=60
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(50)(("b", "y"))
    val out = Stats.chiSquareCells(rows.toDF("p", "s"), "p", "s")
      .collect().map(r => ((r.getAs[String]("p"), r.getAs[String]("s")),
        (r.getAs[Long]("o"), r.getAs[Double]("chi2_term")))).toMap
    // expected (a,x) = 40*40/100 = 16 → term (30-16)²/16 = 12.25
    assert(out(("a", "x")) == ((30L, 12.25)))
    // (b,y): e = 36 → (50-36)²/36 = 196/36
    assert(math.abs(out(("b", "y"))._2 - 196.0 / 36.0) < 1e-12)
  }

  test("DateDim: anchor day-of-week is right on known dates; leap days present") {
    import graft.operators.DateDim
    val dim = DateDim.build(spark, "2000-02-27", "2000-03-02")
      .collect().map(r => r.getDate(0).toString -> r).toMap
    // 2000-02-28 was a Monday; leap day 2000-02-29 exists (div-400 year)
    assert(dim("2000-02-28").getInt(5) == 1)
    assert(dim.contains("2000-02-29") && dim("2000-02-29").getInt(5) == 2)
    assert(dim("2000-03-01").getDate(7).toString == "2000-03-01") // month_start
    val sunday = dim("2000-02-27")
    assert(sunday.getInt(5) == 7 && sunday.getBoolean(6)) // weekend
    // week_index increments at the Monday boundary
    assert(dim("2000-02-28").getLong(8) == dim("2000-02-27").getLong(8) + 1)
  }

  test("BloomFilter.mFor keeps false positives low where a fixed m saturates") {
    val n = 20000
    val dim = (1L to n.toLong).toDF("key")
    val nonMembers = (1000001L to 1020000L).toDF("key")
    def fpRate(m: Int): Double = {
      val bits = BloomFilter.build(dim, "key", m, 3)
      nonMembers.filter(BloomFilter.mightContain(col("key"), bits, m, 3))
        .count().toDouble / n
    }
    val sized = fpRate(BloomFilter.mFor(n)) // 16 bits/key
    val fixedSmall = fpRate(1 << 12)        // 0.2 bits/key: saturated
    assert(sized < 0.01, s"sized-m fp rate $sized")
    assert(fixedSmall > 0.9, s"saturated filter should admit ~everything, fp=$fixedSmall")
  }

  test("Funnel: strict ordering — a purchase before the first view does not convert") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:06:00"), "purchase"),
      // user 2: purchase BEFORE view — reaches only stage 1
      (2L, ts("2024-01-01 09:00:00"), "purchase"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // user 3: view, then click at the SAME instant (strict > rejects it)
      (3L, ts("2024-01-01 08:00:00"), "view"),
      (3L, ts("2024-01-01 08:00:00"), "click"),
      // user 4: no stage events at all
      (4L, ts("2024-01-01 07:00:00"), "signup"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.stageCounts(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).orderBy("stage_no").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("Funnel: a later view re-anchors nothing — stage times are minima") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // click sits between the FIRST view and a later view: counts (min view
    // anchors), and purchase after the click counts too
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "view"),
      (1L, ts("2024-01-01 12:30:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val reach = Funnel.userReach(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).collect()
    assert(reach.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((1L, 3)))
  }

  test("cohortRetention builds the retention triangle") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (2L, ts("2024-01-01 12:00:00")),
      (3L, ts("2024-01-02 09:00:00")), (3L, ts("2024-01-02 23:00:00")))
      .toDF("user_id", "ts")
    val out = Analytics.cohortRetention(ev, "user_id", "ts")
      .orderBy("cohort_day", "day_offset").collect()
    assert(out.map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSeq ==
      Seq(("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-02", 0, 1L)))
  }

  test("EditDistance.nearPairs finds char-grain near-dups via LSH blocking") {
    // near-identical long docs (one char edited → 3 of ~198 shingles
    // differ, J≈0.97) so the LSH banding is reliably dense enough to
    // propose the pair; the distance check then verifies char-grain
    val base = (1 to 200).map(i => s"token$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base.replace("token100 ", "tok3n100 ")),
      (3L, (1 to 200).map(i => s"other$i").mkString(" ")),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val pairs = EditDistance.nearPairs(docs, "doc_id", "text", maxDist = 20)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(pairs.head.getInt(2) == 1)
  }

  test("Expectations: orphans (incl. null FKs), duplicates, accepted values") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val orphan = Expectations.orphans(child, Seq("fk"), parent, Seq("pk"))
    assert(orphan.collect().map(r => Option(r.get(0))).toSet ==
      Set(Some(9L), None))
    val dup = Expectations.duplicateKeys(child, Seq("fk"))
    assert(dup.collect().map(_.getLong(1)).toSeq == Seq(2L)) // fk=1 twice
    val rep = Expectations.report(Seq(
      "orphans" -> orphan,
      "no_fk_over_100" -> Expectations.violating(child, col("fk") <= 100)))
    assert(rep.collect().map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("orphans" -> 2L, "no_fk_over_100" -> 1L)) // null fk violates predicate
  }

  test("IncrementalAgg.merge(agg(D1), agg(D2)) == agg(D1 union D2)") {
    val d1 = Seq(("a", 1L, BigDecimal("10.50")), ("b", 1L, BigDecimal("2.00")))
      .toDF("k", "n", "v")
    val d2 = Seq(("a", 2L, BigDecimal("0.25")), ("c", 5L, BigDecimal("7.00")))
      .toDF("k", "n", "v")
    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(sum("n").as("n"), sum("v").as("v"))
    val merged = IncrementalAgg.merge(aggOf(d1), aggOf(d2), Seq("k"))
    val direct = aggOf(d1.unionByName(d2))
    assert(merged.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet)
    assert(merged.schema == direct.schema) // types survive the merge
  }

  test("IncrementalAgg.merge sums the null-key group instead of duplicating it") {
    // GROUP BY emits one row for the null key; both sides carry it, and
    // the merge must match them null-safely (a USING join never would)
    val d1 = Seq((Option("a"), 1L), (Option.empty[String], 10L)).toDF("k", "n")
    val d2 = Seq((Option("a"), 2L), (Option.empty[String], 5L)).toDF("k", "n")
    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(sum("n").as("n"))
    val merged = IncrementalAgg.merge(aggOf(d1), aggOf(d2), Seq("k"))
    val direct = aggOf(d1.unionByName(d2))
    assert(merged.count() == 2)
    assert(merged.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet)
  }

  test("transitionMatrix counts ordered bigrams per user") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "b"),
      (1L, 3L, ts("2024-01-01 10:02:00"), "a"),
      (2L, 4L, ts("2024-01-01 09:00:00"), "a"),
      (2L, 5L, ts("2024-01-01 09:01:00"), "b"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val m = Analytics.transitionMatrix(ev, "user_id", "event_type",
      Seq(col("ts"), col("event_id"))).collect()
    assert(m.map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap ==
      Map(("a", "b") -> 2L, ("b", "a") -> 1L))
  }

  test("Stats.rollingZ: warm-up and zero-variance rows are null, spike flags") {
    val rows = ((1 to 10).map(d => (d, 100L)) :+ ((11, 500L))) // flat then spike
      .toDF("d", "v")
    val z = Stats.rollingZ(rows, col("d"), col("v"), n = 3).orderBy("d").collect()
    // rows 1-3: incomplete window; rows 4-11 over flat baseline: var=0 → null
    assert(z.take(3).forall(_.isNullAt(2)))
    assert(z.slice(3, 10).forall(_.isNullAt(2))) // zero variance
    // give the baseline variance, then measure the spike
    val rows2 = Seq((1, 100L), (2, 110L), (3, 90L), (4, 105L), (5, 500L))
      .toDF("d", "v")
    val z2 = Stats.rollingZ(rows2, col("d"), col("v"), n = 3).orderBy("d").collect()
    assert(!z2(4).isNullAt(2) && z2(4).getDouble(2) > 2.0)
  }

  test("Quantiles.approxByHistogram lands within one bucket of exact") {
    val vals = (1L to 10000L).toDF("v")
    val approx = Quantiles.approxByHistogram(vals, col("v"),
        qs = Seq(0.5, 0.99), lo = 0L, hi = 10000L, buckets = 100)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
    // exact p50 = 5000, p99 = 9900; bucket width 100 → lower bound within it
    assert(math.abs(approx(0.5) - 5000L) <= 100)
    assert(math.abs(approx(0.99) - 9900L) <= 100)
    // out-of-domain values clamp into edge buckets, rank mass preserved
    val clamped = Quantiles.approxByHistogram(
        Seq(-50L, 1L, 2L, 3L, 99999L).toDF("v"), col("v"),
        qs = Seq(1.0), lo = 0L, hi = 100L, buckets = 10)
      .collect()
    assert(clamped.head.getLong(1) == 90L) // top bucket holds the overflow
    // empty input → zero rows, not phantom (q, null) estimates
    val empty = Quantiles.approxByHistogram(
      Seq.empty[Long].toDF("v"), col("v"), qs = Seq(0.5), lo = 0L, hi = 10L,
      buckets = 2)
    assert(empty.count() == 0)
  }

  test("Sampling.deterministicExactK: exact k, monotone in k, id-stable") {
    val df = (1L to 1000L).toDF("id")
    val k50 = Sampling.deterministicExactK(df, "id", 50, ":t").collect()
      .map(_.getLong(0)).toSet
    val k100 = Sampling.deterministicExactK(df, "id", 100, ":t").collect()
      .map(_.getLong(0)).toSet
    assert(k50.size == 50 && k100.size == 100)
    assert(k50.subsetOf(k100)) // growing the budget only adds rows
    // reproducible across a different physical layout
    val k50b = Sampling.deterministicExactK(df.repartition(7), "id", 50, ":t")
      .collect().map(_.getLong(0)).toSet
    assert(k50b == k50)
    // null ids have no hash rank and no tiebreak identity — excluded, not
    // NULLS-FIRST-preferred into the sample
    val withNulls = (1L to 30L).map(Option(_)).toDF("id")
      .unionByName(Seq(Option.empty[Long], Option.empty[Long]).toDF("id"))
    val s20 = Sampling.deterministicExactK(withNulls, "id", 20, ":t").collect()
    assert(s20.length == 20 && s20.forall(!_.isNullAt(0)))
  }

  test("Funnel.userReach fails loudly on a non-numeric user column") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(("u-1", ts("2024-01-01 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val e = intercept[IllegalArgumentException] {
      Funnel.userReach(ev, "user_id", "ts", "event_type", Seq("view"))
    }
    assert(e.getMessage.contains("integral"))
  }
}
