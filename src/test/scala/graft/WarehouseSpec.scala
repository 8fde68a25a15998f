package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, BloomFilter, Funnel, Pivot, Scd2, SnapshotDiff}
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
}
