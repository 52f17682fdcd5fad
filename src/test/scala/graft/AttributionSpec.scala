package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Attribution, Maintenance}

/** Edge semantics of the conversion-analytics and lake-maintenance
  * queries on hand-built rows: attribution recency/tie rules, path
  * truncation, conversion boundaries, compaction bin edges, and gap
  * arithmetic. */
class AttributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  private def events(rows: (Long, String, Timestamp, Long)*) =
    rows.map { case (u, t, time, id) => (id, time, u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")

  test("attributionLast credits the most recent click, NULL when organic") {
    // u1: click(1) click(2) purchase(3) → credited to click 2;
    //     later click(4) purchase(5) → credited to click 4.
    // u2: purchase with no prior click → organic (NULL).
    // u3: click AFTER the purchase only → organic.
    val df = events(
      (1L, "click", ts(1), 10L), (1L, "click", ts(2), 11L),
      (1L, "purchase", ts(3), 12L),
      (1L, "click", ts(4), 13L), (1L, "purchase", ts(5), 14L),
      (2L, "purchase", ts(1), 20L),
      (3L, "purchase", ts(2), 30L), (3L, "click", ts(3), 31L))
    val got = Attribution.attributionLast(df).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq === Seq((12L, 11L), (14L, 13L), (20L, -1L),
      (30L, -1L)))
  }

  test("attributionLast breaks a same-timestamp tie by event_id order") {
    // Click shares the purchase's timestamp: a LOWER event_id click is
    // in the running window (counts), a higher one is not.
    val df = events(
      (1L, "click", ts(1), 10L), (1L, "purchase", ts(1), 11L),
      (2L, "purchase", ts(1), 20L), (2L, "click", ts(1), 21L))
    val got = Attribution.attributionLast(df).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq === Seq((11L, 10L), (20L, -1L)))
  }

  test("pathTopk truncates at five steps and joins short traces") {
    val df = events(
      (1L, "view", ts(1), 10L), (1L, "click", ts(2), 11L),
      (2L, "view", ts(1), 20L), (2L, "click", ts(2), 21L),
      (3L, "signup", ts(1), 30L), (3L, "view", ts(2), 31L),
      (3L, "view", ts(3), 32L), (3L, "click", ts(4), 33L),
      (3L, "view", ts(5), 34L), (3L, "purchase", ts(6), 35L))
    val got = Attribution.pathTopk(df).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // ordered by count desc then path; u3's sixth event is dropped
    assert(got === Seq(("view>click", 2L),
      ("signup>view>view>click>view", 1L)))
  }

  test("timeToConvert is inclusive of same-day and NULL for non-converters") {
    // u1 converts 2 days after signup; u2 same-timestamp purchase
    // (>= boundary → day 0); u3 signed up, never converts → NULL
    // bucket; u4 purchased BEFORE signup only → NULL bucket; u5 never
    // signed up → excluded entirely.
    val df = events(
      (1L, "signup", ts(1), 10L), (1L, "purchase", ts(3), 11L),
      (2L, "signup", ts(1), 20L), (2L, "purchase", ts(1), 21L),
      (3L, "signup", ts(1), 30L),
      (4L, "purchase", ts(1), 40L), (4L, "signup", ts(2), 41L),
      (5L, "purchase", ts(1), 50L))
    val got = Attribution.timeToConvert(df).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(got.toSeq === Seq((-1L, 2L), (0L, 1L), (2L, 1L)))
  }

  test("abtestConversion arms partition the users and fold exactly") {
    val df = events(
      (1L, "view", ts(1), 10L), (1L, "purchase", ts(2), 11L),
      (2L, "view", ts(1), 20L),
      (3L, "purchase", ts(1), 30L), (3L, "purchase", ts(2), 31L))
    val rows = Attribution.abtestConversion(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // arm assignment is a pure function of user_id — totals across arms
    // must cover every user/event/purchase exactly once
    assert(rows.map(_._2).sum === 3L) // users
    assert(rows.map(_._3).sum === 2L) // converters (u1, u3)
    assert(rows.map(_._4).sum === 5L) // events
    assert(rows.map(_._5).sum === 3L) // purchases
    // rerun-stable: same input → same arms
    val again = Attribution.abtestConversion(df).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.map(r => (r._1, r._2)).toMap === again)
  }

  test("compactionPlan bins by cumulative-before, overflow by one doc") {
    // target 20000: docs of 15k, 15k, 15k in one source →
    // before = 0 / 15k / 30k → bins 0, 0, 1 (bin 0 overflows to 30k)
    val df = Seq(
      ("src0", 1L, 15000L), ("src0", 2L, 15000L), ("src0", 3L, 15000L),
      ("src1", 4L, 50000L) // single oversized doc → its own bin 0
    ).toDF("source", "doc_id", "n_chars")
    val got = Maintenance.compactionPlan(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      ("src0", 0L, 2L, 30000L, 1L, 2L),
      ("src0", 1L, 1L, 15000L, 3L, 3L),
      ("src1", 0L, 1L, 50000L, 4L, 4L)))
  }

  test("coverageCurve ranks by chars desc and shares sum the corpus") {
    val df = Seq(
      ("a", 1L, 100L), ("a", 2L, 200L), // a: 300
      ("b", 3L, 600L), // b: 600
      ("c", 4L, 100L) // c: 100
    ).toDF("source", "doc_id", "n_chars")
    val got = Maintenance.coverageCurve(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3), r.getLong(4),
        r.getDouble(5)))
      .sortBy(_._3)
    assert(got.toSeq === Seq(
      ("b", 600L, 1, 600L, 0.6),
      ("a", 300L, 2, 900L, 0.9),
      ("c", 100L, 3, 1000L, 1.0)))
  }

  test("gapStats measures exact µs gaps per user, singletons dropped") {
    val df = events(
      (1L, "view", ts(1, 0), 10L), (1L, "view", ts(1, 1), 11L),
      (1L, "view", ts(1, 3), 12L), // gaps: 1h, 2h
      (2L, "view", ts(1), 20L)) // single event → no gaps row
    val got = Maintenance.gapStats(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val h = 3600L * 1000000L
    assert(got.toSeq === Seq((1L, 2L, h, 2 * h, 3 * h, 1.5 * h)))
  }
}
