package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Behavior

/** Ordering semantics of the behavioral queries: funnel step order and
  * the retention window boundaries, on hand-built event rows. */
class BehaviorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  private def events(rows: (Long, String, Timestamp)*) =
    rows.toDF("user_id", "event_type", "ts")

  test("funnel counts a step only when it follows the previous step") {
    // u1: full ordered funnel. u2: click BEFORE signup (and no later
    // click) — must not reach step 2. u3: purchase before its first
    // qualifying click — signup+click only. u4: never signs up.
    val df = events(
      (1L, "signup", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      (2L, "click", ts(1)), (2L, "signup", ts(2)),
      (3L, "signup", ts(1)), (3L, "purchase", ts(2)), (3L, "click", ts(3)),
      (4L, "click", ts(1)), (4L, "purchase", ts(2)))
    val Row(s: Long, c: Long, p: Long) = Behavior.funnelSteps(df).head()
    assert((s, c, p) === ((3L, 2L, 1L)))
  }

  test("funnel accepts a same-timestamp next step (>= boundary)") {
    val df = events(
      (1L, "signup", ts(1)), (1L, "click", ts(1)), (1L, "purchase", ts(1)))
    val Row(s: Long, c: Long, p: Long) = Behavior.funnelSteps(df).head()
    assert((s, c, p) === ((1L, 1L, 1L)))
  }

  test("runsConsecutive finds maximal same-type runs, split by interleaving") {
    // u1: A A B A → runs (A,2) (B,1) (A,1); u2: single long run
    val df = Seq(
      (1L, "A", ts(1, 1), 10L), (1L, "A", ts(1, 2), 11L),
      (1L, "B", ts(1, 3), 12L), (1L, "A", ts(1, 4), 13L),
      (2L, "A", ts(2, 1), 20L), (2L, "A", ts(2, 2), 21L),
      (2L, "A", ts(2, 3), 22L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = Behavior.runsConsecutive(df).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(r => (r._1, r._4)) // queries no longer presentation-sort
    assert(got.toSeq == Seq(
      (1L, "A", 2L, 10L, 11L),
      (1L, "B", 1L, 12L, 12L),
      (1L, "A", 1L, 13L, 13L),
      (2L, "A", 3L, 20L, 22L)))
  }

  test("markovTransitions counts adjacent pairs per user, event_id tie-break") {
    // u1: A B A → (A,B) (B,A); u2 has two same-ts events ordered by
    // event_id: A(20) B(21) → (A,B). No cross-user pair may appear.
    val df = Seq(
      (1L, "A", ts(1, 1), 10L), (1L, "B", ts(1, 2), 11L),
      (1L, "A", ts(1, 3), 12L),
      (2L, "A", ts(2, 1), 20L), (2L, "B", ts(2, 1), 21L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = Behavior.markovTransitions(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("A", "B", 2L, 2L),
      ("B", "A", 1L, 1L)))
  }

  test("retention window is (cohort, cohort+7], same-day is not retention") {
    // u1: active again day+3 → retained. u2: only same-day repeats →
    // not retained. u3: next activity day+8 → outside the window.
    // u4: boundary day+7 → retained. u1,u2 share cohort Jan 1.
    val df = events(
      (1L, "click", ts(1)), (1L, "click", ts(4)),
      (2L, "click", ts(1, hour = 1)), (2L, "click", ts(1, hour = 23)),
      (3L, "click", ts(2)), (3L, "click", ts(10)),
      (4L, "click", ts(2)), (4L, "click", ts(9)))
    val got = Behavior.retentionCohort(df)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .sortBy(_._1) // queries no longer presentation-sort
    assert(got === Array(
      ("2024-01-01", 2L, 1L),
      ("2024-01-02", 2L, 1L)))
  }

  test("sequenceMotifs: greedy non-overlapping cv*p count, event_id tiebreak") {
    // u1 trace "cvvpcp" → two conversions; u2 "cvv" → zero (no purchase);
    // u3 same-ts events ordered by event_id → "cpe" → one conversion, one
    // error. A 'v' BETWEEN two clicks must not break the second match.
    val df = Seq(
      (1L, 10L, "click", ts(1)), (1L, 11L, "view", ts(2)),
      (1L, 12L, "view", ts(3)), (1L, 13L, "purchase", ts(4)),
      (1L, 14L, "click", ts(5)), (1L, 15L, "purchase", ts(6)),
      (2L, 20L, "click", ts(1)), (2L, 21L, "view", ts(2)),
      (2L, 22L, "view", ts(3)),
      (3L, 31L, "click", ts(1, 5)), (3L, 32L, "purchase", ts(1, 5)),
      (3L, 33L, "error", ts(1, 5)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Behavior.sequenceMotifs(df).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1)
    assert(got === Array((1L, 6, 2, 0), (2L, 3, 0, 0), (3L, 3, 1, 1)))
  }
}
