package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Batch event-analytics additions: ordered funnel, cohort retention, and
  * top event paths — hand-computed oracles on small corpora (the sf0.01
  * gate runs the DuckDB twins; these pin the operator semantics). */
class FunnelAnalyticsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def t(day: Int, hour: Int, min: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:$min%02d:00")

  private def ev(rows: (Long, Timestamp, Long, String)*) =
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type")

  test("funnel: ordered steps, strict after, window anchored at step 0") {
    val events = ev(
      // user 1 completes click → view → purchase
      (1L, t(1, 10), 1L, "click"), (2L, t(1, 11), 1L, "view"),
      (3L, t(1, 12), 1L, "purchase"),
      // user 2: purchase WITHOUT an intervening view — stops at stage 0
      (4L, t(1, 10), 2L, "click"), (5L, t(1, 11), 2L, "purchase"),
      // user 3: view BEFORE the click doesn't count; the later view does;
      // purchase lands past the 7-day window anchored at the click
      (6L, t(1, 9), 3L, "view"), (7L, t(1, 10), 3L, "click"),
      (8L, t(1, 11), 3L, "view"), (9L, t(9, 10), 3L, "purchase"),
      // user 4 never clicks — in no stage
      (10L, t(1, 10), 4L, "view"))
    val got = EventAnalytics.funnel(events, Seq("click", "view", "purchase"), 7)
      .orderBy("stage_idx")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((0, "click", 3L), (1, "view", 2L), (2, "purchase", 1L)))
  }

  test("retentionCohorts: first-day cohorts and exact day offsets") {
    val events = ev(
      (1L, t(1, 9), 1L, "a"), (2L, t(2, 9), 1L, "a"), (3L, t(8, 9), 1L, "a"),
      (4L, t(1, 9), 2L, "a"),
      (5L, t(2, 9), 3L, "a"), (6L, t(3, 9), 3L, "a"))
    val got = EventAnalytics.retentionCohorts(events, Seq(0, 1, 7))
      .orderBy("cohort_day", "day_offset")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-01", 7, 1L),
      ("2024-01-02", 0, 1L), ("2024-01-02", 1, 1L)))
  }

  test("topEventPaths: n-grams per user, count-then-path ordering, ts ties by event_id") {
    val events = ev(
      (1L, t(1, 10), 1L, "click"), (2L, t(1, 11), 1L, "view"),
      (3L, t(1, 12), 1L, "purchase"), (4L, t(1, 13), 1L, "click"),
      (5L, t(1, 10), 2L, "click"), (6L, t(1, 11), 2L, "view"),
      (7L, t(1, 12), 2L, "purchase"),
      // user 3: two events share a timestamp — event_id breaks the tie
      (8L, t(1, 10), 3L, "x"), (9L, t(1, 11), 3L, "y"), (10L, t(1, 11), 3L, "z"))
    val got = EventAnalytics.topEventPaths(events, n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(
      ("click>view>purchase", 2L),
      ("view>purchase>click", 1L),
      ("x>y>z", 1L)))
  }
}
