package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.EventAnalytics.Ev

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

  test("funnelStream: cross-batch completion, window expiry, matches batch twin on ordered data") {
    implicit val sq = spark.sqlContext
    def m(hour: Int, min: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00")
    val input = MemoryStream[Ev]
    val q = EventAnalytics.funnelStream(input.toDS(),
        Seq("click", "view", "purchase"), windowMs = 5 * 60 * 1000L,
        watermark = "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("fs")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      // batch 1: user 1 advances to stage 1; user 2 anchors at stage 0
      input.addData(
        Ev(1, m(10, 0), "click", 0), Ev(1, m(10, 1), "view", 0),
        Ev(2, m(10, 0), "click", 0))
      q.processAllAvailable()
      // batch 2: user 1 completes across the batch boundary
      input.addData(Ev(1, m(10, 2), "purchase", 0))
      q.processAllAvailable()
      // batch 3: sentinel advances the watermark past user 2's
      // t0 + window (10:05) → expiry outcome fires
      input.addData(Ev(9, m(10, 30), "noop", 0))
      q.processAllAvailable()
      input.addData(Ev(9, m(11, 0), "noop", 0))
      q.processAllAvailable()
      val rows = spark.table("fs")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(4))).toSet
      assert(rows.contains((1L, 2, true)), s"user 1 must complete: $rows")
      assert(rows.contains((2L, 0, false)), s"user 2 must expire at stage 0: $rows")

      // outcome counts agree with the batch twin on the same (ordered) data
      import spark.implicits._
      val batchEvents = Seq(
        (1L, m(10, 0), 1L, "click"), (2L, m(10, 1), 1L, "view"),
        (3L, m(10, 2), 1L, "purchase"), (4L, m(10, 0), 2L, "click"))
        .toDF("event_id", "ts", "user_id", "event_type")
      val stages = EventAnalytics.funnel(batchEvents, Seq("click", "view", "purchase"))
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      // batch: 2 users reach stage 0, 1 reaches stage 1 and 2; streaming
      // emitted exactly one completion (stage 2) and one stage-0 expiry
      assert(stages == Map(0 -> 2L, 1 -> 1L, 2 -> 1L))
    } finally q.stop()
  }
}
