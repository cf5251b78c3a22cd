package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class GapFillSpec extends AnyFunSuite with SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def fixture() = {
    import spark.implicits._
    Seq(
      // user 100: two events in hour 0 (later ts wins), a 2-hour gap, hour 3
      (1L, ts("2024-01-01 00:05:00"), 100L, "view", 1.0),
      (2L, ts("2024-01-01 00:40:00"), 100L, "view", 2.0),
      (3L, ts("2024-01-01 03:10:00"), 100L, "view", 5.0),
      // user 200: same-timestamp tie inside one bucket → higher event_id wins
      (4L, ts("2024-01-01 10:00:00"), 200L, "view", 7.0),
      (5L, ts("2024-01-01 10:00:00"), 200L, "view", 9.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("gapFill emits a dense hourly grid with last-observation-carried-forward") {
    val out = EventAnalytics.gapFill(fixture())
      .orderBy("user_id", "bucket")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("bucket").toString,
        r.getAs[Double]("value_filled"), r.getAs[Boolean]("is_observed")))
      .toSeq
    assert(out == Seq(
      (100L, "2024-01-01 00:00:00.0", 2.0, true),   // in-bucket survivor = later ts
      (100L, "2024-01-01 01:00:00.0", 2.0, false),  // gap hour, forward-filled
      (100L, "2024-01-01 02:00:00.0", 2.0, false),
      (100L, "2024-01-01 03:00:00.0", 5.0, true),
      (200L, "2024-01-01 10:00:00.0", 9.0, true)    // ts tie → max event_id
    ))
  }

  test("single-event users produce exactly one observed bucket, never a null fill") {
    import spark.implicits._
    val one = Seq((1L, ts("2024-02-02 05:59:59"), 7L, "view", 3.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventAnalytics.gapFill(one).collect()
    assert(out.length == 1 && !out(0).anyNull &&
      out(0).getAs[Double]("value_filled") == 3.5)
  }
}
