package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.EventAnalytics.Ev

class EventAnalyticsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("windowedCounts over a memory stream matches its batch twin") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventAnalytics.windowedCounts(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.outputMode("append").format("memory").queryName("wc")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      input.addData(
        Ev(1, ts(1), "click", 1.0), Ev(2, ts(2), "click", 2.0), Ev(1, ts(4), "view", 3.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first window
      input.addData(Ev(9, ts(59), "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
      val clicks = rows.find(r => r.getAs[String]("event_type") == "click").get
      assert(clicks.getAs[Long]("n") == 2)
      assert(clicks.getAs[Double]("total_value") == 3.0)
    } finally q.stop()
  }

  test("enrichedWindowedRevenue: stream-static broadcast join matches batch twin") {
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"), (9L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val evs = Seq(
      Ev(1, ts(1), "click", 10.0), Ev(2, ts(2), "click", 5.0),
      Ev(1, ts(4), "view", 2.5), Ev(9, ts(59), "click", 1.0))
    val input = MemoryStream[Ev]
    val q = EventAnalytics.enrichedWindowedRevenue(input.toDF(), dim,
        eventKey = "user_id", dimKey = "c_custkey", attr = "c_mktsegment",
        windowDur = "10 minutes", watermark = "5 minutes")
      .writeStream.outputMode("append").format("memory").queryName("er")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      input.addData(evs.take(3): _*)
      q.processAllAvailable()
      input.addData(evs.last) // advances watermark, closes the first window
      q.processAllAvailable()
      val got = spark.table("er")
        .select("window_start", "c_mktsegment", "n", "total_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val expected = EventAnalytics.enrichedWindowedRevenue(
          evs.take(3).toDF(), dim, "user_id", "c_custkey", "c_mktsegment",
          windowDur = "10 minutes")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(got == expected)
      assert(got.contains((ts(0), "BUILDING", 2L, 12.5)))
    } finally q.stop()
  }

  test("dedupWithinWatermark drops replays in-stream; batch twin dedups") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventAnalytics.dedupWithinWatermark(input.toDF(), Seq("user_id", "event_type"))
      .writeStream.outputMode("append").format("memory").queryName("dd")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      input.addData(
        Ev(1, ts(1), "click", 1.0), Ev(1, ts(2), "click", 9.0), // dup key within watermark
        Ev(2, ts(2), "view", 2.0))
      q.processAllAvailable()
      assert(spark.table("dd").count() == 2)
    } finally q.stop()
    // batch twin
    val batch = Seq(Ev(1, ts(1), "click", 1.0), Ev(1, ts(2), "click", 9.0)).toDF()
    assert(EventAnalytics.dedupWithinWatermark(batch, Seq("user_id", "event_type")).count() == 1)
  }

  test("windowed aggregation runs on the RocksDB state store (large-cardinality path)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sq = spark.sqlContext
      val input = MemoryStream[Ev]
      val q = EventAnalytics.windowedCounts(input.toDF(), "10 minutes", "5 minutes")
        .writeStream.outputMode("append").format("memory").queryName("wc_rocks")
        .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
      try {
        input.addData(Ev(1, ts(1), "click", 1.0), Ev(2, ts(3), "click", 2.0))
        q.processAllAvailable()
        input.addData(Ev(9, ts(59), "click", 0.0))
        q.processAllAvailable()
        val clicks = spark.table("wc_rocks").collect()
          .find(_.getAs[String]("event_type") == "click")
        assert(clicks.exists(_.getAs[Long]("n") == 2))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stateful sessionize emits gap-separated sessions; matches batch twin") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventAnalytics.sessionize(input.toDS(), gapMs = 5 * 60 * 1000, watermark = "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("sess")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      // user 1: two sessions separated by >5min gap; user 2: one session
      input.addData(
        Ev(1, ts(0), "click", 1.0), Ev(1, ts(2), "view", 2.0), // session A: 10:00-10:02
        Ev(1, ts(10), "click", 5.0),                           // session B starts 10:10
        Ev(2, ts(1), "click", 7.0))
      q.processAllAvailable()
      // push watermark beyond session B timeout (10:10 + 5min gap + 1min wm)
      input.addData(Ev(9, ts(30), "click", 0.0))
      q.processAllAvailable()
      input.addData(Ev(9, ts(59), "click", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("sess").where(col("user_id") === 1).collect()
        .sortBy(_.getAs[Timestamp]("session_start").getTime)
      assert(sessions.length == 2)
      assert(sessions(0).getAs[Long]("n_events") == 2)
      assert(sessions(0).getAs[Double]("total_value") == 3.0)
      assert(sessions(1).getAs[Long]("n_events") == 1)
    } finally q.stop()

    // batch twin over the same data gives the same sessions
    val batch = Seq(
      Ev(1, ts(0), "click", 1.0), Ev(1, ts(2), "view", 2.0),
      Ev(1, ts(10), "click", 5.0), Ev(2, ts(1), "click", 7.0)).toDF()
    val twin = EventAnalytics.sessionizeBatch(batch, 5 * 60 * 1000)
      .where(col("user_id") === 1).orderBy("session_start").collect()
    assert(twin.length == 2)
    assert(twin(0).getAs[Long]("n_events") == 2)
    assert(twin(1).getAs[Long]("n_events") == 1)
  }

  test("intervalJoin stream-stream matches its batch twin (bounded join window)") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val joined = EventAnalytics.intervalJoin(
      clicks.toDF().withColumnRenamed("event_type", "cv"),
      buys.toDF().withColumnRenamed("event_type", "pv"),
      key = "user_id", maxDelay = "5 minutes", watermark = "1 minute")
      .select(col("l.cv").as("click"), col("r.pv").as("purchase"))
    val q = joined.writeStream.outputMode("append").format("memory").queryName("ij")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      clicks.addData(Ev(1, ts(0), "c1", 0), Ev(1, ts(10), "c2", 0), Ev(2, ts(0), "c3", 0))
      buys.addData(
        Ev(1, ts(3), "p-in", 0),     // 3 min after c1 → joins c1 only
        Ev(1, ts(9), "p-late", 0),   // 9 min after c1 (out), 1 min before c2 (out: before)
        Ev(1, ts(12), "p-in2", 0),   // joins c2
        Ev(3, ts(1), "p-nouser", 0)) // no matching click user
      q.processAllAvailable()
      // advance both watermarks so results flush
      clicks.addData(Ev(8, ts(59), "wm", 0)); buys.addData(Ev(9, ts(59), "wm", 0))
      q.processAllAvailable()
      val got = spark.table("ij").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == Set(("c1", "p-in"), ("c2", "p-in2")))
    } finally q.stop()

    // batch twin: identical pairs from the same rows
    val cb = Seq(Ev(1, ts(0), "c1", 0), Ev(1, ts(10), "c2", 0), Ev(2, ts(0), "c3", 0))
      .toDF().withColumnRenamed("event_type", "cv")
    val pb = Seq(Ev(1, ts(3), "p-in", 0), Ev(1, ts(9), "p-late", 0),
      Ev(1, ts(12), "p-in2", 0), Ev(3, ts(1), "p-nouser", 0))
      .toDF().withColumnRenamed("event_type", "pv")
    val twin2 = EventAnalytics.intervalJoin(cb, pb, key = "user_id", maxDelay = "5 minutes")
      .select(col("l.cv"), col("r.pv")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(twin2 == Set(("c1", "p-in"), ("c2", "p-in2")))
  }

  test("native session_window works in streaming mode and matches its batch twin") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = input.toDF()
      .withWatermark("ts", "1 minute")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("ws"), col("sw.end").as("we"),
        col("n_events"))
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sws").trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      // user 1: two events 3 min apart (one session), then 15 min gap (new)
      input.addData(Ev(1, ts(0), "a", 0), Ev(1, ts(3), "b", 0), Ev(1, ts(18), "c", 0))
      q.processAllAvailable()
      input.addData(Ev(9, ts(59), "wm", 0)) // advance watermark to flush
      q.processAllAvailable()
      val got = spark.table("sws").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .filter(_._1 == 1L).toSet
      assert(got == Set(
        (1L, ts(0), ts(13), 2L),   // merged session: start 0, end = 3 + 10min
        (1L, ts(18), ts(28), 1L)))
    } finally q.stop()

    // batch twin: the same expression over a static frame yields the same rows
    val twin = Seq(Ev(1, ts(0), "a", 0), Ev(1, ts(3), "b", 0), Ev(1, ts(18), "c", 0))
      .toDF()
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start"), col("sw.end"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(twin == Set((1L, ts(0), ts(13), 2L), (1L, ts(18), ts(28), 1L)))
  }

  test("left-semi intervalJoin streams converted clicks exactly once") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val joined = EventAnalytics.intervalJoin(
      clicks.toDF().withColumnRenamed("event_type", "cv"),
      buys.toDF().withColumnRenamed("event_type", "pv"),
      key = "user_id", maxDelay = "5 minutes", watermark = "1 minute",
      joinType = "left_semi")
      .select(col("cv").as("click"))
    val q = joined.writeStream.outputMode("append").format("memory").queryName("semij")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      clicks.addData(Ev(1, ts(0), "c1", 0), Ev(2, ts(0), "c2-dry", 0))
      // TWO matching purchases — semi must still emit c1 once
      buys.addData(Ev(1, ts(2), "p1", 0), Ev(1, ts(4), "p2", 0))
      q.processAllAvailable()
      clicks.addData(Ev(8, ts(59), "wm", 0)); buys.addData(Ev(9, ts(59), "wm", 0))
      q.processAllAvailable()
      val got = spark.table("semij").collect().map(_.getString(0)).toSeq
      assert(got.sorted == Seq("c1"))
    } finally q.stop()

    // batch twin: same single row
    val cb = Seq(Ev(1, ts(0), "c1", 0), Ev(2, ts(0), "c2-dry", 0))
      .toDF().withColumnRenamed("event_type", "cv")
    val pb = Seq(Ev(1, ts(2), "p1", 0), Ev(1, ts(4), "p2", 0))
      .toDF().withColumnRenamed("event_type", "pv")
    val twin = EventAnalytics.intervalJoin(cb, pb, key = "user_id",
        maxDelay = "5 minutes", joinType = "left_semi")
      .select(col("cv")).collect().map(_.getString(0)).toSeq
    assert(twin == Seq("c1"))
  }

  test("attributionJoin emits matched pairs eagerly and null rows after watermark") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val joined = EventAnalytics.attributionJoin(
      clicks.toDF().withColumnRenamed("event_type", "cv"),
      buys.toDF().withColumnRenamed("event_type", "pv"),
      key = "user_id", maxDelay = "5 minutes", watermark = "1 minute")
      .select(col("l.cv").as("click"), col("r.pv").as("purchase"))
    val q = joined.writeStream.outputMode("append").format("memory").queryName("attr")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      clicks.addData(Ev(1, ts(0), "c1", 0), Ev(2, ts(0), "c2-dry", 0))
      buys.addData(Ev(1, ts(3), "p-in", 0))  // converts c1; user 2 never buys
      q.processAllAvailable()
      // watermark must pass ts(0)+5min+1min before c2-dry's null row may emit
      clicks.addData(Ev(8, ts(59), "wm", 0)); buys.addData(Ev(9, ts(59), "wm", 0))
      q.processAllAvailable()
      val got = spark.table("attr").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet
      assert(got == Set(("c1", Some("p-in")), ("c2-dry", None)))
    } finally q.stop()

    // batch twin: identical rows (null right side preserved) from same data
    val cb = Seq(Ev(1, ts(0), "c1", 0), Ev(2, ts(0), "c2-dry", 0))
      .toDF().withColumnRenamed("event_type", "cv")
    val pb = Seq(Ev(1, ts(3), "p-in", 0))
      .toDF().withColumnRenamed("event_type", "pv")
    val twin = EventAnalytics.attributionJoin(cb, pb,
        key = "user_id", maxDelay = "5 minutes")
      .select(col("l.cv"), col("r.pv")).collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(twin == Set(("c1", Some("p-in")), ("c2-dry", None)))
  }

  test("full-outer intervalJoin emits null rows for BOTH unmatched sides") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val joined = EventAnalytics.intervalJoin(
      clicks.toDF().withColumnRenamed("event_type", "cv"),
      buys.toDF().withColumnRenamed("event_type", "pv"),
      key = "user_id", maxDelay = "5 minutes", watermark = "1 minute",
      joinType = "full_outer")
      .select(col("l.cv").as("click"), col("r.pv").as("purchase"))
    val q = joined.writeStream.outputMode("append").format("memory").queryName("foj")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      clicks.addData(Ev(1, ts(0), "c1", 0), Ev(2, ts(0), "c2-dry", 0))
      buys.addData(Ev(1, ts(3), "p-in", 0),   // converts c1
        Ev(3, ts(1), "p-orphan", 0))          // user 3 never clicked
      q.processAllAvailable()
      // watermark past both windows releases the two null rows
      clicks.addData(Ev(8, ts(59), "wm", 0)); buys.addData(Ev(9, ts(59), "wm", 0))
      q.processAllAvailable()
      val got = spark.table("foj").collect()
        .map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSet
      assert(got == Set(
        (Some("c1"), Some("p-in")),
        (Some("c2-dry"), None),
        (None, Some("p-orphan"))))
    } finally q.stop()

    // batch twin: identical rows from the same data
    val cb = Seq(Ev(1, ts(0), "c1", 0), Ev(2, ts(0), "c2-dry", 0))
      .toDF().withColumnRenamed("event_type", "cv")
    val pb = Seq(Ev(1, ts(3), "p-in", 0), Ev(3, ts(1), "p-orphan", 0))
      .toDF().withColumnRenamed("event_type", "pv")
    val twin = EventAnalytics.intervalJoin(cb, pb, key = "user_id",
        maxDelay = "5 minutes", joinType = "full_outer")
      .select(col("l.cv"), col("r.pv")).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSet
    assert(twin == Set((Some("c1"), Some("p-in")), (Some("c2-dry"), None),
      (None, Some("p-orphan"))))
  }
}
