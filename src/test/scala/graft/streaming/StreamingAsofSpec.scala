package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Joins

class StreamingAsofSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val MIN = 60000L

  private def left(key: Long, tMin: Long, id: Long) =
    AsofRow(key, is_left = true, tMin * MIN, id, 0.0)
  private def right(key: Long, tMin: Long, id: Long, v: Double) =
    AsofRow(key, is_left = false, tMin * MIN, id, v)

  /** Run the streaming operator over `batches` (a trigger per batch) with a
    * `delayMin`-minute watermark, returning the emitted matches. */
  private def runStream(delayMin: Int, batches: Seq[Seq[AsofRow]]): Set[AsofMatch] = {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[AsofRow]
    val tagged = input.toDS()
      .withColumn("ts", timestamp_millis(col("t")))
      .withWatermark("ts", s"$delayMin minutes")
    val out = StreamingAsof.asofStream(tagged)
    val name = s"asof_out_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(name).trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // drain: the first far-future row advances the watermark at its
      // batch END; the second batch then fires every pending group's
      // event-time timeout (timeouts fire on the NEXT batch after the
      // watermark passes them)
      input.addData(left(999L, 1000000L, 999998L))
      q.processAllAvailable()
      input.addData(left(999L, 2000000L, 999999L))
      q.processAllAvailable()
      spark.table(name).as[AsofMatch].collect().toSet
        .filterNot(_.key == 999L)
    } finally q.stop()
  }

  private def batchAsof(rows: Seq[AsofRow]): Set[AsofMatch] = {
    val lefts = rows.filter(_.is_left).map(r => (r.key, r.t, r.id))
      .toDF("key", "t", "id")
    val rights = rows.filterNot(_.is_left).map(r => (r.key, r.t, r.id, r.v))
      .toDF("rkey", "rt", "rid", "rv")
    Joins.asofBackward(lefts, rights,
        leftKey = col("key"), rightKey = col("rkey"),
        leftTime = col("t"), rightTime = col("rt"),
        rightId = col("rid"), rightCols = Seq("rid", "rt", "rv"))
      .select(col("id").as("left_id"), col("key"), col("t").as("ltime"),
        col("rid").as("right_id"), col("rt").as("rtime"), col("rv").as("rval"))
      .as[AsofMatch].collect().toSet
  }

  private val base = Seq(
    right(1L, 10, 100L, 1.0), right(1L, 20, 101L, 2.0),
    left(1L, 15, 1L), left(1L, 25, 2L), left(1L, 5, 3L),
    right(2L, 30, 200L, 9.0), left(2L, 29, 4L), left(2L, 31, 5L))

  test("stream equals batch as-of regardless of trigger slicing") {
    val expected = batchAsof(base)
    assert(expected.nonEmpty)
    // delay 60 min > the whole 31-min data span, so no slicing can make a
    // row late — every slicing must reproduce the batch join exactly
    for (slices <- Seq(Seq(base), base.grouped(3).toSeq, base.map(Seq(_)))) {
      assert(runStream(delayMin = 60, slices) == expected,
        s"slicing ${slices.map(_.size)}")
    }
  }

  test("equal-time tie picks the largest right id; no-match emits nulls") {
    val rows = Seq(right(7L, 10, 70L, 1.0), right(7L, 10, 71L, 2.0),
      left(7L, 10, 1L), left(7L, 9, 2L))
    val out = runStream(60, Seq(rows))
    assert(out == Set(
      AsofMatch(1L, 7L, 10 * MIN, Some(71L), Some(10 * MIN), Some(2.0)),
      AsofMatch(2L, 7L, 9 * MIN, None, None, None)))
  }

  test("out-of-order arrivals inside the watermark still match; results " +
      "emit only once the watermark passes the left") {
    // right arrives AFTER the left it should match, within the delay
    val batches = Seq(
      Seq(left(3L, 50, 10L)),
      Seq(right(3L, 45, 300L, 5.0)), // older right, arrives later — in time
      Seq(right(3L, 49, 301L, 6.0))) // even later, still <= left time
    val out = runStream(delayMin = 30, batches)
    assert(out == Set(
      AsofMatch(10L, 3L, 50 * MIN, Some(301L), Some(49 * MIN), Some(6.0))))
  }

  test("dominated-right pruning keeps exactly the latest passed right") {
    val (m1, keep) = StreamingAsof.foldKey(
      Seq(right(1L, 10, 100L, 1.0), right(1L, 20, 101L, 2.0),
        right(1L, 30, 102L, 3.0), right(1L, 45, 103L, 4.0)),
      wm = 40 * MIN)
    assert(m1.isEmpty)
    // rights at 10/20 are dominated by 30; 45 is beyond the watermark
    assert(keep.toSet == Set(right(1L, 45, 103L, 4.0), right(1L, 30, 102L, 3.0)))
    // a later left at t=44 must match the kept t=30 right
    val (m2, _) = StreamingAsof.foldKey(keep :+ left(1L, 44, 9L), wm = 50 * MIN)
    assert(m2 == Seq(AsofMatch(9L, 1L, 44 * MIN, Some(102L), Some(30 * MIN), Some(3.0))))
  }

  test("timeout drains a pending left when the watermark advances via " +
      "OTHER keys (no new arrivals on this key)") {
    val batches = Seq(
      Seq(left(5L, 10, 50L), right(5L, 8, 500L, 7.0)),
      Seq(right(6L, 1000, 600L, 0.0))) // unrelated key pushes the watermark
    val out = runStream(delayMin = 5, batches).filter(_.key == 5L)
    assert(out == Set(
      AsofMatch(50L, 5L, 10 * MIN, Some(500L), Some(8 * MIN), Some(7.0))))
  }

  test("epoch fold equals batch as-of when slicing respects the watermark") {
    val rows = base
    val df = rows.toDF()
      // epochs by time tercile: <=15 min, <=29 min, rest
      .withColumn("_epoch",
        when(col("t") <= 15 * MIN, 0)
          .when(col("t") <= 29 * MIN, 1).otherwise(2))
    val folded = StreamingAsof.asofFold(df, nEpochs = 3,
        e => Seq(15L * MIN, 29L * MIN, Long.MaxValue / 2)(e))
      .collect().toSet
    assert(folded == batchAsof(rows))
  }
}
