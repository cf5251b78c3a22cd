package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Dedup

class StreamingDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
    (4L, "completely different content about spark distributed query engines and shuffles"),
    (5L, "another unrelated document describing minhash signatures and lsh banding methods"),
    (6L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (7L, "completely different content about spark distributed query engines and buffers")
  )

  private def batchTwin: Map[Long, Long] =
    Dedup.minHashLshPairs(docs.toDF("doc_id", "text"), threshold = 0.5)
      .groupBy(col("id_b")).agg(min("id_a").as("dup_of"))
      .as[(Long, Long)].collect().toMap

  test("streaming near-dup flags equal the batch reduction regardless of batch splits") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val banded = StreamingDedup.bandedSigs(input.toDF().toDF("doc_id", "text"))
    val q = StreamingDedup.nearDupFlags(banded, threshold = 0.5)
      .writeStream.outputMode("append").format("memory").queryName("ndf")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      // split mid-duplicate-group: 1-3 arrive, then 4-7 (6 dups 1 across
      // the batch boundary, 2 dups 1 within the first batch)
      input.addData(docs.take(3))
      q.processAllAvailable()
      input.addData(docs.drop(3))
      q.processAllAvailable()
      val streamed = spark.table("ndf")
        .groupBy("doc_id").agg(min("dup_of").as("dup_of"))
        .as[(Long, Long)].collect().toMap
      assert(streamed == batchTwin)
      assert(streamed(2L) == 1L && streamed(6L) == 1L) // cross-batch flag
    } finally q.stop()
  }

  test("single-batch arrival gives the same flags (in-batch ordering is by id)") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val banded = StreamingDedup.bandedSigs(input.toDF().toDF("doc_id", "text"))
    val q = StreamingDedup.nearDupFlags(banded, threshold = 0.5)
      .writeStream.outputMode("append").format("memory").queryName("ndf1")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      input.addData(docs.reverse) // arrival order must not matter
      q.processAllAvailable()
      val streamed = spark.table("ndf1")
        .groupBy("doc_id").agg(min("dup_of").as("dup_of"))
        .as[(Long, Long)].collect().toMap
      assert(streamed == batchTwin)
    } finally q.stop()
  }

  test("bucket cap bounds state but earlier entries still flag later docs") {
    implicit val sq = spark.sqlContext
    // 30 identical docs, cap 4: every doc after the first must still flag 0
    val flood = (0L until 30L).map(i => (i, "same same same same same text here"))
    val input = MemoryStream[(Long, String)]
    val banded = StreamingDedup.bandedSigs(input.toDF().toDF("doc_id", "text"))
    val q = StreamingDedup.nearDupFlags(banded, threshold = 0.5, maxBucket = 4)
      .writeStream.outputMode("append").format("memory").queryName("ndf2")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      input.addData(flood)
      q.processAllAvailable()
      val streamed = spark.table("ndf2")
        .groupBy("doc_id").agg(min("dup_of").as("dup_of"))
        .as[(Long, Long)].collect().toMap
      assert(streamed == (1L until 30L).map(i => i -> 0L).toMap)
    } finally q.stop()
  }
}
