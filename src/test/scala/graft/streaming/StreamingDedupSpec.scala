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

  test("foldBucket: one hot key in one trigger stays bounded past sortCap, flags still emitted") {
    // one band bucket, 100 identical-signature docs in a single trigger,
    // sortCap 8: only 8 rows are ever buffered; the other 92 process in
    // arrival order and are counted as overflow — never silently dropped
    val sig = Seq(1L, 2L, 3L, 4L)
    val rows = (0L until 100L).map(i => BandedSig(0, 7L, i, sig))
    val (st, flags, over) = StreamingDedup.foldBucket(
      BucketEntries(Nil, Nil), rows.iterator, threshold = 0.5, maxBucket = 4, sortCap = 8)
    assert(over == 92L)
    assert(st.ids.length == 4) // state capped
    assert(st.ids == st.ids.sorted) // ascending invariant
    // ascending arrival ⇒ identical to the unbounded fold: every doc > 0 flags 0
    assert(flags.map(f => (f.doc_id, f.dup_of)).toSet ==
      (1L until 100L).map(i => (i, 0L)).toSet)
  }

  test("foldBucket: within sortCap the fold is arrival-order independent (id-order replay)") {
    val sig = Seq(1L, 2L, 3L, 4L)
    val other = Seq(9L, 9L, 9L, 9L)
    val rows = Seq(BandedSig(0, 7L, 5L, sig), BandedSig(0, 7L, 1L, sig),
      BandedSig(0, 7L, 3L, other), BandedSig(0, 7L, 2L, sig))
    for (perm <- rows.permutations) {
      val (st, flags, over) = StreamingDedup.foldBucket(
        BucketEntries(Nil, Nil), perm.iterator, threshold = 0.5, maxBucket = 16, sortCap = 64)
      assert(over == 0L)
      assert(st.ids == Seq(1L, 2L, 3L, 5L))
      assert(flags.map(f => (f.doc_id, f.dup_of)).toSet == Set((2L, 1L), (5L, 1L)))
    }
  }

  test("foldBucket: late trigger with smaller ids keeps state ascending and matches earlier-id only") {
    val sig = Seq(1L, 2L, 3L, 4L)
    val t1 = StreamingDedup.foldBucket(BucketEntries(Nil, Nil),
      Iterator(BandedSig(0, 7L, 10L, sig), BandedSig(0, 7L, 20L, sig)),
      threshold = 0.5, maxBucket = 16, sortCap = 64)
    // a late doc 5 (smaller than every resident id) must not flag — there
    // is no earlier qualifying id — and must insert in sorted position
    val (st2, flags2, _) = StreamingDedup.foldBucket(t1._1,
      Iterator(BandedSig(0, 7L, 5L, sig)), threshold = 0.5, maxBucket = 16, sortCap = 64)
    assert(flags2.isEmpty)
    assert(st2.ids == Seq(5L, 10L, 20L))
    // and a still-later doc 12 flags the true minimum (5), not arrival order
    val (_, flags3, _) = StreamingDedup.foldBucket(st2,
      Iterator(BandedSig(0, 7L, 12L, sig)), threshold = 0.5, maxBucket = 16, sortCap = 64)
    assert(flags3.map(f => (f.doc_id, f.dup_of)) == Seq((12L, 5L)))
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

  test("near-dup flags under the RocksDB provider match the in-heap run") {
    // the LSH band-bucket state carries (id, 64-long signature) lists —
    // a heavier per-key payload than the sessionizer StateStoreProviderSpec
    // pins; this generalizes the provider contract to the dedup family
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val banded = StreamingDedup.bandedSigs(input.toDF().toDF("doc_id", "text"))
    val q = StateStores.withProvider(spark, Some("rocksdb")) {
      StreamingDedup.nearDupFlags(banded, threshold = 0.5)
        .writeStream.outputMode("append").format("memory").queryName("ndf_rocks")
        .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    }
    try {
      input.addData(docs.take(3))
      q.processAllAvailable()
      input.addData(docs.drop(3))
      q.processAllAvailable()
      val engaged = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq)
        .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
        .exists(_.toLowerCase.contains("rocksdb"))
      assert(engaged, "RocksDB provider did not engage for the dedup state")
      val streamed = spark.table("ndf_rocks")
        .groupBy("doc_id").agg(min("dup_of").as("dup_of"))
        .as[(Long, Long)].collect().toMap
      assert(streamed == batchTwin)
    } finally q.stop()
  }
}
