package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.LineDedup

class StreamingLineDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // arrival order (epoch, id): doc 9 arrives in epoch 0 and owns
  // "shared line" even though doc 2 (< 9) carries it too — doc 2 arrives
  // in epoch 2, AFTER the owner. Keep-first-by-ARRIVAL, not by id.
  private val docs = Seq(
    (9L, 0, "shared line\nnine only"),
    (10L, 0, "ten only\ncommon tail"),
    (5L, 1, "five only\ncommon tail"),
    (2L, 2, "shared line\ntwo only"),
    (7L, 2, "shared line\ncommon tail\nseven only"))

  /** Brute-force arrival-order reference over (epoch, doc_id, pos). */
  private def reference: Map[(Long, Long), Boolean] = {
    val arrivals = docs.flatMap { case (id, e, text) =>
      text.split(java.util.regex.Pattern.quote("\n"), -1)
        .zipWithIndex.map { case (l, p) => (e, id, p.toLong, l) }
    }.sortBy { case (e, id, p, _) => (e, id, p) }
    val seen = scala.collection.mutable.Set[String]()
    arrivals.map { case (_, id, p, l) =>
      val keep = !seen(l)
      if (keep) seen += l
      (id, p) -> keep
    }.toMap
  }

  test("one-epoch fold equals the batch keep-first operator") {
    val flat = docs.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text")
    val batch = LineDedup.dedupLines(flat)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val fold = StreamingLineDedup.dedupFold(
        flat.withColumn("_epoch", lit(0)), nEpochs = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(fold === batch)
  }

  test("fold: arrival order owns lines across epochs (state carry)") {
    val df = docs.toDF("doc_id", "_epoch", "text")
      .select(col("doc_id"), col("text"), col("_epoch"))
    val got = StreamingLineDedup.dedupFold(df, nEpochs = 3)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    val ref = reference
    def expectKept(id: Long, n: Int): Unit = {
      val kept = ref.collect { case ((d, _), true) if d == id => 1 }.sum
      assert(kept === n, s"reference self-check doc $id")
      assert(got(id)._3 === n.toLong, s"doc $id kept")
    }
    // doc 9 owns "shared line"; doc 2 keeps only "two only"
    expectKept(9L, 2); expectKept(10L, 2); expectKept(5L, 1)
    expectKept(2L, 1); expectKept(7L, 1)
    assert(got(2L)._1 === 2) // epoch attribution rides along
  }

  test("verdicts under the RocksDB provider match the default provider") {
    implicit val sq = spark.sqlContext
    def runWith(provider: Option[String], name: String): Map[(Long, Long), Boolean] = {
      val input = MemoryStream[(Long, String, Int)]
      val lines = StreamingLineDedup.lineArrivals(
        input.toDF().toDF("doc_id", "text", "_epoch"))
      val q = StateStores.withProvider(spark, provider) {
        StreamingLineDedup.verdicts(lines)
          .writeStream.outputMode("append").format("memory").queryName(name)
          .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      }
      try {
        for (e <- 0 until 3) {
          input.addData(docs.filter(_._2 == e).map(d => (d._1, d._3, d._2)))
          q.processAllAvailable()
        }
        spark.table(name).select("doc_id", "pos", "kept")
          .as[(Long, Long, Boolean)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
      } finally q.stop()
    }
    val rocks = runWith(Some("rocksdb"), "sld_rocks")
    assert(rocks === reference)
    assert(rocks === runWith(None, "sld_default"))
  }

  test("streaming verdicts equal the fold/brute-force across batch splits") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String, Int)]
    val lines = StreamingLineDedup.lineArrivals(
      input.toDF().toDF("doc_id", "text", "_epoch"))
    val q = StreamingLineDedup.verdicts(lines)
      .writeStream.outputMode("append").format("memory").queryName("sld")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      for (e <- 0 until 3) {
        input.addData(docs.filter(_._2 == e).map(d => (d._1, d._3, d._2)))
        q.processAllAvailable()
      }
      val streamed = spark.table("sld")
        .select("doc_id", "pos", "kept")
        .as[(Long, Long, Boolean)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(streamed === reference)
    } finally q.stop()
  }
}
