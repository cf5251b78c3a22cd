package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StreamingCurationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // exercises every stage: 3 fails quality (short), 4 exact-dups 1 across a
  // batch boundary, 5 near-dups 1 (one token differs), 7 shares a 4-gram
  // with the probe, the rest are kept
  private val docsAll = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "completely different content about the spark distributed query engines and shuffles"),
    (3L, "x!"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (5L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
    (6L, "a totally fresh subject in this corpus about glaciers and the mountain weather patterns"),
    (7L, "this document contains the secret benchmark probe phrase for decontamination checks"),
    (8L, "the final document is about cooking pasta and the joy of sharing a meal"),
    (9L, ""),      // empty text: zero tokens, no signature — must not throw
    (10L, "   "))  // whitespace-only: tokens() yields nothing
  private val probes = Seq(
    (1000L, "the secret benchmark probe phrase for decontamination"))

  private def tempDir(prefix: String) = Files.createTempDirectory(prefix)

  private def foldVerdict(nBatches: Int): Map[Long, (String, Option[Long])] =
    StreamingCuration.curateFold(
        docsAll.toDF("doc_id", "text"), probes.toDF("doc_id", "text"), nBatches)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap

  test("curateFold is batch-boundary invariant and stages are as designed") {
    val one = foldVerdict(1)
    assert(one.keySet == docsAll.map(_._1).toSet) // one verdict per doc
    assert(one(3L)._1 == "quality")
    assert(one(1L)._1 == "kept")
    assert(one(4L)._1 == "exact_dup")
    assert(one(5L)._1 == "near_dup")
    assert(one(7L)._1 == "contaminated")
    assert(one(2L)._1 == "kept" && one(6L)._1 == "kept" && one(8L)._1 == "kept")
    // degenerate docs fail the quality floor instead of crashing any stage
    assert(one(9L)._1 == "quality" && one(10L)._1 == "quality")
    // kept docs carry a shard, dropped docs don't
    assert(one.values.forall { case (st, sh) => (st == "kept") == sh.isDefined })
    assert(foldVerdict(2) == one)
    assert(foldVerdict(4) == one)
    assert(foldVerdict(8) == one)
  }

  test("standing pipeline resumes after restart without loss or dupes and matches the fold") {
    val inDir = tempDir("graft-cur-in")
    val stateDir = tempDir("graft-cur-state").toString
    val cpDir = tempDir("graft-cur-cp").toString
    def writeBatch(name: String, docs: Seq[(Long, String)]): Unit =
      Files.writeString(inDir.resolve(name),
        docs.map { case (i, t) => s"""{"doc_id":$i,"text":"$t"}""" }
          .mkString("", "\n", "\n"))
    def stream = spark.readStream
      .schema("doc_id long, text string")
      .option("maxFilesPerTrigger", 1) // one file per micro-batch
      .json(inDir.toString)
    val probesDf = probes.toDF("doc_id", "text")

    writeBatch("b1.json", docsAll.take(3))
    val q1 = StreamingCuration.run(stream, probesDf, stateDir, cpDir)
    q1.processAllAvailable()
    q1.stop()
    assert(StreamingCuration.verdicts(spark, stateDir).count() == 3)

    // compact the one-epoch state while stopped: the restart below then
    // runs against batch=-1 directories — results must be unchanged
    StreamingCuration.compactState(spark, stateDir)
    assert(new java.io.File(s"$stateDir/digests").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet == Set("batch=-1"))

    // restart from the checkpoint with two more files — the resumed query
    // must process only the new files, judged against the at-rest state
    writeBatch("b2.json", docsAll.slice(3, 6))
    writeBatch("b3.json", docsAll.drop(6))
    val q2 = StreamingCuration.run(stream, probesDf, stateDir, cpDir)
    q2.processAllAvailable()
    q2.stop()

    val streamed = StreamingCuration.verdicts(spark, stateDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(streamed.size == docsAll.size) // no loss, no dupes
    assert(streamed == foldVerdict(1))
    // cross-restart state: 4 exact-dups 1 (batch 1) judged after restart
    assert(streamed(4L)._1 == "exact_dup" && streamed(5L)._1 == "near_dup")
  }

  test("tombstones erase the dedup fingerprints: re-submitted copies are admitted") {
    val inDir = tempDir("graft-curtomb-in")
    val stateDir = tempDir("graft-curtomb-state").toString
    val cpDir = tempDir("graft-curtomb-cp").toString
    def writeBatch(name: String, docs: Seq[(Long, String)]): Unit =
      Files.writeString(inDir.resolve(name),
        docs.map { case (i, t) => s"""{"doc_id":$i,"text":"$t"}""" }
          .mkString("", "\n", "\n"))
    def stream = spark.readStream
      .schema("doc_id long, text string")
      .option("maxFilesPerTrigger", 1)
      .json(inDir.toString)
    val probesDf = probes.toDF("doc_id", "text")

    writeBatch("b1.json", docsAll.take(2)) // docs 1 and 2, both kept
    val q1 = StreamingCuration.run(stream, probesDf, stateDir, cpDir)
    q1.processAllAvailable(); q1.stop()
    assert(StreamingCuration.verdicts(spark, stateDir).count() == 2)

    // forget doc 1: its verdict vanishes from reads immediately
    StreamingCuration.deleteEpoch(Seq(1L).toDF("doc_id"), stateDir, 0L)
    assert(StreamingCuration.verdicts(spark, stateDir)
      .select("doc_id").as[Long].collect().toSet == Set(2L),
      "a tombstoned doc must vanish from the verdict relation immediately")

    // an exact copy (101) and a near copy (102) of the ERASED doc arrive:
    // with the fingerprints masked both must be ADMITTED, while a copy
    // of the still-present doc 2 (103) is still suppressed
    writeBatch("b2.json", Seq(
      (101L, docsAll.head._2),
      (102L, docsAll(4)._2),  // doc 5's text = near-dup of doc 1's
      (103L, docsAll(1)._2)))
    val q2 = StreamingCuration.run(stream, probesDf, stateDir, cpDir)
    q2.processAllAvailable(); q2.stop()
    val after = StreamingCuration.verdicts(spark, stateDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after(101L) == "kept",
      "an exact copy of an erased doc must be admitted, not exact_dup")
    assert(after(102L) == "near_dup",
      "the re-admitted copy's OWN fingerprints re-arm dedup (101 is state)")
    assert(after(103L) == "exact_dup",
      "deleting doc 1 must not erase doc 2's fingerprints")

    // compact purges the erased doc from the at-rest bytes + clears the store
    StreamingCuration.compactState(spark, stateDir)
    assert(!new java.io.File(s"$stateDir/tombstones").exists(),
      "compaction must retire the applied tombstone store")
    assert(spark.read.parquet(s"$stateDir/digests").filter(col("id") === 1L).count() == 0,
      "the erased doc's digest must be gone from the rewritten bytes")
    assert(spark.read.parquet(s"$stateDir/sigs").filter(col("id") === 1L).count() == 0,
      "the erased doc's signatures must be gone from the rewritten bytes")
    assert(StreamingCuration.verdicts(spark, stateDir)
      .filter(col("doc_id") === 1L).count() == 0)
  }
}
