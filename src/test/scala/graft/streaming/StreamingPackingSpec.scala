package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StreamingPackingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val budget = 30L

  test("packFold with one epoch equals the batch FFD operator") {
    val docs = (0L until 40L).map(i => (i, i * 13 % 37 + 3)).toDF("doc_id", "n")
    val fold = StreamingPacking
      .packFold(docs, col("n"), budget, shards = 3, maxOpenBins = 2, nBatches = 1)
      .select("doc_id", "n_tokens", "shard", "bin_id", "bin_pos", "oversize")
      .as[(Long, Long, Int, Long, Int, Boolean)].collect().toSeq.sortBy(_._1)
    val batch = graft.operators.Packing
      .packDocsFirstFit(docs, col("n"), budget = budget, shards = 3, maxOpenBins = 2)
      .select("doc_id", "n_tokens", "shard", "bin_id", "bin_pos", "oversize")
      .as[(Long, Long, Int, Long, Int, Boolean)].collect().toSeq.sortBy(_._1)
    assert(fold == batch)
  }

  test("multi-epoch fold: docs once, budget respected, bins carry across epochs") {
    val docs = (0L until 60L).map(i => (i, i * 13 % 37 + 3)).toDF("doc_id", "n")
    val out = StreamingPacking
      .packFold(docs, col("n"), budget, shards = 3, maxOpenBins = 2, nBatches = 3)
      .select("doc_id", "n_tokens", "bin_id", "oversize", "epoch")
      .as[(Long, Long, Long, Boolean, Long)].collect().toSeq
    assert(out.map(_._1).sorted == (0L until 60L))
    out.groupBy(_._3).foreach { case (_, ms) =>
      if (ms.exists(_._4)) assert(ms.size == 1)
      else assert(ms.map(_._2).sum <= budget)
    }
    // the standing state matters: some bin opened in an earlier epoch
    // receives a doc in a later one
    val firstEpoch = out.groupBy(_._3).view.mapValues(_.map(_._5).min).toMap
    assert(out.exists { case (_, _, bin, _, ep) => ep > firstEpoch(bin) })
  }

  test("run(): streaming with restart equals the fold; replay reads the earlier snapshot") {
    val inDir = Files.createTempDirectory("graft-pack-in")
    val stateDir = Files.createTempDirectory("graft-pack-state").toString
    val cpDir = Files.createTempDirectory("graft-pack-cp").toString
    val all = (0L until 45L).map(i => (i, i * 13 % 37 + 3))
    def writeBatch(name: String, epoch: Int): Unit =
      Files.writeString(inDir.resolve(name),
        all.filter(_._1 % 3 == epoch)
          .map { case (i, n) => s"""{"doc_id":$i,"n":$n}""" }
          .mkString("", "\n", "\n"))
    def stream = spark.readStream
      .schema("doc_id long, n long")
      .option("maxFilesPerTrigger", 1)
      .json(inDir.toString)

    writeBatch("b0.json", 0)
    val q1 = StreamingPacking.run(stream, col("n"), stateDir, cpDir,
      budget, shards = 3, maxOpenBins = 2)
    q1.processAllAvailable()
    q1.stop()
    assert(StreamingPacking.assignments(spark, stateDir).count() == 15)

    // restart from the checkpoint with the remaining epochs
    writeBatch("b1.json", 1)
    writeBatch("b2.json", 2)
    val q2 = StreamingPacking.run(stream, col("n"), stateDir, cpDir,
      budget, shards = 3, maxOpenBins = 2)
    q2.processAllAvailable()
    q2.stop()

    val streamed = StreamingPacking.assignments(spark, stateDir)
      .select("doc_id", "n_tokens", "shard", "bin_id", "bin_pos", "oversize")
      .as[(Long, Long, Int, Long, Int, Boolean)].collect().toSeq.sortBy(_._1)
    val fold = StreamingPacking
      .packFold(all.toDF("doc_id", "n"), col("n"), budget,
        shards = 3, maxOpenBins = 2, nBatches = 3)
      .select("doc_id", "n_tokens", "shard", "bin_id", "bin_pos", "oversize")
      .as[(Long, Long, Int, Long, Int, Boolean)].collect().toSeq.sortBy(_._1)
    assert(streamed == fold) // no loss, no dupes, identical bins across restart

    // snapshot retention: a standing query must not accumulate one bins/
    // snapshot per epoch forever — after epoch e only e and e-1 (the
    // replay seed) survive; assignments (data) are never pruned
    val binDirs = new java.io.File(s"$stateDir/bins").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(binDirs == Seq("batch=1", "batch=2"),
      s"expected pruned snapshots, got $binDirs")
    val assignDirs = new java.io.File(s"$stateDir/assignments").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(assignDirs == Seq("batch=0", "batch=1", "batch=2"))
  }

  test("pruneStateBefore removes only strictly-older snapshots") {
    val dir = Files.createTempDirectory("graft-prune").toString
    (0L to 3L).foreach { i =>
      Seq((1, 0L, 1L, 1, 1L)).toDF("shard", "seq", "fill", "count", "next_seq")
        .write.parquet(s"$dir/batch=$i")
    }
    StreamingPacking.pruneStateBefore(spark, dir, keepFrom = 2L)
    val left = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(left == Seq("batch=2", "batch=3"))
    // pruning an empty/missing dir is a no-op, not an error
    StreamingPacking.pruneStateBefore(spark, s"$dir-missing", keepFrom = 5L)
  }
}
