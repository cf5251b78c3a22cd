package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Packed .bin/.idx token-corpus export/import: exact roundtrip (ids AND
  * order), idempotent overwrite, loud failure on torn or foreign files. */
class PackedCorpusSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val corpus: Seq[(Long, Seq[Int])] = Seq(
    (1L, Seq(5, 0, 7, 7, 3)),
    (2L, Seq(-1, 2)),                   // unknown-token id roundtrips too
    (3L, Seq.empty[Int]),               // zero-length sequence
    (4L, (0 until 100).map(i => i * 3)),
    (5L, Seq(Int.MaxValue, Int.MinValue))) // full int32 range

  test("write/read roundtrips ids, order, and zero-length sequences exactly") {
    val dir = Files.createTempDirectory("packed-rt").toString
    val df = corpus.toDF("doc_id", "token_ids").repartition(3)
    val metas = PackedCorpus.write(df, dir)
    assert(metas.map(_.nSeqs).sum == 5)
    assert(metas.map(_.nTokens).sum == corpus.map(_._2.size).sum)
    val back = PackedCorpus.read(spark, dir)
      .as[(Long, Seq[Int])].collect().toMap
    assert(back == corpus.toMap, "roundtrip must preserve ids AND token order")
  }

  test("re-writing the same partitioning overwrites, never duplicates") {
    val dir = Files.createTempDirectory("packed-idem").toString
    val df = corpus.toDF("doc_id", "token_ids").repartition(2)
    PackedCorpus.write(df, dir)
    PackedCorpus.write(df, dir) // epoch replay / task retry
    assert(PackedCorpus.read(spark, dir).count() == 5)
    val parts = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.endsWith(".bin"))
    assert(parts.length <= 2, s"replay must not grow the part set: ${parts.toSeq}")
  }

  test("a torn part pair and a foreign index fail loudly") {
    val dir = Files.createTempDirectory("packed-torn").toString
    PackedCorpus.write(corpus.toDF("doc_id", "token_ids").coalesce(1), dir)
    val bin = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".bin")).get
    // truncate the token stream under its index
    val raw = Files.readAllBytes(bin.toPath)
    Files.write(bin.toPath, raw.dropRight(4))
    val e = intercept[Exception] { PackedCorpus.read(spark, dir).collect() }
    assert(e.getMessage != null)
    // foreign bytes where the index should be
    val dir2 = Files.createTempDirectory("packed-magic").toString
    Files.write(Paths.get(dir2, "part-00000.idx"), "not an index".getBytes)
    Files.write(Paths.get(dir2, "part-00000.bin"), Array.empty[Byte])
    val e2 = intercept[Exception] { PackedCorpus.read(spark, dir2).collect() }
    assert(e2.getMessage != null)
  }

  test("standing export resumes after restart; epoch union loses and duplicates nothing") {
    val inDir = Files.createTempDirectory("packed-stream-in")
    val outDir = Files.createTempDirectory("packed-stream-out").toString
    val cpDir = Files.createTempDirectory("packed-stream-cp").toString
    def writeBatch(name: String, rows: Seq[(Long, Seq[Int])]): Unit =
      Files.writeString(inDir.resolve(name),
        rows.map { case (i, t) =>
          s"""{"doc_id":$i,"token_ids":[${t.mkString(",")}]}"""
        }.mkString("", "\n", "\n"))
    def stream = spark.readStream
      .schema("doc_id long, token_ids array<int>")
      .option("maxFilesPerTrigger", 1)
      .json(inDir.toString)

    val all = (0L until 12L).map(i => (i, (0 to i.toInt).map(_ * 2)))
    writeBatch("b1.json", all.slice(0, 4))
    val q1 = PackedCorpus.run(stream, outDir, cpDir)
    q1.processAllAvailable(); q1.stop()
    writeBatch("b2.json", all.slice(4, 8))
    writeBatch("b3.json", all.slice(8, 12))
    val q2 = PackedCorpus.run(stream, outDir, cpDir)
    q2.processAllAvailable(); q2.stop()

    val back = PackedCorpus.readAll(spark, outDir)
      .as[(Long, Seq[Int])].collect()
    assert(back.length == 12, "restart must not lose or duplicate sequences")
    assert(back.toMap == all.toMap)
    // epochs landed as separate subdirectories
    val epochs = new java.io.File(outDir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(epochs.size >= 2 && epochs.forall(_.startsWith("epoch=")), epochs)
  }

  test("reading a never-written directory yields zero sequences, not an NPE") {
    val missing = Files.createTempDirectory("packed-missing").toString + "/nope"
    assert(PackedCorpus.read(spark, missing).count() == 0)
  }

  test("compact folds epochs into epoch=-1, preserves content, and recovers a torn swap") {
    val dir = Files.createTempDirectory("packed-compact").toString
    val epochs = Seq(corpus.take(2), corpus.slice(2, 4), corpus.drop(4))
    epochs.zipWithIndex.foreach { case (rows, e) =>
      PackedCorpus.writeEpoch(rows.toDF("doc_id", "token_ids").coalesce(1),
        dir, e.toLong)
    }
    val want = PackedCorpus.readAll(spark, dir)
      .as[(Long, Seq[Int])].collect().toMap
    assert(want == corpus.toMap)
    PackedCorpus.compact(spark, dir, numParts = 2)
    val subs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(subs == Set("epoch=-1"), s"only the compacted epoch may remain: $subs")
    assert(PackedCorpus.readAll(spark, dir)
      .as[(Long, Seq[Int])].collect().toMap == want,
      "compaction must preserve every sequence exactly")
    // appending a NEW epoch after compaction unions with the compacted set
    PackedCorpus.writeEpoch(Seq((100L, Seq(9, 9)))
      .toDF("doc_id", "token_ids").coalesce(1), dir, 3L)
    assert(PackedCorpus.readAll(spark, dir).count() == corpus.size + 1)
    // maintenance is repeatable: compact again over (epoch=-1, epoch=3)
    PackedCorpus.compact(spark, dir, numParts = 1)
    assert(PackedCorpus.readAll(spark, dir)
      .as[(Long, Seq[Int])].collect().toMap == want + (100L -> Seq(9, 9)))
    // crash between delete and rename leaves dir missing + a complete
    // staging sibling — the next compact's recover() finishes the swap
    val src = java.nio.file.Paths.get(dir)
    val staging = java.nio.file.Paths.get(dir + ".compacting")
    Files.move(src, staging)
    PackedCorpus.compact(spark, dir, numParts = 1)
    assert(PackedCorpus.readAll(spark, dir)
      .as[(Long, Seq[Int])].collect().toMap == want + (100L -> Seq(9, 9)),
      "recover must finish the interrupted swap before compacting")
  }

  test("tombstones mask readAll immediately; compact purges bytes and clears the store") {
    val dir = Files.createTempDirectory("packed-tomb").toString
    PackedCorpus.writeEpoch(corpus.take(3).toDF("doc_id", "token_ids")
      .coalesce(1), dir, 0L)
    PackedCorpus.writeEpoch(corpus.drop(3).toDF("doc_id", "token_ids")
      .coalesce(1), dir, 1L)
    // one victim per epoch + an id that never landed (harmless no-op)
    PackedCorpus.deleteEpoch(Seq(2L, 4L, 999L).toDF("doc_id"), dir, 0L)
    val masked = PackedCorpus.readAll(spark, dir)
      .as[(Long, Seq[Int])].collect().toMap
    assert(masked == (corpus.toMap - 2L - 4L),
      "tombstoned docs must vanish from reads before any compaction")
    // a RE-APPEND of a tombstoned id stays masked until compact clears it
    PackedCorpus.writeEpoch(Seq((2L, Seq(8, 8)))
      .toDF("doc_id", "token_ids").coalesce(1), dir, 2L)
    assert(!PackedCorpus.readAll(spark, dir).as[(Long, Seq[Int])]
      .collect().toMap.contains(2L),
      "a tombstone dominates re-appends until a compact clears it")
    PackedCorpus.compact(spark, dir, numParts = 1)
    val f = new java.io.File(dir)
    assert(f.listFiles().filter(_.isDirectory).map(_.getName).toSet ==
      Set("epoch=-1"), "only the compacted epoch may remain")
    assert(!new java.io.File(dir, "tombstones").exists(),
      "the swap must retire the applied tombstone store")
    // the BYTES are purged: with the store cleared and only epoch=-1 on
    // disk, this readAll is an unmasked scan of the rewritten pairs
    val survivors = PackedCorpus.readAll(spark, dir)
      .as[(Long, Seq[Int])].collect().toMap
    assert(survivors == (corpus.toMap - 2L - 4L),
      "compaction must drop tombstoned sequences from the rewrite")
    // post-compact re-append RESURRECTS the id (tombstone was cleared)
    PackedCorpus.writeEpoch(Seq((2L, Seq(8, 8)))
      .toDF("doc_id", "token_ids").coalesce(1), dir, 3L)
    assert(PackedCorpus.readAll(spark, dir).as[(Long, Seq[Int])]
      .collect().toMap == (corpus.toMap - 4L) + (2L -> Seq(8, 8)),
      "after the clear, a re-append must land like any other sequence")
  }

  test("re-writing with FEWER partitions truncates the wider run's stale pairs") {
    val dir = Files.createTempDirectory("packed-shrink").toString
    PackedCorpus.write(
      corpus.toDF("doc_id", "token_ids").repartitionByRange(3, col("doc_id")),
      dir)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".bin")) > 1, "precondition: wider first run")
    // replayed epoch plans ONE partition — the old pairs must not survive
    val sub = corpus.take(2)
    PackedCorpus.write(sub.toDF("doc_id", "token_ids").coalesce(1), dir)
    val back = PackedCorpus.read(spark, dir).as[(Long, Seq[Int])].collect()
    assert(back.toMap == sub.toMap,
      "stale pairs from the wider run must not union ghost sequences in")
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".bin")) == 1,
      "truncate-before-write must remove the stale pairs themselves")
  }

  test("sequenceIterator is lazy, closes on exhaustion/error/close(), and spans a > buffer part") {
    def pack(tokens: Seq[Int]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(tokens.size * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      tokens.foreach(bb.putInt); bb.array()
    }
    class Track(raw: Array[Byte]) extends java.io.ByteArrayInputStream(raw) {
      var closed = false
      override def close(): Unit = { closed = true; super.close() }
    }
    // one sequence larger than the 1 MiB read buffer + two small ones
    val big = (0 until 400000).toSeq // 1.6 MB of int32
    val seqs = Seq(1L -> big, 2L -> Seq(7), 3L -> Seq(8, 9))
    val entries = seqs.scanLeft((0L, 0L, 0)) { case ((_, off, len), (id, t)) =>
      (id, off + len, t.size) }.tail.toIndexedSeq
    val raw = pack(seqs.flatMap(_._2))
    var opens = 0
    var t: Track = null
    val it = PackedCorpus.sequenceIterator(entries,
      () => { opens += 1; t = new Track(raw)
        new java.io.BufferedInputStream(t, 1 << 20) }, "test-part")
    assert(opens == 0, "must not open the bin before the first pull")
    assert(it.next() == ((1L, big)))
    assert(opens == 1 && !t.closed, "mid-iteration the stream stays open")
    assert(it.next() == ((2L, Seq(7))))
    assert(it.next() == ((3L, Seq(8, 9))))
    assert(t.closed, "exhaustion must close the stream")
    assert(!it.hasNext)
    // error path: index claims more tokens than the stream holds
    val it2 = PackedCorpus.sequenceIterator(IndexedSeq((1L, 0L, 9)),
      () => { t = new Track(pack(Seq(1))); t }, "torn-part")
    intercept[Exception] { it2.next() }
    assert(t.closed, "a decode error must close the stream")
    // close() mid-iteration is terminal and idempotent
    val it3 = PackedCorpus.sequenceIterator(entries,
      () => { t = new Track(raw); t }, "closed-part")
    it3.next()
    it3.close()
    assert(t.closed && !it3.hasNext)
    it3.close() // idempotent
  }

  test("a single sequence larger than the read buffer roundtrips through write/read") {
    val dir = Files.createTempDirectory("packed-big").toString
    val big = (0 until 300000).map(i => i ^ 0x5a5a)
    PackedCorpus.write(Seq((42L, big)).toDF("doc_id", "token_ids").coalesce(1), dir)
    val back = PackedCorpus.read(spark, dir).as[(Long, Seq[Int])].collect()
    assert(back.length == 1 && back.head._1 == 42L && back.head._2 == big)
  }

  test("long-typed id arrays cast on write; overflowing ids fail loudly") {
    val dir = Files.createTempDirectory("packed-long").toString
    // vid columns come out of Vocab.encode as array<bigint>
    val df = Seq((1L, Seq(1L, -1L, 255L))).toDF("doc_id", "token_ids")
    PackedCorpus.write(df, dir)
    assert(PackedCorpus.read(spark, dir).as[(Long, Seq[Int])].collect()
      .toSeq == Seq((1L, Seq(1, -1, 255))))
    val over = Seq((2L, Seq(Long.MaxValue))).toDF("doc_id", "token_ids")
    intercept[Exception] {
      PackedCorpus.write(over, Files.createTempDirectory("packed-ovf").toString)
    }
  }
}
