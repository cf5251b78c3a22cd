package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ThriftLogCodec

class OpsToolsSpec extends AnyFunSuite with SparkTestBase {

  test("ConfigCheck: valid, warned, and broken configs classified per file") {
    val dir = Files.createTempDirectory("graft-confcheck")
    val logDir = Files.createTempDirectory("graft-confcheck-logs")
    Files.writeString(dir.resolve("good.properties"),
      s"logDir=$logDir\nlogStreamRegex=app\\\\.log.*\nwriter.type=noop\n")
    Files.writeString(dir.resolve("held.properties"),
      "logDir=/no/such/dir/graft\nwriter.type=noop\n")
    Files.writeString(dir.resolve("broken.properties"),
      "reader.type=thrift\nreader.thrift.maxMessageSize=not-a-number\n" +
        s"logDir=$logDir\nwriter.type=noop\n")
    val problems = ConfigCheck.check(dir).toMap
    assert(!problems.contains("good.properties"))
    assert(problems("held.properties").startsWith("warn: logDir"))
    assert(problems("broken.properties").startsWith("error:"))
  }

  test("ConfigCheck: empty/missing directory is an error") {
    assert(ConfigCheck.check(java.nio.file.Paths.get("/no/such/graft/dir"))
      .exists(_._2.startsWith("error")))
    val empty = Files.createTempDirectory("graft-confcheck-empty")
    assert(ConfigCheck.check(empty).exists(_._2.contains("no *.properties")))
  }

  test("ThriftLogDump: offsets chain, crc verdicts, and payload previews") {
    val crc = new java.util.zip.CRC32()
    crc.update("hello world".getBytes)
    val good = ThriftLogCodec.encodeFrame("k1".getBytes, "hello world".getBytes,
      timestampNanos = Some(123456789L), checksum = Some(crc.getValue))
    val bad = ThriftLogCodec.encodeFrame("k2".getBytes, "corrupted!!".getBytes,
      checksum = Some(42L))  // wrong on purpose
    val plain = ThriftLogCodec.encodeFrame(Array.emptyByteArray, Array[Byte](0, 1, 2))
    val f = Files.createTempFile("graft-dump", ".log")
    Files.write(f, good ++ bad ++ plain)
    val lines = ThriftLogDump.dump(f)
    assert(lines.size == 3)
    assert(lines(0).contains("crc=ok") && lines(0).contains("ts=123456789") &&
      lines(0).contains("payload=hello world"))
    assert(lines(1).contains("crc=BAD(stored=42"))
    assert(lines(2).contains("crc=absent") && lines(2).contains("payload=000102"))
    // resuming from the first record's nextByteOffset yields the remaining two
    assert(ThriftLogDump.dump(f, startOffset = good.length.toLong).size == 2)
    // max bounds the output
    assert(ThriftLogDump.dump(f, max = 1).size == 1)
  }

  test("ThriftLogGen: generated log round-trips through the dumper with clean CRCs") {
    val f = Files.createTempFile("graft-gen", ".log")
    val bytes = ThriftLogGen.generate(f, n = 25, payloadBytes = 48)
    assert(Files.size(f) == bytes)
    val lines = ThriftLogDump.dump(f)
    assert(lines.size == 25)
    assert(lines.forall(_.contains("crc=ok")), "every generated record checksums clean")
    assert(lines(7).contains("key=key-7"))
    // determinism: regenerating produces byte-identical output
    val f2 = Files.createTempFile("graft-gen2", ".log")
    ThriftLogGen.generate(f2, n = 25, payloadBytes = 48)
    assert(java.util.Arrays.equals(Files.readAllBytes(f), Files.readAllBytes(f2)))
  }

  test("ForgetTool: auto-epoch tombstones accumulate; CompactTool purges them") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-forget").toString
    graft.sources.PackedCorpus.writeEpoch(
      (0L until 10L).map(i => (i, Seq(i.toInt, i.toInt + 1)))
        .toDF("doc_id", "token_ids").coalesce(1), dir, 0L)
    // two delete requests must land as DISTINCT epochs (accumulate,
    // never overwrite each other)
    assert(ForgetTool.forget(spark, "packed", dir, Seq(3L)) == 0L)
    assert(ForgetTool.forget(spark, "packed", dir, Seq(7L, 8L)) == 1L)
    val masked = graft.sources.PackedCorpus.readAll(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(masked == (0L until 10L).toSet -- Set(3L, 7L, 8L),
      "both delete epochs must mask reads immediately")
    CompactTool.compact(spark, "packed", dir)
    assert(!new java.io.File(dir, "tombstones").exists(),
      "CompactTool must retire the applied tombstones")
    assert(graft.sources.PackedCorpus.readAll(spark, dir)
      .select("doc_id").as[Long].collect().toSet ==
      (0L until 10L).toSet -- Set(3L, 7L, 8L))
    intercept[IllegalArgumentException] {
      ForgetTool.forget(spark, "nope", dir, Seq(1L))
    }
  }

  test("ForgetTool: epoch allocation is reservation-based — a racer's reservation is never reused, and a reservation alone never breaks reads") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-forget-resv").toString
    graft.sources.PackedCorpus.writeEpoch(
      (0L until 6L).map(i => (i, Seq(i.toInt))).toDF("doc_id", "token_ids")
        .coalesce(1), dir, 0L)
    assert(ForgetTool.forget(spark, "packed", dir, Seq(1L)) == 0L)
    // a concurrent invocation that RESERVED epoch 1 but has not written
    // its delete set yet (the round-13-advisory race window, frozen):
    // this invocation must skip to 2, never overwrite the reservation
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
      spark.sessionState.newHadoopConf())
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/tombstones/.reserved-1"),
      false).close()
    assert(ForgetTool.forget(spark, "packed", dir, Seq(2L)) == 2L,
      "a standing reservation must never be reallocated")
    // the frozen racer's crash shape — reservation with no delete set —
    // must read as 'tombstones 1 and 2 present', not a schema error
    assert(graft.sources.PackedCorpus.readAll(spark, dir)
      .select("doc_id").as[Long].collect().toSet ==
      (0L until 6L).toSet -- Set(1L, 2L))
    // a store whose tombstone dir holds ONLY a reservation (crash before
    // the very first delete set landed) reads as no tombstones at all
    val dir2 = Files.createTempDirectory("graft-forget-resv2").toString
    graft.sources.PackedCorpus.writeEpoch(
      Seq((0L, Seq(0))).toDF("doc_id", "token_ids").coalesce(1), dir2, 0L)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir2/tombstones"))
    fs.create(new org.apache.hadoop.fs.Path(s"$dir2/tombstones/.reserved-0"),
      false).close()
    assert(graft.sources.PackedCorpus.readAll(spark, dir2).count() == 1L,
      "reservation dot-files alone must be invisible to tombstone reads")
    // ... and the next allocation skips the orphaned reservation
    assert(ForgetTool.forget(spark, "packed", dir2, Seq(0L)) == 1L)
  }

  test("ForgetTool all: one invocation tombstones every store; resolveStores reads conf.d or inline specs") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-forgetall")
    val packedDir = s"$base/packed"
    val bmDir = s"$base/bm25"
    graft.sources.PackedCorpus.writeEpoch(
      (0L until 6L).map(i => (i, Seq(i.toInt))).toDF("doc_id", "token_ids")
        .coalesce(1), packedDir, 0L)
    graft.streaming.StreamingBm25.appendEpoch(
      (0L until 6L).map(i => (i, s"alpha beta doc$i")).toDF("doc_id", "text"),
      bmDir, 0L, nBuckets = 4)
    // conf-dir resolution: the data-pipeline specs name the store roots
    Files.writeString(base.resolve("p.properties"),
      s"pipeline.type=packed\ninputDir=/x\npackedDir=$packedDir\ncheckpointDir=/c\n")
    Files.writeString(base.resolve("b.properties"),
      s"pipeline.type=bm25\ninputDir=/x\nindexPath=$bmDir\ncheckpointDir=/c\n")
    Files.writeString(base.resolve("log.properties"),
      "logDir=/tmp\nwriter.type=file\nwriter.file.path=/tmp/o\n") // NOT a store
    val resolved = ForgetTool.resolveStores(base.toString).sortBy(_._1)
    assert(resolved == Seq("bm25" -> bmDir, "packed" -> packedDir))
    // inline resolution + the error shape
    assert(ForgetTool.resolveStores(s"ivf=/a,bm25=/b") ==
      Seq("ivf" -> "/a", "bm25" -> "/b"))
    intercept[IllegalArgumentException] { ForgetTool.resolveStores("nope") }
    // ONE invocation, every store: both mask immediately
    val done = ForgetTool.forgetAll(spark, resolved, Seq(2L))
    assert(done.map(t => (t._1, t._3)).toSet == Set(("bm25", 0L), ("packed", 0L)))
    assert(graft.sources.PackedCorpus.readAll(spark, packedDir)
      .select("doc_id").as[Long].collect().toSet == Set(0L, 1L, 3L, 4L, 5L))
    val qs = Seq((0L, "alpha")).toDF("query_id", "text")
    val hits = graft.streaming.StreamingBm25.search(spark, bmDir, qs, k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(!hits.contains(2L) && hits.nonEmpty,
      s"bm25 must mask the cross-store forget immediately: $hits")
  }

  test("SnapshotTool: snapshot -> damage -> restore round-trips the store byte-state; names immutable; corrupt manifests refuse") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap").toString + "/packed"
    graft.sources.PackedCorpus.writeEpoch(
      (0L until 8L).map(i => (i, Seq(i.toInt, i.toInt + 1)))
        .toDF("doc_id", "token_ids").coalesce(1), dir, 0L)
    val before = graft.sources.PackedCorpus.readAll(spark, dir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val nFiles = SnapshotTool.snapshot(spark, dir, "v1")
    assert(nFiles > 0 && SnapshotTool.list(spark, dir) == Seq("v1"))
    // immutable: the same name cannot be re-snapshotted
    intercept[IllegalArgumentException] { SnapshotTool.snapshot(spark, dir, "v1") }
    // damage: forget + compact purges two docs
    ForgetTool.forget(spark, "packed", dir, Seq(3L, 5L))
    CompactTool.compact(spark, "packed", dir)
    assert(graft.sources.PackedCorpus.readAll(spark, dir).count() == 6L)
    // restore WITH --resurrect all (the forget WAS the damage here — the
    // fat-finger case): full pre-damage state back (content AND absence
    // of tombstones — the snapshot predates the forget). The DEFAULT
    // restore re-applies ledgered forgets instead; see the ForgetLedger
    // tests below.
    SnapshotTool.restore(spark, dir, "v1", SnapshotTool.ResurrectAll)
    assert(graft.sources.PackedCorpus.readAll(spark, dir)
      .select("doc_id").as[Long].collect().sorted.toSeq == before)
    assert(!new java.io.File(dir, "tombstones").exists())
    // the maintenance lease released on both paths
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
      spark.sessionState.newHadoopConf())
    assert(!fs.exists(graft.streaming.MaintenanceLease.leasePath(dir)))
    // a corrupt snapshot (truncated file) refuses to restore and leaves
    // the live store untouched
    SnapshotTool.snapshot(spark, dir, "v2")
    val snapData = new java.io.File(
      s"${SnapshotTool.snapshotsDir(dir)}/v2/data")
    val victim = Files.walk(snapData.toPath).iterator()
    val dataFile = {
      var f: java.nio.file.Path = null
      while (victim.hasNext) {
        val p = victim.next()
        if (Files.isRegularFile(p) && f == null) f = p
      }
      f
    }
    Files.write(dataFile, Array[Byte](1, 2, 3)) // wrong length vs manifest
    val e = intercept[IllegalArgumentException] {
      SnapshotTool.restore(spark, dir, "v2")
    }
    assert(e.getMessage.contains("corrupt"), e.getMessage)
    assert(graft.sources.PackedCorpus.readAll(spark, dir)
      .select("doc_id").as[Long].collect().sorted.toSeq == before,
      "a refused restore must leave the live store untouched")
    // unknown snapshot name refuses too
    intercept[IllegalArgumentException] { SnapshotTool.restore(spark, dir, "nope") }
  }

  test("ProbeTool: CLI-level store oracles — bm25 search lines, packed counts, forget parity") {
    import spark.implicits._
    // bm25: results as deterministic "rank doc score" lines, stable
    // across forget(mask) -> compact(purge) — the e2e parity oracle
    val idx = Files.createTempDirectory("graft-probe-bm25").toString + "/idx"
    val docs = Seq((1L, "spark shuffle probe scan"), (2L, "spark hash join"),
      (3L, "spark probe window"), (4L, "sort merge join"))
      .toDF("doc_id", "text")
    graft.streaming.StreamingBm25.appendEpoch(docs, idx, 0L, nBuckets = 4)
    val before = ProbeTool.probe(spark, "bm25", Seq(idx, "3", "spark", "probe"))
    assert(before.size == 3 && before.head.startsWith("1 "),
      s"ranked lines expected: $before")
    ForgetTool.forget(spark, "bm25", idx, Seq(before.head.split(' ')(1).toLong))
    val masked = ProbeTool.probe(spark, "bm25", Seq(idx, "3", "spark", "probe"))
    assert(!masked.exists(_.split(' ')(1) == before.head.split(' ')(1)),
      "forgotten doc must vanish from the CLI probe immediately")
    CompactTool.compact(spark, "bm25", idx)
    val purged = ProbeTool.probe(spark, "bm25", Seq(idx, "3", "spark", "probe"))
    assert(purged.map(_.split(' ')(1)) == masked.map(_.split(' ')(1)),
      "post-compact result ids must equal the post-forget (masked) ids")
    // packed: masked counts line
    val dir = Files.createTempDirectory("graft-probe-packed").toString
    graft.sources.PackedCorpus.writeEpoch(
      (0L until 5L).map(i => (i, Seq(i.toInt, i.toInt + 1)))
        .toDF("doc_id", "token_ids").coalesce(1), dir, 0L)
    assert(ProbeTool.probe(spark, "packed", Seq(dir)) ==
      Seq("sequences=5 tokens=10 id_min=0 id_max=4"))
    ForgetTool.forget(spark, "packed", dir, Seq(0L, 4L))
    assert(ProbeTool.probe(spark, "packed", Seq(dir)) ==
      Seq("sequences=3 tokens=6 id_min=1 id_max=3"))
    intercept[IllegalArgumentException] {
      ProbeTool.probe(spark, "nope", Seq(dir))
    }
    // ivf: ranked "rank id cosine" lines off a tiny store
    val ivf = Files.createTempDirectory("graft-probe-ivf").toString + "/idx"
    def vec(i: Long) = (0 until 4).map(j => (math.sin(i * 31 + j * 7) + 2.0).toFloat)
    graft.streaming.StreamingIvf.init(
      (0 until 2).map(i => (i, vec(i * 5))).toDF("centroid_id", "centroid_vec"), ivf)
    graft.streaming.StreamingIvf.appendEpoch(
      (0L until 8L).map(i => (i, vec(i))).toDF("vec_id", "embedding"), ivf, 0L)
    val ivfOut = ProbeTool.probe(spark, "ivf",
      Seq(ivf, "3", vec(1L).mkString(","), "2"))
    assert(ivfOut.size == 3 && ivfOut.head.startsWith("1 1 "),
      s"nearest to vec(1) is vec 1 itself... excluded? got: $ivfOut")
    // curation: verdict totals by stage
    val cur = Files.createTempDirectory("graft-probe-cur").toString
    Seq((1L, "kept", Some(3L)), (2L, "exact_dup", None), (3L, "kept", Some(1L)))
      .toDF("doc_id", "stage", "shard")
      .coalesce(1).write.parquet(s"$cur/verdicts/batch=0")
    assert(ProbeTool.probe(spark, "curation", Seq(cur)) ==
      Seq("exact_dup=1", "kept=2"))
  }

  test("ForgetLedger: a ledgered forget survives a snapshot restore; --resurrect is the explicit undo and is remembered") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ledger").toString + "/packed"
    graft.sources.PackedCorpus.writeEpoch(
      (0L until 8L).map(i => (i, Seq(i.toInt, i.toInt + 1)))
        .toDF("doc_id", "token_ids").coalesce(1), dir, 0L)
    SnapshotTool.snapshot(spark, dir, "pre") // victim still inside
    ForgetTool.forget(spark, "packed", dir, Seq(3L))
    CompactTool.compact(spark, "packed", dir) // bytes purged
    assert(graft.streaming.ForgetLedger.effective(spark, dir) ==
      Map("packed" -> Seq(3L)),
      "ForgetTool must ledger the forget outside the swapped root")
    // DEFAULT restore: the snapshot contains doc 3's bytes, but the
    // ledger re-applies the forget inside the staged snapshot — the
    // restored store must never serve the forgotten doc
    SnapshotTool.restore(spark, dir, "pre")
    assert(graft.sources.PackedCorpus.readAll(spark, dir)
      .select("doc_id").as[Long].collect().toSet ==
      (0L until 8L).toSet - 3L,
      "a compliance delete must survive the restore swap")
    assert(new java.io.File(dir, "tombstones").exists(),
      "the re-applied forget rides the promoted root as a tombstone epoch")
    // the EXPLICIT fat-finger undo: resurrect by id; the cancellation is
    // ledgered, so even a LATER default restore keeps the doc served
    SnapshotTool.restore(spark, dir, "pre", SnapshotTool.ResurrectIds(Set(3L)))
    assert(graft.sources.PackedCorpus.readAll(spark, dir)
      .select("doc_id").as[Long].collect().toSet == (0L until 8L).toSet)
    assert(graft.streaming.ForgetLedger.effective(spark, dir).isEmpty)
    SnapshotTool.restore(spark, dir, "pre")
    assert(graft.sources.PackedCorpus.readAll(spark, dir)
      .select("doc_id").as[Long].collect().toSet == (0L until 8L).toSet,
      "a ledgered resurrection must hold across future restores")
    // a NEW forget after the resurrection re-masks (the log is ordered:
    // later forgets dominate earlier resurrects)
    ForgetTool.forget(spark, "packed", dir, Seq(3L))
    assert(graft.streaming.ForgetLedger.effective(spark, dir) ==
      Map("packed" -> Seq(3L)))
    SnapshotTool.restore(spark, dir, "pre")
    assert(graft.sources.PackedCorpus.readAll(spark, dir)
      .select("doc_id").as[Long].collect().toSet == (0L until 8L).toSet - 3L)
  }

  test("SnapshotTool: restore onto a DESTROYED live root still restores (disaster path)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap-disaster").toString + "/packed"
    graft.sources.PackedCorpus.writeEpoch(
      (0L until 5L).map(i => (i, Seq(i.toInt))).toDF("doc_id", "token_ids")
        .coalesce(1), dir, 0L)
    val before = graft.sources.PackedCorpus.readAll(spark, dir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    SnapshotTool.snapshot(spark, dir, "pre")
    // the disaster the restore exists for: the live root is GONE — the
    // old compactWith routing silently no-opped here and reported success
    // (round-15 advisory); swapIn promotes unconditionally
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    SnapshotTool.restore(spark, dir, "pre")
    assert(graft.sources.PackedCorpus.readAll(spark, dir)
      .select("doc_id").as[Long].collect().sorted.toSeq == before)
    // an EMPTIED root (exists, no subdirectories) restores too
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    SnapshotTool.restore(spark, dir, "pre")
    assert(graft.sources.PackedCorpus.readAll(spark, dir)
      .select("doc_id").as[Long].collect().sorted.toSeq == before)
  }

  test("SnapshotTool: a compact AFTER a snapshot leaves the snapshot restorable (snapshots own their bytes)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap-compact").toString + "/packed"
    (0L until 3L).foreach { e =>
      graft.sources.PackedCorpus.writeEpoch(
        (e * 3L until e * 3L + 3L).map(i => (i, Seq(i.toInt)))
          .toDF("doc_id", "token_ids").coalesce(1), dir, e)
    }
    val before = graft.sources.PackedCorpus.readAll(spark, dir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    SnapshotTool.snapshot(spark, dir, "pre")
    // the compact REWRITES the live layout (3 epochs -> 1) and deletes
    // the displaced files — the snapshot's copied bytes must not care
    CompactTool.compact(spark, "packed", dir)
    SnapshotTool.restore(spark, dir, "pre")
    assert(graft.sources.PackedCorpus.readAll(spark, dir)
      .select("doc_id").as[Long].collect().sorted.toSeq == before)
  }

  test("SnapshotTool lifecycle: listDetailed reports size/age; delete prunes but refuses under a live lease") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap-life").toString + "/packed"
    graft.sources.PackedCorpus.writeEpoch(
      (0L until 4L).map(i => (i, Seq(i.toInt))).toDF("doc_id", "token_ids")
        .coalesce(1), dir, 0L)
    val n1 = SnapshotTool.snapshot(spark, dir, "a")
    SnapshotTool.snapshot(spark, dir, "b")
    val infos = SnapshotTool.listDetailed(spark, dir)
    assert(infos.map(_.name) == Seq("a", "b"))
    assert(infos.forall(i => i.files > 0 && i.bytes > 0 && i.createdMs > 0))
    assert(infos.head.files == n1)
    // a held lease (a restore may be mid-copy out of the snapshot) refuses
    val t = graft.streaming.MaintenanceLease.acquire(spark, dir, op = "restore")
    val e = intercept[IllegalStateException] { SnapshotTool.delete(spark, dir, "a") }
    assert(e.getMessage.contains("lease"), e.getMessage)
    graft.streaming.MaintenanceLease.release(spark, dir, t)
    SnapshotTool.delete(spark, dir, "a")
    assert(SnapshotTool.list(spark, dir) == Seq("b"))
    intercept[IllegalArgumentException] { SnapshotTool.delete(spark, dir, "a") }
    // the pruned snapshot is gone; the surviving one still restores
    SnapshotTool.restore(spark, dir, "b")
    assert(graft.sources.PackedCorpus.readAll(spark, dir).count() == 4L)
  }

  test("SnapshotTool: incremental snapshots copy only the delta; pointers resolve transitively; a referenced base refuses delete") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap-inc").toString + "/packed"
    graft.sources.PackedCorpus.writeEpoch(
      (0L until 4L).map(i => (i, Seq(i.toInt))).toDF("doc_id", "token_ids")
        .coalesce(1), dir, 0L)
    SnapshotTool.snapshot(spark, dir, "full")
    // a new immutable epoch lands — the only delta "inc" should copy
    graft.sources.PackedCorpus.writeEpoch(
      (4L until 6L).map(i => (i, Seq(i.toInt))).toDF("doc_id", "token_ids")
        .coalesce(1), dir, 1L)
    SnapshotTool.snapshot(spark, dir, "inc", base = Some("full"))
    // a second increment with NOTHING changed is a pure-pointer snapshot
    SnapshotTool.snapshot(spark, dir, "inc2", base = Some("inc"))
    val infos = SnapshotTool.listDetailed(spark, dir).map(i => i.name -> i).toMap
    assert(infos("full").ownBytes == infos("full").bytes)
    assert(infos("inc").ownBytes > 0 && infos("inc").ownBytes < infos("inc").bytes,
      s"inc must copy only epoch 1: ${infos("inc")}")
    assert(infos("inc2").ownBytes == 0 &&
      infos("inc2").bytes == infos("inc").bytes,
      s"an unchanged store increments to a pure-pointer snapshot: ${infos("inc2")}")
    // transitive resolution: inc2's epoch-0 pointers name "full" directly,
    // so BOTH ancestors are load-bearing and refuse deletion
    Seq("full", "inc").foreach { b =>
      val e = intercept[IllegalStateException] { SnapshotTool.delete(spark, dir, b) }
      assert(e.getMessage.contains("reference"), e.getMessage)
    }
    // disaster restore through the chain: live root destroyed, inc2
    // resolves every byte from full's and inc's data dirs
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    SnapshotTool.restore(spark, dir, "inc2")
    assert(graft.sources.PackedCorpus.readAll(spark, dir)
      .select("doc_id").as[Long].collect().sorted.toSeq == (0L until 6L).toSeq)
    // prune leaf-first: once dependents are gone, ancestors delete fine
    SnapshotTool.delete(spark, dir, "inc2")
    SnapshotTool.delete(spark, dir, "inc")
    SnapshotTool.delete(spark, dir, "full")
    assert(SnapshotTool.list(spark, dir).isEmpty)
  }

  test("SnapshotTool: verify fscks pointer chains; prune is chain-aware retention") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap-prune").toString + "/packed"
    graft.sources.PackedCorpus.writeEpoch(
      (0L until 3L).map(i => (i, Seq(i.toInt))).toDF("doc_id", "token_ids")
        .coalesce(1), dir, 0L)
    SnapshotTool.snapshot(spark, dir, "a")
    graft.sources.PackedCorpus.writeEpoch(
      (3L until 5L).map(i => (i, Seq(i.toInt))).toDF("doc_id", "token_ids")
        .coalesce(1), dir, 1L)
    SnapshotTool.snapshot(spark, dir, "b", base = Some("a"))
    SnapshotTool.snapshot(spark, dir, "c")
    // keep=2 keeps {c, b} and the closure pulls b's base "a" in: a kept
    // incremental must stay restorable, so nothing dies
    assert(SnapshotTool.prune(spark, dir, keep = 2).isEmpty)
    assert(SnapshotTool.list(spark, dir).toSet == Set("a", "b", "c"))
    // verify green on the intact chain (b's epoch-0 bytes resolve via a)
    val (nf, nb) = SnapshotTool.verify(spark, dir, "b")
    assert(nf > 0 && nb > 0)
    // damage the BASE: b's pointer entries fail the fsck naming the source
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(
      SnapshotTool.snapshotsDir(dir) + "/a/data"), true)
    val e = intercept[IllegalArgumentException] {
      SnapshotTool.verify(spark, dir, "b")
    }
    assert(e.getMessage.contains("referenced from 'a'"), e.getMessage)
    // keep=1: c survives alone; b (the dependent) deletes BEFORE its base
    assert(SnapshotTool.prune(spark, dir, keep = 1) == Seq("b", "a"))
    assert(SnapshotTool.list(spark, dir) == Seq("c"))
    assert(SnapshotTool.verify(spark, dir, "c")._1 > 0)
  }

  test("ForgetTool: curation deletes accumulate across batch= epochs too") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-forget-cur").toString
    // fabricate one committed curation batch (digests only is enough for
    // the epoch-numbering contract under test)
    Seq((1L, "d1"), (2L, "d2")).toDF("id", "digest")
      .coalesce(1).write.parquet(s"$dir/digests/batch=0")
    assert(ForgetTool.forget(spark, "curation", dir, Seq(1L)) == 0L)
    // the curation store names tombstone epochs batch=N — the second
    // request must land as batch=1, never overwrite batch=0
    assert(ForgetTool.forget(spark, "curation", dir, Seq(2L)) == 1L)
    val ts = spark.read.parquet(s"$dir/tombstones")
      .select("id").as[Long].collect().toSet
    assert(ts == Set(1L, 2L),
      "both delete requests must survive in the tombstone store")
  }
}
