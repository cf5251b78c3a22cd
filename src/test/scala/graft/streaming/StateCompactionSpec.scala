package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-12 verdict items 1-2: the compaction swap protocol must run
  * through the Hadoop `FileSystem` API (on HDFS/S3, where 100-TB at-rest
  * state lives, `java.io.File` resolves nothing and the old code silently
  * no-opped), survive every crash shape of the commit-marker protocol,
  * work on a FileSystem with OBJECT-STORE semantics (no rename, no append
  * — the [[S3SemanticsMockFs]] discipline RolledObjectSink passes), fail
  * LOUDLY on corrupt state or an unknown scheme, and salt oversized
  * partitions to `targetFileBytes` instead of compacting a hot partition
  * into one giant file. */
class StateCompactionSpec extends AnyFunSuite with SparkTestBase {

  private def hc = spark.sparkContext.hadoopConfiguration

  /** A tiny non-parquet state layout for compactWith: `epoch=<n>/data`
    * text files whose union the hook rewrites into `epoch=-1/data`. */
  private def writeEpochFile(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, epoch: Long, lines: Seq[String]): Unit = {
    val out = fs.create(new Path(s"$dir/epoch=$epoch/data"), true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readAllLines(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[String] = {
    // manual listStatus recursion: the mock object-store FS doesn't
    // support the default listFiles(recursive) iterator
    def walk(p: Path): Seq[Path] = {
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".crc")) Nil
        else Seq(st.getPath)
      }
    }
    walk(new Path(dir)).flatMap { p =>
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }.sorted
  }

  /** The compactWith hook used throughout: union every epoch's lines into
    * one staged `epoch=-1/data` object — create/open/list only, the
    * object-store-legal subset. */
  private def foldHook(fs: org.apache.hadoop.fs.FileSystem, dir: String)(
      staging: String): Unit = {
    val lines = readAllLines(fs, dir)
    val out = fs.create(new Path(s"$staging/epoch=-1/data"), true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  test("compactWith swaps via commit-marker + copy-promote on a no-rename, no-append object store") {
    val root = Files.createTempDirectory("compact-s3mock").toString
    hc.set("fs.s3mock.impl", classOf[S3SemanticsMockFs].getName)
    hc.set("fs.s3mock.root", root)
    hc.setBoolean("fs.s3mock.impl.disable.cache", true)
    try {
      val dir = "s3mock://bucket/state/digests"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), spark.sessionState.newHadoopConf())
      writeEpochFile(fs, dir, 0, Seq("a", "b"))
      writeEpochFile(fs, dir, 1, Seq("c"))
      writeEpochFile(fs, dir, 2, Seq("d", "e"))
      // the mock FS THROWS on rename/append — a green compact is a
      // structural proof the swap needs neither
      StateCompaction.compactWith(spark, dir)(foldHook(fs, dir))
      val subs = fs.listStatus(new Path(dir)).filter(_.isDirectory)
        .map(_.getPath.getName).toSet
      assert(subs == Set("epoch=-1"), s"only the compacted epoch may remain: $subs")
      assert(readAllLines(fs, dir) == Seq("a", "b", "c", "d", "e"))
      assert(!fs.exists(new Path(dir + ".compacting")))
      assert(!fs.exists(new Path(dir + ".compacting.COMMITTED")))
      // repeatable: a later epoch appends, the next compact folds it in
      writeEpochFile(fs, dir, 3, Seq("f"))
      StateCompaction.compactWith(spark, dir)(foldHook(fs, dir))
      assert(readAllLines(fs, dir) == Seq("a", "b", "c", "d", "e", "f"))
    } finally {
      hc.unset("fs.s3mock.impl")
      hc.unset("fs.s3mock.root")
    }
  }

  test("recover finishes every crash shape of the marker protocol") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sessionState.newHadoopConf())
    def fresh(): String = {
      val dir = Files.createTempDirectory("compact-crash").toString + "/state"
      writeEpochFile(fs, dir, 0, Seq("a"))
      writeEpochFile(fs, dir, 1, Seq("b"))
      dir
    }
    def stage(dir: String): Unit = {
      val out = fs.create(new Path(dir + ".compacting/epoch=-1/data"), true)
      try out.write("a\nb\n".getBytes("UTF-8")) finally out.close()
    }
    def marker(dir: String): Unit =
      fs.create(new Path(dir + ".compacting.COMMITTED"), true).close()

    // crash AFTER the commit point, BEFORE the promote touched dir:
    // staging is authoritative, the un-deleted epochs are superseded
    val d1 = fresh(); stage(d1); marker(d1)
    StateCompaction.recover(spark, d1)
    assert(readAllLines(fs, d1) == Seq("a", "b"))
    assert(fs.listStatus(new Path(d1)).map(_.getPath.getName).toSet == Set("epoch=-1"))
    assert(!fs.exists(new Path(d1 + ".compacting")))
    assert(!fs.exists(new Path(d1 + ".compacting.COMMITTED")))

    // crash MID-promote (dir already deleted): same outcome
    val d2 = fresh(); stage(d2); marker(d2)
    fs.delete(new Path(d2), true)
    StateCompaction.recover(spark, d2)
    assert(readAllLines(fs, d2) == Seq("a", "b"))

    // crash AFTER promote, before marker cleanup: only the marker goes
    val d3 = fresh(); marker(d3)
    StateCompaction.recover(spark, d3)
    assert(readAllLines(fs, d3) == Seq("a", "b"))
    assert(!fs.exists(new Path(d3 + ".compacting.COMMITTED")))

    // the LEGACY pre-marker shape (dir missing + complete staging): promote
    val d4 = fresh(); stage(d4)
    fs.delete(new Path(d4), true)
    StateCompaction.recover(spark, d4)
    assert(readAllLines(fs, d4) == Seq("a", "b"))

    // marker with BOTH sides missing is corrupt — a silent no-op here
    // would resurrect nothing and hide the loss; it must throw
    val d5 = fresh(); marker(d5)
    fs.delete(new Path(d5), true)
    val e = intercept[IllegalStateException](StateCompaction.recover(spark, d5))
    assert(e.getMessage.contains("torn compaction swap"))
  }

  test("an unknown filesystem scheme fails loudly, never silently no-ops") {
    intercept[Exception] {
      StateCompaction.compact(spark, "nosuchscheme://host/state", key = "epoch")
    }
  }

  test("nothing-to-compact is a no-op only for a missing or epoch-less directory") {
    val base = Files.createTempDirectory("compact-noop").toString
    // missing directory: genuine nothing
    StateCompaction.compactWith(spark, s"$base/never-written")(_ => fail("hook must not run"))
    // a directory with FILES but no subdirectories: nothing to fold
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sessionState.newHadoopConf())
    fs.create(new Path(s"$base/flat/stray"), true).close()
    StateCompaction.compactWith(spark, s"$base/flat")(_ => fail("hook must not run"))
  }

  test("swapIn promotes onto a MISSING or empty live directory — the disaster-restore shape compactWith rightly refuses") {
    val base = Files.createTempDirectory("swapin").toString
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sessionState.newHadoopConf())
    // missing live dir: compactWith no-ops (nothing to fold), swapIn
    // stages and promotes (round-15 advisory: a restore routed through
    // compactWith reported success while writing nothing)
    val dir = s"$base/store"
    StateCompaction.swapIn(spark, dir) { staging =>
      val out = fs.create(new Path(s"$staging/epoch=-1/data"), true)
      try out.write("restored\n".getBytes("UTF-8")) finally out.close()
    }
    assert(fs.exists(new Path(s"$dir/epoch=-1/data")),
      "swapIn must promote the staged content over a missing root")
    assert(!fs.exists(new Path(dir + ".compacting")) &&
      !fs.exists(new Path(dir + ".compacting.COMMITTED")))
    // an existing root is REPLACED wholesale (same protocol as compact)
    StateCompaction.swapIn(spark, dir) { staging =>
      val out = fs.create(new Path(s"$staging/epoch=-1/data2"), true)
      try out.write("v2\n".getBytes("UTF-8")) finally out.close()
    }
    assert(fs.exists(new Path(s"$dir/epoch=-1/data2")) &&
      !fs.exists(new Path(s"$dir/epoch=-1/data")),
      "swapIn replaces, never merges")
  }

  test("compaction salts an oversized partition into multiple right-sized files") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("compact-salt").toString + "/corpus"
    // cell 0 is HOT: high-entropy payloads so parquet can't compress it
    // under the target; cell 1 is tiny
    def epoch(e: Int, ids: Range): Unit =
      ids.map { i =>
        val cell = if (i % 100 == 0) 1 else 0
        (i.toLong + e * 100000L, cell)
      }
        .toDF("id", "cell")
        .withColumn("junk",
          sha2(concat_ws("-", col("id").cast("string"), lit("payload")), 512))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/epoch=$e")
    epoch(0, 0 until 4000)
    epoch(1, 0 until 4000)
    StateCompaction.compact(spark, dir, key = "epoch",
      partitionCols = Seq("cell"), targetFileBytes = 64 * 1024)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sessionState.newHadoopConf())
    def dataFiles(p: String): Seq[Long] = {
      val it = fs.listFiles(new Path(p), false)
      val b = Seq.newBuilder[Long]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) b += st.getLen
      }
      b.result()
    }
    val hot = dataFiles(s"$dir/epoch=-1/cell=0")
    val cold = dataFiles(s"$dir/epoch=-1/cell=1")
    assert(hot.size > 1,
      s"the oversized partition must split across salted files, got ${hot.size}")
    assert(hot.forall(_ < 4 * 64 * 1024),
      s"salted files must be near the target size, got ${hot.sorted.reverse.take(3)}")
    assert(cold.size == 1,
      s"a healthy partition must still consolidate to ONE file, got ${cold.size}")
    // content unchanged and pruning preserved (cell stayed a partition col)
    val back = spark.read.parquet(dir)
    assert(back.count() == 8000)
    assert(back.filter(col("cell") === 1).count() === 80)
    // partition discovery resurfaces the (now -1-only) epoch key
    assert(back.columns.toSet == Set("id", "cell", "junk", "epoch"))
    assert(back.select("epoch").distinct().collect().map(_.getInt(0)).toSeq == Seq(-1))
  }
}
