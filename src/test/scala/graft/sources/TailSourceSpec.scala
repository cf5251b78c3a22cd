package graft.sources

import java.nio.file.{Files, Path, StandardOpenOption}

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The capability the built-in file source lacks: ingesting APPENDS to a
  * file it has already read, resuming from intra-file byte offsets. */
class TailSourceSpec extends AnyFunSuite with SparkTestBase {

  private def tempDir(): Path = {
    val d = Files.createTempDirectory("graft-tail-")
    d.toFile.deleteOnExit()
    d
  }

  private def values(table: String): Set[String] =
    spark.table(table).collect()
      .map(r => new String(r.getAs[Array[Byte]]("value"))).toSet

  test("tails a growing text file across micro-batches") {
    val dir = tempDir()
    val f = dir.resolve("app.log")
    Files.writeString(f, "line1\nline2\n")
    val q = spark.readStream.format("graft-tail")
      .option("path", dir.toString).option("format", "text")
      .load()
      .writeStream.format("memory").queryName("tail_text")
      .option("checkpointLocation", tempDir().toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      q.processAllAvailable()
      assert(values("tail_text") == Set("line1", "line2"))
      // APPEND to the same file — the built-in file source would never see this
      Files.writeString(f, "line3\nline4\n", StandardOpenOption.APPEND)
      q.processAllAvailable()
      assert(values("tail_text") == Set("line1", "line2", "line3", "line4"))
      // new file alongside
      Files.writeString(dir.resolve("b.log"), "line5\n")
      q.processAllAvailable()
      assert(values("tail_text") == Set("line1", "line2", "line3", "line4", "line5"))
    } finally q.stop()
  }

  test("tails growing thrift-framed files with offset chain") {
    val dir = tempDir()
    val f = dir.resolve("t.log")
    Files.write(f, ThriftLogCodec.encodeFrame("k1".getBytes, "m1".getBytes, Some(1L), None))
    val q = spark.readStream.format("graft-tail")
      .option("path", dir.toString).option("format", "thrift")
      .load()
      .writeStream.format("memory").queryName("tail_thrift")
      .option("checkpointLocation", tempDir().toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      q.processAllAvailable()
      assert(values("tail_thrift") == Set("m1"))
      Files.write(f, ThriftLogCodec.encodeFrame(null, "m2".getBytes, Some(2L), Some(9L)),
        StandardOpenOption.APPEND)
      q.processAllAvailable()
      assert(values("tail_thrift") == Set("m1", "m2"))
      val rows = spark.table("tail_thrift").collect().sortBy(_.getAs[Long]("byteOffset"))
      assert(rows.last.getAs[Long]("byteOffset") == Files.size(f))
      assert(rows.last.getAs[Long]("checksum") == 9L)
    } finally q.stop()
  }

  test("restart resumes from intra-file byte offset (no loss, no dupes)") {
    val dir = tempDir()
    val cp = tempDir()
    val f = dir.resolve("app.log")
    Files.writeString(f, "a1\na2\n")
    def start(name: String) = spark.readStream.format("graft-tail")
      .option("path", dir.toString).option("format", "text")
      .load()
      .writeStream.format("parquet")
      .option("path", dir.resolve("out").toString)
      .option("checkpointLocation", cp.toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    val q1 = start("t1")
    q1.processAllAvailable(); q1.stop()
    // append while the query is DOWN
    Files.writeString(f, "a3\n", StandardOpenOption.APPEND)
    val q2 = start("t2")
    q2.processAllAvailable(); q2.stop()
    val out = spark.read.parquet(dir.resolve("out").toString).collect()
      .map(r => new String(r.getAs[Array[Byte]]("value")))
    assert(out.sorted.toList == List("a1", "a2", "a3"))
  }

  test("rate limit caps bytes per micro-batch but eventually drains") {
    val dir = tempDir()
    Files.writeString(dir.resolve("big.log"), (1 to 100).map(i => s"r$i").mkString("", "\n", "\n"))
    val q = spark.readStream.format("graft-tail")
      .option("path", dir.toString).option("format", "text")
      .option("maxBytesPerTrigger", "64")
      .load()
      .writeStream.format("memory").queryName("tail_rate")
      .option("checkpointLocation", tempDir().toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("tail_rate").count() == 100)
    } finally q.stop()
  }

  test("rate limit aligns to thrift frame boundaries (no torn frames)") {
    val dir = tempDir()
    val frames = (1 to 50).map(i =>
      ThriftLogCodec.encodeFrame(null, s"msg-$i".getBytes, Some(i.toLong), None))
    Files.write(dir.resolve("t.log"), frames.reduce(_ ++ _))
    val q = spark.readStream.format("graft-tail")
      .option("path", dir.toString).option("format", "thrift")
      .option("maxBytesPerTrigger", "100")
      .load()
      .writeStream.format("memory").queryName("tail_thrift_rate")
      .option("checkpointLocation", tempDir().toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      q.processAllAvailable()
      val vals = values("tail_thrift_rate")
      assert(vals == (1 to 50).map(i => s"msg-$i").toSet)
    } finally q.stop()
  }

  test("multiline tail: record emits only once its successor starts") {
    val dir = tempDir()
    val f = dir.resolve("g.log")
    Files.writeString(f, "I00001 first\n  cont-1\nI00002 second\n")
    val q = spark.readStream.format("graft-tail")
      .option("path", dir.toString).option("format", "multiline")
      .option("messageStartRegex", "^I[0-9]{5}")
      .load()
      .writeStream.format("memory").queryName("tail_ml")
      .option("checkpointLocation", tempDir().toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      q.processAllAvailable()
      // record 2 may still be growing — only record 1 is complete
      assert(values("tail_ml") == Set("I00001 first\n  cont-1"))
      // continuation of record 2 arrives, then record 3 starts ⇒ 2 completes
      Files.writeString(f, "  cont-2\nI00003 third\n", StandardOpenOption.APPEND)
      q.processAllAvailable()
      assert(values("tail_ml") ==
        Set("I00001 first\n  cont-1", "I00002 second\n  cont-2"))
    } finally q.stop()
  }

  test("multiline alignment reads O(tail chunk), not O(new bytes)") {
    import graft.sources.v2.MultilineAlign
    val p = java.util.regex.Pattern.compile("^REC", java.util.regex.Pattern.MULTILINE)
    // an 8 MB appended window of complete records, ~40 bytes each
    val rec = "REC " + ("x" * 35) + "\n"
    val n = (8 << 20) / rec.length
    val window = (rec * n).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var bytesRead = 0L
    val readRange = (lo: Long, hi: Long) => {
      bytesRead += hi - lo
      java.util.Arrays.copyOfRange(window, lo.toInt, hi.toInt)
    }
    val boundary = MultilineAlign.lastStartBoundary(p, 0L, window.length.toLong, readRange)
    // the last record start is the final REC line
    assert(boundary == (n - 1).toLong * rec.length, s"boundary $boundary")
    // driver IO is one 256 KB tail chunk, NOT the 8 MB window
    assert(bytesRead <= (256 << 10), s"read $bytesRead bytes")

    // correctness when the only start is far from the tail: scan extends
    // backward and still finds it
    bytesRead = 0L
    val sparse = ("REC head\n" + ("cont line\n" * 200000)).getBytes("ISO-8859-1")
    val b2 = MultilineAlign.lastStartBoundary(p, 0L, sparse.length.toLong, readRange2(sparse,
      add = d => bytesRead += d))
    assert(b2 == 0L) // match at offset 0 is the old boundary — no progress
    // a start appended mid-window is found even when outside the first chunk
    val mid = ("REC head\n" + ("cont\n" * 300000) + "REC mid\n" + ("cont\n" * 300000))
      .getBytes("ISO-8859-1")
    val b3 = MultilineAlign.lastStartBoundary(p, 0L, mid.length.toLong, readRange2(mid, _ => ()))
    assert(b3 == "REC head\n".length + 5L * 300000)
  }

  private def readRange2(data: Array[Byte], add: Long => Unit): (Long, Long) => Array[Byte] =
    (lo, hi) => { add(hi - lo); java.util.Arrays.copyOfRange(data, lo.toInt, hi.toInt) }

  test("multiline tail truncates oversize records at maxMessageChars but still consumes them") {
    val dir = tempDir()
    val f = dir.resolve("big.log")
    // record 1 is oversize (200 chars of body); record 2 closes it; record 3
    // pending (no successor yet)
    Files.writeString(f, "REC one " + ("x" * 200) + "\nREC two\nREC three\n")
    val q = spark.readStream.format("graft-tail")
      .option("path", dir.toString).option("format", "multiline")
      .option("messageStartRegex", "^REC")
      .option("maxMessageChars", "20").load()
      .writeStream.format("memory").queryName("tail_trunc")
      .option("checkpointLocation", tempDir().toString).start()
    try {
      q.processAllAvailable()
      val vals = values("tail_trunc")
      // oversize record truncated to 20 chars; its full extent was consumed
      // (record two follows immediately); record three awaits a successor
      assert(vals == Set("REC one " + ("x" * 12), "REC two"), vals.toString)
    } finally q.stop()
  }

  test("rename-rotation keeps inode offsets: no re-ingest, tail follows the renamed file") {
    val dir = tempDir()
    val f = dir.resolve("app.log")
    Files.writeString(f, "r1\nr2\n")
    val q = spark.readStream.format("graft-tail")
      .option("path", dir.toString).option("format", "text")
      .load()
      .writeStream.format("memory").queryName("tail_rename")
      .option("checkpointLocation", tempDir().toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("tail_rename").count() == 2)
      // rename-rotate, then create a fresh file under the old name and
      // keep appending to the rotated one — the reference's exact scenario
      Files.move(f, dir.resolve("app.log.1"))
      Files.writeString(f, "r3\n")
      Files.writeString(dir.resolve("app.log.1"), "r4\n", StandardOpenOption.APPEND)
      q.processAllAvailable()
      val vals = values("tail_rename")
      assert(vals == Set("r1", "r2", "r3", "r4"), s"got $vals")
      assert(spark.table("tail_rename").count() == 4) // exactly once each
    } finally q.stop()
  }

  test("shrunken (rotated-in-place) file restarts from zero") {
    val dir = tempDir()
    val f = dir.resolve("rot.log")
    Files.writeString(f, "old1\nold2\nold3\n")
    val q = spark.readStream.format("graft-tail")
      .option("path", dir.toString).option("format", "text")
      .load()
      .writeStream.format("memory").queryName("tail_rot")
      .option("checkpointLocation", tempDir().toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("tail_rot").count() == 3)
      Files.writeString(f, "new1\n") // truncate + rewrite, shorter than before
      q.processAllAvailable()
      assert(values("tail_rot").contains("new1"))
    } finally q.stop()
  }

  test("TailRetention.sweep deletes only fully-ingested old files, never the head") {
    import graft.sources.v2.TailRetention
    val now = 1000000000L
    val hour = 3600000L
    val files = Seq(
      ("id-a", "/logs/a.log", 100L, now - 3 * hour), // old, fully ingested → delete
      ("id-b", "/logs/b.log", 200L, now - 3 * hour), // old, PARTIAL → keep
      ("id-c", "/logs/c.log", 50L, now - 30 * 60000L), // fully ingested, too young → keep
      ("id-d", "/logs/d.log", 10L, now - 1000L))    // active head (newest) → keep
    val committed = Map("id-a" -> 100L, "id-b" -> 150L, "id-c" -> 50L, "id-d" -> 10L)
    assert(TailRetention.sweep(files, committed, hour, now) == Seq("/logs/a.log"))
    // an old fully-ingested file that IS the newest still survives
    val only = Seq(("id-a", "/logs/a.log", 100L, now - 3 * hour))
    assert(TailRetention.sweep(only, Map("id-a" -> 100L), hour, now).isEmpty)
    // a file with no committed offset (never ingested) is never deleted
    assert(TailRetention.sweep(files, committed - "id-a", hour, now).isEmpty)
  }

  test("retention deletes drained rotation files through the live source (ref logRetentionInSeconds)") {
    val dir = tempDir()
    val old = dir.resolve("app.log.1")
    val head = dir.resolve("app.log")
    Files.writeString(old, "r1\nr2\n")
    Files.writeString(head, "r3\n")
    // make the rotated file an hour old; the head stays fresh
    Files.setLastModifiedTime(old,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 3600000L))
    val q = spark.readStream.format("graft-tail")
      .option("path", dir.toString).option("format", "text")
      .option("retentionSeconds", "60")
      .load()
      .writeStream.format("memory").queryName("tail_ret")
      .option("checkpointLocation", tempDir().toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      q.processAllAvailable()
      assert(values("tail_ret") == Set("r1", "r2", "r3"), "all data delivered first")
      // the engine commits batch N when batch N+1 starts — append fresh data
      // so the drained batch's commit fires and sweeps the old file
      Files.writeString(head, "r4\n", StandardOpenOption.APPEND)
      q.processAllAvailable()
      assert(values("tail_ret") == Set("r1", "r2", "r3", "r4"))
      val deadline = System.currentTimeMillis() + 15000
      while (System.currentTimeMillis() < deadline && Files.exists(old)) {
        Files.writeString(head, "tick\n", StandardOpenOption.APPEND)
        q.processAllAvailable()
        Thread.sleep(100)
      }
      assert(!Files.exists(old), "drained rotation file past retention is deleted")
      assert(Files.exists(head), "active head never deleted")
    } finally q.stop()
  }
}
