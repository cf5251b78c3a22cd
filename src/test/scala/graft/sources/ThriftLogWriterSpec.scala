package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ThriftLogWriterSpec extends AnyFunSuite with SparkTestBase {

  test("producer → rotated files → engine reader: every record exactly once") {
    val dir = Files.createTempDirectory("graft-tlw")
    // ~90-byte frames with a ~200-byte threshold → rotation every 2 records
    val w = new ThriftLogWriter(dir, "app", rotationThresholdBytes = 200)
    (0 until 9).foreach { i =>
      w.append(s"k$i".getBytes, s"payload-$i-${"y" * 40}".getBytes, i.toLong * 1000)
    }
    w.close()
    val names = Files.list(dir).iterator()
    val files = new scala.collection.mutable.ArrayBuffer[String]
    while (names.hasNext) files += names.next().getFileName.toString
    assert(files.contains("app.log"))
    assert(files.count(_.startsWith("app.log.")) >= 3, s"expected rotations, got $files")

    // the reader consumes current + rotated files as one corpus
    val rows = LogSources.thriftFramed(spark, dir.toString)
      .select(col("value").cast("string").as("v"), col("checksum"), col("timestampNanos"))
      .collect()
    assert(rows.length == 9)
    val payloads = rows.map(_.getString(0)).sorted.toSeq
    assert(payloads == (0 until 9).map(i => s"payload-$i-${"y" * 40}").sorted)
    // every produced checksum verifies (writer-side CRC = reader contract)
    rows.foreach { r =>
      val crc = new java.util.zip.CRC32()
      crc.update(r.getString(0).getBytes)
      assert(r.getLong(1) == crc.getValue)
    }
  }

  test("retention reaps rotated files past the horizon, never the current file") {
    val dir = Files.createTempDirectory("graft-tlw-ret2")
    val w = new ThriftLogWriter(dir, "app", rotationThresholdBytes = 120,
      retentionSecs = 3600, nowMs = () => System.currentTimeMillis() + 100L * 3600 * 1000)
    (0 until 6).foreach(i => w.append(s"k$i".getBytes, ("z" * 60).getBytes, i))
    w.close()
    val files = { val s = Files.list(dir); try {
      val b = new scala.collection.mutable.ArrayBuffer[String]
      s.iterator().forEachRemaining(p => b += p.getFileName.toString); b.toSeq
    } finally s.close() }
    assert(files == Seq("app.log"), s"rotated files must be reaped: $files")
  }

  test("python producer writes byte-identical frames the engine codec round-trips") {
    import scala.sys.process._
    assume(Process(Seq("python3", "--version"))
      .!(ProcessLogger(_ => ())) == 0, "python3 not available")
    val dir = Files.createTempDirectory("graft-tlw-py")
    val rc = Process(Seq("python3", "tools/thrift_log_writer.py",
      "--selftest", dir.toString, "py")).!(ProcessLogger(_ => ()))
    assert(rc == 0, "python selftest writer failed")
    val bytes = Files.readAllBytes(dir.resolve("py.log"))

    // 1) the engine codec decodes every record with verifying CRCs
    val recs = ThriftLogCodec.decodeFrames(bytes).toSeq
    assert(recs.length == 5)
    val expected = Seq[(Array[Byte], Array[Byte], Long)](
      ("k0".getBytes, "hello from python".getBytes, 1000000001L),
      ("key-1".getBytes, "snowman ☃ payload".getBytes("UTF-8"), 2000000002L),
      ("k2".getBytes, Array.emptyByteArray, 3000000003L),
      (Array.emptyByteArray, "no key record".getBytes, 4000000004L),
      ("binary".getBytes, Array.tabulate(256)(_.toByte), 5000000005L))
    recs.zip(expected).foreach { case (r, (k, m, ts)) =>
      assert(r.key.toSeq == k.toSeq && r.message.toSeq == m.toSeq)
      assert(r.timestampNanos == ts)
      val crc = new java.util.zip.CRC32(); crc.update(m)
      assert(r.checksum == crc.getValue, "python CRC32 must verify in the engine")
    }

    // 2) re-encoding with the Scala codec reproduces the file byte for byte
    val reencoded = expected.flatMap { case (k, m, ts) =>
      val crc = new java.util.zip.CRC32(); crc.update(m)
      ThriftLogCodec.encodeFrame(k, m,
        timestampNanos = Some(ts), checksum = Some(crc.getValue)).toSeq
    }
    assert(reencoded == bytes.toSeq,
      "python and Scala producers must agree on every frame byte")
  }
}
