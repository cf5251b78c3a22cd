package graft.sources

import java.nio.file.{Files, Path, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Client-side producer of the framed-thrift on-disk format — the engine's
  * twin of the reference's `thrift-logger` module
  * (`client/ThriftLogger.java:27-66` append API,
  * `client/ThriftLoggerConfig.java` rotation threshold + retention): the
  * library an APPLICATION embeds to emit logs the agent then tails.
  *
  *  - records are framed with [[ThriftLogCodec.encodeFrame]], CRC32 set the
  *    same way the transform pipeline verifies it (`Transforms.withChecksum`
  *    parity), so produced files are first-class inputs to every reader
  *    and to [[graft.ThriftLogDump]];
  *  - size-based rotation: when a frame would push the current
  *    `<topic>.log` past `rotationThresholdBytes`, the file is renamed to
  *    `<topic>.log.<seq>` (monotonically increasing seq — rename keeps the
  *    inode, which is exactly the rotation the tail source's offset model
  *    expects) and a fresh current file starts;
  *  - retention: after each rotation, rotated files whose mtime is older
  *    than `retentionSecs` are deleted (the reference's
  *    `maxRetentionSecs`); the clock is injectable so retention is
  *    deterministic under test.
  *
  * Single-writer by contract (the reference's logger is per-topic
  * singleton); appends are synchronized. */
class ThriftLogWriter(baseDir: Path, topic: String,
    rotationThresholdBytes: Long = 64L << 20,
    retentionSecs: Long = 3L * 86400,
    nowMs: () => Long = () => System.currentTimeMillis()) extends AutoCloseable {

  require(rotationThresholdBytes > 0, "rotationThresholdBytes must be positive")
  Files.createDirectories(baseDir)

  private val current: Path = baseDir.resolve(s"$topic.log")
  private var out = open()
  private var size = if (Files.exists(current)) Files.size(current) else 0L

  private def open() = new java.io.BufferedOutputStream(
    Files.newOutputStream(current, StandardOpenOption.CREATE, StandardOpenOption.APPEND))

  def append(key: Array[Byte], message: Array[Byte], timeNanos: Long): Unit = synchronized {
    val crc = new java.util.zip.CRC32()
    crc.update(message)
    val frame = ThriftLogCodec.encodeFrame(
      if (key == null) Array.emptyByteArray else key, message,
      timestampNanos = Some(timeNanos), checksum = Some(crc.getValue))
    if (size > 0 && size + frame.length > rotationThresholdBytes) rotate()
    out.write(frame)
    out.flush()
    size += frame.length
  }

  def append(message: Array[Byte], timeNanos: Long): Unit =
    append(null, message, timeNanos)

  private def rotatedSeq(): Long = {
    val s = Files.list(baseDir)
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.startsWith(s"$topic.log.") =>
        n.stripPrefix(s"$topic.log.").toLongOption.getOrElse(0L) }
      .maxOption.getOrElse(0L) + 1L
    finally s.close()
  }

  private def rotate(): Unit = {
    out.close()
    Files.move(current, baseDir.resolve(s"$topic.log.${rotatedSeq()}"))
    out = open()
    size = 0L
    enforceRetention()
  }

  private def enforceRetention(): Unit = {
    val cutoff = nowMs() - retentionSecs * 1000L
    val s = Files.list(baseDir)
    try s.iterator().asScala
      .filter(_.getFileName.toString.startsWith(s"$topic.log."))
      .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
      .toSeq.foreach(Files.deleteIfExists(_))
    finally s.close()
  }

  override def close(): Unit = synchronized { out.close() }
}
