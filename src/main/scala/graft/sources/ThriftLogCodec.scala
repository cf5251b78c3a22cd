package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

/** Framed-thrift `LogMessage` codec — the reference's on-disk log format
  * (reference: singer-commons/src/main/thrift/singer_if.thrift:11-21, written
  * by thrift-logger clients via TFramedTransport + TBinaryProtocol,
  * reference: reader/ThriftReader.java:42-141).
  *
  * Wire format (public Apache Thrift binary protocol):
  *   frame   := i32 length, struct
  *   struct  := (field)* stop
  *   field   := byte type, i16 id, value
  *   binary  := i32 length, bytes      (type 11)
  *   i64     := 8 bytes big-endian     (type 10)
  *
  * LogMessage fields: 1=key(binary,optional), 2=message(binary,required),
  * 3=timestampInNanos(i64,optional), 4=checksum(i64,optional).
  *
  * Implemented directly on ByteBuffer — no thrift library dependency, no
  * per-record object churn beyond the emitted arrays.
  */
object ThriftLogCodec {

  final val TStop: Byte = 0
  final val TBool: Byte = 2
  final val TByte: Byte = 3
  final val TDouble: Byte = 4
  final val TI16: Byte = 6
  final val TI32: Byte = 8
  final val TI64: Byte = 10
  final val TBinary: Byte = 11
  final val TStruct: Byte = 12
  final val TMap: Byte = 13
  final val TSet: Byte = 14
  final val TList: Byte = 15

  /** One decoded record plus the byte offset of the NEXT frame — the
    * reference's `LogPosition.byteOffset` semantics
    * (reference: singer-commons/src/main/thrift/singer.thrift:21-27). */
  case class DecodedMessage(
      key: Array[Byte],
      message: Array[Byte],
      timestampNanos: java.lang.Long,
      checksum: java.lang.Long,
      nextByteOffset: Long)

  /** Encode one LogMessage as a framed-thrift record. */
  def encodeFrame(key: Array[Byte], message: Array[Byte],
      timestampNanos: Option[Long] = None, checksum: Option[Long] = None): Array[Byte] = {
    val body = new ByteArrayOutputStream(message.length + 64)
    def writeFieldHeader(tpe: Byte, id: Short): Unit = {
      body.write(tpe)
      body.write((id >> 8) & 0xFF); body.write(id & 0xFF)
    }
    def writeI32(v: Int): Unit = {
      body.write((v >> 24) & 0xFF); body.write((v >> 16) & 0xFF)
      body.write((v >> 8) & 0xFF); body.write(v & 0xFF)
    }
    def writeI64(v: Long): Unit = { writeI32((v >> 32).toInt); writeI32(v.toInt) }
    if (key != null) {
      writeFieldHeader(TBinary, 1); writeI32(key.length); body.write(key)
    }
    writeFieldHeader(TBinary, 2); writeI32(message.length); body.write(message)
    timestampNanos.foreach { ts => writeFieldHeader(TI64, 3); writeI64(ts) }
    checksum.foreach { c => writeFieldHeader(TI64, 4); writeI64(c) }
    body.write(TStop)
    val payload = body.toByteArray
    val out = ByteBuffer.allocate(4 + payload.length)
    out.putInt(payload.length).put(payload)
    out.array()
  }

  /** Decode all complete frames from `bytes` starting at `startOffset` into
    * the buffer. Tolerates a trailing partial frame (in-progress append) by
    * stopping; frames whose payload exceeds `maxMessageBytes` are skipped,
    * not fatal — the reference's oversize-drop behavior
    * (reference: reader/ThriftLogFileReader.java:80-87,148-163). */
  def decodeFrames(bytes: Array[Byte], startOffset: Long = 0L,
      maxMessageBytes: Int = Int.MaxValue): Iterator[DecodedMessage] =
    new Iterator[DecodedMessage] {
      private val buf = ByteBuffer.wrap(bytes)
      buf.position(math.min(startOffset, bytes.length.toLong).toInt)
      private var nextMsg: DecodedMessage = _
      advance()

      private def advance(): Unit = {
        nextMsg = null
        while (nextMsg == null && buf.remaining() >= 4) {
          val frameStart = buf.position()
          val len = buf.getInt
          if (len < 0 || len > buf.remaining()) {
            buf.position(frameStart) // partial/corrupt tail — stop
            return
          }
          val frameEnd = buf.position() + len
          if (len > maxMessageBytes) {
            buf.position(frameEnd) // oversize: skip whole frame
          } else {
            nextMsg = decodeStruct(frameEnd)
            buf.position(frameEnd)
          }
        }
      }

      private def decodeStruct(frameEnd: Int): DecodedMessage = {
        var key: Array[Byte] = null
        var message: Array[Byte] = null
        var ts: java.lang.Long = null
        var crc: java.lang.Long = null
        var done = false
        while (!done && buf.position() < frameEnd) {
          val tpe = buf.get()
          if (tpe == TStop) done = true
          else {
            val id = buf.getShort
            (tpe, id) match {
              case (TBinary, 1) => key = readBinary()
              case (TBinary, 2) => message = readBinary()
              case (TI64, 3) => ts = buf.getLong
              case (TI64, 4) => crc = buf.getLong
              case _ => skip(tpe)
            }
          }
        }
        if (message == null) null // malformed: required field missing — drop
        else DecodedMessage(key, message, ts, crc, frameEnd.toLong)
      }

      private def readBinary(): Array[Byte] = {
        val len = buf.getInt
        val out = new Array[Byte](len)
        buf.get(out)
        out
      }

      private def skip(tpe: Byte): Unit = tpe match {
        case TBool | TByte => buf.position(buf.position() + 1)
        case TI16 => buf.position(buf.position() + 2)
        case TI32 => buf.position(buf.position() + 4)
        case TI64 | TDouble => buf.position(buf.position() + 8)
        case TBinary => buf.position(buf.position() + buf.getInt)
        case TStruct =>
          var done = false
          while (!done) {
            val t = buf.get()
            if (t == TStop) done = true else { buf.getShort; skip(t) }
          }
        case TList | TSet =>
          val elemType = buf.get(); val n = buf.getInt
          var i = 0; while (i < n) { skip(elemType); i += 1 }
        case TMap =>
          val kt = buf.get(); val vt = buf.get(); val n = buf.getInt
          var i = 0; while (i < n) { skip(kt); skip(vt); i += 1 }
        case _ => throw new IllegalArgumentException(s"unknown thrift type $tpe")
      }

      override def hasNext: Boolean = nextMsg != null
      override def next(): DecodedMessage = {
        val m = nextMsg; advance(); m
      }
    }
}
