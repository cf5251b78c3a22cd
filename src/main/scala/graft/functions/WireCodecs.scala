package graft.functions

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory

/** Encode-side twins of the schema-on-read decoders
  * ([[graft.plans.SchemaDecode]]) — used by round-trip oracles and anywhere
  * the pipeline must EMIT avro/proto payloads. Executor-safe: schemas are
  * cached per JVM, writer/encoder instances are per call. */
object WireCodecs {

  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Schema]()

  private def schemaOf(json: String): Schema =
    schemaCache.computeIfAbsent(json, j => new Schema.Parser().parse(j))

  /** Binary-encode one Avro datum; `values` in field-declaration order.
    * Nullable-union fields take the raw value or null. */
  def avroEncode(schemaJson: String, values: Any*): Array[Byte] = {
    val schema = schemaOf(schemaJson)
    val rec = new GenericData.Record(schema)
    schema.getFields.asScala.zip(values).foreach { case (f, v) => rec.put(f.pos(), v) }
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  // ---------------------------------------------- protobuf wire primitives

  def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  def writeTag(out: ByteArrayOutputStream, fieldNumber: Int, wireType: Int): Unit =
    writeVarint(out, (fieldNumber.toLong << 3) | wireType)

  def writeFixed64(out: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  def zigzagEncode(v: Long): Long = (v << 1) ^ (v >> 63)

  /** Encode one proto message of (field#, wire value) writes, via `f`. */
  def protoMessage(f: ByteArrayOutputStream => Unit): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    f(out)
    out.toByteArray
  }

  def writeString(out: ByteArrayOutputStream, fieldNumber: Int, s: String): Unit = {
    val b = s.getBytes("UTF-8")
    writeTag(out, fieldNumber, 2); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
  }

  def writeInt64(out: ByteArrayOutputStream, fieldNumber: Int, v: Long): Unit = {
    writeTag(out, fieldNumber, 0); writeVarint(out, v)
  }

  def writeDouble(out: ByteArrayOutputStream, fieldNumber: Int, v: Double): Unit = {
    writeTag(out, fieldNumber, 1); writeFixed64(out, java.lang.Double.doubleToLongBits(v))
  }
}
