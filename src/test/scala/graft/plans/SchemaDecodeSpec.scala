package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.WireCodecs
import graft.plans.SchemaDecode.ProtoField

class SchemaDecodeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("avro_decode round-trips records incl. nullable unions, arrays, maps, bytes") {
    val schemaJson =
      """{"type":"record","name":"R","fields":[
         {"name":"id","type":"long"},
         {"name":"name","type":["null","string"],"default":null},
         {"name":"score","type":"double"},
         {"name":"tags","type":{"type":"array","items":"string"}},
         {"name":"attrs","type":{"type":"map","values":"int"}},
         {"name":"blob","type":"bytes"}]}"""
    def enc(id: Long, name: String, score: Double, tags: Seq[String],
        attrs: Map[String, Int], blob: Array[Byte]): Array[Byte] =
      WireCodecs.avroEncode(schemaJson, Long.box(id), name, Double.box(score),
        new java.util.ArrayList[String](scala.jdk.CollectionConverters
          .SeqHasAsJava(tags).asJava),
        new java.util.HashMap[String, Integer](scala.jdk.CollectionConverters
          .MapHasAsJava(attrs.map { case (k, v) => k -> Integer.valueOf(v) }).asJava),
        java.nio.ByteBuffer.wrap(blob))

    val df = Seq(
      enc(1L, "alpha", 1.5, Seq("a", "b"), Map("x" -> 7), Array[Byte](1, 2)),
      enc(2L, null, -0.25, Nil, Map.empty, Array[Byte]())
    ).toDF("payload")
      .select(SchemaDecode.avroDecode(col("payload"), schemaJson).as("r"))
      .select("r.id", "r.name", "r.score", "r.tags", "r.attrs", "r.blob")
    val rows = df.orderBy("id").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "alpha")
    assert(rows(0).getDouble(2) == 1.5)
    assert(rows(0).getSeq[String](3) == Seq("a", "b"))
    assert(rows(0).getMap[String, Int](4) == Map("x" -> 7))
    assert(rows(0).getAs[Array[Byte]](5).toSeq == Seq[Byte](1, 2))
    assert(rows(1).isNullAt(1) && rows(1).getDouble(2) == -0.25)
    assert(rows(1).getSeq[String](3).isEmpty)
  }

  test("proto_decode handles varint, zigzag, fixed, strings, packed repeated, unknown skip") {
    import WireCodecs._
    val fields = Seq(
      ProtoField(1, "id", "int64"),
      ProtoField(2, "name", "string"),
      ProtoField(3, "delta", "sint64"),
      ProtoField(4, "score", "double"),
      ProtoField(5, "flag", "bool"),
      ProtoField(6, "xs", "int64", repeated = true))

    val m1 = protoMessage { o =>
      writeInt64(o, 1, 123456789L)
      writeString(o, 2, "héllo")
      writeTag(o, 3, 0); writeVarint(o, zigzagEncode(-42L))
      writeDouble(o, 4, 2.75)
      writeInt64(o, 5, 1L)
      // unknown fields of every wire type must be skipped
      writeInt64(o, 10, 999L)
      writeString(o, 11, "junk")
      writeDouble(o, 12, 1.0)
      // unpacked repeated
      writeInt64(o, 6, 5L); writeInt64(o, 6, 6L)
    }
    // packed repeated encoding for field 6
    val m2 = protoMessage { o =>
      writeInt64(o, 1, 1L)
      writeTag(o, 6, 2)
      val inner = protoMessage { i => writeVarint(i, 7L); writeVarint(i, 8L); writeVarint(i, 9L) }
      writeVarint(o, inner.length.toLong); o.write(inner, 0, inner.length)
    }
    val rows = Seq(m1, m2).toDF("payload")
      .select(SchemaDecode.protoDecode(col("payload"), fields).as("r"))
      .select("r.id", "r.name", "r.delta", "r.score", "r.flag", "r.xs")
      .orderBy("id").collect()
    val r2 = rows(0); val r1 = rows(1)
    assert(r1.getLong(0) == 123456789L && r1.getString(1) == "héllo")
    assert(r1.getLong(2) == -42L && r1.getDouble(3) == 2.75 && r1.getBoolean(4))
    assert(r1.getSeq[Long](5) == Seq(5L, 6L))
    assert(r2.getLong(0) == 1L && r2.isNullAt(1) && r2.isNullAt(2))
    assert(r2.getSeq[Long](5) == Seq(7L, 8L, 9L))
  }

  test("proto_decode missing fields are null; repeated missing is null not empty") {
    val m = WireCodecs.protoMessage(o => WireCodecs.writeInt64(o, 1, 5L))
    val row = Seq(m).toDF("payload")
      .select(SchemaDecode.protoDecode(col("payload"), Seq(
        ProtoField(1, "id", "int64"), ProtoField(2, "name", "string"),
        ProtoField(3, "xs", "int32", repeated = true))).as("r"))
      .select("r.id", "r.name", "r.xs").collect().head
    assert(row.getLong(0) == 5L && row.isNullAt(1) && row.isNullAt(2))
  }
}
