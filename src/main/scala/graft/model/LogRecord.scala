package graft.model

import org.apache.spark.sql.types._

/** The engine's envelope record — the unit that flows source → transforms →
  * sink, mirroring the reference's `LogMessage`
  * (reference: singer-commons/src/main/thrift/singer_if.thrift:11-21) plus the
  * reader-injected headers of `LogMessageAndPosition`
  * (reference: singer-commons/src/main/thrift/singer.thrift:29-39).
  *
  * Columns match Spark's Kafka-sink contract (`key`, `value`, `headers`,
  * `partition`, `topic`) so a pipeline DataFrame can be handed to
  * `.write.format("kafka")` unchanged.
  */
case class LogRecord(
    key: Array[Byte],
    value: Array[Byte],
    timestampNanos: Long,
    checksum: Option[Long],
    headers: Map[String, Array[Byte]])

object LogRecord {
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = false),
    StructField("timestampNanos", LongType, nullable = true),
    StructField("checksum", LongType, nullable = true),
    StructField("headers", MapType(StringType, BinaryType), nullable = true)
  ))

  /** Kafka-sink column names (the subset Spark's Kafka writer understands). */
  val kafkaSinkColumns: Seq[String] = Seq("key", "value", "headers", "partition", "topic")
}
