package graft.streaming

import java.util.concurrent.{CompletableFuture, TimeUnit, TimeoutException}

import scala.collection.mutable

/** Producer-shaped seam for the Pulsar batch write protocol — the slice of
  * the Pulsar producer API the protocol needs (same stance as
  * [[EpochProducer]]): injectable for specs, swappable for a
  * pulsar-client-backed implementation where that jar is on the classpath
  * (this build ships none, so the default factory throws a clear error). */
trait PulsarEpochProducer {
  /** Async send; `partition` is the router output (the engine's partition
    * column IS [[graft.operators.Transforms.withPartition]]'s result —
    * reference: writer/pulsar/PulsarMessageRouter.java:40-51 routes with
    * the same partitioner family); `properties` are Pulsar message
    * properties (string→string, the header analog). */
  def sendAsync(topic: String, partition: Int, key: Array[Byte], value: Array[Byte],
      properties: Map[String, String]): CompletableFuture[Void]
  def flush(): Unit
  def close(): Unit = ()
}

/** One routed Pulsar record of an epoch. */
case class PulsarRecord(partition: Int, key: Array[Byte], value: Array[Byte],
    properties: Map[String, String] = Map.empty)

/** The reference's Pulsar batch write protocol (reference:
  * writer/pulsar/PulsarWriter.java:190-210: `sendAsync` per message,
  * collect futures, `flush()`, then await EVERY future — any failure fails
  * the whole batch, making the retried epoch at-least-once), run per sink
  * task like [[TransactionalEpochWriter]]. */
class PulsarEpochWriter(producer: PulsarEpochProducer, topic: String,
    writeTimeoutSeconds: Int = 60) {

  /** Send all records, flush, await the batch barrier; returns the count. */
  def writeEpoch(records: Iterator[PulsarRecord]): Int = {
    val futures = mutable.ArrayBuffer.empty[CompletableFuture[Void]]
    records.foreach { r =>
      futures += producer.sendAsync(topic, r.partition, r.key, r.value, r.properties)
    }
    producer.flush()
    try CompletableFuture.allOf(futures.toArray: _*)
      .get(writeTimeoutSeconds.toLong, TimeUnit.SECONDS)
    catch {
      case e: TimeoutException =>
        throw new EpochWriteException(
          s"pulsar epoch write to $topic timed out after $writeTimeoutSeconds s", e)
      case e: Exception =>
        throw new EpochWriteException(s"pulsar epoch write to $topic failed", e)
    }
    futures.size
  }
}

/** Driver-set producer factory — same injection stance as
  * [[EpochProducers]]. */
object PulsarProducers {
  @volatile var factory: String => PulsarEpochProducer = serviceUrl =>
    throw new UnsupportedOperationException(
      s"Pulsar producer for $serviceUrl requires pulsar-client on the " +
        "classpath (not shipped in this build); inject PulsarProducers" +
        ".factory or add the jar — see ROADMAP.md")
}
