// UNBUILT OPTIONAL SOURCE — not on the default compile path.
//
// This file is the thin live-client half of the two injectable seams the
// engine ships spec-tested against scripted fakes:
//
//   graft.streaming.EpochProducers.factory        (transactional epoch writer)
//   graft.functions.PartitionMetadataCache fetch  (locality-aware partitioner)
//   graft.streaming.PulsarProducers.factory       (Pulsar batch writer)
//
// The build container ships no kafka-clients / pulsar-client jar (zero
// egress, fixed unmanaged classpath), so this directory is NOT in
// `Compile / unmanagedSourceDirectories`. To wire it up in a deployment:
//
//   1. put kafka-clients (>= 3.x) and/or pulsar-client (>= 3.x) on the
//      classpath;
//   2. add to build.sbt:
//        Compile / unmanagedSourceDirectories += baseDirectory.value / "tools" / "adapters"
//   3. at driver startup:
//        EpochProducers.factory = s => new KafkaClientsEpochProducer(s, txnId)
//        PulsarProducers.factory = url => new PulsarClientsEpochProducer(url)
//      and build locality metadata caches with
//        new PartitionMetadataCache(KafkaAdminMetadata.fetcher(servers, topic))
//
// Everything protocol-level (begin/send/barrier/commit-or-abort, leaderless
// skip, refresh/stale-on-failure) already lives, tested, behind the seams —
// these classes only translate the seam's narrow API onto the client jars.
//
// Bit-rot guard: `sbt adapterStubCompile` typechecks this file against
// embedded public-API stubs (tools/adapter-stubs/ClientApiStubs.scala), so
// seam-signature drift is caught in CI without the client jars.

package graft.adapters

import java.util.Properties
import java.util.concurrent.CompletableFuture

import scala.jdk.CollectionConverters._

import org.apache.kafka.clients.admin.AdminClient
import org.apache.kafka.clients.producer.{KafkaProducer, ProducerRecord, RecordMetadata}
import org.apache.kafka.common.header.internals.RecordHeader

import graft.functions.PartitionInfo
import graft.streaming.{EpochProducer, PulsarEpochProducer}

/** [[graft.streaming.EpochProducer]] over a real KafkaProducer.
  *
  * One instance per sink task (matching TransactionalEpochWriter's
  * task-scoped transaction): `transactionalId` must be unique per task for
  * transactional use — pass e.g. s"$queryId-$partitionId" — and
  * `initTransactions()` is called once at construction, as the reference
  * does at producer creation (writer/KafkaWriter.java:514-516). */
final class KafkaClientsEpochProducer(bootstrapServers: String,
    transactionalId: Option[String] = None) extends EpochProducer {

  private val producer: KafkaProducer[Array[Byte], Array[Byte]] = {
    val p = new Properties()
    p.put("bootstrap.servers", bootstrapServers)
    p.put("key.serializer", "org.apache.kafka.common.serialization.ByteArraySerializer")
    p.put("value.serializer", "org.apache.kafka.common.serialization.ByteArraySerializer")
    p.put("enable.idempotence", "true")
    p.put("acks", "all")
    transactionalId.foreach(id => p.put("transactional.id", id))
    val kp = new KafkaProducer[Array[Byte], Array[Byte]](p)
    if (transactionalId.isDefined) kp.initTransactions()
    kp
  }

  override def partitionsFor(topic: String): Seq[(Int, Option[Int])] =
    producer.partitionsFor(topic).asScala.toSeq
      .map(pi => (pi.partition(), Option(pi.leader()).filter(_.id() >= 0).map(_.id())))

  override def beginTransaction(): Unit = producer.beginTransaction()

  override def send(topic: String, partition: Int, key: Array[Byte],
      value: Array[Byte], headers: Seq[(String, Array[Byte])]): CompletableFuture[Void] = {
    val hs = headers.map { case (k, v) => new RecordHeader(k, v): org.apache.kafka.common.header.Header }
    val rec = new ProducerRecord[Array[Byte], Array[Byte]](
      topic, partition, key, value, hs.asJava)
    val cf = new CompletableFuture[Void]()
    // callback→future bridge, the reference's shape
    // (writer/kafka/CommittableKafkaWriter.java:215-223)
    producer.send(rec, (_: RecordMetadata, e: Exception) =>
      if (e == null) cf.complete(null) else cf.completeExceptionally(e))
    cf
  }

  override def commitTransaction(): Unit = producer.commitTransaction()
  override def abortTransaction(): Unit = producer.abortTransaction()
  override def close(): Unit = producer.close()
}

/** AdminClient-backed `fetch` for [[graft.functions.PartitionMetadataCache]]
  * — the reference's describeTopics refresh
  * (writer/partitioners/LocalityAwarePartitioner.java:60-104). The cache
  * already owns interval limiting and stale-on-failure; this is only the
  * RPC. One AdminClient per driver, shared across topics. */
object KafkaAdminMetadata {
  def fetcher(bootstrapServers: String, topic: String): () => Map[Int, PartitionInfo] = {
    val p = new Properties()
    p.put("bootstrap.servers", bootstrapServers)
    lazy val admin = AdminClient.create(p)
    () => {
      val desc = admin.describeTopics(java.util.List.of(topic))
        .allTopicNames().get().get(topic)
      desc.partitions().asScala.map { tpi =>
        val leader = Option(tpi.leader()).filter(_.id() >= 0)
        (tpi.partition(),
          PartitionInfo(leader.map(_.id()), leader.flatMap(n => Option(n.rack())).getOrElse("")))
      }.toMap
    }
  }
}

/** [[graft.functions.BrokerAdmin]] over a real AdminClient — the typed
  * describeCluster/describeTopics pair, for callers that prefer the shaped
  * interface (+ its scripted-fake specs) over the raw fetcher above:
  * `new PartitionMetadataCache(BrokerAdmin.fetcher(new KafkaBrokerAdmin(s), topic))`. */
final class KafkaBrokerAdmin(bootstrapServers: String)
    extends graft.functions.BrokerAdmin {
  private val admin = {
    val p = new Properties()
    p.put("bootstrap.servers", bootstrapServers)
    AdminClient.create(p)
  }
  override def describeCluster(): Seq[graft.functions.BrokerNode] =
    admin.describeCluster().nodes().get().asScala.toSeq
      .map(n => graft.functions.BrokerNode(n.id(), Option(n.rack()).getOrElse("")))
  override def describeTopic(topic: String): Seq[graft.functions.TopicPartitionMeta] =
    admin.describeTopics(java.util.List.of(topic))
      .allTopicNames().get().get(topic).partitions().asScala.toSeq
      .map(tpi => graft.functions.TopicPartitionMeta(
        tpi.partition(), Option(tpi.leader()).filter(_.id() >= 0).map(_.id())))
  override def close(): Unit = admin.close()
}

/** [[graft.streaming.PulsarEpochProducer]] over a real Pulsar client.
  * Partitioned-topic routing uses the engine's partition column verbatim
  * (reference: writer/pulsar/PulsarMessageRouter.java:40-51) by addressing
  * the internal `-partition-N` topic, Pulsar's stable per-partition name. */
final class PulsarClientsEpochProducer(serviceUrl: String)
    extends PulsarEpochProducer {

  private val client = org.apache.pulsar.client.api.PulsarClient.builder()
    .serviceUrl(serviceUrl).build()
  private val producers =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.pulsar.client.api.Producer[Array[Byte]]]()

  private def producerFor(topic: String, partition: Int) = {
    val name = s"$topic-partition-$partition"
    producers.computeIfAbsent(name, n =>
      client.newProducer().topic(n)
        .enableBatching(true) // the reference's batch path (PulsarWriter.java:68)
        .blockIfQueueFull(true)
        .create())
  }

  override def sendAsync(topic: String, partition: Int, key: Array[Byte],
      value: Array[Byte], properties: Map[String, String]): CompletableFuture[Void] =
    producerFor(topic, partition).newMessage()
      .keyBytes(key).value(value).properties(properties.asJava)
      .sendAsync().thenApply(_ => null: Void).toCompletableFuture

  override def flush(): Unit =
    producers.values().asScala.foreach(_.flush())

  override def close(): Unit = {
    producers.values().asScala.foreach(_.close())
    client.close()
  }
}
