package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression partitioner family — the reference's "shuffle".
  *
  * Each mirrors a `KafkaMessagePartitioner` implementation
  * (reference: writer/KafkaMessagePartitioner.java:1-35 and
  * writer/partitioners/). In Spark the Kafka sink honors an explicit
  * `partition` column, so every partitioner is a pure, codegen'd column
  * expression — no executor-side plugin loading, no per-record virtual call.
  * At 100 TB this matters: the partition assignment stays inside
  * whole-stage codegen instead of being a black-box UDF.
  */
object Partitioners {

  /** Uniform random partition per message
    * (reference: writer/partitioners/DefaultPartitioner.java:25-32). */
  def defaultPartition(numPartitions: Int): Column =
    floor(rand() * numPartitions).cast("int")

  /** `abs(crc32(key) % n)`, random on null key
    * (reference: writer/partitioners/Crc32ByteArrayPartitioner.java:40-66).
    * Spark's `crc32` returns an unsigned 32-bit value in a long, so `pmod`
    * reproduces the reference's double-`Math.abs` result exactly. */
  def crc32Partition(key: Column, numPartitions: Int): Column =
    when(key.isNull, defaultPartition(numPartitions))
      .otherwise(pmod(crc32(key), lit(numPartitions.toLong)).cast("int"))

  /** `abs(abs(murmur3_32(key)) % n)`, random on null key — EXACT bit
    * parity with the reference (Guava murmur3_32 seed 0, double-abs;
    * reference: writer/partitioners/MurmurByteArrayPartitioner.java:30-52),
    * via the native [[graft.plans.Murmur3PartitionExpr]]. Spark's builtin
    * `hash` (seed 42) + `pmod` is distribution-equivalent but routes
    * individual keys differently, which matters when draining a stream the
    * reference produced. */
  def murmurPartition(key: Column, numPartitions: Int): Column =
    when(key.isNull, defaultPartition(numPartitions))
      .otherwise(graft.plans.SketchExpressions.murmur3Partition(key, numPartitions))

  /** `abs(md5(utf8(key)) % n)` legacy string-key partitioner
    * (reference: writer/StringKeyMd5Partitioner.java:1-52). Uses the top 15
    * hex digits (60 bits) of the digest — sign-safe and cheap. */
  def md5StringKeyPartition(key: Column, numPartitions: Int): Column =
    when(key.isNull, defaultPartition(numPartitions))
      .otherwise(pmod(conv(substring(md5(key.cast("binary")), 1, 15), 16, 10).cast("long"),
        lit(numPartitions.toLong)).cast("int"))

  /** Deterministic modulo partitioner for integral keys — the oracle-friendly
    * member of the family (same arithmetic as the crc/murmur family, minus the
    * hash). */
  def modPartition(key: Column, numPartitions: Int): Column =
    pmod(key.cast("long"), lit(numPartitions.toLong)).cast("int")

  /** Round-robin across all partitions
    * (reference: writer/partitioners/SimpleRoundRobinPartitioner.java:1-52).
    * `monotonically_increasing_id` keeps it distributed — per-partition
    * counters, no global coordination. */
  def roundRobinPartition(numPartitions: Int): Column =
    pmod(monotonically_increasing_id(), lit(numPartitions.toLong)).cast("int")

  /** One partition pinned per query start — batches a host's traffic
    * (reference: writer/partitioners/SinglePartitionPartitioner.java:30-43). */
  def singlePartition(numPartitions: Int, seed: Long = System.nanoTime()): Column =
    lit(new java.util.Random(seed).nextInt(numPartitions))

  /** Pin to a fixed subset, round-robin within
    * (reference: writer/partitioners/FixedPartitionsPartitioner.java:38-76). */
  def fixedPartitions(chosen: Seq[Int]): Column = {
    require(chosen.nonEmpty, "fixedPartitions needs at least one partition")
    element_at(
      array(chosen.map(lit): _*),
      (pmod(monotonically_increasing_id(), lit(chosen.size.toLong)) + 1).cast("int"))
  }

  /** Random among a locality-filtered partition list — the driver resolves
    * rack-local partitions (e.g. via Kafka AdminClient) and broadcasts the
    * list into the plan as a literal array
    * (reference: writer/partitioners/LocalityAwareRandomPartitioner.java:26-51). */
  def localityAwareRandom(localPartitions: Seq[Int]): Column = {
    require(localPartitions.nonEmpty, "no local partitions")
    element_at(
      array(localPartitions.map(lit): _*),
      (floor(rand() * localPartitions.size) + 1).cast("int"))
  }
}

/** Driver-side partition-set resolution feeding the partitioner expressions —
  * the metadata half of the reference's locality/leaderless logic. In
  * production the maps come from Kafka AdminClient `describeTopics`; the
  * resolution itself is pure and broadcast into the plan as literals (no
  * executor-side metadata RPCs, refreshed per micro-batch at most). */
object PartitionMetadata {

  /** Partitions whose leader broker sits in the local rack/AZ; falls back to
    * ALL partitions when none are local
    * (reference: writer/partitioners/LocalityAwarePartitioner.java:60-104). */
  def localPartitions(partitionRacks: Map[Int, String], localRack: String): Seq[Int] = {
    val local = partitionRacks.collect { case (p, r) if r == localRack => p }.toSeq.sorted
    if (local.nonEmpty) local else partitionRacks.keys.toSeq.sorted
  }

  /** Drop partitions with no leader (under-replicated) so writes never block
    * on them (reference: writer/KafkaWriter.java:315-325;
    * config.thrift:142 `skipNoLeaderPartitions`). */
  def skipLeaderless(partitionLeaders: Map[Int, Option[Int]]): Seq[Int] =
    partitionLeaders.collect { case (p, Some(_)) => p }.toSeq.sorted
}

/** One partition's live metadata: leader broker (None = leaderless) and the
  * leader's rack/AZ. */
case class PartitionInfo(leader: Option[Int], rack: String)

/** Periodically refreshed topic metadata feeding [[PartitionMetadata]] —
  * the live half the reference gets from AdminClient
  * (reference: writer/partitioners/LocalityAwarePartitioner.java:60-104
  * refreshes every 10 s). `fetch` is the AdminClient-shaped seam
  * (`describeTopics` → partition → (leader, rack)), injectable for tests
  * and swappable for a real client where one is on the classpath.
  *
  * Failure semantics mirror the reference: a failed refresh KEEPS the
  * last-known-good metadata (stale beats none); with no metadata at all the
  * resolution returns empty and the caller degrades to the Default
  * partitioner. Refresh runs at most once per `refreshIntervalMs`, on the
  * driver, per micro-batch at most — executors never see metadata RPCs. */
class PartitionMetadataCache(
    fetch: () => Map[Int, PartitionInfo],
    refreshIntervalMs: Long = 10000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  private var cached: Map[Int, PartitionInfo] = Map.empty
  private var everFetched = false
  private var lastFetchMs = 0L

  /** Refresh if due; never throws. Returns whether a refresh succeeded. */
  def maybeRefresh(): Boolean = synchronized {
    val now = clock()
    if (everFetched && now - lastFetchMs < refreshIntervalMs) false
    else {
      everFetched = true
      lastFetchMs = now
      try { cached = fetch(); true }
      catch { case _: Exception => false } // keep last-known-good
    }
  }

  /** Writable partition set: leaderless dropped (when asked), then
    * locality-filtered with the reference's fall-back-to-all. Empty iff no
    * metadata has ever been fetched. */
  def writablePartitions(localRack: String, skipNoLeader: Boolean = true): Seq[Int] =
    synchronized {
      maybeRefresh()
      if (cached.isEmpty) Seq.empty
      else {
        val live =
          if (skipNoLeader)
            PartitionMetadata.skipLeaderless(cached.view.mapValues(_.leader).toMap)
          else cached.keys.toSeq.sorted
        PartitionMetadata.localPartitions(
          cached.collect { case (p, i) if live.contains(p) => p -> i.rack }, localRack)
      }
    }
}

/** One broker node of the cluster: id + rack/AZ. The AdminClient
  * `describeCluster` row shape (reference:
  * writer/partitioners/LocalityAwarePartitioner.java:60-104 resolves
  * leader racks from cluster node metadata). */
case class BrokerNode(id: Int, rack: String)

/** One partition's topic metadata: partition id + leader node id
  * (None = currently leaderless / under-replicated) — the
  * `describeTopics` row shape. */
case class TopicPartitionMeta(partition: Int, leaderNodeId: Option[Int])

/** AdminClient-shaped metadata source. The two calls mirror the exact
  * slice of `org.apache.kafka.clients.admin.AdminClient` the reference's
  * locality partitioner uses — `describeCluster` (node → rack) and
  * `describeTopics` (partition → leader). A real-client binding lives in
  * `tools/adapters/` (unbuilt here: no kafka-clients jar on this
  * classpath); specs script a fake. */
trait BrokerAdmin {
  def describeCluster(): Seq[BrokerNode]
  def describeTopic(topic: String): Seq[TopicPartitionMeta]
  def close(): Unit = ()
}

object BrokerAdmin {
  /** Adapt a [[BrokerAdmin]] to [[PartitionMetadataCache]]'s fetch seam:
    * join topic leaders onto cluster racks, exactly the reference's
    * refresh body. A leaderless partition keeps an empty rack (it is
    * dropped by skipNoLeader before rack filtering anyway); a leader whose
    * node is missing from the cluster description also maps to the empty
    * rack, so it survives leaderless-skip but only matches the
    * fall-back-to-all path — never a real local rack. Throws propagate to
    * the cache, which keeps last-known-good. */
  def fetcher(admin: BrokerAdmin, topic: String): () => Map[Int, PartitionInfo] =
    () => {
      val racks = admin.describeCluster().map(n => n.id -> n.rack).toMap
      admin.describeTopic(topic).map { tp =>
        tp.partition -> PartitionInfo(
          tp.leaderNodeId, tp.leaderNodeId.flatMap(racks.get).getOrElse(""))
      }.toMap
    }
}
