package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.PartitionMetadata

class SinkSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("KeyTemplate renders default tokens, env vars, filename groups") {
    val t = KeyTemplate(
      keyFormat = "logs/{{LOGNAME}}/{{y}}/{{M}}/{{d}}/${STAGE}/%{app}-{{UUID}}.log",
      logName = "mylog",
      hostname = "h1",
      filenamePattern = Some("(?<app>[a-z]+)\\.log.*"),
      filenameTokens = Seq("app"),
      env = Map("STAGE" -> "prod"))
    val key = t.render(sourceFilename = "frontend.log.1",
      nowMs = 1704067200000L, uuid = "abcd1234") // 2024-01-01T00:00:00Z
    assert(key == "logs/mylog/2024/01/01/prod/frontend-abcd1234.log")
  }

  test("KeyTemplate leaves filename tokens unreplaced on pattern miss (reference behavior)") {
    val t = KeyTemplate("k/%{app}.log", "l",
      filenamePattern = Some("(?<app>[a-z]+)\\.log"), filenameTokens = Seq("app"))
    assert(t.render(sourceFilename = "UNMATCHED", nowMs = 0L, uuid = "u") == "k/%{app}.log")
  }

  test("KeyTemplate passes unknown tokens through verbatim") {
    val t = KeyTemplate("a/{{NOPE}}/b", "l")
    assert(t.render(nowMs = 0L, uuid = "u") == "a/{{NOPE}}/b")
  }

  test("RolledObjectSink rolls at size threshold and reports metadata") {
    val outDir = Files.createTempDirectory("graft-objsink")
    val tmpl = KeyTemplate("{{LOGNAME}}-{{UUID}}.log", "roll")
    val sink = new RolledObjectSink(s"file://$outDir", tmpl, maxObjectBytes = 64)
    val df = (1 to 20).map(i => f"record-$i%03d".getBytes).toDF("value").coalesce(1)
    val metas = sink.writeEpoch(df, batchId = 7L)
    assert(metas.map(_.records).sum == 20)
    assert(metas.size > 1, "should roll into multiple objects at 64-byte threshold")
    assert(metas.forall(_.bytes <= 64))
    // content roundtrip
    val all = metas.sortBy(_.path).flatMap { m =>
      new String(Files.readAllBytes(java.nio.file.Paths.get(
        m.path.stripPrefix("file:")))).split("\n").toSeq
    }
    assert(all.size == 20)
    assert(all.head.startsWith("record-"))
    // deterministic names: batchId embedded => retry overwrites
    assert(metas.forall(_.path.contains("roll-0007-")))
  }

  test("streaming pipeline with RolledObjects writer delivers templated raw objects") {
    import graft.model._
    import org.apache.spark.sql.streaming.Trigger
    val logDir = Files.createTempDirectory("graft-ro-logs")
    val outDir = Files.createTempDirectory("graft-ro-out")
    Files.writeString(logDir.resolve("a.log"), "x1\nx2\nx3\n")
    val cfg = PipelineConfig(
      name = "ro-test", logDir = logDir.toString,
      writer = WriterSpec.RolledObjects(s"file://$outDir", "{{LOGNAME}}/{{y}}/{{UUID}}.log"),
      checkpointDir = Some(Files.createTempDirectory("graft-ro-cp").toString))
    val q = LogPipeline.start(spark, cfg, Trigger.ProcessingTime("100 milliseconds"))
    q.processAllAvailable()
    q.stop()
    val files = java.nio.file.Files.walk(outDir).filter(_.toString.endsWith(".log"))
      .toArray.map(_.toString)
    assert(files.nonEmpty)
    assert(files.head.contains("ro-test/"))
    val lines = files.flatMap(f =>
      new String(Files.readAllBytes(java.nio.file.Paths.get(f))).split("\n").toSeq)
    assert(lines.toSet == Set("x1", "x2", "x3"))
  }

  test("PartitionMetadata: locality filter with fallback; leaderless skip") {
    val racks = Map(0 -> "us-east-1a", 1 -> "us-east-1b", 2 -> "us-east-1a", 3 -> "us-east-1c")
    assert(PartitionMetadata.localPartitions(racks, "us-east-1a") == Seq(0, 2))
    assert(PartitionMetadata.localPartitions(racks, "eu-west-1a") == Seq(0, 1, 2, 3))
    val leaders = Map(0 -> Some(101), 1 -> None, 2 -> Some(103))
    assert(PartitionMetadata.skipLeaderless(leaders) == Seq(0, 2))
  }

  test("PartitionMetadataCache: interval refresh, stale-on-failure, locality+leader compose") {
    import graft.functions.{PartitionInfo, PartitionMetadataCache}
    var now = 0L
    var fetches = 0
    var fail = false
    var meta = Map(
      0 -> PartitionInfo(Some(101), "az-1"),
      1 -> PartitionInfo(Some(102), "az-2"),
      2 -> PartitionInfo(None, "az-1"))
    val cache = new PartitionMetadataCache(
      () => { fetches += 1; if (fail) throw new RuntimeException("broker down"); meta },
      refreshIntervalMs = 10000L, clock = () => now)

    // leaderless 2 dropped, locality picks az-1 → {0}; az-3 falls back to all live
    assert(cache.writablePartitions("az-1") == Seq(0))
    assert(cache.writablePartitions("az-3") == Seq(0, 1))
    assert(fetches == 1, "within interval: no second fetch")

    // past the interval: refetch picks up new metadata
    now = 10000L
    meta = meta + (2 -> PartitionInfo(Some(103), "az-1")) + (3 -> PartitionInfo(Some(104), "az-1"))
    assert(cache.writablePartitions("az-1") == Seq(0, 2, 3))
    assert(fetches == 2)

    // a failing refresh keeps last-known-good (stale beats none)
    now = 20000L; fail = true
    assert(cache.writablePartitions("az-1") == Seq(0, 2, 3))
    assert(fetches == 3)
    // failure doesn't hot-loop the broker: next call inside interval skips
    assert(cache.writablePartitions("az-1") == Seq(0, 2, 3))
    assert(fetches == 3)

    // no metadata at all → empty (caller degrades to Default partitioner)
    val empty = new PartitionMetadataCache(() => throw new RuntimeException("down"),
      clock = () => 0L)
    assert(empty.writablePartitions("az-1").isEmpty)
  }

  test("BrokerAdmin fetcher: describeCluster/describeTopic join drives the cache end-to-end") {
    import graft.functions.{BrokerAdmin, BrokerNode, PartitionMetadataCache, TopicPartitionMeta}
    var now = 0L
    var down = false
    // scripted AdminClient-shaped fake: leader of p1 moves az-2→az-1 between
    // refreshes; p2 starts leaderless then recovers; p3's leader node is
    // absent from describeCluster (rack unknown)
    var nodes = Seq(BrokerNode(101, "az-1"), BrokerNode(102, "az-2"))
    var parts = Seq(
      TopicPartitionMeta(0, Some(101)),
      TopicPartitionMeta(1, Some(102)),
      TopicPartitionMeta(2, None),
      TopicPartitionMeta(3, Some(999)))
    val admin = new BrokerAdmin {
      def describeCluster(): Seq[BrokerNode] =
        if (down) throw new RuntimeException("admin timeout") else nodes
      def describeTopic(topic: String): Seq[TopicPartitionMeta] = {
        assert(topic == "events_out"); parts
      }
    }
    val cache = new PartitionMetadataCache(
      BrokerAdmin.fetcher(admin, "events_out"),
      refreshIntervalMs = 10000L, clock = () => now)

    // p2 leaderless-dropped; p3's unknown-rack leader survives the skip but
    // never matches a real rack; az-1 locality → {0}
    assert(cache.writablePartitions("az-1") == Seq(0))
    // unknown rack falls back to all live (0,1,3) for a foreign-rack writer
    assert(cache.writablePartitions("az-9") == Seq(0, 1, 3))

    // 10 s later: p1's leader moved onto an az-1 node, p2 recovered on 103/az-1
    now = 10000L
    nodes = nodes :+ BrokerNode(103, "az-1")
    parts = Seq(
      TopicPartitionMeta(0, Some(101)),
      TopicPartitionMeta(1, Some(103)),
      TopicPartitionMeta(2, Some(103)),
      TopicPartitionMeta(3, Some(999)))
    assert(cache.writablePartitions("az-1") == Seq(0, 1, 2))

    // admin outage past the interval: stale-but-served, no throw
    now = 20000L; down = true
    assert(cache.writablePartitions("az-1") == Seq(0, 1, 2))
  }

  // ---------------------------------------------------------------- epoch
  // transactions: fake producer records the protocol calls

  import java.util.concurrent.CompletableFuture

  /** Scripted producer: `failPartitions` fail their sends async;
    * `hangPartitions` never complete (exercises the endCommit timeout). */
  class FakeProducer(partitions: Seq[(Int, Option[Int])],
      failPartitions: Set[Int] = Set.empty,
      hangPartitions: Set[Int] = Set.empty) extends EpochProducer {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    val sent = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    override def partitionsFor(topic: String): Seq[(Int, Option[Int])] = {
      calls += "partitionsFor"; partitions
    }
    override def beginTransaction(): Unit = calls += "begin"
    override def send(topic: String, partition: Int, key: Array[Byte],
        value: Array[Byte], headers: Seq[(String, Array[Byte])]): CompletableFuture[Void] = {
      sent += ((partition, new String(value)))
      val f = new CompletableFuture[Void]()
      if (hangPartitions.contains(partition)) () // never completes
      else if (failPartitions.contains(partition))
        f.completeExceptionally(new RuntimeException(s"broker $partition down"))
      else f.complete(null)
      f
    }
    override def commitTransaction(): Unit = calls += "commit"
    override def abortTransaction(): Unit = calls += "abort"
  }

  private def records(n: Int): Iterator[EpochRecord] =
    (0 until n).iterator.map(i =>
      EpochRecord(i, Array.emptyByteArray, s"m$i".getBytes))

  test("TransactionalEpochWriter commits when every bucket acks") {
    val p = new FakeProducer(Seq(0 -> Some(100), 1 -> Some(101), 2 -> Some(102)))
    val w = new TransactionalEpochWriter(p, "t", transactional = true)
    val commit = w.writeEpoch(records(9))
    assert(commit.total == 9)
    assert(commit.counts == Map(0 -> 3, 1 -> 3, 2 -> 3)) // round-robin routing
    assert(p.calls == Seq("partitionsFor", "begin", "commit"))
  }

  test("TransactionalEpochWriter aborts when ANY bucket fails; commit never called") {
    val p = new FakeProducer(Seq(0 -> Some(100), 1 -> Some(101)), failPartitions = Set(1))
    val w = new TransactionalEpochWriter(p, "t", transactional = true)
    val e = intercept[EpochWriteException] { w.writeEpoch(records(6)) }
    assert(e.getMessage.contains("failed"))
    assert(p.calls == Seq("partitionsFor", "begin", "abort"))
    // the healthy bucket's sends DID go out — the abort is what voids them
    assert(p.sent.count(_._1 == 0) == 3)
  }

  test("TransactionalEpochWriter endCommit barrier times out and aborts") {
    val p = new FakeProducer(Seq(0 -> Some(100), 1 -> Some(101)), hangPartitions = Set(1))
    val w = new TransactionalEpochWriter(p, "t", transactional = true,
      writeTimeoutSeconds = 1)
    val e = intercept[EpochWriteException] { w.writeEpoch(records(4)) }
    assert(e.getMessage.contains("timed out"))
    assert(p.calls == Seq("partitionsFor", "begin", "abort"))
  }

  test("TransactionalEpochWriter skips leaderless partitions when routing") {
    val p = new FakeProducer(Seq(0 -> Some(100), 1 -> None, 2 -> Some(102)))
    val w = new TransactionalEpochWriter(p, "t", transactional = true)
    val commit = w.writeEpoch(records(8))
    assert(commit.total == 8)
    assert(commit.counts.keySet == Set(0, 2), "leaderless partition 1 must get nothing")
  }

  test("TransactionalEpochWriter non-transactional mode never begins/commits/aborts") {
    val ok = new FakeProducer(Seq(0 -> Some(100)))
    new TransactionalEpochWriter(ok, "t", transactional = false).writeEpoch(records(3))
    assert(ok.calls == Seq("partitionsFor"))
    val bad = new FakeProducer(Seq(0 -> Some(100)), failPartitions = Set(0))
    intercept[EpochWriteException] {
      new TransactionalEpochWriter(bad, "t", transactional = false).writeEpoch(records(3))
    }
    assert(bad.calls == Seq("partitionsFor"), "no abort without a transaction")
  }

  /** Scripted Pulsar producer: records call order; `failAll` completes
    * sends exceptionally. */
  class FakePulsarProducer(failAll: Boolean = false) extends PulsarEpochProducer {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    val sent = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    override def sendAsync(topic: String, partition: Int, key: Array[Byte],
        value: Array[Byte], properties: Map[String, String]): CompletableFuture[Void] = {
      calls += "send"; sent += ((partition, new String(value)))
      val f = new CompletableFuture[Void]()
      if (failAll) f.completeExceptionally(new RuntimeException("broker down"))
      else f.complete(null)
      f
    }
    override def flush(): Unit = calls += "flush"
  }

  test("PulsarEpochWriter sends all, flushes, then awaits the batch barrier") {
    val p = new FakePulsarProducer()
    val n = new PulsarEpochWriter(p, "t").writeEpoch(
      (0 until 5).iterator.map(i => PulsarRecord(i, Array.emptyByteArray, s"m$i".getBytes)))
    assert(n == 5)
    // reference ordering: every sendAsync precedes the flush
    assert(p.calls == Seq.fill(5)("send") :+ "flush")
  }

  test("PulsarEpochWriter fails the whole epoch when any send fails") {
    val p = new FakePulsarProducer(failAll = true)
    intercept[EpochWriteException] {
      new PulsarEpochWriter(p, "t").writeEpoch(
        Iterator(PulsarRecord(0, Array.emptyByteArray, "m".getBytes)))
    }
  }

  test("WriterSpec.Pulsar drives the per-task protocol through writeBatch") {
    import graft.model._
    val made = new java.util.concurrent.CopyOnWriteArrayList[FakePulsarProducer]()
    val saved = PulsarProducers.factory
    PulsarProducers.factory = _ => { val p = new FakePulsarProducer(); made.add(p); p }
    try {
      val df = (0 until 12).map(i => (s"k$i".getBytes, s"v$i".getBytes, i, "t"))
        .toDF("key", "value", "partition", "topic").repartition(3)
      val cfg = PipelineConfig(name = "pl", logDir = "/tmp",
        writer = WriterSpec.Pulsar("pulsar://fake:6650", "t"))
      assert(LogPipeline.writeBatch(df, cfg) == 12)
      val all = made.toArray(Array.empty[FakePulsarProducer])
      assert(all.map(_.sent.size).sum == 12)
      all.filter(_.sent.nonEmpty).foreach(p => assert(p.calls.last == "flush"))
    } finally PulsarProducers.factory = saved
  }

  test("WriterSpec.Kafka(transactional) drives the per-task protocol through writeBatch") {
    import graft.model._
    val made = new java.util.concurrent.CopyOnWriteArrayList[FakeProducer]()
    val saved = EpochProducers.factory
    EpochProducers.factory = _ => {
      val p = new FakeProducer(Seq(0 -> Some(100), 1 -> Some(101)))
      made.add(p); p
    }
    try {
      val df = (0 until 20).map(i => (s"k$i".getBytes, s"v$i".getBytes, i, "t"))
        .toDF("key", "value", "partition", "topic").repartition(4)
      val cfg = PipelineConfig(name = "tx", logDir = "/tmp",
        writer = WriterSpec.Kafka("fake:9092", "t", transactional = true))
      val n = LogPipeline.writeBatch(df, cfg)
      assert(n == 20)
      val all = made.toArray(Array.empty[FakeProducer])
      assert(all.nonEmpty)
      // every task's producer ran the full begin→commit protocol
      all.filter(_.sent.nonEmpty).foreach(p =>
        assert(p.calls == Seq("partitionsFor", "begin", "commit")))
      assert(all.map(_.sent.size).sum == 20)
    } finally EpochProducers.factory = saved
  }
}
