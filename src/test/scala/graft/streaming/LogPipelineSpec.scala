package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model._

class LogPipelineSpec extends AnyFunSuite with SparkTestBase {

  private def tempDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  private def cfgFor(name: String, logDir: Path, outDir: Path, cp: Path): PipelineConfig =
    PipelineConfig(
      name = name,
      logDir = logDir.toString,
      reader = ReaderSpec.TextLine(filterRegex = Some("^data")),
      transforms = Seq(TransformSpec.RegexModifier("^data:(\\w+)", "payload=$1")),
      partitioner = PartitionerSpec.Crc32Key(8),
      writer = WriterSpec.Files(outDir.toString),
      checkpointDir = Some(cp.toString),
      injectHeaders = Map("az" -> "test-az"))

  test("batch replay applies the full transform chain") {
    val logDir = tempDir("graft-batch-logs")
    Files.writeString(logDir.resolve("x.log"), "data:a\nnoise line\ndata:b\n")
    val cfg = cfgFor("batch-test", logDir, tempDir("o"), tempDir("c"))
    val out = LogPipeline.runBatch(spark, cfg).collect()
    assert(out.length == 2) // noise filtered
    val values = out.map(r => new String(r.getAs[Array[Byte]]("value"))).toSet
    assert(values == Set("payload=a", "payload=b"))
    assert(out.forall(r => r.getAs[Int]("partition") >= 0 && r.getAs[Int]("partition") < 8))
    assert(out.forall(_.getAs[Boolean]("checksumValid")))
    assert(out.forall(r =>
      new String(r.getAs[Map[String, Array[Byte]]]("headers")("az")) == "test-az"))
  }

  test("streaming pipeline delivers, resumes after restart without loss or dupes, audits") {
    val logDir = tempDir("graft-stream-logs")
    val outDir = tempDir("graft-stream-out")
    val cpDir = tempDir("graft-stream-cp")
    val auditDir = tempDir("graft-audit")
    val audit = new AuditWriter(spark, auditDir.toString)
    val cfg = PipelineConfig(
      name = "stream-test",
      logDir = logDir.toString,
      reader = ReaderSpec.TextLine(),
      partitioner = PartitionerSpec.Crc32Key(4),
      writer = WriterSpec.Files(outDir.toString),
      checkpointDir = Some(cpDir.toString))

    Files.writeString(logDir.resolve("f1.log"), (1 to 10).map(i => s"m$i").mkString("", "\n", "\n"))
    val q1 = LogPipeline.start(spark, cfg, Trigger.ProcessingTime("100 milliseconds"), Some(audit))
    q1.processAllAvailable()
    assert(spark.read.parquet(outDir.toString).count() == 10)

    Files.writeString(logDir.resolve("f2.log"), (11 to 15).map(i => s"m$i").mkString("", "\n", "\n"))
    q1.processAllAvailable()
    assert(spark.read.parquet(outDir.toString).count() == 15)
    q1.stop()

    // restart from checkpoint; add more data — resumed query must deliver
    // only the new file (at-least-once, no reprocessing of committed files)
    Files.writeString(logDir.resolve("f3.log"), (16 to 20).map(i => s"m$i").mkString("", "\n", "\n"))
    val q2 = LogPipeline.start(spark, cfg, Trigger.ProcessingTime("100 milliseconds"), Some(audit))
    q2.processAllAvailable()
    q2.stop()
    val out = spark.read.parquet(outDir.toString)
    assert(out.count() == 20)
    val values = out.collect().map(r => new String(r.getAs[Array[Byte]]("value"))).toSet
    assert(values == (1 to 20).map(i => s"m$i").toSet)

    // audit oracle: sum of per-batch counts == delivered rows
    val totals = audit.totals().collect().head
    assert(totals.getAs[Long]("total_messages") == 20)
  }

  test("multiline streaming pipeline assembles records per file") {
    val logDir = tempDir("graft-ml-logs")
    val outDir = tempDir("graft-ml-out")
    val cfg = PipelineConfig(
      name = "ml-test",
      logDir = logDir.toString,
      reader = ReaderSpec.TextMultiline("^I[0-9]{5}"),
      partitioner = PartitionerSpec.RoundRobin(4),
      writer = WriterSpec.Files(outDir.toString),
      checkpointDir = Some(tempDir("graft-ml-cp").toString))
    Files.writeString(logDir.resolve("g.log"), "I00001 a\n cont-a\nI00002 b\n")
    val q = LogPipeline.start(spark, cfg, Trigger.ProcessingTime("100 milliseconds"))
    q.processAllAvailable()
    q.stop()
    val vals = spark.read.parquet(outDir.toString).collect()
      .map(r => new String(r.getAs[Array[Byte]]("value"))).toSet
    assert(vals == Set("I00001 a\n cont-a", "I00002 b"))
  }

  test("thrift streaming pipeline decodes frames end-to-end") {
    val logDir = tempDir("graft-th-logs")
    val outDir = tempDir("graft-th-out")
    import graft.sources.ThriftLogCodec
    val frames = (1 to 5).map(i =>
      ThriftLogCodec.encodeFrame(s"k$i".getBytes, s"msg$i".getBytes, Some(i.toLong), None))
    Files.write(logDir.resolve("t.log"), frames.reduce(_ ++ _))
    val cfg = PipelineConfig(
      name = "thrift-test",
      logDir = logDir.toString,
      reader = ReaderSpec.ThriftFramed(),
      partitioner = PartitionerSpec.MurmurKey(4),
      writer = WriterSpec.Files(outDir.toString),
      checkpointDir = Some(tempDir("graft-th-cp").toString))
    val q = LogPipeline.start(spark, cfg, Trigger.ProcessingTime("100 milliseconds"))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(outDir.toString).collect()
    assert(out.length == 5)
    assert(out.map(r => new String(r.getAs[Array[Byte]]("value"))).toSet ==
      (1 to 5).map(i => s"msg$i").toSet)
  }

  test("tail-mode pipeline ingests appends to a growing file end-to-end") {
    val logDir = tempDir("graft-tailp-logs")
    val outDir = tempDir("graft-tailp-out")
    val cfg = PipelineConfig(
      name = "tailp-test", logDir = logDir.toString,
      reader = ReaderSpec.TextLine(filterRegex = Some("^keep")),
      partitioner = PartitionerSpec.Crc32Key(4),
      writer = WriterSpec.Files(outDir.toString),
      checkpointDir = Some(tempDir("graft-tailp-cp").toString),
      tailMode = true)
    val f = logDir.resolve("grow.log")
    Files.writeString(f, "keep-1\ndrop-1\n")
    val q = LogPipeline.start(spark, cfg, Trigger.ProcessingTime("100 milliseconds"))
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(outDir.toString).count() == 1)
      Files.writeString(f, "keep-2\nkeep-3\n", java.nio.file.StandardOpenOption.APPEND)
      q.processAllAvailable()
      val vals = spark.read.parquet(outDir.toString).collect()
        .map(r => new String(r.getAs[Array[Byte]]("value"))).toSet
      assert(vals == Set("keep-1", "keep-2", "keep-3"))
    } finally q.stop()
  }

  test("heartbeat listener emits progress JSON") {
    val buf = new BufferingHeartbeat
    val listener = new HeartbeatListener(buf)
    spark.streams.addListener(listener)
    try {
      val logDir = tempDir("graft-hb-logs")
      Files.writeString(logDir.resolve("h.log"), "a\nb\n")
      val cfg = PipelineConfig(
        name = "hb-test", logDir = logDir.toString,
        writer = WriterSpec.Noop,
        checkpointDir = Some(tempDir("graft-hb-cp").toString))
      val q = LogPipeline.start(spark, cfg, Trigger.ProcessingTime("100 milliseconds"))
      q.processAllAvailable()
      q.stop()
      q.awaitTermination(10000)
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline &&
        !buf.messages.exists(_.contains("\"event\":\"progress\""))) Thread.sleep(100)
      assert(buf.messages.exists(_.contains("\"event\":\"started\"")))
      assert(buf.messages.exists(m =>
        m.contains("\"event\":\"progress\"") && m.contains("\"name\":\"hb-test\"")))
    } finally spark.streams.removeListener(listener)
  }

  test("numMessagesPerLogMessage packs lines in batch and streaming; filter skips whole pack") {
    val logDir = tempDir("graft-pk-logs")
    // 5 lines, n=2: pack0 (a,b) kept, pack1 (c, BAD d) dropped, pack2 (e) kept
    Files.writeString(logDir.resolve("p.log"), "ok a\nok b\nok c\nBAD d\nok e\n")
    def cfg(name: String) = PipelineConfig(
      name = name, logDir = logDir.toString,
      reader = ReaderSpec.TextLine(filterRegex = Some("ok.*"),
        prependHostname = true, prependDelimiter = "|", numMessagesPerLogMessage = 2),
      writer = WriterSpec.Files(tempDir(s"graft-pk-o-$name").toString),
      checkpointDir = Some(tempDir(s"graft-pk-c-$name").toString))
    val host = LogPipeline.hostname
    val expected = Set(s"$host|ok a\n$host|ok b", s"$host|ok e")

    val batch = LogPipeline.runBatch(spark, cfg("pk-b")).collect()
      .map(r => new String(r.getAs[Array[Byte]]("value"))).toSet
    assert(batch == expected)

    val c = cfg("pk-s")
    val q = LogPipeline.start(spark, c, Trigger.ProcessingTime("100 milliseconds"))
    q.processAllAvailable(); q.stop()
    val streamed = spark.read.parquet(c.writer.asInstanceOf[WriterSpec.Files].path)
      .collect().map(r => new String(r.getAs[Array[Byte]]("value"))).toSet
    assert(streamed == expected)
  }

  test("numMessagesPerLogMessage round-trips through properties") {
    val cfg = PipelineConfig.fromProperties(
      "logName=pk\nreader.type=text\nreader.text.numMessagesPerLogMessage=5\n")
    assert(cfg.reader.asInstanceOf[ReaderSpec.TextLine].numMessagesPerLogMessage == 5)
  }

  test("logStreamRegex gates stream membership in batch, file-stream and tail modes") {
    // reference: monitor/LogStreamManager.java:384-477 — only file NAMES
    // fully matching the regex belong to the stream
    val logDir = tempDir("graft-re-logs")
    Files.writeString(logDir.resolve("app.log"), "data:in1\n")
    Files.writeString(logDir.resolve("app.log.1"), "data:in2\n")
    Files.writeString(logDir.resolve("other.log"), "data:out\n")

    def cfg(name: String, tail: Boolean) = cfgFor(name, logDir,
      tempDir(s"graft-re-o-$name"), tempDir(s"graft-re-c-$name"))
      .copy(logStreamRegex = "app\\.log.*", tailMode = tail)

    def values(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => new String(r.getAs[Array[Byte]]("value"))).toSet

    // batch replay
    assert(values(LogPipeline.runBatch(spark, cfg("re-b", tail = false)).collect()) ==
      Set("payload=in1", "payload=in2"))

    // streaming file source
    val c1 = cfg("re-s", tail = false)
    val q1 = LogPipeline.start(spark, c1, Trigger.ProcessingTime("100 milliseconds"))
    q1.processAllAvailable(); q1.stop()
    val outDir1 = c1.writer.asInstanceOf[WriterSpec.Files].path
    assert(values(spark.read.parquet(outDir1).collect()) == Set("payload=in1", "payload=in2"))

    // tail mode: the non-matching file is never even listed
    val c2 = cfg("re-t", tail = true)
    val q2 = LogPipeline.start(spark, c2, Trigger.ProcessingTime("100 milliseconds"))
    q2.processAllAvailable(); q2.stop()
    val outDir2 = c2.writer.asInstanceOf[WriterSpec.Files].path
    assert(values(spark.read.parquet(outDir2).collect()) == Set("payload=in1", "payload=in2"))
  }

  test("kafka sink projection carries _mid/_ots headers in the Kafka writer encoding") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import graft.operators.Transforms
    val logDir = tempDir("graft-kh-logs")
    Files.writeString(logDir.resolve("k.log"), "data:a\ndata:b\n")
    val cfg = cfgFor("kafka-headers", logDir, tempDir("graft-kh-o"), tempDir("graft-kh-c"))
    val df = LogPipeline.runBatch(spark, cfg)
      .withColumn("topic", lit("t"))
      .withColumn("headers", map_concat(col("headers"),
        map(lit("_mid"), Transforms.midHeader(lit(7L), lit(42L)),
            lit("_ots"), Transforms.otsHeader(lit(123456789L)))))
    val out = LogPipeline.kafkaSinkProjection(df)
    // exact Kafka writer contract: key/value/partition/topic +
    // headers array<struct<key:string,value:binary>>
    assert(out.columns.toSeq == Seq("key", "value", "partition", "topic", "headers"))
    val hType = out.schema("headers").dataType
    assert(hType == ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", BinaryType))), containsNull = false), s"got $hType")
    val rows = out.collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val hs = r.getSeq[org.apache.spark.sql.Row](4)
        .map(h => h.getString(0) -> h.getAs[Array[Byte]](1)).toMap
      assert(new String(hs("az")) == "test-az")
      assert(hs("_mid").length == 16 && hs("_ots").length == 8)
      assert(BigInt(1, hs("_ots")).toLong == 123456789L)
      assert(BigInt(1, hs("_mid").take(8)).toLong == 7L)
      assert(BigInt(1, hs("_mid").drop(8)).toLong == 42L)
    }
    // a headerless frame degrades to the 4-column contract
    assert(LogPipeline.kafkaSinkProjection(df.drop("headers")).columns.toSeq ==
      Seq("key", "value", "partition", "topic"))
  }

  test("pulsar writer: config validation, random default router, properties projection") {
    // reference: writer/pulsar/PulsarWriter.java validateConfig +
    // DefaultPartitioner (random) + PulsarMessageRouter key routing
    intercept[IllegalArgumentException] {
      WriterSpec.Pulsar("pulsar://x:6650", "t", compressionType = "BROTLI")
    }
    intercept[IllegalArgumentException] {
      WriterSpec.Pulsar("pulsar://x:6650", "t", writeTimeoutSeconds = -1)
    }
    val cfg = PipelineConfig.fromProperties(
      """logName=pl
        |writer.type=pulsar
        |writer.pulsar.serviceUrl=pulsar://broker:6650
        |writer.pulsar.topic=pt
        |writer.pulsar.compressionType=zstd
        |writer.pulsar.numPartitions=16
        |""".stripMargin)
    assert(cfg.writer == WriterSpec.Pulsar("pulsar://broker:6650", "pt", "zstd", 60))
    // no partitionerClass → reference's DefaultPartitioner (random)
    assert(cfg.partitioner == PartitionerSpec.Default)
    val cfg2 = PipelineConfig.fromProperties(
      "logName=pl2\nwriter.type=pulsar\nwriter.pulsar.partitionerClass=com.x.Crc32\n" +
        "writer.pulsar.numPartitions=16\n")
    assert(cfg2.partitioner == PartitionerSpec.Crc32Key(16))

    // projection: headers become string properties; partition is the route
    val logDir = tempDir("graft-pl-logs")
    Files.writeString(logDir.resolve("p.log"), "data:a\n")
    val base = cfgFor("pl-proj", logDir, tempDir("graft-pl-o"), tempDir("graft-pl-c"))
    val df = LogPipeline.runBatch(spark, base)
      .withColumn("topic", org.apache.spark.sql.functions.lit("pt"))
    val out = LogPipeline.pulsarSinkProjection(df)
    assert(out.columns.toSeq == Seq("key", "value", "partition", "topic", "properties"))
    val r = out.collect().head
    assert(r.getAs[Map[String, String]]("properties")("az") == "test-az")
    assert(r.getAs[Int]("partition") >= 0 && r.getAs[Int]("partition") < 8)
  }

  test("PipelineConfig.fromProperties parses singer-style properties") {
    val props =
      """logName=app_log
        |logDir=/var/log/app
        |logStreamRegex=app\.log.*
        |reader.type=text
        |reader.text.filterMessageRegex=^INFO.*
        |reader.text.prependTimestamp=true
        |reader.text.prependHostname=true
        |transformer.regex=^(\w+) (.*)$
        |transformer.replacement=$2 [$1]
        |writer.type=kafka
        |writer.kafka.topic=app-topic
        |writer.kafka.bootstrap.servers=broker:9092
        |writer.kafka.numPartitions=64
        |writer.kafka.partitioner.class=com.example.Crc32Partitioner
        |processor.maxFilesPerTrigger=10
        |""".stripMargin
    val cfg = PipelineConfig.fromProperties(props)
    assert(cfg.name == "app_log")
    assert(cfg.logDir == "/var/log/app")
    cfg.reader match {
      case ReaderSpec.TextLine(filter, ts, host, _, _, _) =>
        assert(filter.contains("^INFO.*")); assert(ts); assert(host)
      case other => fail(s"wrong reader: $other")
    }
    assert(cfg.transforms.exists {
      case TransformSpec.RegexModifier(re, repl, _) => repl == "$2 [$1]" && re.nonEmpty
      case _ => false
    })
    cfg.writer match {
      case WriterSpec.Kafka(servers, topic, _, transactional, _) =>
        assert(servers == "broker:9092"); assert(topic == "app-topic")
        assert(!transactional)
      case other => fail(s"wrong writer: $other")
    }
    assert(cfg.partitioner == PartitionerSpec.Crc32Key(64))
    assert(cfg.maxFilesPerTrigger.contains(10))
  }
}
