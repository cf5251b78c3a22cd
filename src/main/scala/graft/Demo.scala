package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.model.PipelineConfig
import graft.streaming.{AuditWriter, BufferingHeartbeat, HeartbeatListener, LogPipeline, PipelineManager}

/** End-to-end smoke demo of the public API: parse a singer-style properties
  * config, run the pipeline in batch-replay mode, then as a standing
  * streaming query with audit + heartbeat side-channels, with a restart in
  * between. Prints DEMO lines a reviewer can eyeball.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val logDir = Files.createTempDirectory("demo-logs")
    val outDir = Files.createTempDirectory("demo-out")
    val auditDir = Files.createTempDirectory("demo-audit")
    val cpDir = Files.createTempDirectory("demo-cp")

    val cfg = PipelineConfig.fromProperties(
      s"""logName=demo_pipeline
         |logDir=$logDir
         |reader.type=text
         |reader.text.filterMessageRegex=^data.*
         |# properties-file escaping: \\\\w reaches the engine as \\w
         |transformer.regex=^data:(\\\\w+)
         |transformer.replacement=payload=$$1
         |writer.type=file
         |writer.file.path=$outDir
         |writer.kafka.partitioner.class=Crc32Partitioner
         |writer.kafka.numPartitions=8
         |checkpointDir=$cpDir
         |""".stripMargin)
    println(s"DEMO config parsed: ${cfg.name}, partitioner=${cfg.partitioner}")

    Files.writeString(logDir.resolve("app.log"), "data:one\nnoise\ndata:two\n")
    val batch = LogPipeline.runBatch(spark, cfg)
    println(s"DEMO batch replay rows=${batch.count()} (expect 2; noise filtered)")
    val values = batch.collect().map(r => new String(r.getAs[Array[Byte]]("value"))).toList
    println(s"DEMO transformed values=$values (expect payload=one, payload=two)")
    batch.show(5, false)

    val heartbeats = new BufferingHeartbeat
    val listener = new HeartbeatListener(heartbeats)
    spark.streams.addListener(listener)
    val audit = new AuditWriter(spark, auditDir.toString)
    val mgr = new PipelineManager(spark, audit = Some(audit))

    val q = mgr.start(cfg, Trigger.ProcessingTime("200 milliseconds"))
    q.processAllAvailable()
    println(s"DEMO stream epoch-1 sink rows=${spark.read.parquet(outDir.toString).count()}")

    Files.writeString(logDir.resolve("app2.log"), "data:three\ndata:four\ndata:five\n")
    q.processAllAvailable()
    println(s"DEMO stream epoch-2 sink rows=${spark.read.parquet(outDir.toString).count()} (expect 5)")
    mgr.drain(cfg.name)

    // restart from checkpoint — previously committed files must not replay
    Files.writeString(logDir.resolve("app3.log"), "data:six\n")
    val q2 = LogPipeline.start(spark, cfg, Trigger.ProcessingTime("200 milliseconds"), Some(audit))
    q2.processAllAvailable()
    q2.stop()
    println(s"DEMO after restart sink rows=${spark.read.parquet(outDir.toString).count()} (expect 6, no dupes)")
    audit.totals().show(false)
    println(s"DEMO heartbeats=${heartbeats.messages.count(_.contains("progress"))} progress events")

    // rolled-object sink with S3-style key templating (file:// here, s3a:// in prod)
    val objDir = Files.createTempDirectory("demo-objects")
    val objCfg = cfg.copy(name = "demo_objects",
      writer = graft.model.WriterSpec.RolledObjects(
        s"file://$objDir", "{{LOGNAME}}/{{y}}/{{M}}/{{UUID}}.log", maxObjectBytes = 1 << 20),
      checkpointDir = Some(Files.createTempDirectory("demo-obj-cp").toString))
    val q3 = LogPipeline.start(spark, objCfg, Trigger.ProcessingTime("200 milliseconds"))
    q3.processAllAvailable()
    q3.stop()
    val objects = java.nio.file.Files.walk(objDir)
      .filter(_.toString.endsWith(".log")).toArray.map(_.toString)
    println(s"DEMO rolled objects: ${objects.length} under templated keys, e.g. ${objects.headOption.map(_.stripPrefix(objDir.toString)).getOrElse("none")}")

    // graft-tail source: ingest APPENDS to a growing file (intra-file offsets)
    {
      val tailDir = Files.createTempDirectory("demo-tail")
      val f = tailDir.resolve("grow.log")
      Files.writeString(f, "first\n")
      val tq = spark.readStream.format("graft-tail")
        .option("path", tailDir.toString).option("format", "text").load()
        .writeStream.format("memory").queryName("demo_tail")
        .option("checkpointLocation", Files.createTempDirectory("demo-tail-cp").toString)
        .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
      tq.processAllAvailable()
      val n1 = spark.table("demo_tail").count()
      Files.writeString(f, "appended\n", java.nio.file.StandardOpenOption.APPEND)
      tq.processAllAvailable()
      val n2 = spark.table("demo_tail").count()
      tq.stop()
      println(s"DEMO graft-tail: $n1 row before append, $n2 after (built-in file source would stay at $n1)")
    }

    // stateful event-time sessionization over a live stream
    {
      import graft.streaming.EventAnalytics
      import graft.streaming.EventAnalytics.Ev
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[Ev]
      val sq2 = EventAnalytics.sessionize(in.toDS(), gapMs = 5 * 60 * 1000, watermark = "1 minute")
        .writeStream.outputMode("append").format("memory").queryName("demo_sessions")
        .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      in.addData(Ev(1, ts(0), "click", 1.0), Ev(1, ts(2), "view", 2.0), Ev(1, ts(10), "click", 5.0))
      sq2.processAllAvailable()
      in.addData(Ev(2, ts(45), "click", 0.0)) // advance watermark, close sessions
      sq2.processAllAvailable()
      sq2.stop()
      println(s"DEMO sessions emitted:")
      spark.table("demo_sessions").orderBy("user_id", "session_start").show(false)
    }
    // the STANDING curation pipeline: continuous ingest → quality →
    // incremental dedup against at-rest state → decontamination → shard
    {
      import graft.streaming.StreamingCuration
      import org.apache.spark.sql.functions.col
      import spark.implicits._
      val inDir = Files.createTempDirectory("demo-cur-in")
      val stateDir = Files.createTempDirectory("demo-cur-state").toString
      val cpDir = Files.createTempDirectory("demo-cur-cp").toString
      def write(name: String, docs: Seq[(Long, String)]): Unit =
        Files.writeString(inDir.resolve(name),
          docs.map { case (i, t) => s"""{"doc_id":$i,"text":"$t"}""" }
            .mkString("", "\n", "\n"))
      write("b1.json", Seq(
        (1L, "the quick brown fox jumps over the lazy dog near the river today"),
        (2L, "x!")))
      val probes = Seq((100L, "the held out benchmark probe sentence"))
        .toDF("doc_id", "text")
      val cq = StreamingCuration.run(
        spark.readStream.schema("doc_id long, text string")
          .option("maxFilesPerTrigger", 1).json(inDir.toString),
        probes, stateDir, cpDir)
      cq.processAllAvailable()
      // a later epoch: one exact dup of doc 1, one fresh doc
      write("b2.json", Seq(
        (3L, "the quick brown fox jumps over the lazy dog near the river today"),
        (4L, "a completely fresh document about the mountain weather patterns")))
      cq.processAllAvailable()
      cq.stop()
      println("DEMO standing curation verdicts (doc 3 exact-dups doc 1 across epochs):")
      StreamingCuration.verdicts(spark, stateDir).orderBy(col("doc_id")).show(false)
    }
    // exact-substring span family: detect maximal verbatim overlap, then
    // cut it keeping the earliest copy (Lee et al. 2021 semantics)
    {
      import graft.operators.Dedup
      import spark.implicits._
      val boiler = "terms of service apply to all content on this site always"
      val docs = Seq(
        (1L, s"first article body $boiler and some original reporting here"),
        (2L, s"second unrelated piece $boiler with different conclusions drawn"),
        (3L, "a document with no shared passages at all in its body text")
      ).toDF("doc_id", "text")
      println("DEMO shared verbatim spans (>= 10 tokens):")
      Dedup.sharedSpans(docs, minSpan = 10, anchor = 4)
        .orderBy("doc_a", "doc_b").show(false)
      println("DEMO span removal (doc 2 loses the boilerplate, doc 1 keeps it):")
      Dedup.removeSharedSpans(docs, minSpan = 10, anchor = 4)
        .orderBy("doc_id").show(false)
    }

    // per-pipeline RocksDB state store: the same sessionizer under the
    // off-heap provider (the 100-TB key-domain configuration)
    {
      import graft.streaming.{EventAnalytics, StateStores}
      import graft.streaming.EventAnalytics.Ev
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[Ev]
      val q3 = StateStores.withProvider(spark, Some("rocksdb")) {
        EventAnalytics.sessionize(in.toDS(), gapMs = 60000, watermark = "1 minute")
          .writeStream.outputMode("append").format("memory")
          .queryName("demo_rocks").trigger(Trigger.ProcessingTime("200 milliseconds"))
          .start()
      }
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 11:$min%02d:00")
      in.addData(Ev(1, ts(0), "click", 1.0), Ev(9, ts(30), "click", 0.0))
      q3.processAllAvailable()
      val engaged = Option(q3.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq)
        .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
        .exists(_.toLowerCase.contains("rocksdb"))
      q3.stop()
      println(s"DEMO sessionizer ran under RocksDB state store: engaged=$engaged")
    }

    // line-granularity dedup (CCNet paragraph step), token-budget
    // selection, and head/middle/tail perplexity bucketing — the
    // curation steps between whole-document and span-level dedup
    {
      import graft.operators.{LineDedup, Lm, Sampling}
      import org.apache.spark.sql.functions.{col, size, split, trim}
      import spark.implicits._
      val docs = Seq(
        (1L, "en", "breaking news headline\nunique first story body"),
        (2L, "en", "breaking news headline\nanother distinct article"),
        (3L, "en", "subscribe to our newsletter\nbreaking news headline"),
        (4L, "en", "a wholly original document with no repeated lines")
      ).toDF("doc_id", "lang", "text")
      println("DEMO line dedup (docs 2 and 3 lose the repeated header):")
      LineDedup.dedupLines(docs).orderBy("doc_id").show(false)
      println("DEMO token-budget selection (best distinct-token ratio first, 14-token budget):")
      val tk = split(trim(col("text")), "\\s+")
      Sampling.selectUnderTokenBudget(docs, budget = 14L,
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.array_distinct(tk)).cast("double") /
          size(tk).cast("double"), size(tk).cast("long"))
        .orderBy("doc_id").show(false)
      println("DEMO CCNet head/middle/tail by LM perplexity:")
      val lm = Lm.unigramLm(docs, vocabSize = 8)
      Lm.perplexityBuckets(docs, lm).orderBy("doc_id").show(false)
    }

    spark.streams.removeListener(listener)
    spark.stop()
  }
}
