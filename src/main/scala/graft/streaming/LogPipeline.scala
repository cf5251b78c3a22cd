package graft.streaming

import java.net.InetAddress

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model._
import graft.operators.Transforms
import graft.sources.LogSources

/** One `PipelineConfig` → one dataflow: source → per-record transforms →
  * partition assignment → sink (+ audit side-channel). The same logical plan
  * runs in two modes:
  *
  *  - **streaming** (`start`): `readStream` → `foreachBatch` sink with a
  *    checkpoint — the reference's standing pipeline with its watermark
  *    commit protocol (reference: SURVEY.md §3.2-3.3; checkpoint offsets/
  *    commits WAL ≙ WatermarkUtils tmp-file+rename). At-least-once: a batch
  *    is re-run from the checkpoint if the process dies mid-write.
  *  - **batch** (`runBatch`): `read` over the same directory — the
  *    reference's "replay this directory" use, identical operators.
  *
  * Audit parity (reference: writer/KafkaWriter.java:641-693): each epoch
  * writes `(batchId, numMessages)` to the audit directory, idempotently
  * keyed by batchId — re-executed epochs overwrite rather than double-count,
  * which is the at-least-once-safe upgrade over the reference's over-counting
  * audit (SURVEY.md §7.3.2).
  */
object LogPipeline {

  val hostname: String =
    try InetAddress.getLocalHost.getHostName catch { case _: Exception => "unknown" }

  /** The transform chain shared by both modes. Everything here is narrow and
    * codegen'd — no shuffle between source and sink. */
  def applyTransforms(df: DataFrame, cfg: PipelineConfig): DataFrame = {
    val valueCol = "value"
    // reader-level text options
    var out = df
    cfg.reader match {
      // packed readers fold filter/prepend/trim into the packing itself
      // (reference: TextLogFileReader.java:161-189); nothing to re-apply
      case tl: ReaderSpec.TextLine if tl.numMessagesPerLogMessage > 1 => ()
      case ReaderSpec.TextLine(filterRegex, prependTs, prependHost, delim, trim, _) =>
        filterRegex.foreach(re => out = Transforms.filterRegex(out, valueCol, re))
        if (trim) out = out.withColumn(valueCol, Transforms.trimTrailingNewline(col(valueCol)))
        val prefixes =
          (if (prependTs) Seq(unix_millis(current_timestamp())) else Nil) ++
          (if (prependHost) Seq(lit(hostname)) else Nil)
        if (prefixes.nonEmpty)
          out = out.withColumn(valueCol, Transforms.prepend(col(valueCol), delim, prefixes: _*))
      case _ => ()
    }
    out = Transforms(out, cfg.transforms, valueCol)
    // envelope: key/value binary + checksum + headers (LogRecord schema)
    if (!out.columns.contains("key")) out = out.withColumn("key", lit(null).cast("binary"))
    out = out.withColumn(valueCol, col(valueCol).cast("binary"))
    if (cfg.computeChecksum) out = Transforms.withChecksum(out, valueCol)
    out = Transforms.withHeaders(out, cfg.injectHeaders)
    Transforms.withPartition(out, cfg.partitioner)
  }

  def runBatch(spark: SparkSession, cfg: PipelineConfig): DataFrame =
    applyTransforms(
      LogSources.fromSpec(spark, cfg.logDir, cfg.reader, streaming = false,
        fileRegex = Some(cfg.logStreamRegex)), cfg)

  /** The exact projection handed to the Kafka sink. The Spark Kafka writer
    * contract takes key/value/topic/partition plus an optional `headers`
    * column (`array<struct<key:string,value:binary>>`) — the reference
    * attaches its `_mid`/`_ots` dedup headers to every produced record
    * (reference: writer/kafka/CommittableKafkaWriter.java:223-236), so the
    * headers built by [[Transforms.withHeaders]] MUST survive to the sink.
    * Our headers travel as `map<string,binary>`; Kafka wants the
    * array-of-struct encoding, converted here. */
  def kafkaSinkProjection(df: DataFrame): DataFrame = {
    val base = Seq("key", "value", "partition", "topic").map(col)
    if (df.columns.contains("headers"))
      df.select(base :+ transform(map_entries(col("headers")),
        e => struct(e.getField("key").as("key"), e.getField("value").as("value")))
        .as("headers"): _*)
    else df.select(base: _*)
  }

  /** The Pulsar message projection (reference:
    * writer/pulsar/PulsarWriter.java:190-210 builds key+value messages;
    * PulsarMessageRouter.java:40-51 routes by
    * `partitioner.partition(keyBytes, numPartitions)`). The `partition`
    * column IS the router output — [[Transforms.withPartition]] applies the
    * same partitioner family the router would. Headers travel as Pulsar
    * message properties (string→string). */
  def pulsarSinkProjection(df: DataFrame): DataFrame = {
    val base = Seq("key", "value", "partition", "topic").map(col)
    if (df.columns.contains("headers"))
      df.select(base :+ transform_values(col("headers"),
        (_, v) => v.cast("string")).as("properties"): _*)
    else df.select(base: _*)
  }

  /** Write one epoch's records to the configured sink, returning the record
    * count for the audit side-channel. The count comes from `observe()` —
    * ONE pass, collected as a side effect of the sink write itself. The
    * previous cache()+count() shape ran two jobs per epoch and pinned the
    * whole epoch in block-manager memory — an OOM/spill hazard once an epoch
    * is tens of GB per executor. */
  private[streaming] def writeBatch(df: DataFrame, cfg: PipelineConfig, batchId: Long = 0L): Long = {
    cfg.writer match {
      case WriterSpec.RolledObjects(baseDir, keyFormat, maxBytes) =>
        val sink = new RolledObjectSink(baseDir,
          KeyTemplate(keyFormat, cfg.name), maxBytes)
        sink.writeEpoch(df, batchId).map(_.records).sum
      case WriterSpec.Files(path, format) =>
        val obs = org.apache.spark.sql.Observation()
        // one overwritten directory per epoch: a retried epoch replaces its
        // own output instead of appending duplicates (at-least-once becomes
        // effectively exactly-once for this sink)
        df.observe(obs, count(lit(1)).as("n"))
          .write.mode("overwrite").format(format).save(s"$path/batch_id=$batchId")
        obs.get("n").asInstanceOf[Long]
      case WriterSpec.Kafka(servers, topic, _, false, _) =>
        val obs = org.apache.spark.sql.Observation()
        kafkaSinkProjection(df.observe(obs, count(lit(1)).as("n")))
          .write.format("kafka")
          .option("kafka.bootstrap.servers", servers)
          .option("topic", topic)
          .option("includeHeaders", "true")
          .save()
        obs.get("n").asInstanceOf[Long]
      case WriterSpec.Kafka(servers, topic, _, true, timeoutS) =>
        // transactional epoch path: each sink TASK runs the reference's
        // committable protocol against its own producer (a Kafka transaction
        // is per-producer, so per-task atomicity is the distributed analog —
        // aborted attempts are invisible to read-committed consumers, and a
        // retried task re-sends under a fresh transaction; `_mid` headers
        // keep downstream dedup exact). Producers come from the injectable
        // EpochProducers seam — no kafka-clients jar ships in this build.
        val obs = org.apache.spark.sql.Observation()
        val projected = kafkaSinkProjection(df.observe(obs, count(lit(1)).as("n")))
          .withColumn("partition", col("partition").cast("int"))
        val hasHeaders = projected.columns.contains("headers")
        projected.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          val producer = EpochProducers.factory(servers)
          try {
            new TransactionalEpochWriter(producer, topic,
                transactional = true, writeTimeoutSeconds = timeoutS)
              .writeEpoch(rows.map { r =>
                val hs: Seq[(String, Array[Byte])] =
                  if (hasHeaders && !r.isNullAt(r.fieldIndex("headers")))
                    r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("headers"))
                      .map(h => (h.getString(0), h.getAs[Array[Byte]](1)))
                  else Nil
                EpochRecord(r.getInt(r.fieldIndex("partition")),
                  r.getAs[Array[Byte]]("key"), r.getAs[Array[Byte]]("value"), hs)
              })
            ()
          } finally producer.close()
        }
        obs.get("n").asInstanceOf[Long]
      case WriterSpec.Pulsar(serviceUrl, topic, _, timeoutS) =>
        // per-task Pulsar batch protocol (sendAsync → flush → await-all;
        // reference: PulsarWriter.java:190-210) against the injectable
        // PulsarProducers seam — the default factory throws the
        // no-client-jar error, so an un-injected run fails with the same
        // clear message as before
        val obs = org.apache.spark.sql.Observation()
        val projected = pulsarSinkProjection(df.observe(obs, count(lit(1)).as("n")))
          .withColumn("partition", col("partition").cast("int"))
        val hasProps = projected.columns.contains("properties")
        projected.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          val producer = PulsarProducers.factory(serviceUrl)
          try {
            new PulsarEpochWriter(producer, topic, writeTimeoutSeconds = timeoutS)
              .writeEpoch(rows.map { r =>
                val props: Map[String, String] =
                  if (hasProps && !r.isNullAt(r.fieldIndex("properties")))
                    r.getMap[String, String](r.fieldIndex("properties")).toMap
                  else Map.empty
                PulsarRecord(r.getInt(r.fieldIndex("partition")),
                  r.getAs[Array[Byte]]("key"), r.getAs[Array[Byte]]("value"), props)
              })
            ()
          } finally producer.close()
        }
        obs.get("n").asInstanceOf[Long]
      case WriterSpec.Noop =>
        df.count()
    }
  }

  /** Start the standing streaming pipeline. */
  def start(spark: SparkSession, cfg: PipelineConfig,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      audit: Option[AuditWriter] = None): StreamingQuery = {
    val src = LogSources.fromSpec(spark, cfg.logDir, cfg.reader, streaming = true,
      cfg.maxFilesPerTrigger, cfg.tailMode, fileRegex = Some(cfg.logStreamRegex),
      retentionSeconds = cfg.logRetentionSeconds)
    val transformed = applyTransforms(src, cfg)
    val checkpoint = cfg.checkpointDir.getOrElse(
      s"/tmp/graft-checkpoints/${cfg.name}")
    StateStores.withProvider(spark, cfg.stateStoreProvider) {
      transformed.writeStream
        .queryName(cfg.name)
        .option("checkpointLocation", checkpoint)
        .trigger(trigger)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val n = writeBatch(
            if (batch.columns.contains("topic")) batch
            else batch.withColumn("topic", lit(cfg.name)), cfg, batchId)
          audit.foreach(_.record(cfg.name, batchId, n))
          ()
        }
        .start()
    }
  }


  /** Per-cycle observability record of [[runAdaptiveCycles]]: the interval
    * chosen AFTER each cycle and the batch cap each cycle RAN with. */
  case class AdaptiveRun(intervals: Seq[Long], batchSizes: Seq[Option[Int]])

  /** Batch cap a failed UNBOUNDED cycle falls to before halving — a failing
    * cycle must not stay unbounded or the retry just fails the same way. */
  val FailureFallbackBatchFiles = 1024

  /** Adaptive polling loop — the reference's exponential poll backoff
    * (min→max ×2 on an empty cycle, reset on data; reference:
    * processor/DefaultLogStreamProcessor.java:387-402) plus its batch-size
    * adaptation (reference: DefaultLogStreamProcessor.java:356-364): a
    * FAILED cycle halves the file cap (floor 1) so the retry bites off less;
    * any successful cycle restores the configured cap. Each cycle runs the
    * pipeline with `Trigger.AvailableNow` (drain everything, then stop —
    * checkpoint-resumed next cycle) and sleeps the adapted interval; a
    * failed cycle also backs the interval off (the reference treats -1
    * processed like 0). `startCycle` is injectable so failure paths are
    * testable without poisoning a real sink. */
  def runAdaptiveCycles(spark: SparkSession, cfg: PipelineConfig,
      minIntervalMs: Long, maxIntervalMs: Long, cycles: Int,
      audit: Option[AuditWriter] = None,
      sleep: Long => Unit = Thread.sleep,
      startCycle: (SparkSession, PipelineConfig, Option[AuditWriter]) => StreamingQuery =
        (s, c, a) => start(s, c, Trigger.AvailableNow(), a)): AdaptiveRun = {
    var interval = minIntervalMs
    val configured = cfg.maxFilesPerTrigger
    var batch = configured
    val intervals = Seq.newBuilder[Long]
    val batches = Seq.newBuilder[Option[Int]]
    for (_ <- 1 to cycles) {
      batches += batch
      val rows: Long =
        try {
          val q = startCycle(spark, cfg.copy(maxFilesPerTrigger = batch), audit)
          q.awaitTermination()
          Option(q.lastProgress).map(_.numInputRows).getOrElse(0L)
        } catch { case _: Exception => -1L }
      batch =
        if (rows < 0) Some(math.max(1, batch.getOrElse(FailureFallbackBatchFiles) / 2))
        else configured
      interval = if (rows <= 0) math.min(interval * 2, maxIntervalMs) else minIntervalMs
      intervals += interval
      sleep(interval)
    }
    AdaptiveRun(intervals.result(), batches.result())
  }
}

/** Idempotent per-epoch audit sink: one small parquet file per batchId,
  * overwritten on epoch retry — Σ num_messages over distinct batchIds equals
  * messages delivered (the e2e oracle of the reference's test strategy,
  * reference: e2e/SingerEndToEndTest.java:26-121). */
class AuditWriter(spark: SparkSession, auditDir: String) extends Serializable {
  def record(pipeline: String, batchId: Long, numMessages: Long): Unit = {
    import spark.implicits._
    // keyed by (pipeline, batchId) via the directory layout: epoch retries
    // overwrite their own record, concurrent pipelines never share a
    // directory, and both come back as partition columns on read
    Seq((numMessages, System.currentTimeMillis(), LogPipeline.hostname))
      .toDF("num_messages", "timestamp_ms", "hostname")
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(s"$auditDir/pipeline=$pipeline/batch_id=$batchId")
  }

  /** Total delivered message count per pipeline (audit oracle). */
  def totals(): DataFrame =
    spark.read.parquet(auditDir)
      .groupBy("pipeline")
      .agg(sum("num_messages").as("total_messages"),
        count(lit(1)).as("num_batches"))
}
