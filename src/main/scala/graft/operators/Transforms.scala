package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.{PartitionerSpec, TransformSpec}
import graft.functions.Partitioners

/** Per-record pipeline transforms — the reference's processor/transform stage
  * (reference: SURVEY.md §2.2), each a `DataFrame => DataFrame` over a column.
  * All are narrow (no shuffle) and codegen'd: at 100 TB they run at scan
  * speed, fused into the same whole-stage-codegen span as the source read.
  */
object Transforms {

  /** Drop records whose `col` does not match `regex`
    * (reference: reader/TextLogFileReader.java:167-171 marks skip,
    * processor/DefaultLogStreamProcessor.java:312-324 drops). */
  def filterRegex(df: DataFrame, col: String, regex: String): DataFrame =
    df.filter(org.apache.spark.sql.functions.col(col).rlike(regex))

  /** Regex capture-group rewrite with pass-through on no-match — exact
    * semantics of the reference's RegexBasedModifier
    * (reference: transforms/RegexBasedModifier.java:60-107): only rows
    * matching `regex` are rewritten via the `$1`-style template; others pass
    * unchanged. Spark's `regexp_replace` uses the same `$n` group syntax. */
  def regexModify(c: Column, regex: String, replacement: String,
      appendNewline: Boolean = false): Column = {
    val rewritten = regexp_replace(c, regex, replacement)
    val out = when(c.rlike(regex), rewritten).otherwise(c)
    if (appendNewline) concat(out, lit("\n")) else out
  }

  /** Prepend timestamp and/or hostname with a delimiter
    * (reference: reader/TextLogFileReader.java:178-188). `ts` and `host` are
    * caller-supplied columns so batch replays stay deterministic. */
  def prepend(value: Column, delimiter: String, prefixes: Column*): Column =
    concat_ws(delimiter, prefixes :+ value: _*)

  /** Trim one trailing newline (reference: TextLogFileReader.java:201-203). */
  def trimTrailingNewline(c: Column): Column = regexp_replace(c, "\n$", "")

  /** Pack `n` consecutive messages into one LogMessage — the reference's
    * `numMessagesPerLogMessage` batching
    * (reference: reader/TextLogFileReader.java:161-189,
    * config.thrift numMessagesPerLogMessage). Consecutive = ascending
    * `posCol` within each `fileCol` group; members join with '\n' and the
    * result carries no trailing newline (reference trims it,
    * TextLogFileReader.java:201-203). If ANY member fails `filterRegex`
    * (full match, as the reference's Matcher.matches), the whole packed
    * message is dropped — the reference marks it with a skipMessage header
    * that processors discard, same delivered output.
    *
    * Scale: the only exchange is a hash shuffle on (file, bucket) carrying
    * each line once; per-group state is ≤ n lines. No per-file window sort.
    * Returns (fileCol, bucket, valueCol). */
  def packMessages(df: DataFrame, n: Int, valueCol: String = "value",
      fileCol: String = "path", posCol: String = "pos",
      filterRegex: Option[String] = None): DataFrame = {
    require(n >= 1, s"numMessagesPerLogMessage must be >= 1, got $n")
    val v = col(valueCol)
    val keep = filterRegex.map(re => v.rlike(s"^(?:$re)$$")).getOrElse(lit(true))
    df.groupBy(col(fileCol), floor(col(posCol) / n).as("bucket"))
      .agg(
        min(keep.cast("int")).as("_all_keep"),
        array_join(transform(array_sort(collect_list(struct(col(posCol).as("p"), v.as("v")))),
          s => s.getField("v")), "\n").as(valueCol))
      .filter(col("_all_keep") === 1)
      .drop("_all_keep")
  }

  /** Iterator twin of [[packMessages]] for the streaming reader path (a
    * narrow flatMap per file — aggregation-free, so legal in a streaming
    * plan; and zero-shuffle, unlike the DataFrame form). Both forms are
    * pinned to each other by a property spec. `memberPrefix` is applied per
    * member BEFORE packing (reference prepends ts/host per sub-message,
    * TextLogFileReader.java:178-188). */
  def packLines(lines: Iterator[String], n: Int,
      filterRegex: Option[String] = None,
      memberPrefix: String => String = identity): Iterator[String] = {
    require(n >= 1, s"numMessagesPerLogMessage must be >= 1, got $n")
    val p = filterRegex.map(java.util.regex.Pattern.compile)
    lines.grouped(n).flatMap { g =>
      if (p.exists(re => g.exists(m => !re.matcher(m).matches()))) Iterator.empty
      else Iterator(g.map(memberPrefix).mkString("\n"))
    }
  }

  /** Decider-based message sampling: pass iff `deciderValue > uniform(0,100)`
    * (reference: processor/MemoryEfficientLogStreamProcessor.java:114-120).
    * `keyCol=Some(k)` gives the deterministic variant (hash-mod-100 of the
    * key) — same pass-rate, reproducible, oracle-checkable. */
  def sampleDecider(df: DataFrame, percent: Int, keyCol: Option[Column] = None): DataFrame =
    keyCol match {
      case Some(k) => df.filter(pmod(k.cast("long"), lit(100L)) < percent)
      case None => df.filter(rand() * 100 < percent)
    }

  /** Compute crc32(value) where checksum is null; flag mismatches
    * (reference: writer/KafkaWriter.java:438-507). Adds `checksum` (filled)
    * and `checksumValid` columns. */
  def withChecksum(df: DataFrame, valueCol: String = "value",
      checksumCol: String = "checksum"): DataFrame = {
    val v = col(valueCol)
    val existing = if (df.columns.contains(checksumCol)) col(checksumCol) else lit(null).cast("long")
    df.withColumn(checksumCol, coalesce(existing, crc32(v)))
      .withColumn("checksumValid", col(checksumCol) === crc32(v))
  }

  /** Inject static headers (hostname / file / az / pod metadata)
    * (reference: reader/ThriftLogFileReader.java:110-120). */
  def withHeaders(df: DataFrame, headers: Map[String, String],
      headersCol: String = "headers"): DataFrame = {
    if (headers.isEmpty) df
    else {
      val kvs = headers.toSeq.sortBy(_._1).flatMap { case (k, v) =>
        Seq(lit(k), lit(v.getBytes("UTF-8")))
      }
      val newMap = map(kvs: _*)
      val merged = if (df.columns.contains(headersCol))
        map_concat(coalesce(col(headersCol), map().cast("map<string,binary>")), newMap)
      else newMap
      df.withColumn(headersCol, merged)
    }
  }

  /** Standard sink headers `_mid` (16-byte message id from two longs, e.g.
    * inode+offset) and `_ots` (8-byte original timestamp)
    * (reference: writer/kafka/CommittableKafkaWriter.java:223-236). */
  def midHeader(idHigh: Column, idLow: Column): Column =
    concat(unhex(lpad(hex(idHigh), 16, "0")), unhex(lpad(hex(idLow), 16, "0")))

  def otsHeader(tsNanos: Column): Column = unhex(lpad(hex(tsNanos), 16, "0"))

  /** Attach a `partition` column per the configured partitioner
    * (reference: SURVEY.md §2.3). Counter-based partitioners
    * (round-robin / fixed-subset) rely on `monotonically_increasing_id`,
    * which streaming plans reject — there they degrade to the uniform-random
    * equivalent, which preserves the partitioner's load-spreading intent
    * (the reference's counters are per-producer-instance anyway, so global
    * sequence was never guaranteed). */
  def withPartition(df: DataFrame, spec: PartitionerSpec,
      keyCol: String = "key"): DataFrame = {
    val k = col(keyCol)
    val p = spec match {
      case PartitionerSpec.Default => Partitioners.defaultPartition(32)
      case PartitionerSpec.Crc32Key(n) => Partitioners.crc32Partition(k, n)
      case PartitionerSpec.MurmurKey(n) => Partitioners.murmurPartition(k, n)
      case PartitionerSpec.Md5StringKey(n) => Partitioners.md5StringKeyPartition(k, n)
      case PartitionerSpec.RoundRobin(n) =>
        if (df.isStreaming) Partitioners.defaultPartition(n)
        else Partitioners.roundRobinPartition(n)
      case PartitionerSpec.SinglePartition(n, seed) => Partitioners.singlePartition(n, seed)
      case PartitionerSpec.FixedPartitions(ps) =>
        if (df.isStreaming) Partitioners.localityAwareRandom(ps)
        else Partitioners.fixedPartitions(ps)
    }
    df.withColumn("partition", p)
  }

  /** Schema-on-read payload decode: the engine keeps `value` as opaque
    * bytes end-to-end (reference data model, SURVEY §1.3); consumers apply
    * a schema at read time. Adds a struct column parsed from the JSON
    * payload; malformed rows yield null fields (PERMISSIVE), never failures
    * — the oversize/corrupt-tolerance stance of the reference readers. */
  def decodeJsonValue(df: DataFrame, schemaDDL: String, valueCol: String = "value",
      as: String = "decoded"): DataFrame =
    df.withColumn(as, from_json(col(valueCol).cast("string"),
      org.apache.spark.sql.types.StructType.fromDDL(schemaDDL)))

  /** Per-message audit identity headers — the reference's
    * `LoggingAuditHeaders(host, logName, pid, session, logSeqNumInSession,
    * timestamp)` (reference: singer-commons/src/main/thrift/
    * loggingaudit.thrift:28-66, writer/headersinjectors/
    * LoggingAuditHeadersInjector.java:1-22). The per-session sequence
    * number uses `monotonically_increasing_id` (unique, monotone per
    * partition — the distributed analog of the reference's per-process
    * counter; batch mode only). */
  def withAuditHeaders(df: DataFrame, logName: String, host: String,
      sessionId: Long, seqCol: Option[Column] = None): DataFrame = {
    val seq = seqCol.getOrElse(
      if (df.isStreaming) crc32(col("value")) // stable per-record stand-in
      else monotonically_increasing_id())
    df.withColumn("auditHeaders", struct(
      lit(host).as("host"),
      lit(logName).as("logName"),
      lit(sessionId).as("session"),
      seq.as("logSeqNum"),
      (unix_millis(current_timestamp())).as("timestampMs")))
  }

  /** Deterministic tracked-message decider — the reference marks a
    * samplingRate fraction of messages `tracked`, choosing each with
    * `ThreadLocalRandom < samplingRate`
    * (reference: writer/KafkaWriter.java:473-489, loggingaudit_config
    * .thrift:37-44). The engine's analog hashes the payload
    * (xxhash64 mod 100 < pct): same expected rate, but the choice is
    * reproducible across retries and executors — a tracked message stays
    * tracked through every stage, which is the property the reference's
    * multi-stage audit trail actually needs — and oracle-checkable. */
  def withTracked(df: DataFrame, samplingPct: Int,
      valueCol: String = "value"): DataFrame =
    df.withColumn("tracked",
      pmod(xxhash64(col(valueCol)), lit(100L)) < samplingPct)

  /** Per-message audit-EVENT side output: one row per TRACKED message,
    * carrying the audit identity headers, payload validity and the
    * stage/destination labels — the reference's `LoggingAuditClient.audit`
    * → `LoggingAuditEvent` → `AuditEventKafkaSender` path (reference:
    * singer-commons/.../loggingaudit/client/LoggingAuditClient.java:186-236,
    * AuditEventKafkaSender.java, loggingaudit.thrift LoggingAuditEvent).
    * Requires `tracked` ([[withTracked]]), `auditHeaders`
    * ([[withAuditHeaders]]) and `checksumValid` ([[withChecksum]]) — the
    * validity bit is the reference's invalidMessageMap discriminator
    * (writer/KafkaWriter.java:393-401). Narrow (filter + project): at scale
    * the side output costs samplingPct% of a scan, no shuffle. */
  def auditEvents(df: DataFrame, stage: String, kafkaCluster: String,
      topic: String): DataFrame =
    df.filter(col("tracked"))
      .select(
        col("auditHeaders.host").as("host"),
        col("auditHeaders.logName").as("log_name"),
        col("auditHeaders.session").as("session"),
        col("auditHeaders.logSeqNum").as("log_seq_num"),
        col("checksumValid").cast("long").as("message_valid"),
        lit(stage).as("stage"),
        lit(kafkaCluster).as("kafka_cluster"),
        lit(topic).as("topic"))

  /** Apply a configured transform chain. */
  def apply(df: DataFrame, specs: Seq[TransformSpec], valueCol: String = "value"): DataFrame =
    specs.foldLeft(df) {
      case (d, TransformSpec.RegexModifier(re, repl, nl)) =>
        d.withColumn(valueCol, regexModify(col(valueCol), re, repl, nl))
      case (d, TransformSpec.SampleDecider(pct)) => sampleDecider(d, pct)
    }
}
