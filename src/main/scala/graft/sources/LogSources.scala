package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.ReaderSpec

/** Source readers: directory of log files → envelope DataFrame, in both batch
  * (replay) and streaming (tail) modes from ONE definition — the reference's
  * reader layer re-expressed on Spark's file source
  * (reference: SURVEY.md §2.1).
  *
  * Rotation-aware convention (SURVEY.md §7.3 option b): files are ingested
  * once closed/rotated; the streaming file source tracks seen files in the
  * checkpoint, replacing the reference's inode+offset watermark
  * (reference: utils/WatermarkUtils.java:47-105). Intra-file tailing is
  * traded for idiomatic, exactly-tracked file-granularity progress.
  *
  * Scale: file listing is driver-side but O(new files/trigger) with
  * `maxFileAge`/`cleanSource`; decode runs distributed, one task per file
  * group, and all downstream transforms are narrow.
  */
object LogSources {

  private lazy val hostname: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: Exception => "unknown" }

  /** Full-match file-NAME gate for `logStreamRegex` — only files whose name
    * matches belong to the stream (reference:
    * monitor/LogStreamManager.java:384-477 uses Matcher.matches on the file
    * name). Anchored so `rlike`'s find() behaves like matches(). */
  private def nameMatch(pathCol: org.apache.spark.sql.Column, re: String) =
    element_at(split(pathCol, "/"), -1).rlike(s"^(?:$re)$$")

  private def filterName(df: DataFrame, fileRegex: Option[String]): DataFrame =
    fileRegex.filterNot(_ == ".*").map(re => df.filter(nameMatch(col("path"), re)))
      .getOrElse(df)

  /** Decoded thrift record row — the `LogMessageAndPosition` DTO
    * (reference: singer-commons/src/main/thrift/singer.thrift:29-39). */
  case class ThriftLogRow(
      path: String,
      key: Array[Byte],
      value: Array[Byte],
      timestampNanos: Option[Long],
      checksum: Option[Long],
      nextByteOffset: Long)

  /** One text record (single- or multi-line) with its source file. */
  case class TextLogRow(path: String, value: String)

  // ------------------------------------------------------------ text: lines

  /** Batch: one record per line. */
  def textLines(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.textFile(s"$dir/$glob").toDF("value")
      .withColumn("path", input_file_name())

  /** Streaming twin of [[textLines]]. */
  def textLinesStream(spark: SparkSession, dir: String, glob: String = "*",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.text(s"$dir/$glob").withColumn("path", input_file_name())
  }

  // -------------------------------------------------------- text: multiline

  /** Split one file's content into records that START at `messageStartRegex`
    * matches and run to the next match or EOF
    * (reference: reader/TextMessageReader.java:88-138). Content before the
    * first start-line is dropped (no record boundary); records longer than
    * `maxMessageChars` are truncated, not fatal
    * (reference: TextMessageReader.java:107-115). */
  def splitMultiline(content: String, startRegex: String,
      maxMessageChars: Int): Iterator[String] = {
    val m = java.util.regex.Pattern.compile(startRegex, java.util.regex.Pattern.MULTILINE)
      .matcher(content)
    val starts = Iterator.continually(if (m.find()) m.start() else -1)
      .takeWhile(_ >= 0).toArray
    starts.iterator.zipWithIndex.map { case (s, i) =>
      val end = if (i + 1 < starts.length) starts(i + 1) else content.length
      val rec = content.substring(s, math.min(end, s + maxMessageChars))
      rec.stripSuffix("\n")
    }
  }

  /** Batch: multi-line records assembled per file. `wholetext` keeps each
    * file in one row — correct for rotation-bounded log files (the reference
    * caps file size the same way via rotation). */
  def textMultiline(spark: SparkSession, dir: String, startRegex: String,
      maxMessageChars: Int = 1 << 20, glob: String = "*",
      fileRegex: Option[String] = None): DataFrame = {
    import spark.implicits._
    val files = filterName(
      spark.read.option("wholetext", "true").textFile(s"$dir/$glob")
        .withColumn("path", input_file_name()), fileRegex)
      .as[(String, String)]
    files.flatMap { case (content, path) =>
      splitMultiline(content, startRegex, maxMessageChars).map(TextLogRow(path, _))
    }.toDF()
  }

  /** Streaming twin of [[textMultiline]]. Multi-line assembly is safe in
    * streaming precisely because of the rotation convention: a file is only
    * listed once it exists, and each file is processed exactly once, so
    * records never straddle a trigger boundary. */
  def textMultilineStream(spark: SparkSession, dir: String, startRegex: String,
      maxMessageChars: Int = 1 << 20, glob: String = "*",
      maxFilesPerTrigger: Option[Int] = None,
      fileRegex: Option[String] = None): DataFrame = {
    import spark.implicits._
    val r = spark.readStream.option("wholetext", "true")
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    val files = filterName(r.text(s"$dir/$glob")
      .withColumn("path", input_file_name()), fileRegex)
      .as[(String, String)]
    files.flatMap { case (content, path) =>
      splitMultiline(content, startRegex, maxMessageChars).map(TextLogRow(path, _))
    }.toDF()
  }

  /** Packed text lines: `n` consecutive lines per message, assembled per
    * file (wholetext keeps order exact, the flatMap is narrow and
    * streaming-safe). Reader-level filter/prepend fold INTO the packing
    * (reference: TextLogFileReader.java:161-189 — filter marks the whole
    * pack skipped, ts/host prepends per member). */
  def textLinesPacked(spark: SparkSession, dir: String, spec: graft.model.ReaderSpec.TextLine,
      hostname: String, glob: String = "*", streaming: Boolean = false,
      maxFilesPerTrigger: Option[Int] = None,
      fileRegex: Option[String] = None): DataFrame = {
    import spark.implicits._
    val files =
      if (streaming) {
        val r = spark.readStream.option("wholetext", "true")
        maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
        filterName(r.text(s"$dir/$glob").withColumn("path", input_file_name()), fileRegex)
      } else
        filterName(spark.read.option("wholetext", "true").textFile(s"$dir/$glob").toDF("value")
          .withColumn("path", input_file_name()), fileRegex)
    val n = spec.numMessagesPerLogMessage
    val filter = spec.filterRegex
    val (prependTs, prependHost, delim) =
      (spec.prependTimestamp, spec.prependHostname, spec.prependDelimiter)
    files.as[(String, String)].flatMap { case (content, path) =>
      val lines = content.split("\n", -1)
      val trimmed = if (lines.nonEmpty && lines.last.isEmpty) lines.dropRight(1) else lines
      val prefix: String => String = m => {
        val sb = new StringBuilder
        if (prependTs) { sb.append(System.currentTimeMillis()); sb.append(delim) }
        if (prependHost) { sb.append(hostname); sb.append(delim) }
        sb.append(m); sb.toString
      }
      graft.operators.Transforms.packLines(trimmed.iterator, n, filter, prefix)
        .map(TextLogRow(path, _))
    }.toDF()
  }

  // ------------------------------------------------------------------ thrift

  private def decodeThriftFiles(df: DataFrame, maxMessageBytes: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        ThriftLogCodec.decodeFrames(bytes, 0L, maxMessageBytes).map { d =>
          ThriftLogRow(path, d.key, d.message,
            Option(d.timestampNanos).map(_.longValue),
            Option(d.checksum).map(_.longValue),
            d.nextByteOffset)
        }
      }.toDF()
  }

  /** Batch: framed-thrift LogMessage files
    * (reference: reader/ThriftLogFileReader.java). */
  def thriftFramed(spark: SparkSession, dir: String,
      maxMessageBytes: Int = 1 << 20, glob: String = "*",
      fileRegex: Option[String] = None): DataFrame =
    decodeThriftFiles(filterName(
      spark.read.format("binaryFile").load(s"$dir/$glob"), fileRegex), maxMessageBytes)

  /** Streaming twin of [[thriftFramed]]. The binaryFile source requires its
    * schema stated explicitly in streaming mode. */
  def thriftFramedStream(spark: SparkSession, dir: String,
      maxMessageBytes: Int = 1 << 20, glob: String = "*",
      maxFilesPerTrigger: Option[Int] = None,
      fileRegex: Option[String] = None): DataFrame = {
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    val r = spark.readStream.format("binaryFile").schema(binaryFileSchema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    decodeThriftFiles(filterName(r.load(s"$dir/$glob"), fileRegex), maxMessageBytes)
  }

  /** Source per config spec, batch or streaming. `tailMode` streams with
    * the `graft-tail` DSv2 source (growing files, intra-file offsets);
    * multiline tail emits a record once its successor starts (the
    * reference's partial-record buffering semantics). */
  def fromSpec(spark: SparkSession, dir: String, spec: ReaderSpec, streaming: Boolean,
      maxFilesPerTrigger: Option[Int] = None, tailMode: Boolean = false,
      fileRegex: Option[String] = None,
      retentionSeconds: Option[Long] = None): DataFrame = {
    val fre = fileRegex.filterNot(_ == ".*")
    def tail(fmt: String) = {
      val r = spark.readStream.format("graft-tail")
        .option("path", dir).option("format", fmt)
      fre.foreach(re => r.option("fileRegex", re))
      retentionSeconds.foreach(s => r.option("retentionSeconds", s.toString))
      r
    }
    spec match {
      case tl: ReaderSpec.TextLine if streaming && tailMode =>
        require(tl.numMessagesPerLogMessage == 1,
          "numMessagesPerLogMessage > 1 is not supported in tail mode " +
            "(packing needs whole-file assembly; tail emits partial windows)")
        tail("text").load()
          .select(col("value").cast("string").as("value"), col("path"))
      case ReaderSpec.TextMultiline(re, maxChars) if streaming && tailMode =>
        tail("multiline").option("messageStartRegex", re)
          .option("maxMessageChars", maxChars.toString).load()
          .select(col("value").cast("string").as("value"), col("path"))
      case ReaderSpec.ThriftFramed(_) if streaming && tailMode =>
        tail("thrift").load()
          .select(col("path"), col("key"), col("value"), col("timestampNanos"),
            col("checksum"), col("byteOffset").as("nextByteOffset"))
      case tl: ReaderSpec.TextLine if tl.numMessagesPerLogMessage > 1 =>
        textLinesPacked(spark, dir, tl, hostname, streaming = streaming,
          maxFilesPerTrigger = maxFilesPerTrigger, fileRegex = fre)
      case _: ReaderSpec.TextLine =>
        filterName(
          if (streaming) textLinesStream(spark, dir, maxFilesPerTrigger = maxFilesPerTrigger)
          else textLines(spark, dir), fre)
      case ReaderSpec.TextMultiline(re, maxChars) =>
        if (streaming) textMultilineStream(spark, dir, re, maxChars,
          maxFilesPerTrigger = maxFilesPerTrigger, fileRegex = fre)
        else textMultiline(spark, dir, re, maxChars, fileRegex = fre)
      case ReaderSpec.ThriftFramed(maxBytes) =>
        if (streaming) thriftFramedStream(spark, dir, maxBytes,
          maxFilesPerTrigger = maxFilesPerTrigger, fileRegex = fre)
        else thriftFramed(spark, dir, maxBytes, fileRegex = fre)
    }
  }
}
