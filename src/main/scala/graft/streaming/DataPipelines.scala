package graft.streaming

import java.io.StringReader
import java.util.Properties
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** conf.d-launchable standing DATA pipelines — the training-data twins of
  * the log pipelines [[graft.GraftMain]] manages. A `.properties` file
  * whose `pipeline.type` is `curation`, `ivf`, `bm25` or `packed` starts
  * one of these instead of a log pipeline (files without the key stay log
  * pipelines, so existing conf directories are untouched):
  *
  * {{{
  * pipeline.type=curation
  * inputDir=/data/docs-incoming          # JSONL: {"doc_id":N,"text":"..."}
  * probesPath=/data/probes.parquet       # decontamination probes (text col)
  * stateDir=/data/curation-state
  * checkpointDir=/data/curation-cp
  * curation.minQuality=0.9
  * curation.threshold=0.3
  * curation.probeNgram=4
  * curation.nShards=16
  *
  * pipeline.type=ivf
  * inputDir=/data/embeddings-incoming    # JSONL: {"vec_id":N,"embedding":[...]}
  * indexPath=/data/ivf-index             # init'd centroids/ (or centroidsPath=...)
  * checkpointDir=/data/ivf-cp
  *
  * pipeline.type=bm25
  * inputDir=/data/docs-incoming          # JSONL: {"doc_id":N,"text":"..."}
  * indexPath=/data/bm25-index
  * checkpointDir=/data/bm25-cp
  * bm25.nBuckets=64                      # first launch fixes the layout;
  *                                       # later launches resolve the
  *                                       # store's persisted count
  *
  * pipeline.type=packed
  * inputDir=/data/tokens-incoming        # JSONL: {"doc_id":N,"token_ids":[...]}
  * packedDir=/data/packed-corpus
  * checkpointDir=/data/packed-cp
  * }}}
  *
  * All run under the same manager/monitor loop as log pipelines (stuck
  * detection, drain, stopAll); their state-maintenance counterparts
  * ([[StreamingCuration.compactState]], [[StreamingIvf.compact]],
  * [[StreamingBm25.compact]], [[graft.sources.PackedCorpus.compact]])
  * are stopped-pipeline operations and stay manual by design — enforced
  * structurally by [[MaintenanceLease]].
  */
object DataPipelines {

  sealed trait Spec { def name: String; def checkpointDir: String }

  final case class Curation(name: String, inputDir: String, probesPath: String,
      stateDir: String, checkpointDir: String, minQuality: Double = 0.9,
      threshold: Double = 0.3, probeNgram: Int = 4, nShards: Int = 16,
      maxFilesPerTrigger: Option[Int] = None) extends Spec

  final case class Ivf(name: String, inputDir: String, indexPath: String,
      checkpointDir: String, centroidsPath: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None) extends Spec

  final case class Bm25(name: String, inputDir: String, indexPath: String,
      checkpointDir: String, nBuckets: Int = 64,
      maxFilesPerTrigger: Option[Int] = None) extends Spec

  final case class Packed(name: String, inputDir: String, packedDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None) extends Spec

  /** Parse a data-pipeline spec; None when `pipeline.type` is absent or
    * `log` (the file belongs to the log-pipeline parser). */
  def fromProperties(text: String, name: String = "pipeline"): Option[Spec] = {
    val p = new Properties()
    p.load(new StringReader(text))
    val m = p.asScala.toMap
    def opt(k: String): Option[String] = m.get(k).map(_.trim).filter(_.nonEmpty)
    def req(k: String): String = opt(k).getOrElse(
      throw new IllegalArgumentException(s"$name: data pipeline needs '$k'"))
    opt("pipeline.type").map(_.toLowerCase) match {
      case Some("curation") => Some(Curation(
        name = opt("logName").getOrElse(name),
        inputDir = req("inputDir"),
        probesPath = req("probesPath"),
        stateDir = req("stateDir"),
        checkpointDir = req("checkpointDir"),
        minQuality = opt("curation.minQuality").map(_.toDouble).getOrElse(0.9),
        threshold = opt("curation.threshold").map(_.toDouble).getOrElse(0.3),
        probeNgram = opt("curation.probeNgram").map(_.toInt).getOrElse(4),
        nShards = opt("curation.nShards").map(_.toInt).getOrElse(16),
        maxFilesPerTrigger = opt("processor.maxFilesPerTrigger").map(_.toInt)))
      case Some("ivf") => Some(Ivf(
        name = opt("logName").getOrElse(name),
        inputDir = req("inputDir"),
        indexPath = req("indexPath"),
        checkpointDir = req("checkpointDir"),
        centroidsPath = opt("centroidsPath"),
        maxFilesPerTrigger = opt("processor.maxFilesPerTrigger").map(_.toInt)))
      case Some("bm25") => Some(Bm25(
        name = opt("logName").getOrElse(name),
        inputDir = req("inputDir"),
        indexPath = req("indexPath"),
        checkpointDir = req("checkpointDir"),
        nBuckets = opt("bm25.nBuckets").map(_.toInt).getOrElse(64),
        maxFilesPerTrigger = opt("processor.maxFilesPerTrigger").map(_.toInt)))
      case Some("packed") => Some(Packed(
        name = opt("logName").getOrElse(name),
        inputDir = req("inputDir"),
        packedDir = req("packedDir"),
        checkpointDir = req("checkpointDir"),
        maxFilesPerTrigger = opt("processor.maxFilesPerTrigger").map(_.toInt)))
      case _ => None
    }
  }

  /** The spec's STANDING-STORE root — the directory its maintenance ops
    * lease ([[MaintenanceLease.leasePath]] sibling). The status plane
    * ([[StatusReporter]]) reports per-store lease/intent state from
    * these, so an operator sees "compact running on store X since T"
    * in `status` and the heartbeat instead of listing dot-files by hand. */
  def storeRoot(spec: Spec): (String, String) = spec match {
    case c: Curation => c.name -> c.stateDir
    case i: Ivf => i.name -> i.indexPath
    case b: Bm25 => b.name -> b.indexPath
    case p: Packed => p.name -> p.packedDir
  }

  def start(spark: SparkSession, spec: Spec): StreamingQuery = spec match {
    case c: Curation =>
      val reader = spark.readStream.schema("doc_id long, text string")
      c.maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
      StreamingCuration.run(
        reader.json(c.inputDir),
        spark.read.parquet(c.probesPath),
        c.stateDir, c.checkpointDir,
        c.minQuality, c.threshold, c.probeNgram, c.nShards)
    case i: Ivf =>
      // freeze the quantizer on first launch when a centroid source is given
      if (!new java.io.File(s"${i.indexPath}/centroids").exists())
        i.centroidsPath match {
          case Some(cp) => StreamingIvf.init(spark.read.parquet(cp), i.indexPath)
          case None => throw new IllegalStateException(
            s"${i.name}: ${i.indexPath}/centroids missing and no centroidsPath given")
        }
      val reader = spark.readStream.schema("vec_id long, embedding array<float>")
      i.maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
      StreamingIvf.run(reader.json(i.inputDir), i.indexPath, i.checkpointDir)
    case b: Bm25 =>
      // a restarted pipeline resolves the store's persisted bucket count
      // (a rebucket may have changed it since the conf was written);
      // first launch fixes the layout from the conf
      val nBuckets = StreamingBm25.storedNBuckets(spark, b.indexPath)
        .getOrElse(b.nBuckets)
      val reader = spark.readStream.schema("doc_id long, text string")
      b.maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
      StreamingBm25.run(reader.json(b.inputDir), b.indexPath, b.checkpointDir,
        nBuckets = nBuckets)
    case p: Packed =>
      val reader = spark.readStream
        .schema("doc_id long, token_ids array<int>")
      p.maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
      graft.sources.PackedCorpus.run(reader.json(p.inputDir), p.packedDir,
        p.checkpointDir)
  }
}
