package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.model.PipelineConfig
import graft.streaming.{AuditWriter, HeartbeatListener, PipelineManager}

/** Agent entry point — the reference's `SingerMain` re-expressed: load every
  * `*.properties` pipeline definition from a conf directory, start one
  * streaming query per config under a PipelineManager, attach audit +
  * heartbeat side-channels, run until terminated
  * (reference: SingerMain.java:150-172 boot sequence,
  * config/DirectorySingerConfigurator.java per-log property files).
  *
  * Usage: graft.GraftMain <confDir> [auditDir] [heartbeatFile]
  */
object GraftMain {

  /** Parse + start everything; returned manager owns the queries (separated
    * from main for tests). */
  def run(spark: SparkSession, confDir: String,
      auditDir: Option[String] = None,
      heartbeat: Option[String => Unit] = None,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): PipelineManager = {
    val confs = loadConfigs(Paths.get(confDir))
    require(confs.nonEmpty, s"no *.properties pipeline configs under $confDir")
    heartbeat.foreach(emit => spark.streams.addListener(new HeartbeatListener(emit)))
    val audit = auditDir.map(new AuditWriter(spark, _))
    val mgr = new PipelineManager(spark, audit = audit)
    confs.foreach(mgr.start(_, trigger))
    mgr
  }

  def loadConfigs(dir: Path): Seq[PipelineConfig] = {
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try s.iterator().asScala
      .filter(_.toString.endsWith(".properties"))
      .map { p =>
        val name = p.getFileName.toString.stripSuffix(".properties")
        PipelineConfig.fromProperties(Files.readString(p), name)
      }
      .toSeq.sortBy(_.name)
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val confDir = args.headOption.getOrElse("conf.d")
    val auditDir = args.lift(1)
    val heartbeatFile = args.lift(2)
    val spark = SparkSession.builder()
      .appName("graft-agent")
      // spark-submit supplies spark.master; standalone launches run local
      .master(sys.props.getOrElse("spark.master", sys.env.getOrElse("GRAFT_MASTER", "local[*]")))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emit: Option[String => Unit] = heartbeatFile.map { f => (line: String) =>
      Files.writeString(Paths.get(f), line + "\n",
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    }
    val mgr = run(spark, confDir, auditDir, emit)
    sys.addShutdownHook(mgr.stopAll())
    spark.streams.awaitAnyTermination()
  }
}
