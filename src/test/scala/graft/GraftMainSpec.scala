package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class GraftMainSpec extends AnyFunSuite with SparkTestBase {

  test("agent boots pipelines from a conf directory and delivers with audit") {
    val confDir = Files.createTempDirectory("graft-conf")
    val logA = Files.createTempDirectory("graft-agent-a")
    val logB = Files.createTempDirectory("graft-agent-b")
    val outA = Files.createTempDirectory("graft-agent-outa")
    val outB = Files.createTempDirectory("graft-agent-outb")
    val auditDir = Files.createTempDirectory("graft-agent-audit")

    Files.writeString(confDir.resolve("pipe_a.properties"),
      s"""logName=pipe_a
         |logDir=$logA
         |writer.type=file
         |writer.file.path=$outA
         |checkpointDir=${Files.createTempDirectory("cpa")}
         |""".stripMargin)
    Files.writeString(confDir.resolve("pipe_b.properties"),
      s"""logName=pipe_b
         |logDir=$logB
         |reader.text.filterMessageRegex=^ok
         |writer.type=file
         |writer.file.path=$outB
         |checkpointDir=${Files.createTempDirectory("cpb")}
         |""".stripMargin)

    Files.writeString(logA.resolve("a.log"), "a1\na2\n")
    Files.writeString(logB.resolve("b.log"), "ok-1\nskip\nok-2\n")

    val heartbeats = new graft.streaming.BufferingHeartbeat
    val mgr = GraftMain.run(spark, confDir.toString,
      auditDir = Some(auditDir.toString), heartbeat = Some(heartbeats),
      trigger = Trigger.ProcessingTime("100 milliseconds"))
    try {
      mgr.active.values.foreach(_.processAllAvailable())
      assert(spark.read.parquet(outA.toString).count() == 2)
      assert(spark.read.parquet(outB.toString).count() == 2) // 'skip' filtered
      val totals = new graft.streaming.AuditWriter(spark, auditDir.toString)
        .totals().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(totals == Map("pipe_a" -> 2L, "pipe_b" -> 2L))
      assert(mgr.active.keySet == Set("pipe_a", "pipe_b"))
      assert(mgr.stuck().isEmpty)
      // SingerStatus-style snapshot built from the same registry
      val status = new graft.streaming.StatusReporter(mgr).statusJson()
      assert(status.contains("\"numPipelines\":2"))
      assert(status.contains("\"numStuckPipelines\":0"))
      assert(status.contains("\"pipe_a\":{\"batchId\":"))
    } finally mgr.stopAll()
  }

  test("agent boots standing data pipelines (all four stores) from the same conf directory") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val confDir = Files.createTempDirectory("graft-dconf")
    val docsIn = Files.createTempDirectory("graft-dp-docs")
    val vecsIn = Files.createTempDirectory("graft-dp-vecs")
    val stateDir = Files.createTempDirectory("graft-dp-state").toString
    val idxPath = Files.createTempDirectory("graft-dp-idx").toString
    val probesPath = Files.createTempDirectory("graft-dp-probes").toString + "/probes"
    val centsPath = Files.createTempDirectory("graft-dp-cents").toString + "/cents"

    Seq((1000L, "benchmark probe phrase never in corpus docs"))
      .toDF("doc_id", "text").write.parquet(probesPath)
    def vec(i: Long) = Array.tabulate(8)(j => (math.sin(i * 31 + j * 7) + 2.0).toFloat).toSeq
    (0L until 4L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
      .select(col("vec_id").cast("int").as("centroid_id"),
        col("embedding").as("centroid_vec"))
      .write.parquet(centsPath)

    Files.writeString(confDir.resolve("curate.properties"),
      s"""pipeline.type=curation
         |inputDir=$docsIn
         |probesPath=$probesPath
         |stateDir=$stateDir
         |checkpointDir=${Files.createTempDirectory("dcp1")}
         |""".stripMargin)
    Files.writeString(confDir.resolve("vectors.properties"),
      s"""pipeline.type=ivf
         |inputDir=$vecsIn
         |indexPath=$idxPath
         |centroidsPath=$centsPath
         |checkpointDir=${Files.createTempDirectory("dcp2")}
         |""".stripMargin)
    val lexIn = Files.createTempDirectory("graft-dp-lex")
    val lexIdx = Files.createTempDirectory("graft-dp-lexidx").toString + "/idx"
    Files.writeString(confDir.resolve("lexical.properties"),
      s"""pipeline.type=bm25
         |inputDir=$lexIn
         |indexPath=$lexIdx
         |checkpointDir=${Files.createTempDirectory("dcp3")}
         |bm25.nBuckets=8
         |""".stripMargin)
    val packIn = Files.createTempDirectory("graft-dp-pack")
    val packDir = Files.createTempDirectory("graft-dp-packdir").toString + "/corpus"
    Files.writeString(confDir.resolve("packed.properties"),
      s"""pipeline.type=packed
         |inputDir=$packIn
         |packedDir=$packDir
         |checkpointDir=${Files.createTempDirectory("dcp4")}
         |""".stripMargin)

    Files.writeString(docsIn.resolve("d1.json"),
      """{"doc_id":1,"text":"the quick brown fox jumps over the lazy dog near the river bank today"}
        |{"doc_id":2,"text":"the quick brown fox jumps over the lazy dog near the river bank today"}
        |""".stripMargin)
    Files.writeString(vecsIn.resolve("v1.json"),
      (0L until 12L).map(i => s"""{"vec_id":$i,"embedding":[${vec(i).mkString(",")}]}""")
        .mkString("", "\n", "\n"))
    Files.writeString(lexIn.resolve("l1.json"),
      """{"doc_id":1,"text":"spark shuffle probe"}
        |{"doc_id":2,"text":"spark hash join"}
        |""".stripMargin)
    Files.writeString(packIn.resolve("p1.json"),
      """{"doc_id":1,"token_ids":[1,2,3]}
        |{"doc_id":2,"token_ids":[4,5]}
        |""".stripMargin)

    // data-pipeline files are invisible to the log-pipeline loader
    assert(GraftMain.loadConfigs(confDir).isEmpty)
    val mgr = GraftMain.run(spark, confDir.toString,
      trigger = Trigger.ProcessingTime("100 milliseconds"))
    try {
      mgr.active.values.foreach(_.processAllAvailable())
      assert(mgr.active.keySet == Set("curate", "vectors", "lexical", "packed"))
      val v = graft.streaming.StreamingCuration.verdicts(spark, stateDir)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(v == Map(1L -> "kept", 2L -> "exact_dup"))
      assert(graft.streaming.StreamingIvf.search(spark, idxPath,
        Seq((0L, vec(0))).toDF("vec_id", "embedding"), k = 3).count() == 3)
      // the bm25 pipeline fixed its layout from the conf and recorded it
      assert(graft.streaming.StreamingBm25.storedNBuckets(spark, lexIdx)
        .contains(8))
      assert(graft.streaming.StreamingBm25.search(spark, lexIdx,
        Seq((0L, "spark")).toDF("query_id", "text"), k = 2).count() == 2)
      assert(graft.sources.PackedCorpus.readAll(spark, packDir).count() == 2)
    } finally mgr.stopAll()
  }

  test("deciders gate sampling deterministically and instances fail open") {
    import graft.model.Deciders
    val d = Deciders.fromProperties("decider.mylog=50\ndecider.off=0\n")
    assert(d.percent("mylog") == 50)
    assert(d.percent("unknown") == 100)         // fail-open like the reference
    assert(!d.instanceAllowed("off", "host-1")) // 0% never allows
    assert(d.instanceAllowed("unknown", "any"))
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (0L until 1000L).toDF("k")
      .filter(d.messageFilter("mylog", Some(col("k")))).count()
    assert(rows > 350 && rows < 650) // ~50% deterministic pass
    val again = (0L until 1000L).toDF("k")
      .filter(d.messageFilter("mylog", Some(col("k")))).count()
    assert(rows == again)
  }
}
