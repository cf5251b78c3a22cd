package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The tutorial directory is executable documentation: this spec boots the
  * agent from the COMMITTED `tutorial/conf.d` configs against generated
  * input and asserts records land — so the quickstart in
  * `tutorial/README.md` cannot rot without failing the suite. */
class TutorialSpec extends AnyFunSuite with SparkTestBase {

  private val base = Paths.get("/tmp/graft-tutorial")

  private def rmTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.deleteIfExists(f))

  test("the committed tutorial configs validate and run end to end") {
    rmTree(base)
    Files.createDirectories(base.resolve("logs/text"))
    Files.createDirectories(base.resolve("logs/thrift"))

    // step 1: inputs — the generator's records plus two text lines
    ThriftLogGen.generate(base.resolve("logs/thrift/app.log"), n = 1000)
    Files.writeString(base.resolve("logs/text/app.log"), "hello graft\nsecond line\n")

    // step 2: config validation — the shipped files must be clean
    val problems = ConfigCheck.check(Paths.get("tutorial/conf.d"))
    assert(problems.isEmpty, s"tutorial configs must validate: $problems")

    // step 3: run the agent over the committed conf.d (drain-everything
    // trigger keeps the spec bounded) and let both pipelines finish
    val mgr = GraftMain.run(spark, "tutorial/conf.d",
      auditDir = Some(base.resolve("audit").toString),
      trigger = Trigger.AvailableNow(), monitorIntervalMs = 60000L)
    try {
      spark.streams.active.foreach(_.processAllAvailable())

      // step 4: inspect what landed
      val thrift = spark.read.parquet(base.resolve("out/thrift").toString + "/batch_id=*")
      assert(thrift.count() == 1000L)
      val text = spark.read.parquet(base.resolve("out/text").toString + "/batch_id=*")
      assert(text.count() == 2L)
    } finally mgr.stopAll()
  }
}
