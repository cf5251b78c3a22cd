package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model._

object SupervisionSpec {
  // shared with the foreachBatch closure (same JVM in local mode)
  val failures = new AtomicInteger(0)
  val delivered = new AtomicInteger(0)
}

class SupervisionSpec extends AnyFunSuite with SparkTestBase {

  test("SupervisedQuery restarts a crashed query from its checkpoint") {
    val logDir = Files.createTempDirectory("graft-sup-logs")
    val cp = Files.createTempDirectory("graft-sup-cp")
    Files.writeString(logDir.resolve("a.log"), "m1\nm2\n")
    SupervisionSpec.failures.set(0)
    SupervisionSpec.delivered.set(0)

    def factory() = spark.readStream.text(logDir.toString)
      .writeStream
      .option("checkpointLocation", cp.toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // fail the FIRST attempt; succeed on retry — the poison-batch path
        if (SupervisionSpec.failures.getAndIncrement() == 0)
          throw new RuntimeException("injected batch failure")
        SupervisionSpec.delivered.addAndGet(batch.count().toInt)
        ()
      }.start()

    val sup = new SupervisedQuery(factory, maxRestarts = 3, backoffMs = 200L)
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline && SupervisionSpec.delivered.get() < 2)
        Thread.sleep(100)
      assert(SupervisionSpec.delivered.get() == 2, "records delivered after restart")
      assert(sup.restarts == 1)
      assert(sup.awaitActive(5000))
    } finally sup.stop()
  }

  test("adaptive cycles back off on idle and reset on data") {
    val logDir = Files.createTempDirectory("graft-adapt-logs")
    val outDir = Files.createTempDirectory("graft-adapt-out")
    Files.writeString(logDir.resolve("a.log"), "x1\n")
    val cfg = PipelineConfig(
      name = "adapt-test", logDir = logDir.toString,
      writer = WriterSpec.Files(outDir.toString),
      checkpointDir = Some(Files.createTempDirectory("graft-adapt-cp").toString))
    var cycle = 0
    val history = LogPipeline.runAdaptiveCycles(spark, cfg,
      minIntervalMs = 10, maxIntervalMs = 80, cycles = 5,
      sleep = _ => {
        cycle += 1
        // drop new data in just before the final cycle
        if (cycle == 4) Files.writeString(logDir.resolve("b.log"), "x2\n")
      })
    // cycle1 has data → reset to min; cycles 2-4 idle → 20, 40, 80 (capped);
    // cycle5 sees b.log → reset to min
    assert(history.intervals == Seq(10L, 20L, 40L, 80L, 10L), s"got $history")
    assert(spark.read.parquet(outDir.toString).count() == 2)
  }

  test("missing logDir holds the pipeline until the directory appears (MissingDirChecker)") {
    val parent = Files.createTempDirectory("graft-md-parent")
    val missing = parent.resolve("not-yet")
    val outDir = Files.createTempDirectory("graft-md-out")
    val mgr = new PipelineManager(spark)
    val cfg = PipelineConfig(
      name = "md-test", logDir = missing.toString,
      writer = WriterSpec.Files(outDir.toString),
      checkpointDir = Some(Files.createTempDirectory("graft-md-cp").toString))
    try {
      val started = mgr.startAll(Seq(cfg), trigger = Trigger.ProcessingTime("100 milliseconds"))
      assert(started.isEmpty && mgr.pending == Set("md-test"))
      // nothing appears yet → still held
      assert(mgr.checkPendingDirs().isEmpty && mgr.pending == Set("md-test"))
      // the directory (and a file) appear → released and ingesting
      Files.createDirectories(missing)
      Files.writeString(missing.resolve("a.log"), "x1\nx2\n")
      val released = mgr.checkPendingDirs()
      assert(released.size == 1 && mgr.pending.isEmpty)
      released.head.processAllAvailable()
      assert(spark.read.parquet(outDir.toString).count() == 2)
    } finally mgr.stopAll()
  }

  test("failed cycles halve the batch cap; success restores it (ref batch adaptation)") {
    val logDir = Files.createTempDirectory("graft-bs-logs")
    val outDir = Files.createTempDirectory("graft-bs-out")
    Files.writeString(logDir.resolve("a.log"), "x1\n")
    val cfg = PipelineConfig(
      name = "bs-test", logDir = logDir.toString,
      writer = WriterSpec.Files(outDir.toString),
      checkpointDir = Some(Files.createTempDirectory("graft-bs-cp").toString),
      maxFilesPerTrigger = Some(8))
    var cycle = 0
    val seen = scala.collection.mutable.ArrayBuffer.empty[Option[Int]]
    val run = LogPipeline.runAdaptiveCycles(spark, cfg,
      minIntervalMs = 10, maxIntervalMs = 80, cycles = 5, sleep = _ => (),
      startCycle = (s, c, a) => {
        cycle += 1
        seen += c.maxFilesPerTrigger
        // cycles 1-2 fail (injected writer failure); later cycles run real
        if (cycle <= 2) throw new RuntimeException("injected epoch failure")
        LogPipeline.start(s, c, Trigger.AvailableNow(), a)
      })
    // ran with: 8, then halved 4, halved 2; success restores to 8
    assert(seen.toList == List(Some(8), Some(4), Some(2), Some(8), Some(8)), s"got $seen")
    assert(run.batchSizes == seen.toList)
    // failures back off the interval like empty cycles: 20, 40, then data resets
    assert(run.intervals.take(2) == Seq(20L, 40L), s"got ${run.intervals}")
    assert(spark.read.parquet(outDir.toString).count() == 1)
  }

  test("restartPending spans the whole relaunch window (the lifecycle exit gate)") {
    // the agent lifecycle exits when every stream ended AND no restart is
    // in flight (GraftMain's watcher) — the round-14 advisory: a fixed
    // grace sleep raced a scheduledRestart's stop-then-relaunch window and
    // exited 0 mid-restart. The gate property is NO FALSE NEGATIVE: from
    // the moment the current query dies until the replacement is active
    // (or supervision concludes), restartPending reads true.
    val logDir = Files.createTempDirectory("graft-rp-logs")
    val cp = Files.createTempDirectory("graft-rp-cp")
    Files.writeString(logDir.resolve("a.log"), "m1\nm2\n")
    SupervisionSpec.failures.set(0)
    SupervisionSpec.delivered.set(0)
    def factory() = spark.readStream.text(logDir.toString)
      .writeStream
      .option("checkpointLocation", cp.toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (SupervisionSpec.failures.getAndIncrement() == 0)
          throw new RuntimeException("injected batch failure")
        SupervisionSpec.delivered.addAndGet(batch.count().toInt)
        ()
      }.start()
    val sup = new SupervisedQuery(factory, maxRestarts = 3, backoffMs = 500L)
    try {
      // FAILURE relaunch: poll through the crash + backoff + restart —
      // "query dead AND nothing pending" must never be observable
      var badWindow = false
      var deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
          SupervisionSpec.delivered.get() < 2) {
        if (!sup.current.isActive && !sup.restartPending) badWindow = true
        Thread.sleep(10)
      }
      assert(SupervisionSpec.delivered.get() == 2, "records delivered after restart")
      assert(!badWindow,
        "a lifecycle watcher could have observed 'all ended' mid-relaunch")
      assert(sup.awaitActive(5000))

      // SCHEDULED restart: the flag covers the drain-stop-relaunch swap too
      var sawPending = false
      val swapper = new Thread(() => { sup.scheduledRestart(); () })
      swapper.start()
      while (swapper.isAlive) {
        if (sup.restartPending) sawPending = true
        if (!sup.current.isActive && !sup.restartPending) badWindow = true
        Thread.sleep(5)
      }
      swapper.join()
      assert(sawPending, "the swap window must be visible as restart-pending")
      assert(!badWindow, "the swap window must never read as 'all ended'")
      assert(sup.awaitActive(5000) && !sup.restartPending)
    } finally sup.stop()
    // after a REAL stop, supervision concludes and the gate opens
    val deadline2 = System.currentTimeMillis() + 10000
    while (System.currentTimeMillis() < deadline2 && sup.restartPending)
      Thread.sleep(20)
    assert(!sup.restartPending, "a clean stop must open the lifecycle gate")
  }

  test("deadFailures lists only never-to-be-relaunched failures (the lifecycle's non-zero-exit sweep)") {
    // round-15 advisory: an UNSUPERVISED failure whose awaitAnyTermination
    // exception raced an unrelated supervisor's restart window was
    // swallowed by the restartInFlight gate alone — the agent exited 0
    // with the pipeline silently dead. deadFailures is the registry-level
    // sweep GraftMain's watcher now polls: it consults only the FAILED
    // query's own supervision state, never the global restart flag.
    val mgr = new PipelineManager(spark)
    val badDir = Files.createTempDirectory("graft-df-bad")
    Files.writeString(badDir.resolve("a.log"), "x\n")
    val badQ = spark.readStream.text(badDir.toString).writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-df-cp").toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .foreachBatch { (_: DataFrame, _: Long) =>
        throw new RuntimeException("unrecoverable")
      }.start()
    mgr.adopt("bad", badQ)
    try badQ.awaitTermination() catch { case _: Exception => () }
    assert(!badQ.isActive && badQ.exception.isDefined)
    val dead = mgr.deadFailures
    assert(dead.map(_._1) == Seq("bad"),
      s"an unsupervised failure is dead for good: $dead")
    assert(dead.head._2.getMessage.contains("unrecoverable") ||
      Option(dead.head._2.getCause).exists(_.getMessage.contains("unrecoverable")))

    // a healthy query is never listed
    val okDir = Files.createTempDirectory("graft-df-ok")
    Files.writeString(okDir.resolve("a.log"), "y\n")
    val okOut = Files.createTempDirectory("graft-df-okout")
    val okQ = spark.readStream.text(okDir.toString).writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-df-okcp").toString)
      .format("parquet").option("path", okOut.toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    mgr.adopt("ok", okQ)
    assert(mgr.deadFailures.map(_._1) == Seq("bad"))
    okQ.stop() // clean stop: exception empty, still never listed
    assert(mgr.deadFailures.map(_._1) == Seq("bad"))
  }

  test("a supervised failure is not 'dead' until its supervision concludes") {
    // the other half of the deadFailures contract: mid-budget crashes are
    // recoverable (a relaunch is in flight or about to be decided), so
    // `concluded` must read false across the whole backoff window and
    // true once the budget is spent
    val logDir = Files.createTempDirectory("graft-dfc-logs")
    Files.writeString(logDir.resolve("a.log"), "m1\n")
    def failingFactory() = spark.readStream.text(logDir.toString).writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-dfc-cp").toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .foreachBatch { (_: DataFrame, _: Long) =>
        throw new RuntimeException("always fails")
      }.start()
    val sup = new SupervisedQuery(failingFactory, maxRestarts = 1, backoffMs = 400L)
    try {
      // first crash: inside the backoff window, supervision has NOT
      // concluded — a lifecycle sweep must not report the pipeline dead
      val q0 = sup.current
      try q0.awaitTermination() catch { case _: Exception => () }
      assert(!sup.concluded,
        "mid-budget: the relaunch is coming, the failure is recoverable")
      // budget exhausted: the second instance crashes too, supervision ends
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline && !sup.concluded)
        Thread.sleep(50)
      assert(sup.concluded && sup.restarts == 1)
      assert(!sup.current.isActive && sup.current.exception.isDefined,
        "the final failed instance is what deadFailures would surface")
    } finally sup.stop()
  }

  test("RestartSchedule draws a stable per-host slot inside the window") {
    val day = 86400000L
    val begin = 3600000L; val end = 7200000L // 01:00-02:00 UTC
    val t0 = 1700000000000L // mid-day, after any possible slot? compute below
    val s1 = new RestartSchedule(begin, end, hostname = "host-a", clock = () => t0)
    val s2 = new RestartSchedule(begin, end, hostname = "host-a", clock = () => t0)
    val s3 = new RestartSchedule(begin, end, hostname = "host-b", clock = () => t0)
    // deterministic per host, jittered across hosts
    assert(s1.nextRestartMs == s2.nextRestartMs)
    assert(s1.nextRestartMs != s3.nextRestartMs)
    // the slot sits inside [begin, end] of a UTC day, in the FUTURE
    val offset = math.floorMod(s1.nextRestartMs, day)
    assert(offset >= begin && offset <= end, s"offset $offset outside window")
    assert(s1.nextRestartMs > t0)
    assert(s1.nextRestartMs - t0 <= day)
    // not due before the slot; due at/after; advance rolls +24h
    assert(!s1.due(s1.nextRestartMs - 1))
    assert(s1.due(s1.nextRestartMs))
    val first = s1.nextRestartMs
    s1.advance()
    assert(s1.nextRestartMs == first + day)
  }

  test("scheduled daily restart relaunches supervised pipelines from checkpoint") {
    val logDir = Files.createTempDirectory("graft-dr-logs")
    val outDir = Files.createTempDirectory("graft-dr-out")
    Files.writeString(logDir.resolve("a.log"), "m1\nm2\n")
    val t0 = 1700000000000L
    val sched = new RestartSchedule(0L, 86399999L, hostname = "h", clock = () => t0)
    val mgr = new PipelineManager(spark, restartSchedule = Some(sched))
    val cfg = PipelineConfig(
      name = "dr-test", logDir = logDir.toString,
      writer = WriterSpec.Files(outDir.toString),
      checkpointDir = Some(Files.createTempDirectory("graft-dr-cp").toString),
      maxRestarts = 2) // opt into supervision
    try {
      val q0 = mgr.start(cfg, Trigger.ProcessingTime("100 milliseconds"))
      q0.processAllAvailable()
      assert(spark.read.parquet(outDir.toString).count() == 2)

      // before the slot: tick is a no-op
      assert(mgr.checkScheduledRestart(sched.nextRestartMs - 1).isEmpty)
      // at the slot: the supervised pipeline is drained and relaunched
      val slot = sched.nextRestartMs
      assert(mgr.checkScheduledRestart(slot) == Seq("dr-test"))
      // schedule advanced a full day — the next tick does not re-fire
      assert(sched.nextRestartMs == slot + 86400000L)
      assert(mgr.checkScheduledRestart(slot + 1).isEmpty)

      // the relaunched query resumes the SAME checkpoint: new data flows,
      // old data is not re-delivered
      val q1 = mgr.get("dr-test").get
      assert(q1 ne q0)
      Files.writeString(logDir.resolve("b.log"), "m3\n")
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
        spark.read.parquet(outDir.toString).count() < 3) Thread.sleep(100)
      assert(spark.read.parquet(outDir.toString).count() == 3, "exactly m1,m2,m3 delivered")
      // clean scheduled restart consumed none of the failure budget
      assert(mgr.get("dr-test").get.isActive)
    } finally mgr.stopAll()
  }
}
