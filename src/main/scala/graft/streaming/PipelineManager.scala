package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.PipelineConfig

/** Control plane: one `StreamingQuery` per pipeline config, with stuck-query
  * detection and drain — the reference's `DefaultLogMonitor` collapsed into a
  * driver-side registry (reference: monitor/DefaultLogMonitor.java:104,
  * 233-273 start-per-stream; 543-601 stuck detection; drain
  * monitor/LogStreamManager.java:657).
  *
  * Instance-level decider sampling (process-or-skip a whole pipeline,
  * reference: monitor/DefaultLogMonitor.java:203-224) happens here at
  * `startAll` — a skipped pipeline's query is simply never started.
  */
class PipelineManager(spark: SparkSession,
    stuckThresholdMs: Long = 10 * 60 * 1000L,
    audit: Option[AuditWriter] = None,
    restartSchedule: Option[RestartSchedule] = None) {

  private val queries = TrieMap.empty[String, StreamingQuery]
  private val supervisors = TrieMap.empty[String, SupervisedQuery]
  private val pendingDirs = TrieMap.empty[String, (PipelineConfig, Trigger)]

  def start(cfg: PipelineConfig,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    if (cfg.maxRestarts > 0) {
      // supervised: the factory re-registers each restarted query so
      // active/stuck tracking follows the live instance
      val sup = new SupervisedQuery(() => {
        val q = LogPipeline.start(spark, cfg, trigger, audit)
        queries.put(cfg.name, q)
        q
      }, cfg.maxRestarts)
      supervisors.put(cfg.name, sup)
      sup.current
    } else {
      val q = LogPipeline.start(spark, cfg, trigger, audit)
      queries.put(cfg.name, q)
      q
    }
  }

  /** Start every config whose instance decider allows this instance
    * (reference: monitor/DefaultLogMonitor.java:203-224); configs without a
    * decider always start. Configs whose `logDir` does not exist yet are
    * HELD, not failed — the reference's MissingDirChecker semantics
    * (reference: monitor/MissingDirChecker.java: configs wait until their
    * directory appears, then start monitoring); release them with
    * [[checkPendingDirs]]. */
  def startAll(cfgs: Seq[PipelineConfig],
      deciders: graft.model.Deciders = graft.model.Deciders.allOn,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): Seq[StreamingQuery] =
    cfgs.filter(c => c.instanceDecider.forall(d => deciders.instanceAllowed(d, c.name)))
      .flatMap { c =>
        if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(c.logDir)))
          Some(start(c, trigger))
        else { pendingDirs.put(c.name, (c, trigger)); None }
      }

  /** Track an externally-started query (e.g. a [[DataPipelines]] standing
    * pipeline) under this manager: it then participates in `active`,
    * `stuck`, `drain` and `stopAll` exactly like a log pipeline. */
  def adopt(name: String, q: StreamingQuery): StreamingQuery = {
    queries.put(name, q)
    q
  }

  /** Pipelines held because their logDir was missing. */
  def pending: Set[String] = pendingDirs.keySet.toSet

  /** Start any held pipeline whose directory has since appeared; call from
    * a scheduler tick (the reference polls the same way). Returns the
    * queries started this check. */
  def checkPendingDirs(): Seq[StreamingQuery] =
    pendingDirs.toSeq.flatMap { case (name, (cfg, trigger)) =>
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(cfg.logDir))) {
        pendingDirs.remove(name)
        Some(start(cfg, trigger))
      } else None
    }

  def get(name: String): Option[StreamingQuery] = queries.get(name)

  def active: Map[String, StreamingQuery] = queries.toMap.filter(_._2.isActive)

  /** True while any SUPERVISED pipeline is between queries — its current
    * query is down but supervision has not concluded (a scheduled restart
    * is swapping instances, or a failure relaunch is in its backoff).
    * The agent lifecycle gates its "all streams ended" exit on this: a
    * daily-restart window on a single-pipeline agent must not read as
    * process completion (a fixed sleep raced exactly that — the
    * round-14 advisory). */
  def restartInFlight: Boolean = supervisors.values.exists(_.restartPending)

  /** Queries that died WITH an exception and will never be relaunched:
    * unsupervised failures, and supervised ones whose budget is spent
    * (supervision concluded). The agent lifecycle polls this so a
    * non-recoverable failure always produces a non-zero exit — even
    * when its awaitAnyTermination exception raced an UNRELATED
    * supervisor's restart window, where the restartInFlight gate alone
    * swallowed it (round-15 advisory). Mid-budget supervised failures
    * never appear: their supervisor is not `concluded` until either the
    * relaunch replaced the dead query in the registry or the budget ran
    * out. */
  def deadFailures: Seq[(String, Throwable)] =
    queries.toSeq.collect {
      case (name, q) if !q.isActive && q.exception.isDefined &&
          supervisors.get(name).forall(_.concluded) =>
        (name, q.exception.get: Throwable)
    }

  /** Queries with no progress for longer than the threshold
    * (reference: stuck-stream alert, monitor/DefaultLogMonitor.java:561-601). */
  def stuck(nowMs: Long = System.currentTimeMillis()): Seq[String] =
    queries.collect {
      case (name, q) if q.isActive =>
        val last = Option(q.lastProgress)
          .map(p => java.time.Instant.parse(p.timestamp).toEpochMilli)
        (name, last)
    }.collect {
      case (name, Some(t)) if nowMs - t > stuckThresholdMs => name
      case (name, None) => name // never progressed
    }.toSeq

  /** Drain: let in-flight work finish, then stop
    * (reference: skip-draining, monitor/LogStreamManager.java:657). */
  def drain(name: String): Unit = queries.get(name).foreach { q =>
    q.processAllAvailable()
    q.stop()
  }

  def stopAll(): Unit = {
    supervisors.values.foreach(_.stop())
    queries.values.foreach(q => if (q.isActive) q.stop())
  }

  /** Daily-restart tick: when the (per-host jittered) restart time passes,
    * every SUPERVISED pipeline is drained and relaunched from its checkpoint
    * — the reference's `restartDaily` hygiene restart
    * (reference: monitor/DefaultLogMonitor.java:158-188 picks a random time
    * inside a configured window so a fleet never restarts in lockstep).
    * Call from the same scheduler tick as [[checkPendingDirs]]/[[stuck]].
    * Unsupervised queries have no restart factory and are left alone (use
    * `maxRestarts > 0` to opt a pipeline into supervision). Returns the
    * restarted pipeline names. */
  def checkScheduledRestart(nowMs: Long = System.currentTimeMillis()): Seq[String] =
    restartSchedule match {
      case Some(sched) if sched.due(nowMs) =>
        sched.advance()
        supervisors.toSeq.map { case (name, sup) => sup.scheduledRestart(); name }
      case _ => Nil
    }
}

/** Per-host randomized daily restart time — the reference's
  * `SingerRestartConfig.restartDaily` window (reference:
  * monitor/DefaultLogMonitor.java:158-188): a time is drawn inside
  * `[beginOffsetMs, endOffsetMs]` of the UTC day, seeded by the hostname so
  * each host restarts at a stable-but-different minute (fleet-wide jitter);
  * if today's slot already passed it rolls to tomorrow. `clock` injectable
  * for specs. */
class RestartSchedule(beginOffsetMs: Long, endOffsetMs: Long,
    hostname: String = LogPipeline.hostname,
    clock: () => Long = () => System.currentTimeMillis()) {
  require(beginOffsetMs >= 0 && endOffsetMs < 86400000L && endOffsetMs >= beginOffsetMs,
    s"restart window must satisfy 0 <= begin <= end < 1d, got [$beginOffsetMs, $endOffsetMs]")

  private val jitterMs: Long = {
    val span = endOffsetMs - beginOffsetMs + 1
    beginOffsetMs + math.floorMod(new scala.util.Random(hostname.hashCode).nextLong(), span)
  }

  @volatile private var nextMs: Long = {
    val now = clock()
    val midnight = now - math.floorMod(now, 86400000L)
    val t = midnight + jitterMs
    if (t <= now) t + 86400000L else t
  }

  /** The chosen restart instant (epoch ms). */
  def nextRestartMs: Long = nextMs
  def due(nowMs: Long = clock()): Boolean = nowMs >= nextMs
  /** Roll to the same jittered slot tomorrow. */
  def advance(): Unit = nextMs += 86400000L
}

/** Restart-on-failure supervision — the reference restarts a writer after N
  * consecutive failures and itself daily (reference:
  * monitor/DefaultLogMonitor.java:164-188, writer/KafkaWriter.java:595-603).
  * Wraps a query factory: when the current query terminates WITH an
  * exception and the restart budget remains, a new query is started from
  * the same checkpoint (at-least-once semantics make the retry safe).
  * Clean stops end supervision. */
class SupervisedQuery(factory: () => StreamingQuery, maxRestarts: Int,
    backoffMs: Long = 1000L) {

  private val currentRef = new java.util.concurrent.atomic.AtomicReference[StreamingQuery](factory())
  @volatile private var restartCount = 0
  @volatile private var stopped = false
  @volatile private var restarting = false
  @volatile private var finished = false

  private val monitor = new Thread(() => {
    var done = false
    while (!done) {
      val q = currentRef.get()
      try q.awaitTermination()
      catch { case _: Throwable => () } // exception recorded on the query
      if (stopped) done = true
      else if (q.exception.isEmpty) {
        // clean termination: either a scheduledRestart is swapping in a new
        // query (keep supervising it) or a real stop (end supervision)
        Thread.sleep(100)
        if (!restarting && (currentRef.get() eq q)) done = true
      } else if (restartCount >= maxRestarts) done = true
      else {
        restartCount += 1
        Thread.sleep(backoffMs)
        if (!stopped) currentRef.set(factory()) else done = true
      }
    }
    finished = true // supervision concluded: no further relaunch will come
  }, "graft-supervisor")
  monitor.setDaemon(true)
  monitor.start()

  def current: StreamingQuery = currentRef.get()
  def restarts: Int = restartCount

  /** True while the supervised pipeline is BETWEEN queries: its current
    * query is inactive but the supervision loop has not concluded — a
    * relaunch (scheduled or failure-backoff) is either in progress or
    * about to be decided. The key property is NO false negative in the
    * relaunch window: from the moment the query dies until either the
    * replacement is active or the monitor marks supervision finished,
    * this reads true — so a lifecycle watcher polling it can never
    * observe "all ended" mid-restart. */
  def restartPending: Boolean =
    !finished && (restarting || !currentRef.get().isActive)

  /** True once the supervision loop has ended — no relaunch will ever
    * come, so a dead current query is dead for good. */
  def concluded: Boolean = finished
  def stop(): Unit = {
    stopped = true
    val q = currentRef.get()
    if (q.isActive) q.stop()
  }

  /** Clean scheduled restart (daily hygiene, reference:
    * monitor/DefaultLogMonitor.java:158-188): drain the current query, stop
    * it, relaunch from the same checkpoint. Does NOT consume the failure
    * restart budget, and supervision continues on the new instance. */
  def scheduledRestart(): StreamingQuery = synchronized {
    restarting = true
    try {
      val old = currentRef.get()
      if (old.isActive) {
        old.processAllAvailable()
        old.stop()
      }
      val q = factory()
      currentRef.set(q)
      q
    } finally restarting = false
  }
  /** Wait until the query is alive again after a crash (test helper). */
  def awaitActive(timeoutMs: Long): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      val q = currentRef.get()
      if (q.isActive) return true
      Thread.sleep(50)
    }
    currentRef.get().isActive
  }
}
