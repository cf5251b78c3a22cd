package graft.streaming

import java.nio.file.{Files, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.Trigger

import graft.model.PipelineConfig

/** Kubelet-metadata-shaped seam: the active pod DIRECTORY names on this
  * host (the reference resolves `namespace_podname[_uid]` from the kubelet
  * `/pods` JSON — kubernetes/KubeService.java:308-345). Injectable for
  * specs; a real deployment implements it over the kubelet read-only port
  * or an API-server watch. A thrown exception skips the poll (stale active
  * set beats a spurious mass-delete). */
trait PodMetadataSource {
  def activePods(): Set[String]
}

/** Pod lifecycle listener — the reference's `PodWatcher`
  * (kubernetes/PodWatcher.java:29-43) verbatim: fired on reconciliation
  * deltas, not on every poll. */
trait PodLifecycleWatcher {
  def podCreated(podName: String): Unit
  def podDeleted(podName: String): Unit
}

/** The reference `KubeService`'s reconciliation loop
  * (kubernetes/KubeService.java:154-268) re-expressed driver-side, minus
  * the transport: pod CREATION is discovered from the filesystem (a pod's
  * log directory appearing under `podLogDir` — the authoritative signal,
  * since logs can exist before metadata propagates), pod DELETION from the
  * metadata diff (active set minus fetched set), exactly the reference's
  * split. Ignore semantics match KubeService.java:193-238,496-499: a
  * tombstone file `.<podName>` next to the pod dir, or a configured marker
  * directory inside it (the pod runs its own dedicated logging agent),
  * keeps the pod out of the active set.
  *
  * Polling cadence belongs to the caller (the reference runs a thread at
  * `pollFrequencyInSeconds`; here the driver's existing supervision tick
  * calls [[scanFileSystem]] + [[pollMetadata]]) — no thread is owned here,
  * which keeps the class deterministic for specs. */
class PodDiscovery(
    podLogDir: String,
    metadata: PodMetadataSource,
    ignoreMarkerDir: Option[String] = None) {

  private val active = mutable.SortedSet.empty[String]
  private val watchers = mutable.ArrayBuffer.empty[PodLifecycleWatcher]

  /** Registration REPLAYS the current active set to the new watcher: a pod
    * directory discovered between the monitor thread's first tick and the
    * coordinator's registration (GraftMain registers after run() returns)
    * would otherwise sit in `active` with podCreated never re-firing — its
    * pipeline silently never started (review finding). Replay makes
    * registration order immaterial; coordinators are idempotent on
    * podCreated so a racing scan cannot double-start. */
  def register(w: PodLifecycleWatcher): Unit = synchronized {
    watchers += w
    active.foreach(p => try w.podCreated(p) catch { case _: Exception => })
  }

  def activePodSet: Set[String] = synchronized { active.toSet }

  private def ignored(podName: String): Boolean =
    Files.exists(Paths.get(podLogDir, s".$podName")) ||
      ignoreMarkerDir.exists(m => Files.exists(Paths.get(podLogDir, podName, m)))

  /** Discover newly appeared pod directories; fires `podCreated` for each
    * and returns them. A watcher throwing does not poison the loop or the
    * other watchers (reference: KubeService.java:284-295 catches per
    * watcher). */
  def scanFileSystem(): Seq[String] = synchronized {
    val dir = Paths.get(podLogDir)
    if (!Files.isDirectory(dir)) return Seq.empty
    val dirs = Files.list(dir).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq.sorted
    val created = dirs.filter(p => !active.contains(p) && !ignored(p))
    created.foreach { p =>
      active += p
      watchers.foreach(w => try w.podCreated(p) catch { case _: Exception => })
    }
    created
  }

  /** Reconcile against metadata: pods in the active set that metadata no
    * longer reports fire `podDeleted` and leave the set. Creations are NOT
    * taken from metadata (the reference ignores them there too —
    * KubeService.java:255 — directory appearance is the creation signal).
    * A metadata fetch failure keeps the active set untouched. Returns the
    * deleted pod names. */
  def pollMetadata(): Seq[String] = synchronized {
    val fetched =
      try metadata.activePods()
      catch { case _: Exception => return Seq.empty }
    val deleted = (active -- fetched).toSeq.sorted
    deleted.foreach { p =>
      active -= p
      watchers.foreach(w => try w.podDeleted(p) catch { case _: Exception => })
    }
    deleted
  }
}

/** The `LogStreamManager.podCreated/podDeleted` half of the reference
  * (monitor/LogStreamManager.java:384-477): pod appears → start that pod's
  * pipelines from a config template rooted in the pod's log directory; pod
  * deleted → DRAIN (process remaining data, then stop) rather than kill,
  * the reference's drain-before-retire semantics
  * (monitor/LogStreamManager.java:657). */
class PodPipelineCoordinator(
    manager: PipelineManager,
    podLogDir: String,
    template: String => PipelineConfig,
    trigger: Trigger = Trigger.ProcessingTime("1 second"))
    extends PodLifecycleWatcher {

  private val started = mutable.Map.empty[String, String] // pod -> pipeline name

  override def podCreated(podName: String): Unit = synchronized {
    if (!started.contains(podName)) {
      val cfg = template(podName)
      manager.start(cfg, trigger)
      started(podName) = cfg.name
    }
  }

  override def podDeleted(podName: String): Unit = synchronized {
    started.remove(podName).foreach(manager.drain)
  }

  def startedPipelines: Map[String, String] = synchronized { started.toMap }
}
