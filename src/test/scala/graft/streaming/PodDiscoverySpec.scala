package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model.{PipelineConfig, WriterSpec}

/** Pod-lifecycle discovery parity (reference: kubernetes/KubeService.java,
  * PodWatcher.java, monitor/LogStreamManager.java pod halves): creation
  * from directory appearance, deletion from the metadata diff, tombstone /
  * ignore-marker exclusion, failure-keeps-state, and the coordinator
  * start/drain integration with PipelineManager. */
class PodDiscoverySpec extends AnyFunSuite with SparkTestBase {

  private class Recorder extends PodLifecycleWatcher {
    val events = mutable.ArrayBuffer.empty[(String, String)]
    def podCreated(p: String): Unit = events += (("created", p))
    def podDeleted(p: String): Unit = events += (("deleted", p))
  }

  test("creation from directory appearance; tombstone and marker dirs excluded") {
    val root = Files.createTempDirectory("pods")
    Files.createDirectories(root.resolve("ns_a"))
    Files.createDirectories(root.resolve("ns_b"))
    Files.writeString(root.resolve(".ns_b"), "") // tombstone next to the dir
    Files.createDirectories(root.resolve("ns_c").resolve("own-agent")) // marker inside
    var md = Set("ns_a", "ns_b", "ns_c")
    val disc = new PodDiscovery(root.toString,
      () => md, ignoreMarkerDir = Some("own-agent"))
    val rec = new Recorder
    disc.register(rec)

    assert(disc.scanFileSystem() == Seq("ns_a"))
    assert(disc.activePodSet == Set("ns_a"))
    // re-scan is idempotent: no duplicate created events
    assert(disc.scanFileSystem().isEmpty)

    // a new pod dir appears later
    Files.createDirectories(root.resolve("ns_d"))
    md += "ns_d"
    assert(disc.scanFileSystem() == Seq("ns_d"))
    assert(rec.events == Seq(("created", "ns_a"), ("created", "ns_d")))
  }

  test("deletion from metadata diff; fetch failure keeps the active set") {
    val root = Files.createTempDirectory("pods")
    Seq("ns_a", "ns_b").foreach(p => Files.createDirectories(root.resolve(p)))
    var md: () => Set[String] = () => Set("ns_a", "ns_b")
    val disc = new PodDiscovery(root.toString, () => md())
    val rec = new Recorder
    disc.register(rec)
    disc.scanFileSystem()

    // metadata loses ns_b → deletion fires; ns_a stays
    md = () => Set("ns_a")
    assert(disc.pollMetadata() == Seq("ns_b"))
    assert(disc.activePodSet == Set("ns_a"))

    // a failing fetch must NOT mass-delete (stale beats spurious)
    md = () => throw new RuntimeException("kubelet down")
    assert(disc.pollMetadata().isEmpty)
    assert(disc.activePodSet == Set("ns_a"))

    // metadata does not CREATE pods (directory appearance is the signal)
    md = () => Set("ns_a", "ns_z")
    assert(disc.pollMetadata().isEmpty)
    assert(disc.activePodSet == Set("ns_a"))
    assert(rec.events == Seq(
      ("created", "ns_a"), ("created", "ns_b"), ("deleted", "ns_b")))
  }

  test("late registration replays the active set (monitor-before-coordinator race)") {
    // GraftMain's monitor thread can scan before main() registers the
    // coordinator; a pod discovered in that window must still fire
    // podCreated for the late watcher or its pipeline silently never
    // starts (round-10 review finding)
    val root = Files.createTempDirectory("pods")
    Seq("ns_a", "ns_b").foreach(p => Files.createDirectories(root.resolve(p)))
    val disc = new PodDiscovery(root.toString, () => Set("ns_a", "ns_b"))
    assert(disc.scanFileSystem() == Seq("ns_a", "ns_b")) // no watcher yet
    val rec = new Recorder
    disc.register(rec)
    assert(rec.events == Seq(("created", "ns_a"), ("created", "ns_b")),
      "registration must replay pods discovered before it")
    // the replay does not double-fire on the next scan
    assert(disc.scanFileSystem().isEmpty)
    assert(rec.events.size == 2)
    // a replay-throwing watcher still registers and sees later events
    val rec2 = new Recorder
    disc.register(new PodLifecycleWatcher {
      def podCreated(p: String): Unit = throw new RuntimeException("boom")
      def podDeleted(p: String): Unit = ()
    })
    disc.register(rec2)
    Files.createDirectories(root.resolve("ns_c"))
    assert(disc.scanFileSystem() == Seq("ns_c"))
    assert(rec2.events == Seq(
      ("created", "ns_a"), ("created", "ns_b"), ("created", "ns_c")))
  }

  test("a throwing watcher poisons neither the loop nor other watchers") {
    val root = Files.createTempDirectory("pods")
    Files.createDirectories(root.resolve("ns_a"))
    val disc = new PodDiscovery(root.toString, () => Set.empty)
    val rec = new Recorder
    disc.register(new PodLifecycleWatcher {
      def podCreated(p: String): Unit = throw new RuntimeException("boom")
      def podDeleted(p: String): Unit = throw new RuntimeException("boom")
    })
    disc.register(rec)
    assert(disc.scanFileSystem() == Seq("ns_a"))
    assert(rec.events == Seq(("created", "ns_a")))
  }

  test("coordinator starts a pod pipeline on create and drains it on delete") {
    val root = Files.createTempDirectory("pods")
    val out = Files.createTempDirectory("pods-out")
    val cp = Files.createTempDirectory("pods-cp")
    val podDir = root.resolve("ns_app_1")
    Files.createDirectories(podDir)
    Files.writeString(podDir.resolve("app.log"), "hello\nworld\n")

    val manager = new PipelineManager(spark)
    val coord = new PodPipelineCoordinator(manager, root.toString,
      template = pod => PipelineConfig(
        name = s"pod-$pod", logDir = root.resolve(pod).toString,
        writer = WriterSpec.Files(out.resolve(pod).toString),
        checkpointDir = Some(cp.resolve(pod).toString)),
      trigger = Trigger.ProcessingTime("100 milliseconds"))
    val disc = new PodDiscovery(root.toString, () => Set.empty)
    disc.register(coord)

    disc.scanFileSystem()
    assert(coord.startedPipelines == Map("ns_app_1" -> "pod-ns_app_1"))
    val q = manager.get("pod-ns_app_1").get
    q.processAllAvailable()

    // pod retires → drain (remaining data processed, then stop)
    coord.podDeleted("ns_app_1")
    assert(!q.isActive)
    val delivered = spark.read.parquet(out.resolve("ns_app_1").toString).count()
    assert(delivered == 2L)
    // a second delete is a no-op
    coord.podDeleted("ns_app_1")
  }
}
