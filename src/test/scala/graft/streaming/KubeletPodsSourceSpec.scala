package graft.streaming

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

/** Live kubelet binding: PodList JSON parsing with the reference's
  * directory-name coexistence rule, and the actual HTTP transport against
  * a local server — the previously-open half of the PodMetadataSource
  * seam (pure JDK HTTP + classpath Jackson, no client jar). */
class KubeletPodsSourceSpec extends AnyFunSuite {

  // the public kubelet /pods (PodList v1) shape — authored here, two pods
  private def podListJson = """{
    "kind": "PodList", "apiVersion": "v1",
    "items": [
      {"metadata": {"name": "web-abc", "namespace": "default",
        "uid": "11111111-1111-1111-1111-111111111111"},
       "status": {"phase": "Running"}},
      {"metadata": {"name": "job-xyz", "namespace": "batch",
        "uid": "22222222-2222-2222-2222-222222222222"},
       "status": {"phase": "Running"}}
    ]}"""

  test("parsePodList applies the two-format directory coexistence rule") {
    val dir = Files.createTempDirectory("graft-kubelet").toString
    // default_web-abc exists on disk -> short form wins; batch_job-xyz
    // does not -> uid form
    Files.createDirectories(java.nio.file.Paths.get(dir, "default_web-abc"))
    val pods = KubeletPodsSource.parsePodList(podListJson, dir)
    assert(pods == Set("default_web-abc",
      "batch_job-xyz_22222222-2222-2222-2222-222222222222"))
  }

  test("malformed JSON and missing metadata throw (poll-skip keeps stale set)") {
    val dir = Files.createTempDirectory("graft-kubelet").toString
    intercept[Exception] {
      KubeletPodsSource.parsePodList("""{"items": [{"status": {}}]}""", dir)
    }
    intercept[Exception] {
      KubeletPodsSource.parsePodList("""{"items": [""", dir) // truncated
    }
    // absent items is a valid empty response, not an error
    assert(KubeletPodsSource.parsePodList("""{"kind": "PodList"}""", dir).isEmpty)
  }

  test("missing or non-text metadata fields fail loud, not NPE or malformed names") {
    // round-10 review finding: metadata lacking name used to NPE on
    // asText(), and a NON-TEXT node's asText() returns "" which would
    // silently build a malformed pod directory name
    val dir = Files.createTempDirectory("graft-kubelet").toString
    val missingName =
      """{"items":[{"metadata":{"namespace":"ns","uid":"u-1"}}]}"""
    val e1 = intercept[IllegalArgumentException] {
      KubeletPodsSource.parsePodList(missingName, dir)
    }
    assert(e1.getMessage.contains("metadata.name"), e1.getMessage)
    val numericUid =
      """{"items":[{"metadata":{"namespace":"ns","name":"web","uid":42}}]}"""
    val e2 = intercept[IllegalArgumentException] {
      KubeletPodsSource.parsePodList(numericUid, dir)
    }
    assert(e2.getMessage.contains("metadata.uid"), e2.getMessage)
    val nullNamespace =
      """{"items":[{"metadata":{"namespace":null,"name":"web","uid":"u"}}]}"""
    val e3 = intercept[IllegalArgumentException] {
      KubeletPodsSource.parsePodList(nullNamespace, dir)
    }
    assert(e3.getMessage.contains("metadata.namespace"), e3.getMessage)
  }

  test("fetches over live HTTP with the bearer token header") {
    val dir = Files.createTempDirectory("graft-kubelet").toString
    var seenAuth: Option[String] = None
    val server = HttpServer.create(new InetSocketAddress("localhost", 0), 0)
    server.createContext("/pods", exchange => {
      seenAuth = Option(exchange.getRequestHeaders.getFirst("Authorization"))
      val body = podListJson.getBytes("UTF-8")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.start()
    try {
      val src = new KubeletPodsSource(dir,
        kubeletPort = server.getAddress.getPort,
        serviceAccountToken = Some("tok-123"))
      val pods = src.activePods()
      assert(pods.size == 2 && pods.exists(_.startsWith("batch_job-xyz_")))
      assert(seenAuth.contains("Bearer tok-123"))
    } finally server.stop(0)
  }

  test("a non-200 response throws instead of yielding an empty active set") {
    val dir = Files.createTempDirectory("graft-kubelet").toString
    val server = HttpServer.create(new InetSocketAddress("localhost", 0), 0)
    server.createContext("/pods", exchange => {
      exchange.sendResponseHeaders(500, -1); exchange.close()
    })
    server.start()
    try {
      val src = new KubeletPodsSource(dir, kubeletPort = server.getAddress.getPort)
      intercept[Exception] { src.activePods() }
    } finally server.stop(0)
  }

  test("PodDiscovery keeps the stale active set when the live fetch fails") {
    val dir = Files.createTempDirectory("graft-kubelet-pd")
    Files.createDirectories(dir.resolve("default_web-abc"))
    var fail = false
    val flaky = new PodMetadataSource {
      override def activePods(): Set[String] =
        if (fail) throw new RuntimeException("kubelet down")
        else Set("default_web-abc")
    }
    val pd = new PodDiscovery(dir.toString, flaky)
    pd.scanFileSystem()
    pd.pollMetadata()
    assert(pd.activePodSet == Set("default_web-abc"))
    fail = true
    pd.pollMetadata() // skipped poll, no spurious mass-delete
    assert(pd.activePodSet == Set("default_web-abc"))
  }
}
