package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** LIVE kubelet binding for [[PodMetadataSource]] — the transport half the
  * seam previously left open. The reference polls the kubelet `/pods`
  * endpoint and resolves each item's pod DIRECTORY name from
  * `metadata.{namespace,name,uid}` (kubernetes/KubeService.java:307-345);
  * both halves are plain HTTP + JSON, so the JDK's HttpClient and the
  * Jackson already on Spark's classpath cover them with no extra jar.
  *
  * Parity points mirrored exactly:
  *  - URL selection (KubeService.java:510-523): `http://localhost:<port>
  *    /pods` by default; HTTPS uses `HOST_IP` when set (newer kubelets
  *    serve TLS with the node IP in the certificate SANs, so localhost
  *    does not verify), falling back to localhost with a warning.
  *  - Directory-name coexistence (KubeService.java:501-508): prefer
  *    `namespace_podname` IF that directory already exists under the pod
  *    log root, else `namespace_podname_uid`.
  *  - A bad response throws — [[PodDiscovery]]'s poll-skip contract then
  *    keeps the last-known-good active set (stale beats a spurious
  *    mass-delete), which is also the reference's failure stance.
  *  - Service-account bearer token header when provided
  *    (KubeService.java:344 `serviceAccountTokenHeaderMap`).
  *
  * TLS note: the secure path uses the JDK default trust store; the
  * reference's custom-CA `SSLContext` hook is the one piece deliberately
  * left to deployment config rather than re-implemented.
  */
class KubeletPodsSource(
    podLogDir: String,
    kubeletPort: Int = 10255,
    useSecureConnection: Boolean = false,
    serviceAccountToken: Option[String] = None,
    timeout: Duration = Duration.ofSeconds(10)) extends PodMetadataSource {

  private val client = HttpClient.newBuilder().connectTimeout(timeout).build()

  def kubeMdUrl: String =
    if (useSecureConnection) {
      val hostIp = Option(System.getenv("HOST_IP")).filter(_.nonEmpty)
      s"https://${hostIp.getOrElse("localhost")}:$kubeletPort/pods"
    } else s"http://localhost:$kubeletPort/pods"

  override def activePods(): Set[String] =
    KubeletPodsSource.parsePodList(fetchJson(), podLogDir)

  private[streaming] def fetchJson(): String = {
    val builder = HttpRequest.newBuilder(URI.create(kubeMdUrl))
      .timeout(timeout).GET()
    serviceAccountToken.foreach(t =>
      builder.header("Authorization", s"Bearer $t"))
    val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"kubelet /pods returned HTTP ${resp.statusCode()}")
    resp.body()
  }
}

object KubeletPodsSource {

  /** `items[].metadata.{namespace,name,uid}` → pod directory names, with
    * the reference's two-format coexistence rule. Malformed JSON or a
    * missing metadata field THROWS (the caller's poll-skip keeps the
    * stale active set); an absent/empty `items` array is a valid empty
    * node, not an error — exactly `getPodListFromKubelet`'s null check. */
  def parsePodList(json: String, podLogDir: String): Set[String] = {
    val root = new ObjectMapper().readTree(json)
    require(root != null && root.isObject, "kubelet /pods body is not a JSON object")
    val items = root.get("items")
    if (items == null || !items.isArray) Set.empty
    else {
      val out = Set.newBuilder[String]
      items.forEach { item =>
        val md = item.get("metadata")
        require(md != null, "pod item missing metadata")
        // each field must be PRESENT and TEXTUAL: a missing node would NPE
        // on asText(), a non-text node would asText() to "" and silently
        // build a malformed directory name (review finding)
        def text(field: String): String = {
          require(md.hasNonNull(field) && md.get(field).isTextual,
            s"pod item metadata.$field missing or not a string")
          md.get(field).asText()
        }
        out += podDirectoryName(podLogDir, text("namespace"), text("name"),
          text("uid"))
      }
      out.result()
    }
  }

  /** KubeService.java:501-508 verbatim semantics: the short form wins iff
    * its directory already exists. */
  def podDirectoryName(dir: String, namespace: String, podName: String,
      uid: String): String = {
    val short = s"${namespace}_$podName"
    if (Files.exists(Paths.get(dir, short))) short
    else s"${namespace}_${podName}_$uid"
  }
}
