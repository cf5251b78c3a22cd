package graft.streaming

import java.io.IOException
import java.net.{StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.ByteBuffer
import java.nio.channels.{ClosedChannelException, ServerSocketChannel, SocketChannel}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Local admin command endpoint over a UNIX domain socket — the engine's
  * twin of the reference's `admin/AdminServer.java:43-164`: a root-of-trust
  * control channel for host tooling (drain before deploy, status probes)
  * that never touches the network, with peer identity checked through the
  * kernel's SO_PEERCRED instead of any application auth.
  *
  * Differences from the reference, by design:
  *  - pure JDK (JEP 380 `StandardProtocolFamily.UNIX` +
  *    `jdk.net.ExtendedSocketOptions.SO_PEERCRED`) — the reference needs
  *    the junixsocket native library for the same two features;
  *  - `status` is served in addition to `stop` (the reference exposes
  *    status via a separate Ostrich HTTP port; here StatusReporter already
  *    renders the heartbeat JSON, so the socket serves both).
  *
  * One daemon accept thread; command protocol is newline-delimited text,
  * one response line per command, unknown commands answered with
  * `error: ...` rather than a dropped connection (an operator typo should
  * not look like a dead server). A peer whose user is not allow-listed is
  * closed without a byte written, matching the reference's silent refusal.
  */
class AdminServer(mgr: PipelineManager, status: StatusReporter,
    socketPath: Path, allowedUsers: Set[String],
    onStopped: () => Unit = () => ()) {

  private val address = UnixDomainSocketAddress.of(socketPath)
  @volatile private var server: ServerSocketChannel = _
  @volatile private var thread: Thread = _

  def start(): Unit = synchronized {
    require(server == null, "already started")
    Files.deleteIfExists(socketPath)
    server = ServerSocketChannel.open(StandardProtocolFamily.UNIX)
    server.bind(address)
    thread = new Thread(() => acceptLoop(), "graft-admin")
    thread.setDaemon(true)
    thread.start()
  }

  private def acceptLoop(): Unit =
    try {
      while (server.isOpen) {
        val ch = server.accept()
        try serve(ch)
        catch { case _: IOException => () }
        finally ch.close()
      }
    } catch { case _: ClosedChannelException | _: IOException => () }

  private def peerUser(ch: SocketChannel): String =
    ch.getOption(jdk.net.ExtendedSocketOptions.SO_PEERCRED).user().getName

  private def serve(ch: SocketChannel): Unit = {
    if (!allowedUsers.contains(peerUser(ch))) return // silent refusal
    val buf = ByteBuffer.allocate(4096)
    val sb = new StringBuilder
    var open = true
    while (open) {
      buf.clear()
      val n = ch.read(buf)
      if (n < 0) open = false
      else {
        sb.append(new String(buf.array(), 0, n, StandardCharsets.UTF_8))
        var idx = sb.indexOf("\n")
        while (idx >= 0) {
          val line = sb.substring(0, idx).trim
          sb.delete(0, idx + 1)
          if (line.nonEmpty) respond(ch, line)
          idx = sb.indexOf("\n")
        }
      }
    }
  }

  private def respond(ch: SocketChannel, command: String): Unit = {
    var stopped = false
    val reply = command match {
      case "stop" =>
        // reference semantics: drain every stream (in-flight work finishes),
        // then acknowledge
        mgr.active.keys.toSeq.sorted.foreach(mgr.drain)
        mgr.stopAll()
        stopped = true
        "done"
      case "status" => status.statusJson()
      case other => s"error: unknown command '$other'"
    }
    ch.write(ByteBuffer.wrap((reply + "\n").getBytes(StandardCharsets.UTF_8)))
    // fire the lifecycle hook only AFTER the ack is flushed: the agent's
    // main may tear the JVM down on it, and the client must never see an
    // empty response to an honored stop
    if (stopped) onStopped()
  }

  def close(): Unit = synchronized {
    if (server != null) {
      server.close()
      Files.deleteIfExists(socketPath)
      server = null
    }
  }
}
