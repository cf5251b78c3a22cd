package graft.streaming

import java.net.{StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.ByteBuffer
import java.nio.channels.SocketChannel
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AdminServerSpec extends AnyFunSuite with SparkTestBase {

  private def currentUser = System.getProperty("user.name")

  private def connectAndSend(path: java.nio.file.Path, cmd: String): String = {
    val ch = SocketChannel.open(StandardProtocolFamily.UNIX)
    try {
      ch.connect(UnixDomainSocketAddress.of(path))
      ch.write(ByteBuffer.wrap((cmd + "\n").getBytes(StandardCharsets.UTF_8)))
      val buf = ByteBuffer.allocate(65536)
      val sb = new StringBuilder
      var done = false
      while (!done) {
        buf.clear()
        val n = ch.read(buf)
        if (n < 0) done = true
        else {
          sb.append(new String(buf.array(), 0, n, StandardCharsets.UTF_8))
          if (sb.indexOf("\n") >= 0) done = true
        }
      }
      sb.toString.trim
    } finally ch.close()
  }

  test("status and stop commands over the unix socket; unknown command answered") {
    val sock = Files.createTempDirectory("graft-admin").resolve("admin.sock")
    val mgr = new PipelineManager(spark)
    val srv = new AdminServer(mgr, new StatusReporter(mgr), sock, Set(currentUser))
    srv.start()
    try {
      val status = connectAndSend(sock, "status")
      assert(status.contains("\"numPipelines\":0"), status)
      assert(connectAndSend(sock, "bogus").startsWith("error: unknown command"))
      assert(connectAndSend(sock, "stop") == "done")
    } finally srv.close()
  }

  test("status surfaces per-store maintenance lease and intent state over the socket") {
    val sock = Files.createTempDirectory("graft-admin-mnt").resolve("admin.sock")
    val store = Files.createTempDirectory("graft-admin-store").toString + "/idx"
    val mgr = new PipelineManager(spark)
    val srv = new AdminServer(mgr,
      new StatusReporter(mgr, spark = Some(spark),
        storeRoots = () => Seq("ivf-pipe" -> store)),
      sock, Set(currentUser))
    srv.start()
    try {
      // idle store: the section exists, no lease, no intents
      val idle = connectAndSend(sock, "status")
      assert(idle.contains("\"maintenance\":{\"ivf-pipe\":{\"lease\":false,\"intents\":0}}"),
        idle)
      // a maintenance op holds the lease: status names the op and holder
      val token = MaintenanceLease.acquire(spark, store, op = "compact")
      try {
        val held = connectAndSend(sock, "status")
        assert(held.contains("\"lease\":true") && held.contains("\"op\":\"compact\""),
          held)
        assert(held.contains("\"acquiredAtMs\":") && held.contains("\"host\":"), held)
      } finally MaintenanceLease.release(spark, store, token)
      // an in-flight epoch write shows as a live intent
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(store), spark.sessionState.newHadoopConf())
      fs.create(new org.apache.hadoop.fs.Path(store + ".EPOCH_WRITE-w1"), false)
        .close()
      try {
        val writing = connectAndSend(sock, "status")
        assert(writing.contains("\"lease\":false,\"intents\":1"), writing)
      } finally fs.delete(
        new org.apache.hadoop.fs.Path(store + ".EPOCH_WRITE-w1"), false)
      // cleared: back to idle
      assert(connectAndSend(sock, "status")
        .contains("\"ivf-pipe\":{\"lease\":false,\"intents\":0}"))
    } finally srv.close()
  }

  test("stop drains a live pipeline before acknowledging") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Long]
    val q = input.toDF().writeStream.format("noop")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    val sock = Files.createTempDirectory("graft-admin2").resolve("admin.sock")
    val mgr = new PipelineManager(spark)
    mgr.adopt("p1", q)
    val srv = new AdminServer(mgr, new StatusReporter(mgr), sock, Set(currentUser))
    srv.start()
    try {
      input.addData(1L, 2L, 3L)
      assert(connectAndSend(sock, "stop") == "done")
      assert(!q.isActive, "pipeline must be stopped after admin stop")
    } finally { srv.close(); if (q.isActive) q.stop() }
  }

  test("a peer not on the allow-list is refused without a response") {
    val sock = Files.createTempDirectory("graft-admin3").resolve("admin.sock")
    val mgr = new PipelineManager(spark)
    val srv = new AdminServer(mgr, new StatusReporter(mgr), sock, Set("nobody-else"))
    srv.start()
    try {
      val ch = SocketChannel.open(StandardProtocolFamily.UNIX)
      try {
        ch.connect(UnixDomainSocketAddress.of(sock))
        val buf = ByteBuffer.allocate(256)
        // server closes without writing: depending on who wins the race
        // the client sees a clean EOF, a connection reset on read, or its
        // OWN write failing with EPIPE (server already closed before the
        // command arrived) — all are the same refusal contract: ZERO
        // response bytes ever reach the client
        val outcome =
          try {
            ch.write(ByteBuffer.wrap("status\n".getBytes(StandardCharsets.UTF_8)))
            ch.read(buf)
          } catch { case _: java.io.IOException => -1 }
        assert(outcome == -1 && buf.position() == 0,
          "expected silent refusal (no response bytes)")
      } finally ch.close()
    } finally srv.close()
  }
}
