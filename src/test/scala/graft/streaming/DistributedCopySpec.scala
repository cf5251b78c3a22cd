package graft.streaming

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-15 verdict #2: snapshot/restore bytes must move cluster-parallel
  * (the DistCp shape), never through one driver JVM — and the copy must
  * be byte-faithful, layout-faithful (empty directories included), and
  * loud on a size mismatch. */
class DistributedCopySpec extends AnyFunSuite with SparkTestBase {

  private def write(p: Path, bytes: Array[Byte]): Unit = {
    Files.createDirectories(p.getParent)
    Files.write(p, bytes)
    ()
  }

  test("copyTree preserves nested layout, empty dirs, zero-byte and large files, byte-for-byte") {
    val src = Files.createTempDirectory("graft-dcp-src")
    val dst = Files.createTempDirectory("graft-dcp-dst").resolve("out")
    write(src.resolve("a.bin"), Array.tabulate(100000)(i => (i % 251).toByte))
    write(src.resolve("sub/b.txt"), "hello".getBytes)
    write(src.resolve("sub/deep/c.bin"), Array.emptyByteArray) // zero-byte
    Files.createDirectories(src.resolve("emptydir"))
    val n = DistributedCopy.copyTree(spark, src.toString, dst.toString)
    assert(n == 3L, "three files copied")
    assert(Files.isDirectory(dst.resolve("emptydir")),
      "empty directories are part of the layout contract")
    Seq("a.bin", "sub/b.txt", "sub/deep/c.bin").foreach { rel =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(src.resolve(rel)), Files.readAllBytes(dst.resolve(rel))),
        s"byte mismatch at $rel")
    }
  }

  test("copyTree of a missing source refuses loudly; an empty tree copies zero files") {
    intercept[IllegalArgumentException] {
      DistributedCopy.copyTree(spark, "/no/such/graft/tree",
        Files.createTempDirectory("graft-dcp-x").toString)
    }
    val empty = Files.createTempDirectory("graft-dcp-empty")
    val out = Files.createTempDirectory("graft-dcp-eout").resolve("o")
    assert(DistributedCopy.copyTree(spark, empty.toString, out.toString) == 0L)
    assert(Files.isDirectory(out), "the destination root is still created")
  }
}
