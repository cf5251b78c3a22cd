package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-13 verdict #2: single-maintenance-writer must be ENFORCED, not
  * prose — a concurrent epoch write during a maintenance swap is rejected
  * loudly, a second maintenance writer cannot take the lease, a stale
  * lease from a crashed run breaks instead of bricking the store, and a
  * zombie run whose lease was broken aborts at the FENCE (pre-commit),
  * never after its staging became authoritative. */
class MaintenanceLeaseSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def mkVec(i: Long): Seq[Float] =
    (0 until 4).map(j => (math.sin(i * 31 + j * 7) + 2.0).toFloat)

  /** A small live IVF store (centroids + one epoch). */
  private def freshIvf(): String = {
    val path = Files.createTempDirectory("graft-lease-ivf").toString + "/idx"
    val cents = (0 until 4)
      .map(i => (i, mkVec(i * 10))).toDF("centroid_id", "centroid_vec")
    StreamingIvf.init(cents, path)
    StreamingIvf.appendEpoch(
      (0L until 20L).map(i => (i, mkVec(i))).toDF("vec_id", "embedding"),
      path, 0L)
    path
  }

  test("epoch writes refuse while a live maintenance lease is held") {
    val path = freshIvf()
    val token = MaintenanceLease.acquire(spark, path)
    try {
      val batch = Seq((100L, mkVec(100))).toDF("vec_id", "embedding")
      val e1 = intercept[IllegalStateException] {
        StreamingIvf.appendEpoch(batch, path, 1L)
      }
      assert(e1.getMessage.contains("maintenance"),
        s"refusal must say why: ${e1.getMessage}")
      val e2 = intercept[IllegalStateException] {
        StreamingIvf.deleteEpoch(Seq(3L).toDF("vec_id"), path, 0L)
      }
      assert(e2.getMessage.contains("maintenance"))
      // a SECOND maintenance writer cannot take the held lease either
      intercept[IllegalStateException] { MaintenanceLease.acquire(spark, path) }
    } finally MaintenanceLease.release(spark, path, token)
    // released: writes flow again
    StreamingIvf.appendEpoch(
      Seq((100L, mkVec(100))).toDF("vec_id", "embedding"), path, 1L)
    assert(spark.read.parquet(s"$path/corpus").count() == 21)
  }

  test("a stale lease (crashed maintenance run) breaks instead of bricking the store") {
    val path = freshIvf()
    MaintenanceLease.acquire(spark, path) // crashed holder: never released
    spark.conf.set(MaintenanceLease.TtlConfKey, "-1") // everything is stale
    try {
      // an epoch writer breaks the stale lease and proceeds
      StreamingIvf.appendEpoch(
        Seq((100L, mkVec(100))).toDF("vec_id", "embedding"), path, 1L)
      assert(spark.read.parquet(s"$path/corpus").count() == 21)
      assert(!org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), spark.sessionState.newHadoopConf())
        .exists(MaintenanceLease.leasePath(path)),
        "the broken stale lease must be gone")
      // a maintenance writer can also take over a stale lease
      MaintenanceLease.acquire(spark, path)
      spark.conf.set(MaintenanceLease.TtlConfKey,
        MaintenanceLease.DefaultTtlMillis.toString)
      // ... and with a LIVE ttl the takeover lease now blocks writers again
      intercept[IllegalStateException] {
        StreamingIvf.deleteEpoch(Seq(3L).toDF("vec_id"), path, 0L)
      }
    } finally spark.conf.unset(MaintenanceLease.TtlConfKey)
  }

  test("a zombie maintenance run fenced out by a lease takeover aborts PRE-commit") {
    val path = freshIvf()
    val before = spark.read.parquet(s"$path/corpus")
      .select("vec_id").as[Long].collect().sorted.toSeq
    val zombieToken = MaintenanceLease.acquire(spark, path)
    // a new writer breaks the (presumed-stale) lease and takes over
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sessionState.newHadoopConf())
    fs.delete(MaintenanceLease.leasePath(path), false)
    val newToken = MaintenanceLease.acquire(spark, path)
    try {
      // the zombie reaches its commit point — the fence throws BEFORE the
      // marker, so its staging never becomes authoritative
      val corpusDir = s"$path/corpus"
      intercept[IllegalStateException] {
        StateCompaction.compactWith(spark, corpusDir,
          () => MaintenanceLease.verifyHeld(spark, path, zombieToken)) { staging =>
          spark.read.parquet(corpusDir).drop("epoch")
            .write.mode("overwrite").partitionBy("cell")
            .parquet(s"$staging/epoch=-1")
        }
      }
      assert(!fs.exists(new Path(corpusDir + ".compacting.COMMITTED")),
        "the fence must fire before the commit marker exists")
      // live store untouched; the aborted staging is garbage the next
      // (legitimate) compact clears
      assert(spark.read.parquet(corpusDir)
        .select("vec_id").as[Long].collect().sorted.toSeq == before)
    } finally MaintenanceLease.release(spark, path, newToken)
    StreamingIvf.compact(spark, path)
    assert(!fs.exists(new Path(s"$path/corpus.compacting")))
    assert(spark.read.parquet(s"$path/corpus")
      .select("vec_id").as[Long].collect().sorted.toSeq == before,
      "the legitimate compact folds the same rows")
  }

  test("the lease protocol is object-store legal: create/read/delete only, no rename/append") {
    val localRoot = Files.createTempDirectory("lease-s3mock").toString
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3mock.impl", classOf[S3SemanticsMockFs].getName)
    hc.set("fs.s3mock.root", localRoot)
    hc.setBoolean("fs.s3mock.impl.disable.cache", true)
    try {
      val root = "s3mock://bucket/stores/idx"
      // the mock THROWS on rename/append — a green lifecycle is a
      // structural proof the lease needs neither
      val token = MaintenanceLease.acquire(spark, root)
      intercept[Exception] { MaintenanceLease.acquire(spark, root) }
      MaintenanceLease.verifyHeld(spark, root, token)
      intercept[IllegalStateException] {
        MaintenanceLease.guardEpochWrite(spark, root)
      }
      MaintenanceLease.release(spark, root, token)
      MaintenanceLease.guardEpochWrite(spark, root) // free again
      // fence semantics survive the object store: a takeover fences the
      // old token out
      val t1 = MaintenanceLease.acquire(spark, root)
      org.apache.hadoop.fs.FileSystem.get(new java.net.URI(root),
          spark.sessionState.newHadoopConf())
        .delete(MaintenanceLease.leasePath(root), false)
      val t2 = MaintenanceLease.acquire(spark, root)
      intercept[IllegalStateException] {
        MaintenanceLease.verifyHeld(spark, root, t1)
      }
      MaintenanceLease.verifyHeld(spark, root, t2)
      MaintenanceLease.release(spark, root, t2)
    } finally {
      hc.unset("fs.s3mock.impl")
      hc.unset("fs.s3mock.root")
    }
  }

  test("maintenance ops hold the lease for their duration and release on exit, even on failure") {
    val path = freshIvf()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sessionState.newHadoopConf())
    StreamingIvf.compact(spark, path)
    assert(!fs.exists(MaintenanceLease.leasePath(path)),
      "compact must release its lease on success")
    // a failing refit still releases in finally: a centroids-only store
    // (no corpus ever appended) makes the staging read throw INSIDE the
    // leased section
    val bare = Files.createTempDirectory("graft-lease-bare").toString + "/idx"
    val cents = (0 until 4)
      .map(i => (i, mkVec(i * 10))).toDF("centroid_id", "centroid_vec")
    StreamingIvf.init(cents, bare)
    intercept[Exception] { StreamingIvf.refit(spark, bare, cents) }
    assert(!fs.exists(MaintenanceLease.leasePath(bare)),
      "a failing maintenance op must not leave its lease behind")
  }
}
