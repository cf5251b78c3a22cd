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

  // ---- round-14 verdict #1: the WRITE-SIDE half of the race — an epoch
  // write already in flight when maintenance starts must lose LOUDLY on
  // one side or the other, never silently, in EVERY interleaving.

  test("maintenance acquire refuses while an epoch write intent is in flight") {
    val path = freshIvf()
    val batch = Seq((200L, mkVec(200))).toDF("vec_id", "embedding")
    // the write publishes its intent, then maintenance tries to start
    // mid-write: acquire must refuse (write-starts-first ordering)
    var acquireRefused = false
    MaintenanceLease.withEpochWriteIntent(spark, path) {
      val e = intercept[IllegalStateException] {
        MaintenanceLease.acquire(spark, path)
      }
      acquireRefused = e.getMessage.contains("in flight")
      batch.write.mode("overwrite").parquet(s"$path/corpus/epoch=7")
    }
    assert(acquireRefused, "acquire must name the in-flight write")
    // intent cleared on exit: maintenance proceeds now
    val t = MaintenanceLease.acquire(spark, path)
    MaintenanceLease.release(spark, path, t)
  }

  test("an epoch write whose intent was broken mid-write FAILS loudly, never silently") {
    val path = freshIvf()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sessionState.newHadoopConf())
    // simulate the only way a lease can appear mid-write: the write's
    // intent marker is broken as TTL-stale (or an object store's create
    // raced), then maintenance acquires — the write's post-write check
    // must throw so the stream retries the batch instead of
    // checkpointing bytes the maintenance promote may erase
    val e = intercept[IllegalStateException] {
      MaintenanceLease.withEpochWriteIntent(spark, path) {
        Seq((201L, mkVec(201))).toDF("vec_id", "embedding")
          .write.mode("overwrite").parquet(s"$path/corpus/epoch=8")
        // mid-write: break this write's intent, then take the lease
        MaintenanceLease.liveIntents(spark, path)
          .foreach(p => fs.delete(p, false))
        MaintenanceLease.acquire(spark, path)
      }
    }
    assert(e.getMessage.contains("DURING"),
      s"the failure must say the write raced maintenance: ${e.getMessage}")
    // the failure left no intent marker behind (finally cleanup)
    assert(MaintenanceLease.liveIntents(spark, path).isEmpty)
  }

  test("the commit fence refuses when a write intent appeared since staging began") {
    val path = freshIvf()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sessionState.newHadoopConf())
    val before = spark.read.parquet(s"$path/corpus")
      .select("vec_id").as[Long].collect().sorted.toSeq
    val corpusDir = s"$path/corpus"
    intercept[IllegalStateException] {
      MaintenanceLease.withLease(spark, path) { fence =>
        StateCompaction.compactWith(spark, corpusDir, fence) { staging =>
          spark.read.parquet(corpusDir).drop("epoch")
            .write.mode("overwrite").partitionBy("cell")
            .parquet(s"$staging/epoch=-1")
          // a writer slips in after the staging read (an S3-weak create
          // or a broken lease): publish its intent by hand
          fs.create(new Path(path + ".EPOCH_WRITE-racer"), false).close()
        }
      }
    }
    assert(!fs.exists(new Path(corpusDir + ".compacting.COMMITTED")),
      "the intent-aware fence must fire before the commit marker")
    assert(spark.read.parquet(corpusDir)
      .select("vec_id").as[Long].collect().sorted.toSeq == before,
      "the aborted staging must never become authoritative")
    fs.delete(new Path(path + ".EPOCH_WRITE-racer"), false)
    assert(!fs.exists(MaintenanceLease.leasePath(path)),
      "the aborted maintenance run must still release its lease")
  }

  test("an epoch write whose marker was broken AND whose racer already released still fails loudly") {
    // the round-15 advisory shape: maintenance breaks the marker as
    // stale, acquires, compacts, promotes and RELEASES entirely inside
    // the write's window — the final lease check sees nothing, so the
    // marker's absence must be the tell
    val path = freshIvf()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sessionState.newHadoopConf())
    val e = intercept[IllegalStateException] {
      MaintenanceLease.withEpochWriteIntent(spark, path) {
        Seq((202L, mkVec(202))).toDF("vec_id", "embedding")
          .write.mode("overwrite").parquet(s"$path/corpus/epoch=9")
        // the racer broke the marker, did its work, and is GONE (no lease)
        MaintenanceLease.liveIntents(spark, path)
          .foreach(p => fs.delete(p, false))
      }
    }
    assert(e.getMessage.contains("broken mid-write"),
      s"the marker's absence alone must fail the batch: ${e.getMessage}")
  }

  test("a status poll is a PURE read: stale intents survive it and are broken by the next acquire") {
    val path = freshIvf()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sessionState.newHadoopConf())
    fs.create(new Path(path + ".EPOCH_WRITE-stalepoll"), false).close()
    spark.conf.set(MaintenanceLease.IntentTtlConfKey, "-1") // everything stale
    try {
      // the status plane's read: stale markers are EXCLUDED but NOT deleted
      assert(MaintenanceLease.liveIntents(spark, path, breakStale = false).isEmpty)
      assert(fs.exists(new Path(path + ".EPOCH_WRITE-stalepoll")),
        "a monitoring poll must never mutate coordination state")
      // acquire (a coordination actor) breaks it
      val t = MaintenanceLease.acquire(spark, path)
      assert(!fs.exists(new Path(path + ".EPOCH_WRITE-stalepoll")))
      MaintenanceLease.release(spark, path, t)
    } finally spark.conf.unset(MaintenanceLease.IntentTtlConfKey)
  }

  test("a slow epoch write under a tiny intent TTL survives because marker renewal outruns it") {
    val path = freshIvf()
    spark.conf.set(MaintenanceLease.IntentTtlConfKey, "600") // renews every ~200 ms
    try {
      // > 2x the TTL: unrenewed, this marker would read stale and any
      // acquire would break it and destroy the write
      MaintenanceLease.withEpochWriteIntent(spark, path) {
        Thread.sleep(1500)
        // mid-write, the marker still reads LIVE: maintenance refuses
        val e = intercept[IllegalStateException] {
          MaintenanceLease.acquire(spark, path)
        }
        assert(e.getMessage.contains("in flight"))
        Seq((203L, mkVec(203))).toDF("vec_id", "embedding")
          .write.mode("overwrite").parquet(s"$path/corpus/epoch=10")
      }
      // ... while a KILLED writer's marker (no renewal thread) still
      // breaks by TTL, so maintenance is never blocked forever
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), spark.sessionState.newHadoopConf())
      fs.create(new Path(path + ".EPOCH_WRITE-killed"), false).close()
      Thread.sleep(700)
      val t = MaintenanceLease.acquire(spark, path) // breaks the stale marker
      assert(!fs.exists(new Path(path + ".EPOCH_WRITE-killed")))
      MaintenanceLease.release(spark, path, t)
    } finally spark.conf.unset(MaintenanceLease.IntentTtlConfKey)
  }

  test("a stale intent (crashed epoch writer) breaks instead of blocking maintenance forever") {
    val path = freshIvf()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sessionState.newHadoopConf())
    fs.create(new Path(path + ".EPOCH_WRITE-crashed"), false).close()
    spark.conf.set(MaintenanceLease.IntentTtlConfKey, "-1") // everything stale
    try {
      val t = MaintenanceLease.acquire(spark, path) // breaks the stale intent
      assert(!fs.exists(new Path(path + ".EPOCH_WRITE-crashed")),
        "the broken stale intent must be gone")
      MaintenanceLease.release(spark, path, t)
    } finally spark.conf.unset(MaintenanceLease.IntentTtlConfKey)
  }

  // ---- round-14 verdict #2: long maintenance renews its lease instead
  // of gambling on a raised TTL.

  test("a slow maintenance op under a tiny TTL survives because renewal outruns it") {
    val path = freshIvf()
    spark.conf.set(MaintenanceLease.TtlConfKey, "1000") // renews every ~333 ms
    try {
      MaintenanceLease.withLease(spark, path) { fence =>
        Thread.sleep(2500) // > 2x the TTL: unrenewed, this lease is long stale
        // still held: an epoch writer must refuse (the lease never went stale)
        intercept[IllegalStateException] {
          StreamingIvf.deleteEpoch(Seq(3L).toDF("vec_id"), path, 0L)
        }
        fence() // and the fence still passes — the token never changed
      }
      // ... while a KILLED holder (no renewal thread) still breaks by TTL
      MaintenanceLease.acquire(spark, path) // never released, never renewed
      Thread.sleep(1200)
      StreamingIvf.appendEpoch( // breaks the stale lease and proceeds
        Seq((300L, mkVec(300))).toDF("vec_id", "embedding"), path, 9L)
      assert(spark.read.parquet(s"$path/corpus")
        .filter($"vec_id" === 300L).count() == 1)
    } finally spark.conf.unset(MaintenanceLease.TtlConfKey)
  }

  test("the lease records its op and age for the status plane") {
    val path = freshIvf()
    assert(MaintenanceLease.status(spark, path).isEmpty)
    val t = MaintenanceLease.acquire(spark, path, op = "compact")
    try {
      val st = MaintenanceLease.status(spark, path).get
      assert(st.op == "compact" && st.token == t)
      assert(st.acquiredAtMs > 0 && st.renewedAgeMs >= 0)
      assert(st.host.nonEmpty)
    } finally MaintenanceLease.release(spark, path, t)
    assert(MaintenanceLease.status(spark, path).isEmpty)
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
