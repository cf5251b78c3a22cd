package graft.streaming

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Single-maintenance-writer enforcement for the standing stores — the
  * structural form of the "run ONLY while the pipeline is stopped" prose
  * every maintenance op carries. The reference enforces its equivalent
  * invariant structurally (one processor owns a stream's watermark,
  * processor/DefaultLogStreamProcessor.java:650-657); here the invariant
  * is "one maintenance writer per store, and no epoch writes while one
  * runs", held by a LEASE FILE that lives as a SIBLING of the store root
  * (`<root>.MAINTENANCE_LEASE`) so a whole-root swap ([[StreamingIvf
  * .refit]], [[StreamingBm25.compact]]) can never delete its own lock
  * mid-swap.
  *
  * Protocol:
  *  - a maintenance op [[acquire]]s the lease at entry — atomic exclusive
  *    create (`FileSystem.create(overwrite=false)`), so two concurrent
  *    maintenance runs cannot both hold it — and [[release]]s it in a
  *    `finally`;
  *  - `appendEpoch`/`deleteEpoch` call [[guardEpochWrite]] first and
  *    REFUSE (throw) while a live lease is held — the lost-epoch
  *    interleaving (an epoch write racing a directory swap) becomes a
  *    loud error instead of silent data loss;
  *  - a lease older than [[ttlMillis]] is STALE (the holder crashed
  *    without a `finally`): both maintenance and epoch writers may break
  *    it and proceed, so a crashed run never bricks the store;
  *  - breaking a stale lease is safe because the swap is FENCED: the
  *    lease file records a per-run token, and [[StateCompaction
  *    .compactWith]] re-checks it (via the `fence` hook) immediately
  *    before the commit marker — a zombie maintenance run whose lease was
  *    broken aborts BEFORE its staging becomes authoritative, never
  *    after.
  *
  * Object-store semantics: the protocol uses only create/open/list/
  * delete — no rename, no append (spec-pinned over the S3-semantics
  * mock FS). On HDFS/local, `create(overwrite=false)` is atomic and the
  * lease is a true mutex; on eventually-exclusive stores (S3A's create
  * is HEAD-then-PUT), acquire is BEST-EFFORT — two racers could both
  * believe they hold it — and the commit-point FENCE is the
  * authoritative guard: whichever racer's token survives in the lease
  * object wins, the other aborts pre-commit. Data-destroying races are
  * prevented by the fence on every store; the lease upgrades that to
  * fail-fast where the filesystem can express it.
  */
object MaintenanceLease {

  /** Lease age beyond which the holder is presumed crashed. Overridable
    * per session for long maintenance windows (a 100-TB compact sets it
    * above its expected runtime) and for specs. */
  val TtlConfKey = "spark.graft.maintenanceLeaseTtlMs"
  val DefaultTtlMillis: Long = 6L * 60 * 60 * 1000 // 6 h

  def leasePath(root: String): Path =
    new Path(root.stripSuffix("/") + ".MAINTENANCE_LEASE")

  private def fs(spark: SparkSession, root: String): FileSystem =
    FileSystem.get(new URI(root), spark.sessionState.newHadoopConf())

  private def ttlMillis(spark: SparkSession): Long =
    spark.conf.getOption(TtlConfKey).map(_.toLong).getOrElse(DefaultTtlMillis)

  private def ageMillis(f: FileSystem, p: Path): Long =
    System.currentTimeMillis() - f.getFileStatus(p).getModificationTime

  private def readToken(f: FileSystem, p: Path): Option[String] =
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }

  /** Take the lease (atomic exclusive create). Throws while a LIVE lease
    * is held by another run; breaks a stale one. Returns the fencing
    * token to pass to [[verifyHeld]] / [[release]]. */
  def acquire(spark: SparkSession, root: String): String = {
    val f = fs(spark, root)
    val p = leasePath(root)
    if (f.exists(p)) {
      val age = try ageMillis(f, p) catch {
        case _: java.io.FileNotFoundException => Long.MaxValue // released under us
      }
      if (age <= ttlMillis(spark))
        throw new IllegalStateException(
          s"maintenance already in progress on $root (lease $p is ${age} ms old, " +
            s"ttl ${ttlMillis(spark)} ms); run one maintenance op at a time, or " +
            s"raise/clear the lease if the holder is known dead")
      f.delete(p, false) // stale — the holder crashed; break and take over
    }
    val token = java.util.UUID.randomUUID().toString
    // overwrite=false: if a concurrent acquirer won the race after the
    // exists() check, this throws (FileAlreadyExists) — loud, never shared
    val out = f.create(p, false)
    try out.write(token.getBytes("UTF-8")) finally out.close()
    token
  }

  /** The fence: throw unless the lease still carries OUR token — called
    * by the swap immediately before the commit marker, so a zombie run
    * whose stale lease was broken aborts pre-commit. */
  def verifyHeld(spark: SparkSession, root: String, token: String): Unit = {
    val held = readToken(fs(spark, root), leasePath(root))
    if (!held.contains(token))
      throw new IllegalStateException(
        s"maintenance lease on $root lost before commit (held=$held, " +
          s"mine=$token): another writer broke a stale lease and fenced " +
          "this run out; aborting without committing")
  }

  /** Drop the lease iff it is still ours (a broken-and-retaken lease
    * belongs to the new holder and is left alone). */
  def release(spark: SparkSession, root: String, token: String): Unit = {
    val f = fs(spark, root)
    val p = leasePath(root)
    if (readToken(f, p).contains(token)) { f.delete(p, false); () }
  }

  /** Epoch-writer guard (`appendEpoch`/`deleteEpoch`): refuse while a
    * live maintenance lease is held; break a stale one (the fence
    * protects the store from the zombie), then FINISH any torn swap the
    * crashed run left (`recoverDirs` — the directories this writer is
    * about to append under), so the new epoch can never land in a
    * directory a deferred recover would replace. */
  def guardEpochWrite(spark: SparkSession, root: String,
      recoverDirs: Seq[String] = Nil): Unit = {
    val f = fs(spark, root)
    val p = leasePath(root)
    if (f.exists(p)) {
      val age = try ageMillis(f, p) catch {
        case _: java.io.FileNotFoundException => Long.MaxValue
      }
      if (age <= ttlMillis(spark))
        throw new IllegalStateException(
          s"store $root is under maintenance (lease $p, ${age} ms old): " +
            "epoch writes during a maintenance swap can be lost; stop the " +
            "maintenance op or wait for it to finish")
      f.delete(p, false)
    }
    recoverDirs.foreach(d => StateCompaction.recover(spark, d))
  }

  /** Run `body` under the lease; `body` receives the FENCE thunk to pass
    * to [[StateCompaction.compactWith]]/[[StateCompaction.compact]]. */
  def withLease[T](spark: SparkSession, root: String)(body: (() => Unit) => T): T = {
    val token = acquire(spark, root)
    try body(() => verifyHeld(spark, root, token))
    finally release(spark, root, token)
  }
}
