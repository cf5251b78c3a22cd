package graft

/** JVM-wide serialization point for every operator that temporarily
  * rewrites SESSION-GLOBAL SQL conf (shuffle width / AQE) around a bounded
  * small-regime loop and restores it after — currently
  * [[graft.operators.Dedup.duplicateClusters]]'s cluster loop and
  * [[graft.streaming.StreamingCuration]]'s fold-scoped width.
  *
  * One shared REENTRANT lock (not one per call site): two different scoped
  * sites interleaving snapshot/restore on the same session would otherwise
  * "restore" each other's scoped values permanently, and a site deciding
  * WHETHER to scope by reading the session width could mistake another
  * site's temporarily-shrunk width for the real one (review finding). Both
  * hazards need the read-decide-snapshot-mutate-restore sequence of every
  * site to be mutually exclusive, which a single lock guarantees.
  *
  * Holding the lock for a fold's full duration is deliberate: the confs
  * are session-global, so two scoped regions genuinely cannot overlap
  * correctly. At real corpus scale the scoped branch is never taken (the
  * guards only shrink width in the bounded-tiny regime), so this never
  * serializes TB-scale work.
  */
object ScopedSessionConf {
  val lock = new java.util.concurrent.locks.ReentrantLock()

  /** Apply `settings` in order; if ANY set throws, first restore every key
    * already mutated to its `snapshot` value (best-effort — a restore
    * failure is suppressed onto the original throwable) and then rethrow.
    * Without this, a throw on the second set of a multi-key scope (e.g.
    * shuffle width applied, AQE set rejects) would leave the session
    * permanently mis-sized — the exact leak the scoped-conf discipline
    * exists to eliminate (review finding). Call with [[lock]] HELD; this
    * helper mutates conf but never touches the lock. */
  def setAllOrRestore(conf: org.apache.spark.sql.RuntimeConfig,
      settings: Seq[(String, String)], snapshot: Map[String, String]): Unit = {
    var applied = List.empty[String]
    try settings.foreach { case (k, v) => conf.set(k, v); applied ::= k }
    catch {
      case t: Throwable =>
        applied.foreach { k =>
          try snapshot.get(k).foreach(conf.set(k, _))
          catch { case r: Throwable => t.addSuppressed(r) }
        }
        throw t
    }
  }

  /** Restore every `(key, value)` best-effort, then ALWAYS release
    * [[lock]] — the throw-safe mirror of [[setAllOrRestore]] for the
    * restore side: a plain `conf.set; conf.set; unlock` finally block
    * skips the later sets AND leaks the shared lock permanently if the
    * first set throws (review finding). The first restore failure
    * rethrows after the unlock; further failures are suppressed onto it.
    * Call with [[lock]] HELD. */
  def restoreAllAndUnlock(conf: org.apache.spark.sql.RuntimeConfig,
      settings: Seq[(String, String)]): Unit = {
    var first: Throwable = null
    settings.foreach { case (k, v) =>
      try conf.set(k, v)
      catch {
        case t: Throwable =>
          if (first == null) first = t else first.addSuppressed(t)
      }
    }
    lock.unlock()
    if (first != null) throw first
  }
}
