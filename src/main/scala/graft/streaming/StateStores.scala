package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming state-store provider selection — the knob that decides where
  * stateful operators (dedup-within-watermark, sessionization, funnels,
  * stream-stream as-of state) keep their per-key state.
  *
  * Spark's default `HDFSBackedStateStoreProvider` holds every key IN HEAP
  * and snapshots to the checkpoint — fine while the keyed state is
  * executor-heap-sized, but at 100-TB key domains (per-user sessions over
  * a large id space, dedup digests over an unbounded stream) heap state is
  * the first thing that falls over: GC pressure scales with resident keys
  * and an executor OOM loses the store. `RocksDBStateStoreProvider` keeps
  * state off-heap on local disk with incremental checkpointing — resident
  * keys stop being a heap liability. That is the recommended provider for
  * any standing pipeline whose key domain is not provably bounded small
  * (see ARCHITECTURE.md); the default stays Spark's, so small-state
  * pipelines pay no RocksDB setup cost unless they opt in.
  *
  * The provider is read from the session's conf WHEN A QUERY STARTS and
  * pinned into that query's checkpoint lineage — [[withProvider]] scopes
  * the setting to one `start()` call and restores the session afterwards.
  */
object StateStores {

  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Spark-bundled providers by short name (both ship in spark-sql;
    * rocksdbjni is on the distribution classpath). */
  val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  val HdfsBacked =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  /** "rocksdb" | "hdfs"/"memory"/"default" | a fully-qualified provider
    * class name. */
  def resolve(spec: String): String = spec.trim.toLowerCase match {
    case "rocksdb" => RocksDb
    case "hdfs" | "memory" | "default" => HdfsBacked
    case _ => spec.trim
  }

  /** Start a streaming query under `provider`, restoring the session's
    * prior provider setting afterwards. Safe to scope this way: the
    * stream execution clones the session state synchronously inside
    * `start()`, so the restored value cannot leak into the started query,
    * and queries started later see the session's own setting again. */
  def withProvider[Q <: StreamingQuery](spark: SparkSession,
      provider: Option[String])(start: => Q): Q = provider match {
    case None => start
    case Some(p) =>
      val prior = spark.conf.getOption(ProviderKey)
      spark.conf.set(ProviderKey, resolve(p))
      try start
      finally prior match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
  }
}
