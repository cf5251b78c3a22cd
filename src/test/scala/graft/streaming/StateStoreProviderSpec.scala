package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model.PipelineConfig
import graft.streaming.EventAnalytics.Ev

/** RocksDB state store as a SUPPORTED configuration: a stateful standing
  * pipeline (the w3-family flatMapGroupsWithState sessionizer) runs under
  * `RocksDBStateStoreProvider` and produces the same sessions the in-heap
  * default does — plus the config plumbing (PipelineConfig properties key,
  * short-name resolution, session-conf restore). The 100-TB stance this
  * pins: the provider is a per-pipeline config, not a hand-edit, so an
  * unbounded-key-domain pipeline can opt out of heap-resident state. */
class StateStoreProviderSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("resolve maps short names to Spark's bundled providers") {
    assert(StateStores.resolve("rocksdb") == StateStores.RocksDb)
    assert(StateStores.resolve("ROCKSDB") == StateStores.RocksDb)
    assert(StateStores.resolve("default") == StateStores.HdfsBacked)
    assert(StateStores.resolve("hdfs") == StateStores.HdfsBacked)
    assert(StateStores.resolve("com.example.MyProvider") == "com.example.MyProvider")
  }

  test("processor.stateStoreProvider flows from properties to PipelineConfig") {
    val cfg = PipelineConfig.fromProperties(
      """logName=ssp
        |logDir=/tmp/ssp
        |processor.stateStoreProvider=rocksdb
        |""".stripMargin)
    assert(cfg.stateStoreProvider.contains("rocksdb"))
    assert(PipelineConfig.fromProperties("logName=x\nlogDir=/tmp/x\n")
      .stateStoreProvider.isEmpty)
  }

  test("withProvider scopes the session conf to one start() and restores it") {
    val key = StateStores.ProviderKey
    val prior = spark.conf.getOption(key)
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    var seenAtStart: Option[String] = None
    val q = StateStores.withProvider(spark, Some("rocksdb")) {
      seenAtStart = spark.conf.getOption(key)
      input.toDS().writeStream.outputMode("append").format("noop")
        .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    }
    try {
      assert(seenAtStart.contains(StateStores.RocksDb))
      assert(spark.conf.getOption(key) == prior) // restored after start()
    } finally q.stop()
  }

  test("sessionize under RocksDB matches the in-heap default and engages RocksDB") {
    implicit val sq = spark.sqlContext

    def run(provider: Option[String]): (Set[(Long, Long, Double)], Boolean) = {
      val input = MemoryStream[Ev]
      val name = s"ss_${provider.isDefined}"
      val q = StateStores.withProvider(spark, provider) {
        EventAnalytics.sessionize(input.toDS(), gapMs = 5 * 60 * 1000,
            watermark = "1 minute")
          .writeStream.outputMode("append").format("memory").queryName(name)
          .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
      }
      try {
        input.addData(
          Ev(1, ts(1), "click", 1.0), Ev(1, ts(3), "view", 2.0),
          Ev(2, ts(2), "click", 5.0))
        q.processAllAvailable()
        // a >gap jump closes user 1's first session; far event closes all
        input.addData(Ev(1, ts(20), "click", 1.5))
        q.processAllAvailable()
        input.addData(Ev(9, ts(59), "click", 0.0))
        q.processAllAvailable()
        val rows = spark.table(name)
          .select("user_id", "n_events", "total_value")
          .as[(Long, Long, Double)].collect().toSet
        // provider engagement: RocksDB surfaces rocksdb* custom metrics in
        // the state operator's progress; the in-heap default never does
        val metrics = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
          .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
        (rows, metrics.exists(_.toLowerCase.contains("rocksdb")))
      } finally q.stop()
    }

    val (rocksRows, rocksEngaged) = run(Some("rocksdb"))
    val (heapRows, heapEngaged) = run(None)
    assert(rocksEngaged, "RocksDB provider did not engage (no rocksdb metrics)")
    assert(!heapEngaged)
    assert(rocksRows == heapRows)
    assert(rocksRows.contains((1L, 2L, 3.0))) // user 1's closed first session
  }
}
