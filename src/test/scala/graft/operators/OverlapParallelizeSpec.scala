package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class OverlapParallelizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("Overlap.chains returns results in task order and runs them all") {
    val out = Overlap.chains(() => 1, () => 2, () => 3)
    assert(out == Seq(1, 2, 3))
  }

  test("Overlap.chains propagates the first failure after joining all chains") {
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[IllegalStateException] {
      Overlap.chains[Any](
        () => { Thread.sleep(50); done.incrementAndGet() },
        () => throw new IllegalStateException("chain failed"))
    }
    assert(e.getMessage == "chain failed")
    // the surviving chain was joined, not abandoned
    assert(done.get() == 1)
  }

  test("Overlap.chains runs real Spark jobs from several driver threads") {
    val sums = Overlap.chains(
      () => spark.range(1000).agg(sum("id")).head().getLong(0),
      () => spark.range(2000).agg(sum("id")).head().getLong(0))
    assert(sums == Seq(499500L, 1999000L))
  }

  test("fanIfNarrow fans a narrow scan-rooted frame to session parallelism") {
    val dir = Files.createTempDirectory("graft-fan").toString
    (0 until 100).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
    val fanned = Parallelize.fanIfNarrow(scan)
    // the fan is a round-robin repartition to defaultParallelism
    assert(fanned.queryExecution.analyzed ne scan.queryExecution.analyzed)
    assert(fanned.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // narrow ops above the scan keep the fan decision (still scan-rooted)
    val projected = Parallelize.fanIfNarrow(
      scan.select(col("doc_id"), lower(col("text")).as("t")))
    assert(projected.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("fanIfNarrow leaves derived (post-shuffle) frames alone") {
    val dir = Files.createTempDirectory("graft-fan2").toString
    (0 until 100).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
    val derived = scan.groupBy("text").agg(count(lit(1)).as("n"))
    // a post-shuffle frame's parallelism is the shuffle's to decide:
    // fanIfNarrow must return it UNCHANGED (no extra repartition, and —
    // the round-17 advice fix — no AQE pre-execution via Dataset.rdd)
    assert(Parallelize.fanIfNarrow(derived) eq derived)
    val joined = scan.join(scan.select(col("doc_id")), Seq("doc_id"))
    assert(Parallelize.fanIfNarrow(joined) eq joined)
  }

  test("fanIfNarrow probes narrowness without running any Spark job") {
    val dir = Files.createTempDirectory("graft-fan3").toString
    (0 until 100).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
    val sc = spark.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    Parallelize.fanIfNarrow(scan) // plan-side decision only
    Parallelize.fanIfNarrow(scan.groupBy("text").count()) // derived: bail
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after == before,
      "the narrowness probe must not submit jobs (the old Dataset.rdd " +
        "probe forced AQE to execute upstream stages and discard them)")
  }

  test("bounded probe collect fails loudly past the configured row cap") {
    val key = graft.functions.ProbeCollect.MaxRowsKey
    spark.conf.set(key, "8")
    try {
      val big = spark.range(9).select(col("id"), lit("t").as("term"))
      val e = intercept[IllegalArgumentException] {
        graft.functions.ProbeCollect.collectBounded(big, "SpecProbe")
      }
      assert(e.getMessage.contains(key))
      assert(e.getMessage.contains("SpecProbe"))
      // at the cap: passes and returns every row
      val ok = graft.functions.ProbeCollect.collectBounded(
        spark.range(8).toDF("id"), "SpecProbe")
      assert(ok.length == 8)
    } finally spark.conf.unset(key)
  }

  test("an over-cap query table fails Bm25.topK loudly, not with a driver OOM") {
    val key = graft.functions.ProbeCollect.MaxRowsKey
    spark.conf.set(key, "4")
    try {
      val docs = Seq((0L, "spark hash window"), (1L, "join scan sort"))
        .toDF("doc_id", "text")
      val queries = (0L until 10L).map(i => (i, s"term$i spark"))
        .toDF("query_id", "text")
      val e = intercept[IllegalArgumentException] {
        Bm25.topK(docs, queries, k = 2)
      }
      assert(e.getMessage.contains("Bm25.topK"))
    } finally spark.conf.unset(key)
  }
}
