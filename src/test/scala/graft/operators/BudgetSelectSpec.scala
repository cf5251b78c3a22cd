package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BudgetSelectSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val rows: Seq[(Long, Long, Double)] = Seq(
    (1L, 100L, 0.9), (2L, 50L, 0.95), (3L, 200L, 0.5),
    (4L, 10L, 0.95), (5L, 80L, 0.7), (6L, 40L, 0.5))

  /** Brute-force reference: sort (q desc, id asc), exclusive prefix sum
    * over ALL docs, selected iff cum + n <= budget. */
  private def reference(budget: Long): Map[Long, (Long, Long, Boolean)] = {
    val ordered = rows.sortBy { case (id, _, q) => (-q, id) }
    var cum = 0L
    ordered.map { case (id, n, _) =>
      val r = id -> (n, cum, cum + n <= budget)
      cum += n
      r
    }.toMap
  }

  private def run(budget: Long, parts: Int = 0): Map[Long, (Long, Long, Boolean)] =
    Sampling.selectUnderTokenBudget(
        rows.toDF("doc_id", "n", "q").repartition(5), budget,
        col("q"), col("n"), numPartitions = parts)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap

  test("prefix selection matches the brute-force definition") {
    for (budget <- Seq(0L, 59L, 60L, 61L, 150L, 240L, 480L, 1000L))
      assert(run(budget) === reference(budget), s"budget=$budget")
  }

  test("quality ties break by ascending id") {
    // docs 2 and 4 share q=0.95: doc 2 (smaller id) fills first
    val got = run(55L)
    assert(got(2L) === ((50L, 0L, true)))
    assert(got(4L) === ((10L, 50L, false)))
  }

  test("an overflowing doc kills everything after it (no backfill)") {
    // order: 2(50) 4(10) 1(100) 5(80) 3(200) 6(40); budget 170 fits
    // 2+4+1=160, then 5 overflows (160+80) — 6 (40 tokens) would fit a
    // knapsack but prefix semantics drop it too
    val got = run(170L)
    assert(got.filter(_._2._3).keySet === Set(1L, 2L, 4L))
  }

  test("result is invariant to input partitioning") {
    assert(run(150L, parts = 1) === run(150L, parts = 7))
  }

  test("exactSplit: exact floor counts per stratum, deterministic order") {
    val df = (for (g <- Seq("a", "b"); i <- 1 to 10)
      yield (g, (if (g == "a") i else 100 + i).toLong)).toDF("lang", "doc_id")
    val got = Sampling.exactSplit(df.repartition(5), Seq("lang"),
        col("doc_id"), Seq(("train", 80), ("val", 10), ("test", 10)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // 10 rows per stratum under 80/10/10 -> exactly 8/1/1, no hash luck
    for (g <- Seq("a", "b")) {
      val counts = got.filter(_._1 == g).groupBy(_._3).view.mapValues(_.length).toMap
      assert(counts === Map("train" -> 8, "val" -> 1, "test" -> 1), s"stratum $g")
    }
    // brute-force label check: rank by (md5(id), id) within stratum
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (g <- Seq("a", "b")) {
      val ids = got.filter(_._1 == g).map(_._2).sortBy(id => (md5hex(id.toString), id))
      val expect = ids.zipWithIndex.map { case (id, i) =>
        id -> (if (i < 8) "train" else if (i == 8) "val" else "test") }.toMap
      got.filter(_._1 == g).foreach { case (_, id, sp) =>
        assert(sp === expect(id), s"doc $id") }
    }
    // determinism under partitioning
    val again = Sampling.exactSplit(df.repartition(2), Seq("lang"),
        col("doc_id"), Seq(("train", 80), ("val", 10), ("test", 10)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.sortBy(_._2).toSeq === again.sortBy(_._2).toSeq)
  }

  test("exactSplit: tiny strata still get the tail splits via the remainder rule") {
    val df = Seq(("z", 1L), ("z", 2L), ("z", 3L)).toDF("lang", "doc_id")
    val got = Sampling.exactSplit(df, Seq("lang"), col("doc_id"),
        Seq(("train", 80), ("val", 10), ("test", 10)))
      .collect().map(r => r.getString(2)).groupBy(identity).view.mapValues(_.length).toMap
    // n=3: boundaries floor(2.4)=2, floor(2.7)=2 -> 2 train, 0 val, 1 test
    assert(got === Map("train" -> 2, "test" -> 1))
  }
}
