package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.StreamingHeavyHitters.foldGroup

class StreamingHeavyHittersSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def counts(entries: Seq[HHEntry]) =
    entries.map(e => e.item -> (e.count, e.err)).toMap

  test("capacity >= distinct items makes the sketch exact") {
    val arr = Seq((1L, 3L), (2L, 1L), (3L, 5L), (1L, 2L))
    val out = counts(foldGroup(Nil, arr, capacity = 10))
    assert(out == Map(1L -> (5L, 0L), 2L -> (1L, 0L), 3L -> (5L, 0L)))
  }

  test("over capacity: counts overestimate by at most err, never under") {
    // true counts: item i appears (i % 7) + 1 times, items 0..19, cap 5
    val stream = (0L until 20L).flatMap(i => Seq.fill((i % 7).toInt + 1)((i, 1L)))
    val truth = stream.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val sketch = counts(foldGroup(Nil, stream, capacity = 5))
    assert(sketch.size == 5)
    sketch.foreach { case (item, (c, e)) =>
      assert(c >= truth(item), s"undercount for $item")
      assert(c - e <= truth(item), s"error bound broken for $item: $c-$e vs ${truth(item)}")
    }
  }

  test("any item with true count above the min sketch count is present") {
    // one dominant item among noise
    val stream = Seq.fill(50)((99L, 1L)) ++ (0L until 30L).map(i => (i, 1L))
    val sketch = counts(foldGroup(Nil, stream, capacity = 4))
    assert(sketch.contains(99L) && sketch(99L)._1 >= 50L)
  }

  test("eviction tie breaks toward the largest item id, deterministically") {
    // items 1,2,3 all count 1, cap 3; arrival of 9 must evict item 3
    val base = foldGroup(Nil, Seq((1L, 1L), (2L, 1L), (3L, 1L)), capacity = 3)
    val out = counts(foldGroup(base, Seq((9L, 1L)), capacity = 3))
    assert(!out.contains(3L) && out.contains(1L) && out.contains(2L))
    assert(out(9L) == (2L, 1L)) // inherits evicted count 1 as error
  }

  test("epoch fold equals one-shot fold (cross-epoch carry) when exact") {
    val all = (0L until 40L).flatMap(i => Seq.fill((i % 5).toInt + 1)((i, 1L)))
    val oneShot = counts(foldGroup(Nil, all, capacity = 100))
    val (e1, e2) = all.splitAt(all.size / 2)
    val chained = counts(foldGroup(
      foldGroup(Nil, e1.sortBy(_._1), 100), e2.sortBy(_._1), 100))
    assert(oneShot == chained)
  }

  test("streaming Update-mode sketch matches the pure fold per trigger") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[HHRow]
    val out = StreamingHeavyHitters.sketchStream(input.toDS(), capacity = 3)
      .map { case (g, e) => (g, e.item, e.count, e.err) }
      .toDF("group", "item", "count", "err")
    val name = s"hh_out_${System.nanoTime()}"
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName(name).trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      input.addData(HHRow("a", 1L, 2L), HHRow("a", 2L, 1L), HHRow("b", 7L, 4L))
      q.processAllAvailable()
      input.addData(HHRow("a", 1L, 1L), HHRow("a", 3L, 1L), HHRow("a", 4L, 9L))
      q.processAllAvailable()
      // latest snapshot for group a = the second trigger's emission
      val rows = spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val expected = foldGroup(
        foldGroup(Nil, Seq((1L, 2L), (2L, 1L)), 3),
        Seq((1L, 1L), (3L, 1L), (4L, 9L)), 3)
        .map(e => ("a", e.item, e.count, e.err)).toSet
      // the memory sink holds ALL updates; the final group-a state must
      // appear, and group b's single-trigger sketch too
      assert(expected.subsetOf(rows.toSet), s"missing: ${expected -- rows.toSet}")
      assert(rows.contains(("b", 7L, 4L, 0L)))
    } finally q.stop()
  }
}
