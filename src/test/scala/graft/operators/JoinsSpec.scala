package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class JoinsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("asofBackward picks the latest right row at-or-before each left time") {
    val events = Seq(
      (1L, 10L, "e1"), (1L, 25L, "e2"), (1L, 5L, "e0"),
      (2L, 50L, "e3")).toDF("uid", "ets", "ename")
    val snapshots = Seq(
      (1L, 10L, 100L, "v1"), (1L, 20L, 101L, "v2"),   // uid 1: snaps at t=10,20
      (1L, 20L, 102L, "v2b"),                          // tie at t=20: id 102 wins
      (3L, 1L, 103L, "never")).toDF("suid", "sts", "sid", "sval")
    val out = Joins.asofBackward(events, snapshots,
      leftKey = col("uid"), rightKey = col("suid"),
      leftTime = col("ets"), rightTime = col("sts"),
      rightId = col("sid"), rightCols = Seq("sval"))
      .select("ename", "sval").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("e0") == null)   // before any snapshot
    assert(out("e1") == "v1")   // inclusive at equal time
    assert(out("e2") == "v2b")  // latest time wins, tie broken by id
    assert(out("e3") == null)   // no snapshots for uid 2
  }

  test("rangeJoin is pair-equivalent to the naive theta join (incl. multi-bin spans)") {
    val rnd = new scala.util.Random(7)
    // points and intervals across ~40 bins (binWidth 10); interval widths
    // 0..45 so many spans cover multiple bins; keys force the equi half
    val pts = (1 to 300).map(i => (i.toLong, rnd.nextInt(400).toLong, rnd.nextInt(3).toLong))
      .toDF("pid", "p", "k")
    val ivs = (1 to 80).map { i =>
      val s = rnd.nextInt(400).toLong
      (i.toLong, s, s + rnd.nextInt(46), rnd.nextInt(3).toLong)
    }.toDF("iid", "s", "e", "ik")

    val naive = pts.join(ivs,
        col("p") >= col("s") && col("p") <= col("e") && col("k") === col("ik"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = Joins.rangeJoin(pts, ivs, pointCol = "p", startCol = "s",
        endCol = "e", binWidth = 10, leftKeys = Seq("k"), rightKeys = Seq("ik"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
    assert(naive.nonEmpty)
    // exactly-once: no duplicate pairs from the bin replication
    val cnt = Joins.rangeJoin(pts, ivs, "p", "s", "e", 10, Seq("k"), Seq("ik")).count()
    assert(cnt == naive.size)
  }

  test("rangeJoin without keys matches the pure range predicate") {
    val pts = Seq((1L, 5L), (2L, 10L), (3L, 99L)).toDF("pid", "p")
    val ivs = Seq((10L, 0L, 9L), (20L, 10L, 10L), (30L, 50L, 200L)).toDF("iid", "s", "e")
    val got = Joins.rangeJoin(pts, ivs, "p", "s", "e", binWidth = 7)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("saltedJoin is row-equivalent to a plain join") {
    val large = (1L to 1000L).map(i => (i % 7, i)).toDF("k", "v")
    val small = Seq((0L, "a"), (1L, "b"), (3L, "c"), (99L, "zz")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "v", "name").collect().toSet
    val salted = Joins.saltedJoin(large, small, "k", buckets = 8)
      .select("k", "v", "name").collect().toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }
}
