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
