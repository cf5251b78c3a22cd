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

  test("asofBackwardTolerance nulls out matches beyond the tolerance, keeps the rest") {
    val events = Seq(
      (1L, 10L, "fresh"),   // snap at t=8: age 2, within
      (1L, 50L, "stale"),   // latest snap t=20: age 30, beyond
      (2L, 9L, "none")      // no snaps
    ).toDF("uid", "ets", "ename")
    val snapshots = Seq(
      (1L, 8L, 100L, "v8"), (1L, 20L, 101L, "v20")).toDF("suid", "sts", "sid", "sval")
    val out = Joins.asofBackwardTolerance(events, snapshots,
        leftKey = col("uid"), rightKey = col("suid"),
        leftTime = col("ets"), rightTime = col("sts"),
        rightId = col("sid"), rightCols = Seq("sval", "sts"),
        within = col("ets") - col("sts") <= 10L)
      .select("ename", "sval").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("fresh") == "v8")   // age 2 <= 10 survives
    assert(out("stale") == null)   // matched v20 but age 30 nulled out
    assert(out("none") == null)    // no-match nulls untouched
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

  test("AQE splits skewed shuffle partitions in sort-merge joins") {
    // the automatic complement to saltedJoin: at run time AQE detects a
    // shuffle partition dominated by one hot key and splits it across
    // tasks (OptimizeSkewedJoin), so un-salted plans survive moderate skew
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // AQE has its own runtime broadcast threshold; pin it off too or the
      // tiny dim side turns the SMJ into a broadcast join mid-flight
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8192")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying ~6 MB, everything else tiny
      val left = (0L until 60000L)
        .map(i => (if (i % 10 < 9) 0L else i % 50, s"payload-$i-" + "x" * 80))
        .toDF("k", "v")
      val small = (0L until 50L).map(i => (i, s"dim-$i")).toDF("k", "name")
      val j = left.join(small, "k")
      assert(j.count() == 60000L)
      j.collect()
      // the final adaptive plan nests inside QueryStageExec leaves that
      // TreeNode.collect does not descend into — assert on its rendering
      val finalPlan = j.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      }.mkString("\n")
      assert(finalPlan.contains("(skew=true)"),
        s"expected OptimizeSkewedJoin to mark the join skewed:\n$finalPlan")
      assert(finalPlan.contains("AQEShuffleRead coalesced and skewed"),
        s"expected the hot partition split across skewed reads:\n$finalPlan")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
