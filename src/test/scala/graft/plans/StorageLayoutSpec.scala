package graft.plans

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** At-rest layout techniques for the 100 TB path, pinned at the PLAN level:
  *
  *  - BUCKETED TABLES: both sides of a recurring join written
  *    `bucketBy(n, key)` join with NO shuffle exchange — the co-located
  *    join. At 100 TB this converts the dominant repeated cost (full-corpus
  *    exchange per join) into a one-time write-layout decision.
  *  - SORTED WRITE + MIN/MAX SKIPPING: range-partition + sort the corpus on
  *    the filter column before writing parquet; selective scans then skip
  *    whole row groups via footer statistics — the poor-man's clustering
  *    index, no extra system needed.
  *
  * Both are verified against real written files, not just plan strings for
  * the negative case: results must equal the layout-free plan's.
  */
class StorageLayoutSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def plannedString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed co-located join plans with zero shuffle exchanges") {
    val left = (0L until 2000L).map(i => (i % 97, i)).toDF("k", "a")
    val right = (0L until 500L).map(i => (i % 97, i * 3)).toDF("k", "b")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("g_buck_l")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("g_buck_r")
    try {
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the SMJ path
        "spark.sql.adaptive.enabled" -> "false") {      // stable plan string
        val bucketed = spark.table("g_buck_l")
          .join(spark.table("g_buck_r"), "k")
          .groupBy("k").agg(count(lit(1)).as("n"), sum($"a" + $"b").as("s"))
        val plan = plannedString(bucketed)
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle:\n$plan")
        // and the bucketing must not have changed the answer
        val flat = left.join(right, "k")
          .groupBy("k").agg(count(lit(1)).as("n"), sum($"a" + $"b").as("s"))
        assert(bucketed.collect().sortBy(_.getLong(0)).toSeq ==
          flat.collect().sortBy(_.getLong(0)).toSeq)
        // sanity: the same join over plain parquet relations DOES exchange
        assert(plannedString(left.join(right, "k")).contains("Exchange"))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_buck_l")
      spark.sql("DROP TABLE IF EXISTS g_buck_r")
    }
  }

  test("sorted write enables min/max row-group skipping on selective scans") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val n = 80000L
    (0L until n).map(i => (i, s"payload-$i")).toDF("k", "v")
      .repartitionByRange(8, $"k").sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val q = spark.read.parquet(dir).filter($"k" >= 1000L && $"k" < 1100L)
      assert(q.count() == 100L)
      q.collect()
      val scan = q.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }.flatMap(_.collect { case f: FileSourceScanExec => f }).head
      // footer min/max stats must have skipped non-matching row groups: the
      // scan emits a small fraction of the corpus, not all 80k rows
      val rows = scan.metrics("numOutputRows").value
      assert(rows <= n / 4, s"expected row-group skipping, scan emitted $rows of $n")
      // the same filter over an UNSORTED layout cannot skip (interleaved
      // keys put matches in every row group)
      val shuffled = java.nio.file.Files.createTempDirectory("graft-layout-un").toString
      (0L until n).map(i => ((i * 48271) % n, s"payload-$i")).toDF("k", "v")
        .repartition(8)
        .write.mode("overwrite").parquet(shuffled)
      val q2 = spark.read.parquet(shuffled).filter($"k" >= 1000L && $"k" < 1100L)
      q2.collect()
      val scan2 = q2.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }.flatMap(_.collect { case f: FileSourceScanExec => f }).head
      assert(scan2.metrics("numOutputRows").value > rows,
        "unsorted layout should read strictly more rows than the sorted one")
    }
  }

  test("dynamic partition pruning: the dim filter prunes fact partitions at runtime") {
    // the date-partitioned-fact ⋈ filtered-dim shape every backfill/
    // incremental job runs: the fact side must scan ONLY the partitions
    // the dim filter selects, discovered at RUNTIME from the broadcast
    // side (no literal date list in the query). At 100 TB this is the
    // difference between reading 5 days and reading the whole table.
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val n = 20000
    (0 until n).map(i => (i.toLong, i % 50)).toDF("v", "day")
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    // two traps pinned here: the dim must be a REAL scan (a LocalRelation
    // dim constant-folds its filter away and DPP sees no selective
    // predicate), and the filter must be a recognized selective SHAPE —
    // a bare boolean attribute is not in isLikelySelective's pattern
    // list, an equality is
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    (0 until 50).map(i => (i, i % 10)).toDF("d_day", "grp")
      .write.mode("overwrite").parquet(dimDir)
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val q = spark.read.parquet(dir)
        .join(spark.read.parquet(dimDir).filter($"grp" === 0), $"day" === $"d_day")
        .select($"v", $"day")
      q.collect()
      val factScan = q.queryExecution.executedPlan
        .collect { case f: FileSourceScanExec => f }
        .find(_.output.exists(_.name == "v")).get
      assert(factScan.partitionFilters.mkString(",").contains("dynamicpruning"),
        s"fact scan has no runtime pruning filter: ${factScan.partitionFilters}")
      // 5 active days × 400 rows — a scan of 20000 means pruning never ran
      assert(factScan.metrics("numOutputRows").value == n / 10,
        s"expected ${n / 10} scanned rows, got ${factScan.metrics("numOutputRows").value}")
    }
  }

  test("zorder2 is a bijective Morton interleave (scala-mirror + injectivity)") {
    import graft.functions.HashFunctions
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val pts = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val got = pts.toDF("x", "y")
      .select($"x", $"y", HashFunctions.zorder2($"x", $"y", bits = 6).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == morton(x, y, 6), s"($x,$y)") }
    // bijective on the 6-bit grid: 4096 distinct keys covering 0..4095
    val keys = got.map(_._3).toSet
    assert(keys.size == 4096 && keys.min == 0L && keys.max == 4095L)
  }

  test("z-order layout skips row groups on BOTH filter dimensions") {
    import graft.functions.HashFunctions
    val n = 256 * 256
    val grid = (for { x <- 0 until 256; y <- 0 until 256 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def scanned(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }.flatMap(_.collect { case f: FileSourceScanExec => f })
        .head.metrics("numOutputRows").value
    }
    withConf("spark.sql.adaptive.enabled" -> "false") {
      // zkey-sorted layout: ~64 files, each a ~32x32-aligned grid region →
      // a selective filter on EITHER column prunes most files via footer
      // min/max on that column
      val zdir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
      grid.withColumn("zkey", HashFunctions.zorder2($"x", $"y", bits = 8))
        .repartitionByRange(64, $"zkey").sortWithinPartitions("zkey")
        .write.mode("overwrite").parquet(zdir)
      val zx = scanned(spark.read.parquet(zdir).filter($"x" < 16))
      val zy = scanned(spark.read.parquet(zdir).filter($"y" < 16))
      assert(zx <= n / 4, s"z-order should skip on x: scanned $zx of $n")
      assert(zy <= n / 4, s"z-order should skip on y: scanned $zy of $n")
      // single-column sort: skips on its lead column but reads EVERYTHING
      // for the other dimension — the contrast that motivates z-order
      val xdir = java.nio.file.Files.createTempDirectory("graft-xsort").toString
      grid.repartitionByRange(64, $"x").sortWithinPartitions("x")
        .write.mode("overwrite").parquet(xdir)
      assert(scanned(spark.read.parquet(xdir).filter($"x" < 16)) <= n / 4)
      assert(scanned(spark.read.parquet(xdir).filter($"y" < 16)) > zy,
        "x-sorted layout cannot skip on y; z-order must read strictly less")
    }
  }
}
