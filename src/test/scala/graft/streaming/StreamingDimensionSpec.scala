package graft.streaming

import java.io.File
import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.ScdMerge

class StreamingDimensionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private def snap(rows: (Long, Double)*): DataFrame =
    rows.toSeq.toDF("id", "bal")
      .withColumn("valid_from", lit(ts("2020-01-01")))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("version", lit(1L))

  private def tmp(): String =
    Files.createTempDirectory("graft-dim").resolve("snapshot").toString

  test("at-rest fold equals sequential in-memory merges") {
    val dir = tmp()
    val f1 = Seq((1L, 11.0), (2L, 20.0)).toDF("id", "bal")
    val f2 = Seq((1L, 12.0), (2L, 21.0)).toDF("id", "bal")
    StreamingDimension.init(snap(1L -> 10.0, 2L -> 20.0), dir)
    StreamingDimension.applyEpoch(f1, dir, "id", Seq("bal"), lit(ts("2024-06-01")))
    StreamingDimension.applyEpoch(f2, dir, "id", Seq("bal"), lit(ts("2024-07-01")))
    val atRest = StreamingDimension.snapshot(spark, dir)

    val mem1 = ScdMerge.merge(snap(1L -> 10.0, 2L -> 20.0), f1,
      "id", Seq("bal"), lit(ts("2024-06-01"))).drop("change_status")
    val mem2 = ScdMerge.merge(mem1, f2, "id", Seq("bal"), lit(ts("2024-07-01")))
    assert(atRest.except(mem2).count() == 0 && mem2.except(atRest).count() == 0)
    // id 1 changed twice: versions 1..3, one open row
    assert(atRest.filter($"id" === 1L).count() == 3)
    assert(atRest.filter($"id" === 1L && $"valid_to".isNull).count() == 1)
  }

  test("recover finishes a swap crashed between delete and rename") {
    val dir = tmp()
    StreamingDimension.init(snap(1L -> 10.0), dir)
    StreamingDimension.applyEpoch(Seq((1L, 11.0)).toDF("id", "bal"),
      dir, "id", Seq("bal"), lit(ts("2024-06-01")))
    // simulate the crash window: complete staging sibling, dir deleted
    val staging = new File(dir + ".merging")
    val dirF = new File(dir)
    org.apache.commons.io.FileUtils.copyDirectory(dirF, staging)
    org.apache.commons.io.FileUtils.deleteDirectory(dirF)
    // any entry point recovers the committed state
    val recovered = StreamingDimension.snapshot(spark, dir)
    val open = recovered.filter($"valid_to".isNull).select("bal")
      .as[Double].collect().toSeq
    assert(open == Seq(11.0))
    assert(!staging.exists())
  }

  test("applyEpochEvolved widens the at-rest snapshot mid-fold") {
    // epoch 1 on the original schema; epoch 2's feed added `tier` and
    // dropped `region` — the standing fold must widen the snapshot in
    // place, NULL-fill history, and carry the dropped column forward
    val dir = tmp()
    val current = Seq((1L, 10.0, "eu"), (2L, 20.0, "us"))
      .toDF("id", "bal", "region")
      .withColumn("valid_from", lit(ts("2020-01-01")))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("version", lit(1L))
    StreamingDimension.init(current, dir)
    StreamingDimension.applyEpoch(Seq((1L, 11.0, "eu"), (2L, 20.0, "us"))
        .toDF("id", "bal", "region"),
      dir, "id", Seq("bal"), lit(ts("2024-06-01")))
    StreamingDimension.applyEpochEvolved(
      Seq((1L, 12.0, "gold"), (2L, 20.0, "silver")).toDF("id", "bal", "tier"),
      dir, "id", Seq("bal"), lit(ts("2024-07-01")))
    val out = StreamingDimension.snapshot(spark, dir)
      .orderBy("id", "version")
      .select("id", "bal", "region", "tier", "version", "change_status")
      .as[(Long, Double, Option[String], Option[String], Long, String)]
      .collect().toSeq
    assert(out == Seq(
      (1L, 10.0, Some("eu"), None, 1L, "history"),
      (1L, 11.0, Some("eu"), None, 2L, "closed"),
      (1L, 12.0, Some("eu"), Some("gold"), 3L, "updated"), // region carried
      (2L, 20.0, Some("us"), None, 1L, "unchanged")))      // untouched: no tier
  }
}
