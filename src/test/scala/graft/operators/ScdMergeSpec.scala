package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ScdMergeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private def snapshot(rows: (Long, Double)*): DataFrame =
    rows.toSeq.toDF("id", "bal")
      .withColumn("valid_from", lit(ts("2020-01-01")))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("version", lit(1L))

  test("changed key closes the old row and opens a successor") {
    val out = ScdMerge.merge(snapshot(1L -> 10.0, 2L -> 20.0),
        Seq((1L, 11.0), (2L, 20.0)).toDF("id", "bal"),
        "id", Seq("bal"), lit(ts("2024-06-01")))
      .orderBy("id", "version")
      .select("id", "bal", "version", "change_status")
      .as[(Long, Double, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 10.0, 1L, "closed"),
      (1L, 11.0, 2L, "updated"),
      (2L, 20.0, 1L, "unchanged")))
  }

  test("new keys insert at version 1; absent keys pass through (no deletes)") {
    val out = ScdMerge.merge(snapshot(1L -> 10.0),
        Seq((7L, 70.0)).toDF("id", "bal"),
        "id", Seq("bal"), lit(ts("2024-06-01")))
      .select("id", "bal", "version", "change_status")
      .as[(Long, Double, Long, String)].collect().toSet
    assert(out == Set(
      (1L, 10.0, 1L, "unchanged"),
      (7L, 70.0, 1L, "inserted")))
  }

  test("NULL-to-value and value-to-NULL transitions count as changed") {
    val current = Seq((1L, Option.empty[Double]), (2L, Some(20.0)))
      .toDF("id", "bal")
      .withColumn("valid_from", lit(ts("2020-01-01")))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("version", lit(1L))
    val feed = Seq((1L, Some(5.0)), (2L, Option.empty[Double])).toDF("id", "bal")
    val out = ScdMerge.merge(current, feed, "id", Seq("bal"), lit(ts("2024-06-01")))
      .orderBy("id", "version")
      .select("id", "version", "change_status")
      .as[(Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, "closed"), (1L, 2L, "updated"),
      (2L, 1L, "closed"), (2L, 2L, "updated")))
  }

  test("idempotent: re-applying the same feed changes nothing") {
    val feed = Seq((1L, 11.0), (2L, 20.0)).toDF("id", "bal")
    val once = ScdMerge.merge(snapshot(1L -> 10.0, 2L -> 20.0), feed,
      "id", Seq("bal"), lit(ts("2024-06-01"))).drop("change_status")
    val twice = ScdMerge.merge(once, feed, "id", Seq("bal"), lit(ts("2024-07-01")))
    assert(twice.filter(col("change_status").isin("updated", "inserted", "closed"))
      .count() == 0)
    assert(twice.drop("change_status").except(once).count() == 0 &&
      once.except(twice.drop("change_status")).count() == 0)
  }

  test("two sequential changes chain versions and keep full history") {
    val s0 = snapshot(1L -> 10.0)
    val s1 = ScdMerge.merge(s0, Seq((1L, 11.0)).toDF("id", "bal"),
      "id", Seq("bal"), lit(ts("2024-06-01"))).drop("change_status")
    val s2 = ScdMerge.merge(s1, Seq((1L, 12.0)).toDF("id", "bal"),
      "id", Seq("bal"), lit(ts("2024-07-01")))
    val hist = s2.orderBy("version")
      .select("bal", "version", "change_status")
      .as[(Double, Long, String)].collect().toSeq
    assert(hist == Seq(
      (10.0, 1L, "history"),
      (11.0, 2L, "closed"),
      (12.0, 3L, "updated")))
    // exactly one open row
    assert(s2.filter(col("valid_to").isNull).count() == 1)
  }

  test("mergeEvolved: added column fills only (re)opened rows, dropped column carries forward") {
    // current has (id, bal, region); updates add `tier`, drop `region`
    val current = Seq((1L, 10.0, "eu"), (2L, 20.0, "us"), (3L, 30.0, "ap"))
      .toDF("id", "bal", "region")
      .withColumn("valid_from", lit(ts("2020-01-01")))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("version", lit(1L))
    val updates = Seq((1L, 11.0, "gold"), (2L, 20.0, "silver"), (9L, 90.0, "new"))
      .toDF("id", "bal", "tier")
    val out = ScdMerge.mergeEvolved(current, updates, "id", Seq("bal"),
        lit(ts("2024-06-01")))
      .orderBy("id", "version")
      .select("id", "bal", "region", "tier", "version", "change_status")
      .as[(Long, Double, Option[String], Option[String], Long, String)]
      .collect().toSeq
    assert(out == Seq(
      (1L, 10.0, Some("eu"), None, 1L, "closed"),          // added col: no retro-fill
      (1L, 11.0, Some("eu"), Some("gold"), 2L, "updated"), // dropped col carried forward
      (2L, 20.0, Some("us"), None, 1L, "unchanged"),       // untouched row: no tier
      (3L, 30.0, Some("ap"), None, 1L, "unchanged"),       // absent from feed
      (9L, 90.0, None, Some("new"), 1L, "inserted")))      // insert: no prior region
  }

  test("mergeEvolved: carryForwardDropped=false retires the column on reopen") {
    val current = Seq((1L, 10.0, "eu")).toDF("id", "bal", "region")
      .withColumn("valid_from", lit(ts("2020-01-01")))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("version", lit(1L))
    val out = ScdMerge.mergeEvolved(current,
        Seq((1L, 11.0)).toDF("id", "bal"), "id", Seq("bal"),
        lit(ts("2024-06-01")), carryForwardDropped = false)
      .orderBy("version")
      .select("bal", "region", "version", "change_status")
      .as[(Double, Option[String], Long, String)].collect().toSeq
    assert(out == Seq(
      (10.0, Some("eu"), 1L, "closed"),
      (11.0, None, 2L, "updated")))
  }

  test("mergeEvolved: an ADDED column may drive the change comparison") {
    val current = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "bal")
      .withColumn("valid_from", lit(ts("2020-01-01")))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("version", lit(1L))
    val updates = Seq((1L, 10.0, Some("gold")), (2L, 20.0, Option.empty[String]))
      .toDF("id", "bal", "tier")
    val out = ScdMerge.mergeEvolved(current, updates, "id", Seq("bal", "tier"),
        lit(ts("2024-06-01")))
      .orderBy("id", "version")
      .select("id", "tier", "version", "change_status")
      .as[(Long, Option[String], Long, String)].collect().toSeq
    // id 1: NULL->gold on the added column = changed; id 2: NULL<=>NULL = not
    assert(out == Seq(
      (1L, None, 1L, "closed"),
      (1L, Some("gold"), 2L, "updated"),
      (2L, None, 1L, "unchanged")))
  }

  test("mergeEvolved with identical schemas matches merge") {
    val feed = Seq((1L, 11.0), (7L, 70.0)).toDF("id", "bal")
    val a = ScdMerge.merge(snapshot(1L -> 10.0, 2L -> 20.0), feed,
      "id", Seq("bal"), lit(ts("2024-06-01")))
    val b = ScdMerge.mergeEvolved(snapshot(1L -> 10.0, 2L -> 20.0), feed,
      "id", Seq("bal"), lit(ts("2024-06-01")))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }
}
