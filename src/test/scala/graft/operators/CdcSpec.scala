package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CdcSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def changelog(rows: (Long, String, Long, String)*) =
    rows.toSeq.toDF("id", "v", "seq", "op")

  test("compaction keeps the highest-seq row per key and drops deleted keys") {
    val out = Cdc.compactChangelog(changelog(
        (1L, "a", 1L, "I"), (1L, "b", 2L, "U"),
        (2L, "x", 1L, "I"), (2L, "x", 2L, "D"),
        (3L, "only", 1L, "I")),
      Seq("id"), "seq", "op")
      .select("id", "v", "op").as[(Long, String, String)].collect().toSet
    assert(out == Set((1L, "b", "U"), (3L, "only", "I")))
  }

  test("a key deleted then re-inserted at a later seq survives") {
    val out = Cdc.compactChangelog(changelog(
        (5L, "first", 1L, "I"), (5L, "gone", 2L, "D"), (5L, "back", 3L, "I")),
      Seq("id"), "seq", "op")
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(out == Set((5L, "back")))
  }

  test("same-seq tie breaks toward U over I (op desc), deterministically") {
    val out = Cdc.compactChangelog(changelog(
        (9L, "ins", 7L, "I"), (9L, "upd", 7L, "U")),
      Seq("id"), "seq", "op")
      .select("v").as[String].collect().toSeq
    assert(out == Seq("upd"))
  }

  private def snap(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("id", "status", "price")

  test("snapshot diff classifies added/removed/changed and names the columns") {
    val before = snap((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0),
      (4L, "D", 40.0))
    val after = snap((1L, "A", 10.0), (2L, "X", 21.0), (3L, "C", 30.5),
      (5L, "E", 50.0))
    val out = Cdc.snapshotDiff(before, after, Seq("id"))
      .select(col("id"), col("change_type"), concat_ws(",", col("changed_cols")))
      .as[(Long, String, String)].collect().toSet
    assert(out == Set(
      (2L, "changed", "price,status"),
      (3L, "changed", "price"),
      (4L, "removed", ""),
      (5L, "added", "")))
    // unchanged key 1 is absent from the diff relation entirely
  }

  test("null transitions are changes, not silent matches") {
    val before = Seq((1L, Option("A")), (2L, Option.empty[String]))
      .toDF("id", "status")
    val after = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "status")
    val out = Cdc.snapshotDiff(before, after, Seq("id"))
      .select("id", "change_type").as[(Long, String)].collect().toSet
    // 1: A -> null is a change; 2: null -> null is unchanged (null-safe eq)
    assert(out == Set((1L, "changed")))
  }

  test("columns present on only one side are ignored, not compared") {
    val before = Seq((1L, "A", 1.0)).toDF("id", "status", "only_before")
    val after = Seq((1L, "A")).toDF("id", "status")
    val out = Cdc.snapshotDiff(before, after, Seq("id")).count()
    assert(out == 0L)
  }
}
