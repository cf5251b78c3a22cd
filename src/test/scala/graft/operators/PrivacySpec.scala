package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PrivacySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    // (zip, age_band, payload) — zip 111 x age A has 3 rows, others fewer
    ("111", "A", 1L), ("111", "A", 2L), ("111", "A", 3L),
    ("111", "B", 4L),
    ("222", "A", 5L), ("222", "A", 6L)).toDF("zip", "age", "id")

  test("audit reports class sizes and the k verdict") {
    val out = Privacy.kAnonymityAudit(rows,
        Seq(col("zip"), col("age")), Seq("zip", "age"), k = 3)
      .select("zip", "age", "n", "anonymous")
      .as[(String, String, Long, Boolean)].collect().toSet
    assert(out == Set(
      ("111", "A", 3L, true), ("111", "B", 1L, false), ("222", "A", 2L, false)))
  }

  test("kAnonymize suppresses exactly the rows of sub-k classes") {
    val kept = Privacy.kAnonymize(rows,
        Seq(col("zip"), col("age")), Seq("zip", "age"), k = 3)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
    // k=1 keeps everything; derived (computed) quasi columns work too
    val all = Privacy.kAnonymize(rows,
      Seq(concat(col("zip"), col("age"))), Seq("q"), k = 1).count()
    assert(all == 6L)
    // every class below k ⇒ everything suppressed (loud empty, not a crash)
    assert(Privacy.kAnonymize(rows,
      Seq(col("zip"), col("age")), Seq("zip", "age"), k = 10).count() == 0L)
  }

  test("suppression drops the helper quasi columns from the output schema") {
    val out = Privacy.kAnonymize(rows,
      Seq(col("zip")), Seq("q_zip"), k = 1)
    assert(out.columns.toSeq == Seq("zip", "age", "id"))
  }
}
