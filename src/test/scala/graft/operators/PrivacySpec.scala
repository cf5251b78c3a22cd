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

  test("sub-k classes keyed by a NULL quasi value are still suppressed") {
    // two null-zip rows + one (null, B): with k=3 every null-keyed class is
    // sub-k and must go — a null-unsafe anti-join would retain all three.
    val withNulls = rows.unionByName(Seq(
      (Option.empty[String], "A", 7L), (Option.empty[String], "A", 8L),
      (Option.empty[String], "B", 9L)).toDF("zip", "age", "id"))
    val kept = Privacy.kAnonymize(withNulls,
        Seq(col("zip"), col("age")), Seq("zip", "age"), k = 3)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
    // audit and enforcement agree on the null class verdict
    val audited = Privacy.kAnonymityAudit(withNulls,
        Seq(col("zip"), col("age")), Seq("zip", "age"), k = 3)
      .filter(col("anonymous")).count()
    assert(audited == 1L)
  }

  test("dpNoisedCounts: deterministic, seed-keyed, bounded-perturbation Laplace release") {
    val docs = (1L to 100L).map(i => (i, if (i <= 70) "en" else "de"))
      .toDF("id", "lang")
    def release(seed: String) = Privacy.dpNoisedCounts(docs,
        Seq(col("lang")), Seq("lang"), scale = 5.0, seed = seed)
      .select("lang", "noised_count").as[(String, Double)].collect().toMap
    val r1 = release("graft-dp")
    // REPRODUCIBLE release: re-running republishes identical statistics
    // (fresh draws would spend more privacy budget)
    assert(r1 == release("graft-dp"))
    // a different seed is a different draw (the noise is real)
    assert(r1 != release("other-seed"))
    // the noise is Laplace-scaled, not unbounded: |noise| = scale *
    // |ln(u')| <= scale * 52 ln 2 ~ 180 at the 2^-52 tail; and it
    // actually perturbs (an exact integer back out is ~impossible)
    r1.foreach { case (lang, v) =>
      val truth = if (lang == "en") 70.0 else 30.0
      assert(math.abs(v - truth) < 200.0, s"$lang: $v vs $truth")
      assert(v != truth, "noise must actually perturb the count")
    }
    intercept[IllegalArgumentException] {
      Privacy.dpNoisedCounts(docs, Seq(col("lang")), Seq("lang"),
        scale = 0.0, seed = "s")
    }
    // the seed is a SECRET with no default: an empty one is refused, so a
    // caller can never silently ship the recomputable-noise footgun
    intercept[IllegalArgumentException] {
      Privacy.dpNoisedCounts(docs, Seq(col("lang")), Seq("lang"),
        scale = 5.0, seed = "")
    }
  }

  test("a quasi name colliding with an existing column never clobbers it") {
    // names = Seq("age") while `age` is a data column: output must keep the
    // ORIGINAL age values and column set.
    val out = Privacy.kAnonymize(rows,
      Seq(upper(col("age"))), Seq("age"), k = 1)
    assert(out.columns.toSeq == Seq("zip", "age", "id"))
    assert(out.select("age").as[String].collect().toSet == Set("A", "B"))
  }
}
