package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Dedup

class TextNormalizeSpec extends AnyFunSuite with SparkTestBase {
  import TextNormalizeExpr.normalizeText

  private def norm(ss: String*): Seq[String] = {
    import spark.implicits._
    ss.toDF("t").select(normalizeText(col("t"))).collect().map(_.getString(0)).toSeq
  }

  test("case, digits, punctuation, and whitespace canonicalize") {
    assert(norm("Hello, World!") == Seq("hello world"))
    assert(norm("v1.2.3 released 2024") == Seq("v0 0 0 released 0000"))
    assert(norm("  a\t\tb \n c  ") == Seq("a b c"))
    assert(norm("** !! **") == Seq(""))   // separator-only input → empty
    assert(norm("") == Seq(""))
  }

  test("accents strip via NFD for both precomposed and decomposed input") {
    // U+00E1 (precomposed a-acute) and "a" + U+0301 (combining acute) must
    // normalize identically — that is the whole point of NFD-first
    assert(norm("café", "café", "CAFE") == Seq("cafe", "cafe", "cafe"))
    assert(norm("À la carte") == Seq("a la carte"))
  }

  test("non-Latin residue acts as a separator, never as content") {
    // after lowercasing, anything outside [a-z0-9] collapses to one space —
    // the same rule the DuckDB oracle applies, so engines cannot diverge
    // on scripts whose lowercase mappings differ
    assert(norm("foo世界bar") == Seq("foo bar"))
    assert(norm("straße") == Seq("stra e")) // ß is not [a-z]; fold-side parity by exclusion
  }

  test("null propagates") {
    import spark.implicits._
    val out = Seq[Option[String]](None, Some("X"))
      .toDF("t").select(normalizeText(col("t")).as("n")).collect()
    assert(out(0).isNullAt(0) && out(1).getString(0) == "x")
  }

  test("idempotent, and equals the composed-builtin form on arbitrary ASCII") {
    import spark.implicits._
    // deterministic pseudo-random ASCII soup: every printable class mixed
    val rnd = new scala.util.Random(42)
    val strs = (1 to 300).map { _ =>
      val n = rnd.nextInt(40)
      (1 to n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }
    val df = strs.toDF("t")
    // independent in-engine formulation (accent step is identity on ASCII):
    // lower → digits→0 → collapse non-[a-z0-9] runs → trim
    val composed = trim(regexp_replace(
      regexp_replace(lower(col("t")), "[0-9]", "0"), "[^a-z0-9]+", " "))
    val rows = df.select(normalizeText(col("t")).as("native"), composed.as("composed"),
      normalizeText(normalizeText(col("t"))).as("twice")).collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"native vs composed: '${r.getString(0)}'")
      assert(r.getString(0) == r.getString(2), s"not idempotent: '${r.getString(0)}'")
    }
  }

  test("normalizedDuplicateGroups collapses what exact dedup cannot") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "The CAT sat, on the mat!!"),      // case + punctuation variant
      (3L, "the cát sat on the màt"), // accent variant
      (4L, "release 7 of build 42"),
      (5L, "release 9 of build 17"),          // digit-folded twin of 4
      (6L, "something else entirely")
    ).toDF("doc_id", "text")
    val exact = Dedup.exactDuplicateGroups(docs)
      .filter(col("group_size") > 1).count()
    val groups = Dedup.normalizedDuplicateGroups(docs)
      .orderBy("keep_id").collect()
    assert(exact == 0)                         // no raw-identical pair exists
    val bySize = groups.map(r => (r.getAs[Long]("keep_id"),
      r.getAs[Long]("group_size"), r.getAs[Long]("n_raw_forms"))).toSeq
    assert(bySize == Seq((1L, 3L, 3L), (4L, 2L, 2L), (6L, 1L, 1L)))
  }
}
