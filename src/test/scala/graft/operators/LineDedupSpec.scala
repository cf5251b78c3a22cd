package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LineDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  /** Brute-force reference: same keep-first / drop-repeats semantics
    * computed with plain Scala collections. */
  private def reference(rows: Seq[(Long, String)], keepFirst: Boolean,
      norm: String => String = identity): Map[Long, (Long, Long, String)] = {
    val lines = rows.flatMap { case (id, text) =>
      text.split(java.util.regex.Pattern.quote("\n"), -1)
        .zipWithIndex.map { case (l, p) => (id, p, l) }
    }
    val byKey = lines.groupBy { case (_, _, l) => norm(l) }
    val kept: Set[(Long, Int)] =
      if (keepFirst)
        byKey.values.map(g => g.map { case (id, p, _) => (id, p) }.min).toSet
      else
        byKey.values.filter(_.size == 1)
          .flatMap(_.map { case (id, p, _) => (id, p) }).toSet
    rows.map { case (id, text) =>
      val ls = text.split(java.util.regex.Pattern.quote("\n"), -1).zipWithIndex
      val surv = ls.filter { case (_, p) => kept((id, p)) }.map(_._1)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(surv.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      id -> (ls.length.toLong, surv.length.toLong, md5)
    }.toMap
  }

  private def run(df: DataFrame, keepFirst: Boolean = true,
      normalize: Boolean = false, hashKeys: Boolean = true): Map[Long, (Long, Long, String)] =
    LineDedup.dedupLines(df, keepFirst = keepFirst, normalize = normalize,
        hashKeys = hashKeys)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap

  test("keep-first: corpus-wide first copy survives, later copies drop") {
    val d = Seq(
      1L -> "alpha beta\nshared line\ngamma",
      2L -> "shared line\ndelta",
      3L -> "unique only\nshared line")
    assert(run(docs(d: _*)) === reference(d, keepFirst = true))
    // the doc-1 copy (pos 1) is the survivor: doc 2 and 3 each lose it
    val got = run(docs(d: _*))
    assert(got(1L)._2 === 3L)
    assert(got(2L)._2 === 1L)
    assert(got(3L)._2 === 1L)
  }

  test("drop-all-repeats: any repeated line disappears everywhere") {
    val d = Seq(
      1L -> "alpha\nshared line",
      2L -> "shared line\nbeta")
    val got = run(docs(d: _*), keepFirst = false)
    assert(got === reference(d, keepFirst = false))
    assert(got(1L)._2 === 1L && got(2L)._2 === 1L)
  }

  test("within-doc repeats dedup too; empty lines are lines") {
    val d = Seq(
      1L -> "x\n\nx\n",
      2L -> "\ny")
    val got = run(docs(d: _*))
    assert(got === reference(d, keepFirst = true))
    // doc 1: lines [x, '', x, ''] -> keeps pos 0 (x) and pos 1 ('')
    assert(got(1L)._1 === 4L && got(1L)._2 === 2L)
    // doc 2: its '' (pos 0) lost to doc 1 pos 1; keeps y
    assert(got(2L)._1 === 2L && got(2L)._2 === 1L)
  }

  test("normalize=true: case/punct variants hash together, text survives verbatim") {
    val d = Seq(
      1L -> "Hello, World!\nkeep me",
      2L -> "hello world\nother")
    val got = run(docs(d: _*), normalize = true)
    val norm = (s: String) =>
      s.toLowerCase.replaceAll("[0-9]", "0").replaceAll("[^a-z0-9]+", " ").trim
    assert(got === reference(d, keepFirst = true, norm = norm))
    // doc 2 lost its normalized-equal copy, doc 1's verbatim text survives
    assert(got(1L)._2 === 2L && got(2L)._2 === 1L)
  }

  test("hashKeys=false matches hashKeys=true (no collisions at test size)") {
    val d = (1L to 40L).map(i =>
      i -> s"common header\nbody ${i % 7}\ntail ${i % 3}")
    assert(run(docs(d: _*), hashKeys = false) === run(docs(d: _*), hashKeys = true))
    assert(run(docs(d: _*)) === reference(d, keepFirst = true))
  }

  test("within-doc form: in-doc repeats drop, cross-doc repeats survive everywhere") {
    val df = docs(
      (1L, "a\nb\na\nc\nb"),   // in-doc repeats of a and b
      (2L, "a\nb"),             // same lines in ANOTHER doc — untouched
      (3L, "x\nx\nx"))          // triple repeat collapses to one
    val got = LineDedup.dedupLinesWithinDoc(df)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) == ((5L, 3L, md5("a\nb\nc"))))
    // doc 2 keeps BOTH lines even though doc 1 already has them — the
    // within-doc rule never looks across documents (that is dedupLines)
    assert(got(2L) == ((2L, 2L, md5("a\nb"))))
    assert(got(3L) == ((3L, 1L, md5("x"))))
    // contrast: the corpus-wide form strips doc 2 entirely
    val corpusWide = run(df)
    assert(corpusWide(2L)._2 == 0L)
    // hashKeys=false agrees at test size
    val raw = LineDedup.dedupLinesWithinDoc(df, hashKeys = false)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(raw == got)
  }

  test("doc that loses every line digests the empty string") {
    val d = Seq(1L -> "only line", 2L -> "only line")
    val got = run(docs(d: _*))
    assert(got(2L)._2 === 0L)
    assert(got(2L)._3 === "d41d8cd98f00b204e9800998ecf8427e")
  }
}
