package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BpeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("merge learning follows (count desc, pair asc) and rewrites words") {
    // "abab"×3, "abc"×2: pair counts round 1: (a,b)=8, (b,a)=3, (b,c)=2
    val m = Bpe.learnFromWordCounts(Seq(("abab", 3L), ("abc", 2L)), numMerges = 3)
    assert(m.merges.head == ("a", "b", 8L))
    // after merging "ab": "abab"→[ab,ab]×3 ⇒ (ab,ab)=3; "abc"→[ab,c] ⇒ (ab,c)=2
    assert(m.merges(1) == ("ab", "ab", 3L))
    assert(m.merges(2) == ("ab", "c", 2L))
  }

  test("tie-break picks the lexicographically smallest pair") {
    // "xy" and "ab" both have count 1 ⇒ (a,b) wins over (x,y)
    val m = Bpe.learnFromWordCounts(Seq(("xy", 1L), ("ab", 1L)), numMerges = 1)
    assert(m.merges.head == ("a", "b", 1L))
  }

  test("learning stops when no pairs remain") {
    val m = Bpe.learnFromWordCounts(Seq(("ab", 1L)), numMerges = 10)
    assert(m.merges.map(x => (x._1, x._2)) == Seq(("a", "b")))
  }

  test("encodeWord applies lowest rank first, leaves unknown pairs split") {
    val model = Bpe.Model(Seq(("a", "b", 0L), ("ab", "c", 0L)))
    assert(Bpe.encodeWord("abc", model.ranks) == Vector("abc"))
    assert(Bpe.encodeWord("cab", model.ranks) == Vector("c", "ab"))
    assert(Bpe.encodeWord("xyz", model.ranks) == Vector("x", "y", "z"))
    assert(Bpe.encodeWord("a", model.ranks) == Vector("a"))
  }

  test("encode end-to-end: learned merges reconstruct the text, counts add up") {
    val docs = Seq(
      (1L, "spark table spark table spark"),
      (2L, "table scan table scan"),
      (3L, "spark")
    ).toDF("doc_id", "text")
    val model = Bpe.learnMerges(docs, numMerges = 32)
    val got = Bpe.encode(docs, model)
      .select($"doc_id", $"n_pieces", concat_ws(" ", $"pieces").as("joined"))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // concatenating pieces per word reproduces the word stream: with enough
    // merges every frequent word collapses to a single piece
    assert(got(0) == ((1L, 5L, "spark table spark table spark")))
    assert(got(1) == ((2L, 4L, "table scan table scan")))
    assert(got(2) == ((3L, 1L, "spark")))
  }

  test("encode is stable across partitionings (memo is per-executor only)") {
    val docs = Seq((1L, "aa ab aa"), (2L, "ab aa ab")).toDF("doc_id", "text")
    val model = Bpe.learnMerges(docs, numMerges = 1)
    val once = Bpe.encode(docs, model).select("doc_id", "n_pieces")
      .as[(Long, Long)].collect().toSet
    val repart = Bpe.encode(docs.repartition(7), model).select("doc_id", "n_pieces")
      .as[(Long, Long)].collect().toSet
    assert(once == repart)
  }
}
