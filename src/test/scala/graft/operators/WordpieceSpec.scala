package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class WordpieceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("encodeWord takes the longest prefix greedily, falls back to single codepoints") {
    val v = Wordpiece.Vocab(Set("ab", "abc", "cd", "de"))
    assert(Wordpiece.encodeWord("abcde", v) == Vector("abc", "de")) // abc beats ab
    assert(Wordpiece.encodeWord("abcd", v) == Vector("abc", "d"))   // greedy, no backtrack
    assert(Wordpiece.encodeWord("xyz", v) == Vector("x", "y", "z"))
    assert(Wordpiece.encodeWord("cdab", v) == Vector("cd", "ab"))
    assert(Wordpiece.encodeWord("a", v) == Vector("a"))
    assert(Wordpiece.encodeWord("", v) == Vector.empty)
  }

  test("greedy matching genuinely diverges from BPE merge-order replay") {
    // merges learned rank order: (b,c) first, then (a,b) → pieces {bc, ab}.
    // BPE on "abc" applies rank 0 first: [a, bc]. WordPiece munches the
    // longest PREFIX: [ab, c]. Both are valid tokenizers; they disagree —
    // which is why d44 needs its own oracle next to d31.
    val model = Bpe.Model(Seq(("b", "c", 9L), ("a", "b", 5L)))
    val v = Wordpiece.fromBpe(model)
    assert(Bpe.encodeWord("abc", model.ranks) == Vector("a", "bc"))
    assert(Wordpiece.encodeWord("abc", v) == Vector("ab", "c"))
  }

  test("encode end-to-end: pieces concatenate back to the word stream") {
    val docs = Seq(
      (1L, "spark spark sparking"),
      (2L, "park spa"),
      (3L, "")
    ).toDF("doc_id", "text")
    val model = Bpe.learnMerges(docs, numMerges = 16)
    val v = Wordpiece.fromBpe(model)
    val got = Wordpiece.encode(docs, v)
      .select($"doc_id", $"n_pieces", concat_ws("", $"pieces").as("joined"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val wantJoined = Map(1L -> "sparksparksparking", 2L -> "parkspa", 3L -> "")
    got.foreach { case (id, n, joined) =>
      assert(joined == wantJoined(id), s"doc $id")
      assert(n == 0 || id != 3L)
    }
    // segmentation is total: n_pieces > 0 wherever there is text
    assert(got.filter(_._1 != 3L).forall(_._2 > 0))
    assert(got.find(_._1 == 3L).get._2 == 0)
  }
}
