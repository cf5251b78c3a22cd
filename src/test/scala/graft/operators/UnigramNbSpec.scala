package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class UnigramNbSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("unigram viterbi picks the max-weight cover; ties go to the " +
      "earliest split (longest final piece)") {
    val m = Unigram.Model(4, Map(
      "a" -> 1L, "b" -> 1L, "c" -> 1L,
      "ab" -> 10L, "bc" -> 10L, "abc" -> 11L))
    // covers of "abc": a+b+c=3, ab+c=11, a+bc=11, abc=11 — three ties at
    // 11; the DP keeps the smallest split start at the last cell → "abc"
    assert(Unigram.segmentWord("abc", m) == Vector("abc"))
    // remove abc: ab+c vs a+bc tie at 11 → last piece longer wins ("bc")
    val m2 = Unigram.Model(4, m.weights - "abc")
    assert(Unigram.segmentWord("abc", m2) == Vector("a", "bc"))
    // strictly better long piece wins over char sum
    assert(Unigram.segmentWord("ab", m) == Vector("ab"))
  }

  test("unknown codepoints segment as weight-0 singletons and count as unk") {
    val m = Unigram.Model(4, Map("a" -> 5L))
    assert(Unigram.segmentWord("axa", m) == Vector("a", "x", "a"))
    val out = Unigram.encode(
        Seq((1L, "axa")).toDF("doc_id", "text"), m)
      .select("n_pieces", "n_unk", "total_weight")
      .as[(Long, Long, Long)].head()
    assert(out == ((3L, 1L, 10L)))
  }

  test("learnVocab counts every substring occurrence and caps multi-grams " +
      "deterministically") {
    val m = Unigram.learnVocab(
      Seq((1L, "aba aba"), (2L, "ab")).toDF("doc_id", "text"),
      maxLen = 3, topV = 2)
    // "aba" x2 contributes a:2,b:1,ab:1,ba:1,aba:1 each; "ab" adds a,b,ab
    assert(m.weights("a") == 5L && m.weights("b") == 3L)
    // multi-gram cap 2: ab(3) beats ba(2)/aba(2); tie ba vs aba → "aba"
    // sorts after "ab" but "aba" < "ba" lexicographically
    assert(m.weights.get("ab").contains(3L))
    assert(m.weights.keySet.count(_.length > 1) == 2)
    assert(m.weights.contains("aba") && !m.weights.contains("ba"))
  }

  test("naive bayes learns separable classes and predicts deterministically") {
    val docs = Seq(
      (1L, "spam spam offer", "bad"), (2L, "offer spam spam", "bad"),
      (3L, "hello friend lunch", "good"), (4L, "lunch hello hello", "good"))
      .toDF("doc_id", "text", "label")
    val model = NaiveBayes.fit(docs, "label")
    val preds = NaiveBayes.predict(docs, model)
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
    assert(preds == Map(1L -> "bad", 2L -> "bad", 3L -> "good", 4L -> "good"))
    // unseen-token doc: all likelihoods equal → exact tie → smallest label
    val tie = NaiveBayes.predict(Seq((9L, "zzz")).toDF("doc_id", "text"), model)
      .select("pred").as[String].head()
    assert(tie == "bad")
  }

  test("naive bayes exposes winner and runner-up scores with winner >= runner-up") {
    val docs = Seq((1L, "a a b", "x"), (2L, "b b a", "y")).toDF("doc_id", "text", "label")
    val model = NaiveBayes.fit(docs, "label")
    val rows = NaiveBayes.predict(docs, model)
      .select("score", "runner_up").as[(Double, Double)].collect()
    assert(rows.forall { case (s, r) => s >= r && !s.isNaN })
  }
}
