package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class UnigramNbSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("unigram viterbi picks the fewest-piece cover, then max weight, " +
      "then the earliest split (longest final piece)") {
    val m = Unigram.Model(4, Map(
      "a" -> 1L, "b" -> 1L, "c" -> 1L,
      "ab" -> 10L, "bc" -> 10L, "abc" -> 11L))
    // one piece beats every split
    assert(Unigram.segmentWord("abc", m) == Vector("abc"))
    // remove abc: two-piece covers ab+c and a+bc tie on (count=2, wt=11)
    // → smallest last-piece start wins ("bc" over "c")
    val m2 = Unigram.Model(4, m.weights - "abc")
    assert(Unigram.segmentWord("abc", m2) == Vector("a", "bc"))
    assert(Unigram.segmentWord("ab", m) == Vector("ab"))
    // piece count dominates weight: a+b sums 200 but "ab" is ONE piece —
    // the round-8 count-sum objective degenerated to chars here
    val m3 = Unigram.Model(4, Map("a" -> 100L, "b" -> 100L, "ab" -> 1L))
    assert(Unigram.segmentWord("ab", m3) == Vector("ab"))
    // at equal piece count the larger summed weight wins: ab+c=6 < a+bc=10
    val m4 = Unigram.Model(4, Map(
      "a" -> 1L, "b" -> 1L, "c" -> 1L, "ab" -> 5L, "bc" -> 9L))
    assert(Unigram.segmentWord("abc", m4) == Vector("a", "bc"))
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

  test("naive bayes fit caps the driver-side vocabulary (topV/minCount)") {
    // synthetic high-cardinality vocab: 500 unique noise tokens + 2 signal
    // tokens per class — uncapped fit would collect 500+ (label, tok) rows
    val noise = (0 until 500).map(i => s"tok$i").grouped(10)
      .zipWithIndex.map { case (g, i) =>
        (i.toLong, g.mkString(" ") + " signal_x signal_x", "x") }.toSeq
    val other = Seq((900L, "signal_y signal_y signal_y", "y"))
    val docs = (noise ++ other).toDF("doc_id", "text", "label")
    val capped = NaiveBayes.fit(docs, "label", topV = 10)
    // the model holds at most topV distinct tokens across every class
    val distinctToks = capped.tokenCounts.values.flatMap(_.keys).toSet
    assert(distinctToks.size <= 10 && capped.vocabSize <= 10L)
    // signal_x occurs 100x (most frequent) — it must survive the cap
    assert(distinctToks.contains("signal_x"))
    // minCount floor: each noise token occurs once → floor 2 drops them all
    val floored = NaiveBayes.fit(docs, "label", minCount = 2L)
    val flooredToks = floored.tokenCounts.values.flatMap(_.keys).toSet
    assert(flooredToks == Set("signal_x", "signal_y"))
    // capped model still classifies clean signal docs (noise-heavy docs
    // legitimately drift toward the small class whose OOV penalty is lower)
    val probe = Seq(
      (1000L, "signal_x signal_x"),
      (1001L, "signal_y signal_y signal_y")).toDF("doc_id", "text")
    val preds = NaiveBayes.predict(probe, capped)
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
    assert(preds == Map(1000L -> "x", 1001L -> "y"))
  }

  test("charGramsJvm emits boundary-marked sorted-distinct 2-3 grams") {
    import graft.functions.TextFunctions
    // "ab ab" — dedup across repeated words; boundary markers present
    val g = TextFunctions.charGramsJvm("ab ab", Seq(2, 3)).toSeq
    assert(g == Seq("_a", "_ab", "ab", "ab_", "b_"))
    // whitespace variants featurize identically (tokensJvm contract)
    assert(TextFunctions.charGramsJvm("\tab\nab ", Seq(2, 3)).toSeq == g)
    assert(TextFunctions.charGramsJvm("", Seq(2, 3)).isEmpty)
    // a 1-char word still yields its padded 2- and 3-grams
    assert(TextFunctions.charGramsJvm("x", Seq(2, 3)).toSeq
      == Seq("_x", "_x_", "x_"))
  }

  test("char-gram NB separates languages word NB cannot (shared words, distinct spelling)") {
    // two "languages" sharing zero training WORDS with the probe docs:
    // word-level NB sees only out-of-vocab tokens and falls back to the
    // prior, but char grams transfer spelling statistics to unseen words
    val train = Seq(
      (1L, "zzik zzok zzuk", "zz"), (2L, "zzak zzek", "zz"),
      (3L, "qaqa qiqi ququ", "qq"), (4L, "qoqo qeqe", "qq"),
      (5L, "zzyk zzaz", "zz"), (6L, "qyqy quqa", "qq"))
      .toDF("doc_id", "text", "lang")
    val m = NaiveBayes.fitCharGrams(train, "lang")
    // unseen words, same spelling systems
    val probe = Seq((10L, "zzolk zzilk"), (11L, "qaqu qiqo"))
      .toDF("doc_id", "text")
    val preds = NaiveBayes.predictCharGrams(probe, m)
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
    assert(preds == Map(10L -> "zz", 11L -> "qq"))
    // presence features: a gram repeated within one doc counts once per
    // doc in the fit ("zz" appears in every zz-class word but each doc
    // contributes 1)
    assert(m.tokenCounts("zz")("zz") == 3L)
  }

  test("char-gram fit and predict tolerate null text like the word path") {
    // word path: tokens(null) is null, explode drops the row — the
    // char-gram typed map must match (zero features), not NPE
    val train = Seq((1L, "zzik zzok", "zz"), (2L, "qaqa qiqi", "qq"),
      (3L, null, "zz"))
      .toDF("doc_id", "text", "lang")
    val m = NaiveBayes.fitCharGrams(train, "lang")
    // the null doc still counts toward the class prior, like the word fit
    assert(m.docCount("zz") == 2L)
    val preds = NaiveBayes.predictCharGrams(
        Seq((10L, "zzolk"), (11L, null.asInstanceOf[String]))
          .toDF("doc_id", "text"), m)
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
    assert(preds(10L) == "zz")
    // null text scores as the zero-feature doc: the prior argmax
    // (zz has 2 docs, qq has 1)
    assert(preds(11L) == "zz")
  }

  test("fit and predict tokenize identically on tab/newline-bounded text") {
    // "\tspam\nspam " would split differently under naive trim/split —
    // the shared tokensJvm/tokens contract keeps fit and predict aligned
    val docs = Seq((1L, "\tspam\nspam ", "bad"), (2L, " ham\tham\n", "good"))
      .toDF("doc_id", "text", "label")
    val model = NaiveBayes.fit(docs, "label")
    assert(model.tokenCounts("bad") == Map("spam" -> 2L))
    assert(model.tokenCounts("good") == Map("ham" -> 2L))
    val preds = NaiveBayes.predict(docs, model)
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
    assert(preds == Map(1L -> "bad", 2L -> "good"))
    // unigram: tab-bounded text encodes the same as space-bounded
    val m = Unigram.Model(4, Map("a" -> 5L, "b" -> 3L, "ab" -> 2L))
    val enc = Unigram.encode(
        Seq((1L, "\tab\nab "), (2L, "ab ab")).toDF("doc_id", "text"), m)
      .select("doc_id", "n_pieces", "total_weight")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(enc(1L) == enc(2L))
  }
}
