package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LmSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // corpus: "a" ×4, "b" ×2, "c" ×1, "d" ×1 → N = 8
  private def docs = Seq(
    (1L, "a a b c"),
    (2L, "a a b d"),
    (3L, "   "),
    (4L, "A")
  ).toDF("doc_id", "text")

  test("unigram probabilities are MLE over ALL occurrences; top-V ordered (cnt desc, token asc)") {
    val lm = Lm.unigramLm(docs, vocabSize = 2)
    assert(lm.totalTokens == 9) // a×5 (case-folded "A"), b×2, c×1, d×1
    val vocab = lm.vocab.as[(String, Long, Double)].collect().toSeq
    assert(vocab.map(v => (v._1, v._2)) == Seq(("a", 5L), ("b", 2L)))
    assert(math.abs(vocab.head._3 - math.log(5.0 / 9.0)) < 1e-12)
    assert(math.abs(lm.oovLogp - math.log(1.0 / 9.0)) < 1e-12)
  }

  test("cross-entropy is -mean log p with the OOV floor; blank docs vanish") {
    val lm = Lm.unigramLm(docs, vocabSize = 2)
    val got = Lm.perplexity(docs, lm)
      .select("doc_id", "n_tokens", "n_oov", "cross_entropy")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 4L)) // doc 3 is whitespace-only
    val (_, n1, oov1, h1) = got(0)
    assert(n1 == 4 && oov1 == 1) // "c" is OOV at V=2
    val expected1 = -(2 * math.log(5.0 / 9.0) + math.log(2.0 / 9.0) + math.log(1.0 / 9.0)) / 4.0
    assert(math.abs(h1 - expected1) < 1e-12)
    // single-token doc of the most frequent word: H = -ln p(a)
    assert(math.abs(got(2)._4 - (-math.log(5.0 / 9.0))) < 1e-12)
  }

  test("perplexity = exp(cross-entropy), and uniform corpus gives ppl = vocab size") {
    // 4 equally frequent tokens, all in vocab → p = 1/4 each, ppl = 4
    val uni = Seq((1L, "w x y z")).toDF("doc_id", "text")
    val lm = Lm.unigramLm(uni, vocabSize = 8)
    val row = Lm.perplexity(uni, lm).select("cross_entropy", "ppl")
      .as[(Double, Double)].head()
    assert(math.abs(row._1 - math.log(4.0)) < 1e-12)
    assert(math.abs(row._2 - 4.0) < 1e-9)
  }

  test("bigram conditionals are c(w1w2)/c(w1); misses back off to the unigram term") {
    // pairs: (a,b)x2, (b,a)x1, (a,c)x1 from "a b a b" and "a c"
    val corpus = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val m = Lm.bigramLm(corpus, vocabSize = 8, maxBigrams = 8, lambda = 0.5)
    val bi = m.bigrams.select("w1", "w2", "p_cond")
      .as[(String, String, Double)].collect().map(r => ((r._1, r._2), r._3)).toMap
    // c(a)=3 as first element: (a,b)x2, (a,c)x1 → p(b|a)=2/3, p(c|a)=1/3
    assert(math.abs(bi(("a", "b")) - 2.0 / 3.0) < 1e-12)
    assert(math.abs(bi(("a", "c")) - 1.0 / 3.0) < 1e-12)
    assert(math.abs(bi(("b", "a")) - 1.0) < 1e-12) // c(b)=1 first-position
    // scoring "a b": one position, hit → ln(0.5·(2/3) + 0.5·p_uni(b))
    // N=6 (a×3,b×2,c×1): p_uni(b)=2/6
    val h = Lm.bigramPerplexity(Seq((9L, "a b")).toDF("doc_id", "text"), m)
      .select("n_scored", "n_bigram_hits", "cross_entropy")
      .as[(Long, Long, Double)].head()
    assert(h._1 == 1 && h._2 == 1)
    assert(math.abs(h._3 - (-math.log(0.5 * (2.0 / 3.0) + 0.5 * (2.0 / 6.0)))) < 1e-12)
    // an unseen bigram of unseen words: pure floor backoff, zero hits
    val miss = Lm.bigramPerplexity(Seq((10L, "q r")).toDF("doc_id", "text"), m)
      .select("n_bigram_hits", "cross_entropy").as[(Long, Double)].head()
    assert(miss._1 == 0)
    assert(math.abs(miss._2 - (-math.log(0.5 * (1.0 / 6.0)))) < 1e-12)
  }

  test("bigram table cap only coarsens: capped model never scores NaN/-inf and single-token docs vanish") {
    val corpus = Seq((1L, "a b c d e f g h"), (2L, "x")).toDF("doc_id", "text")
    val m = Lm.bigramLm(corpus, vocabSize = 2, maxBigrams = 2, lambda = 0.7)
    assert(m.bigrams.count() == 2) // cap applied
    val got = Lm.bigramPerplexity(corpus, m)
      .select("doc_id", "cross_entropy").as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L)) // "x" has no bigram positions
    assert(!got.head._2.isNaN && !got.head._2.isInfinite)
  }

  test("a low-probability doc scores strictly higher cross-entropy than a high-probability one") {
    val lm = Lm.unigramLm(docs, vocabSize = 2)
    val h = Lm.perplexity(
      Seq((10L, "a a a"), (11L, "q r s")).toDF("doc_id", "text"), lm)
      .select("doc_id", "cross_entropy").as[(Long, Double)].collect().toMap
    assert(h(11L) > h(10L)) // all-OOV gibberish ≫ all-frequent
  }

  test("Kneser-Ney: seen, unseen-continuation and unseen-HISTORY branches all score finite") {
    val train = Seq((1L, "a b a b a c"), (2L, "b a b c")).toDF("doc_id", "text")
    val model = Lm.kneserNey(train)
    // score: (a,b) seen; (c,a) unseen bigram with seen history c? c IS a
    // seen history? train bigrams: ab,ba,ab,ba,ac | ba,ab,bc — histories
    // {a, b}: 'c' never starts a bigram -> (c, b) exercises unseen HISTORY;
    // (a, q) exercises unseen continuation under a seen history
    val out = Lm.knPerplexity(
        Seq((10L, "a b"), (11L, "c b"), (12L, "a q")).toDF("doc_id", "text"), model)
      .select("doc_id", "n_scored", "n_bigram_hits", "cross_entropy")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(10L)._3 == 1L)                     // seen bigram
    assert(out(11L)._3 == 0L)                     // unseen history
    assert(out(12L)._3 == 0L)                     // unseen continuation
    out.values.foreach { case (_, _, _, ce) =>
      assert(!ce.isNaN && !ce.isInfinite && ce > 0)
    }
    // the seen bigram is the most probable of the three
    assert(out(10L)._4 < out(11L)._4 && out(10L)._4 < out(12L)._4)
  }

  // corpus for bucket tests: per-lang CE separates cleanly (distinct token
  // mixes); 6 docs per lang -> tertiles of 2
  private def bucketDocs = Seq(
    // lang en: increasing OOV share -> increasing CE
    (1L, "en", "a a a a"), (2L, "en", "a a a b"), (3L, "en", "a a b b"),
    (4L, "en", "a b b x1"), (5L, "en", "b b x1 x2"), (6L, "en", "x1 x2 x3 x4"),
    // lang fr: same construction, its own ranking
    (11L, "fr", "a a a a"), (12L, "fr", "a a a b"), (13L, "fr", "a a b b"),
    (14L, "fr", "a b b y1"), (15L, "fr", "b b y1 y2"), (16L, "fr", "y1 y2 y3 y4")
  ).toDF("doc_id", "lang", "text")

  test("perplexityBuckets: per-lang count-tertiles by CE, head = lowest") {
    val lm = Lm.unigramLm(bucketDocs, vocabSize = 2) // vocab {a, b}
    val got = Lm.perplexityBuckets(bucketDocs, lm)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(got(1L) == "head" && got(2L) == "head")
    assert(got(3L) == "middle" && got(4L) == "middle")
    assert(got(5L) == "tail" && got(6L) == "tail")
    assert(got(11L) == "head" && got(13L) == "middle" && got(16L) == "tail")
    // brute-force cross-check: rank by (rounded CE, id) within lang
    val ce = Lm.perplexity(bucketDocs, lm)
      .select("doc_id", "cross_entropy").as[(Long, Double)].collect().toMap
    for (langIds <- Seq(Seq(1L, 2L, 3L, 4L, 5L, 6L), Seq(11L, 12L, 13L, 14L, 15L, 16L))) {
      val ranked = langIds.sortBy(id => (math.round(ce(id) * 1e4), id))
      val expect = ranked.zipWithIndex.map { case (id, i) =>
        id -> Seq("head", "middle", "tail")(i / 2) }.toMap
      langIds.foreach(id => assert(got(id) == expect(id), s"doc $id"))
    }
  }

  test("perplexityBucketsAtScale agrees with the exact form off-threshold") {
    val lm = Lm.unigramLm(bucketDocs, vocabSize = 2)
    val exact = Lm.perplexityBuckets(bucketDocs, lm)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    val approx = Lm.perplexityBucketsAtScale(bucketDocs, lm)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    // CE values here are well separated, so the approximate thresholds
    // cannot land between a doc and its exact bucket boundary partner —
    // full agreement expected
    assert(approx === exact)
  }
}
