package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TrainingFormatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "abcdefghij"),          // 10 chars: p1=3, p2=6
    (1L, "xy"),                  // shorter than 3: empty prefix/middle
    (2L, "a"),
    (3L, ""),                    // empty doc survives (all parts empty)
    (4L, "the quick brown fox jumps over the lazy dog"),
    (5L, "σπάρκ unicode δοκιμή"), // pivots must count CHARS, not bytes
    (6L, "0123456789" * 20)
  ).toDF("doc_id", "text")

  test("FIM parts reconstruct the document exactly; PSM assembly is well-formed") {
    // rate16 = 16: every doc gated in — the reconstruction law must hold
    // for every length, including empty and multibyte
    val out = TrainingFormats.fimSplit(docs, rate16 = 16).collect()
    assert(out.length == docs.count())
    val texts = docs.as[(Long, String)].collect().toMap
    out.foreach { r =>
      val (id, applied) = (r.getAs[Long]("doc_id"), r.getAs[Boolean]("fim_applied"))
      assert(applied, s"rate16=16 must gate every doc in (doc $id)")
      val (p, m, sfx) = (r.getAs[String]("prefix"), r.getAs[String]("middle"),
        r.getAs[String]("suffix"))
      assert(p + m + sfx == texts(id), s"doc $id parts must reconstruct the text")
      assert(r.getAs[String]("example") ==
        TrainingFormats.FimPrefix + p + TrainingFormats.FimSuffix + sfx +
          TrainingFormats.FimMiddle + m)
      // pivot law: |prefix| = len/3, |middle| = 2len/3 - len/3 (chars)
      val n = texts(id).length
      assert(p.length == n / 3 && m.length == n * 2 / 3 - n / 3)
    }
  }

  test("the md5 rate-gate is deterministic and passthrough keeps the raw text") {
    val out = TrainingFormats.fimSplit(docs, rate16 = 8)
    val again = TrainingFormats.fimSplit(docs, rate16 = 8)
    assert(out.collect().toSeq == again.collect().toSeq,
      "replayed epochs must emit byte-identical examples")
    out.filter(!col("fim_applied")).collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val raw = docs.filter(col("doc_id") === id).head.getString(1)
      assert(r.getAs[String]("example") == raw, s"doc $id must pass through")
      assert(r.getAs[String]("prefix").isEmpty && r.getAs[String]("middle").isEmpty)
    }
    // rate16 = 0 gates nothing; 16 gates everything
    assert(TrainingFormats.fimSplit(docs, rate16 = 0)
      .filter(col("fim_applied")).count() == 0)
    assert(TrainingFormats.fimSplit(docs, rate16 = 16)
      .filter(!col("fim_applied")).count() == 0)
  }

  test("span corruption: splicing targets back at the sentinels recovers the document") {
    val corpus = Seq(
      (0L, (1 to 40).map(i => s"w$i").mkString(" ")),  // 5 full blocks
      (1L, (1 to 11).map(i => s"t$i").mkString(" ")),  // tail block, maybe span-less
      (2L, "a b"),                                     // shorter than any span start
      (3L, "solo")
    ).toDF("doc_id", "text")
    val out = TrainingFormats.spanCorrupt(corpus).collect()
    val texts = corpus.as[(Long, String)].collect().toMap
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val wordsIn = texts(id).split("\\s+")
      assert(r.getAs[Long]("n_words") == wordsIn.length)
      assert(r.getAs[Long]("n_masked") <= r.getAs[Long]("n_spans") * 3)
      // reconstruct: walk the encoder; at <extra_id_k>, splice that
      // span's words from the target
      val spans = ("<extra_id_(\\d+)> ((?:\\S+ ?)+?)(?=(<extra_id_|$))".r)
        .findAllMatchIn(r.getAs[String]("target"))
        .map(m => m.group(1).toLong -> m.group(2).trim.split("\\s+").toSeq).toMap
      val rebuilt = r.getAs[String]("encoder").split("\\s+").toSeq.flatMap { tok =>
        if (tok.startsWith("<extra_id_"))
          spans(tok.stripPrefix("<extra_id_").stripSuffix(">").toLong)
        else Seq(tok)
      }
      assert(rebuilt == wordsIn.toSeq,
        s"doc $id: encoder+target must reconstruct the document")
      // the 3/8 design rate: every full 8-word block masks exactly 3
      if (wordsIn.length % 8 == 0)
        assert(r.getAs[Long]("n_masked") == wordsIn.length / 8 * 3)
    }
    // phase differs across docs (md5-derived), output is deterministic
    val again = TrainingFormats.spanCorrupt(corpus).collect()
    assert(out.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("tripletMine pairs the hardest positive with hardNegativeTopK's negatives") {
    def vec(i: Long): Seq[Float] =
      Array.tabulate(6)(j => (math.sin(i * 13 + j * 5) + 2.0).toFloat).toSeq
    // label 9 appears ONCE (vec 29): that anchor has no positive → no rows
    val labeled = ((0L until 29L).map(i => (i, (i % 3).toInt, vec(i))) :+
      ((29L, 9, vec(29L)))).toDF("vec_id", "label", "embedding")
    val anchors = labeled.filter(col("vec_id") === 0L || col("vec_id") === 29L)
    val triplets = Similarity.tripletMine(labeled, anchors, k = 4)
    val rows = triplets.collect()
    assert(rows.forall(_.getAs[Long]("anchor_id") == 0L),
      "the positive-less anchor (unique label) must emit no triplets")
    assert(rows.length == 4)
    // the positive is the true hardest same-label vector
    val pos = Similarity.bruteForceTopK(
        labeled.filter(col("label") === 0), anchors.filter(col("vec_id") === 0L),
        k = 1)
      .select("corpus_id", "cosine").as[(Long, Double)].head()
    assert(rows.forall(r => r.getAs[Long]("pos_id") == pos._1 &&
      math.abs(r.getAs[Double]("pos_cos") - pos._2) < 1e-12))
    // the negatives are exactly hardNegativeTopK's, same ranks
    val negs = Similarity.hardNegativeTopK(labeled,
        anchors.filter(col("vec_id") === 0L), k = 4)
      .select("corpus_id", "rank").as[(Long, Int)].collect().toSet
    assert(rows.map(r => (r.getAs[Long]("neg_id"), r.getAs[Int]("rank"))).toSet == negs)
  }

  test("preferencePairs: strict margin, (score, id) tiebreak, singleton groups drop") {
    val cands = Seq(
      // group 0: clear winner/loser
      (0L, 10L, 5L), (0L, 11L, 9L), (0L, 12L, 1L),
      // group 1: ALL scores tie — zero margin, must emit nothing
      (1L, 20L, 4L), (1L, 21L, 4L),
      // group 2: singleton — no pair to assemble
      (2L, 30L, 7L),
      // group 3: top score tied between ids 41/42 — chosen must be the
      // HIGHER id (lexicographic max), rejected the lower of the mins
      (3L, 40L, 2L), (3L, 41L, 8L), (3L, 42L, 8L), (3L, 43L, 2L)
    ).toDF("prompt_id", "doc_id", "reward")
    val out = TrainingFormats.preferencePairs(cands, "prompt_id", "reward")
      .collect().map(r => r.getAs[Long]("prompt_id") ->
        ((r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
          r.getAs[Long]("margin"), r.getAs[Long]("n_cands")))).toMap
    assert(out.keySet == Set(0L, 3L),
      "tied and singleton groups carry no preference signal")
    assert(out(0L) == ((11L, 12L, 8L, 3L)))
    assert(out(3L) == ((42L, 40L, 6L, 4L)),
      "score ties must break by id on both the chosen and rejected ends")
  }

  test("contrastiveViews: crops overlap by exactly the middle third, short docs drop") {
    val corpus = Seq(
      (0L, "a b c"),                         // n=3: c=2, overlap 1
      (1L, "one two three four five six"),   // n=6: c=4, overlap 2
      (2L, "w1 w2 w3 w4 w5 w6 w7"),          // n=7: c=5, overlap 3
      (3L, "too short"),                     // n=2: no distinct views
      (4L, "solo")                           // n=1
    ).toDF("doc_id", "text")
    val out = TrainingFormats.contrastiveViews(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(0L, 1L, 2L),
      "documents under three words cannot form two overlapping views")
    out.values.foreach { r =>
      val (a, b) = (r.getAs[String]("view_a").split(" "),
        r.getAs[String]("view_b").split(" "))
      val n = r.getAs[Long]("n_tokens").toInt
      val ov = r.getAs[Long]("n_overlap").toInt
      assert(a.length == b.length && a.length < n,
        "views are same-length strict crops")
      // the views tile the doc: a's tail IS b's head, length = n_overlap
      assert(a.takeRight(ov).sameElements(b.take(ov)),
        "overlap must be the shared middle slice")
      assert((a ++ b.drop(ov)).length == n,
        "a + b minus the overlap reassembles the document")
      assert(ov >= n / 3, "overlap floor: at least a third of the doc")
    }
    assert(out(1L).getAs[String]("view_a") == "one two three four")
    assert(out(1L).getAs[String]("view_b") == "three four five six")
  }

  test("chatLossMask: the loss span is exactly the assistant reply's chars") {
    val convo = Seq(
      (0L, "hello there how are you"),    // 5 words: user 3, assistant 2
      (1L, "one two"),                    // minimum viable exchange
      (2L, "single"),                     // 1 word: no assistant turn
      (3L, "  padded   whitespace test ") // tokenization must collapse ws
    ).toDF("doc_id", "text")
    val out = TrainingFormats.chatLossMask(convo).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out.contains(2L), "a doc under two words has no assistant turn")
    out.values.foreach { r =>
      val rendered = r.getAs[String]("rendered")
      val (s0, e0) = (r.getAs[Long]("loss_start").toInt,
        r.getAs[Long]("loss_end").toInt)
      // slicing the rendered string at the offsets yields the assistant
      // text — the span a trainer would unmask
      val span = rendered.substring(s0, e0)
      assert(rendered ==
        "<|user|>\n" + rendered.substring(9, s0 - 15) +
          "\n<|assistant|>\n" + span + "<|end|>",
        s"offsets must partition the render exactly: $rendered")
      assert(!span.contains("<|"), "the loss span carries no role tags")
    }
    assert(out(0L).getAs[String]("rendered") ==
      "<|user|>\nhello there how\n<|assistant|>\nare you<|end|>")
    assert(out(1L).getAs[String]("rendered") ==
      "<|user|>\none\n<|assistant|>\ntwo<|end|>")
    assert(out(3L).getAs[String]("rendered") ==
      "<|user|>\npadded whitespace\n<|assistant|>\ntest<|end|>")
  }
}
