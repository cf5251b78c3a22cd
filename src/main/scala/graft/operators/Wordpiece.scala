package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece-style greedy subword segmentation (Wu et al. 2016, GNMT;
  * the BERT tokenizer's matching rule): encode each word by repeatedly
  * taking the LONGEST vocabulary piece that prefixes the remaining text
  * (maximal munch), falling back to a single codepoint when nothing
  * matches. This is the other standard deployment of a learned subword
  * vocabulary — [[Bpe.encode]] replays merge ranks lowest-first, WordPiece
  * ignores ranks and match-greedily segments; the two disagree on real
  * words, so each needs its own oracle.
  *
  * Scale shape is [[Bpe.encode]]'s exactly: a narrow scan-speed pass, the
  * vocabulary rides the closure (merge-table sized), repeated words hit a
  * bounded executor-singleton memo (zipfian frequency ⇒ hit rate ≈ 1), no
  * shuffle anywhere.
  *
  * Determinism contract (fixture-pinned): pieces match by longest Java/
  * Python string prefix; candidates that are not valid codepoint sequences
  * cannot be in the vocabulary, so char-indexed and codepoint-indexed
  * scanning agree; the fallback advances one full codepoint.
  */
object Wordpiece {

  /** Multi-codepoint vocabulary pieces; single codepoints are implicitly
    * always in vocab (the fallback), so encode is total. */
  final case class Vocab(pieces: Set[String]) {
    lazy val maxLen: Int = if (pieces.isEmpty) 1 else pieces.iterator.map(_.length).max
  }

  /** The natural vocabulary of a learned BPE model: every merge's joined
    * symbol (each is a piece the merge process proved frequent). */
  def fromBpe(model: Bpe.Model): Vocab =
    Vocab(model.merges.map { case (l, r, _) => l + r }.toSet)

  /** Greedy longest-prefix segmentation of one word. */
  private[graft] def encodeWord(word: String, vocab: Vocab): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      var j = math.min(word.length, i + vocab.maxLen)
      var matched: String = null
      while (matched == null && j - i >= 2) {
        val cand = word.substring(i, j)
        if (vocab.pieces.contains(cand)) matched = cand else j -= 1
      }
      if (matched != null) { out += matched; i += matched.length }
      else {
        val n = Character.charCount(word.codePointAt(i))
        out += word.substring(i, i + n)
        i += n
      }
    }
    out.result()
  }

  /** Executor-singleton word→pieces memos keyed by vocab identity — the
    * same JVM-static registry stance as Bpe.EncodeMemos (a closure-captured
    * map would be per-task). */
  private object Memos {
    private val MaxVocabs = 64
    private val memos =
      new ConcurrentHashMap[String, ConcurrentHashMap[String, Vector[String]]]()
    def forVocab(vocabId: String): ConcurrentHashMap[String, Vector[String]] = {
      if (memos.size > MaxVocabs) {
        // evict one arbitrary entry, not the whole registry — a clear()
        // would stampede every live vocab's memo at once
        val it = memos.keySet.iterator
        if (it.hasNext) { it.next(); it.remove() }
      }
      memos.computeIfAbsent(vocabId, _ => new ConcurrentHashMap())
    }
  }

  /** Segment each document: (idCol, n_pieces, pieces). */
  def encode(docs: DataFrame, vocab: Vocab, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // content digest over the sorted piece list (not hashCode — 32-bit
    // collisions between distinct vocabs must not share memos)
    val vocabId = {
      val md = java.security.MessageDigest.getInstance("MD5")
      vocab.pieces.toSeq.sorted.foreach { p =>
        md.update(p.getBytes("UTF-8")); md.update(0.toByte)
      }
      java.util.Base64.getEncoder.encodeToString(md.digest)
    }
    val enc = udf { toks: Seq[String] =>
      val memo = Memos.forVocab(vocabId)
      toks.flatMap { w =>
        var p = memo.get(w)
        if (p == null) {
          p = encodeWord(w, vocab)
          if (memo.size < 262144) memo.put(w, p)
        }
        p
      }
    }
    docs.select(col(idCol),
        enc(graft.functions.TextFunctions.tokens(lower(col(textCol)))).as("pieces"))
      .select(col(idCol), size(col("pieces")).cast("long").as("n_pieces"),
        col("pieces"))
  }
}
