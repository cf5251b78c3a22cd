package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: merge-rule learning + subword encoding —
  * the tokenizer-training step of an LLM data pipeline (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units").
  *
  * Scale design: BPE learns from the WORD-FREQUENCY table, not the corpus —
  * the classic formulation. One hash aggregation reduces 100 TB of text to
  * a vocab-sized (word, count) relation (zipfian: ~10⁷ rows for web-scale
  * corpora, metadata next to the corpus); a deterministic top-`maxWords`
  * guard bounds the driver residency the same way centroid tables do
  * ([[Similarity.collectCentroids]]). The merge loop itself is
  * driver-side over that table (each iteration touches every distinct word
  * once — seconds for 10⁷ words, and NOT the corpus). Encoding is a narrow
  * per-row pass with a per-executor word→pieces memo: zipfian token
  * frequency means the memo hit rate approaches 1, so the per-word merge
  * loop amortizes to a map lookup at scan speed. No shuffle anywhere in
  * encode.
  *
  * Determinism contract (fixture-oracle pinned): symbols are full Unicode
  * codepoints; merge choice is (weighted pair count desc, left asc, right
  * asc); merges apply strictly within words (tokens() already split on
  * whitespace, so no end-of-word marker is needed); encoding applies merge
  * ranks greedily lowest-rank-first — the standard BPE encode order.
  */
object Bpe {

  /** Ordered merge rules: (rank i ⇒ merges(i) = (left, right, pairCount)). */
  final case class Model(merges: Seq[(String, String, Long)]) {
    /** rank lookup for encode: (left, right) → rank */
    lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case ((l, r, _), i) => ((l, r), i) }.toMap
  }

  private[operators] def splitCodepoints(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Learn `numMerges` merge rules from the corpus word-frequency table.
    * `maxWords` caps the driver-resident vocabulary deterministically
    * (top by count desc, word asc). */
  def learnMerges(docs: DataFrame, numMerges: Int, textCol: String = "text",
      maxWords: Int = 1000000): Model = {
    val wordCounts: Seq[(String, Long)] = docs
      .select(explode(graft.functions.TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      // deterministic top-N: per-partition top-k + driver k-way merge
      // (TakeOrderedAndProject), not a global sort
      .orderBy(col("cnt").desc, col("w")).limit(maxWords)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    learnFromWordCounts(wordCounts, numMerges)
  }

  /** The driver-side merge loop, exposed for spec-level parity testing. */
  private[graft] def learnFromWordCounts(wordCounts: Seq[(String, Long)],
      numMerges: Int): Model = {
    var words: Vector[(Vector[String], Long)] =
      wordCounts.map { case (w, c) => (splitCodepoints(w), c) }.toVector
    val merges = Vector.newBuilder[(String, String, Long)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- words; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + cnt))
      if (pairCounts.isEmpty) done = true
      else {
        val ((l, r), c) = pairCounts.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
        merges += ((l, r, c))
        val joined = l + r
        words = words.map { case (syms, cnt) =>
          if (syms.length < 2) (syms, cnt)
          else {
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                out += joined; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), cnt)
          }
        }
        m += 1
      }
    }
    Model(merges.result())
  }

  /** The learned merge table as a relation: (rank, left, right, pair_count). */
  def mergesDF(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((l, r, c), i) => (i.toLong, l, r, c) }
      .toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** Encode one word: repeatedly merge the lowest-rank adjacent pair. */
  private[graft] def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = splitCodepoints(word)
    var go = syms.length > 1
    while (go) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; best = i }
        }
        i += 1
      }
      if (best < 0) go = false
      else syms = (syms.take(best) :+ (syms(best) + syms(best + 1))) ++ syms.drop(best + 2)
    }
    syms
  }

  /** Executor-singleton encode memos, keyed by model identity. A memo
    * captured in the UDF closure would be deserialized PER TASK (every task
    * gets its own copy of the closure), so the amortization would restart
    * each task; this JVM-static registry is shared by all tasks of an
    * executor. Bounded: at most `MaxModels` models (full reset beyond — a
    * JVM juggling 64 live tokenizers is a leak, not a workload), at most
    * 262144 words per model. */
  private object EncodeMemos {
    private val MaxModels = 64
    private val memos =
      new ConcurrentHashMap[String, ConcurrentHashMap[String, Vector[String]]]()
    def forModel(modelId: String): ConcurrentHashMap[String, Vector[String]] = {
      if (memos.size > MaxModels) {
        // evict one arbitrary entry, not the whole registry (the
        // Wordpiece.Memos stance — a clear() would stampede every live
        // model's memo at once)
        val it = memos.keySet.iterator
        if (it.hasNext) { it.next(); it.remove() }
      }
      memos.computeIfAbsent(modelId, _ => new ConcurrentHashMap())
    }
  }

  /** Subword-encode each document: (idCol, n_pieces, pieces). The merge
    * table is broadcast inside the UDF closure (rank maps are merge-count
    * sized); a bounded executor-singleton memo (shared across tasks, keyed
    * by model identity) makes repeated words free. A UDF (not a native
    * expression) by necessity: the merge loop is data-dependent iteration —
    * but it runs once per DISTINCT word per executor JVM, so the hot path
    * is one hash-map probe per token. */
  def encode(docs: DataFrame, model: Model, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val ranks = model.ranks
    // stable identity for the memo registry: the merge list determines the
    // encoding, so equal models share a memo and different models never do
    // — a content digest, not hashCode, so 32-bit collisions between
    // distinct models can't silently share memoized segmentations
    val modelId = {
      val md = java.security.MessageDigest.getInstance("MD5")
      model.merges.foreach { case (l, r, _) =>
        md.update(l.getBytes("UTF-8")); md.update(0.toByte)
        md.update(r.getBytes("UTF-8")); md.update(1.toByte)
      }
      java.util.Base64.getEncoder.encodeToString(md.digest)
    }
    val enc = udf { toks: Seq[String] =>
      val memo = EncodeMemos.forModel(modelId)
      toks.flatMap { w =>
        var p = memo.get(w)
        if (p == null) {
          p = encodeWord(w, ranks)
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
