package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram (SentencePiece-style) subword tokenizer: a learned piece vocab
  * with corpus-frequency weights, and per-word segmentation by dynamic
  * programming over the best-scoring piece cover — the third tokenizer
  * family next to [[Bpe]] (merge-order replay) and [[Wordpiece]] (greedy
  * maximal munch), exercising the Viterbi decomposition those two cannot.
  *
  * DETERMINISM CONTRACT (the fixture oracle replays this exactly):
  * the classic unigram LM maximizes a sum of float log-probs
  * Σ(log count(p) − log T) = Σ log count(p) − n·log T — an objective that
  * PENALIZES piece count (each extra piece costs log T) and whose float
  * ties/ulps are engine-dependent. This implementation keeps the same
  * shape with all-integer arithmetic: lexicographically MINIMIZE the piece
  * count, then MAXIMIZE the summed integer corpus counts of the chosen
  * pieces, then break remaining ties toward the EARLIEST split point
  * (smallest start index of the last piece, applied at every DP cell).
  * The earlier round-8 objective (maximize count-sum alone) was degenerate:
  * every substring's count is ≥ its superstring's, so an all-single-char
  * split always won and the multi-gram vocab was dead weight — the
  * piece-count-first objective is what makes the learned n-grams actually
  * segment. All arithmetic is integer, so Scala and the independent Python
  * replay agree bit-for-bit.
  *
  * Scale shape: learning is one explode over tokens + one n-gram count
  * shuffle capped by `topV` (the model is metadata-sized by contract);
  * encoding is a scan-speed `mapPartitions` with the model in the task
  * closure and a per-partition word memo — no joins, no second pass over
  * text. At 100 TB the vocab learn is a bounded-output aggregation and the
  * encode is embarrassingly parallel.
  */
object Unigram {

  /** Piece vocab with integer weights (corpus occurrence counts). */
  case class Model(maxLen: Int, weights: Map[String, Long])

  /** Learn the piece vocab: every single codepoint of every (lowercased,
    * whitespace-split) token, plus the `topV` most frequent character
    * n-grams of length 2..`maxLen` (ties: lexicographically smaller gram
    * wins). Weights are total occurrence counts across the corpus — each
    * token occurrence contributes every one of its substrings of length
    * <= maxLen once. */
  def learnVocab(docs: DataFrame, maxLen: Int = 4, topV: Int = 200,
      textCol: String = "text"): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = docs
      .select(explode(graft.functions.TextFunctions.tokens(
        lower(col(textCol)))).as("w"))
      .as[String]
      .flatMap { w =>
        for {
          i <- 0 until w.length
          n <- 1 to math.min(maxLen, w.length - i)
        } yield w.substring(i, i + n)
      }
      .groupBy("value").agg(count(lit(1)).as("n"))
    val chars = grams.filter(length(col("value")) === 1)
    val multi = grams.filter(length(col("value")) > 1)
      .orderBy(col("n").desc, col("value")).limit(topV)
    val weights = chars.unionByName(multi)
      .as[(String, Long)].collect().toMap
    Model(maxLen, weights)
  }

  /** Integer Viterbi segmentation of one word under the lexicographic
    * objective (FEWEST pieces, then LARGEST summed piece weight, then the
    * SMALLEST split start — longest final piece). A codepoint absent from
    * the vocab scores 0 and counts as unk. Shared by the operator and
    * (re-implemented independently) the fixture generator. */
  private[graft] def segmentWord(w: String, m: Model): Vector[String] = {
    val n = w.length
    if (n == 0) return Vector.empty
    val bestCnt = new Array[Int](n + 1)    // min pieces to cover w[0,i)
    val bestWt = new Array[Long](n + 1)    // max weight at that min count
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(back, -1)
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - m.maxLen)
      var bc = Int.MaxValue
      var bw = Long.MinValue
      var bj = -1
      while (j < i) {
        val piece = w.substring(j, i)
        // single chars always form a (possibly unk, weight-0) piece; longer
        // substrings must be in the vocab
        val wOpt =
          if (piece.length == 1) Some(m.weights.getOrElse(piece, 0L))
          else m.weights.get(piece)
        wOpt.foreach { pw =>
          val cc = bestCnt(j) + 1
          val cw = bestWt(j) + pw
          // strict improvement only: j ascends, so the smallest j holding
          // the best (count, weight) pair wins ties
          if (cc < bc || (cc == bc && cw > bw)) { bc = cc; bw = cw; bj = j }
        }
        j += 1
      }
      bestCnt(i) = bc
      bestWt(i) = bw
      back(i) = bj
      i += 1
    }
    var out = List.empty[String]
    var k = n
    while (k > 0) { out = w.substring(back(k), k) :: out; k = back(k) }
    out.toVector
  }

  /** Encode every document: per-doc piece count, unk count, summed piece
    * weight (the DP objective — pins the argmax), and the first 8 pieces.
    * One narrow scan; a per-partition memo amortizes repeated words. */
  def encode(docs: DataFrame, model: Model, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), lower(col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Vector[String]]
        it.map { case (id, text) =>
          // same tokenization as learnVocab (TextFunctions.tokens' JVM
          // mirror) — vocab learn and encode must never split differently
          val words = graft.functions.TextFunctions.tokensJvm(text)
          var nPieces = 0L
          var nUnk = 0L
          var weight = 0L
          val first = scala.collection.mutable.ArrayBuffer.empty[String]
          words.foreach { w =>
            val pieces = memo.getOrElseUpdate(w, segmentWord(w, model))
            nPieces += pieces.length
            pieces.foreach { p =>
              val pw = model.weights.getOrElse(p, 0L)
              if (pw == 0L && p.length == 1 && !model.weights.contains(p)) nUnk += 1
              weight += pw
              if (first.size < 8) first += p
            }
          }
          (id, nPieces, nUnk, weight, first.mkString(" "))
        }
      }
      .toDF(idCol, "n_pieces", "n_unk", "total_weight", "first_pieces")
  }
}
