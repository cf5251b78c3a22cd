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
  * the classic unigram LM maximizes a sum of float log-probs, whose ties
  * and ulps are engine-dependent; this implementation maximizes the sum of
  * INTEGER corpus counts of the chosen pieces (the same argmax whenever
  * piece probabilities are count-proportional and the comparison is between
  * covers of one word), with ties broken toward the EARLIEST split point
  * (smallest start index of the last piece, applied at every DP cell). All
  * arithmetic is integer, so Scala and the independent Python replay agree
  * bit-for-bit.
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

  /** Integer-weight Viterbi segmentation of one word: maximize the summed
    * piece weights; at equal score the SMALLEST split start wins (longest
    * final piece). A codepoint absent from the vocab scores 0 and counts
    * as unk. Shared by the operator and (re-implemented independently) the
    * fixture generator. */
  private[graft] def segmentWord(w: String, m: Model): Vector[String] = {
    val n = w.length
    if (n == 0) return Vector.empty
    val best = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(back, -1)
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - m.maxLen)
      var bestScore = Long.MinValue
      var bestJ = -1
      while (j < i) {
        val piece = w.substring(j, i)
        // single chars always form a (possibly unk, weight-0) piece; longer
        // substrings must be in the vocab
        val wOpt =
          if (piece.length == 1) Some(m.weights.getOrElse(piece, 0L))
          else m.weights.get(piece)
        wOpt.foreach { pw =>
          val cand = best(j) + pw
          if (cand > bestScore) { bestScore = cand; bestJ = j }
        }
        j += 1
      }
      best(i) = bestScore
      back(i) = bestJ
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
          val words = text.trim match {
            case "" => Array.empty[String]
            case t => t.split("\\s+")
          }
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
