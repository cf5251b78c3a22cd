package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes document classifier — the classic cheap trained
  * quality/routing model of corpus pipelines (language routing, source
  * attribution, fasttext-style quality gating): token counts per class with
  * add-one smoothing, argmax of log prior + summed token log-likelihoods.
  *
  * DETERMINISM: counts are exact integers; scoring sums `math.log` doubles
  * in DOCUMENT TOKEN ORDER per class, and classes compare with ties broken
  * toward the lexicographically smallest label — so the prediction is
  * stable given the counts, and an independent replay agrees whenever the
  * winning margin clears float noise (the fixture generator ASSERTS a
  * per-doc margin, so a fragile decision fails loudly at generation time
  * rather than flaking in the gate).
  *
  * Scale shape: fitting is two bounded-output aggregations (docs per class;
  * (class, token) counts — vocab × classes rows, metadata-sized by the
  * vocab contract); scoring is a scan-speed `mapPartitions` with the model
  * in the task closure. No joins, no iteration, no driver loops over data.
  */
object NaiveBayes {

  /** `tokenCounts(label)(token)` = occurrences; `docCount(label)` = docs;
    * `classTotals(label)` = total tokens; `vocabSize` = distinct tokens
    * across classes. */
  case class Model(docCount: Map[String, Long],
      tokenCounts: Map[String, Map[String, Long]],
      classTotals: Map[String, Long], vocabSize: Long) {
    val labels: Seq[String] = docCount.keys.toSeq.sorted
    val nDocs: Long = docCount.values.sum
  }

  /** Fit from (label, lowercased whitespace tokens). Two aggregations, both
    * with class/vocab-bounded output. */
  def fit(docs: DataFrame, labelCol: String,
      textCol: String = "text"): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(labelCol).as("label"),
      graft.functions.TextFunctions.tokens(lower(col(textCol))).as("toks"))
    val docCount = toks.groupBy("label").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val tokCounts = toks
      .select(col("label"), explode(col("toks")).as("tok"))
      .groupBy("label", "tok").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
    val byClass = tokCounts.groupBy(_._1).map { case (l, rows) =>
      l -> rows.map(r => r._2 -> r._3).toMap
    }
    val totals = byClass.map { case (l, m) => l -> m.values.sum }
    val vocab = tokCounts.map(_._2).distinct.length.toLong
    Model(docCount, byClass, totals, vocab)
  }

  /** Score + predict every document: per-class log-posterior, argmax label
    * (ties: lexicographically smallest). Output carries the winning and
    * runner-up scores so callers (and the fixture's margin assert) can see
    * decision confidence. */
  def predict(docs: DataFrame, model: Model, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), lower(col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val labels = model.labels
        it.map { case (id, text) =>
          val words = text.trim match {
            case "" => Array.empty[String]
            case t => t.split("\\s+")
          }
          var bestLabel = ""
          var bestScore = Double.NegativeInfinity
          var second = Double.NegativeInfinity
          labels.foreach { l =>
            val counts = model.tokenCounts.getOrElse(l, Map.empty)
            val denom = (model.classTotals.getOrElse(l, 0L) +
              model.vocabSize).toDouble
            var s = math.log(model.docCount(l).toDouble / model.nDocs)
            words.foreach { w =>
              s += math.log((counts.getOrElse(w, 0L) + 1L).toDouble / denom)
            }
            // strict > keeps the FIRST (lexicographically smallest) label
            // on exact ties
            if (s > bestScore) { second = bestScore; bestScore = s; bestLabel = l }
            else if (s > second) second = s
          }
          (id, bestLabel, bestScore, second)
        }
      }
      .toDF(idCol, "pred", "score", "runner_up")
  }
}
