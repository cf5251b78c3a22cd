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
    * with class/vocab-bounded output.
    *
    * The driver materializes only the PRUNED (class, token) relation: a
    * web-scale corpus has an unbounded unique-token tail (noise, ids,
    * typos), so without `minCount`/`topV` the collect is a driver OOM at
    * 100×. `minCount` drops tokens whose corpus-wide occurrence count is
    * below the floor; `topV` keeps only the most frequent `topV` tokens
    * (ties toward the lexicographically smaller token — deterministic).
    * The defaults are passthrough (no pruning) for small labeled sets;
    * corpus-scale callers MUST set a cap, and the smoothing vocabulary
    * becomes the kept vocabulary (out-of-vocab tokens then score as unseen,
    * the standard NB treatment). */
  def fit(docs: DataFrame, labelCol: String, textCol: String = "text",
      minCount: Long = 1L, topV: Int = Int.MaxValue): Model =
    fitFeatured(docs.select(col(labelCol).as("label"),
      graft.functions.TextFunctions.tokens(lower(col(textCol))).as("toks")),
      minCount, topV)

  /** [[fit]] over word-boundary-marked char n-gram PRESENCE features
    * (distinct per doc — see [[graft.functions.TextFunctions.charGramsJvm]])
    * instead of word tokens: the trained char-level language-ID model
    * (fastText/CCNet style). The feature vocabulary is alphabet-bounded
    * (|Σ|^max(ns)), so the driver collect is safe without caps even at
    * corpus scale; `minCount`/`topV` still apply. */
  def fitCharGrams(docs: DataFrame, labelCol: String, ns: Seq[Int] = Seq(2, 3),
      textCol: String = "text", minCount: Long = 1L,
      topV: Int = Int.MaxValue): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nsLocal = ns
    // null text featurizes as empty (zero grams), matching the word-token
    // path where tokens(null) is null and the explode drops the row — the
    // typed map must never hand charGramsJvm a null (review finding)
    // fanIfNarrow: the char-gram featurizer is the heaviest per-row map in
    // the classifier family — parallelize a narrow scan (no-op at scale)
    fitFeatured(Parallelize.fanIfNarrow(docs)
      .select(col(labelCol).as("label"),
        coalesce(lower(col(textCol)), lit("")).as("t"))
      .as[(String, String)]
      .map { case (l, t) =>
        (l, graft.functions.TextFunctions.charGramsJvm(t, nsLocal).toSeq) }
      .toDF("label", "toks"), minCount, topV)
  }

  private def fitFeatured(toks: DataFrame, minCount: Long, topV: Int): Model = {
    val spark = toks.sparkSession
    import spark.implicits._
    val docCount = toks.groupBy("label").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val perClass = toks
      .select(col("label"), explode(col("toks")).as("tok"))
      .groupBy("label", "tok").agg(count(lit(1)).as("n"))
    // prune BEFORE the collect: corpus-wide token totals, floor + top-V.
    // The top-V sort touches only the distinct-token relation (already a
    // bounded-output aggregate), not the corpus.
    val floored = perClass.groupBy("tok").agg(sum("n").as("tot"))
      .filter(col("tot") >= minCount)
    val keptVocab =
      if (topV == Int.MaxValue) floored.select("tok")
      else floored.orderBy(col("tot").desc, col("tok")).limit(topV)
        .select("tok")
    val pruned =
      if (minCount <= 1L && topV == Int.MaxValue) perClass
      else perClass.join(keptVocab, Seq("tok"))
    val tokCounts = pruned.select("label", "tok", "n")
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
      idCol: String = "doc_id"): DataFrame =
    // same tokenization as fit (TextFunctions.tokens' JVM mirror) — fit
    // and predict must never split differently
    predictWith(docs, model, graft.functions.TextFunctions.tokensJvm _,
      textCol, idCol)

  /** [[predict]] with [[fitCharGrams]]' feature extractor: per-doc sorted
    * distinct char n-grams, so scoring enumerates features in the same
    * canonical order as any independent replay. */
  def predictCharGrams(docs: DataFrame, model: Model,
      ns: Seq[Int] = Seq(2, 3), textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val nsLocal = ns
    predictWith(docs, model,
      t => graft.functions.TextFunctions.charGramsJvm(t, nsLocal),
      textCol, idCol)
  }

  private def predictWith(docs: DataFrame, model: Model,
      features: String => Array[String], textCol: String,
      idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // null-tolerant like fit: a null text scores as the zero-feature doc
    // (prior argmax) instead of NPE-ing the featurizer
    Parallelize.fanIfNarrow(docs)
      .select(col(idCol).cast("long"),
        coalesce(lower(col(textCol)), lit("")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val labels = model.labels
        it.map { case (id, text) =>
          val words = features(text)
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
