package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Unigram language-model perplexity scoring — the CCNet/Gopher-style
  * corpus-quality filter (Wenzek et al. '19 score Common Crawl with a
  * KenLM; the unigram formulation is its shuffle-free Spark shape): docs
  * whose token stream is improbable under a corpus-wide LM (gibberish,
  * boilerplate, wrong-language) score high cross-entropy and get cut.
  *
  * Scale shape: the LM is ONE hash aggregation reduced to a top-`vocabSize`
  * table (TakeOrderedAndProject — per-partition top-k, never a global
  * sort), broadcast into the scoring join; the corpus streams through one
  * narrow explode+join+agg pass. Out-of-vocab tokens take the floor
  * probability 1/N (additive-floor smoothing) so the score is total and
  * deterministic — no token can contribute log 0.
  *
  * Probabilities are unsmoothed corpus MLE `cnt/N` for in-vocab tokens
  * (N = ALL token occurrences, not just in-vocab ones, so in-vocab
  * probabilities are true frequencies and the OOV floor is exactly one
  * occurrence's worth of mass).
  */
object Lm {

  /** Unigram model: (token, cnt, logp) for the top-`vocabSize` tokens by
    * (count desc, token asc), plus the corpus total `n` and the OOV floor
    * log-prob ln(1/N). The ranked relation is vocab-sized; the full
    * distinct-token relation is never globally sorted. */
  final case class UnigramModel(vocab: DataFrame, totalTokens: Long, oovLogp: Double)

  def unigramLm(docs: DataFrame, textCol: String = "text",
      vocabSize: Int = 4096): UnigramModel = {
    val counts = docs
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    // scalar total over the (token, cnt) relation — distributed sum, one
    // driver scalar out
    val n = counts.agg(sum("cnt")).head.getLong(0)
    val vocab = counts
      .orderBy(col("cnt").desc, col("token")).limit(vocabSize)
      .select(col("token"), col("cnt"), log(col("cnt").cast("double") / n.toDouble).as("logp"))
    UnigramModel(vocab, n, math.log(1.0 / n.toDouble))
  }

  /** Per-doc cross-entropy (nats/token) and perplexity under the model.
    * Docs with zero tokens vanish at the explode (callers that need them
    * keep a left join). Returns (idCol, n_tokens, n_oov, cross_entropy,
    * ppl). */
  def perplexity(docs: DataFrame, model: UnigramModel, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .join(broadcast(model.vocab.select("token", "logp")), Seq("token"), "left")
      .select(col(idCol),
        coalesce(col("logp"), lit(model.oovLogp)).as("lp"),
        col("logp").isNull.as("oov"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("oov"), 1L).otherwise(0L)).as("n_oov"),
        (-avg(col("lp"))).as("cross_entropy"))
      .withColumn("ppl", exp(col("cross_entropy")))
}
