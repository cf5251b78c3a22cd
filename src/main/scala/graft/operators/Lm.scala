package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Interpolated bigram model: p(w₂|w₁) = λ·c(w₁w₂)/c(w₁) + (1−λ)·p_uni(w₂)
    * — one step toward the KenLM scoring CCNet actually deploys. The bigram
    * table is capped to the top `maxBigrams` by (count desc, w₁, w₂) with
    * each row carrying its own c(w₁) (so the conditional needs no second
    * join); a missing bigram backs off to (1−λ)·p_uni — the interpolation
    * keeps every probability strictly positive, so capping the table only
    * coarsens scores, never breaks them. Both tables are
    * TakeOrderedAndProject-bounded broadcasts; corpus scans: one for
    * unigrams, one for bigrams, one to score. */
  final case class BigramModel(unigram: UnigramModel, bigrams: DataFrame, lambda: Double)

  def bigramLm(docs: DataFrame, textCol: String = "text", vocabSize: Int = 4096,
      maxBigrams: Int = 4096, lambda: Double = 0.7): BigramModel = {
    require(lambda > 0 && lambda < 1, s"lambda in (0,1): $lambda")
    val uni = unigramLm(docs, textCol, vocabSize)
    val toks = docs.select(TextFunctions.tokens(lower(col(textCol))).as("toks"))
      .filter(size(col("toks")) >= 2)
    // within-doc adjacent pairs: zip(toks[0..n-2], toks[1..n-1])
    val pairs = toks.select(explode(zip_with(
      slice(col("toks"), lit(1), size(col("toks")) - 1),
      slice(col("toks"), lit(2), size(col("toks")) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
    val biCounts = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w1"), col("w2")).limit(maxBigrams)
    // attach c(w1): w1-marginal over the FULL pair relation (not the capped
    // table) so conditionals are true corpus conditionals
    val w1Counts = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val bi = biCounts.join(w1Counts, "w1")
      .select(col("w1"), col("w2"), col("cnt"), col("c1"),
        (col("cnt").cast("double") / col("c1")).as("p_cond"))
    BigramModel(uni, bi, lambda)
  }

  /** Per-doc conditional cross-entropy under the interpolated bigram model:
    * positions 2..T scored by ln(λ·p_cond + (1−λ)·p_uni(w₂)); the first
    * token has no history and is skipped (standard conditional scoring).
    * Docs with < 2 tokens vanish. Returns (idCol, n_scored, n_bigram_hits,
    * cross_entropy, ppl). */
  def bigramPerplexity(docs: DataFrame, model: BigramModel, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol),
        TextFunctions.tokens(lower(col(textCol))).as("toks"))
      .filter(size(col("toks")) >= 2)
    val pairs = toks.select(col(idCol), explode(zip_with(
      slice(col("toks"), lit(1), size(col("toks")) - 1),
      slice(col("toks"), lit(2), size(col("toks")) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col(idCol), col("p.w1"), col("p.w2"))
    val nTotal = model.unigram.totalTokens.toDouble
    val scored = pairs
      .join(broadcast(model.bigrams.select("w1", "w2", "p_cond")), Seq("w1", "w2"), "left")
      .join(broadcast(model.unigram.vocab
          .select(col("token").as("w2"),
            (col("cnt").cast("double") / nTotal).as("p_uni"))),
        Seq("w2"), "left")
      .select(col(idCol),
        col("p_cond").isNotNull.as("hit"),
        log(coalesce(col("p_cond"), lit(0.0)) * model.lambda +
          coalesce(col("p_uni"), lit(1.0 / nTotal)) * (1.0 - model.lambda))
          .as("lp"))
    scored.groupBy(idCol)
      .agg(count(lit(1)).as("n_scored"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_bigram_hits"),
        (-avg(col("lp"))).as("cross_entropy"))
      .withColumn("ppl", exp(col("cross_entropy")))
  }

  /** Interpolated Kneser–Ney bigram model (Kneser & Ney '95; Chen &
    * Goodman '99 eq. 4.di) — the standard over [[bigramLm]]'s plain
    * interpolation: p(w₂|w₁) = max(c(w₁w₂)−D, 0)/c(w₁) + λ(w₁)·p_cont(w₂)
    * with λ(w₁) = D·N₁₊(w₁,•)/c(w₁) and the CONTINUATION unigram
    * p_cont(w₂) = N₁₊(•,w₂)/N₁₊(•,•) (type counts, not token counts —
    * KN's defining idea). Unseen histories back off to p_cont alone;
    * unseen continuations contribute λ·p_cont (> 0, so scores are total).
    *
    * Scale shape: every table is an aggregate of the bigram relation
    * (vocab²-bounded — broadcast); TWO training scans (unigram + bigram)
    * and one scoring scan. */
  final case class KnModel(bigrams: DataFrame, hist: DataFrame, cont: DataFrame,
      nTypes: Long, discount: Double)

  def kneserNey(train: DataFrame, textCol: String = "text",
      discount: Double = 0.75): KnModel = {
    require(discount > 0 && discount < 1, s"discount in (0,1): $discount")
    val toks = train.select(TextFunctions.tokens(lower(col(textCol))).as("toks"))
      .filter(size(col("toks")) >= 2)
    val pairs = toks.select(explode(zip_with(
      slice(col("toks"), lit(1), size(col("toks")) - 1),
      slice(col("toks"), lit(2), size(col("toks")) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist = bi.groupBy("w1")
      .agg(sum("cnt").as("c1"), count(lit(1)).as("n_fwd"))
    val cont = bi.groupBy("w2").agg(count(lit(1)).as("n_bwd"))
    val nTypes = bi.count()
    KnModel(bi, hist, cont, nTypes, discount)
  }

  /** Per-doc conditional cross-entropy under the KN model (positions
    * 2..T, first token has no history). Returns (idCol, n_scored,
    * n_bigram_hits, cross_entropy, ppl). */
  def knPerplexity(docs: DataFrame, model: KnModel, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol),
        TextFunctions.tokens(lower(col(textCol))).as("toks"))
      .filter(size(col("toks")) >= 2)
    val pairs = toks.select(col(idCol), explode(zip_with(
      slice(col("toks"), lit(1), size(col("toks")) - 1),
      slice(col("toks"), lit(2), size(col("toks")) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col(idCol), col("p.w1"), col("p.w2"))
    val d = model.discount
    val t = model.nTypes.toDouble
    val scored = pairs
      .join(broadcast(model.bigrams), Seq("w1", "w2"), "left")
      .join(broadcast(model.hist), Seq("w1"), "left")
      .join(broadcast(model.cont), Seq("w2"), "left")
      .select(col(idCol), col("cnt").isNotNull.as("hit"),
        log(
          // continuation unigram (unseen w2 types contribute 0 mass from
          // cont but λ·(1/T)·0 would zero the prob — floor at 0.5/T, half
          // a type's worth, so scores stay total and deterministic)
          when(col("c1").isNull,
            coalesce(col("n_bwd").cast("double"), lit(0.5)) / t)
          .otherwise(
            greatest(coalesce(col("cnt").cast("double"), lit(0.0)) - d, lit(0.0))
              / col("c1") +
            (lit(d) * col("n_fwd") / col("c1")) *
              (coalesce(col("n_bwd").cast("double"), lit(0.5)) / t))).as("lp"))
    scored.groupBy(idCol)
      .agg(count(lit(1)).as("n_scored"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_bigram_hits"),
        (-avg(col("lp"))).as("cross_entropy"))
      .withColumn("ppl", exp(col("cross_entropy")))
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

  /** CCNet head/middle/tail split (Wenzek et al. 2020): per language,
    * rank documents by LM cross-entropy and cut into `buckets` equal-count
    * groups — head (lowest perplexity) is the highest-quality third that
    * CCNet ships as its primary training slice. Count-based `ntile`, not
    * value thresholds: deterministic, engine-mirrorable, and insensitive
    * to the CE distribution's shape. Ordering is (CE rounded to
    * `roundDigits`, id): the rounding is the cross-engine tie contract —
    * raw double CE is an `avg` whose summation order is
    * partitioning-dependent, so two engines can disagree below ~1e-12 and
    * flip near-tied ranks; rounding makes the sort key reproducible and
    * id breaks the remaining ties.
    *
    * SCALE CAVEAT (by design): `ntile` per language funnels each
    * language's docs through ONE window partition. Exact count-tertiles
    * are inherently a global sort per language — correct for gates,
    * reports, and mid-size corpora. At 100 TB use
    * [[perplexityBucketsAtScale]]: same semantics up to threshold
    * approximation, no single-partition funnel. */
  def perplexityBuckets(docs: DataFrame, model: UnigramModel,
      langCol: String = "lang", textCol: String = "text",
      idCol: String = "doc_id", buckets: Int = 3,
      roundDigits: Int = 4): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets: $buckets")
    import org.apache.spark.sql.expressions.Window
    val ce = perplexity(docs, model, textCol, idCol)
      .select(col(idCol), round(col("cross_entropy"), roundDigits).as("ce"))
    val withLang = docs.select(col(idCol), col(langCol)).join(ce, Seq(idCol))
    val nt = ntile(buckets).over(
      Window.partitionBy(langCol).orderBy(col("ce"), col(idCol)))
    withLang.select(col(idCol), col(langCol), col("ce").as("cross_entropy"),
      bucketName(nt, buckets).as("bucket"))
  }

  /** The 100-TB form of [[perplexityBuckets]]: per-language CE thresholds
    * from `approx_percentile` (one combinable aggregation — sketches
    * merge map-side, no per-language funnel), broadcast back, bucket by
    * comparison. Threshold placement is approximate (quantile sketch
    * accuracy), bucket SEMANTICS match: head = below the first cut.
    * `accuracy` is Spark's approx_percentile knob (10000 ≈ 0.01%%). */
  def perplexityBucketsAtScale(docs: DataFrame, model: UnigramModel,
      langCol: String = "lang", textCol: String = "text",
      idCol: String = "doc_id", buckets: Int = 3, roundDigits: Int = 4,
      accuracy: Int = 10000): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets: $buckets")
    val ce = perplexity(docs, model, textCol, idCol)
      .select(col(idCol), round(col("cross_entropy"), roundDigits).as("ce"))
    val withLang = docs.select(col(idCol), col(langCol)).join(ce, Seq(idCol))
    val probs = array((1 until buckets).map(i =>
      lit(i.toDouble / buckets)): _*)
    val cuts = withLang.groupBy(langCol)
      .agg(percentile_approx(col("ce"), probs, lit(accuracy)).as("cuts"))
    val joined = withLang.join(broadcast(cuts), Seq(langCol))
    // bucket index = number of cuts strictly below this CE (ties stay in
    // the lower bucket, matching ntile's earlier-groups-first fill)
    val idx = (size(filter(col("cuts"), c => c < col("ce"))) + 1)
    joined.select(col(idCol), col(langCol), col("ce").as("cross_entropy"),
      bucketName(idx, buckets).as("bucket"))
  }

  private def bucketName(n: Column, buckets: Int): Column =
    if (buckets == 3)
      when(n === 1, "head").when(n === 2, "middle").otherwise("tail")
    else concat(lit("b"), n.cast("string"))
}
