package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Data Selection with Importance Resampling (DSIR, Xie et al. 2023):
  * score every raw document by how much its hashed n-gram feature
  * distribution looks like a TARGET domain rather than the raw corpus,
  * using the log-likelihood ratio of two Laplace-smoothed bag-of-features
  * models. The classic recipe for "select pretraining data that resembles
  * a small high-quality corpus" — the estimator needs only feature COUNTS,
  * so it distributes as three hash aggregations.
  *
  * ONE estimator core ([[weightFromCounts]]), parameterized by feature
  * extractor and target semantics — the d66 gate (word unigrams, target =
  * a flagged subset of the input) and the d96 gate (unigrams + adjacent
  * bigrams, target = a separate corpus) are thin wrappers over it, so the
  * hash-bucketed add-one log-ratio exists exactly once.
  *
  * Scale shape (100 TB stance):
  *  - features are HASHED (md5 → bucket in [0, buckets)) so the model is a
  *    fixed `buckets`-row relation no matter the vocabulary — no top-V
  *    collect, no OOV path; md5 keeps the bucketing engine-reproducible
  *    (same stance as [[Sampling.hashSplit]]).
  *  - one corpus scan tokenizes and aggregates (doc, bucket) counts — the
  *    only corpus-sized shuffle, keys are (id, small int).
  *  - the global model is a second aggregation of that relation down to
  *    `buckets` rows; totals are 1-row aggregates cross-joined back
  *    (broadcast, q47's scalar pattern) — nothing collects to the driver.
  *  - per-doc weights are one broadcast join (buckets-bounded) + sum.
  *
  * Weight = Σ_f c_f(doc) · ln p̂_target(f)/p̂_raw(f), with
  * p̂(f) = (count(f) + 1) / (total + buckets) — add-one smoothing keeps
  * every bucket finite in both models.
  *
  * Selection policy (top-k, sampling) is the caller's.
  */
object Dsir {

  /** md5-hashed bucket of a gram column — the engine-recomputable idiom
    * shared with [[Sampling.hashSplit]]/[[Sampling.mixtureSample]]. */
  private def bucketOf(gram: Column, buckets: Int): Column =
    pmod(conv(substring(md5(gram), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Word-unigram gram instances: one row per token occurrence,
    * (keep-columns..., gram). The d66 feature set. */
  def unigramGrams(df: DataFrame, textCol: String, keep: Seq[Column]): DataFrame =
    df.select(keep :+
      explode(TextFunctions.tokens(lower(col(textCol)))).as("__g"): _*)

  /** Word unigrams + ADJACENT bigrams ("a b") — the d96 feature set
    * (position-adjacent, never all pairs; BudgetMixSpec pins that). */
  def unigramBigramGrams(df: DataFrame, textCol: String,
      keep: Seq[Column]): DataFrame = {
    val toks = TextFunctions.tokens(lower(col(textCol)))
    val uni = df.select(keep :+ explode(toks).as("__g"): _*)
    val bi = df.select(keep :+ toks.as("__tk"): _*)
      .select(keep :+ explode(
        when(size(col("__tk")) >= 2,
          transform(sequence(lit(1), size(col("__tk")) - 1),
            i => concat(element_at(col("__tk"), i), lit(" "),
              element_at(col("__tk"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("__g"): _*)
    uni.unionByName(bi)
  }

  /** THE estimator core: SOURCE per-(doc, bucket) instance counts
    * `perDoc` = (idCol, __b, __c) + TARGET per-bucket counts `tgtCounts`
    * = (__b, __tc) → (idCol, weight). Buckets the target uses but the
    * source never hashes into contribute only to the target total (their
    * lr row would join nothing); totals ride 1-row broadcast cross joins,
    * the lr relation is ≤ `buckets` rows and broadcasts into the per-doc
    * sum — nothing corpus-sized shuffles past `perDoc` itself. */
  private def weightFromCounts(perDoc: DataFrame, tgtCounts: DataFrame,
      buckets: Int, idCol: String): DataFrame = {
    val rcRel = perDoc.groupBy("__b").agg(sum(col("__c")).as("__rc"))
    val rtot = rcRel.agg(sum(col("__rc")).as("__rt"))
    val ttot = tgtCounts.agg(coalesce(sum(col("__tc")), lit(0L)).as("__tt"))
    val logRatio = rcRel.join(tgtCounts, Seq("__b"), "left")
      .crossJoin(broadcast(rtot)).crossJoin(broadcast(ttot))
      .select(col("__b"),
        (log((coalesce(col("__tc"), lit(0L)) + 1) / (col("__tt") + buckets)) -
          log((col("__rc") + 1) / (col("__rt") + buckets))).as("__lr"))
    perDoc.join(broadcast(logRatio), "__b")
      .groupBy(col(idCol))
      .agg(sum(col("__c") * col("__lr")).as("weight"))
  }

  /** Flagged-subset form (the d66 gate): raw = the WHOLE input, target =
    * the `isTarget` rows — the paper's estimator, over word unigrams. ONE
    * corpus scan: the persisted per-doc count relation feeds the raw
    * model, the target model (a flag-filtered re-aggregation of it), and
    * the final weight join. Declarative reuse does NOT happen without the
    * persist: column pruning makes the branches' exchange subtrees differ
    * and the corpus would tokenize twice (verified on the physical plan).
    * The counts relation is the smallest thing all branches share
    * (≤ `buckets` rows per doc, numeric-only); the spill-able level keeps
    * the 100 TB case safe ([[Bm25]]'s stance). Released by the caller's
    * cache lifecycle (Bench clears per query; pipelines end their
    * session). */
  def importanceWeights(docs: DataFrame, isTarget: Column, buckets: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val perDocAll = unigramGrams(docs, textCol,
        Seq(col(idCol), isTarget.as("__tgt")))
      .select(col(idCol), col("__tgt"), bucketOf(col("__g"), buckets).as("__b"))
      .groupBy(col(idCol), col("__tgt"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tgtCounts = perDocAll.filter(col("__tgt"))
      .groupBy("__b").agg(sum(col("__c")).as("__tc"))
    weightFromCounts(perDocAll.select(col(idCol), col("__b"), col("__c")),
      tgtCounts, buckets, idCol)
  }

  /** Separate-target-corpus form (the d96 gate): raw = `docs`, target = a
    * standalone corpus (which may or may not be a subset of `docs`), over
    * unigram + adjacent-bigram features. Returns (idCol, weight) with
    * weight rounded to `roundDigits` — the cross-engine sum-order
    * contract, same as Bm25.topK scores. The per-doc count relation is
    * persisted for its two consumers (raw model + weight join) and
    * released after the eager checkpoint of the ~16-bytes/doc result. */
  def dsirWeights(docs: DataFrame, target: DataFrame, nBuckets: Int = 256,
      textCol: String = "text", idCol: String = "doc_id",
      roundDigits: Int = 4): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val perDoc = unigramBigramGrams(docs, textCol, Seq(col(idCol)))
      .select(col(idCol), bucketOf(col("__g"), nBuckets).as("__b"))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))
      .persist(MEMORY_AND_DISK)
    val tgtCounts = unigramBigramGrams(target, textCol, Seq(col(idCol)))
      .select(bucketOf(col("__g"), nBuckets).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__tc"))
    val out = weightFromCounts(perDoc, tgtCounts, nBuckets, idCol)
      .select(col(idCol), round(col("weight"), roundDigits).as("weight"))
      // eager so the count cache can be released before returning; the
      // materialized relation is one (id, double) row per doc — orders of
      // magnitude under the corpus text it scores
      .localCheckpoint(true)
    perDoc.unpersist(false)
    out
  }
}
