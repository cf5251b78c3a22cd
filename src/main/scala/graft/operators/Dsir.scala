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
  * Scale shape (100 TB stance):
  *  - features are HASHED (md5 → bucket in [0, buckets)) so the model is a
  *    fixed `buckets`-row relation no matter the vocabulary — no top-V
  *    collect, no OOV path; md5 keeps the bucketing engine-reproducible
  *    (same stance as [[Sampling.hashSplit]]).
  *  - one corpus scan tokenizes and aggregates (doc, bucket) counts — the
  *    only corpus-sized shuffle, keys are (id, small int).
  *  - the global model is a second aggregation of that relation down to
  *    `buckets` rows; totals are a 1-row aggregate cross-joined back
  *    (broadcast, q47's scalar pattern) — nothing collects to the driver.
  *  - per-doc weights are one broadcast join (buckets-bounded) + sum.
  *
  * Weight = Σ_f c_f(doc) · ln p̂_target(f)/p̂_raw(f), with
  * p̂(f) = (count(f) + 1) / (total + buckets) — add-one smoothing keeps
  * every bucket finite in both models. Raw = the WHOLE input (target
  * included), matching the paper's estimator.
  *
  * Returns (idCol, weight) for every input document; selection policy
  * (top-k, sampling) is the caller's.
  */
object Dsir {

  def importanceWeights(docs: DataFrame, isTarget: Column, buckets: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val bucket = pmod(
      conv(substring(md5(col("__token")), 1, 8), 16, 10).cast("long"), lit(buckets))
    val perDoc = docs
      .select(col(idCol), isTarget.as("__tgt"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("__token"))
      .select(col(idCol), col("__tgt"), bucket.as("__b"))
      .groupBy(col(idCol), col("__tgt"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // `perDoc` feeds both the model branch and the final weight join.
    // Declarative reuse does NOT happen here: column pruning drops `idCol`
    // from the model branch, the two exchange subtrees stop being
    // identical, and ReuseExchange no longer applies — the corpus would
    // tokenize TWICE (verified on the physical plan). The counts relation
    // is the smallest thing both branches share (≤ `buckets` rows per doc,
    // numeric-only — far smaller than the text it summarizes), so persist
    // it; the spill-able level keeps the 100 TB case safe ([[Bm25]]'s
    // stance). Released by the caller's cache lifecycle (Bench clears per
    // query; pipelines end their session).
    val model = perDoc.groupBy("__b").agg(
      sum(col("__c")).as("__rc"),
      sum(when(col("__tgt"), col("__c")).otherwise(0L)).as("__tc"))
    val totals = model.agg(
      sum(col("__rc")).as("__rt"), sum(col("__tc")).as("__tt"))
    val logRatio = model.crossJoin(broadcast(totals))
      .select(col("__b"),
        (log((col("__tc") + 1) / (col("__tt") + buckets)) -
          log((col("__rc") + 1) / (col("__rt") + buckets))).as("__lr"))
    perDoc.join(broadcast(logRatio), "__b")
      .groupBy(col(idCol))
      .agg(sum(col("__c") * col("__lr")).as("weight"))
  }
}
