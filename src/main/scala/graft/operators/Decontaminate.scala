package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Benchmark decontamination at scale: flag corpus documents sharing any
  * word n-gram with a probe (benchmark) set.
  *
  * The exact plan (see SparkEntry d14) explodes both sides to
  * (shingle-hash, id) and equi-joins — right up to the point where the
  * probe's distinct shingle set no longer fits a broadcast hash relation.
  * This variant inserts a BLOOM PRE-FILTER: a bloom filter over the probe
  * hashes (~10 bits/item at 1% fpp — ~32× smaller than the hash relation)
  * is built with `stat.bloomFilter` (distributed treeAggregate) and
  * broadcast; the corpus side drops non-colliding shingles BEFORE the join
  * shuffle. Bloom filters have no false negatives, and the exact join
  * afterwards removes the false positives — so the output is bit-identical
  * to the exact plan while the shuffle carries only the (tiny) surviving
  * fraction.
  *
  * The membership probe is a scala UDF (no public `might_contain` in the
  * DataFrame API): a deliberate trade — a few xxhash probes per row against
  * shuffle volume proportional to the whole corpus. It sits behind the
  * codegen'd shingle explode and ahead of the shuffle, where it pays for
  * itself; everything else stays expression-based.
  */
object Decontaminate {

  /** (doc_id, n_shared) for corpus docs sharing ≥1 n-gram with the probe
    * docs. Same result as the exact explode-join; bloom-pruned shuffle. */
  def bloomPruned(corpus: DataFrame, probe: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 4, fpp: Double = 0.01): DataFrame = {
    val spark = corpus.sparkSession
    val probeHashes = probe
      .select(explode(HashFunctions.shingleHashes(col(textCol), n)).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nProbe = probeHashes.count() // scalar; also materializes the persist
    val bloom = probeHashes.stat.bloomFilter("h", math.max(nProbe, 1L), fpp)
    val bloomB = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((h: Long) => bloomB.value.mightContainLong(h))
    corpus
      .select(col(idCol), explode(HashFunctions.shingleHashes(col(textCol), n)).as("h"))
      .filter(mightContain(col("h")))
      .join(probeHashes, "h") // exact verify: false positives die here
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
  }

  /** VERBATIM-SPAN decontamination: one verdict row per corpus doc with
    * the longest exact token run it shares with ANY probe/benchmark doc
    * (`max_span`, 0 when clean) and the number of such runs of at least
    * `minSpan` tokens. Set-overlap decontamination ([[bloomPruned]], the
    * n-gram family) flags SHARED VOCABULARY; this flags SHARED PASSAGES —
    * the "exact substring is memorizable" stance of the Lee et al. 2021
    * dedup line applied to benchmark leakage, catching a verbatim quoted
    * question that n-gram Jaccard under its threshold would pass.
    *
    * Scale shape = [[Dedup.sharedSpans]]'s bipartite half: anchor-gram
    * inverted index on each side (df-capped), equi-join on the gram,
    * diagonal gaps-and-islands runs, then one aggregation per corpus doc.
    * The probe side is benchmark-sized (small); the corpus side streams
    * through the gram shuffle once. */
  def spanOverlap(corpus: DataFrame, probe: DataFrame, minSpan: Int = 10,
      anchor: Int = 8, maxDf: Int = 64, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    spanOverlapWithIndex(corpus,
      Dedup.cappedAnchorIndex(probe, anchor, maxDf, textCol, idCol),
      minSpan, anchor, maxDf, textCol, idCol)

  /** [[spanOverlap]] against a PRE-BUILT probe anchor index (the at-rest
    * form [[graft.streaming.StreamingSpanDecontam]] maintains: benchmark
    * sets change rarely, so a standing pipeline signs them once and every
    * arriving batch joins the stored index instead of re-deriving it). */
  def spanOverlapWithIndex(corpus: DataFrame, probeIdx: DataFrame,
      minSpan: Int = 10, anchor: Int = 8, maxDf: Int = 64,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val corpusIdx = Dedup.cappedAnchorIndex(corpus, anchor, maxDf, textCol, idCol)
    val spans = Dedup.diagonalSpans(corpusIdx, probeIdx, samePool = false,
      anchor, minSpan)
    val perDoc = spans.groupBy(col("doc_a").as(idCol))
      .agg(count(lit(1)).as("n_spans"), max(col("span_tokens")).as("max_span"))
    corpus.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("max_span"), lit(0L)).as("max_span"),
        (coalesce(col("max_span"), lit(0L)) >= minSpan).as("contaminated"))
  }
}
