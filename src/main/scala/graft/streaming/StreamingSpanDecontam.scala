package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Decontaminate, Dedup}

/** STANDING verbatim-passage decontamination — the streaming form of
  * [[graft.operators.Decontaminate.spanOverlap]]: benchmark/probe sets
  * change rarely, so their df-capped anchor index is signed ONCE and kept
  * at rest; every arriving micro-batch of corpus documents joins the
  * stored index and emits one verdict row per document (longest shared
  * verbatim run, contaminated flag). Verdicts are per-document and
  * independent of batching, so the cumulative output is trivially
  * batch-boundary invariant — the w24 gate runs the 3-batch fold against
  * d87's one-shot oracle to prove the AT-REST INDEX path (write → read →
  * join) preserves exact equality, not just the in-memory operator.
  *
  * One guard caveat (the StreamingCuration maxBucket stance): the
  * CORPUS-side df cap is evaluated within each arriving batch, so
  * invariance vs the one-shot run holds while the cap does not bind —
  * a gram hot across the whole corpus but cool within every batch passes
  * the per-batch cap. The cap is a quadratic-blowup safety valve, not a
  * semantic filter; the probe-side cap is fixed once at [[init]].
  *
  * Scale shape: the probe side never re-tokenizes or re-shuffles — the
  * index is parquet at rest, read per batch (benchmark-sized; cache it
  * for high-frequency triggers). Arriving batches pay one anchor explode
  * + one 8-byte-key join each, exactly [[Decontaminate.spanOverlapWithIndex]].
  */
object StreamingSpanDecontam {

  /** Sign the probe set once: its capped anchor index lands at rest. */
  def init(probes: DataFrame, dir: String, anchor: Int = 8, maxDf: Int = 64,
      textCol: String = "text", idCol: String = "doc_id"): Unit =
    Dedup.cappedAnchorIndex(probes, anchor, maxDf, textCol, idCol)
      .write.mode("overwrite").parquet(dir)

  /** Verdicts for one arriving batch against the at-rest probe index. */
  def judgeBatch(batch: DataFrame, indexDir: String, minSpan: Int = 10,
      anchor: Int = 8, maxDf: Int = 64, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    Decontaminate.spanOverlapWithIndex(batch,
      batch.sparkSession.read.parquet(indexDir),
      minSpan, anchor, maxDf, textCol, idCol)

  /** Batch twin the w24 gate runs: fold an id-ordered corpus through
    * [[judgeBatch]] in `nBatches` sequential id-range slices. */
  def judgeFold(docs: DataFrame, indexDir: String, nBatches: Int,
      minSpan: Int = 10, anchor: Int = 8, maxDf: Int = 64,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(nBatches >= 1, s"nBatches >= 1: $nBatches")
    val bounds = docs.agg(min(col(idCol)), max(col(idCol))).head()
    if (bounds.isNullAt(0))
      return judgeBatch(docs, indexDir, minSpan, anchor, maxDf, textCol, idCol)
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val span = (hi - lo) / nBatches + 1
    (0 until nBatches).map { b =>
      judgeBatch(
        docs.filter(col(idCol) >= lo + b * span && col(idCol) < lo + (b + 1) * span),
        indexDir, minSpan, anchor, maxDf, textCol, idCol)
    }.reduce(_ unionByName _)
  }

  /** The standing pipeline: a streaming corpus source judged per
    * micro-batch, verdicts written per-batch-id (replay-idempotent, the
    * LogPipeline audit stance). */
  def run(docs: DataFrame, indexDir: String, outDir: String,
      checkpointDir: String, minSpan: Int = 10, anchor: Int = 8,
      maxDf: Int = 64, textCol: String = "text",
      idCol: String = "doc_id"): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        judgeBatch(batch, indexDir, minSpan, anchor, maxDf, textCol, idCol)
          .write.mode("overwrite").parquet(s"$outDir/batch=$epoch")
        ()
      }
      .start()

  /** Cumulative verdicts written by [[run]] (the `batch=` partition key is
    * bookkeeping, not part of the verdict relation). */
  def verdicts(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("batch")
}
