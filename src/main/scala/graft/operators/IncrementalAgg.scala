package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of an at-rest aggregate table (materialized-view
  * delta merge): the lakehouse pattern where a per-key stats table is kept
  * current by folding in arrival batches, never re-scanning history.
  *
  * The state row per key carries only MERGEABLE partials — count, sum,
  * min, max — so folding a delta is: delta → partial form (one map-side
  * combined aggregation over the batch), then union with the state and
  * re-aggregate on the key (sum the counts/sums, min the mins, max the
  * maxes). Non-mergeable readouts (avg) are derived at read time from the
  * partials. This is the batch twin of what Structured Streaming's
  * stateful aggregation does per micro-batch, as plain parquet-friendly
  * relations.
  *
  * Scale: each merge shuffles |state keys| + |delta partials| rows — the
  * key domain, not the event history. The delta aggregation map-side
  * combines, so raw batch rows never cross the wire either. At-least-once
  * ingestion note: folding the same batch twice double-counts; pair with
  * an epoch/batch-id high-water mark (the TransactionalEpochWriter
  * protocol) when the source can redeliver.
  */
object IncrementalAgg {

  /** A batch reduced to its mergeable partial-aggregate form. */
  def partials(batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol)).as("sum_v"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  /** Fold one delta (already in partial form) into the state. */
  def merge(state: DataFrame, deltaPartials: DataFrame, keys: Seq[String]): DataFrame =
    state.unionByName(deltaPartials)
      .groupBy(keys.map(col): _*).agg(
        sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Fold a sequence of raw arrival batches into the final state. */
  def fold(batches: Seq[DataFrame], keys: Seq[String], valueCol: String): DataFrame = {
    require(batches.nonEmpty, "need at least one batch")
    batches.map(partials(_, keys, valueCol))
      .reduce((s, d) => merge(s, d, keys))
  }
}
