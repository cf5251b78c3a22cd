package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic per-group sampling: the `k` rows with the smallest
  * `xxhash64(id)` in each group — a uniform sample (hash order is
  * uncorrelated with any data attribute) that is REPRODUCIBLE across
  * retries, partitionings and engines, unlike RNG reservoirs.
  *
  * Scale shape: a bounded `Aggregator` (see
  * [[graft.functions.BottomKByKeyAggregator]]) with map-side combine —
  * the shuffle carries at most k (id, hash) pairs per partition per
  * group. The window formulation
  * (`row_number() over (partition by g order by hash)`) shuffles and
  * sorts EVERY row; this one never materializes a group beyond k
  * elements. Same stance as d16's hash-mod sampling (rate-based) — this
  * is the fixed-size-per-group variant (corpus rebalancing with exact
  * per-stratum budgets).
  */
object Sampling {

  /** Sample `k` ids per group, smallest `xxhash64(idCol)` first (seed 42 —
    * Spark's default). Returns the group columns + `idCol`, one row per
    * sampled id. */
  def groupSample(df: DataFrame, groupCols: Seq[String], k: Int,
      idCol: String = "doc_id"): DataFrame = {
    // udaf flattens the case-class input encoder: one arg per field
    val bottomK = udaf(new graft.functions.BottomKByKeyAggregator(k))
    df.groupBy(groupCols.map(col): _*)
      .agg(bottomK(col(idCol).cast("long"), xxhash64(col(idCol))).as("sample"))
      .select(groupCols.map(col) :+ explode(col("sample")).as("s"): _*)
      .select(groupCols.map(col) :+ col("s.id").as(idCol): _*)
  }
}
