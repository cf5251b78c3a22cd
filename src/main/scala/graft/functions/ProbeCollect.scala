package graft.functions

import org.apache.spark.sql.{DataFrame, Row}

/** Bounded driver-side collect for probe/query relations that re-enter
  * the plan as LOCAL relations (the round-16 store-probe stance: collect
  * the rank-list-sized probe batch once, make every downstream broadcast
  * build job-free).
  *
  * Those relations are rank-list-sized BY CONTRACT; this makes the
  * contract ENFORCED instead of asserted in a comment: the collected row
  * count is checked against `spark.graft.probe.maxLocalRows` (default
  * 1,000,000 — orders of magnitude above any real probe batch, orders of
  * magnitude below a corpus) and a violation fails LOUDLY with the knob
  * named, instead of degrading into a driver-memory incident. Byte-level
  * protection during the collect itself is Spark's own
  * `spark.driver.maxResultSize` (guide §5), which aborts oversized
  * collects before the driver heap fills; the row cap catches the
  * contract breach even when the rows are small enough to slip under it.
  *
  * Deliberately NOT `limit(cap+1).collect()`: CollectLimit executes
  * take-style over growing partition batches — one to three extra little
  * jobs per probe, exactly the per-gate job floor round 16 cut. */
object ProbeCollect {
  val MaxRowsKey = "spark.graft.probe.maxLocalRows"
  val DefaultMaxRows = 1000000

  def collectBounded(df: DataFrame, what: String): Array[Row] = {
    val cap = df.sparkSession.conf.getOption(MaxRowsKey)
      .map(_.toInt).getOrElse(DefaultMaxRows)
    val rows = df.collect()
    if (rows.length > cap)
      throw new IllegalArgumentException(
        s"$what: probe relation collected ${rows.length} rows, over the " +
          s"$MaxRowsKey cap of $cap — probe batches are rank-list-sized " +
          "by contract (pass a bounded query set, or raise the cap)")
    rows
  }
}
