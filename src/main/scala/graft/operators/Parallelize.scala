package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.PlanExpression
import org.apache.spark.sql.execution.{FileSourceScanExec, LocalTableScanExec, RDDScanExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.Exchange

/** Input-parallelism guard for per-row-HEAVY passes (guide §2.5's
  * input-skew/parallelism fix, derived from the plan rather than a tuned
  * constant).
  *
  * A small single-row-group parquet input plans as ONE scan task, so a
  * heavy expression pass over it (shingling, MinHash signatures, char-gram
  * featurization, anchor-window hashing) runs single-threaded while the
  * rest of the cluster idles. [[fanIfNarrow]] round-robins such an input to
  * the session parallelism FIRST; it is a NO-OP whenever the input already
  * plans ≥ defaultParallelism partitions — a production-scale scan has
  * thousands of splits, so no shuffle is ever added there.
  *
  * Narrowness is read from the INITIAL physical plan's scan leaves, never
  * from `Dataset.rdd`: with AQE on, `.rdd` forces the final plan, which
  * EXECUTES every upstream shuffle stage as real jobs whose results are
  * then thrown away (the actual action re-plans from scratch), and an
  * AQE-coalesced shuffle can legitimately report < defaultParallelism
  * partitions at production scale — exactly the frame that must NOT be
  * re-fanned. So: scan-rooted plans (file / local / RDD leaves, no
  * Exchange, no subquery) fan when their planned split count is narrow;
  * any derived (post-shuffle) frame is left alone — its parallelism is the
  * shuffle's to decide. Callers that KNOW a derived frame needs a fan
  * apply it explicitly at the call site.
  *
  * Deliberately NOT for scan-speed metric passes: the exchange costs more
  * than the narrow work it parallelizes (the d10 counterexample in
  * SparkEntry's small-input parallelism NOTE; also measured round 16: the
  * moments pass and plain explode+groupBy shapes got SLOWER fanned).
  * Apply only where the per-row work dominates — measured round-16 wins:
  * d36 5.0 → 2.2 s, d88 4.3 → 1.5 s, d73 4.8 → 2.9 s at sf0.1. */
object Parallelize {
  def fanIfNarrow(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    scanParallelism(df) match {
      case Some(n) if n < par => df.repartition(par)
      case _ => df
    }
  }

  /** Planned partition count of a scan-rooted frame, WITHOUT executing
    * anything. None (= leave the frame alone) when the plan contains an
    * Exchange or a subquery, or a leaf whose partitioning isn't readable
    * driver-side. Inspects the PREPARED plan (post-EnsureRequirements —
    * `sparkPlan` predates exchange insertion; under AQE that is the
    * adaptive node's initialPlan, available without executing any
    * stage). Reading `inputRDDs()` / leaf RDD handles only builds RDD
    * metadata (file splits are already listed at planning time) — no job
    * runs. */
  private def scanParallelism(df: DataFrame): Option[Int] = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val derived = plan.exists {
      case _: Exchange => true
      case p => p.expressions.exists(_.exists(_.isInstanceOf[PlanExpression[_]]))
    }
    if (derived) return None
    val counts = plan.collectLeaves().map {
      case f: FileSourceScanExec => Some(f.inputRDDs().head.getNumPartitions)
      case b: BatchScanExec => Some(b.inputRDDs().head.getNumPartitions)
      case r: RDDScanExec => Some(r.rdd.getNumPartitions)
      case _: LocalTableScanExec =>
        // LocalTableScanExec parallelizes its rows itself (numSlices from
        // leafNodeDefaultParallelism) — never narrow in the sense above
        None
      case _ => None
    }
    if (counts.exists(_.isEmpty)) None
    else Some(counts.flatten.sum).filter(_ => counts.nonEmpty)
  }
}
