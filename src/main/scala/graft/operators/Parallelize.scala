package graft.operators

import org.apache.spark.sql.DataFrame

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
  * Deliberately NOT for scan-speed metric passes: the exchange costs more
  * than the narrow work it parallelizes (the d10 counterexample in
  * SparkEntry's small-input parallelism NOTE; also measured round 16: the
  * moments pass and plain explode+groupBy shapes got SLOWER fanned).
  * Apply only where the per-row work dominates — measured round-16 wins:
  * d36 5.0 → 2.2 s, d88 4.3 → 1.5 s, d73 4.8 → 2.9 s at sf0.1. */
object Parallelize {
  def fanIfNarrow(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
