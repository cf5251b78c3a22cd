package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Hot-bucket skew guard for LSH-style bucket self-joins.
  *
  * A bucket of m rows emits O(m²) candidate pairs, so one hot key — a
  * million byte-identical documents is NORMAL in a web crawl — turns the
  * band join quadratic (10¹² pairs from a single band-key group). The guard
  * bounds that without changing small-bucket results:
  *
  *  1. bucket sizes are counted first (one aggregation on the band keys);
  *  2. buckets ≤ `maxBucket` take the plain self-join — byte-identical
  *     results to the unguarded operator;
  *  3. oversized buckets collapse rows with EQUAL payload (same MinHash
  *     signature / SimHash / vector — pairs the verify step would accept at
  *     any threshold) to their min-id representative, emitting STAR pairs
  *     (rep → member): linear in group size and the same connected
  *     components as the clique, which is what dedup consumes;
  *  4. only representatives re-enter the pair join; buckets whose DISTINCT
  *     payload count still exceeds `maxBucket` (adversarial collisions of
  *     genuinely different content) are dropped from the pair join — counted
  *     in the observed metrics, never silently — while their members keep
  *     the star pairs from step 3.
  */
object SkewGuard {

  /** Distinct candidate (id_a < id_b) pairs from a self-join of `rows` on
    * `keys`, skew-guarded as described above.
    *
    * `rows` must carry the key columns, `idCol` (orderable, unique per
    * entity) and `payloadCol` (the sketch the bucket key was derived from —
    * equal payloads are collapsed via xxhash64, a 2⁻⁶⁴ false-merge risk that
    * downstream verification re-checks anyway). `label` names the observed
    * metrics (`skew_guard_<label>`: collapsed_members, dropped_buckets) and
    * must be unique within a single query.
    */
  def guardedSelfJoinPairs(rows: DataFrame, keys: Seq[String], idCol: String,
      payloadCol: String, maxBucket: Int, label: String): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val keyCols = keys.map(col)
    val base = rows.select(
      keyCols :+ col(idCol).as("__id") :+ xxhash64(col(payloadCol)).as("__pk"): _*)
    val sizes = base.groupBy(keyCols: _*).agg(count(lit(1)).as("__n"))
    // The guard must not tax the healthy case: first find the OVERSIZED
    // bucket keys (one map-side-combined count job, carrying only keys).
    // Zero hot buckets — the overwhelmingly common case — takes the plain
    // self-join, the exact unguarded plan: no tag join, no union, no extra
    // shuffle of the banded rows. A small hot set is broadcast so tagging
    // is a broadcast (anti/semi) join; only an adversarial flood of hot
    // buckets (> MaxBroadcastBuckets) pays the full shuffle tag join.
    val oversized = sizes.filter(col("__n") > maxBucket)
    val nOver = oversized.limit(MaxBroadcastBuckets + 1).count()
    if (nOver == 0) {
      return base.select(keyCols :+ col("__id").as("id_a"): _*)
        .join(base.select(keyCols :+ col("__id").as("id_b"): _*), keys)
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
    }
    val overKeys =
      if (nOver <= MaxBroadcastBuckets) broadcast(oversized.select(keyCols: _*))
      else oversized.select(keyCols: _*)
    val small = base.join(overKeys, keys, "left_anti")
      .select(keyCols :+ col("__id"): _*)

    val big = base.join(overKeys, keys) // oversized keys are unique: no fan-out
    val groups = big.groupBy(keyCols :+ col("__pk"): _*)
      .agg(min(col("__id")).as("__rep"), count(lit(1)).as("__gn"))
    val star = big.join(groups.select((keyCols :+ col("__pk") :+ col("__rep")): _*),
        keys :+ "__pk")
      .filter(col("__id") =!= col("__rep"))
      .select(col("__rep").as("id_a"), col("__id").as("id_b"))

    val reps = groups.select(keyCols :+ col("__rep").as("__id") :+ col("__gn"): _*)
    val repSizes = reps.groupBy(keyCols: _*).agg(count(lit(1)).as("__rn"))
    // dropped_buckets counts BUCKETS from row-level flow: each flagged
    // bucket contributes __rn rows weighted 1/__rn. The observe node rides
    // ONLY the id_a side — a self-join duplicating one CollectMetrics name
    // silently drops the metrics.
    val repsSizedRaw = reps.join(repSizes, keys)
    val repsSized = repsSizedRaw
      .observe(s"skew_guard_$label",
        sum(when(col("__gn") > 1, col("__gn") - 1).otherwise(0L)).as("collapsed_members"),
        sum(when(col("__rn") > maxBucket, lit(1.0) / col("__rn")).otherwise(0.0))
          .as("dropped_buckets"))
    def keptSide(r: DataFrame): DataFrame = small.unionByName(
      r.filter(col("__rn") <= maxBucket).select(keyCols :+ col("__id"): _*))

    val pairs = keptSide(repsSized)
      .select(keyCols :+ col("__id").as("id_a"): _*)
      .join(keptSide(repsSizedRaw).select(keyCols :+ col("__id").as("id_b"): _*), keys)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    pairs.unionByName(star).distinct()
  }

  /** Per-bucket audit relation: one row per bucket key with its row count,
    * distinct-payload count, and disposition ('plain' ≤ cap, 'collapsed',
    * 'dropped' if distinct payloads still exceed the cap). This is the
    * explicit audit path for the guard: the observe() metrics on the pair
    * join disappear when AQE's empty-relation propagation prunes the whole
    * subtree (it does exactly that when EVERY bucket is dropped), so an
    * operator run that returns suspiciously few pairs should be audited with
    * this — it is one aggregation over the banded rows, cheap relative to
    * the join it guards. */
  def bucketStats(rows: DataFrame, keys: Seq[String], payloadCol: String,
      maxBucket: Int): DataFrame = {
    val keyCols = keys.map(col)
    rows.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("bucket_rows"),
        countDistinct(xxhash64(col(payloadCol))).as("distinct_payloads"))
      .withColumn("disposition",
        when(col("bucket_rows") <= maxBucket, "plain")
          .when(col("distinct_payloads") <= maxBucket, "collapsed")
          .otherwise("dropped"))
  }

  /** Join-key skew audit: the one-row diagnostic to run BEFORE choosing a
    * join strategy (plain shuffle vs `Joins.saltedJoin` vs AQE skew
    * splitting). One (key, count) hash aggregation — the shuffle carries
    * key partials, never rows — then a key-domain stats pass and a
    * TakeOrderedAndProject top-10; no global sort of the frequency
    * relation. All shares are exact integer basis points, so the readout
    * is bit-stable across engines and runs.
    *
    * Interpretation: `top1_bp` ≈ the fraction of all rows a single reduce
    * task receives on an unsalted shuffle of this key — at 10000/32 ≈
    * 312 bp (local[32]) one task holds more than an even share of the
    * whole input, and a 1000-executor cluster is no better because the
    * hot KEY is indivisible without salting. */
  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    val freq = df.groupBy(col(keyCol)).agg(count(lit(1)).as("f"))
    val top10 = freq.orderBy(col("f").desc, col(keyCol))
      .limit(10).agg(sum(col("f")).as("top10_rows"))
    val stats = freq.agg(count(lit(1)).as("n_keys"), sum(col("f")).as("n_rows"),
      max(col("f")).as("max_freq"))
    stats.crossJoin(top10) // two 1-row frames — broadcast NLJ, not a scale risk
      .select(col("n_rows"), col("n_keys"), col("max_freq"),
        expr("max_freq * 10000 div n_rows").as("top1_bp"),
        expr("top10_rows * 10000 div n_rows").as("top10_bp"),
        expr("max_freq * n_keys div n_rows").as("max_vs_mean"))
  }

  /** AQE-aware observed-metrics collection: `qe.observedMetrics` returns
    * empty when the CollectMetrics node ends up inside an adaptive query
    * stage (Spark 4.1, AQE on — the default), so walk into
    * AdaptiveSparkPlanExec / QueryStageExec wrappers explicitly. */
  def observedMetrics(qe: QueryExecution): Map[String, org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.CollectMetricsExec
    val buf = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.Row]
    def walk(p: SparkPlan): Unit = p.foreach {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => walk(s.plan)
      case c: CollectMetricsExec => buf += c.name -> c.collectedMetrics
      case _ => ()
    }
    walk(qe.executedPlan)
    buf.toMap
  }

  /** Log any nonzero skew-guard metrics after each query — the "no silent
    * cap" half of the contract. Idempotent per session. */
  def registerMetricsLogger(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      registered += spark
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          observedMetrics(qe).foreach { case (name, row) =>
            if (name.startsWith("skew_guard_")) {
              val collapsed = row.getAs[Long]("collapsed_members")
              val dropped = Option(row.getAs[Any]("dropped_buckets"))
                .map(_.asInstanceOf[Number].doubleValue()).getOrElse(0.0)
              if (collapsed > 0 || dropped > 0)
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"$name: collapsed_members=$collapsed dropped_bucket_ratio=$dropped " +
                    "(oversized LSH buckets were collapsed/dropped; see SkewGuard scaladoc)")
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
      })
    }
  }

  private val registered = scala.collection.mutable.Set.empty[SparkSession]

  /** Hot-bucket key sets up to this size are broadcast for the tag join;
    * beyond it (an adversarial all-duplicates corpus) the guard falls back
    * to the shuffle tag join rather than blowing the driver. */
  val MaxBroadcastBuckets: Int = 100000
}
