package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Hamilton largest-remainder apportionment over INTEGER weights — the
    * exact-budget half of temperature mixing ([[temperatureRates]] is the
    * rate half): distribute `budget` slots so group g gets
    * floor(budget·w_g/W) plus one of the `budget − Σfloor` extras, extras
    * to the largest remainders (budget·w_g mod W), ties to the smaller
    * key. Pure long arithmetic end to end — no float weight shares, so an
    * independent replay (the d95 oracle does it in SQL) allocates
    * IDENTICALLY; quotient/remainder comparisons can never flip on a
    * last-bit division. Driver-side over the (group, weight) relation —
    * vocabulary-sized, like centroid tables. */
  def largestRemainder(weights: Seq[(String, Long)], budget: Long): Map[String, Long] = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    require(weights.forall(_._2 >= 0), s"weights must be >= 0: $weights")
    val w = weights.map(_._2).sum
    if (w == 0L) return weights.map { case (g, _) => g -> 0L }.toMap
    // budget*weight rides a long — fail loudly instead of wrapping at
    // pathological (budget, weight) extremes (exactness is the contract)
    val maxW = weights.map(_._2).max
    require(maxW == 0L || budget <= Long.MaxValue / maxW,
      s"budget * max weight overflows long: budget=$budget maxWeight=$maxW" +
        " — rescale the weights (e.g. divide by their gcd)")
    val base = weights.map { case (g, wt) =>
      (g, budget * wt / w, budget * wt % w) }
    val extras = budget - base.map(_._2).sum
    val bumped = base.sortBy { case (g, _, rem) => (-rem, g) }
      .zipWithIndex
      .map { case ((g, fl, _), i) => g -> (fl + (if (i < extras) 1L else 0L)) }
    bumped.toMap
  }

  /** Exact integer sqrt (floor) — the fixed τ=2 temperature weight the
    * d95 gate uses: BigInteger.sqrt, no float on the Spark side; the SQL
    * replay's floor(sqrt(n::DOUBLE)) agrees exactly for any n < 2^52
    * (IEEE sqrt is correctly rounded, and the only integer within a
    * half-ulp of k² is k² itself, so the floor can never flip). */
  def isqrt(n: Long): Long = {
    require(n >= 0, s"isqrt of negative: $n")
    java.math.BigInteger.valueOf(n).sqrt().longValueExact()
  }

  /** Deterministic per-group quota take: within each group, keep the
    * `quotas(group)` rows with the smallest md5(id) (id breaks the
    * astronomically-unlikely digest tie) — engine-recomputable selection,
    * no RNG, same stance as [[mixtureSample]]'s hash bucket. A group's
    * quota caps at its size implicitly (row_number never exceeds it).
    * Returns (the group col, idCol, pick) with pick = 1-based selection
    * rank.
    *
    * Scale shape: one window per group keyed on `groupCol` — exact, and
    * fine while no single group dwarfs an executor (the d92 exactSplit
    * trade, documented there); for huge skewed groups use
    * [[takePerGroupSkewSafe]] — the md5-threshold prefilter + exact
    * boundary top-up form with IDENTICAL output (property-pinned). */
  def takePerGroup(df: DataFrame, groupCol: String, quotas: Map[String, Long],
      idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val q = quotas.toSeq.toDF(groupCol, "quota")
    df.select(col(groupCol), col(idCol))
      .withColumn("pick", row_number().over(w).cast("long"))
      .join(broadcast(q), Seq(groupCol))
      .filter(col("pick") <= col("quota"))
      .select(col(idCol), col(groupCol), col("pick"))
  }

  /** [[takePerGroup]] with the documented 100-TB skew guard implemented:
    * identical output (the quota rows with the smallest (md5(id), id) per
    * group, 1-based `pick` rank), but no group ever funnels its FULL row
    * set through one window task. The realistic failure mode of the plain
    * window form is a single dominant group — one crawl source or mega
    * cluster holding most of the corpus — serializing on one executor;
    * here that group's window only ever sees a budget-bounded slice.
    *
    * How: the selection key's first 8 md5 hex digits, read as a uniform
    * 32-bit integer, admit an md5-THRESHOLD PREFILTER that is downward
    * closed under the full (md5, id) ordering (lexicographic order on
    * same-length lowercase hex = numeric order, and the full-key order
    * refines the prefix order) — so if a group keeps at least
    * min(quota, n) survivors, its top-quota survivors ARE its true
    * top-quota rows with the same ranks. Thresholds are sized from the
    * per-group counts with a safety factor + additive slack
    * (keep ≈ safetyFactor·quota + slack of n, uniform by construction),
    * making a shortfall a measure-zero tail event; the EXACT TOP-UP then
    * re-windows only the groups whose survivor count fell short of
    * min(quota, n) — a correctness fallback, never the expected path.
    *
    * Scale shape: one bounded groupBy for counts (group-cardinality
    * driver relation, the same stance as the `quotas` argument itself),
    * one broadcast threshold join + codegen'd prefilter (the only
    * corpus-wide pass, no shuffle), a window over the
    * O(Σ safetyFactor·quota + slack) survivors, and a survivor-count
    * check (bounded). Equivalence to the window form on every group
    * shape — including forced-shortfall thresholds — is property-pinned
    * in BudgetMixSpec. */
  def takePerGroupSkewSafe(df: DataFrame, groupCol: String,
      quotas: Map[String, Long], idCol: String = "doc_id",
      safetyFactor: Double = 4.0, slack: Long = 64L,
      precomputedCounts: Map[String, Long] = Map.empty): DataFrame = {
    require(safetyFactor >= 0 && slack >= 0,
      s"safetyFactor/slack must be >= 0: $safetyFactor/$slack")
    require(quotas.values.forall(_ >= 0), s"quotas must be >= 0: $quotas")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol), col(idCol))
    // per-group counts: bounded by group cardinality (the quotas map is
    // already a driver-side relation of the same size). Callers that
    // already aggregated counts to size their quotas (d95/d97) pass them
    // through instead of paying the groupBy twice.
    val counts =
      if (precomputedCounts.nonEmpty) precomputedCounts
      else base.groupBy(groupCol).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // threshold on the first-8-hex-digit key, per group: keep every row
    // whose key32 < t. t sized so E[survivors] = safetyFactor·q + slack.
    val Key32Span = 1L << 32
    val thresholds = quotas.toSeq.flatMap { case (g, quota) =>
      counts.get(g).map { n =>
        val q = math.min(quota, n)
        val want = safetyFactor * q + slack
        val t = if (q == 0L) 0L
          else if (want >= n) Key32Span
          else math.min(Key32Span, math.ceil(Key32Span * want / n).toLong)
        (g, quota, t)
      }
    }
    if (thresholds.isEmpty)
      return base.limit(0)
        .select(col(idCol), col(groupCol), lit(0L).as("pick"))
    val key32 = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val thr = thresholds.toDF(groupCol, "quota", "t")
    val pre = base.join(broadcast(thr), Seq(groupCol))
      .filter(key32 < col("t"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    // eager-checkpoint the selection: it is Σ-quota-bounded (tiny at any
    // corpus size), and BOTH the shortfall check below and the returned
    // frame read it — without the checkpoint the prefilter+window plan
    // executes twice
    val sel = pre
      .withColumn("pick", row_number().over(w).cast("long"))
      .filter(col("pick") <= col("quota"))
      .select(col(idCol), col(groupCol), col("pick"))
      .localCheckpoint(true)
    // a group is EXACT iff its survivor count reached min(quota, n): the
    // selected count then equals min(quota, n) (downward closure). The
    // check relation is group-cardinality bounded.
    val selCounts = sel.groupBy(groupCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val short = thresholds.collect { case (g, quota, _)
      if selCounts.getOrElse(g, 0L) < math.min(quota, counts(g)) => g }
    if (short.isEmpty) sel
    else {
      // exact top-up: re-window ONLY the shortfall groups over their full
      // rows — the tail-probability fallback that keeps the contract exact
      val shortQ = thresholds.filter(t => short.contains(t._1))
        .map { case (g, quota, _) => (g, quota) }.toDF(groupCol, "quota")
      val redo = base.join(broadcast(shortQ), Seq(groupCol))
        .withColumn("pick", row_number().over(w).cast("long"))
        .filter(col("pick") <= col("quota"))
        .select(col(idCol), col(groupCol), col("pick"))
      sel.filter(!col(groupCol).isin(short: _*)).unionByName(redo)
    }
  }

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

  /** Deterministic train/val/test assignment: every row gets a stable
    * `bucket` in [0, 100) from its id and the first split whose cumulative
    * weight exceeds the bucket. The contract of a dataset split is that it
    * never changes — across engines, re-runs, partitionings, or row order —
    * so membership is a pure function of the id: bucket = the first 8 md5
    * hex digits of the id's decimal string as an integer, mod 100. md5
    * (not xxhash) because the split must be recomputable by ANY engine a
    * downstream consumer uses (md5 is universal; reference intent mirrors
    * the decider hash-mod stance of d16/s5). A narrow codegen'd projection:
    * no shuffle, no RNG, no state.
    *
    * `splits` are (label, percent) with percents summing to 100; label
    * boundaries follow `splits` order (e.g. train [0,80), val [80,90),
    * test [90,100)). */
  /** Mixture sampling: per-group deterministic keep-rates — the data-mixing
    * step that reweights corpus sources before training (downsample crawl,
    * upsample curated sources). Rates are BASIS POINTS (kept per 10 000) so
    * the keep test is integer-vs-integer — no float threshold can disagree
    * across engines. Membership is a pure md5 function of the id like
    * [[hashSplit]] (stable across re-runs, partitionings, and engines) but
    * over a SALTED digest (`md5(id || ":" || salt)`): an unsalted digest
    * would be the very value hashSplit buckets on, and then any keep-rate
    * that is not a multiple of 100 bp confines the kept set to the low
    * split buckets (e.g. rate 37 bp ⇒ digest mod 10000 < 37 ⇒ digest
    * mod 100 < 37 ⇒ every kept row lands in 'train' under an 80/10/10
    * split — and [[temperatureRates]] routinely emits such rates). The
    * default salt decorrelates the two; callers composing several
    * independent sampling stages give each its own salt. A narrow
    * codegen'd projection + filter: no shuffle, no RNG, no state at any
    * corpus size.
    *
    * Returns the kept rows with their `bucket` and applied `rate_bp`. */
  def mixtureSample(df: DataFrame, id: Column, groupCol: String,
      ratesBp: Map[String, Int], defaultBp: Int = 10000,
      salt: String = "mix"): DataFrame = {
    require((ratesBp.values ++ Seq(defaultBp)).forall(r => r >= 0 && r <= 10000),
      s"rates are basis points in [0, 10000]: $ratesBp default=$defaultBp")
    val bucket = pmod(
      conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
        .cast("long"), lit(10000))
    val rate = ratesBp.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0))) { case (w, (k, r)) =>
        w.when(col(groupCol) === k, lit(r))
      }.otherwise(lit(defaultBp)).cast("long")
    df.withColumn("bucket", bucket)
      .withColumn("rate_bp", rate)
      .filter(col("bucket") < col("rate_bp"))
  }

  /** Temperature reweighting (mT5/UniMax-style): turn per-source corpus
    * counts into [[mixtureSample]] keep-rates whose OUTPUT distribution is
    * ∝ count^(1/T). Since a keep-rate cannot exceed 1, rates are scaled so
    * the most-upweighted (smallest) source keeps everything and larger
    * sources are downsampled: rate_i ∝ count_i^(1/T − 1), max → 10000 bp.
    * T = 1 reproduces the natural distribution (all 10000); T → ∞ flattens
    * toward uniform output. Driver-side pure arithmetic over the
    * (source, count) relation — vocabulary-sized, like centroid tables. */
  def temperatureRates(counts: Map[String, Long], temperature: Double): Map[String, Int] = {
    require(temperature > 0, s"temperature must be positive: $temperature")
    require(counts.values.forall(_ > 0), s"counts must be positive: $counts")
    val exp = 1.0 / temperature - 1.0
    val raw = counts.view.mapValues(c => math.pow(c.toDouble, exp)).toMap
    val mx = raw.values.max
    raw.view.mapValues(w => math.max(1, math.round(10000.0 * w / mx).toInt)).toMap
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES,
    * Information Processing Letters '06): the k rows minimizing
    * −ln(u_i)/w_i, where u_i ∈ (0,1) is a per-row uniform. Inclusion
    * probability is proportional to weight in the without-replacement
    * sense — THE quality-weighted subcorpus selection step (keep 1M docs
    * favoring high quality scores).
    *
    * The uniform is deterministic, not RNG: u = (first 8 md5 hex digits of
    * `id:salt` + 0.5) / 2³². Same engine-recomputable stance as
    * [[hashSplit]]/[[mixtureSample]] (salted so composed sampling stages
    * decorrelate), and +0.5 keeps u strictly inside (0,1) — no ln(0).
    *
    * Scale shape: one narrow codegen'd pass computes keys, then a global
    * top-k by `orderBy(key).limit(k)` — TakeOrderedAndProject (per-partition
    * top-k, k-row driver merge), NEVER a global sort. The key transform
    * −ln(u)/w is the strictly-monotone equivalent of maximizing u^(1/w)
    * (the paper's form) and is float-stable for tiny weights. */
  def weightedSample(df: DataFrame, id: Column, weight: Column, k: Int,
      salt: String = "wrs"): DataFrame = {
    val u = (conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    // the A-ES key is only meaningful for w > 0: a negative weight would
    // sort the WORST rows first, zero yields ±Inf/NaN keys — drop such
    // rows explicitly (the documented contract, mirroring mixtureSample's
    // basis-point validation) rather than let them poison the top-k
    df.filter(weight.cast("double") > 0)
      .withColumn("u", u)
      .withColumn("wkey", -log(col("u")) / weight.cast("double"))
      .orderBy(col("wkey"), id)
      .limit(k)
  }

  /** Token-budget corpus selection: take documents best-quality-first
    * until the token budget is exhausted — "give me the best N-billion
    * tokens" (data mixing / budgeted pretraining subset selection).
    * Greedy prefix semantics: documents are ordered by (`quality` DESC,
    * `idCol` ASC) and a document is selected iff the running token total
    * BEFORE it plus its own count fits the budget — the first document
    * that overflows is dropped and so is everything after it (no
    * knapsack backfill; deterministic and engine-mirrorable).
    *
    * Returns one row per input document:
    * (idCol, n_tokens, cum_tokens, selected) where `cum_tokens` is the
    * exclusive running sum in selection order.
    *
    * Scale shape: the naive `sum(n) over (order by q desc)` is a
    * single-partition window — the whole corpus through one task.
    * This is instead [[Packing.packSequences]]' distributed prefix sum
    * re-keyed on quality: range-partition by (q desc, id), sort within
    * partitions (the operator's ONE shuffle, on (id, n, q) triples —
    * never text), per-partition totals to the driver (numPartitions
    * longs), broadcast exclusive bases, one running-sum pass. */
  def selectUnderTokenBudget(docs: DataFrame, budget: Long, quality: Column,
      countCol: Column, idCol: String = "doc_id",
      numPartitions: Int = 0): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // persisted because BOTH passes must see the identical partition
    // layout (range partitioning re-samples per computation); never
    // explicitly unpersisted — the result stays lazily derived from it,
    // and once the caller drops their reference Spark's ContextCleaner
    // reclaims the blocks on GC (the CurationPipeline stance; an eager
    // checkpoint-then-unpersist here would materialize a corpus-sized
    // relation instead)
    val scored = docs
      .select(col(idCol).cast("long"), countCol.cast("long"),
        quality.cast("double"))
      .toDF("id", "n", "q")
      .as[(Long, Long, Double)]
      .repartitionByRange(parts, col("q").desc, col("id"))
      .sortWithinPartitions(col("q").desc, col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition token totals — metadata-sized at any scale
    val totals = scored.rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var s = 0L
        it.foreach(s += _._2)
        Iterator((pid, s))
      }
      .collect()
      .sortBy(_._1)
    val bases = new Array[Long](totals.length)
    var acc = 0L
    totals.foreach { case (pid, s) => bases(pid) = acc; acc += s }
    val basesB = spark.sparkContext.broadcast(bases)
    // pass 2: within-partition running sum seeded from the broadcast base
    scored
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var off = basesB.value(pid)
        it.map { case (id, n, _) =>
          val start = off
          off += n
          (id, n, start, start + n <= budget)
        }
      }
      .toDF(idCol, "n_tokens", "cum_tokens", "selected")
  }

  /** EXACT-count stratified split: within every group (stratum), rows are
    * ordered by (md5(id), id) — a reproducible pseudo-random order — and
    * cut at exact floor boundaries, so a 10-row stratum under 80/10/10
    * yields exactly 8/1/1 regardless of hash luck. [[hashSplit]] is
    * proportional only IN EXPECTATION (a 10-row stratum can easily land
    * 10/0/0), which breaks per-language eval sets on small strata; this
    * is the exact-count complement. Split `i` takes rows with rank in
    * (floor(n·cum_{i-1}/100), floor(n·cum_i/100)] — the LAST split always
    * absorbs the remainder (cum = 100 ⇒ boundary = n).
    *
    * SCALE CAVEAT (by design): rank-within-stratum is a per-group window
    * — each stratum funnels through one partition. Strata are small-
    * cardinality dimensions (language, source) whose per-group row count
    * is the reason exactness matters; for huge uniform strata where the
    * funnel would hurt, [[hashSplit]]'s law-of-large-numbers
    * proportionality is already exact enough and stays shuffle-light. */
  def exactSplit(df: DataFrame, groupCols: Seq[String], id: Column,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split percents must sum to 100: $splits")
    require(splits.forall(_._2 > 0), s"split percents must be positive: $splits")
    // refuse to silently clobber caller data — "split" is a natural
    // column name in exactly the pipelines that call this (review
    // finding); the rank/count helpers use a graft-reserved prefix
    require(!df.columns.contains("split"),
      "input already has a 'split' column — rename it before exactSplit")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
    val ranked = df
      .withColumn("_graft_rn", row_number().over(
        w.orderBy(md5(id.cast("string")), id)).cast("long"))
      .withColumn("_graft_n", count(lit(1)).over(w))
    val cum = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    def boundary(c: Int): Column =
      floor(col("_graft_n") * c / lit(100.0)).cast("long")
    val first = when(col("_graft_rn") <= boundary(cum.head), lit(splits.head._1))
    val label = splits.zip(cum).tail.foldLeft(first) {
      case (acc, ((name, _), hi)) =>
        acc.when(col("_graft_rn") <= boundary(hi), lit(name))
    }
    ranked.withColumn("split", label).drop("_graft_rn", "_graft_n")
  }

  def hashSplit(df: DataFrame, id: Column, splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split percents must sum to 100: $splits")
    require(splits.forall(_._2 > 0), s"split percents must be positive: $splits")
    val bucket = pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(100))
    val cum = splits.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val labeled = splits.zip(cum)
    val first = when(bucket < labeled.head._2, lit(labeled.head._1._1))
    val split = labeled.tail.foldLeft(first) { case (w, ((name, _), hi)) =>
      w.when(bucket < hi, lit(name))
    }
    df.withColumn("bucket", bucket).withColumn("split", split)
  }
}
