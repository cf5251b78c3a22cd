package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing for training corpora: k-anonymity over quasi-identifier
  * combinations — the standard re-identification risk check run before a
  * dataset leaves a pipeline (complementing [[Redaction]]'s direct-PII
  * scrubbing: redaction removes identifiers, k-anonymity bounds what the
  * REMAINING attribute combinations still reveal).
  *
  * Scale shape: one hash aggregation on the quasi-identifier tuple for the
  * audit; enforcement joins the (small, classes-below-k) suppression
  * relation back on the same key — broadcastable whenever violations are
  * rare, which is the operating point (a mostly-violating dataset is
  * unreleasable anyway). No windows, no sorts, no driver materialization.
  */
object Privacy {

  /** Per-equivalence-class audit: the quasi-identifier columns, the class
    * size `n`, and `anonymous = n >= k`. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[Column],
      names: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && quasiCols.length == names.length,
      "one name per quasi-identifier column")
    df.groupBy(quasiCols.zip(names).map { case (c, n) => c.as(n) }: _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("anonymous", col("n") >= k)
  }

  /** Enforcement by suppression: drop every row whose quasi-identifier
    * class has fewer than `k` members (the release-safe subset). The
    * violating-class relation is the join's small side.
    *
    * The anti-join condition is NULL-SAFE (`<=>` per quasi column): a
    * sub-k class keyed by a null QI value must still be suppressed — with
    * plain `=` the null key never matches and violating rows silently
    * survive, which for a privacy-enforcement operator is a safety defect,
    * not a semantics nit. The helper columns are prefixed `_qi_` so a
    * caller-supplied `names` entry equal to an existing data column is
    * never overwritten or dropped from the output. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[Column],
      names: Seq[String], k: Long): DataFrame = {
    val qi = names.map(n => s"_qi_$n")
    val keyed = df.withColumns(qi.zip(quasiCols).toMap)
    val bad = kAnonymityAudit(df, quasiCols, names, k)
      .filter(!col("anonymous"))
      .select(names.zip(qi).map { case (n, q) => col(n).as(q) }: _*)
    val cond = qi.map(q => keyed(q) <=> bad(q)).reduce(_ && _)
    keyed.join(bad, cond, "left_anti").drop(qi: _*)
  }

  /** Differentially-private group-count release: per-group counts with
    * Laplace(`scale`) noise (ε = sensitivity/scale; count queries have
    * sensitivity 1, so scale = 1/ε — Dwork et al. 2006). The noise draw
    * is a DETERMINISTIC function of the group key and `seed` (md5 → a
    * 52-bit uniform → inverse-CDF Laplace), the reproducible-release
    * form a pipeline needs: re-running the job republishes the SAME
    * noised statistics instead of leaking fresh independent draws of
    * the same true counts (each re-release would otherwise spend more
    * of the privacy budget).
    *
    * THE SEED IS A SECRET and has no default (round-14 advisory): the
    * noise is exactly recomputable by anyone who knows it, so a public
    * or guessable seed voids the ε guarantee outright — treat it like a
    * key (per-dataset, from a secret store, never a constant in code).
    * SCOPE OF THE GUARANTEE: determinism buys reproducibility for ONE
    * release of ONE fixed dataset. Releasing noised counts of a CHANGED
    * dataset under the same seed reuses identical noise per surviving
    * group, so count DELTAS between the releases are exact — a new
    * release of changed data must use a fresh secret seed (and spends
    * fresh budget, exactly as the composition theorem prices it).
    *
    * Determinism construction (cross-engine exact up to one `ln`):
    * u = (first 13 md5 hex chars + 0.5) / 2^52 — u ∈ (0, 1), never
    * exactly 0.5 (integer + 0.5 over a power of two), so the inverse
    * CDF −scale·sign(u−½)·ln(1−2|u−½|) never sees ln(0) and the sign
    * is never ambiguous. All arithmetic before the `ln` is exact in
    * doubles. Scale shape: ONE hash aggregation; the noise is a narrow
    * codegen'd projection on the group-count relation (group-cardinality
    * sized, never corpus-sized). */
  def dpNoisedCounts(df: DataFrame, groupCols: Seq[Column],
      names: Seq[String], scale: Double, seed: String,
      roundDigits: Int = 4): DataFrame = {
    require(groupCols.nonEmpty && groupCols.length == names.length,
      "one name per group column")
    require(scale > 0.0, s"Laplace scale must be > 0: $scale")
    require(seed != null && seed.nonEmpty,
      "dpNoisedCounts needs an explicit SECRET seed: the noise is exactly " +
        "recomputable from it, so a defaulted/public seed voids the epsilon " +
        "guarantee")
    val counts = df
      .groupBy(groupCols.zip(names).map { case (c, n) => c.as(n) }: _*)
      .agg(count(lit(1)).as("n"))
    val key = concat_ws("|", lit(seed) +: names.map(n => col(n).cast("string")): _*)
    val u = (conv(substring(md5(key), 1, 13), 16, 10).cast("double") + 0.5) /
      lit(4503599627370496.0) // 2^52
    val centered = u - 0.5
    val noise = -lit(scale) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    counts.select(names.map(col) :+
      round(col("n") + noise, roundDigits).as("noised_count"): _*)
  }
}
