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
}
