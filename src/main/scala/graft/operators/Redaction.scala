package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training-data pipelines: replace emails / IPv4
  * addresses / NANP-style phone numbers with typed placeholder tokens and
  * count what was removed (the counts feed corpus-quality dashboards and
  * per-source compliance audits).
  *
  * Patterns deliberately use the regex intersection of Java's engine and
  * RE2 (`\d`, `\b`, non-capturing groups, bounded repetition) so the exact
  * same pattern strings drive both the Spark expressions and external SQL
  * engines — no dialect translation step to drift.
  *
  * Scale: pure codegen'd `regexp_replace` / `regexp_extract_all` column
  * expressions — narrow, no shuffle, runs at scan speed; redaction order
  * is fixed (emails, then IPs, then phones) and each stage rewrites the
  * previous stage's output so placeholders are never re-matched.
  */
object Redaction {

  /** Works in both Java regex and RE2. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"

  /** Redacted text column: emails → `<EMAIL>`, IPv4 → `<IP>`, phones →
    * `<PHONE>`, applied in that order. */
  def redactText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailToken),
        Ipv4Pattern, IpToken),
      PhonePattern, PhoneToken)

  /** Count of matches of `pattern` in `text` (long). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Redact `textCol`, appending per-type redaction counts. Counts are
    * computed on the same staged inputs the replacements see, so a phone
    * number inside an email local part is only counted once (as the
    * email). */
  def redact(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailPattern, EmailToken)
    val t2 = regexp_replace(t1, Ipv4Pattern, IpToken)
    docs
      .withColumn("n_emails", matchCount(t0, EmailPattern))
      .withColumn("n_ips", matchCount(t1, Ipv4Pattern))
      .withColumn("n_phones", matchCount(t2, PhonePattern))
      .withColumn(textCol, regexp_replace(t2, PhonePattern, PhoneToken))
  }
}
