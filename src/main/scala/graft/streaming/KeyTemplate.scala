package graft.streaming

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.UUID

/** Object-key templating for rolled sink files — semantics of the reference's
  * S3 key format (reference: writer/s3/S3Writer.java:493-579,
  * config.thrift:146-183):
  *
  *  - `{{TOKEN}}`  — default tokens: UUID (8 chars), TIMESTAMP
  *    (yyyyMMddHHmmss), HOST, LOGNAME, and timestamp parts
  *    y / M / d / H / m / S
  *  - `${ENV_VAR}` — environment mappings
  *  - `%{group}`   — named capture groups extracted from the source filename
  *    via a configured pattern; on no-match the key is returned with `%{}`
  *    tokens unreplaced (reference behavior)
  *
  * Unknown tokens pass through verbatim — same as commons-text
  * StringSubstitutor with no default.
  */
case class KeyTemplate(
    keyFormat: String,
    logName: String,
    hostname: String = LogPipeline.hostname,
    filenamePattern: Option[String] = None,
    filenameTokens: Seq[String] = Nil,
    env: Map[String, String] = Map.empty) {

  // derived, non-serializable helpers — rebuilt after deserialization on
  // executors (the template itself ships inside sink closures)
  @transient private lazy val fmt =
    DateTimeFormatter.ofPattern("yyyyMMddHHmmss").withZone(ZoneOffset.UTC)
  @transient private lazy val compiledPattern = filenamePattern.map(_.r.pattern)

  private def substitute(s: String, prefix: String, suffix: String,
      values: Map[String, String]): String =
    values.foldLeft(s) { case (acc, (k, v)) => acc.replace(prefix + k + suffix, v) }

  /** Render the object key. `nowMs`/`uuid` injectable for deterministic
    * tests; production uses wall clock + random UUID like the reference. */
  def render(sourceFilename: String = "",
      nowMs: Long = System.currentTimeMillis(),
      uuid: String = UUID.randomUUID().toString.substring(0, 8)): String = {
    val ts = fmt.format(Instant.ofEpochMilli(nowMs))
    val defaults = Map(
      "UUID" -> uuid,
      "TIMESTAMP" -> ts,
      "HOST" -> hostname,
      "LOGNAME" -> logName,
      "y" -> ts.substring(0, 4), "M" -> ts.substring(4, 6), "d" -> ts.substring(6, 8),
      "H" -> ts.substring(8, 10), "m" -> ts.substring(10, 12), "S" -> ts.substring(12, 14))
    var key = substitute(keyFormat, "{{", "}}", defaults)
    key = substitute(key, "${", "}", env)
    for (p <- compiledPattern) {
      val m = p.matcher(sourceFilename)
      if (m.matches()) {
        val groups = filenameTokens.flatMap { tok =>
          Option(m.group(tok)).map(tok -> _)
        }.toMap
        key = substitute(key, "%{", "}", groups)
      }
      // no match: leave %{} tokens unreplaced (reference: S3Writer.java:568-575)
    }
    key
  }
}
