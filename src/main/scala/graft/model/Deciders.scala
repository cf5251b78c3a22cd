package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Named decider registry — fleet-level percentage switches gating message
  * sampling and whole-pipeline (instance) enablement
  * (reference: config/Decider.java:50,228; message use
  * processor/MemoryEfficientLogStreamProcessor.java:114-120; instance use
  * monitor/DefaultLogMonitor.java:203-224; config singer.thrift
  * logDecider / instanceDecider fields).
  *
  * Unknown deciders default to 100 (fully on), matching the reference's
  * fail-open behavior.
  */
case class Deciders(values: Map[String, Int]) {

  def percent(name: String): Int =
    math.max(0, math.min(100, values.getOrElse(name, 100)))

  /** Message-level gate: deterministic per-key pass (hash mod 100 <
    * percent); `rand()`-based when no key column is supplied. */
  def messageFilter(name: String, key: Option[Column] = None): Column = key match {
    case Some(k) => pmod(crc32(k.cast("string").cast("binary")), lit(100L)) < percent(name)
    case None => rand() * 100 < percent(name)
  }

  /** Instance-level gate: this host/pipeline processes the stream iff
    * `percent > hash(instanceId) mod 100` — stable per instance, spread
    * across a fleet. */
  def instanceAllowed(name: String, instanceId: String): Boolean =
    percent(name) > math.floorMod(instanceId.hashCode, 100)
}

object Deciders {
  val allOn: Deciders = Deciders(Map.empty)

  /** Parse `decider.<name>=<percent>` entries from properties text. */
  def fromProperties(text: String): Deciders = {
    val p = new java.util.Properties()
    p.load(new java.io.StringReader(text))
    import scala.jdk.CollectionConverters._
    Deciders(p.asScala.collect {
      case (k, v) if k.startsWith("decider.") => k.stripPrefix("decider.") -> v.trim.toInt
    }.toMap)
  }
}
