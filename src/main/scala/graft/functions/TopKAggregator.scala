package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy-hitters aggregate (Metwally et al. '05): tracks at
  * most `capacity` counters; when full, the minimum counter is reassigned
  * to the new item with count min+1. `finish` returns the top `k` by
  * (count desc, item asc).
  *
  * Guarantees: counts are exact while distinct items ≤ capacity (which the
  * oracle tests exploit); beyond that, over-estimates are bounded by the
  * evicted minimum — the standard heavy-hitters trade. Distributed
  * behavior: partial sketches merge by counter-sum then trim, so the
  * shuffle carries `capacity` counters per partition, never the stream.
  *
  * APPROXIMATION REGIME of the merge: the trim keeps the top `capacity` by
  * summed count WITHOUT folding the dropped counters' min-count into the
  * survivors, so after a lossy merge the per-item error bound is the SUM of
  * the per-partition evicted minima, not the single-sketch Space-Saving
  * bound (and an item dropped here cannot re-enter). Exactness still holds
  * whenever global distinct items ≤ capacity — the regime the d11/d12
  * oracles pin. Size `capacity` ≫ true top-k (the usual 10-100× rule) when
  * using it as a sketch.
  *
  * The reference has no aggregate surface at all (SURVEY §2.6); this is
  * the engine's `Aggregator`-shaped extension point, registered for SQL by
  * `functions.udaf`.
  */
case class TokenCount(item: String, cnt: Long)

class TopKAggregator(k: Int, capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Seq[TokenCount]] {

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long], item: String):
      mutable.HashMap[String, Long] = {
    b.get(item) match {
      case Some(c) => b.update(item, c + 1)
      case None if b.size < capacity => b.update(item, 1L)
      case None =>
        val (minItem, minCnt) = b.minBy(_._2)
        b.remove(minItem)
        b.update(item, minCnt + 1)
    }
    b
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (item, c) => a.update(item, a.getOrElse(item, 0L) + c) }
    if (a.size > capacity) {
      val kept = a.toSeq.sortBy { case (item, c) => (-c, item) }.take(capacity)
      a.clear()
      kept.foreach { case (item, c) => a.update(item, c) }
    }
    a
  }

  override def finish(b: mutable.HashMap[String, Long]): Seq[TokenCount] =
    b.toSeq.sortBy { case (item, c) => (-c, item) }.take(k)
      .map { case (item, c) => TokenCount(item, c) }

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Seq[TokenCount]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TokenCount]]()
}
