package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element of [[BottomKByKeyAggregator]]: an id ranked by a long sort key
  * (typically a hash — deterministic uniform sampling). Public: Janino
  * codegen cannot touch private case-class accessors. */
case class KeyedId(id: Long, key: Long)

/** Bounded bottom-k by (key asc, id asc): keeps at most `k` elements per
  * aggregation state, so the map-side combine ships ≤ k ids per partition
  * per group instead of every row — the window-free form of
  * `row_number() over (partition by g order by key) <= k`. Keys are LONGS
  * (not double scores): hash sort keys must order exactly, and doubles
  * lose integer ordering above 2^53. */
class BottomKByKeyAggregator(k: Int)
    extends Aggregator[KeyedId, mutable.ArrayBuffer[KeyedId], Seq[KeyedId]] {

  private def beats(a: KeyedId, b: KeyedId): Boolean =
    a.key < b.key || (a.key == b.key && a.id < b.id)

  override def zero: mutable.ArrayBuffer[KeyedId] = mutable.ArrayBuffer.empty

  /** Buffer kept sorted best(smallest)-first, capped at k. */
  override def reduce(b: mutable.ArrayBuffer[KeyedId], in: KeyedId):
      mutable.ArrayBuffer[KeyedId] = {
    if (b.size < k || beats(in, b.last)) {
      var i = b.size
      while (i > 0 && beats(in, b(i - 1))) i -= 1
      b.insert(i, in)
      if (b.size > k) b.remove(b.size - 1)
    }
    b
  }

  override def merge(a: mutable.ArrayBuffer[KeyedId], b: mutable.ArrayBuffer[KeyedId]):
      mutable.ArrayBuffer[KeyedId] = {
    b.foreach(s => reduce(a, s))
    a
  }

  override def finish(b: mutable.ArrayBuffer[KeyedId]): Seq[KeyedId] = b.toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[KeyedId]] =
    Encoders.kryo[mutable.ArrayBuffer[KeyedId]]
  override def outputEncoder: Encoder[Seq[KeyedId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KeyedId]]()
}
