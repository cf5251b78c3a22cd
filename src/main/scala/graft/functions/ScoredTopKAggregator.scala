package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (candidate id, score) pair; output rows are best-first. */
case class Scored(id: Long, score: Double)

/** Bounded top-k by (score desc, id asc) — the shuffle-free form of
  * "rank ≤ k per group".
  *
  * The `Window.partitionBy(group)` formulation shuffles EVERY scored row and
  * lands each group in a single task — for ANN that is |corpus|×|queries|
  * rows through the exchange and one task holding a whole query's corpus.
  * As an `Aggregator`, partial aggregation bounds each partition's
  * contribution to k rows per group BEFORE the exchange: the shuffle carries
  * ≤ k×partitions rows per group and the merge is a k-way sorted merge.
  * Deterministic under any merge order (total order on (score, id)).
  */
class ScoredTopKAggregator(k: Int)
    extends Aggregator[Scored, mutable.ArrayBuffer[Scored], Seq[Scored]] {

  private def beats(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: mutable.ArrayBuffer[Scored] = mutable.ArrayBuffer.empty

  /** Buffer kept sorted best-first, capped at k (insertion into ≤k items). */
  override def reduce(b: mutable.ArrayBuffer[Scored], in: Scored):
      mutable.ArrayBuffer[Scored] = {
    if (b.size < k || beats(in, b.last)) {
      var i = b.size
      while (i > 0 && beats(in, b(i - 1))) i -= 1
      b.insert(i, in)
      if (b.size > k) b.remove(b.size - 1)
    }
    b
  }

  override def merge(a: mutable.ArrayBuffer[Scored], b: mutable.ArrayBuffer[Scored]):
      mutable.ArrayBuffer[Scored] = {
    b.foreach(s => reduce(a, s))
    a
  }

  override def finish(b: mutable.ArrayBuffer[Scored]): Seq[Scored] = b.toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[Scored]] =
    Encoders.kryo[mutable.ArrayBuffer[Scored]]
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

object ScoredTopK {

  /** The shared "top-k per group, exploded with ranks" shape: groupBy
    * `keyCols`, bounded top-k of (`idCol`, `scoreCol`) by (score desc,
    * id asc), one output row per hit as (keyCols…, rank, idName,
    * scoreName) with rank 1 = best. ONE definition so the tie/rank
    * contract (ids ascending on equal scores, rank = position + 1)
    * cannot silently diverge between the retrieval operators that share
    * it (Bm25.topK, Hybrid.jaccardTopK, Hybrid.rrfFuse). */
  def rankTopK(scored: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
      idCol: org.apache.spark.sql.Column, scoreCol: org.apache.spark.sql.Column,
      k: Int, idName: String,
      scoreName: String = "score"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val topk = udaf(new ScoredTopKAggregator(k))
    scored.groupBy(keyCols.map(col): _*)
      .agg(topk(idCol, scoreCol).as("hits"))
      .select(keyCols.map(col) :+ posexplode(col("hits")): _*)
      .select(keyCols.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idName), col("col.score").as(scoreName)): _*)
  }
}
