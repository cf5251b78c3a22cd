package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Streaming first/second raw moments of a `dim`-d vector column in ONE
  * bounded partial aggregation: buffer = [n, sum(d), upper-tri raw
  * co-moments (d(d+1)/2)] — for d=64 that is 2 145 doubles per partition,
  * merged pairwise by plain addition (exactly commutative/associative up to
  * float re-association, the usual distributed-sum contract).
  *
  * This is the covariance input for [[graft.operators.Pca]]: the 100 TB
  * corpus streams through one narrow pass and only O(d²) state ever crosses
  * an exchange — never rows. The explode-to-(i,j)-pairs formulation would
  * shuffle d²/2 rows PER VECTOR (a 2000× write amplification at d=64);
  * MLlib's RowMatrix.computeCovariance does exactly this accumulation shape
  * (treeAggregate of a Gramian) for the same reason.
  */
class MomentsAggregator(dim: Int)
    extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {

  private val triLen = dim * (dim + 1) / 2

  override def zero: Array[Double] = new Array[Double](1 + dim + triLen)

  override def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
    require(v.length == dim, s"vector length ${v.length} != dim $dim")
    val x = v.toArray
    b(0) += 1.0
    var i = 0
    while (i < dim) { b(1 + i) += x(i); i += 1 }
    var k = 1 + dim
    i = 0
    while (i < dim) {
      val xi = x(i)
      var j = i
      while (j < dim) { b(k) += xi * x(j); j += 1; k += 1 }
      i += 1
    }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Double]): Seq[Double] = b.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    Encoders.kryo[Array[Double]]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object MomentsAggregator {

  /** Decoded driver-side moments: count, per-dim sums, full symmetric raw
    * second-moment matrix. */
  final case class Moments(n: Long, sums: Array[Double], raw: Array[Array[Double]])

  def decode(dim: Int, flat: Seq[Double]): Moments = {
    val n = flat.head.toLong
    val sums = flat.slice(1, 1 + dim).toArray
    val raw = Array.ofDim[Double](dim, dim)
    var k = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        raw(i)(j) = flat(k); raw(j)(i) = flat(k); j += 1; k += 1
      }
      i += 1
    }
    Moments(n, sums, raw)
  }
}
