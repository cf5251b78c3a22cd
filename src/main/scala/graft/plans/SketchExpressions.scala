package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Native Catalyst expressions for the sketch hot paths.
  *
  * The higher-order-function formulations (transform/aggregate lambdas) are
  * interpreted element-at-a-time with per-element InternalRow boxing — ~50 ms
  * per document for a 64-hash MinHash. These expressions do the same math in
  * a tight JVM loop per row (~µs): one xxhash64 per shingle, then k cheap
  * hashLong re-mixes — the standard one-hash/k-permutation MinHash
  * construction. CodegenFallback costs one virtual call per ROW (not per
  * element), which is noise at this arity.
  */

/** `minhash_signature(shingles, k)`: array<string> → array<long> where
  * `sig[i] = min over shingles of mix_i(xxhash64(shingle))`
  * (Broder '97 one-permutation-per-slot construction). */
case class MinHashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val h0 = XXH64.hashUTF8String(s, 42L)
      var i = 0
      while (i < k) {
        val h = XXH64.hashLong(h0, i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash64(tokens)`: array<string> → long Charikar sketch — per-bit vote
  * of +1/-1 across token hashes, bit set where the vote is positive. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val h = XXH64.hashUTF8String(s, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchExpressions {
  def minHashSignature(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignatureExpr(ColumnBridge.expression(shingles), k))

  def simHash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(tokens)))
}
