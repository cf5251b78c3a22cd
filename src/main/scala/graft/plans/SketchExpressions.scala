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

/** `minhash_shingle_signature(tokens, n, k)`: array<string> → array<long>.
  * Fuses word-n-gram shingling INTO the MinHash: each token is hashed once,
  * each n-token window combines those hashes with a chain mix, and the k
  * signature slots take mins over window hashes. No shingle strings are ever
  * materialized (duplicates can't change a min, so no distinct needed) —
  * ~100× less allocation than shingle-string construction at 100 TB. */
case class MinHashShingleSigExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_shingle_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nTok = arr.numElements()
    val tokHashes = new Array[Long](nTok)
    var j = 0
    while (j < nTok) {
      val s = arr.getUTF8String(j)
      tokHashes(j) = XXH64.hashUTF8String(s, 42L)
      j += 1
    }
    val sig = Array.fill(k)(Long.MaxValue)
    val nWin = math.max(nTok - (n - 1), if (nTok > 0) 1 else 0)
    var w = 0
    while (w < nWin) {
      var h0 = tokHashes(w)
      var d = 1
      while (d < n && w + d < nTok) {
        h0 = XXH64.hashLong(tokHashes(w + d), h0)
        d += 1
      }
      var i = 0
      while (i < k) {
        val h = XXH64.hashLong(h0, i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      w += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `shingle_hashes(tokens, n)`: array<string> → array<long> of DISTINCT
  * chained word-n-gram hashes. Tokens are whitespace-split, so the
  * join-with-space string form is injective over token windows — making the
  * chained hash a bijective stand-in for the distinct shingle STRING set
  * (2⁻⁶⁴ collision risk aside) with none of the string materialization.
  * Fewer than n tokens hash the whole token chain (the [whole-doc] shingle
  * of the string form); an empty token array emits the empty-string hash so
  * empty docs keep the string form's [""] semantics. Consumers: set
  * overlap/decontamination joins, repetition ratios. */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nTok = arr.numElements()
    if (nTok == 0)
      return new GenericArrayData(Array[Any](
        XXH64.hashUTF8String(org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8, 42L)))
    val tokHashes = new Array[Long](nTok)
    var j = 0
    while (j < nTok) {
      tokHashes(j) = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      j += 1
    }
    val nWin = math.max(nTok - (n - 1), 1)
    val out = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      var h0 = tokHashes(w)
      var d = 1
      while (d < n && w + d < nTok) {
        h0 = XXH64.hashLong(tokHashes(w + d), h0)
        d += 1
      }
      out(w) = h0
      w += 1
    }
    // distinct via sort + in-place dedupe (allocation-light)
    java.util.Arrays.sort(out)
    var uniq = 1
    var i = 1
    while (i < nWin) {
      if (out(i) != out(i - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    val res = new Array[Any](uniq)
    var r = 0
    while (r < uniq) { res(r) = out(r); r += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `positional_shingle_hashes(tokens, n)`: array<string> → array<long>
  * where element w is the chained hash of the FULL n-token window starting
  * at w — POSITIONAL, non-distinct, aligned for `posexplode` (element index
  * = window start). Unlike [[ShingleHashesExpr]] there is no short-doc
  * whole-chain fallback: fewer than n tokens yield an EMPTY array, because
  * the consumer is span-level dedup ([[graft.operators.Dedup.removeDupSpans]])
  * where a doc shorter than the span length cannot contain a qualifying
  * span. Same chained-token XXH64 as ShingleHashesExpr, so equal windows
  * hash equal across both expressions. */
case class PositionalShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "positional_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nTok = arr.numElements()
    val nWin = nTok - (n - 1)
    if (nWin <= 0) return new GenericArrayData(Array.empty[Any])
    val tokHashes = new Array[Long](nTok)
    var j = 0
    while (j < nTok) {
      tokHashes(j) = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      j += 1
    }
    val out = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      var h0 = tokHashes(w)
      var d = 1
      while (d < n) {
        h0 = XXH64.hashLong(tokHashes(w + d), h0)
        d += 1
      }
      out(w) = h0
      w += 1
    }
    new GenericArrayData(out)
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

/** `count_in_set(tokens, set)`: array<string> → int — how many elements are
  * members of a compile-time string set. Replaces the interpreted
  * `size(filter(toks, array_contains(...)))` lambda in stopword-ratio and
  * language-ID scoring (one hash-set probe per token instead of a per-token
  * lambda frame). */
case class CountInSetExpr(child: Expression, values: Seq[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "count_in_set"

  @transient private lazy val set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](values.size * 2)
    values.foreach(v => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(v)))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var count = 0
    var j = 0
    while (j < n) {
      if (set.contains(arr.getUTF8String(j))) count += 1
      j += 1
    }
    java.lang.Integer.valueOf(count)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `murmur3_partition(key)`: the reference's MurmurByteArrayPartitioner
  * EXACTLY (reference: writer/partitioners/MurmurByteArrayPartitioner.java:
  * 30-52): Guava `murmur3_32()` (seed 0) over the key bytes, then the
  * double-abs `Math.abs(Math.abs(h) % n)`. Spark's builtin `hash` is
  * murmur3 with seed 42 and `pmod` differs from double-abs on negative
  * hashes, so bit-parity needs this native form (Guava-pinned by spec).
  * The murmur3 x86-32 algorithm is public domain (Austin Appleby). */
case class Murmur3PartitionExpr(child: Expression, numPartitions: Int)
    extends UnaryExpression with CodegenFallback {
  require(numPartitions > 0, "numPartitions must be positive")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "murmur3_partition"

  override protected def nullSafeEval(input: Any): Any = {
    val h = Murmur3PartitionExpr.murmur3x86_32(input.asInstanceOf[Array[Byte]], 0)
    java.lang.Integer.valueOf(math.abs(math.abs(h) % numPartitions))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Murmur3PartitionExpr {
  def murmur3x86_32(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val blockEnd = data.length & ~3
    var i = 0
    while (i < blockEnd) {
      var k1 = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 4
    }
    var k1 = 0
    (data.length & 3) match {
      case 3 =>
        k1 ^= (data(blockEnd + 2) & 0xff) << 16
        k1 ^= (data(blockEnd + 1) & 0xff) << 8
        k1 ^= data(blockEnd) & 0xff
      case 2 =>
        k1 ^= (data(blockEnd + 1) & 0xff) << 8
        k1 ^= data(blockEnd) & 0xff
      case 1 =>
        k1 ^= data(blockEnd) & 0xff
      case _ => ()
    }
    if ((data.length & 3) != 0) {
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2; h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }
}

object SketchExpressions {
  def minHashSignature(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignatureExpr(ColumnBridge.expression(shingles), k))

  def minHashShingleSignature(tokens: Column, n: Int, k: Int): Column =
    ColumnBridge.column(MinHashShingleSigExpr(ColumnBridge.expression(tokens), n, k))

  def simHash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(tokens)))

  def shingleHashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashesExpr(ColumnBridge.expression(tokens), n))

  def positionalShingleHashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(PositionalShingleHashesExpr(ColumnBridge.expression(tokens), n))

  def countInSet(tokens: Column, values: Seq[String]): Column =
    ColumnBridge.column(CountInSetExpr(ColumnBridge.expression(tokens), values))

  def murmur3Partition(key: Column, numPartitions: Int): Column =
    ColumnBridge.column(Murmur3PartitionExpr(ColumnBridge.expression(key), numPartitions))
}
