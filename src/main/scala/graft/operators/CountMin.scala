package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the POINT-QUERY
  * companion to the Space-Saving heavy-hitters sketch
  * ([[graft.streaming.StreamingHeavyHitters]]): approximate per-key
  * counts from a FIXED `depth × width` counter grid, with the classic
  * one-sided guarantee (estimate ≥ true count; overestimate ≤ εN with
  * probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉).
  *
  * Scale shape — the reason a distributed batch engine carries a sketch
  * at all when `groupBy(key).count()` is exact: the sketch is ONE
  * bounded partial aggregation. Every partition folds its rows into a
  * local depth×width Long grid and the grids MERGE BY VECTOR ADDITION —
  * so the exchange carries `depth × width` longs per partition (4 KB at
  * 4×128), never the key space. At 100 TB with billions of distinct
  * keys, the exact groupBy shuffles the keys; the sketch shuffles
  * nothing but grids, streams in one pass, and is the right primitive
  * for cardinality-oblivious count monitoring (per-key rate limits,
  * join-skew probes, CDC hot-key detection).
  *
  * Determinism (cross-engine exact): row `i`'s hash is the first 13 hex
  * chars of md5("<i>|<key>") taken mod width — the same md5-arithmetic
  * contract as [[Privacy.dpNoisedCounts]], replicable bit-for-bit in
  * any engine with md5 (the DuckDB oracle replays the identical grid).
  */
object CountMin {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Row-`i` bucket for `key` — JVM twin of [[bucketExpr]]. The first 13
    * hex chars of the md5 are the first 6 bytes plus the 7th byte's high
    * nibble; extract them NUMERICALLY (hex-formatting a string per byte
    * per row per depth dominated the whole sketch fold — measured 39 s
    * for 1M rows x depth 4 at sf1, ~4 s after). Digest instances are
    * thread-local (getInstance per call was the other allocation sink). */
  private[operators] def bucket(i: Int, key: String, width: Int): Int = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s"$i|$key".getBytes("UTF-8"))
    var v = 0L
    var j = 0
    while (j < 6) { v = (v << 8) | (d(j) & 0xFFL); j += 1 }
    v = (v << 4) | ((d(6) & 0xFFL) >>> 4) // 13th hex nibble
    (v % width).toInt
  }

  /** Row-`i` bucket as a Catalyst expression (codegen'd md5 arithmetic —
    * identical values to [[bucket]]). */
  private[operators] def bucketExpr(i: Int, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$i|"), key)), 1, 13), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Build the sketch: one partial-aggregated fold of `key` into a
    * `depth × width` grid, returned driver-side (it is `depth*width`
    * longs — the whole point is that it is tiny). Null keys are
    * skipped (a null carries no identity to count). */
  def sketch(df: DataFrame, key: Column, depth: Int = 4,
      width: Int = 256): Array[Long] = {
    require(depth >= 1 && width >= 2, s"bad depth=$depth width=$width")
    val cms = udaf(new CountMinAggregator(depth, width))
    df.select(key.cast("string").as("k"))
      .filter(col("k").isNotNull)
      .agg(cms(col("k")).as("grid"))
      .head().getSeq[Long](0).toArray
  }

  /** Point estimates for `keys`' key column: attach `estCol` =
    * min over rows of the key's grid cell. The grid rides as a
    * BROADCAST literal (typedLit of depth·width longs) and each row's
    * lookup is a codegen'd md5 + element_at — a narrow projection, no
    * join, no shuffle. */
  def estimate(keys: DataFrame, key: Column, grid: Array[Long],
      depth: Int, width: Int, estCol: String = "cms_est"): DataFrame = {
    require(grid.length == depth * width,
      s"grid length ${grid.length} != depth*width ${depth * width}")
    val g = typedLit(grid.toSeq)
    val cells = (0 until depth).map(i =>
      element_at(g, (lit(i.toLong * width) + bucketExpr(i, key, width))
        .cast("int") + 1))
    keys.withColumn(estCol, least(cells: _*))
  }
}

/** The grid fold: buffer = depth×width Longs, reduce = `depth` md5
  * bucket increments per key, merge = vector addition — commutative,
  * associative, bounded (the [[graft.functions.MomentsAggregator]]
  * contract, Long-exact here). */
class CountMinAggregator(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], key: String): Array[Long] = {
    var i = 0
    while (i < depth) {
      b(i * width + CountMin.bucket(i, key, width)) += 1L
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
