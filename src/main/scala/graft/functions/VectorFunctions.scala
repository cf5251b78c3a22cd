package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<float>` / `array<double>`
  * columns. Pure higher-order expressions — stay inside codegen, no UDF
  * serialization on the 100 TB path.
  */
object VectorFunctions {

  /** Elementwise dot product (native tight loop); inputs equal length. */
  def dot(a: Column, b: Column): Column = graft.plans.VectorExpressions.dot(a, b)

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity in [-1, 1]; 0.0 when either vector is all-zero.
    * Native expression — the interpreted HOF form costs ~µs→ms per row and
    * sits on the |corpus|×|queries| ANN hot path. Accumulation order matches
    * the HOF form bit-for-bit. */
  def cosine(a: Column, b: Column): Column = graft.plans.VectorExpressions.cosineSim(a, b)

  /** Squared Euclidean distance (native tight loop). */
  def l2Sq(a: Column, b: Column): Column = graft.plans.VectorExpressions.l2Sq(a, b)

  /** Normalize to unit length (pass through all-zero vectors). */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0, transform(a, v => v.cast("double")))
      .otherwise(transform(a, v => v.cast("double") / n))
  }
}
