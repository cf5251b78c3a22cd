package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<float>` / `array<double>`
  * columns. Pure higher-order expressions — stay inside codegen, no UDF
  * serialization on the 100 TB path.
  */
object VectorFunctions {

  /** Elementwise dot product; inputs must be equal length. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity in [-1, 1]; 0.0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = l2Norm(a) * l2Norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Squared Euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val diff = x.cast("double") - y.cast("double")
      diff * diff
    }), lit(0.0), (acc, v) => acc + v)

  /** Normalize to unit length (pass through all-zero vectors). */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0, transform(a, v => v.cast("double")))
      .otherwise(transform(a, v => v.cast("double") / n))
  }
}
