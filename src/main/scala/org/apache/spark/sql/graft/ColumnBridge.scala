package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters, needed to
  * expose custom Catalyst expressions as user-facing `Column`s (the supported
  * extension seam — SparkSessionExtensions function injection uses the same
  * machinery). Lives in `org.apache.spark.sql` purely for access; contains no
  * Spark-internal logic. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column tree to a concrete Catalyst expression.
    * `expression` wraps lazily in a ColumnNodeExpression, which resolves
    * fine inside normal DataFrame plans but NOT when returned from a
    * function-registry builder (the analyzer does not descend into the
    * wrapper) — SQL-registered composed functions need this eager form. */
  def expressionEager(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
