package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column↔Expression converters —
  * the supported way for third-party libraries to wrap a custom Catalyst
  * `Expression` into a `Column` since the Spark 4 Column API became
  * implementation-agnostic. Lives in the `org.apache.spark.sql` package
  * solely to satisfy the access modifier; contains no logic. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
