package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression converters — the
  * standard pattern for libraries that ship custom Catalyst expressions
  * (Spark 4 moved `Column` onto ColumnNode, and the public API offers no
  * constructor from an `Expression`). Kept to exactly these two calls.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
