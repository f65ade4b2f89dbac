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

  /** Eager ColumnNode→Expression conversion. `expression` returns a lazy
    * wrapper the analyzer unwraps when the Column flows through the
    * DataFrame API — but a FunctionRegistry builder's result is spliced
    * into an already-resolving plan, where the wrapper survives to codegen
    * and fails. Registry-registered functions must convert eagerly. */
  def expressionNow(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
