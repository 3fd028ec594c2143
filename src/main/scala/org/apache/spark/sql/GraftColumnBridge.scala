package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ⇄ Expression converters
  * (Spark 4 moved Column onto ColumnNode; `classic.ExpressionUtils`
  * is the sanctioned converter, package-private to sql — this is the
  * usual extension-library shim, nothing engine-internal is touched).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
