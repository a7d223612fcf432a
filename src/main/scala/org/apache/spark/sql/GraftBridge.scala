package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column↔Expression converters (Spark 4
  * moved them behind `private[sql] classic.ExpressionUtils`). Placing
  * the shim in this package is the standard extension-library
  * technique for registering custom Catalyst expressions as Columns.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
