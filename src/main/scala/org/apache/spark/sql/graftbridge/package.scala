package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column↔Expression converters
  * (Spark 4 removed the public `Column.expr`). The same pattern public
  * Spark-extension libraries use to expose custom Catalyst expressions
  * as `Column`s. */
package object graftbridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
