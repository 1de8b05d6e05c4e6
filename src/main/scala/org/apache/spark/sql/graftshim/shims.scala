package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to `private[sql]` helpers: Column <-> Expression
  * conversion for exposing custom Catalyst expressions as Columns
  * (the Spark 4.x replacement for the removed `new Column(expr)`). */
package object graftshim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
