package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 bridge between `Column` and Catalyst `Expression`.
  *
  * Spark 4 moved `new Column(expr)` / `col.expr` behind
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`.
  * Custom-Expression libraries (this one) need exactly those two
  * conversions, so this one-file shim lives in the `org.apache.spark.sql`
  * namespace — the standard extension-library pattern for Spark 4.
  */
object ColumnShim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
