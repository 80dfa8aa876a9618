package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for building a public [[Column]] from a Catalyst [[Expression]] —
  * the constructor became private[sql] in Spark 4 (Column is backed by
  * ColumnNode). Standard pattern for libraries shipping native expressions.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
