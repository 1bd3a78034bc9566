package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column constructor so the
  * engine can expose custom Catalyst expressions as `Column`s
  * (Spark 4 wraps Columns in ColumnNodes; `classic.ExpressionUtils.column`
  * is the supported internal conversion). */
object GraftShims {
  def exprColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
