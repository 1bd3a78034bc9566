package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's `private[sql]` Column/Dataset constructors
  * so the engine can expose custom Catalyst expressions as `Column`s and
  * custom `LogicalPlan` nodes as `DataFrame`s (Spark 4 wraps Columns in
  * ColumnNodes; `classic.ExpressionUtils.column` / `classic.Dataset.ofRows`
  * are the supported internal conversions). */
object GraftShims {
  def exprColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
