package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column↔Expression converters so
  * graft can expose custom Catalyst expressions as Columns. Same pattern
  * public Spark extensions use (a tiny shim in the org.apache.spark.sql
  * namespace); no Spark internals are modified.
  */
object GraftBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame over a custom LogicalPlan (the package-private
    * Dataset.ofRows — the standard extension entry point for custom
    * operators planned by an injected Strategy). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
