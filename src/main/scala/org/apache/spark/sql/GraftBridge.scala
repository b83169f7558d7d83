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

  /** Persisted-RDD ids backing a `localCheckpoint`ed DataFrame, read
    * DIRECTLY from its LogicalRDD plan node. The block-release
    * bookkeeping in the standing-table folds used to diff the GLOBAL
    * `sc.getPersistentRDDs` keyset around each checkpoint; two tables
    * folding concurrently (per-instance locks only) could capture each
    * other's fresh blocks in that diff and later unpersist the OTHER
    * table's live checkpointed state — lineage is truncated, so the
    * victim's next readout dies with a missing-block error. Reading
    * the id off the checkpointed plan itself makes the attribution
    * exact with no global window at all. */
  def checkpointedRddIds(df: Dataset[_]): Set[Int] =
    df.queryExecution.analyzed.collect {
      case l: execution.LogicalRDD => l.rdd.id
    }.toSet
}
