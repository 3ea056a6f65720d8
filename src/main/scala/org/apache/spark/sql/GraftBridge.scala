package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard shim any external Spark extension library needs to expose
  * a native Catalyst expression as a user-facing [[Column]].
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Materialize an optimized logical subtree as a DataFrame — the
    * PlanSpec bounded-window tripwire counts a Window's CHILD rows
    * through this (there is no public API from LogicalPlan back to
    * Dataset). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
