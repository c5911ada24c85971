package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge: turn a custom [[LogicalPlan]] into a
  * DataFrame. `Dataset.ofRows` is the blessed internal constructor every
  * plan-extending Spark library reaches through; this object is the only
  * code in the repo living outside the `graft` namespace, and it contains
  * no logic.
  */
object GraftPlanBridge {
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** The (unresolved) Catalyst expression behind a Column — Spark 4 wraps
    * a ColumnNode; `ExpressionUtils.expression` is the blessed
    * `private[sql]` converter. No logic here either.
    */
  def expressionOf(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    ExpressionUtils.expression(c)
}
