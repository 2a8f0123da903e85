package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` constructors — the standard pattern Spark
  * extension libraries use to materialize a DataFrame over a custom
  * LogicalPlan (Dataset.ofRows is sql-private) or wrap a custom Expression
  * as a user-facing Column (Column-from-Expression went sql-private with
  * Spark 4's connect-compatible Column). Kept to these three calls. */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
