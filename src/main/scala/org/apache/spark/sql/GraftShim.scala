package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` constructors — the standard pattern Spark
  * extension libraries use to materialize a DataFrame over a custom
  * LogicalPlan (Dataset.ofRows is sql-private). Kept to this single call. */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
