package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` classic Dataset constructor so graft's
  * custom logical plans (graft/plans/AsOfJoin.scala) can surface as ordinary
  * DataFrames. The same-package trick every Spark extension library uses;
  * no Spark internals are modified.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
