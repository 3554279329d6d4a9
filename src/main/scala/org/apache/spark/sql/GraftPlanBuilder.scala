package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Library shim: build a DataFrame from a custom LogicalPlan.
  * `Dataset.ofRows` is `private[sql]`, so libraries adding their own plan
  * nodes (graft's AsOfJoinPlan) place this one-liner inside the
  * `org.apache.spark.sql` package — the standard pattern for Spark
  * extension libraries that construct logical plans directly.
  */
object GraftPlanBuilder {
  def ofPlan(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
