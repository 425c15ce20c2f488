package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** `Dataset.ofRows` is `private[sql]` in Spark 4, so turning a custom
  * LogicalPlan (graft.plans.PerKeyTopKPlan) into a user-visible
  * DataFrame needs this one-object bridge inside the sql package — the
  * standard pattern for Catalyst-extension libraries. No Spark
  * internals are modified; this only re-exposes the constructor.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
