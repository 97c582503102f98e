package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}

/** `private[sql]` bridge for planner rules that must evaluate a
  * LOGICAL subplan driver-side (the join-prune rule collects a dim
  * side's distinct keys at planning time). `Dataset.ofRows` is the
  * sanctioned wrap — the same call every Spark command/rule that
  * materializes a subplan uses — but it is `private[sql]` in 4.1,
  * exactly like [[StreamingBatchBridge]]'s case. No Spark internals
  * are modified. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
