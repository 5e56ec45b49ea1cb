package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one sanctioned crossing into Spark's `private[sql]` surface: wrap a
  * hand-built [[LogicalPlan]] (e.g. [[graft.plans.AsOfJoinPlan]]) back into
  * a public [[DataFrame]]. `Dataset.ofRows` is package-private, so the shim
  * lives under `org.apache.spark.sql` — the standard pattern every
  * open-source plan-extension library (Sedona, Delta, Iceberg) uses to hand
  * custom logical nodes to the session's planner. Nothing else in the repo
  * may import from this package.
  */
object PlanDF {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame — the resolved-attribute form
    * custom plan nodes compose over (`df.logicalPlan` is private[sql]).
    */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
