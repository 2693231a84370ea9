package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark 4's `private[sql]` Dataset constructor so the
  * engine can plan custom [[LogicalPlan]] nodes (the pre-4.0
  * `Dataset.ofRows` path) — the companion of [[ColumnBridge]] for
  * whole-operator extensions (custom node + strategy + exec). */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
