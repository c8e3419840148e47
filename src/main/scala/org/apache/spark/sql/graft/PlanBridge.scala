package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridges a custom LogicalPlan node into the public Dataset API.
  * `Dataset.ofRows` is private[sql], so this one-file shim lives under the
  * org.apache.spark.sql package — the standard technique used by Spark
  * extension libraries to attach custom plan nodes without forking Spark.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
