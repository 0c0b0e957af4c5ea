package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge: building a DataFrame from a custom
  * [[LogicalPlan]] requires `classic.Dataset.ofRows`, which Spark scopes
  * to its own package. This object is the entire surface we take from
  * that scope — everything else in the library lives under `graft.*`.
  * (Standard technique for Spark extension libraries that add logical
  * operators; nothing here touches Spark internals beyond plan
  * construction.)
  */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
