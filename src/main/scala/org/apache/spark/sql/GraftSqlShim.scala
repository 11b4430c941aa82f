package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` plan→DataFrame construction for graft's custom
  * logical operators (the standard extension-library shim — Spark exposes no
  * public API for wrapping a custom [[LogicalPlan]] node in a DataFrame).
  * Kept to this single call so the `org.apache.spark.sql` package intrusion
  * is one line deep.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
