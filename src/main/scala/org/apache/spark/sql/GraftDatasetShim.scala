package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge to the `private[sql]` Dataset factory so library
  * code (graft.plans) can wrap a custom [[LogicalPlan]] node into a
  * public DataFrame — the standard extension-library shim pattern
  * (Delta, frameless and co. ship the same one-liner); nothing else
  * from the private surface is exposed. */
object GraftDatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
