package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's private[sql] surface: wrapping a custom
  * LogicalPlan into a DataFrame (classic.Dataset.ofRows) has no public API
  * in Spark 4, and extension libraries conventionally host this one-liner in
  * the org.apache.spark.sql package. Nothing else crosses the boundary. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
