package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow `private[sql]` bridge: wrap a [[LogicalPlan]] into a
  * DataFrame. This is the one internal call a custom logical operator
  * needs (Dataset.ofRows is package-private); the standard technique
  * for Spark extension libraries — kept to this single two-line object
  * so the internal surface area is auditable. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
