package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/**
 * Builds a DataFrame over a graft-owned logical node.
 * `classic.Dataset.ofRows` is `private[sql]`, so this one-liner lives
 * inside the sql namespace — the conventional seam for libraries that
 * add custom logical plans (no Spark internals are modified).
 */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
