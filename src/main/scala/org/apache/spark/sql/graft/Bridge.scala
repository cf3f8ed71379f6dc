package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.DoNotCleanup

/** The single, minimal crossing into Spark's `private[sql]` surface: wrap
  * a custom LogicalPlan as a DataFrame. Spark exposes no public factory
  * for this, so extensions that add whole logical operators use the same
  * package-nesting device. Everything else in graft sticks to public APIs.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan, DoNotCleanup)
}
