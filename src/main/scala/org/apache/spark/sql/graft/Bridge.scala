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

  /** Wrap a raw Catalyst Expression as a user-facing Column (Spark 4 has
    * no public constructor for this) and the reverse. Used to compose
    * graft's native expressions with Column-typed arguments without going
    * through SQL text. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
