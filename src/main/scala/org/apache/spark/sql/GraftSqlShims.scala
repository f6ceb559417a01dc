package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Two `private[sql]` bridges the DML commands need
  * ([[graft.catalog.GraftDmlRule]]): wrap a resolved Catalyst expression
  * as a Column, and wrap a resolved logical plan as a DataFrame. Both
  * are stable engine internals every Spark table format builds on (the
  * same doors Delta's command layer uses); this shim only re-exports
  * them — no behavior lives here.
  */
object GraftSqlShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
