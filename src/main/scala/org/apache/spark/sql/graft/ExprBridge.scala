package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.classic.ExpressionUtils

/** Second `private[sql]` doorway (alongside [[PlanBridge]]): wrap a
  * Catalyst [[Expression]] as a public [[Column]] (`ExpressionUtils
  * .column` is sql-private in Spark 4.x). This lets graft's operators
  * use its native expressions ([[graft.functions.CosineSim]],
  * [[graft.functions.TopKAgg]]) DIRECTLY — no function-registry name
  * lookup in the hot path, so a user registering an unrelated function
  * under the same name cannot change operator results. The registry
  * spelling remains for the SQL door only.
  */
object ExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** The Catalyst expression behind a public Column. */
  def expr(c: Column): Expression = ExpressionUtils.expression(c)

  /** An aggregate function as a Complete-mode aggregate Column. */
  def aggColumn(f: AggregateFunction): Column =
    ExpressionUtils.column(f.toAggregateExpression())

  /** The session's stable unique id (`sessionUUID` is sql-private in
    * Spark 4.x): never reused across sessions in a JVM, unlike an
    * identity hash — the safe memo key for per-session caches.
    */
  def sessionUUID(spark: org.apache.spark.sql.SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID
}
