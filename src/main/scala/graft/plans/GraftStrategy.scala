package graft.plans

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{ProjectExec, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.PlanBridge

/** Planner-side safety net for [[AnnTopKMarker]] — the `SparkStrategy`
  * half of the engine-extension surface ([[AnnRewrite]] is the
  * `Rule[LogicalPlan]` half).
  *
  * Normally the optimizer rule expands the marker (choosing brute force
  * vs IVF from the session's index registration) and this strategy never
  * sees one. But a marker can legitimately reach the planner unexpanded —
  * a session configured with `injectPlannerStrategy` only, or a plan
  * captured before the rule was installed. Without a strategy that is a
  * planning error ("unsupported plan"); with it, the marker plans as the
  * exact brute-force search — the always-correct default, since index
  * CHOICE is optimize-time policy ([[AnnRewrite]]'s job), while this is
  * plan-time obligation: every resolved logical operator must execute.
  *
  * The expansion is pre-optimized on its own (scans pruned, filters
  * pushed) and wrapped in a `ProjectExec` that pins the marker's original
  * attribute ids, mirroring the rule's splice.
  */
object GraftStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case m: AnnTopKMarker =>
      val spark = SparkSession.active
      val expanded = Similarity.bruteForceTopK(
        PlanBridge.ofRows(spark, m.corpus),
        PlanBridge.ofRows(spark, m.queries), m.k)
        .queryExecution.optimizedPlan
      val aliases = expanded.output.zip(m.output).map { case (from, to) =>
        Alias(from, to.name)(exprId = to.exprId) }
      ProjectExec(aliases, planLater(expanded)) :: Nil
    case _ => Nil
  }

  /** Idempotently append to the session's extra strategies. */
  def install(spark: SparkSession): Unit = this.synchronized {
    if (!spark.experimental.extraStrategies.contains(this))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ this
  }
}
