package graft.plans

import graft.ops.Similarity
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Logical placeholder for "top-k cosine similarity of `queries` against
  * `corpus`" — the physical strategy (exact brute force vs IVF-probed) is
  * NOT chosen here; [[AnnRewrite]] decides at optimization time based on
  * what index metadata is registered. This is the engine-extension
  * surface (SURVEY §4.3-2): the user declares WHAT (top-k similarity),
  * the optimizer picks HOW, exactly like a join strategy.
  *
  * `output` is fixed at construction ((query_id, vec_id, cos_sim, rnk)
  * with types taken from the brute-force template) so the node is fully
  * resolved and flows through the analyzer and every built-in optimizer
  * batch untouched until the rewrite fires in the user-rule batch.
  */
case class AnnTopKMarker(corpus: LogicalPlan, queries: LogicalPlan, k: Int,
    override val output: Seq[Attribute]) extends BinaryNode {
  override def left: LogicalPlan = corpus
  override def right: LogicalPlan = queries
  // output attrs originate here, not from the children — without this,
  // CheckAnalysis would report them "missing from input"
  override def producedAttributes: AttributeSet = outputSet
  // the rewrite consumes every child column (which one depends on the
  // brute-force/IVF choice made later) — declaring them all referenced
  // keeps ColumnPruning from emptying the children before the rewrite
  override def references: AttributeSet = AttributeSet(corpus.output ++ queries.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AnnTopKMarker =
    copy(corpus = newLeft, queries = newRight)
}

/** Optimizer rule (installed via `spark.experimental.extraOptimizations`)
  * that expands [[AnnTopKMarker]]:
  *
  *  - a centroid table registered for the session AND a `label` bucket
  *    column on the corpus → [[Similarity.ivfTopK]] (probe nprobe buckets,
  *    equi-join on the bucket key — partition pruning at scale);
  *  - otherwise → [[Similarity.bruteForceTopK]] (exact, one corpus scan).
  *
  * The replacement subtree is built with the public DataFrame API and
  * pre-optimized through the session's own optimizer (so it arrives with
  * its scans pruned and filters pushed, even though the user-rule batch
  * runs last), then spliced in under a Project that pins the marker's
  * original attribute ids.
  */
object AnnRewrite extends Rule[LogicalPlan] {

  final case class Registration(centroids: DataFrame, nprobe: Int)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Registration]()

  /** Register an IVF coarse quantizer for `spark`; subsequent
    * [[annTopK]] plans (even already-constructed ones — the choice is
    * made at optimization time) probe it instead of scanning everything.
    */
  def registerCentroids(spark: SparkSession, centroids: DataFrame, nprobe: Int): Unit = {
    require(nprobe > 0, s"nprobe must be positive, got $nprobe")
    registry.put(spark, Registration(centroids, nprobe))
    install(spark)
  }

  /** Drop the registration: [[annTopK]] reverts to exact brute force. */
  def clearCentroids(spark: SparkSession): Unit = { registry.remove(spark); () }

  /** Idempotently append this rule to the session's user-rule batch. */
  def install(spark: SparkSession): Unit = this.synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  /** Declarative top-k similarity: plants the marker node. `corpus` needs
    * (vec_id, embedding) and — for the IVF path to be eligible — the
    * `label` bucket column; `queries` needs (query_id, qvec) and must be
    * broadcast-small.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    install(spark)
    // the brute-force template fixes the output schema (names + types);
    // fresh attribute ids keep the marker independent of the template
    val schema = Similarity.bruteForceTopK(corpus, queries, k).schema
    val out = schema.map(f => AttributeReference(f.name, f.dataType, f.nullable)())
    PlanBridge.ofRows(spark, AnnTopKMarker(
      corpus.queryExecution.analyzed, queries.queryExecution.analyzed, k, out.toSeq))
  }

  /** Kill switch: with `spark.graft.ann.rewrite.enabled=false` the rule
    * leaves markers untouched and [[graft.plans.GraftStrategy]] executes
    * them directly — the operational escape hatch when a rewrite
    * misbehaves in production, and the door PlanRewriteSpec uses to
    * exercise the strategy-only path.
    */
  val EnabledKey = "spark.graft.ann.rewrite.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case m: AnnTopKMarker
        if SparkSession.active.conf.get(EnabledKey, "true").toBoolean =>
      val spark = SparkSession.active
      val corpus = PlanBridge.ofRows(spark, m.corpus)
      val queries = PlanBridge.ofRows(spark, m.queries)
      val hasBucket = m.corpus.output.exists(_.name == "label")
      val rewritten = registry.get(spark) match {
        case Registration(centroids, nprobe) if hasBucket =>
          Similarity.ivfTopK(corpus, centroids, queries, nprobe, m.k)
        case _ =>
          Similarity.bruteForceTopK(corpus, queries, m.k)
      }
      // run the replacement through the full optimizer on its own (no
      // marker inside, so no recursion) — the user-rule batch is the last
      // one, so an unoptimized splice would miss pushdown/pruning
      val optimized = rewritten.queryExecution.optimizedPlan
      Project(optimized.output.zip(m.output).map { case (from, to) =>
        Alias(from, to.name)(exprId = to.exprId) }, optimized)
  }
}
