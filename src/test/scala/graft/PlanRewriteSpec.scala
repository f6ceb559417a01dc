package graft

import graft.io.Tables
import graft.ops.Similarity
import graft.plans.{AnnRewrite, AnnTopKMarker}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §4.3-2 engine-extension surface: the AnnTopKMarker logical node
  * + the AnnRewrite optimizer rule (spark.experimental.extraOptimizations)
  * that picks brute-force vs IVF at optimization time.
  */
class PlanRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf001

  private def corpus = Tables.embeddings(spark, sf001)
  private def queries = Tables.embeddings(spark, sf001).filter(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  private def rows(df: DataFrame) =
    df.orderBy("query_id", "rnk").collect().toSeq

  test("annTopK with no centroids registered rewrites to exact brute force") {
    AnnRewrite.clearCentroids(spark)
    val declared = AnnRewrite.annTopK(corpus, queries, k = 10)
    // the marker is present pre-optimization and GONE after
    assert(declared.queryExecution.analyzed.collect { case m: AnnTopKMarker => m }.nonEmpty,
      "marker missing from analyzed plan")
    assert(declared.queryExecution.optimizedPlan.collect { case m: AnnTopKMarker => m }.isEmpty,
      "rewrite did not fire")
    assert(rows(declared) == rows(Similarity.bruteForceTopK(corpus, queries, 10)))
  }

  test("annTopK with centroids registered rewrites to the IVF probe plan") {
    val centroids = Similarity.ivfCentroids(corpus)
    AnnRewrite.registerCentroids(spark, centroids, nprobe = 2)
    try {
      val declared = AnnRewrite.annTopK(corpus, queries, k = 10)
      val optimized = declared.queryExecution.optimizedPlan
      assert(optimized.collect { case m: AnnTopKMarker => m }.isEmpty, "rewrite did not fire")
      // plan-shape proof the IVF form was chosen: brute force joins
      // corpus × queries with NO condition (cross join); the IVF plan
      // equi-joins the corpus on the `label` bucket key
      val equiJoinsOnLabel = optimized.collect {
        case j: Join if j.condition.exists(_.references.exists(_.name == "label")) => j
      }
      assert(equiJoinsOnLabel.nonEmpty, s"no label equi-join in:\n$optimized")
      // the marker's late binding must equal the direct IVF call (the
      // probe may legitimately miss a query's own bucket — recall < 1 is
      // the IVF trade — so equality is against ivfTopK, not brute force)
      assert(rows(declared) == rows(Similarity.ivfTopK(corpus, centroids, queries, 2, 10)))
    } finally AnnRewrite.clearCentroids(spark)
  }

  test("annTopK falls back to brute force when the corpus has no bucket column") {
    val centroids = Similarity.ivfCentroids(corpus)
    AnnRewrite.registerCentroids(spark, centroids, nprobe = 2)
    try {
      val unbucketed = corpus.drop("label")
      val declared = AnnRewrite.annTopK(unbucketed, queries, k = 10)
      assert(rows(declared) == rows(Similarity.bruteForceTopK(unbucketed, queries, 10)))
    } finally AnnRewrite.clearCentroids(spark)
  }

  test("registration is late-bound: a plan built BEFORE registerCentroids uses IVF when executed after") {
    AnnRewrite.clearCentroids(spark)
    val declared = AnnRewrite.annTopK(corpus, queries, k = 10) // built with no registration
    val centroids = Similarity.ivfCentroids(corpus)
    AnnRewrite.registerCentroids(spark, centroids, nprobe = 2)
    try assert(rows(declared) == rows(Similarity.ivfTopK(corpus, centroids, queries, 2, 10)))
    finally AnnRewrite.clearCentroids(spark)
  }

  test("GraftStrategy plans a marker the optimizer rule never expanded (strategy-only session)") {
    import graft.plans.GraftStrategy
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.graft.PlanBridge
    AnnRewrite.clearCentroids(spark)
    // simulate a session where only the planner strategy is installed:
    // the extension-injected rule can't be uninstalled, so use its kill
    // switch (the same conf an operator would flip in production)
    spark.conf.set(AnnRewrite.EnabledKey, "false")
    GraftStrategy.install(spark)
    try {
      val template = Similarity.bruteForceTopK(corpus, queries, 10)
      val out = template.schema.map(f =>
        AttributeReference(f.name, f.dataType, f.nullable)())
      val declared = PlanBridge.ofRows(spark, AnnTopKMarker(
        corpus.queryExecution.analyzed, queries.queryExecution.analyzed, 10, out.toSeq))
      // no rule → the marker SURVIVES optimization ...
      assert(declared.queryExecution.optimizedPlan
        .collect { case m: AnnTopKMarker => m }.nonEmpty,
        "marker unexpectedly expanded — the rule is still installed")
      // ... and the strategy still makes it executable, exactly
      assert(rows(declared) == rows(template))
    } finally spark.conf.unset(AnnRewrite.EnabledKey)
  }
}
