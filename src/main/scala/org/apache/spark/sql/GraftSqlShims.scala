package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier}

/** The `private[sql]` bridges the catalog/DML/view layers need: wrap a
  * resolved Catalyst expression as a Column, wrap a logical plan as a
  * DataFrame, and the identifier-resolution trio (current catalog,
  * catalog registry probe, temp-view probe) that Spark's own commands
  * reach through `CatalogManager`. All are stable engine internals every
  * Spark table format builds on (the same doors Delta's command layer
  * uses); this shim only re-exports them — no behavior lives here.
  */
object GraftSqlShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** The reverse bridge: a Column's resolved-or-unresolved Catalyst
    * expression — what lets the engine's Column-builder functions
    * register as SQL functions (`SparkSessionExtensions.injectFunction`
    * hands Expressions, the builders speak Columns).
    */
  def expression(c: Column): Expression =
    // via the ACTIVE session's converter (not ExpressionUtils, whose
    // lazy ColumnNodeExpression wrapper would reach codegen unresolved
    // when returned from an injected function builder): functions-API
    // nodes lower to catalyst UnresolvedFunction here and the analyzer
    // resolves them like any hand-written expression
    SparkSession.active.asInstanceOf[classic.SparkSession].expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A V1 streaming Sink's per-batch frame as a standalone BATCH frame:
    * the handed Dataset still carries streaming-flagged leaves (so
    * `.write` refuses), but its execution is already the batch slice —
    * re-wrap the executed plan's InternalRow RDD under the same schema
    * with the streaming flag down. Deterministic to re-run: the
    * sources were replaced with this batch's fixed slice.
    */
  def sinkBatchFrame(data: DataFrame): DataFrame = {
    val qe = data.queryExecution
    data.sparkSession.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(qe.toRdd, qe.analyzed.schema,
        isStreaming = false)
  }

  /** Spark's own V1 file-stream Source over a directory of parquet
    * files — battle-tested checkpointed seen-file tracking (robust to
    * out-of-order file arrivals), which the graft feed's
    * `readStream.format("graft")` door delegates to.
    */
  def parquetFileSource(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      metadataPath: String,
      extraOptions: Map[String, String] = Map.empty): execution.streaming.Source =
    execution.datasources.DataSource(
      sparkSession = spark,
      className = "parquet",
      userSpecifiedSchema = Some(schema),
      options = extraOptions + ("path" -> path)).createSource(metadataPath)

  /** Fully analyzed (and analysis-checked) plan — the nested-analysis
    * door view expansion uses: the inner run gets every analyzer batch
    * (CTE substitution included, which an outer fixed point would no
    * longer re-run over spliced-in text).
    */
  def analyzed(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    ofRows(spark, plan).queryExecution.analyzed

  private def state(spark: SparkSession) =
    spark.asInstanceOf[classic.SparkSession].sessionState

  /** Parse a QUERY (commands rejected) — what a view body must be. */
  def parseQuery(spark: SparkSession, sql: String): LogicalPlan =
    state(spark).sqlParser.parseQuery(sql)

  /** Spark's multipart-identifier resolution (the `CatalogAndIdentifier`
    * rules): a first segment naming a registered catalog wins; otherwise
    * the current catalog, with the current namespace completing a
    * single-segment name.
    */
  def resolveIdent(spark: SparkSession, parts: Seq[String]): (CatalogPlugin, Identifier) = {
    val cm = state(spark).catalogManager
    if (parts.length > 1 && cm.isCatalogRegistered(parts.head))
      (cm.catalog(parts.head), Identifier.of(parts.tail.init.toArray, parts.last))
    else {
      val ns = if (parts.length == 1) cm.currentNamespace else parts.init.toArray
      (cm.currentCatalog, Identifier.of(ns, parts.last))
    }
  }

  def isCatalogName(spark: SparkSession, name: String): Boolean =
    state(spark).catalogManager.isCatalogRegistered(name)

  def catalogByName(spark: SparkSession, name: String): CatalogPlugin =
    state(spark).catalogManager.catalog(name)

  def currentCatalogName(spark: SparkSession): String =
    state(spark).catalogManager.currentCatalog.name()

  def currentNamespace(spark: SparkSession): Array[String] =
    state(spark).catalogManager.currentNamespace

  /** True when `parts` names a session-local or global temp view — the
    * precedence guard: temp views shadow catalog views, exactly as they
    * shadow catalog tables in Spark's own resolution.
    */
  def isTempView(spark: SparkSession, parts: Seq[String]): Boolean =
    state(spark).catalog.isTempView(parts)

  /** Session-local temp views matching a SHOW-style pattern. */
  def listLocalTempViews(spark: SparkSession, pattern: String): Seq[String] =
    state(spark).catalog.listLocalTempViews(pattern).map(_.table)

  /** The session's column-name resolver (case-insensitive by default). */
  def resolver(spark: SparkSession): (String, String) => Boolean =
    state(spark).conf.resolver

  def sessionTimeZone(spark: SparkSession): String =
    state(spark).conf.sessionLocalTimeZone
}
