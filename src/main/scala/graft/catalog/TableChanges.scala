package graft.catalog

import graft.ops.Sinks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}

/** `table_changes(table, fromV, toV [, keyCol, ...])` — the SQL door for
  * the change-data-feed read path (Delta's TVF of the same name), wired
  * through `SparkSessionExtensions.injectTableFunction`. `table` is
  * either a catalog-qualified name (`'cat.ns.tbl'` — resolved through
  * the live [[GraftCatalog]], so every traversal/namespace guard applies)
  * or a direct table-root path (contains `/`). With key columns the feed
  * carries the Delta-CDF classification (insert / delete /
  * update_preimage / update_postimage); keyless it degrades to the
  * bag-diff insert/delete shape, exactly like [[Sinks.changesBetween]].
  *
  * The builder runs at analysis time and returns the diff's logical
  * plan, so the TVF composes with any SQL around it (joins, filters,
  * CTEs) and Catalyst optimizes through it.
  */
object TableChangesTvf {

  private[graft] def stringArg(e: Expression, what: String): String = {
    require(e.foldable, s"table_changes: $what must be a literal, got ${e.sql}")
    val v = e.eval()
    require(v != null, s"table_changes: $what must not be NULL")
    v.toString
  }

  private def longArg(e: Expression, what: String): Long = {
    require(e.foldable, s"table_changes: $what must be a literal, got ${e.sql}")
    e.eval() match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"table_changes: $what must be an integer version, got $other")
    }
  }

  /** Resolve the table argument to a versioned-layout root. A
    * catalog-qualified name goes through the registered catalog's own
    * loadTable (all hardening applies); a path is used as-is.
    */
  private[graft] def resolveRoot(spark: SparkSession, table: String): String =
    if (table.contains("/")) table
    else {
      val parts = table.split("\\.")
      require(parts.length >= 2,
        s"table_changes: '$table' is neither a path nor a catalog-qualified name " +
          "(expected 'catalog.[ns.]table' or a table-root path)")
      val cat = spark.sessionState.catalogManager.catalog(parts.head) match {
        case t: TableCatalog => t
        case other => throw new IllegalArgumentException(
          s"table_changes: catalog '${parts.head}' is not a table catalog ($other)")
      }
      cat.loadTable(Identifier.of(parts.tail.init, parts.tail.last)) match {
        case w: GraftWritableTable => w.tableRootPath
        case other => throw new IllegalArgumentException(
          s"table_changes: '$table' is not a graft versioned table (${other.getClass.getName})")
      }
    }

  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length >= 3,
      "table_changes(table, fromVersion, toVersion [, keyCol, ...])")
    val spark = SparkSession.active
    val root = resolveRoot(spark, stringArg(exprs.head, "table"))
    val fromV = longArg(exprs(1), "fromVersion")
    val toV = longArg(exprs(2), "toVersion")
    val keys = exprs.drop(3).zipWithIndex.map { case (e, i) => stringArg(e, s"keyCol ${i + 1}") }
    Sinks.changesBetween(spark, root, fromV, toV, keys).queryExecution.analyzed
  }
}

/** `table_history(table)` — the DESCRIBE HISTORY analog as a TVF: one
  * row per RETAINED version (`version`, `committed_at`, `is_current`),
  * straight from [[Sinks.history]]. Same table-argument contract as
  * [[TableChangesTvf]]: a catalog-qualified name resolves through the
  * live catalog (with all its hardening), a `/`-bearing string is a
  * table-root path.
  */
object TableHistoryTvf {
  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 1, "table_history(table)")
    val spark = SparkSession.active
    val root = TableChangesTvf.resolveRoot(spark,
      TableChangesTvf.stringArg(exprs.head, "table"))
    Sinks.history(spark, root).queryExecution.analyzed
  }
}

/** `table_detail('tbl')` — one-row operational summary, the DESCRIBE
  * DETAIL analog, straight from [[Sinks.detail]]. Same table-argument
  * contract as the other TVFs.
  */
object TableDetailTvf {
  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 1, "table_detail(table)")
    val spark = SparkSession.active
    val root = TableChangesTvf.resolveRoot(spark,
      TableChangesTvf.stringArg(exprs.head, "table"))
    Sinks.detail(spark, root).queryExecution.analyzed
  }
}

/** `table_files('tbl')` — per-file inventory of the live version (the
  * Iceberg `.files` metadata-table analog): relative path, on-disk
  * bytes, footer row count, straight from [[Sinks.files]]. Same
  * table-argument contract as the other TVFs; metadata-only (footers,
  * never data pages).
  */
object TableFilesTvf {
  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 1, "table_files(table)")
    val spark = SparkSession.active
    val root = TableChangesTvf.resolveRoot(spark,
      TableChangesTvf.stringArg(exprs.head, "table"))
    Sinks.files(spark, root).queryExecution.analyzed
  }
}

/** `neardup_candidates('index_tbl', 'batch_tbl')` — LSH candidate
  * pairs of a batch table against a persisted near-dup index
  * ([[graft.ops.NearDupIndex.candidates]]): `(probe_id, match_id)`.
  * The SQL door to B152's probe path; composes with the surrounding
  * query (join back to texts for an exact-Jaccard rerank, aggregate
  * per probe, feed a MERGE's loser set).
  */
object NearDupCandidatesTvf {
  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 2, "neardup_candidates(index, batch)")
    val spark = SparkSession.active
    val indexRoot = TableChangesTvf.resolveRoot(spark,
      TableChangesTvf.stringArg(exprs.head, "index"))
    val batchRoot = TableChangesTvf.resolveRoot(spark,
      TableChangesTvf.stringArg(exprs(1), "batch"))
    graft.ops.NearDupIndex.candidates(spark,
        Sinks.readCurrent(spark, batchRoot), indexRoot)
      .queryExecution.analyzed
  }
}

/** `read_stream('tbl')` — the SQL door for the STREAMING table tier
  * (Delta's `read_stream` / `STREAM(tbl)` analog): the table's change
  * feed as a streaming relation, so the exactly-once tier
  * ([[graft.ops.TableStream]]) is reachable from pure SQL:
  *
  * {{{
  *   spark.sql("SELECT k, v FROM read_stream('cat.ns.tbl') WHERE _change_type = 'insert'")
  *     .writeStream...   // any sink; isStreaming = true
  * }}}
  *
  * Same table-argument contract as the other TVFs (catalog-qualified
  * names resolve through the hardened catalog; `/`-bearing strings are
  * table-root paths). The plan is [[graft.ops.TableStream.streamFeed]]'s
  * — a standard file-stream source over the table's `feed/` directory,
  * checkpointable and replayable, composing with the SQL around it
  * (projections/filters push into the micro-batch scans). The table must
  * have its feed enabled ([[Sinks.enableStreamFeed]]) like any streaming
  * consumer.
  */
object ReadStreamTvf {
  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 1, "read_stream(table)")
    val spark = SparkSession.active
    val root = TableChangesTvf.resolveRoot(spark,
      TableChangesTvf.stringArg(exprs.head, "table"))
    graft.ops.TableStream.streamFeed(spark, root).queryExecution.analyzed
  }
}
