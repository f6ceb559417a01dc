package graft.catalog

import graft.ops.{Pin, Sinks}
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShims, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._

/** Marker on the catalog's live (writable) table flavor, exposing the
  * commit coordinates SQL DML publishes with: the table's directory root
  * and the version this statement resolved at analysis time — the OCC
  * precondition, so DELETE/UPDATE/MERGE lose cleanly to a concurrent
  * publish instead of silently clobbering it.
  */
private[graft] trait GraftWritableTable {
  def tableRootPath: String
  def tableBaseVersion: Long
}

/** Implemented by every Graft catalog table (current AND time-travel
  * snapshots): the resolved immutable version directory this table
  * object reads — the anchor for metadata-only rewrites
  * ([[graft.plans.MetaCountRewrite]] answers `count(*)` from the
  * `_stats` sidecar without scanning data).
  */
private[graft] trait GraftSnapshotDir {
  def snapshotVersionDir: String
  def snapshotTableRoot: String
}

/** The SQL-DML door for [[GraftCatalog]] tables: an analyzer rule that
  * converts resolved `DELETE FROM` / `UPDATE` / `MERGE INTO` statements
  * over Graft tables into runnable commands executing through the SAME
  * versioned commit protocol as every other write
  * ([[Sinks.publishVersioned]] with the analysis-time version as the OCC
  * precondition). This is the classic extension-point spelling (a
  * `Rule[LogicalPlan]` via `SparkSessionExtensions`, the shape Delta
  * used for MERGE pre-DSv2) rather than `SupportsRowLevelOperations`:
  * the layout's unit of replacement is the whole immutable version
  * directory, so the group-based rewrite plans (ReplaceData + a custom
  * `BatchWrite`) would buy nothing over recompute-and-publish while
  * costing a bespoke parquet write path.
  *
  * Scale shape: all three statements are FILE-GRANULAR copy-on-write.
  * UPDATE and DELETE run a touched-file pass (one scan projecting only
  * `input_file_name()`, condition pushed to the parquet row groups) and
  * then rewrite ONLY those files — a shuffle-free projection/filter over
  * the touched subset; every untouched file is carried into the new
  * version by hardlink ([[Sinks.cowPublish]]). MERGE is Delta's
  * two-pass: an inner join finds the touched files, then the real merge
  * join runs against only those files plus the source (equi-conditions
  * plan as hash/sort-merge joins; Catalyst broadcasts a small source),
  * plus one aggregation over the matched pairs for the SQL-standard
  * multiple-match check. `WHEN NOT MATCHED BY SOURCE` disables the
  * touched-file optimization — those clauses can rewrite any target row.
  */
/** `'graft.schema.autoMerge'` (round-16): a table-level opt-in that
  * makes EVERY merge into the table behave as if it spelled
  * `WITH SCHEMA EVOLUTION`. Injected in the HINT batch — the flip must
  * land BEFORE the analyzer expands the merge's star actions, because
  * Spark's ResolveMergeIntoSchemaEvolution derives the evolution
  * source-schema from the still-unexpanded stars; an end-of-resolution
  * flip would always arrive one iteration too late. The target is
  * still a bare multipart name here, so opt-in resolves through the
  * catalog manager by hand; any lookup failure means "not opted in"
  * (the statement then fails or succeeds on its own merits).
  */
case class GraftAutoMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable if !m.withSchemaEvolution && optedIn(m.targetTable) =>
      m.copy(withSchemaEvolution = true)
  }

  private def optedIn(t: LogicalPlan): Boolean =
    EliminateSubqueryAliases(t) match {
      case u: UnresolvedRelation => rootFor(u.multipartIdentifier)
        .exists(graft.ops.TableProps.autoMergeSchema)
      case r: DataSourceV2Relation => r.table match {
        case w: GraftWritableTable =>
          graft.ops.TableProps.autoMergeSchema(w.tableRootPath)
        case _ => false
      }
      case _ => false
    }

  private def rootFor(parts: Seq[String]): Option[String] = try {
    val cm = spark.sessionState.catalogManager
    def catalogOf(name: String): Option[GraftCatalog] =
      try cm.catalog(name) match {
        case g: GraftCatalog => Some(g)
        case _ => None
      } catch { case scala.util.control.NonFatal(_) => None }
    val qualified =
      if (parts.length >= 2) catalogOf(parts.head).map(_ -> parts.tail)
      else None
    val resolved = qualified.orElse(cm.currentCatalog match {
      case g: GraftCatalog => Some(g -> parts)
      case _ => None
    })
    resolved.map { case (g, rest) =>
      g.tableRootFor(org.apache.spark.sql.connector.catalog.Identifier
        .of(rest.init.toArray, rest.last))
    }
  } catch { case scala.util.control.NonFatal(_) => None }
}

object GraftDmlRule extends Rule[LogicalPlan] {

  private def graftTarget(plan: LogicalPlan): Option[(DataSourceV2Relation, GraftWritableTable)] =
    EliminateSubqueryAliases(plan) match {
      case r: DataSourceV2Relation =>
        r.table match {
          case w: GraftWritableTable => Some((r, w))
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case d @ DeleteFromTable(t, cond) if d.resolved =>
      graftTarget(t).map { case (r, w) =>
        GraftDeleteCommand(r, cond, w.tableRootPath, w.tableBaseVersion): LogicalPlan
      }.getOrElse(d)

    case u @ UpdateTable(t, assignments, cond) if u.resolved =>
      graftTarget(t).map { case (r, w) =>
        GraftUpdateCommand(r, assignments, cond, w.tableRootPath, w.tableBaseVersion): LogicalPlan
      }.getOrElse(u)

    case m: MergeIntoTable if m.resolved =>
      graftTarget(m.targetTable).map { case (r, w) =>
        // WITH SCHEMA EVOLUTION needs no handling here: by the time the
        // merge is resolved, ResolveMergeIntoSchemaEvolution has already
        // ADDed the source-only columns (metadata-only) and reloaded the
        // relation — w.tableBaseVersion below IS the evolved version.
        GraftMergeCommand(r, m.sourceTable, m.mergeCondition, m.matchedActions,
          m.notMatchedActions, m.notMatchedBySourceActions,
          w.tableRootPath, w.tableBaseVersion): LogicalPlan
      }.getOrElse(m)

    // `ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS a, b | FOR ALL
    // COLUMNS]` (round-16): Spark has no v2 ANALYZE — route the SQL
    // standard's spelling onto the engine's sidecar annotate pass (the
    // `CALL system.annotate_stats` twin). Row/size stats are already
    // exact on every commit (B167), so the statement's value is the
    // column tier: min/max skipping bounds, declared NDV sketches and
    // histogram boundaries.
    case a: org.apache.spark.sql.catalyst.plans.logical.AnalyzeColumn =>
      analyzeRoot(a.child).map(root => GraftAnalyzeCommand(root,
        a.columnNames.getOrElse(Nil), a.allColumns): LogicalPlan)
        .getOrElse(a)
    case a: org.apache.spark.sql.catalyst.plans.logical.AnalyzeTable
        if a.partitionSpec.isEmpty =>
      // no column list: refresh the DECLARED tiers (the retrofit
      // remedy, no names needed); NOSCAN validates and does nothing —
      // the commit-maintained row/size stats are already exact
      analyzeRoot(a.child).map(root => GraftAnalyzeCommand(root, Nil,
        allColumns = false, noScan = a.noScan): LogicalPlan).getOrElse(a)
  }

  private def analyzeRoot(child: LogicalPlan): Option[String] = child match {
    case rt: org.apache.spark.sql.catalyst.analysis.ResolvedTable =>
      rt.table match {
        case w: GraftWritableTable => Some(w.tableRootPath)
        case _ => None
      }
    case _ => None
  }
}

/** The runnable side of the ANALYZE rewrite: resolve the column set
  * (explicit, ALL, or the declared tiers) and run the same sidecar
  * annotate pass the `CALL system.annotate_stats` door runs — declared
  * NDV/histogram columns inside the set retrofit their sketches and
  * boundaries exactly like the CALL.
  */
case class GraftAnalyzeCommand(tRoot: String, explicitCols: Seq[String],
    allColumns: Boolean, noScan: Boolean = false) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (noScan) return Seq.empty
    val schema = graft.ops.Sinks.readCurrent(spark, tRoot).schema
    val ndvDecl = graft.ops.TableProps.ndvColumns(tRoot)
    val histDecl = graft.ops.TableProps.histogramColumns(tRoot)
    val cols: Seq[String] =
      if (allColumns) schema.fieldNames.toSeq
      else if (explicitCols.nonEmpty) {
        val known = schema.fieldNames.map(_.toLowerCase).toSet
        val missing = explicitCols.filterNot(c => known(c.toLowerCase))
        require(missing.isEmpty,
          s"ANALYZE: column(s) not in $tRoot: ${missing.mkString(", ")}")
        explicitCols
      } else
        // bare ANALYZE TABLE: the declared tiers (stats ∪ ndv ∪ hist)
        (graft.ops.TableProps.statsColumns(tRoot) ++ ndvDecl ++ histDecl)
          .map(_.toLowerCase).distinct
          .filter(c => schema.fieldNames.exists(_.equalsIgnoreCase(c)))
    if (cols.isEmpty) return Seq.empty
    graft.ops.Stats.annotate(spark, graft.ops.Sinks.resolve(tRoot), cols,
      ndvCols = ndvDecl.filter(c => cols.exists(_.equalsIgnoreCase(c))),
      histCols = histDecl.filter(c => cols.exists(_.equalsIgnoreCase(c))))
    Seq.empty
  }
}

private object GraftDml {
  /** Catalyst expression (resolved against the captured plans — the
    * relation objects carry the same attribute ids the statement's
    * conditions and assignments reference) as a usable Column.
    */
  def col0(e: Expression): Column = GraftSqlShims.column(e)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    GraftSqlShims.ofRows(spark, plan)

  /** `input_file_name()` returns a URL-ENCODED URI; the carry filter and
    * sidecar keys compare RAW filesystem names. Decode before deriving
    * any key — a Hive-escaped or non-ASCII partition value
    * (`city=a%3Ab`, `city=北`) differs between the two spellings, and an
    * undecoded key would make the carry filter keep the old file
    * alongside its rewrite (silently resurrecting deleted rows).
    */
  def decodePath(uri: String): String =
    try java.nio.file.Paths.get(new java.net.URI(uri)).toString
    catch { case _: Exception => uri }

  /** Version-dir-relative path of a DECODED data-file path — the key
    * [[Sinks.cowPublish]]'s carry filter and the stats sidecar use. The
    * path may still carry a scheme prefix, so the live dir is located by
    * substring, not by prefix-stripping.
    */
  def relOf(liveDir: String, path: String): String = {
    val marker = liveDir.stripSuffix("/") + "/"
    val i = path.indexOf(marker)
    require(i >= 0, s"graft DML: file $path is not under $liveDir")
    path.substring(i + marker.length)
  }

  /** The data files of the pinned version whose rows can satisfy `cond`
    * — Delta's touched-file pass: one scan projecting only the file
    * name (`input_file_name()` is stamped at the scan). Pass the RAW
    * statement condition, not a `coalesce(cond, false)` wrapper:
    * `filter` drops NULL-evaluating rows either way, and the raw
    * condition is what the parquet scan can push down to prune row
    * groups. Collected driver-side at metadata scale. Returns (decoded
    * absolute paths, version-dir-relative keys).
    */
  def touchedFiles(t: DataFrame, cond: Column,
      liveDir: String): (Seq[String], Set[String]) = {
    val abs = t.filter(cond).select(input_file_name())
      .distinct().collect().map(r => decodePath(r.getString(0))).toSeq
    (abs, abs.map(relOf(liveDir, _)).toSet)
  }

  /** The SAME resolved relation restricted to `touchedAbs` data files:
    * a copy of the captured [[DataSourceV2Relation]] whose delegate
    * scans only those paths, KEEPING the original output attributes —
    * so the statement's resolved conditions and assignments still bind,
    * while planning sees only the touched files (the rewrite scan is
    * O(touched), not O(table)). `basePath` keeps partition columns in
    * scope for partitioned layouts; the schema is pinned to the
    * relation's, so partition-directory type inference cannot drift.
    * An empty touched set is the empty relation.
    */
  def prunedTarget(spark: SparkSession, target: DataSourceV2Relation,
      touchedAbs: Seq[String], liveDir: String): DataFrame = {
    if (touchedAbs.isEmpty) return ofRows(spark, target).limit(0)
    import scala.jdk.CollectionConverters._
    val pruned = org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
      name = target.table.name(),
      sparkSession = spark,
      options = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        Map("basePath" -> liveDir).asJava),
      paths = touchedAbs,
      userSpecifiedSchema = Some(target.table.schema()),
      fallbackFileFormat =
        classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
    ofRows(spark, target.copy(table = pruned))
  }

  /** Assignment value for `attr` in `assignments`, if assigned. Nested
    * (struct-field) assignment keys are not representable in this
    * layout's rewrite — fail loudly rather than silently dropping them.
    */
  def assignedValue(assignments: Seq[Assignment], attr: Attribute): Option[Expression] =
    assignments.collectFirst {
      case a if a.key.isInstanceOf[Attribute] &&
        a.key.asInstanceOf[Attribute].exprId == attr.exprId => a.value
      case a if !a.key.isInstanceOf[Attribute] &&
        a.key.references.exists(_.exprId == attr.exprId) =>
        throw new UnsupportedOperationException(
          s"graft DML: nested-field assignment ${a.key.sql} is not supported " +
            "(assign the whole top-level column)")
    }
}

/** `DELETE FROM t WHERE cond`: copy-on-write at FILE granularity. A
  * touched-file pass finds the data files whose rows can satisfy the
  * condition; only THOSE files are rewritten (keeping the rows where the
  * condition is FALSE or NULL — three-valued SQL semantics), and every
  * other live file is carried into the new version by hardlink. A DELETE
  * of 0.1% of a 100 TB table moves 0.1% of the bytes, not the table.
  */
case class GraftDeleteCommand(target: DataSourceV2Relation, condition: Expression,
    tRoot: String, baseVersion: Long) extends LeafRunnableCommand {
  import GraftDml._
  override def run(spark: SparkSession): Seq[Row] = {
    // merge-on-read route (B135): chosen by table property, or forced
    // when a deletion vector already exists (a COW rewrite would read
    // raw files and resurrect deleted rows — cowPublish refuses)
    val morDir = Sinks.versionPath(tRoot, baseVersion)
    val morMode = graft.ops.TableProps.load(tRoot)
      .get("graft.dml.mode").exists(_.equalsIgnoreCase("mor")) ||
      graft.ops.Dv.exists(morDir) ||
      // a column-mapped version also forces merge-on-read: the COW
      // pruned-file scan cannot express the physical->logical
      // translation, while the MOR live scan does (liveWithPositions).
      // A mixed-layout version (metadata-only partition evolution)
      // forces it for the same reason: the pruned explicit-file scan
      // cannot serve files whose partition directories disagree, while
      // the MOR live scan unions the legs
      graft.ops.ColMap.exists(morDir) ||
      graft.ops.Sinks.hasLayoutLegs(morDir) ||
      // pending equality deletes force merge-on-read too (round-14):
      // the COW raw-file rewrite would resurrect tombstoned rows
      graft.ops.EqDel.maintained(morDir)
    if (morMode) {
      // re-bind the resolved condition by NAME onto the fresh scan the
      // MOR door filters (subqueries are not re-bindable this way —
      // refuse rather than mis-resolve)
      require(!condition.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]),
        "merge-on-read DELETE does not support subqueries in the " +
          "condition; compact the table and use copy-on-write, or " +
          "rewrite the predicate")
      val nameBased = condition.transform {
        case a: Attribute =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(a.name)
      }
      Sinks.deleteVector(spark, tRoot, col0(nameBased))
      return Seq.empty
    }
    val t = ofRows(spark, target)
    val liveDir = Sinks.versionPath(tRoot, baseVersion)
    // raw condition for the touched pass (pushdown); NULL-safe wrapper
    // only where the three-valued keep semantics need it
    val (touchedAbs, touchedRel) = touchedFiles(t, col0(condition), liveDir)
    // rewrite = the touched files' surviving rows only
    val touched = prunedTarget(spark, target, touchedAbs, liveDir)
    val kept = touched
      .filter(!coalesce(col0(condition), lit(false)))
      .select(target.output.map(a => col0(a).as(a.name)): _*)
    // the statement's own change feed: exactly the deleted rows, read
    // from the same immutable touched files (conditions must be
    // deterministic — the COW contract)
    val feed = touched.filter(coalesce(col0(condition), lit(false)))
      .select(target.output.map(a => col0(a).as(a.name)): _*)
      .withColumn("_change_type", lit("delete"))
    Sinks.cowPublish(spark, tRoot, baseVersion, touchedRel, kept,
      changeFeed = Some(feed))
    Seq.empty
  }
}

/** `UPDATE t SET ... WHERE cond`: copy-on-write at FILE granularity —
  * the touched-file pass finds files whose rows can satisfy the
  * condition, only those are rewritten (per-column CASE WHEN cond THEN
  * value ELSE current END; NULL/FALSE keeps the current value, rows are
  * never dropped), every other live file is carried by hardlink.
  */
case class GraftUpdateCommand(target: DataSourceV2Relation,
    assignments: Seq[Assignment], condition: Option[Expression],
    tRoot: String, baseVersion: Long) extends LeafRunnableCommand {
  import GraftDml._

  /** The recompute expression of a generated column with every
    * single-part source reference SUBSTITUTED through `sub` (the
    * assignment's value expression when the source is assigned). All
    * of an UPDATE's output columns evaluate simultaneously over the
    * PRE row, so substituting assigned exprs into the generation SQL
    * IS "recompute over the post row" — no second pass, and the data
    * and the change feed read the same expressions.
    */
  private def genRecompute(spark: SparkSession, sql: String,
      sub: String => Option[Expression]): Column = {
    val parsed = spark.sessionState.sqlParser.parseExpression(sql)
    col0(parsed.transformUp {
      case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if ua.nameParts.length == 1 && sub(ua.nameParts.head).isDefined =>
        sub(ua.nameParts.head).get
    })
  }

  override def run(spark: SparkSession): Seq[Row] = {
    // generated columns (round-16): a DIRECT assignment stays refused
    // (ALWAYS semantics); an assignment to a SOURCE column re-derives
    // the generated value in the same projection — the Delta semantic,
    // on both routes and in the change feed
    val genSpecs = graft.ops.Generated.specs(tRoot)
    val assignedLower = assignments.flatMap(
      _.key.collectFirst { case a: Attribute => a.name.toLowerCase }).toSet
    genSpecs.foreach(s => require(!assignedLower.contains(s.col),
      s"graft UPDATE cannot assign generated column ${s.col} — it is " +
        s"GENERATED ALWAYS AS (${s.sql}); assign its sources and the " +
        "column re-derives"))
    // recompute only the generated columns whose sources this statement
    // assigns — others keep their stored (still-valid) values
    val genRecomputed: Map[String, graft.ops.Generated.Spec] =
      genSpecs.filter(s => graft.ops.Generated.sourceCols(spark, s)
        .exists(assignedLower)).map(s => s.col -> s).toMap
    // merge-on-read route (B136): same selection as DELETE — table
    // property, or forced by an existing vector (COW would resurrect)
    val morDir = Sinks.versionPath(tRoot, baseVersion)
    val morMode = graft.ops.TableProps.load(tRoot)
      .get("graft.dml.mode").exists(_.equalsIgnoreCase("mor")) ||
      graft.ops.Dv.exists(morDir) ||
      // a column-mapped version also forces merge-on-read: the COW
      // pruned-file scan cannot express the physical->logical
      // translation, while the MOR live scan does (liveWithPositions).
      // A mixed-layout version (metadata-only partition evolution)
      // forces it for the same reason: the pruned explicit-file scan
      // cannot serve files whose partition directories disagree, while
      // the MOR live scan unions the legs
      graft.ops.ColMap.exists(morDir) ||
      graft.ops.Sinks.hasLayoutLegs(morDir) ||
      // pending equality deletes force merge-on-read too (round-14):
      // the COW raw-file rewrite would resurrect tombstoned rows
      graft.ops.EqDel.maintained(morDir)
    if (morMode) {
      val exprs = condition.toSeq ++ assignments.map(_.value)
      require(!exprs.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression])),
        "merge-on-read UPDATE does not support subqueries; compact the " +
          "table and use copy-on-write, or rewrite the statement")
      def nameBound(e: Expression): Column = col0(e.transform {
        case a: Attribute =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(a.name)
      })
      val assignMap0 = target.output.flatMap { attr =>
        assignedValue(assignments, attr).map(v =>
          attr.name -> nameBound(v).cast(attr.dataType))
      }.toMap
      // re-derive source-touched generated columns inside the same
      // one-select rewrite (updateVector applies assignments over the
      // matched PRE rows simultaneously)
      val assignMap = assignMap0 ++ target.output.flatMap { attr =>
        genRecomputed.get(attr.name.toLowerCase).map { s =>
          attr.name -> genRecompute(spark, s.sql, n =>
            assignMap0.collectFirst {
              case (k, v) if k.equalsIgnoreCase(n) => GraftSqlShims.expression(v)
            }).cast(attr.dataType)
        }
      }
      val cond0 = condition.map(nameBound).getOrElse(lit(true))
      // CHECK constraints gate the updated copies exactly as the COW
      // path gates its rewrite — enforcement wraps the written frame
      Sinks.updateVector(spark, tRoot, cond0, assignMap,
        validate = GraftCheck.enforce(_, tRoot))
      return Seq.empty
    }
    val t = ofRows(spark, target)
    val cond = condition.map(col0).getOrElse(lit(true))
    val liveDir = Sinks.versionPath(tRoot, baseVersion)
    // raw condition: filter drops NULL rows either way, and raw pushes
    // down to the parquet row groups
    val (touchedAbs, touchedRel) = touchedFiles(t, cond, liveDir)
    // an assigned source's RAW value expr (cast to the source's type),
    // for substitution into a generated column's recompute — the when
    // wrapper is added once around the whole recompute below
    def assignedExpr(name: String): Option[Expression] =
      target.output.find(_.name.equalsIgnoreCase(name)).flatMap(a0 =>
        assignedValue(assignments, a0).map(v =>
          GraftSqlShims.expression(col0(v).cast(a0.dataType))))
    val outCols = target.output.map { attr =>
      genRecomputed.get(attr.name.toLowerCase) match {
        case Some(s) =>
          when(cond, genRecompute(spark, s.sql, assignedExpr)
            .cast(attr.dataType)).otherwise(col0(attr)).as(attr.name)
        case None => assignedValue(assignments, attr) match {
          case Some(v) =>
            when(cond, col0(v).cast(attr.dataType)).otherwise(col0(attr)).as(attr.name)
          case None => col0(attr).as(attr.name)
        }
      }
    }
    val touched = prunedTarget(spark, target, touchedAbs, liveDir)
    val rewritten = touched.select(outCols: _*)
    // the statement's change feed: pre/post images of the rows the
    // condition selects, no-op assignments dropped (Delta-CDF parity
    // with changesBetween); derived from the same immutable files
    val names = target.output.map(_.name)
    val pre = struct(target.output.map(a => col0(a).as(a.name)): _*)
    val post = struct(target.output.map { attr =>
      genRecomputed.get(attr.name.toLowerCase) match {
        case Some(s) =>
          genRecompute(spark, s.sql, assignedExpr).cast(attr.dataType).as(attr.name)
        case None => assignedValue(assignments, attr)
          .map(e => col0(e).cast(attr.dataType)).getOrElse(col0(attr)).as(attr.name)
      }
    }: _*)
    val feed = touched.filter(coalesce(cond, lit(false)))
      .select(pre.as("_pre"), post.as("_post"))
      .filter(!(col("_pre") <=> col("_post")))
      .select(explode(array(
        struct(lit("update_preimage").as("t"), col("_pre").as("p")),
        struct(lit("update_postimage").as("t"), col("_post").as("p")))).as("_c"))
      .select(names.map(n => col(s"_c.p.$n").as(n)) :+ col("_c.t").as("_change_type"): _*)
    // CHECK constraints gate the rewritten contents (pre-existing rows
    // were validated when the constraint was added, so only the rows
    // this statement changes can trip the gate); row-local, same scan
    Sinks.cowPublish(spark, tRoot, baseVersion, touchedRel,
      GraftCheck.enforce(rewritten, tRoot), changeFeed = Some(feed))
    Seq.empty
  }
}

/** `MERGE INTO t USING s ON cond WHEN ...`: general SQL MERGE over the
  * versioned layout. One outer join of target and source on the merge
  * condition (full outer only when INSERT clauses need the source-only
  * rows), a per-row action dispatch (first clause whose condition holds
  * wins, SQL clause order), then one projection building the next full
  * table contents — published atomically with the analysis-time version
  * as the OCC precondition.
  *
  * The SQL-standard cardinality rule is enforced: when matched clauses
  * exist and a target row matches MORE than one source row, the
  * statement fails (one extra aggregation over the matched pairs — the
  * candidate set, never the full table cross product).
  */
case class GraftMergeCommand(target: DataSourceV2Relation, source: LogicalPlan,
    mergeCondition: Expression, matchedActions: Seq[MergeAction],
    notMatchedActions: Seq[MergeAction], notMatchedBySourceActions: Seq[MergeAction],
    tRoot: String, baseVersion: Long) extends LeafRunnableCommand {
  import GraftDml._

  private val TP = "__graft_t_present"
  private val SP = "__graft_s_present"
  private val RID = "__graft_rid"
  private val OP = "__graft_op"
  private val FILE = "__graft_file"

  private def actionCond(a: MergeAction): Column = a match {
    case u: UpdateAction => u.condition.map(col0).getOrElse(lit(true))
    case d: DeleteAction => d.condition.map(col0).getOrElse(lit(true))
    case i: InsertAction => i.condition.map(col0).getOrElse(lit(true))
    case other => throw new UnsupportedOperationException(
      s"graft MERGE: unsupported action $other")
  }

  /** First-match dispatch: the tag of the first action whose condition
    * holds (NULL = does not hold), else `default`. DELETE actions tag as
    * `d<tag>` — distinct from the `drop` default, so the change feed can
    * tell a matched DELETE (emits a delete row) from an unmatched source
    * row no clause consumed (emits nothing); the row filter removes both.
    */
  private def dispatch(acts: Seq[(MergeAction, String)], default: String): Column =
    acts.foldRight(lit(default): Column) { case ((a, tag), els) =>
      val t = a match { case _: DeleteAction => s"d$tag"; case _ => tag }
      when(coalesce(actionCond(a), lit(false)), lit(t)).otherwise(els)
    }

  /** Generated-column support (round-16, the boundary lifted): MERGE
    * publishes its output frames directly, so derivation happens INSIDE
    * the per-action projection — the same one-pass discipline as the
    * UPDATE door. All references in the generation SQL are substituted
    * (never resolved by name against the two-sided join frame, where
    * target and source legitimately share names): an assigned source
    * becomes the action's value expression, an unassigned one the
    * route's current-target reference (UPDATE actions) or a NULL
    * literal (INSERT actions, the omitted-column contract).
    */
  private def genDerived(spark: SparkSession, spec: graft.ops.Generated.Spec,
      sub: String => Option[Expression],
      tpe: org.apache.spark.sql.types.DataType): Column = {
    val parsed = spark.sessionState.sqlParser.parseExpression(spec.sql)
    col0(parsed.transformUp {
      case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if ua.nameParts.length == 1 && sub(ua.nameParts.head).isDefined =>
        sub(ua.nameParts.head).get
    }).cast(tpe)
  }

  /** UPDATE-action value of generated `attr`: unchanged sources keep
    * the stored (still-valid) value; an assigned source re-derives by
    * substitution. `bind` turns a statement expression into a Column on
    * the route's frame (COW: exprId-bound; MOR: name-rebound), and
    * `tRef` is the route's reference to a current target column.
    */
  private def genUpdateValue(spark: SparkSession, s: graft.ops.Generated.Spec,
      u: UpdateAction, attr: Attribute, bind: Expression => Column,
      tRef: String => Expression): Column = {
    def assignedOf(n: String): Option[Expression] =
      target.output.find(_.name.equalsIgnoreCase(n)).flatMap(sa =>
        assignedValue(u.assignments, sa).map(e =>
          GraftSqlShims.expression(bind(e).cast(sa.dataType))))
    if (!graft.ops.Generated.sourceCols(spark, s).exists(n => assignedOf(n).isDefined))
      col0(tRef(attr.name))
    else genDerived(spark, s,
      n => assignedOf(n).orElse(Some(tRef(n))), attr.dataType)
  }

  /** INSERT-action value of `attr`: the assigned expression or NULL —
    * and for a generated column the door contract ([[graft.ops.Generated.reconcile]]):
    * derive the NULL/omitted cell from the action's assigned sources,
    * refuse a mismatching explicit value row-locally.
    */
  private def genInsertValue(spark: SparkSession, ins: InsertAction,
      attr: Attribute, gspec: Option[graft.ops.Generated.Spec],
      bind: Expression => Column): Column = {
    val explicit = assignedValue(ins.assignments, attr)
      .map(e => bind(e).cast(attr.dataType))
    gspec match {
      case None => explicit.getOrElse(lit(null).cast(attr.dataType))
      case Some(s) =>
        val gen = genDerived(spark, s, n =>
          target.output.find(_.name.equalsIgnoreCase(n)).map(sa =>
            assignedValue(ins.assignments, sa)
              .map(e => GraftSqlShims.expression(bind(e).cast(sa.dataType)))
              .getOrElse(org.apache.spark.sql.catalyst.expressions.Literal
                .create(null, sa.dataType))), attr.dataType)
        explicit.fold(gen)(v =>
          graft.ops.Generated.reconcile(v, gen, attr.name, s.sql))
    }
  }

  override def run(spark: SparkSession): Seq[Row] = {
    // generated columns: a DIRECT assignment in any UPDATE action stays
    // refused (ALWAYS semantics — same message as the UPDATE door);
    // sources re-derive, INSERT actions derive/reconcile (helpers above)
    val genSpecs = graft.ops.Generated.specs(tRoot)
    (matchedActions ++ notMatchedBySourceActions).foreach {
      case u: UpdateAction =>
        val assigned = u.assignments.flatMap(_.key.collectFirst {
          case a: Attribute => a.name.toLowerCase }).toSet
        genSpecs.foreach(s => require(!assigned(s.col),
          s"graft MERGE cannot assign generated column ${s.col} — it is " +
            s"GENERATED ALWAYS AS (${s.sql}); assign its sources and the " +
            "column re-derives"))
      case _ => ()
    }
    val genByCol = genSpecs.map(s => s.col -> s).toMap
    // merge-on-read route (same selection as DELETE/UPDATE): matched
    // update/delete rows' positions join the vector, updated copies and
    // inserts are the commit's only new files — no file rewrites
    val morDir = Sinks.versionPath(tRoot, baseVersion)
    if (graft.ops.TableProps.load(tRoot)
          .get("graft.dml.mode").exists(_.equalsIgnoreCase("mor")) ||
        graft.ops.Dv.exists(morDir) ||
        // column-mapped versions force MOR too (same reasoning as the
        // DELETE/UPDATE routes: the COW pruned scan can't translate),
        // and so do mixed-layout versions (the pruned scan can't union
        // disagreeing partition layouts)
        graft.ops.ColMap.exists(morDir) ||
        graft.ops.Sinks.hasLayoutLegs(morDir) ||
        graft.ops.EqDel.maintained(morDir)) {
      return runMor(spark, morDir)
    }
    val t = ofRows(spark, target)
    val s = ofRows(spark, source)

    // multi-match detection is needed whenever matched pairs can reach
    // the rewrite: matched clauses (ambiguity check) AND by-source-only
    // merges (a multi-matched 'keep' row must not be duplicated)
    val needRid = matchedActions.nonEmpty || notMatchedBySourceActions.nonEmpty
    // Copy-on-write (Delta's two-pass MERGE): pass 1 inner-joins target
    // and source to find the files holding matched target rows; pass 2
    // runs the real merge join against ONLY those files, and every
    // untouched file is carried into the new version by hardlink. Any
    // source row's match lives in a touched file BY DEFINITION, so the
    // matched / not-matched classification over the touched subset is
    // identical to the full-table join. WHEN NOT MATCHED BY SOURCE
    // disables the optimization: those clauses can rewrite ANY target
    // row, so every file is potentially touched.
    val cow = notMatchedBySourceActions.isEmpty
    val liveDir = Sinks.versionPath(tRoot, baseVersion)
    // with matched clauses the join is evaluated twice (cardinality
    // check + publish) — and under copy-on-write the source feeds the
    // touched-file pass too — pin the SOURCE so every pass sees the
    // same rows; otherwise a non-deterministic source could pass the
    // check and still publish a duplicated target row (the corruption
    // the rule exists to prevent; Delta materializes the source for the
    // same reason). The target needs no pin: it is an immutable version
    // dir, and RID (partition-indexed over that fixed scan) re-derives
    // identically. Source is O(delta) — the cheap side to pin.
    val sdf0 = s.withColumn(SP, lit(true))
    val sdf = if (needRid || cow) sdf0.localCheckpoint() else sdf0
    // insert-only MERGE (no matched / by-source clauses): nothing in the
    // target can change, so the touched-file pass and the rewrite are
    // pure waste — select the unmatched source rows with ONE left-anti
    // join and publish them as a linked append (every data file carried)
    // identity columns (round-15): MERGE does not GENERATE identity
    // values — the landed rows and the change feed are projections of
    // the same pinned frame, and generating after the pin would diverge
    // them — so every INSERT action must assign each identity column
    // explicitly. The INSERT door is the generating path.
    // GENERATED ALWAYS additionally refuses MERGE INSERT outright:
    // accepting an explicit assignment here would bypass the
    // explicit-value refusal the INSERT door enforces and risk
    // collisions with the reservation counter.
    val idSpecs = graft.ops.Identity.specs(tRoot)
    if (idSpecs.nonEmpty) notMatchedActions.foreach {
      case ins: InsertAction => idSpecs.foreach { spec =>
        val attr = target.output.find(_.name.equalsIgnoreCase(spec.col))
        if (attr.isDefined) {
          require(spec.allowExplicit,
            s"identity column ${spec.col} is GENERATED ALWAYS — MERGE " +
              "INSERT cannot supply it (route generated inserts through " +
              "INSERT INTO)")
          require(assignedValue(ins.assignments, attr.get).isDefined,
            s"MERGE INSERT must assign identity column ${spec.col} explicitly " +
              "(MERGE does not generate identity values; route generated " +
              "inserts through INSERT INTO)")
        }
      }
      case _ => ()
    }
    if (cow && matchedActions.isEmpty) {
      val anti = sdf.join(t, col0(mergeCondition), "left_anti")
      val insertTagged0 = notMatchedActions.zipWithIndex.map { case (a, i) => (a, s"i$i") }
      // pinned once: the data and the insert feed must be projections of
      // the SAME rows even under a non-deterministic source
      val tagged = anti.withColumn(OP, dispatch(insertTagged0, "drop"))
        .filter(col(OP) =!= "drop").localCheckpoint()
      val outCols0 = target.output.map { attr =>
        val gspec = genByCol.get(attr.name.toLowerCase)
        var c: Column = lit(null).cast(attr.dataType)
        insertTagged0.foreach {
          case (ins: InsertAction, tag) =>
            val v = genInsertValue(spark, ins, attr, gspec, col0)
            c = when(col(OP) === tag, v).otherwise(c)
          case _ => ()
        }
        c.as(attr.name)
      }
      val inserted = GraftCheck.enforce(tagged.select(outCols0: _*), tRoot)
      Sinks.cowPublish(spark, tRoot, baseVersion, Set.empty,
        inserted, checkEmpty = false,
        changeFeed = Some(tagged.select(outCols0: _*)
          .withColumn("_change_type", lit("insert"))))
      return Seq.empty
    }
    val (touchedAbs, touchedRel) =
      if (!cow) (Seq.empty[String], Set.empty[String])
      else {
        // input_file_name() must be stamped AT the target scan, before
        // the join moves rows between stages; decode before keying
        val abs = t.withColumn(FILE, input_file_name())
          .join(sdf, col0(mergeCondition), "inner")
          .select(col(FILE)).distinct().collect()
          .map(r => decodePath(r.getString(0))).toSeq
        (abs, abs.map(relOf(liveDir, _)).toSet)
      }
    val tCow =
      if (cow) prunedTarget(spark, target, touchedAbs, liveDir) else t
    val tdf0 = tCow.withColumn(TP, lit(true))
    val tdf = if (needRid) tdf0.withColumn(RID, monotonically_increasing_id()) else tdf0

    // full outer only when INSERT clauses consume source-only rows;
    // otherwise target-left keeps every target row and drops the
    // unmatched source side before it ever shuffles
    val joinType = if (notMatchedActions.nonEmpty) "full_outer" else "left_outer"
    val joined = tdf.join(sdf, col0(mergeCondition), joinType)

    val matchedTagged = matchedActions.zipWithIndex.map { case (a, i) => (a, s"m$i") }
    val insertTagged = notMatchedActions.zipWithIndex.map { case (a, i) => (a, s"i$i") }
    val nmbsTagged = notMatchedBySourceActions.zipWithIndex.map { case (a, i) => (a, s"b$i") }

    val tp = coalesce(col(TP), lit(false))
    val sp = coalesce(col(SP), lit(false))
    val op = when(tp && sp, dispatch(matchedTagged, "keep"))
      .when(sp && !tp, dispatch(insertTagged, "drop"))
      .otherwise(dispatch(nmbsTagged, "keep"))

    // ONE pinned execution of the dispatched join; the published table
    // AND the change feed are projections of these identical rows
    // (Merge.applyTo's emitChanges design) — the dominant shuffle is not
    // paid twice, and feed/data can never disagree. localCheckpoint, not
    // Pin.stable, deliberately: downstream column references here are
    // exprId-bound (target and source legitimately share names, so
    // by-name rebinding is ambiguous) and only a plan that preserves
    // output attributes keeps them resolvable. The pinned frame is
    // O(touched files ∪ source) — the same working set the COW rewrite
    // materializes anyway; an executor loss costs a merge retry, never
    // corruption (the commit has not happened). The by-name-rebindable
    // MOR path below uses the durable Pin.stable.
    val tagged = joined.withColumn(OP, op).localCheckpoint()

    // SQL cardinality rule + multi-match resolution, on the SAME pinned
    // rows the publish reads. A target row matched by several source
    // rows is ambiguous ONLY when more than one pair's dispatched op
    // ACTS (update/delete) — pairs every matched clause dispatches to
    // 'keep' modify nothing, and Delta/SQL error only when an
    // update/delete actually applies. An allowed multi-match still must
    // not duplicate the target row in the rewrite: the acting pair (if
    // any) consumes the row, surplus 'keep' copies collapse to one.
    val resolved = if (!needRid) tagged else {
      val isPair = coalesce(col(TP), lit(false)) && coalesce(col(SP), lit(false))
      val matchedPairs = tagged.filter(isPair)
      val multi = matchedPairs.groupBy(col(RID))
        .agg(count(lit(1)).as("__n"),
          count(when(col(OP) =!= "keep", 1)).as("__na"))
        .filter(col("__n") > 1)
        .agg(count(lit(1)).as("dups"),
          coalesce(max(col("__na")), lit(0L)).as("maxa"))
        .collect()(0)
      if (multi.getLong(1) > 1) throw new IllegalStateException(
        "graft MERGE: a target row matched more than one source row — " +
          "the SQL cardinality rule makes the update/delete ambiguous; " +
          "deduplicate the source on the merge key first")
      if (multi.getLong(0) == 0) tagged
      else {
        // rare path (multi-matches exist, at most one pair acts each):
        // the acting pair outranks keeps; all-keep rows collapse to one
        // copy. Re-pinned so data and feed read ONE stable resolution.
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col(RID))
          .orderBy(when(col(OP) =!= "keep", lit(0)).otherwise(lit(1)))
        val collapsed = matchedPairs
          .withColumn("__graft_rn", row_number().over(w))
          .filter(col("__graft_rn") === 1).drop("__graft_rn")
        // localCheckpoint (same exprId-preservation constraint as the
        // tagged pin); O(matched pairs ∪ tagged), rare path only
        collapsed.unionByName(tagged.filter(!isPair)).localCheckpoint()
      }
    }

    val kept = resolved.filter(!(col(OP) === "drop" || col(OP).startsWith("d")))

    val outCols = target.output.map { attr =>
      val gspec = genByCol.get(attr.name.toLowerCase)
      var c: Column = when(col(OP) === "keep", col0(attr))
      (matchedTagged ++ nmbsTagged).foreach {
        case (u: UpdateAction, tag) =>
          // a generated column re-derives when the action assigns any of
          // its sources (substitution over the PRE row — UPDATE-door
          // semantics); otherwise the stored value is still valid
          val v = gspec match {
            case Some(s) => genUpdateValue(spark, s, u, attr, col0,
              n => target.output.find(_.name.equalsIgnoreCase(n))
                .getOrElse(attr))
            case None => assignedValue(u.assignments, attr)
              .map(e => col0(e).cast(attr.dataType)).getOrElse(col0(attr))
          }
          c = c.when(col(OP) === tag, v)
        case _ => ()
      }
      insertTagged.foreach {
        case (ins: InsertAction, tag) =>
          // columns the INSERT clause leaves unassigned are NULL, the
          // same null-backfill contract as additive schema evolution;
          // generated columns derive/reconcile (the INSERT-door contract)
          val v = genInsertValue(spark, ins, attr, gspec, col0)
          c = c.when(col(OP) === tag, v)
        case _ => ()
      }
      c.as(attr.name)
    }

    val result = GraftCheck.enforce(kept.select(outCols: _*), tRoot)
    // the merge's row-level change feed, from the SAME pinned rows:
    // inserts carry the post image, matched/by-source deletes the pre
    // image, updates both (no-op updates dropped — changesBetween
    // parity); 'keep' and unconsumed source rows emit nothing
    val names = target.output.map(_.name)
    val preS = struct(target.output.map(a => col0(a).as(a.name)): _*)
    val postS = struct(outCols: _*)
    val emptyRow = slice(array(struct(lit("x").as("t"), preS.as("p"))), 1, 0)
    val feedRows =
      when(col(OP).startsWith("i"),
        array(struct(lit("insert").as("t"), postS.as("p"))))
      .when(col(OP) =!= "drop" && col(OP).startsWith("d"),
        array(struct(lit("delete").as("t"), preS.as("p"))))
      .when((col(OP).startsWith("m") || col(OP).startsWith("b")) && !(preS <=> postS),
        array(struct(lit("update_preimage").as("t"), preS.as("p")),
          struct(lit("update_postimage").as("t"), postS.as("p"))))
      .otherwise(emptyRow)
    val feed = resolved.select(explode(feedRows).as("_c"))
      .select(names.map(n => col(s"_c.p.$n").as(n)) :+
        col("_c.t").as("_change_type"): _*)
    if (cow) Sinks.cowPublish(spark, tRoot, baseVersion, touchedRel, result,
      changeFeed = Some(feed))
    else Sinks.publishVersioned(result, tRoot, Some(baseVersion),
      changeFeed = Some(feed))
    Seq.empty
  }

  /** Merge-on-read MERGE (B138): the same clause-dispatch semantics as
    * the COW path, but no target file is ever rewritten — the join runs
    * against the position-keyed live scan (existing vector subtracted),
    * matched-update/delete and by-source rows' positions become vector
    * entries, and updated copies + inserts land as the commit's only
    * new data files, one atomic commit.
    *
    * Rebinding: the fresh scan's columns carry a reserved prefix so
    * the statement's resolved TARGET attributes re-resolve by prefixed
    * name while the captured source plan's attributes stay bound as-is
    * — no name ambiguity regardless of shared column names. The SQL
    * cardinality rule is enforced on the position pair (a natural
    * unique row id). Subqueries in conditions/assignments are not
    * re-bindable this way and refuse.
    */
  private def runMor(spark: SparkSession, liveDir: String): Seq[Row] = {
    val allExprs: Seq[Expression] = Seq(mergeCondition) ++
      (matchedActions ++ notMatchedActions ++ notMatchedBySourceActions).flatMap {
        case u: UpdateAction => u.condition.toSeq ++ u.assignments.map(_.value)
        case d: DeleteAction => d.condition.toSeq
        case i: InsertAction => i.condition.toSeq ++ i.assignments.map(_.value)
        case other => throw new UnsupportedOperationException(
          s"graft MERGE: unsupported action $other")
      }
    require(!allExprs.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression])),
      "merge-on-read MERGE does not support subqueries; compact the table " +
        "and use copy-on-write, or rewrite the statement")

    val MT = "__graft_mt_"
    val names = target.output.map(_.name)
    val fresh = Sinks.liveWithPositions(spark, tRoot, liveDir)
    val tdf = fresh.select(
        (names.map(n => col(n).as(MT + n)) :+
          col("_dv_key").as(MT + "dvk") :+ col("_dv_pos").as(MT + "dvp"))
          .toIndexedSeq: _*)
      .withColumn(TP, lit(true))
    // pin the source: the join is evaluated for the cardinality check
    // AND the tagged pin below — same reasoning as the COW path
    val sdf = ofRows(spark, source).withColumn(SP, lit(true)).localCheckpoint()
    require(sdf.columns.forall(!_.startsWith(MT)),
      s"source columns may not use the reserved $MT prefix")
    // the durable tagged pin below is a fresh parquet scan (new
    // exprIds), so SOURCE attributes must also re-resolve by NAME —
    // possible only when source names are unique (target names carry
    // the prefix, so cross-side collisions cannot occur)
    require(sdf.columns.map(_.toLowerCase).distinct.length == sdf.columns.length,
      "merge-on-read MERGE requires unique source column names " +
        s"(got ${sdf.columns.mkString(", ")}); alias the duplicates")

    val tOutIds = target.output.map(_.exprId).toSet
    val sOutIds = source.output.map(_.exprId).toSet
    def rebindT(e: Expression): Expression = e.transform {
      case a: Attribute if tOutIds.contains(a.exprId) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(MT + a.name)
      case a: Attribute if sOutIds.contains(a.exprId) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(a.name)
    }
    def rcol(e: Expression): Column = col0(rebindT(e))
    def tcol(a: Attribute): Column = col(MT + a.name)
    def rActionCond(a: MergeAction): Column = a match {
      case u: UpdateAction => u.condition.map(rcol).getOrElse(lit(true))
      case d: DeleteAction => d.condition.map(rcol).getOrElse(lit(true))
      case i: InsertAction => i.condition.map(rcol).getOrElse(lit(true))
      case other => throw new UnsupportedOperationException(
        s"graft MERGE: unsupported action $other")
    }
    def rDispatch(acts: Seq[(MergeAction, String)], default: String): Column =
      acts.foldRight(lit(default): Column) { case ((a, tag), els) =>
        val tg = a match { case _: DeleteAction => s"d$tag"; case _ => tag }
        when(coalesce(rActionCond(a), lit(false)), lit(tg)).otherwise(els)
      }

    // inner join suffices for matched-only statements; inserts need the
    // source-only side, by-source clauses the target-only side
    val joinType =
      if (notMatchedActions.nonEmpty) "full_outer"
      else if (notMatchedBySourceActions.nonEmpty) "left_outer"
      else "inner"
    val joined = tdf.join(sdf, rcol(mergeCondition), joinType)

    val matchedTagged = matchedActions.zipWithIndex.map { case (a, i) => (a, s"m$i") }
    val insertTagged = notMatchedActions.zipWithIndex.map { case (a, i) => (a, s"i$i") }
    val nmbsTagged = notMatchedBySourceActions.zipWithIndex.map { case (a, i) => (a, s"b$i") }

    val tp = coalesce(col(TP), lit(false))
    val sp = coalesce(col(SP), lit(false))
    val op = when(tp && sp, rDispatch(matchedTagged, "keep"))
      .when(sp && !tp, rDispatch(insertTagged, "drop"))
      .otherwise(rDispatch(nmbsTagged, "keep"))
    // one pinned execution: vector delta, new rows, and feed are
    // projections of the SAME rows (the COW path's emitChanges design).
    // Pin.stable, not localCheckpoint: the outer join is O(table), and
    // non-replicated checkpoint blocks would make one executor loss
    // fatal at 100 TB (round-9 verdict, B93's sibling). Safe here —
    // unlike the COW path — because EVERY downstream reference resolves
    // by name (target via the MT prefix, source via the uniqueness
    // require above), so the pin's fresh exprIds don't matter.
    val tagged = Pin.stable(joined.withColumn(OP, op))

    if (matchedActions.nonEmpty) {
      // SQL cardinality rule on the pinned rows, counted only over
      // pairs whose dispatched op ACTS — a multi-matched pair every
      // matched clause sends to 'keep' modifies nothing and is legal
      // (it also contributes nothing downstream: vector delta, new
      // rows, and feed all exclude 'keep', so no dedup is needed here).
      val dup = tagged
        .filter(coalesce(col(TP), lit(false)) && coalesce(col(SP), lit(false)) &&
          col(OP) =!= "keep")
        .groupBy(col(MT + "dvk"), col(MT + "dvp")).count()
        .filter(col("count") > 1).limit(1).count()
      if (dup > 0) throw new IllegalStateException(
        "graft MERGE: a target row matched more than one source row — " +
          "the SQL cardinality rule makes the update/delete ambiguous; " +
          "deduplicate the source on the merge key first")
    }

    // acted-on TARGET rows leave the live set through the vector
    // ("drop" is unmatched-source and starts with 'd' — exclude it and
    // anything without a target side, or null positions would pollute
    // the vector and break the stats-minus-DV count)
    val acted = tp && col(OP) =!= "drop" && col(OP) =!= "keep" &&
      (col(OP).startsWith("d") || col(OP).startsWith("m") || col(OP).startsWith("b"))
    val vectorDelta = tagged.filter(acted)
      .select(col(MT + "dvk").as("file"), col(MT + "dvp").as("row_index"))

    // the commit's new rows: updated copies + inserts
    // generated columns on this route too: the same derivation helpers,
    // with statement expressions NAME-rebound (rebindT) and the current
    // target referenced through the reserved prefix
    val genByCol = graft.ops.Generated.specs(tRoot).map(s => s.col -> s).toMap
    def tPrefixed(n: String): Expression =
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(
        MT + target.output.find(_.name.equalsIgnoreCase(n))
          .map(_.name).getOrElse(n))
    val newCols = target.output.map { attr =>
      val gspec = genByCol.get(attr.name.toLowerCase)
      var c: Column = lit(null).cast(attr.dataType)
      (matchedTagged ++ nmbsTagged).foreach {
        case (u: UpdateAction, tag) =>
          val v = gspec match {
            case Some(s) => genUpdateValue(spark, s, u, attr, rcol, tPrefixed)
            case None => assignedValue(u.assignments, attr)
              .map(e => rcol(e).cast(attr.dataType)).getOrElse(tcol(attr))
          }
          c = when(col(OP) === tag, v).otherwise(c)
        case _ => ()
      }
      insertTagged.foreach {
        case (ins: InsertAction, tag) =>
          val v = genInsertValue(spark, ins, attr, gspec, rcol)
          c = when(col(OP) === tag, v).otherwise(c)
        case _ => ()
      }
      c.as(attr.name)
    }
    val isNew = col(OP).startsWith("i") ||
      (col(OP) =!= "keep" &&
        (col(OP).startsWith("m") || col(OP).startsWith("b")))
    val newRows = GraftCheck.enforce(
      tagged.filter(isNew).select(newCols: _*), tRoot)

    // change feed from the same pinned rows (COW-path parity: inserts
    // post image, deletes pre image, updates both unless no-op)
    val preS = struct(names.map(n => col(MT + n).as(n)): _*)
    val postS = struct(newCols: _*)
    val emptyRow = slice(array(struct(lit("x").as("t"), preS.as("p"))), 1, 0)
    val feedRows =
      when(col(OP).startsWith("i"),
        array(struct(lit("insert").as("t"), postS.as("p"))))
      .when(col(OP) =!= "drop" && col(OP).startsWith("d"),
        array(struct(lit("delete").as("t"), preS.as("p"))))
      .when((col(OP).startsWith("m") || col(OP).startsWith("b")) && !(preS <=> postS),
        array(struct(lit("update_preimage").as("t"), preS.as("p")),
          struct(lit("update_postimage").as("t"), postS.as("p"))))
      .otherwise(emptyRow)
    val feed = tagged.select(explode(feedRows).as("_c"))
      .select((names.map(n => col(s"_c.p.$n").as(n)) :+
        col("_c.t").as("_change_type")).toIndexedSeq: _*)

    Sinks.morPublish(spark, tRoot, baseVersion, newRows, vectorDelta, feed)
    Seq.empty
  }
}
