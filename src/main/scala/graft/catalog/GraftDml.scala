package graft.catalog

import graft.ops.Sinks
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
  * Scale shape: UPDATE and DELETE are ONE projection/filter scan over
  * the current version — no join, no shuffle. MERGE is one join of
  * target and source on the merge condition (equi-conditions plan as
  * hash/sort-merge joins; Catalyst picks broadcast when the source is
  * small) plus, when matched actions exist, one aggregation over the
  * matched pairs for the SQL-standard multiple-match check — the same
  * cost class as Delta's touched-file pass.
  */
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
        require(!m.withSchemaEvolution,
          "graft MERGE: WITH SCHEMA EVOLUTION is not supported — " +
            "ALTER TABLE ... ADD COLUMNS first (additive evolution)")
        GraftMergeCommand(r, m.sourceTable, m.mergeCondition, m.matchedActions,
          m.notMatchedActions, m.notMatchedBySourceActions,
          w.tableRootPath, w.tableBaseVersion): LogicalPlan
      }.getOrElse(m)
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

/** `DELETE FROM t WHERE cond`: keep the rows where the condition is
  * FALSE or NULL (three-valued SQL semantics), publish as the next
  * version. One filtered scan, shuffle-free.
  */
case class GraftDeleteCommand(target: DataSourceV2Relation, condition: Expression,
    tRoot: String, baseVersion: Long) extends LeafRunnableCommand {
  import GraftDml._
  override def run(spark: SparkSession): Seq[Row] = {
    val t = ofRows(spark, target)
    val kept = t.filter(!coalesce(col0(condition), lit(false)))
    Sinks.publishVersioned(kept, tRoot, Some(baseVersion))
    Seq.empty
  }
}

/** `UPDATE t SET ... WHERE cond`: per-column CASE WHEN cond THEN value
  * ELSE current END — one projection scan, shuffle-free. NULL/FALSE
  * condition keeps the current value (rows are never dropped).
  */
case class GraftUpdateCommand(target: DataSourceV2Relation,
    assignments: Seq[Assignment], condition: Option[Expression],
    tRoot: String, baseVersion: Long) extends LeafRunnableCommand {
  import GraftDml._
  override def run(spark: SparkSession): Seq[Row] = {
    val t = ofRows(spark, target)
    val cond = condition.map(col0).getOrElse(lit(true))
    val outCols = target.output.map { attr =>
      assignedValue(assignments, attr) match {
        case Some(v) =>
          when(cond, col0(v).cast(attr.dataType)).otherwise(col0(attr)).as(attr.name)
        case None => col0(attr).as(attr.name)
      }
    }
    // CHECK constraints gate the rewritten contents (pre-existing rows
    // were validated when the constraint was added, so only the rows
    // this statement changes can trip the gate); row-local, same scan
    Sinks.publishVersioned(
      GraftCheck.enforce(t.select(outCols: _*), tRoot), tRoot, Some(baseVersion))
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

  private def actionCond(a: MergeAction): Column = a match {
    case u: UpdateAction => u.condition.map(col0).getOrElse(lit(true))
    case d: DeleteAction => d.condition.map(col0).getOrElse(lit(true))
    case i: InsertAction => i.condition.map(col0).getOrElse(lit(true))
    case other => throw new UnsupportedOperationException(
      s"graft MERGE: unsupported action $other")
  }

  /** First-match dispatch: the tag of the first action whose condition
    * holds (NULL = does not hold), else `default`. DELETE tags as
    * "drop" so the row filter below removes it.
    */
  private def dispatch(acts: Seq[(MergeAction, String)], default: String): Column =
    acts.foldRight(lit(default): Column) { case ((a, tag), els) =>
      val t = a match { case _: DeleteAction => "drop"; case _ => tag }
      when(coalesce(actionCond(a), lit(false)), lit(t)).otherwise(els)
    }

  override def run(spark: SparkSession): Seq[Row] = {
    val t = ofRows(spark, target)
    val s = ofRows(spark, source)

    val needRid = matchedActions.nonEmpty
    val tdf0 = t.withColumn(TP, lit(true))
    val tdf = if (needRid) tdf0.withColumn(RID, monotonically_increasing_id()) else tdf0
    // with matched clauses the join is evaluated twice (cardinality
    // check + publish) — pin the SOURCE so both see the same rows;
    // otherwise a non-deterministic source could pass the check and
    // still publish a duplicated target row (the corruption the rule
    // exists to prevent; Delta materializes the source for the same
    // reason). The target needs no pin: it is an immutable version dir,
    // and RID (partition-indexed over that fixed scan) re-derives
    // identically. Source is O(delta) — the cheap side to pin.
    val sdf0 = s.withColumn(SP, lit(true))
    val sdf = if (needRid) sdf0.localCheckpoint() else sdf0

    // full outer only when INSERT clauses consume source-only rows;
    // otherwise target-left keeps every target row and drops the
    // unmatched source side before it ever shuffles
    val joinType = if (notMatchedActions.nonEmpty) "full_outer" else "left_outer"
    val joined = tdf.join(sdf, col0(mergeCondition), joinType)

    if (needRid) {
      val dup = joined.filter(col(TP) && col(SP))
        .groupBy(col(RID)).count().filter(col("count") > 1).limit(1).count()
      if (dup > 0) throw new IllegalStateException(
        "graft MERGE: a target row matched more than one source row — " +
          "the SQL cardinality rule makes the update/delete ambiguous; " +
          "deduplicate the source on the merge key first")
    }

    val matchedTagged = matchedActions.zipWithIndex.map { case (a, i) => (a, s"m$i") }
    val insertTagged = notMatchedActions.zipWithIndex.map { case (a, i) => (a, s"i$i") }
    val nmbsTagged = notMatchedBySourceActions.zipWithIndex.map { case (a, i) => (a, s"b$i") }

    val tp = coalesce(col(TP), lit(false))
    val sp = coalesce(col(SP), lit(false))
    val op = when(tp && sp, dispatch(matchedTagged, "keep"))
      .when(sp && !tp, dispatch(insertTagged, "drop"))
      .otherwise(dispatch(nmbsTagged, "keep"))

    val kept = joined.withColumn(OP, op).filter(col(OP) =!= "drop")

    val outCols = target.output.map { attr =>
      var c: Column = when(col(OP) === "keep", col0(attr))
      (matchedTagged ++ nmbsTagged).foreach {
        case (u: UpdateAction, tag) =>
          val v = assignedValue(u.assignments, attr)
            .map(e => col0(e).cast(attr.dataType)).getOrElse(col0(attr))
          c = c.when(col(OP) === tag, v)
        case _ => ()
      }
      insertTagged.foreach {
        case (ins: InsertAction, tag) =>
          // columns the INSERT clause leaves unassigned are NULL, the
          // same null-backfill contract as additive schema evolution
          val v = assignedValue(ins.assignments, attr)
            .map(e => col0(e).cast(attr.dataType))
            .getOrElse(lit(null).cast(attr.dataType))
          c = c.when(col(OP) === tag, v)
        case _ => ()
      }
      c.as(attr.name)
    }

    Sinks.publishVersioned(
      GraftCheck.enforce(kept.select(outCols: _*), tRoot), tRoot, Some(baseVersion))
    Seq.empty
  }
}
