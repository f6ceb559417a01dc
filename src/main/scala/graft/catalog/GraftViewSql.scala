package graft.catalog

import org.apache.spark.sql.{GraftSqlShims, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.NoSuchViewException
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, CreateView, DescribeRelation, DropView, LogicalPlan, RenameTable, SetViewProperties, ShowCreateTable, ShowViews, UnsetViewProperties}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** The SQL door for Graft catalog views (B178): Spark 4.1's parser
  * produces the view-DDL logical plans but its analyzer only routes
  * them to the SESSION catalog — a `CREATE VIEW` over a DSv2 catalog
  * fails before any plugin hook fires. So the engine intercepts at the
  * parser seam (Delta's pre-DSv2 shape): parse with Spark's own parser,
  * then swap the handful of view-DDL nodes whose identifier resolves to
  * a [[GraftCatalog]] for runnable commands that execute through
  * [[GraftViews]]. Every other statement passes through untouched —
  * session-catalog views, temp views, and all non-view SQL behave
  * exactly as before.
  *
  * Interception rules (each pinned by ViewSpec):
  *  - `CREATE [OR REPLACE] VIEW [IF NOT EXISTS] … AS <query>` — only
  *    the PERSISTED form parses to [[CreateView]]; temp views parse to
  *    a different node and are never touched. `WITH SCHEMA EVOLUTION`
  *    maps to the stored `evolve` flag.
  *  - `DROP VIEW [IF EXISTS] name` — intercepted only when the name is
  *    NOT a temp view (temp precedence) and resolves to a Graft
  *    catalog.
  *  - `ALTER VIEW name AS <query>` — replace the body, keep comment +
  *    properties + evolution mode.
  *  - `SHOW VIEWS [IN ns] [LIKE pattern]` — catalog views plus
  *    session-local temp views (Spark's own SHOW VIEWS contract).
  */
class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private def graftIdent(parts: Seq[String]): Option[(String, Identifier)] =
    try GraftSqlShims.resolveIdent(spark, parts) match {
      case (g: GraftCatalog, ident) => Some((g.name(), ident))
      case _ => None
    } catch { case _: Exception => None }

  private def identParts(child: LogicalPlan): Option[Seq[String]] = child match {
    case UnresolvedIdentifier(parts, _) => Some(parts)
    case v: UnresolvedView => Some(v.multipartIdentifier)
    case _ => None
  }

  private def tovParts(child: LogicalPlan): Option[Seq[String]] = child match {
    case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
      Some(t.multipartIdentifier)
    case _ => identParts(child)
  }

  private def viewExists(catName: String, ident: Identifier): Boolean =
    try GraftSqlShims.catalogByName(spark, catName) match {
      case g: GraftCatalog => g.viewExists(ident)
      case _ => false
    } catch { case _: Exception => false }

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(sqlText) match {
      case cv: CreateView =>
        identParts(cv.child).flatMap(graftIdent) match {
          case Some((cat, ident)) =>
            val sql = cv.originalText.getOrElse(GraftViews.err(
              s"CREATE VIEW $cat.$ident: no SQL text captured"))
            val evolve = cv.viewSchemaMode.toString.toUpperCase.contains("EVOLUTION")
            GraftCreateViewCommand(cat, ident, sql, cv.userSpecifiedColumns,
              cv.comment, cv.properties, cv.allowExisting, cv.replace, evolve)
          case None => cv
        }

      case dv: DropView =>
        identParts(dv.child) match {
          case Some(parts) if !GraftSqlShims.isTempView(spark, parts) =>
            graftIdent(parts) match {
              case Some((cat, ident)) => GraftDropViewCommand(cat, ident, dv.ifExists)
              case None => dv
            }
          case _ => dv
        }

      case av: AlterViewAs =>
        identParts(av.child) match {
          case Some(parts) if !GraftSqlShims.isTempView(spark, parts) =>
            graftIdent(parts) match {
              case Some((cat, ident)) =>
                GraftAlterViewAsCommand(cat, ident, av.originalText)
              case None => av
            }
          case _ => av
        }

      // ALTER VIEW … SET/UNSET TBLPROPERTIES and ALTER VIEW … RENAME TO:
      // route to the ViewCatalog surface when the target is a Graft view
      case sp: SetViewProperties =>
        identParts(sp.child) match {
          case Some(parts) if !GraftSqlShims.isTempView(spark, parts) =>
            graftIdent(parts) match {
              case Some((cat, ident)) =>
                GraftAlterViewPropsCommand(cat, ident, sp.properties, Nil)
              case None => sp
            }
          case _ => sp
        }

      case up: UnsetViewProperties =>
        identParts(up.child) match {
          case Some(parts) if !GraftSqlShims.isTempView(spark, parts) =>
            graftIdent(parts) match {
              case Some((cat, ident)) =>
                GraftAlterViewPropsCommand(cat, ident, Map.empty, up.propertyKeys)
              case None => up
            }
          case _ => up
        }

      case rt: RenameTable if rt.isView =>
        tovParts(rt.child) match {
          case Some(parts) if !GraftSqlShims.isTempView(spark, parts) =>
            graftIdent(parts) match {
              case Some((cat, ident)) if viewExists(cat, ident) =>
                GraftRenameViewCommand(cat, ident, rt.newName)
              case _ => rt
            }
          case _ => rt
        }

      // DESCRIBE / SHOW CREATE TABLE on a view: the native paths resolve
      // through loadTable and can only report "not found" — intercept
      // when the identifier names an EXISTING Graft view (tables and
      // temp views fall through untouched)
      case dr: DescribeRelation =>
        tovParts(dr.relation) match {
          case Some(parts) if !GraftSqlShims.isTempView(spark, parts) =>
            graftIdent(parts) match {
              case Some((cat, ident)) if viewExists(cat, ident) =>
                GraftDescribeViewCommand(cat, ident, dr.isExtended, dr.output)
              case _ => dr
            }
          case _ => dr
        }

      case sct: ShowCreateTable =>
        tovParts(sct.child) match {
          case Some(parts) if !GraftSqlShims.isTempView(spark, parts) =>
            graftIdent(parts) match {
              case Some((cat, ident)) if viewExists(cat, ident) =>
                GraftShowCreateViewCommand(cat, ident, sct.output)
              case _ => sct
            }
          case _ => sct
        }

      case sv: ShowViews =>
        val nsParts = sv.namespace match {
          case n if n.getClass.getSimpleName == "UnresolvedNamespace" =>
            // UnresolvedNamespace(multipartIdentifier) — reflective-free
            // extraction via the productIterator (first element)
            n.asInstanceOf[Product].productElement(0)
              .asInstanceOf[Seq[String]]
          case _ => null
        }
        if (nsParts == null) sv
        else {
          // SHOW VIEWS → current catalog + namespace; SHOW VIEWS IN x.y →
          // x as a catalog name wins, else current catalog's namespace x.y
          val (catName, ns): (String, Seq[String]) =
            if (nsParts.isEmpty)
              (GraftSqlShims.currentCatalogName(spark),
                GraftSqlShims.currentNamespace(spark).toSeq)
            else if (GraftSqlShims.isCatalogName(spark, nsParts.head))
              (nsParts.head, nsParts.tail)
            else (GraftSqlShims.currentCatalogName(spark), nsParts)
          try GraftSqlShims.catalogByName(spark, catName) match {
            case _: GraftCatalog =>
              GraftShowViewsCommand(catName, ns, sv.pattern, sv.output)
            case _ => sv
          } catch { case _: Exception => sv }
        }

      case other =>
        // Delta-style direct path query: SELECT ... FROM graft.`/root`
        // substitutes at PARSE time — the analyzer's own direct-query
        // fallback throws before any extended resolution rule runs, so
        // this seam is the only place the form can be served
        other.transform {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
              if GraftViews.directPathQuery(u).isDefined =>
            GraftViews.directPathQuery(u).get
        }
    }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

private object GraftViewSql {
  def catalog(spark: SparkSession, name: String): GraftCatalog =
    GraftSqlShims.catalogByName(spark, name) match {
      case g: GraftCatalog => g
      case other => GraftViews.err(s"catalog $name is not a GraftCatalog: $other")
    }
}

case class GraftCreateViewCommand(catName: String, ident: Identifier, sql: String,
    userCols: Seq[(String, Option[String])], comment: Option[String],
    props: Map[String, String], allowExisting: Boolean, replace: Boolean,
    evolve: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftViews.create(spark, GraftViewSql.catalog(spark, catName), catName, ident,
      sql, userCols, comment, props, allowExisting, replace, evolve)
    Nil
  }
}

case class GraftDropViewCommand(catName: String, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.catalog(spark, catName)
    val root = cat.viewRootFor(ident)
    if (GraftViews.isView(root)) GraftViews.drop(root)
    else if (graft.ops.Sinks.currentVersion(root).isDefined)
      GraftViews.err(s"$catName.$ident is a table, not a view — use DROP TABLE")
    else if (!ifExists)
      throw new NoSuchViewException(ident)
    Nil
  }
}

case class GraftAlterViewAsCommand(catName: String, ident: Identifier,
    newSql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.catalog(spark, catName)
    val root = cat.viewRootFor(ident)
    val old = GraftViews.load(root).getOrElse(
      throw new NoSuchViewException(ident))
    // replace the body, keep comment/properties/evolution mode — the
    // SQL-standard ALTER VIEW AS contract
    GraftViews.create(spark, cat, catName, ident, newSql, Nil, old.comment,
      old.properties, allowExisting = false, replace = true, evolve = old.evolve)
    Nil
  }
}

case class GraftAlterViewPropsCommand(catName: String, ident: Identifier,
    set: Map[String, String], unset: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    val cat = GraftViewSql.catalog(spark, catName)
    if (!cat.viewExists(ident)) throw new NoSuchViewException(ident)
    val changes = set.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) } ++
      unset.map(ViewChange.removeProperty)
    cat.alterView(ident, changes: _*)
    Nil
  }
}

case class GraftRenameViewCommand(catName: String, ident: Identifier,
    newName: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.catalog(spark, catName)
    // the new name resolves WITHIN the same catalog (Spark's RENAME
    // contract); a multipart new name must stay in this catalog
    val target =
      if (newName.length > 1 && newName.head.equalsIgnoreCase(catName))
        Identifier.of(newName.tail.init.toArray, newName.last)
      else Identifier.of(newName.init.toArray, newName.last)
    cat.renameView(ident, target)
    Nil
  }
}

case class GraftDescribeViewCommand(catName: String, ident: Identifier,
    isExtended: Boolean, override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.catalog(spark, catName)
    val d = GraftViews.load(cat.viewRootFor(ident)).getOrElse(
      throw new NoSuchViewException(ident))
    val cols = d.cols.fields.toSeq.zipWithIndex.map { case (f, i) =>
      Row(f.name, f.dataType.simpleString, d.colComments.lift(i).flatten.orNull)
    }
    if (!isExtended) cols
    else cols ++ Seq(
      Row("", "", ""),
      Row("# Detailed View Information", "", ""),
      Row("View Text", d.sql, ""),
      Row("View Catalog and Namespace",
        (d.ctxCatalog +: d.ctxNamespace).mkString("."), ""),
      Row("View Schema Mode", if (d.evolve) "EVOLUTION" else "COMPENSATION", ""),
      Row("Created",
        java.time.Instant.ofEpochMilli(d.createdMs).toString, "")) ++
      d.comment.map(c => Row("Comment", c, "")).toSeq
  }
}

case class GraftShowCreateViewCommand(catName: String, ident: Identifier,
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.catalog(spark, catName)
    val d = GraftViews.load(cat.viewRootFor(ident)).getOrElse(
      throw new NoSuchViewException(ident))
    val colList = d.cols.fields.toSeq.zipWithIndex.map { case (f, i) =>
      val cmt = d.colComments.lift(i).flatten
        .map(c => s" COMMENT '${c.replace("'", "''")}'").getOrElse("")
      s"  ${f.name}$cmt"
    }.mkString(",\n")
    val name = (Seq(catName) ++ ident.namespace().toSeq :+ ident.name()).mkString(".")
    val cmt = d.comment.map(c => s"\nCOMMENT '${c.replace("'", "''")}'").getOrElse("")
    Seq(Row(s"CREATE VIEW $name (\n$colList)$cmt AS\n${d.sql}"))
  }
}

case class GraftShowViewsCommand(catName: String, ns: Seq[String],
    pattern: Option[String], override val output: Seq[Attribute])
    extends LeafRunnableCommand {

  /** Spark's SHOW-style pattern: '*' any chars, '|' alternation,
    * case-insensitive.
    */
  private def matches(name: String): Boolean = pattern.forall { p =>
    p.split("\\|").exists { alt =>
      val rx = ("(?i)" + alt.trim.split("\\*", -1)
        .map(java.util.regex.Pattern.quote).mkString(".*")).r
      rx.pattern.matcher(name).matches()
    }
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.catalog(spark, catName)
    val persisted = cat.listViews(ns: _*).toSeq
      .filter(id => matches(id.name()))
      .sortBy(_.name())
      .map(id => Row(ns.mkString("."), id.name(), false))
    // session-local temp views ride along, Spark's own SHOW VIEWS shape
    val temps = GraftSqlShims.listLocalTempViews(spark, pattern.getOrElse("*"))
      .sorted.map(n => Row("", n, true))
    persisted ++ temps
  }
}
