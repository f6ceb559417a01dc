package graft.plans

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Metadata-only `count(*)` / `count(col)` over Graft catalog tables —
  * the Delta "answer counts from the transaction log" optimization,
  * expressed against this layout's `_stats` sidecar.
  *
  * A global, unfiltered `SELECT count(*) FROM cat.tbl` normally plans a
  * full table scan whose only output is row counts Spark already wrote
  * down at commit time: every footer-stats sidecar row carries the
  * file's row count ([[graft.ops.Stats]]), and appends/COW DML extend
  * the sidecar inside the same atomic commit. At 100 TB the difference
  * is a driver-side metadata read (KBs — one small parquet beside the
  * data) versus scanning every file just to count it.
  *
  * Fires ONLY when provably exact:
  *  - global aggregate, no grouping, no `Filter` below (the relation may
  *    sit under attribute-only `Project`s — column pruning's leftovers);
  *  - every aggregate expression is a non-distinct, unfiltered
  *    `count(*)`/`count(lit)` (non-null literal) or `count(col)`;
  *  - the relation is a Graft snapshot ([[graft.catalog.GraftSnapshotDir]]
  *    — current reads AND `VERSION/TIMESTAMP AS OF`, both immutable
  *    version dirs, so there is no read-vs-metadata race);
  *  - the sidecar covers EVERY live data file (stale rows keyed by
  *    COW-replaced files are ignored — same contract as pruning;
  *    an uncovered file → the rule declines and the scan runs);
  *  - for `count(col)`: the file's entry for that column has usable
  *    footer stats (`has_stats` — null counts are only trusted when the
  *    writer recorded them), else decline.
  *
  * Declining is always safe: the plan is left for the ordinary scan.
  */
object MetaCountRewrite extends Rule[LogicalPlan] {

  private sealed trait Kind
  private case object Star extends Kind
  private final case class OfColumn(name: String) extends Kind
  private final case class BoundOf(name: String, dt: DataType, isMin: Boolean)
    extends Kind

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate if agg.groupingExpressions.isEmpty =>
      rewrite(agg).getOrElse(agg)
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] =
    for {
      dir <- snapshotOf(agg.child)
      kinds <- agg.aggregateExpressions.foldRight(
          Option(List.empty[Kind]))((ne, acc) =>
        acc.flatMap(t => kindOf(ne).map(_ :: t)))
      if kinds.nonEmpty
      values <- metaValues(dir, kinds)
    } yield LocalRelation(agg.aggregateExpressions.map(_.toAttribute),
      Seq(InternalRow.fromSeq(values)))

  /** The immutable version dir under `p`, when `p` is a Graft snapshot
    * relation possibly wrapped in attribute-only projections. Anything
    * else — a Filter, a computed projection, a join — disqualifies.
    */
  private def snapshotOf(p: LogicalPlan): Option[String] = p match {
    case r: DataSourceV2Relation => r.table match {
      case t: graft.catalog.GraftSnapshotDir => Some(t.snapshotVersionDir)
      case _ => None
    }
    case pr: Project if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      snapshotOf(pr.child)
    case _ => None
  }

  /** min/max are metadata-answerable only for types whose footer bounds
    * are EXACT: integral and IEEE-float physical values (dates ride as
    * int32 days), and — round-13 — timestamps whose sidecar rows carry
    * value-exact micros (`t_exact`: ms/µs units; ns floor/ceil is
    * widened-only and declines per file). `SELECT max(ts) FROM events`
    * is THE freshness probe on a 100 TB event table — a KB metadata
    * read instead of a full scan. Strings (round-14) answer only from
    * `s_exact` rows — bounds the annotator computed from the DATA at
    * commit time; footer binaries may be truncated (fine for pruning,
    * wrong as an answer) and decline per-row. NaN-poisoned float files
    * already carry `has_stats = false` and decline per-file.
    */
  private def boundable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case FloatType | DoubleType => true
    case org.apache.spark.sql.types.DateType => true
    case TimestampType | TimestampNTZType => true
    // round-14: strings answer when every value-bearing row carries
    // `s_exact` — bounds computed from the data at commit time, not the
    // truncatable footer binaries (which remain pruning-grade only)
    case org.apache.spark.sql.types.StringType => true
    case _ => false
  }

  private def kindOf(ne: NamedExpression): Option[Kind] = ne match {
    case Alias(ae: AggregateExpression, _)
        if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Count(Seq(l: Literal)) if l.value != null => Some(Star)
        case Count(Seq(a: AttributeReference)) => Some(OfColumn(a.name))
        case Min(a: AttributeReference) if boundable(a.dataType) =>
          Some(BoundOf(a.name, a.dataType, isMin = true))
        case Max(a: AttributeReference) if boundable(a.dataType) =>
          Some(BoundOf(a.name, a.dataType, isMin = false))
        case _ => None
      }
    case _ => None
  }

  /** Answer each requested aggregate from the sidecar, or None when any
    * live file is uncovered (exactness cannot be proven). `Some(null)`
    * inside the result is a real SQL NULL (min/max over an all-null
    * column), distinct from declining.
    */
  private def metaValues(dir: String, kinds: Seq[Kind]): Option[Seq[Any]] = {
    // under a deletion vector the sidecar describes PRE-delete files.
    // count(*) stays answerable — vector entries are unique positions
    // in live files (COW never reaches a DV version, carries preserve
    // keys), so live rows = sidecar rows − vector cardinality, the
    // Delta stats-minus-DV count. Per-column counts and bounds decline
    // (which rows the vector hides is unknowable from metadata); the
    // subtraction rule then serves those from the subtracted scan.
    val dv = graft.ops.Dv.exists(dir)
    if (dv && kinds.exists(_ != Star)) return None
    val sidecar = Paths.get(dir, graft.ops.Stats.Sidecar)
    if (!Files.isDirectory(sidecar)) return None
    val dvCount =
      if (!dv) 0L
      else graft.ops.Dv.cardinality(SparkSession.active, dir)
    val live = graft.io.Fs.walkParquet(Paths.get(dir))
      .map(_.toString.stripPrefix(dir).stripPrefix("/")).toSet
    if (live.isEmpty) return None
    // the sidecar is metadata-scale (one row per file×column); the
    // nested read contains no aggregate, so the rule cannot re-enter.
    // mergeSchema: a dir can mix pre- and post-round-13 parts; the
    // timestamp columns are selected only when present (old sidecars
    // then decline timestamp bounds, never mis-answer them)
    val raw = SparkSession.active.read.option("mergeSchema", "true")
      .parquet(sidecar.toString)
    val hasTs = raw.columns.contains("lo_t") && raw.columns.contains("t_exact")
    val hasS = raw.columns.contains("s_exact")
    // pad absent era columns with typed nulls so row indices stay fixed
    // across sidecar generations (hasTs/hasS still gate the DECLINE
    // decision — an all-null padded column must never read as "all-null
    // data", only as "this sidecar cannot answer")
    import org.apache.spark.sql.functions.{col => c, lit}
    def opt(name: String, dt: DataType) =
      if (raw.columns.contains(name)) c(name) else lit(null).cast(dt).as(name)
    val rows = raw
      .select(
        c("file"), c("col"), c("rows"), c("nulls"), c("has_stats"),
        c("lo_l"), c("hi_l"), c("lo_d"), c("hi_d"),
        opt("lo_t", LongType), opt("hi_t", LongType),
        opt("t_adj", org.apache.spark.sql.types.BooleanType),
        opt("t_exact", org.apache.spark.sql.types.BooleanType),
        opt("lo_s", org.apache.spark.sql.types.StringType),
        opt("hi_s", org.apache.spark.sql.types.StringType),
        opt("s_exact", org.apache.spark.sql.types.BooleanType))
      .collect()
    val byFile = rows.groupBy(_.getString(0))
    if (!live.forall(byFile.contains)) return None
    // every live file's trusted entry for column `c`, or None (decline);
    // the sidecar speaks PHYSICAL names, the aggregate LOGICAL ones
    def covered(c: String): Option[Seq[org.apache.spark.sql.Row]] = {
      val phys = graft.ops.ColMap.toPhysicalName(dir, c)
      val per = live.toSeq.map(f =>
        byFile(f).find(r => r.getString(1).equalsIgnoreCase(phys) && r.getBoolean(4)))
      if (per.exists(_.isEmpty)) None else Some(per.flatten)
    }
    val total = live.toSeq.map(f => byFile(f).head.getLong(2)).sum - dvCount
    val values: Seq[Option[Any]] = kinds.map {
      case Star => Some(total)
      case OfColumn(c) => covered(c).map(_.map(r => r.getLong(2) - r.getLong(3)).sum)
      case BoundOf(c, dt, isMin) => covered(c).flatMap { rs =>
        // files whose bounds are absent hold only nulls for this column
        // (bounds ignore nulls); all files all-null => the answer IS null
        def longs(i: Int) = rs.filter(!_.isNullAt(i)).map(_.getLong(i))
        def dbls(i: Int) = rs.filter(!_.isNullAt(i)).map(_.getDouble(i))
        dt match {
          case FloatType | DoubleType =>
            val vs = if (isMin) dbls(7) else dbls(8)
            if (vs.isEmpty) Some(null)
            else {
              val v = if (isMin) vs.min else vs.max
              Some(if (dt == FloatType) v.toFloat else v)
            }
          case org.apache.spark.sql.types.StringType =>
            if (!hasS) None // pre-round-14 sidecar: decline, never guess
            else {
              // every VALUE-BEARING row must be data-exact (`s_exact`):
              // footer binary bounds may be truncated — pruning-grade,
              // not answering-grade. Boundless covered rows are all-null
              // files (bounds ignore nulls); all files all-null => NULL.
              val bearing = rs.filter(!_.isNullAt(13))
              if (bearing.exists(r => r.isNullAt(15) || !r.getBoolean(15))) None
              else if (bearing.isEmpty) Some(null)
              else {
                val vs = bearing.map(r =>
                  if (isMin) r.getString(13) else r.getString(14))
                val v =
                  if (isMin) vs.min(graft.ops.Stats.utf8Ordering)
                  else vs.max(graft.ops.Stats.utf8Ordering)
                // LocalRelation rows carry INTERNAL values
                Some(org.apache.spark.unsafe.types.UTF8String.fromString(v))
              }
            }
          case TimestampType | TimestampNTZType =>
            if (!hasTs) None // pre-upgrade sidecar: decline, never guess
            else {
              // every value-bearing row must be VALUE-exact micros of the
              // right flavor (adjusted for TIMESTAMP, wall-clock for NTZ);
              // a ns-floored or flavor-mismatched file declines the whole
              // answer — pruning-grade bounds are not answering-grade
              val wantAdj = dt == TimestampType
              val bearing = rs.filter(!_.isNullAt(9))
              if (bearing.exists(r => r.isNullAt(12) || !r.getBoolean(12) ||
                  r.isNullAt(11) || r.getBoolean(11) != wantAdj)) None
              else if (bearing.isEmpty) Some(null)
              else {
                val vs = bearing.map(r => if (isMin) r.getLong(9) else r.getLong(10))
                Some(if (isMin) vs.min else vs.max) // internal micros Long
              }
            }
          case _ =>
            val vs = if (isMin) longs(5) else longs(6)
            if (vs.isEmpty) Some(null)
            else {
              val v = if (isMin) vs.min else vs.max
              Some(dt match {
                case LongType => v
                case ByteType => v.toByte
                case ShortType => v.toShort
                case _ => v.toInt // IntegerType, DateType (int32 days)
              })
            }
        }
      }
    }
    if (values.exists(_.isEmpty)) None else Some(values.map(_.get))
  }
}
