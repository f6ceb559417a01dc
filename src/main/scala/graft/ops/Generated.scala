package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

/** Generated columns (round-16; the r15 verdict's item 4):
  * `col TYPE GENERATED ALWAYS AS (expr)` — row-local derivation riding
  * the identity-column plumbing ([[Identity]]), minus the reservation
  * counter (the expression needs no coordination, only the row):
  *
  *  - The SPEC lives in `_PROPS` (`graft.generated.<col>` = the SQL
  *    text), stripped from footers like every declaration (`_PROPS` is
  *    the only truth — Spark writes a frame's analyzed field metadata
  *    into parquet footers, and a footer echo would outlive an ALTER)
  *    and re-injected as Spark's own `GENERATION_EXPRESSION` field
  *    metadata on the writable table so DESCRIBE surfaces it.
  *  - INSERT doors derive: NULL is the "compute me" marker (an INSERT
  *    omitting the column analyzes to NULL — the [[Identity]] contract),
  *    and an EXPLICIT non-null value must equal the recompute or the
  *    write fails row-locally (`raise_error` inside the insert funnel —
  *    never a silently wrong stored value). The check and the fill are
  *    one codegen'd projection, no extra pass.
  *  - UPDATE re-derives: an assignment to a SOURCE column substitutes
  *    the assigned expressions into the generation SQL inside the same
  *    one-pass projection (all output columns evaluate over the PRE
  *    row simultaneously — [[graft.catalog.GraftUpdateCommand]]), on
  *    both the copy-on-write and merge-on-read routes and in the
  *    change feed. A DIRECT assignment to the generated column stays
  *    refused (ALWAYS semantics).
  *  - MERGE derives too (round-16, boundary lifted): an UPDATE action
  *    assigning a source re-derives by the same substitution, an
  *    INSERT action derives NULL/omitted cells and [[reconcile]]s an
  *    explicit value against the recompute — on both the copy-on-write
  *    and merge-on-read routes and in the change feed; a DIRECT
  *    assignment in any UPDATE action refuses.
  *  - Declared over a PARTITION column, the grid stores derived values
  *    and [[graft.catalog.GraftScanBuilder]] rewrites source-column
  *    predicates into directory predicates where the expression parses
  *    as an invertible [[Transforms]] shape — the hidden-partitioning
  *    pruning, driven by a visible generated column.
  */
object Generated {

  val Prefix = "graft.generated."

  /** Spark's generation-expression field-metadata key (the analyzer
    * validates CREATE's expressions against it when the catalog
    * advertises SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS).
    */
  private val Key = org.apache.spark.sql.catalyst.util.GeneratedColumn
    .GENERATION_EXPRESSION_METADATA_KEY

  final case class Spec(col: String, sql: String)

  /** Declared generation specs of `root`, keyed by lowercase column. */
  def specs(root: String): Seq[Spec] =
    TableProps.load(root).collect {
      case (k, v) if k.startsWith(Prefix) => Spec(k.stripPrefix(Prefix), v)
    }.toSeq.sortBy(_.col)

  /** Generation declarations in a CREATE's schema. */
  def fromSchema(schema: StructType): Seq[Spec] =
    schema.fields.toSeq.flatMap { f =>
      org.apache.spark.sql.catalyst.util.GeneratedColumn
        .getGenerationExpression(f).map(sql => Spec(f.name.toLowerCase, sql))
    }

  /** Top-level column names the generation expression references —
    * the UPDATE/MERGE refusal set (lowercase).
    */
  def sourceCols(spark: org.apache.spark.sql.SparkSession,
      spec: Spec): Set[String] =
    spark.sessionState.sqlParser.parseExpression(spec.sql).collect {
      case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        ua.nameParts.head.toLowerCase
    }.toSet

  def stripField(f: StructField): StructField =
    if (!f.metadata.contains(Key)) f
    else f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .remove(Key).build(), nullable = true)

  /** Drop the generation metadata (and force the compute-me
    * nullability) before a schema lands in footers.
    */
  def strip(schema: StructType): StructType =
    StructType(schema.fields.map(stripField))

  /** Re-inject the stored specs as field metadata on the writable
    * table's schema — DESCRIBE truth from `_PROPS`, never footers.
    */
  def inject(schema: StructType, root: String): StructType = {
    val bySpec = specs(root).map(s => s.col -> s.sql).toMap
    if (bySpec.isEmpty) schema
    else StructType(schema.fields.map { f =>
      bySpec.get(f.name.toLowerCase).fold(f)(sql =>
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putString(Key, sql).build()))
    })
  }

  /** The door contract as ONE reusable Column: a NULL cell derives
    * (`gen`), an explicit value must equal the recompute or the row
    * fails loudly — shared by the insert funnel and the MERGE INSERT
    * actions so both doors reconcile identically.
    */
  def reconcile(cur: Column, gen: Column, name: String, sql: String): Column =
    when(cur.isNull, gen)
      .when(!(cur <=> gen), raise_error(concat(
        lit(s"generated column $name = ($sql): explicit "),
        lit("value "), cur.cast("string"),
        lit(" does not match the recompute "), gen.cast("string"))))
      .otherwise(cur)

  /** The insert-funnel projection: fill NULL generated cells with the
    * recompute; refuse (row-locally, loudly) an explicit value the
    * recompute disagrees with. One pass, codegen'd.
    */
  def enforce(df: DataFrame, root: String): DataFrame =
    specs(root).foldLeft(df) { (d, spec) =>
      d.schema.fields.find(_.name.equalsIgnoreCase(spec.col)).fold(d) { f =>
        val gen = expr(spec.sql).cast(f.dataType)
        d.withColumn(f.name, reconcile(col(s"`${f.name}`"), gen, f.name, spec.sql))
      }
    }

  /** The generation expression as an invertible [[Transforms]] shape,
    * when it IS one — what lets [[graft.catalog.GraftScanBuilder]]
    * rewrite a source-column predicate into a directory predicate on a
    * generated PARTITION column (the hidden-partitioning pruning with a
    * visible column). Recognized shapes are exactly the ones whose
    * recompute semantics are SESSION-ZONE-FREE, so the reader-side
    * image can never disagree with the writer-side stored value:
    *
    *  - `substring(s, 1, n)` / `substr` / `left(s, n)` over STRING
    *    → `Truncate(n, s)` (prefix truncation, monotone)
    *  - `trunc(d, 'month'|'mon'|'mm')` over DATE → `Month(d)`
    *  - `trunc(d, 'year'|'yyyy'|'yy')` over DATE → `Year(d)`
    *
    * TIMESTAMP-sourced spellings (`CAST(ts AS DATE)`,
    * `date_trunc(...)`) are deliberately NOT recognized: their stored
    * values depend on the WRITER's session zone, so a zone-free reader
    * image would prune wrong. `srcType` resolves a referenced column's
    * type; anything unrecognized simply loses pruning, never rows.
    */
  def asTransform(spark: org.apache.spark.sql.SparkSession, spec: Spec,
      srcType: String => Option[org.apache.spark.sql.types.DataType])
      : Option[Transforms.T] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{DateType, IntegerType, StringType}
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(spec.sql)
      catch { case scala.util.control.NonFatal(_) => return None }
    def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Option[Int] =
      e match {
        case Literal(v: Int, IntegerType) if v > 0 => Some(v)
        case _ => None
      }
    def attrName(e: org.apache.spark.sql.catalyst.expressions.Expression): Option[String] =
      e match {
        case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
          Some(ua.nameParts.head)
        case _ => None
      }
    parsed match {
      case f: UnresolvedFunction if !f.isDistinct && f.filter.isEmpty =>
        val fn = f.nameParts.map(_.toLowerCase)
        (fn, f.arguments) match {
          case (Seq("substring" | "substr"), Seq(a, one, n))
              if intLit(one).contains(1) =>
            for {
              c <- attrName(a) if srcType(c).contains(StringType)
              w <- intLit(n)
            } yield Transforms.Truncate(w, c)
          case (Seq("left"), Seq(a, n)) =>
            for {
              c <- attrName(a) if srcType(c).contains(StringType)
              w <- intLit(n)
            } yield Transforms.Truncate(w, c)
          case (Seq("trunc"), Seq(a, Literal(u: org.apache.spark.unsafe.types.UTF8String, StringType))) =>
            attrName(a).filter(c => srcType(c).contains(DateType)).flatMap { c =>
              u.toString.toLowerCase match {
                case "month" | "mon" | "mm" => Some(Transforms.Month(c))
                case "year" | "yyyy" | "yy" => Some(Transforms.Year(c))
                case _ => None
              }
            }
          case _ => None
        }
      case _ => None
    }
  }

}
