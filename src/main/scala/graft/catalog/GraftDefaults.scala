package graft.catalog

import org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
import org.apache.spark.sql.types.{DataType, Metadata, MetadataBuilder, StructField, StructType}

import graft.ops.TableProps

/** DEFAULT column values (B190): `CREATE TABLE t (…, b INT DEFAULT 42)`
  * and `ALTER TABLE t ALTER COLUMN b SET/DROP DEFAULT`, honored by every
  * INSERT door — a column list that omits the column, and the explicit
  * `DEFAULT` keyword in VALUES — because Spark's own analyzer fills the
  * literals once the table's schema carries the `CURRENT_DEFAULT` field
  * metadata and the catalog declares `SUPPORT_COLUMN_DEFAULT_VALUE`.
  *
  * Storage: the default's ORIGINAL SQL text in `_PROPS` under
  * `graft.default.<column>` (parquet footers cannot carry field
  * metadata, so the schema the delegate derives is re-annotated at
  * load). Validation is Spark's own
  * [[ResolveDefaultColumns.analyze]] — constant-foldable, no column
  * references, castable to the column type — run at CREATE/ALTER so a
  * bad default fails loudly with no table (or no change) left behind.
  *
  * Deliberate boundary: `ADD COLUMN … DEFAULT` is REFUSED. The engine's
  * metadata-only ADD synthesizes NULL for pre-existing rows; an
  * existence default would make old rows read a value their files never
  * carried, silently diverging from every version's committed content.
  * The remedy is two steps (ADD COLUMN, then SET DEFAULT) whose
  * semantics are exact: old rows NULL, future inserts defaulted. For
  * the same reason only `CURRENT_DEFAULT` metadata is ever served —
  * never `EXISTS_DEFAULT`, which file sources use to backfill missing
  * columns on READ.
  */
private[catalog] object GraftDefaults {

  val Prefix = "graft.default."

  /** Stored defaults of `root`, keyed by lowercase column name. */
  def load(root: String): Map[String, String] =
    TableProps.load(root).collect {
      case (k, v) if k.startsWith(Prefix) => k.stripPrefix(Prefix) -> v
    }

  /** Defaults declared in a CREATE's schema metadata (Spark encodes the
    * `DEFAULT` clause as `CURRENT_DEFAULT` field metadata).
    */
  def fromSchema(schema: StructType): Map[String, String] =
    schema.fields.flatMap { f =>
      if (f.metadata.contains(ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY))
        Some(f.name.toLowerCase -> f.metadata.getString(
          ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY))
      else None
    }.toMap

  /** Spark's own default-expression validation: parseable, analyzable
    * with NO column references, constant-foldable, coercible to the
    * column type. Throws Spark's dedicated errors on violation.
    */
  def validate(colName: String, dt: DataType, sql: String,
      statementType: String): Unit = {
    val f = StructField(colName, dt, nullable = true,
      new MetadataBuilder()
        .putString(ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY, sql)
        .build())
    ResolveDefaultColumns.analyze(f, statementType,
      ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY)
    ()
  }

  /** Remove any footer-echoed default metadata from one field — the
    * read-door hygiene every schema view applies before (optionally)
    * re-injecting the `_PROPS` truth.
    */
  def stripFieldDefaults(f: StructField): StructField =
    if (!f.metadata.contains(ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY) &&
        !f.metadata.contains(ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY)) f
    else f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .remove(ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY)
      .remove(ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY)
      .build())

  /** Re-annotate a footer-derived schema with the stored defaults —
    * what makes `INSERT INTO t (a) …` and `VALUES (…, DEFAULT)` resolve
    * through Spark's analyzer. The `_PROPS` store is the ONLY truth:
    * any default metadata the parquet footers echo back (an INSERT
    * writes its analyzed schema — metadata included — into the file it
    * lands) is STRIPPED first, or a dropped default would resurrect
    * from the last file written while it was live. CURRENT only; see
    * the scaladoc boundary.
    */
  def inject(schema: StructType, root: String): StructType = {
    val defaults = load(root)
    StructType(schema.map { f =>
      val cleaned = new MetadataBuilder().withMetadata(f.metadata)
        .remove(ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY)
        .remove(ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY)
      defaults.get(f.name.toLowerCase) match {
        case Some(sql) => f.copy(metadata = cleaned.putString(
          ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY, sql).build())
        case None => f.copy(metadata = cleaned.build())
      }
    })
  }

  /** Migrate stored default keys through a RENAME/DROP COLUMN evolution:
    * renamed columns re-key (the expression is a constant — no rewrite
    * needed), dropped columns shed their default.
    */
  def migrate(props: Map[String, String], renameMap: Map[String, String],
      dropSet: Set[String]): Map[String, String] = {
    val renamesLower = renameMap.map { case (o, n) => o.toLowerCase -> n }
    val dropsLower = dropSet.map(_.toLowerCase)
    props.filterNot(_._1.startsWith(Prefix)) ++ props.collect {
      case (k, v) if k.startsWith(Prefix) &&
          !dropsLower.contains(k.stripPrefix(Prefix)) =>
        val colL = k.stripPrefix(Prefix)
        (Prefix + renamesLower.getOrElse(colL, colL).toLowerCase) -> v
    }
  }
}
