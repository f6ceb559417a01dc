package graft.catalog

import java.util

import graft.ops.Sinks
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The path-based read door (B184): `spark.read.format("graft")` over a
  * versioned table ROOT — no catalog registration needed, which is how
  * ad-hoc tooling, notebooks pointed at someone else's warehouse, and
  * cross-workspace jobs read a table they don't own:
  *
  * {{{
  *   spark.read.format("graft").load("/warehouse/events")          // live
  *   spark.read.format("graft").option("versionAsOf", 2).load(p)   // pin
  *   spark.read.format("graft").option("tag", "baseline").load(p)  // tag
  *   spark.read.format("graft")
  *     .option("timestampAsOf", "2026-08-01 00:00:00").load(p)     // instant
  * }}}
  *
  * The provider resolves the version AT LOAD TIME (snapshot isolation —
  * the returned table is pinned to one immutable version dir, exactly
  * like the catalog's `loadTable`), serves the same schema-pinned
  * parquet delegate the catalog serves ([[GraftTables.delegate]]), and
  * implements [[GraftSnapshotDir]] — so the optimizer tier composes
  * unchanged: deletion-vector/equality-delete subtraction, column
  * mapping, layout legs, hidden partitioning, stats skipping, and
  * metadata-only counts all fire on format-read tables too. Sessions
  * WITHOUT the extensions are refused for any table whose bare scan
  * would be wrong ([[GraftTables.requireReadRule]]) rather than served
  * resurrected rows. Read-only: writes go through the catalog or the
  * library's commit funnels (`save()` fails for lack of write
  * capability, never corrupts a version dir).
  */
class GraftDataSource extends org.apache.spark.sql.connector.catalog.TableProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  private def resolve(options: CaseInsensitiveStringMap): (String, String) = {
    val root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "format(\"graft\") requires .load(<table root>)"))
    val vOpt = Option(options.get("versionAsOf")).map { v =>
      v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"versionAsOf must be a version number, got '$v'"))
    }.orElse(Option(options.get("tag")).map { t =>
      Sinks.listTags(root).getOrElse(t, throw new IllegalArgumentException(
        s"no tag '$t' on $root (tags: ${Sinks.listTags(root).keys.mkString(", ")})"))
    }).orElse(Option(options.get("timestampAsOf")).map { ts =>
      // same contract as the catalog's TIMESTAMP AS OF: the newest
      // version committed at or before the instant. Accepted spellings
      // match what SQL casts accept: date-only, 'yyyy-MM-dd HH:mm:ss',
      // ISO-8601 local, and zone/offset-suffixed ISO-8601; zone-less
      // forms resolve through the SESSION zone — exactly how Spark
      // derives the micros it hands the catalog's loadTable(ident, ts),
      // so the two doors pin the same version for the same string
      val zone = java.time.ZoneId.of(org.apache.spark.sql.SparkSession.active
        .sessionState.conf.sessionLocalTimeZone)
      val raw = ts.trim.replace(" ", "T")
      val cutoff = scala.util.Try(
          java.time.OffsetDateTime.parse(raw).toInstant.toEpochMilli)
        .orElse(scala.util.Try(
          java.time.ZonedDateTime.parse(raw).toInstant.toEpochMilli))
        .orElse(scala.util.Try(java.time.LocalDateTime.parse(raw)
          .atZone(zone).toInstant.toEpochMilli))
        .orElse(scala.util.Try(java.time.LocalDate.parse(raw)
          .atStartOfDay(zone).toInstant.toEpochMilli))
        .getOrElse(throw new IllegalArgumentException(
          s"timestampAsOf must be a date or timestamp ('yyyy-MM-dd', " +
            s"'yyyy-MM-dd HH:mm:ss', ISO-8601 with optional zone), got '$ts'"))
      val eligible = Sinks.listVersions(root).filter(v =>
        Sinks.commitInstantMs(Sinks.versionPath(root, v)) <= cutoff)
      if (eligible.isEmpty) throw new IllegalArgumentException(
        s"no version of $root committed at or before $ts " +
          s"(oldest retained: v${Sinks.listVersions(root).minOption.getOrElse(-1L)})")
      eligible.max
    })
    val v = vOpt.getOrElse(Sinks.currentVersion(root).getOrElse(
      throw new IllegalArgumentException(s"no published version under $root")))
    val dir = Sinks.versionPath(root, v)
    require(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)),
      s"version v$v does not exist under $root (expired? " +
        s"available: ${Sinks.listVersions(root).mkString(", ")})")
    (root, dir)
  }

  private def snapshot(options: CaseInsensitiveStringMap): Table = {
    val (root, dir) = resolve(options)
    GraftTables.requireReadRule(dir, root, s"graft path table $root")
    val delegate = GraftTables.delegate(s"graft.`$root`", root, dir)
    // round-16: a reader-side COLUMN-MAPPED version scans through a
    // PHYSICAL-name delegate on this door too (the catalog door's
    // scanDelegate twin) — the builder translates pruning/pushdown
    // logical→physical and the scan re-aliases back, so footer filter
    // pushdown keeps working on renamed columns. The user-facing
    // schema() below stays the LOGICAL delegate's.
    lazy val scanDelegate =
      if (graft.ops.ColMap.load(dir).nonEmpty && MorSpj.readerSide(root, dir))
        GraftTables.delegate(s"graft.`$root`", root, dir, physicalNames = true)
      else delegate
    new Table with SupportsRead with GraftSnapshotDir {
      override def snapshotVersionDir: String = dir
      override def snapshotTableRoot: String = root
      override def name(): String = delegate.name
      // mirror the catalog door's SnapshotTable.schema(): the file-level
      // delegate re-discovers hidden-transform `_tp_*` directory columns
      // (B161/B189) and appends them — the logical schema must hide them
      // on THIS door too, or `SELECT *` via format("graft") exposes
      // internal machinery the catalog read of the same table hides
      override def schema(): StructType =
        GraftDefaults.injectExistence(StructType(delegate.schema
          .filterNot(f => graft.ops.Transforms.parse(f.name).isDefined)
          .map(f => f.copy(metadata = org.apache.spark.sql.types.Metadata.empty))),
          dir)
      override def partitioning(): Array[Transform] = delegate.partitioning()
      override def properties(): util.Map[String, String] = delegate.properties()
      override def capabilities(): util.Set[TableCapability] = {
        val caps = new util.HashSet[TableCapability]()
        caps.add(TableCapability.BATCH_READ)
        caps
      }
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        GraftScans.wrap(scanDelegate.newScanBuilder(options), root, dir)
    }
  }

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    snapshot(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    snapshot(new CaseInsensitiveStringMap(properties))
}
