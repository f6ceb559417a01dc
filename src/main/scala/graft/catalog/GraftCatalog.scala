package graft.catalog

import java.nio.file.{Files, Paths}
import java.util

import graft.ops.Sinks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `TableCatalog` over the [[graft.ops.Sinks]] versioned
  * table layout — the piece that turns the commit protocol (immutable
  * `v<N>/` dirs + atomically-flipped `_CURRENT` pointer) into a
  * first-class SQL table format:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.root", "/warehouse")
  *
  *   SELECT * FROM graft.events_agg                      -- current version
  *   SELECT * FROM graft.events_agg VERSION AS OF 2      -- time travel
  *   SELECT * FROM graft.events_agg TIMESTAMP AS OF '...'-- commit-time travel
  *   SHOW TABLES IN graft
  * }}}
  *
  * `graft.ns.t` maps to `<root>/ns/t`; a table is any directory with a
  * `_CURRENT` pointer. Reads delegate to Spark's own v2 parquet scan
  * (vectorized reader, filter pushdown, column pruning — identical to
  * `spark.read.parquet` on the resolved version dir), so the catalog
  * adds version resolution, not a bespoke read path. Version resolution
  * happens at `loadTable` (analysis) time: a query holds the version it
  * resolved even if a writer publishes or compaction vacuums mid-query —
  * the same snapshot-isolation story ScaleSpec hammers via the API.
  *
  * The catalog is READ-ONLY by design: writes go through the library's
  * commit protocol ([[Sinks.publishVersioned]], [[graft.ops.Merge.applyTo]]),
  * which is what enforces the OCC/atomic-rename guarantees. `createTable`
  * etc. say so instead of silently writing an unversioned dir.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"GraftCatalog requires spark.sql.catalog.$name.root"))
  }

  override def name(): String = catalogName

  /** `<root>/<namespace...>/<name>`, with path-traversal components
    * rejected (identifiers come from SQL text).
    */
  private def tableRoot(ident: Identifier): String = {
    val parts = ident.namespace().toSeq :+ ident.name()
    require(parts.forall(p => p.nonEmpty && !p.contains("/") && !p.contains("\\")
      && p != "." && p != ".."), s"illegal table identifier: $ident")
    (root +: parts).mkString("/")
  }

  /** The delegated parquet scan WITHOUT the write half: FileTable
    * supports appends, but a version directory is immutable once its
    * `_CURRENT` rename lands — letting INSERT INTO splice files into it
    * would corrupt the snapshot every pinned reader relies on. Not
    * implementing SupportsWrite means Spark's capability check rejects
    * every write form at analysis, before anything touches the dir.
    */
  private final class ReadOnlySnapshot(delegate: ParquetTable)
    extends Table with SupportsRead {
    override def name(): String = delegate.name
    override def schema(): StructType = delegate.schema
    override def partitioning(): Array[Transform] = delegate.partitioning()
    override def properties(): util.Map[String, String] = delegate.properties()
    override def capabilities(): util.Set[TableCapability] = {
      val caps = new util.HashSet[TableCapability](delegate.capabilities())
      caps.remove(TableCapability.BATCH_WRITE)
      caps.remove(TableCapability.STREAMING_WRITE)
      caps.remove(TableCapability.TRUNCATE)
      caps.remove(TableCapability.OVERWRITE_BY_FILTER)
      caps.remove(TableCapability.OVERWRITE_DYNAMIC)
      caps
    }
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      delegate.newScanBuilder(options)
  }

  private def table(ident: Identifier, path: String): Table =
    new ReadOnlySnapshot(ParquetTable(
      name = s"$catalogName.${ident.toString}",
      sparkSession = SparkSession.active,
      options = CaseInsensitiveStringMap.empty(),
      paths = Seq(path),
      userSpecifiedSchema = None,
      fallbackFileFormat = classOf[ParquetFileFormat]))

  override def loadTable(ident: Identifier): Table = {
    val tr = tableRoot(ident)
    val v = Sinks.currentVersion(tr)
      .getOrElse(throw new NoSuchTableException(ident))
    table(ident, Sinks.versionPath(tr, v))
  }

  /** `VERSION AS OF <v>`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val tr = tableRoot(ident)
    if (Sinks.currentVersion(tr).isEmpty) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$catalogName: version must be a number, got '$version'")
    }
    if (!Sinks.listVersions(tr).contains(v))
      throw new IllegalArgumentException(
        s"$catalogName.${ident.toString}: version $v not present " +
          s"(have ${Sinks.listVersions(tr).mkString(", ")}) — vacuumed or never published")
    table(ident, Sinks.versionPath(tr, v))
  }

  /** `TIMESTAMP AS OF <ts>` (micros): the newest version committed at or
    * before the timestamp, by version-directory mtime — the layout's
    * commit time (the dir becomes visible at the atomic rename).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val tr = tableRoot(ident)
    if (Sinks.currentVersion(tr).isEmpty) throw new NoSuchTableException(ident)
    val live = Sinks.listVersions(tr)
    val eligible = live.filter(v =>
      Files.getLastModifiedTime(Paths.get(Sinks.versionPath(tr, v))).toMillis * 1000L
        <= timestamp)
    if (eligible.isEmpty)
      throw new IllegalArgumentException(
        s"$catalogName.${ident.toString}: no version committed at or before " +
          s"timestamp $timestamp us (oldest retained: v${live.min})")
    table(ident, Sinks.versionPath(tr, eligible.max))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = Paths.get((root +: namespace.toSeq).mkString("/"))
    if (!Files.isDirectory(dir)) Array.empty
    else {
      val names = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        names.iterator().asScala
          .filter(p => Sinks.currentVersion(p.toString).isDefined)
          .map(p => Identifier.of(namespace, p.getFileName.toString))
          .toArray
      } finally names.close()
    }
  }

  // ---- namespaces: directories under root that are not themselves
  // versioned tables (a dir with _CURRENT is a table, not a namespace) ----

  private def subdirs(parts: Seq[String]): Array[String] = {
    val dir = Paths.get((root +: parts).mkString("/"))
    if (!Files.isDirectory(dir)) Array.empty
    else {
      val names = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        names.iterator().asScala
          .filter(p => Files.isDirectory(p)
            && Sinks.currentVersion(p.toString).isEmpty
            && !p.getFileName.toString.startsWith(".")
            && !p.getFileName.toString.startsWith("_")
            && !p.getFileName.toString.matches("v\\d+"))
          .map(_.getFileName.toString)
          .toArray
      } finally names.close()
    }
  }

  override def listNamespaces(): Array[Array[String]] =
    subdirs(Nil).map(Array(_))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.nonEmpty && !namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        name() +: namespace.toSeq)
    subdirs(namespace.toSeq).map(n => namespace :+ n)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val p = Paths.get((root +: namespace.toSeq).mkString("/"))
      Files.isDirectory(p) && Sinks.currentVersion(p.toString).isEmpty
    }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        name() +: namespace.toSeq)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = readOnly()
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = readOnly()
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    readOnly()

  private def readOnly(): Nothing = throw new UnsupportedOperationException(
    s"catalog $catalogName is read-only: write through the versioned commit " +
      "protocol (graft.ops.Sinks.publishVersioned / graft.ops.Merge.applyTo)")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    readOnly()
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly()
  override def dropTable(ident: Identifier): Boolean = readOnly()
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly()
}
