package graft.catalog

import java.nio.file.{Files, Paths}
import java.util.{Optional, OptionalLong}
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsPushDownVariantExtractions, SupportsReportPartitioning, SupportsReportStatistics, VariantExtraction}
import org.apache.spark.sql.connector.read.colstats.{ColumnStatistics, Histogram}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.internal.connector.{SupportsMetadata, SupportsPushDownCatalystFilters}
import org.apache.spark.sql.types._

import graft.ops.{ColMap, Dv, EqDel, Sinks, Stats}

/** The engine's scan tier over the v2 parquet delegate (B185/B186): one
  * thin wrapper around [[ParquetScanBuilder]]/[[ParquetScan]] that adds
  * the two signals Spark cannot derive from bare files, while forwarding
  * every pushdown surface untouched (filters, column pruning, aggregate
  * pushdown, variant extraction — all land in the DELEGATE, so
  * `PushedFilters`/`ReadSchema` in explain output are unchanged):
  *
  *  1. '''Exact plan-time statistics''' ([[CboStats]]): row counts, an
  *     honest in-memory size, and per-column null counts / bounds /
  *     distinct counts served from the `_stats` sidecar — the numbers
  *     that decide broadcast-vs-shuffle joins and (under
  *     `spark.sql.cbo.enabled`) join reordering. The delegate's own
  *     estimate is compressed-file-bytes × a column-count ratio; at
  *     100 TB that mis-sizes a table by the parquet compression factor
  *     (3–10×), which is exactly the band where a 9 MB "estimate" of a
  *     90 MB build side OOMs a broadcast. Selected-file listing happens
  *     AFTER partition pruning (the delegate's own pushed partition
  *     filters), so a pruned scan reports the pruned row count.
  *
  *  2. '''Key-grouped partition reporting''' (storage-partitioned joins,
  *     the Iceberg SPJ design): an identity-partitioned table reports
  *     [[KeyGroupedPartitioning]] over its partition columns and plans
  *     one [[HasPartitionKey]]-tagged file group per partition value, so
  *     two tables co-partitioned on the join key join with ZERO shuffle
  *     on either side (`spark.sql.sources.v2.bucketing.enabled=true`,
  *     with `pushPartValues` padding mismatched partition sets). At
  *     100 TB a shuffle-free join of two co-partitioned fact tables is
  *     the difference between a network-bound night and a local-read
  *     hour; on Spark's cost ladder it beats even a broadcast (nothing
  *     is replicated).
  *
  * Versions where the bare scan itself would be wrong (deletion vectors,
  * pending equality deletes, column mapping, layout legs, hidden
  * partitioning) never reach this wrapper — [[graft.plans.DvReadRule]]
  * swaps their relations for the reconciling funnel before pushdown, and
  * rule-less sessions are refused at load — but both signals
  * independently guard and decline on them anyway (defense in depth: a
  * wrong statistic mis-plans, a wrong partition key mis-JOINS).
  *
  * Escape hatches: `spark.graft.scan.stats.enabled` /
  * `spark.graft.scan.spj.enabled` (both default true).
  */
private[graft] object GraftScans {

  /** Wrap the delegate's scan builder; anything that is not the v2
    * parquet builder (future delegates) passes through unwrapped.
    */
  def wrap(inner: ScanBuilder, tRoot: String, versionDir: String): ScanBuilder =
    inner match {
      case p: ParquetScanBuilder => new GraftScanBuilder(p, tRoot, versionDir)
      case other => other
    }

  // resolved against the SESSION THAT BUILT THE SCAN (the delegate's),
  // not SparkSession.active — in a multi-session application another
  // session's flags must not flip this session's planning
  private def flag(spark: SparkSession, name: String): Boolean =
    spark.conf.get(name, "true").trim.equalsIgnoreCase("true")
  def statsEnabled(spark: SparkSession): Boolean =
    flag(spark, "spark.graft.scan.stats.enabled")
  def spjEnabled(spark: SparkSession): Boolean =
    flag(spark, "spark.graft.scan.spj.enabled")
}

/** Forwards every pushdown interface the parquet builder implements;
  * `build()` wraps the resulting scan. A scan with a PUSHED AGGREGATE
  * returns unwrapped: its output rows are group rows, so file-level row
  * statistics no longer describe it (and grouping keys are not
  * partition keys).
  */
private[graft] final class GraftScanBuilder(inner: ParquetScanBuilder,
    tRoot: String, versionDir: String)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters
  with SupportsPushDownAggregates
  with SupportsPushDownVariantExtractions {

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)

  /** Hidden transform grids of this version's layout (round-15: ALL
    * transforms — bucket, day/month/year/hour, truncate). A predicate
    * on the SOURCE column implies a directory predicate the file index
    * can prune on: the v2-path twin of [[graft.plans
    * .HiddenPartitionRule]], sharing its `rewrite` (one soundness
    * argument, two doors). Every image is a folded literal, so the
    * delegate translates it into its partition filters.
    */
  private lazy val grids: Seq[graft.ops.Transforms.T] =
    inner.fileIndex.partitionSchema.fieldNames.toSeq
      .flatMap(graft.ops.Transforms.parse)

  private def impliedGrid(e: Expression): Seq[Expression] = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    grids.flatMap { t =>
      e.references.find(_.name.equalsIgnoreCase(t.src)).flatMap { src =>
        val h = AttributeReference(t.colName,
          t.dataType(src.dataType), nullable = true)()
        graft.plans.HiddenPartitionRule.rewrite(e, src, h, t)
      }
    }
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    val implied =
      if (grids.isEmpty) Nil else filters.flatMap(impliedGrid)
    val leftover = inner.pushFilters(filters ++ implied)
    // implied directory predicates reference the hidden `_tp_*`
    // attribute — they are consumed as partition filters, but never let
    // one leak back into the plan (its attribute is not in the output)
    leftover.filterNot(_.references.exists(a =>
      graft.ops.Transforms.parse(a.name).isDefined))
  }

  override def pushedFilters: Array[V2Predicate] = inner.pushedFilters
  // reader-side MOR mode (round-15): a pushed aggregate's group rows
  // would COUNT deleted rows — refuse the pushdown, the wrapper's
  // per-file subtraction needs the raw rows
  override def pushAggregation(aggregation: Aggregation): Boolean =
    !MorSpj.readerSide(tRoot, versionDir) && inner.pushAggregation(aggregation)
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    !MorSpj.readerSide(tRoot, versionDir) &&
      inner.supportCompletePushDown(aggregation)
  /** Variant-extraction pushdown, minus a vanilla-Spark sharp edge
    * (round-15): the v2 parquet reader loses values when it
    * reconstructs a WHOLE variant through a pushed `$`-path extraction
    * (VariantType expectedDataType — e.g. an aggregate over
    * `variant_get` makes Spark push the identity path; the summed
    * result comes back NULL on the bare v2 scan too). Refuse every
    * extraction of a column that wants an identity reconstruction —
    * Spark then reads the original variant column and evaluates the
    * paths itself, exact. Typed scalar paths push through untouched.
    */
  override def pushVariantExtractions(
      extractions: Array[VariantExtraction]): Array[Boolean] = {
    val badCols = extractions
      .filter(_.expectedDataType().isInstanceOf[org.apache.spark.sql.types.VariantType])
      .map(_.columnName().toSeq).toSet
    if (badCols.isEmpty) inner.pushVariantExtractions(extractions)
    else {
      val allow = extractions.map(e => !badCols(e.columnName().toSeq))
      val innerRes = inner.pushVariantExtractions(
        extractions.zip(allow).collect { case (e, true) => e })
      var j = 0
      extractions.indices.map { i =>
        if (!allow(i)) false
        else { val r = innerRes(j); j += 1; r }
      }.toArray
    }
  }

  override def build(): Scan = {
    val scan = inner.build()
    if (scan.pushedAggregate.isDefined) scan
    else if (MorSpj.readerSide(tRoot, versionDir)) {
      // SPJ under deletion vectors / equality deletes: keep the v2
      // scan, inject the working columns, subtract inside the readers
      val (augmented, injected) = MorSpj.augment(scan, versionDir)
      GraftScan(augmented, tRoot, versionDir, injected, morReaderSide = true)
    } else GraftScan(scan, tRoot, versionDir)
  }
}

/** The wrapped scan. Case class so exchange/scan reuse compares by the
  * delegate's own (fileIndex, schemas, filters) identity.
  */
private[graft] final case class GraftScan(delegate: ParquetScan,
    tRoot: String, versionDir: String,
    injected: Seq[String] = Nil, morReaderSide: Boolean = false)
  extends Scan with Batch
  with SupportsReportStatistics
  with SupportsReportPartitioning
  with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
  with SupportsMetadata {

  /** Runtime (dynamic-partition-pruning) filters narrow the delegate —
    * [[filter]] swaps in a copy with the extra partition filters, and
    * every file-listing path below reads THROUGH this var so the
    * narrowed selection is what plans, groups, and sizes.
    */
  @transient private var current: ParquetScan = delegate

  // reader-side MOR mode (round-15): the delegate reads the injected
  // working columns (row index, unprojected eq-delete keys); the plan
  // above sees the requested columns only
  override def readSchema(): StructType =
    if (injected.isEmpty) delegate.readSchema()
    else {
      val hide = injected.map(_.toLowerCase).toSet
      StructType(delegate.readSchema().filterNot(f => hide(f.name.toLowerCase)))
    }
  override def description(): String = delegate.description()
  override def getMetaData(): Map[String, String] =
    if (!morReaderSide) delegate.getMetaData()
    else delegate.getMetaData() + ("MorReaderSide" -> "true")
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    if (morReaderSide) Scan.ColumnarSupportMode.UNSUPPORTED
    else delegate.columnarSupportMode()
  override def supportedCustomMetrics() = delegate.supportedCustomMetrics()
  override def reportDriverMetrics() = delegate.reportDriverMetrics()
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String) = {
    requireNoMorStream()
    delegate.toMicroBatchStream(checkpointLocation)
  }
  override def toContinuousStream(checkpointLocation: String) = {
    requireNoMorStream()
    delegate.toContinuousStream(checkpointLocation)
  }
  private def requireNoMorStream(): Unit =
    if (morReaderSide) throw new UnsupportedOperationException(
      "streaming a snapshot carrying deletion vectors / equality deletes " +
        "is unsupported: stream the table feed (read_stream) or compact first")

  override def createReaderFactory(): PartitionReaderFactory =
    if (morReaderSide) MorSpj.factory(current, versionDir, injected)
    else current.createReaderFactory()

  override def estimateStatistics(): Statistics =
    (if (GraftScans.statsEnabled(delegate.sparkSession))
       CboStats.statsFor(current, tRoot, versionDir)
     else None).getOrElse(current.estimateStatistics())

  /** Dynamic partition pruning for the v2 catalog read (B188): a join
    * against a filtered dimension feeds the surviving join-key values
    * back as an `In` over the fact's partition column, and only the
    * matching partition directories are listed and read. Identity
    * columns only (a hidden `_tp_*` grid is never a join key — those
    * tables ride the funnel). Translation is best-effort: an
    * unsupported filter shape just loses pruning, never rows.
    */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // PROJECTED partition columns only: Spark resolves these against the
    // scan's output (a non-projected name crashes PartitionPruning's
    // resolveRef), and a DPP join key is always projected anyway
    delegate.readPartitionSchema.fields
      .filter(f => graft.ops.Transforms.parse(f.name).isEmpty)
      .map(f => Expressions.column(f.name))

  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo => CEqualTo, In => CIn, Literal}
    import org.apache.spark.sql.{sources => v1}
    val ps = delegate.fileIndex.partitionSchema
    def attr(name: String): Option[AttributeReference] =
      ps.fields.find(_.name.equalsIgnoreCase(name))
        .map(f => AttributeReference(f.name, f.dataType, nullable = true)())
    val translated = filters.toSeq.flatMap { f =>
      scala.util.Try(f match {
        case v1.In(c, vs) => attr(c).map(a =>
          CIn(a, vs.toSeq.map(v => Literal.create(v, a.dataType))))
        case v1.EqualTo(c, v) => attr(c).map(a =>
          CEqualTo(a, Literal.create(v, a.dataType)))
        case _ => None
      }).toOption.flatten
    }
    if (translated.nonEmpty)
      current = delegate.copy(
        partitionFilters = delegate.partitionFilters ++ translated)
  }

  /** SPJ eligibility: a version whose layout columns are each either an
    * IDENTITY partition column that is projected (its value must ride
    * the output to be a join key) or a hidden TRANSFORM grid whose
    * SOURCE column is projected (B189 bucket; B193 round-15 extends to
    * day/month/year/hour/truncate — each resolved through the catalog's
    * FunctionCatalog scalar functions, so two day-partitioned event
    * tables join shuffle-free). Deletion vectors / equality deletes are
    * fine in MOR reader-side mode (B192); column mapping and layout
    * legs still disqualify.
    */
  private lazy val spjKeys: Option[Seq[Either[(StructField, Int), (graft.ops.Transforms.T, DataType)]]] = {
    val layout = delegate.fileIndex.partitionSchema
    val read = delegate.readPartitionSchema
    // a bucket SOURCE column counts as projected only when the QUERY
    // projects it — an injected MOR working column is hidden from the
    // output, so a partitioning keyed on it could never resolve
    val injectedLower = injected.map(_.toLowerCase).toSet
    val readData = StructType(delegate.readDataSchema
      .filterNot(f => injectedLower(f.name.toLowerCase)))
    // round-15: reader-side MOR subtraction is per-file, so deletion
    // vectors / equality deletes no longer disqualify SPJ — rows are
    // filtered in place and never move between key groups
    val clean = layout.nonEmpty &&
      (morReaderSide ||
        (!Dv.exists(versionDir) && !EqDel.exists(versionDir))) &&
      !ColMap.exists(versionDir) && !Sinks.hasLayoutLegs(versionDir)
    if (!clean) None
    else {
      val keys = layout.fields.toSeq.map { f =>
        graft.ops.Transforms.parse(f.name) match {
          case None =>
            val i = read.fieldNames.indexWhere(_.equalsIgnoreCase(f.name))
            if (i >= 0) Some(Left((f, i))) else None
          case Some(t) =>
            readData.fields.find(_.name.equalsIgnoreCase(t.src))
              .map(src => Right((t, src.dataType)))
        }
      }
      if (keys.forall(_.isDefined)) Some(keys.flatten) else None
    }
  }

  /** The transform value a file's path carries for grid `t` — the
    * `_tp_<src>__<tag>=<v>` directory value, parsed into the
    * transform's internal result domain ([[graft.ops.Transforms
    * .pathValue]]). The derived column is hidden (never projected), so
    * the path is where its value lives.
    */
  private def gridValueOfPath(path: String, t: graft.ops.Transforms.T,
      srcType: DataType): Option[Any] = {
    val tag = "/" + t.colName + "="
    val i = path.indexOf(tag)
    if (i < 0) None
    else graft.ops.Transforms.pathValue(
      path.substring(i + tag.length).takeWhile(_ != '/'), t, srcType)
  }

  /** One file group per partition-key tuple, each tagged with its key.
    * Identity values ride the projected partition values; bucket values
    * parse from the directory path. The delegate's own splits are
    * preserved; each tuple's files re-bin-pack under the same
    * maxSplitBytes policy the flat plan used, so task sizing survives
    * the regrouping. Memoized per delegate instance (outputPartitioning
    * AND planInputPartitions both need it — the grouping must not run
    * the file-listing pipeline twice per query); a runtime filter swaps
    * `current`, which misses the memo and regroups the narrowed set.
    */
  @transient private var keyedMemo: (ParquetScan, Option[(Array[InputPartition], Int)]) = null
  private def keyedPartitions: Option[(Array[InputPartition], Int)] = synchronized {
    val snap = current
    if (keyedMemo != null && (keyedMemo._1 eq snap)) keyedMemo._2
    else {
      val computed = keyedPartitionsOf(snap)
      keyedMemo = (snap, computed)
      computed
    }
  }

  private def keyedPartitionsOf(snap: ParquetScan): Option[(Array[InputPartition], Int)] =
    spjKeys.flatMap { keys =>
      val flat = snap.planInputPartitions().toSeq
        .flatMap(_.asInstanceOf[FilePartition].files)
      val spark = delegate.sparkSession
      val openCost = spark.sessionState.conf.filesOpenCostInBytes
      val maxSplit = FilePartition.maxSplitBytes(spark,
        flat.map(_.length + openCost).sum)
      val maybe = flat.map { pf =>
        val vals = keys.map {
          case Left((f, i)) => Some(pf.partitionValues.get(i, f.dataType))
          case Right((t, st)) => gridValueOfPath(pf.filePath.toString, t, st)
        }
        if (vals.forall(_.isDefined)) Some(vals.flatten.toVector -> pf) else None
      }
      // any file whose bucket dir cannot be parsed (shouldn't exist on
      // a clean version) disables SPJ wholesale — never mis-group
      val grouped: Seq[(Vector[Any], Seq[PartitionedFile])] =
        if (maybe.exists(_.isEmpty)) Nil
        else maybe.flatten.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
      if (grouped.isEmpty) None
      else {
        var idx = -1
        val parts = grouped.sortBy(_._1.toString).flatMap { case (key, files) =>
          val keyRow: InternalRow = new GenericInternalRow(key.toArray[Any])
          FilePartition.getFilePartitions(spark, files, maxSplit).map { fp =>
            idx += 1
            new KeyedFilePartition(idx, fp.files, keyRow)
          }
        }.toArray[InputPartition]
        Some((parts, grouped.size))
      }
    }

  /** Both gates: the engine's own escape hatch AND Spark's v2-bucketing
    * conf — with SPJ off the plan (bin-packing included) is
    * byte-identical to the bare delegate's.
    */
  private def spjOn: Boolean = GraftScans.spjEnabled(delegate.sparkSession) &&
    delegate.sparkSession.sessionState.conf.v2BucketingEnabled

  override def planInputPartitions(): Array[InputPartition] =
    if (spjOn) keyedPartitions.map(_._1).getOrElse(current.planInputPartitions())
    else current.planInputPartitions()

  override def outputPartitioning(): Partitioning =
    (if (spjOn) keyedPartitions else None) match {
      case Some((_, nGroups)) =>
        import graft.ops.Transforms.{Bucket, Day, Hour, Month, Truncate, Year}
        val keys = spjKeys.get.map[org.apache.spark.sql.connector.expressions.Expression] {
          case Left((f, _)) => Expressions.identity(f.name)
          case Right((b: Bucket, _)) => Expressions.bucket(b.n, b.src)
          case Right((d: Day, _)) => Expressions.days(d.src)
          case Right((m: Month, _)) => Expressions.months(m.src)
          case Right((y: Year, _)) => Expressions.years(y.src)
          case Right((h: Hour, _)) => Expressions.hours(h.src)
          // width rides the NAME: Spark's SPJ accepts only unary
          // transforms (bucket's literal is special-cased), so a
          // two-arg truncate could never drive a shuffle-free join
          case Right((t: Truncate, _)) => Expressions.apply(
            s"truncate_${t.n}", Expressions.column(t.src))
        }.toArray
        new KeyGroupedPartitioning(keys, nGroups)
      case None => new UnknownPartitioning(0)
    }
}

/** A [[FilePartition]] that knows its partition value — what lets
  * Spark's key-grouped distribution line the two sides of a join up
  * without an Exchange. The delegate's [[PartitionReaderFactory]] reads
  * it as a plain file partition.
  */
private[graft] final class KeyedFilePartition(index0: Int,
    files0: Array[PartitionedFile], key: InternalRow)
  extends FilePartition(index0, files0) with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** Plan-time exact statistics from the `_stats` sidecar (B185).
  *
  * Serving rules mirror the metadata tier's ([[graft.plans
  * .MetaCountRewrite]]) honesty contract, relaxed where an ESTIMATE —
  * not an answer — is produced: widened bounds (ns-floored timestamps)
  * are acceptable CBO ranges, but a live file without a sidecar row
  * declines row counts wholesale (the delegate's size heuristic serves
  * instead), and sketch-less value-bearing files decline distinct
  * counts. Declines return None — this layer NEVER throws into query
  * planning.
  */
private[graft] object CboStats {

  private final case class ColRow(rows: Long, nulls: Long, hasStats: Boolean,
      loL: Option[Long], hiL: Option[Long],
      loD: Option[Double], hiD: Option[Double],
      loT: Option[Long], hiT: Option[Long],
      decScale: Option[Int], hll: Option[Array[Byte]])
  private final case class FileStats(rows: Long, cols: Map[String, ColRow])

  /** Session-scoped memo per immutable version dir, stamped with the
    * sidecar's part count + max mtime so a deliberately rewritten
    * sidecar (retrofit, era repair) misses instead of serving stale
    * numbers — the [[graft.plans.MetaCountRewrite]] discipline.
    */
  private val memo = new ConcurrentHashMap[String, Map[String, FileStats]]()

  private def load(spark: SparkSession, dir: String): Map[String, FileStats] = {
    val sidecar = Paths.get(dir, Stats.Sidecar)
    val parts = graft.io.Fs.listDir(sidecar)
      .filter(_.getFileName.toString.endsWith(".parquet"))
    val stamp = parts.size + ":" +
      (if (parts.isEmpty) "0"
       else parts.map(p => Files.getLastModifiedTime(p).toMillis).max.toString)
    val key = s"${org.apache.spark.sql.graft.ExprBridge.sessionUUID(spark)}|$dir|$stamp"
    if (memo.size > 256) memo.clear()
    memo.computeIfAbsent(key, _ => {
      val raw = spark.read.option("mergeSchema", "true").parquet(sidecar.toString)
      import org.apache.spark.sql.functions.{col => c, lit}
      def opt(name: String, dt: DataType) =
        if (raw.columns.contains(name)) c(name) else lit(null).cast(dt).as(name)
      val rows = raw.select(c("file"), c("col"), c("rows"), c("nulls"),
        c("has_stats"), c("lo_l"), c("hi_l"), c("lo_d"), c("hi_d"),
        opt("lo_t", LongType), opt("hi_t", LongType),
        opt("dec_scale", IntegerType), opt("hll", BinaryType)).collect()
      def optAt[T](r: org.apache.spark.sql.Row, i: Int): Option[T] =
        if (r.isNullAt(i)) None else Some(r.get(i).asInstanceOf[T])
      rows.groupBy(_.getString(0)).map { case (file, rs) =>
        file -> FileStats(rs.head.getLong(2), rs.map { r =>
          r.getString(1).toLowerCase -> ColRow(r.getLong(2), r.getLong(3),
            r.getBoolean(4), optAt[Long](r, 5), optAt[Long](r, 6),
            optAt[Double](r, 7), optAt[Double](r, 8),
            optAt[Long](r, 9), optAt[Long](r, 10),
            optAt[Int](r, 11), optAt[Array[Byte]](r, 12))
        }.toMap)
      }
    })
  }

  def statsFor(scan: ParquetScan, tRoot: String,
      dir: String): Option[Statistics] = try {
    // hidden-partitioned versions (bucket AND range grids, round-15)
    // ride the v2 path: their sidecar keys carry the `_tp_*=v/` dir
    // prefix like any partitioned layout, so the stats serve unchanged
    if (Dv.exists(dir) || EqDel.exists(dir) || ColMap.exists(dir) ||
        Sinks.hasLayoutLegs(dir)) return None
    if (!Files.isDirectory(Paths.get(dir, Stats.Sidecar))) return None
    val byFile = load(scan.sparkSession, dir)
    // the delegate's own pushed partition filters select the files a
    // pruned scan actually reads — the reported rows follow the pruning
    val normDir = Paths.get(dir).toAbsolutePath.normalize.toString
    val selected = scan.fileIndex.listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files.map(f =>
        f.getPath.toUri.getPath.stripPrefix(normDir).stripPrefix("/")))
    val covered = selected.map(f => byFile.get(f).map(f -> _))
    if (covered.exists(_.isEmpty)) return None // uncovered live file
    val files = covered.flatten
    val totalRows = files.map(_._2.rows).sum
    val rowWidth = 8L + scan.readSchema().map(_.dataType.defaultSize.toLong).sum
    val totalBytes = math.max(totalRows * rowWidth, 1L)
    val colStats = new java.util.HashMap[NamedReference, ColumnStatistics]()
    val partCols = scan.readPartitionSchema.fieldNames.map(_.toLowerCase).toSet
    scan.readSchema().fields.foreach { f =>
      if (!partCols.contains(f.name.toLowerCase)) {
        val rs = files.map(_._2.cols.get(f.name.toLowerCase))
        if (rs.forall(_.isDefined)) {
          val cols = rs.flatten
          columnStat(f, cols).foreach(s =>
            colStats.put(Expressions.column(f.name), s))
        }
      }
    }
    Some(new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(totalBytes)
      override def numRows(): OptionalLong = OptionalLong.of(totalRows)
      override def columnStats(): java.util.Map[NamedReference, ColumnStatistics] =
        colStats
    })
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-column stats in the column's CATALYST-INTERNAL value domain —
    * `FilterEstimation` compares these against literals with typed
    * arithmetic, so an Int column must carry Int bounds, a timestamp its
    * epoch micros. Domains without a safe mapping (strings, decimals,
    * exotic types) serve null/distinct counts only.
    */
  private def columnStat(f: StructField,
      cols: Seq[ColRow]): Option[ColumnStatistics] = {
    val nullTotal = cols.map(_.nulls).sum
    val bearing = cols.filter(c => c.rows > c.nulls)
    def box[T](lo: Seq[T], hi: Seq[T], toInternal: T => Any)(
        implicit ord: Ordering[T]): (Optional[Object], Optional[Object]) =
      if (lo.size != bearing.size || hi.size != bearing.size)
        (Optional.empty(), Optional.empty())
      else (Optional.of(toInternal(lo.min).asInstanceOf[Object]),
        Optional.of(toInternal(hi.max).asInstanceOf[Object]))
    val usable = bearing.forall(_.hasStats)
    val (minV, maxV): (Optional[Object], Optional[Object]) =
      if (bearing.isEmpty || !usable) (Optional.empty(), Optional.empty())
      else f.dataType match {
        // dec_scale marks int-backed DECIMAL bounds riding lo_l UNSCALED
        // — not this column's domain unless the type converts exactly
        case ByteType if cols.forall(_.decScale.isEmpty) =>
          box[Long](bearing.flatMap(_.loL), bearing.flatMap(_.hiL), v => v.toByte)
        case ShortType if cols.forall(_.decScale.isEmpty) =>
          box[Long](bearing.flatMap(_.loL), bearing.flatMap(_.hiL), v => v.toShort)
        case IntegerType if cols.forall(_.decScale.isEmpty) =>
          box[Long](bearing.flatMap(_.loL), bearing.flatMap(_.hiL), v => v.toInt)
        case LongType if cols.forall(_.decScale.isEmpty) =>
          box[Long](bearing.flatMap(_.loL), bearing.flatMap(_.hiL), identity[Long])
        case DateType if cols.forall(_.decScale.isEmpty) =>
          box[Long](bearing.flatMap(_.loL), bearing.flatMap(_.hiL), v => v.toInt)
        case FloatType =>
          box[Double](bearing.flatMap(_.loD), bearing.flatMap(_.hiD), v => v.toFloat)
        case DoubleType =>
          box[Double](bearing.flatMap(_.loD), bearing.flatMap(_.hiD), identity[Double])
        case TimestampType | TimestampNTZType =>
          box[Long](bearing.flatMap(_.loT), bearing.flatMap(_.hiT), identity[Long])
        case _ => (Optional.empty(), Optional.empty())
      }
    val distinct: OptionalLong =
      if (bearing.isEmpty) OptionalLong.of(0L)
      else if (bearing.forall(_.hll.isDefined)) {
        val u = new org.apache.datasketches.hll.Union(12)
        bearing.foreach(c => u.update(org.apache.datasketches.hll.HllSketch
          .heapify(org.apache.datasketches.memory.Memory.wrap(c.hll.get))))
        OptionalLong.of(Math.round(u.getEstimate))
      } else OptionalLong.empty()
    Some(new ColumnStatistics {
      override def distinctCount(): OptionalLong = distinct
      override def min(): Optional[Object] = minV
      override def max(): Optional[Object] = maxV
      override def nullCount(): OptionalLong = OptionalLong.of(nullTotal)
      override def avgLen(): OptionalLong = OptionalLong.empty()
      override def maxLen(): OptionalLong = OptionalLong.empty()
      override def histogram(): Optional[Histogram] = Optional.empty()
    })
  }
}
