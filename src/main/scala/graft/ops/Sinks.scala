package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.io.Fs
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Batch sink patterns for pipeline reruns (the A4 emit-to-storage analog
  * with production semantics).
  */
object Sinks {

  /** Idempotent partition backfill: dynamic partition overwrite replaces
    * ONLY the partitions present in `df`, leaving the rest of the table
    * untouched — the rerun-safe write a daily 100 TB pipeline needs
    * (static overwrite would truncate the whole table).
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  // ---------- versioned table layout (atomic publish) ----------
  //
  // Layout: <root>/v<N>/ holds immutable parquet versions; <root>/_CURRENT
  // is a tiny pointer file naming the live version. Writers fully
  // materialize their data in a private staging dir, then COMMIT under a
  // cross-process lock: the version number is allocated inside the lock,
  // the staging dir is renamed to v<N> (one atomic rename), and the
  // pointer flips (another atomic rename). Readers that resolve through
  // the pointer see the old complete version or the new complete version,
  // never a missing/partial table. This is the small-manifest conditional
  // commit that table formats (Delta/Iceberg logs) implement on object
  // stores with a conditional PUT; at 100 TB the layout delegates cleanly
  // to such a format without changing callers.

  /** The bound [[CommitProtocol]] — the seam between the versioned
    * layout's logic (staging, sidecars, OCC, feeds) and the platform's
    * atomic-visibility primitives. Defaults to [[LocalFsCommit]]; an
    * object-store deployment binds its conditional-PUT implementation
    * here and every writer (catalog DML, streaming sink, ANN index,
    * merges) commits through it unchanged.
    */
  @volatile var commitProtocol: CommitProtocol = LocalFsCommit

  /** The live version number, if the table has ever been published. */
  def currentVersion(root: String): Option[Long] =
    commitProtocol.readPointer(root)

  /** Path of version `v` under `root`. */
  def versionPath(root: String, v: Long): String = s"$root/v$v"

  /** Path of the live version directory (readers resolve through this). */
  def resolve(root: String): String = {
    val v = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    versionPath(root, v)
  }

  def readCurrent(spark: SparkSession, root: String): DataFrame =
    readDir(spark, root, resolve(root))

  /** True iff any `*.parquet` data file exists under `p` (recursively,
    * partition dirs included; the layout's own `_`/`.`-prefixed sidecars
    * excluded).
    */
  private[graft] def hasParquetFile(p: java.nio.file.Path): Boolean =
    Fs.walkParquet(p).nonEmpty

  /** One version directory as a DataFrame, with partition-column types
    * pinned to the table's DECLARED types ([[TableProps.partitionSchema]])
    * when the table is partitioned. Directory-name type inference is
    * what it is fenced against: a STRING partition column holding
    * `2024-01-08`-shaped values would otherwise come back as DATE (and
    * `00123` as INT, silently dropping the leading zeros) — a schema
    * corruption, not a cosmetic change. Unpartitioned tables read
    * exactly as before.
    */
  private[graft] def readDir(spark: SparkSession, root: String, p: String): DataFrame = {
    if (hasLayoutLegs(p)) {
      // mixed-layout version (metadata-only partition evolution): the
      // legs union under their own specs; the vector keys are version-
      // dir-relative (`_layout<k>/…` for leg rows), so one subtraction
      // over the union stays exact
      val base = scanVersion(spark, root, p)
      val cols = base.columns.filterNot(_ == "_metadata").toSeq
      val subtracted =
        if (!Dv.exists(p))
          base.select(cols.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
        else Dv.subtract(base, p, cols)
      return ColMap.toLogical(subtracted, p)
    }
    val base = readSchemaFor(spark, root, p) match {
      case None => spark.read.parquet(p)
      case Some(fixed) => spark.read.schema(fixed).parquet(p)
    }
    // hidden partitioning (B161): derived `_tp_*` directory columns are
    // write-side machinery — the caller sees the source columns only.
    // The drop lands as a Project ABOVE the scan, so a pushed-down
    // filter still reaches the scan with the derived attributes in
    // scope — which is where HiddenPartitionRule injects the directory
    // predicate. (`_metadata` is captured in the SAME projection as the
    // data columns below, before any drop, so the DV path keeps it.)
    val dataCols = base.columns.toSeq
      .filterNot(c => Transforms.parse(c).isDefined)
    // a version carrying a deletion vector (B135 merge-on-read DELETE)
    // subtracts it at scan time — this is the single funnel every Scala
    // read, snapshot diff, CDC read, replica bootstrap, and compaction
    // flows through, so deleted rows can never resurface from any of
    // them (SQL reads take the same subtraction via DvReadRule)
    val subtracted =
      if (!Dv.exists(p))
        base.select(dataCols.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      else {
        Dv.subtract(
          base.select((dataCols.map(org.apache.spark.sql.functions.col) :+
            org.apache.spark.sql.functions.col("_metadata")).toIndexedSeq: _*),
          p, dataCols)
      }
    // metadata-only renames: the files speak PHYSICAL names, the caller
    // gets LOGICAL ones ([[ColMap]]); unmapped versions pass through
    ColMap.toLogical(subtracted, p)
  }

  // -------------------- mixed-layout versions (metadata-only evolution)

  /** Reserved prefix of legacy-layout leg directories inside a version
    * dir — see [[graft.io.Fs.isLayoutLeg]]. A metadata-only partition
    * evolution ([[repartitionTable]] with `metadataOnly = true`) moves
    * the then-current files (by hardlink — inode-preserving, zero data
    * movement) under `_layout<k>/`, each leg keeping its own `_PSPEC`
    * stamp; files written after the evolution land at the top level
    * under the new spec. Readers union the legs; compaction (and any
    * COW rewrite) materializes them away.
    */
  private[graft] val LayoutDirPrefix = "_layout"

  /** Legacy-layout leg dirs under version dir `p`, ascending by index
    * (creation order — leg 0 is the oldest layout, so its column order
    * is the canonical pre-evolution table order the union preserves).
    */
  private[graft] def layoutLegs(p: String): Seq[Path] = {
    val d = Paths.get(p)
    if (!Files.isDirectory(d)) Nil
    else Fs.listDir(d)
      .filter(c => Files.isDirectory(c) && Fs.isLayoutLeg(c.getFileName.toString))
      .sortBy(_.getFileName.toString.drop(LayoutDirPrefix.length).toLong)
  }

  private[graft] def hasLayoutLegs(p: String): Boolean = layoutLegs(p).nonEmpty

  /** True iff version dir `p` was committed under a HIDDEN (transform)
    * partition spec — its directory columns are derived `_tp_*` names
    * ([[Transforms]]). Such versions must read through the funnel (the
    * bare scan would surface the derived columns), exactly like DV /
    * column-mapped / mixed-layout versions.
    */
  private[graft] def hasHiddenPartitioning(root: String, p: String): Boolean =
    partitionSchemaFor(root, p).exists(
      _.fieldNames.exists(n => Transforms.parse(n).isDefined))

  /** True iff any CURRENT-layout (top-level, Spark-visible) data file
    * exists under version dir `p` — right after a metadata-only
    * evolution there are none (everything moved into the new leg).
    */
  private[graft] def topLevelParquetExists(p: String): Boolean = {
    val d = Paths.get(p)
    Fs.walkParquet(d).exists(f =>
      !Fs.isLayoutLeg(d.relativize(f).getName(0).toString))
  }

  /** The partition spec of one scan root inside version dir `p`: a
    * leg's own `_PSPEC` stamp (always written by the evolution commit),
    * or — for the top level — the version's spec via
    * [[partitionSchemaFor]].
    */
  private def scanDirSpec(root: String, p: String,
      scanDir: String): Option[org.apache.spark.sql.types.StructType] =
    if (scanDir == p) partitionSchemaFor(root, p)
    else {
      val f = Paths.get(scanDir, PartitionSpecFile)
      require(Files.exists(f),
        s"layout leg $scanDir lacks its $PartitionSpecFile stamp — the " +
          "version dir is corrupt (evolution commits always stamp legs)")
      val ddl = new String(Files.readAllBytes(f), "UTF-8").trim
      if (ddl.isEmpty) None
      else Some(org.apache.spark.sql.types.StructType.fromDDL(ddl))
    }

  /** Read schema of one scan root inside version dir `p`: partition
    * types pinned from the scan root's own spec, metadata-ADDED columns
    * (version-level, [[ColMap.added]]) appended — the per-leg analog of
    * [[readSchemaFor]].
    */
  private def legReadSchema(spark: SparkSession, root: String, p: String,
      scanDir: String): org.apache.spark.sql.types.StructType = {
    val inferred = spark.read.parquet(scanDir).schema
    val pinned = scanDirSpec(root, p, scanDir) match {
      case None => inferred
      case Some(declared) =>
        org.apache.spark.sql.types.StructType(inferred.map { f =>
          declared.find(_.name.equalsIgnoreCase(f.name))
            .map(d => f.copy(dataType = d.dataType)).getOrElse(f)
        })
    }
    val added = ColMap.added(p)
    val have = pinned.fieldNames.map(_.toLowerCase).toSet
    val withAdded = added.foldLeft(pinned)((s, f) =>
      if (have(f.name.toLowerCase)) s else s.add(f.copy(nullable = true)))
    // widen overrides are VERSION-level and apply to every leg alike
    ColMap.applyWidened(p, withAdded)
  }

  /** Every data file of version dir `p` as ONE physical-named frame
    * carrying the `_metadata` struct as a regular last column — the
    * shared scan base of [[readDir]] and [[liveWithPositions]] for
    * mixed-layout versions. Each leg reads under its own partition
    * spec; `unionByName` aligns the differing column orders (a leg's
    * partition columns are directories there, data columns elsewhere)
    * with leg 0's order winning. Legs emptied by churn are skipped.
    */
  private[graft] def scanVersion(spark: SparkSession, root: String,
      p: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    def one(scanDir: String): DataFrame = {
      val df = spark.read.schema(legReadSchema(spark, root, p, scanDir))
        .parquet(scanDir)
      // hidden partitioning: a leg's derived `_tp_*` directory columns
      // never surface (and legs under DIFFERENT hidden specs would
      // break the unionByName below if they did)
      val cols = df.columns.filterNot(c => Transforms.parse(c).isDefined)
      df.select((cols.map(c => col(s"`$c`")) :+ col("_metadata"))
        .toIndexedSeq: _*)
    }
    val legs = layoutLegs(p).filter(l => Fs.walkParquet(l).nonEmpty)
    val tops = if (topLevelParquetExists(p)) Seq(p) else Nil
    val frames = legs.map(_.toString) ++ tops
    require(frames.nonEmpty, s"no data files under version dir $p")
    frames.map(one).reduce(_ unionByName _)
  }

  /** Individually-addressed files of mixed-layout version dir `p` as one
    * physical-named frame with `_metadata` — the stats/bloom pruned-read
    * analog of [[scanVersion]]. Files are grouped by their owning scan
    * root (a `_layout<k>/` leg or the top level), each group read with
    * its root as `basePath` (partition-directory columns stay in scope)
    * under the root's own pinned schema, then unioned by name. Mixed
    * versions always carry their own `_PSPEC` stamps, so no table root
    * is needed to resolve specs (`p` doubles as the fallback argument,
    * which is never consulted).
    */
  private[graft] def readFilesMixed(spark: SparkSession, p: String,
      files: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val base = Paths.get(p)
    val groups = files.groupBy { f =>
      val head = base.relativize(Paths.get(f)).getName(0).toString
      if (Fs.isLayoutLeg(head)) base.resolve(head).toString else p
    }
    // leg order first (canonical column order = oldest leg's), top last
    val ordered = (layoutLegs(p).map(_.toString) :+ p).filter(groups.contains)
    val frames = ordered.map { scanRoot =>
      val df = spark.read.option("basePath", scanRoot)
        .schema(legReadSchema(spark, p, p, scanRoot))
        .parquet(groups(scanRoot): _*)
      // same hiding as scanVersion: derived directory columns stay
      // scan-side
      val cols = df.columns.filterNot(c => Transforms.parse(c).isDefined)
      df.select((cols.map(c => col(s"`$c`")) :+ col("_metadata"))
        .toIndexedSeq: _*)
    }
    frames.reduce(_ unionByName _)
  }

  /** Version-local partition spec stamp: the partition-column DDL of the
    * layout THIS version's files actually have (empty string =
    * unpartitioned). Written by every commit, carried by RESTORE/CLONE,
    * preferred by readers — so `VERSION AS OF` across a partition
    * evolution ([[repartitionTable]]) reads each version under its own
    * layout instead of the table's current one.
    */
  private[graft] val PartitionSpecFile = "_PSPEC"

  /** The partition schema version dir `p` was committed under: its own
    * `_PSPEC` when present (None inside = explicitly unpartitioned),
    * falling back to the table-level spec for versions committed before
    * the stamp existed.
    */
  private[graft] def partitionSchemaFor(root: String,
      p: String): Option[org.apache.spark.sql.types.StructType] = {
    val f = Paths.get(p, PartitionSpecFile)
    if (Files.exists(f)) {
      val ddl = new String(Files.readAllBytes(f), "UTF-8").trim
      if (ddl.isEmpty) None
      else Some(org.apache.spark.sql.types.StructType.fromDDL(ddl))
    } else TableProps.partitionSchema(root)
  }

  /** The full read schema of version dir `p` with declared partition
    * types substituted — what a reader (or the catalog's user-specified
    * schema) must pin so inference never rewrites partition types. None
    * when the version is unpartitioned (let the reader infer as usual).
    */
  private[graft] def readSchemaFor(spark: SparkSession, root: String,
      p: String): Option[org.apache.spark.sql.types.StructType] = {
    // mixed-layout version: the canonical schema is leg 0's (the
    // pre-evolution table order [[scanVersion]]'s union preserves),
    // extended by any column only later legs / the top level carry
    // (none in practice — evolution never changes the column set)
    val legs0 = layoutLegs(p).filter(l => Fs.walkParquet(l).nonEmpty)
    if (legs0.nonEmpty) {
      val all = legs0.map(_.toString) ++
        (if (topLevelParquetExists(p)) Seq(p) else Nil)
      val schemas = all.map(legReadSchema(spark, root, p, _))
      val merged = schemas.tail.foldLeft(schemas.head) { (acc, s) =>
        s.foldLeft(acc)((a, f) =>
          if (a.fieldNames.exists(_.equalsIgnoreCase(f.name))) a else a.add(f))
      }
      return Some(merged)
    }
    val pinned = partitionSchemaFor(root, p).map { declared =>
      val inferred = spark.read.parquet(p).schema
      org.apache.spark.sql.types.StructType(inferred.map { f =>
        declared.find(_.name.equalsIgnoreCase(f.name))
          .map(d => f.copy(dataType = d.dataType)).getOrElse(f)
      })
    }
    // metadata-only ADD COLUMN ([[ColMap.added]]): append the added
    // fields to the read schema so parquet serves NULL from files that
    // predate the ADD and real values from files written after. A field
    // already present in the footers (a post-ADD linked commit wrote
    // it, or inference picked a new file) is not appended twice.
    val added = ColMap.added(p)
    val withAdded =
      if (added.isEmpty) pinned
      else {
        val base = pinned.getOrElse(spark.read.parquet(p).schema)
        val have = base.fieldNames.map(_.toLowerCase).toSet
        Some(added.foldLeft(base)((s, f) =>
          if (have(f.name.toLowerCase)) s else s.add(f.copy(nullable = true))))
      }
    // metadata-only type widening ([[ColMap.widened]], B162): pin the
    // declared WIDE type — the parquet reader upcasts narrow footers
    // per file, files written after the widen are wide already
    if (ColMap.widened(p).isEmpty) withAdded
    else Some(ColMap.applyWidened(p,
      withAdded.getOrElse(spark.read.parquet(p).schema)))
  }

  /** Snapshot versions present under `root`, ascending — the time-travel
    * inventory. Every listed version directory holds complete, immutable
    * data (the stage→v<N> rename is atomic, so a directory either exists
    * in full or not at all); a crash between rename and pointer flip can
    * leave a version that was never live, which still reads fine.
    * Versions below the last compaction base are vacuumed — pin within
    * the retention window (see [[compactVersioned]]).
    */
  def listVersions(root: String): Seq[Long] =
    Fs.listDir(Paths.get(root)).flatMap { p =>
      val name = p.getFileName.toString
      if (name.startsWith("v") && name.length > 1 && name.drop(1).forall(_.isDigit))
        Some(name.drop(1).toLong)
      else None
    }.sorted

  // ---------------------------------------------------------------- tags

  /** Named snapshot tags (the Iceberg tag / Delta named-ref analog):
    * `<root>/_tags/<name>` holds the pinned version number. Tags are
    * metadata-only (a few bytes, atomic tmp→rename write), resolve in
    * `VERSION AS OF '<name>'` ([[graft.catalog.GraftCatalog]]), and PIN
    * their version against compaction's retention vacuum — an eval
    * snapshot or a release stays readable at any retention setting
    * until its tag is dropped. Tag names must not be all-digits (they
    * would shadow numeric version literals in `VERSION AS OF`).
    */
  private val TagsDir = "_tags"

  private def tagName(name: String): String = {
    require(name.nonEmpty && name.forall(c =>
        c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"tag name must be [A-Za-z0-9._-]+, got '$name'")
    require(!name.forall(_.isDigit),
      s"tag name must not be all digits (shadows numeric time travel): '$name'")
    name
  }

  /** Create or move a tag to `version` (must be a retained version).
    * Atomic: readers see the old pin or the new one, never a torn file.
    * Runs under the commit lock so it serializes with compaction's
    * vacuum: either the tag lands before the vacuum reads the tag set
    * (version pinned) or the version was already evicted and the
    * existence check here fails loudly — a tag can never dangle.
    */
  def tagVersion(root: String, name: String, version: Long): Unit =
    withCommitLock(root) {
      require(listVersions(root).contains(version),
        s"tag '$name': version $version not present under $root " +
          s"(have ${listVersions(root).mkString(", ")})")
      val dir = Paths.get(root, TagsDir)
      Files.createDirectories(dir)
      val tmp = dir.resolve(s".${tagName(name)}.tmp${ProcessHandle.current().pid()}")
      Files.write(tmp, version.toString.getBytes("UTF-8"))
      Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }

  /** Drop a tag; idempotent (a missing tag is not an error — the caller
    * wanted it gone and it is). Dropping releases the version back to
    * normal retention at the next compaction.
    */
  def dropTag(root: String, name: String): Unit =
    Files.deleteIfExists(Paths.get(root, TagsDir, tagName(name)))

  /** All tags under `root`: name → pinned version. */
  def listTags(root: String): Map[String, Long] = {
    val dir = Paths.get(root, TagsDir)
    if (!Files.isDirectory(dir)) Map.empty
    else Fs.listDir(dir).flatMap { p =>
      val n = p.getFileName.toString
      if (n.startsWith(".")) None // in-flight tmp writes
      else (try new String(Files.readAllBytes(p), "UTF-8").trim.toLongOption
            catch { case _: java.io.IOException => None })
        .map(n -> _)
    }.toMap
  }

  /** Resolve a tag to its pinned version, if present. */
  def resolveTag(root: String, name: String): Option[Long] =
    listTags(root).get(name)

  /** The durable commit-instant marker inside every version dir
    * ([[graft.ops.LocalFsCommit.publishVersionDir]] writes it at the
    * commit rename). */
  val CommitTsFile = "_COMMIT_TS"

  /** A version's commit instant (millis): the durable `_COMMIT_TS`
    * marker when present, else the dir mtime (pre-marker versions, or a
    * crash between the commit rename and the marker write). EVERY
    * commit-time consumer — TIMESTAMP AS OF, `history`, time-based
    * retention — resolves through this one reader, so the guarantees
    * stay aligned even after a backup/copy/restore rewrites mtimes.
    */
  def commitInstantMs(dir: String): Long = {
    val marker = Paths.get(dir, CommitTsFile)
    if (Files.exists(marker))
      try new String(Files.readAllBytes(marker), "UTF-8").trim.toLong
      catch { case _: NumberFormatException =>
        Files.getLastModifiedTime(Paths.get(dir)).toMillis }
    else Files.getLastModifiedTime(Paths.get(dir)).toMillis
  }

  /** Table history (the DESCRIBE HISTORY analog): one row per retained
    * version with its commit instant ([[publishVersioned]] stamps the
    * version dir at the commit rename) and whether it is current.
    */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val cur = currentVersion(root)
    listVersions(root).map { v =>
      (v,
        new java.sql.Timestamp(commitInstantMs(versionPath(root, v))),
        opOf(versionPath(root, v)),
        cur.contains(v))
    }.toDF("version", "committed_at", "operation", "is_current")
  }

  /** Per-file inventory of the LIVE version — the `.files`
    * metadata-table analog: one row per data file with its relative
    * path, on-disk bytes, and footer row count
    * ([[Stats.fileInventory]] — footers only, no data pages). The
    * small-file / row-spread diagnostic `CALL system.compact` acts on.
    */
  def files(spark: SparkSession, root: String): DataFrame = {
    val cur = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    Stats.fileInventory(spark, versionPath(root, cur))
  }

  /** One-row operational summary of the LIVE version — the DESCRIBE
    * DETAIL analog: file/byte footprint, retained-version count, and
    * which acceleration metadata this table carries (partition spec,
    * stats columns, bloom columns, ANN quantizer, change feed). All of
    * it is driver-side directory metadata — no data file is opened.
    */
  def detail(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val cur = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    val live = versionPath(root, cur)
    val files = Fs.walkParquet(Paths.get(live))
    // deletion-vector cardinality is the one number that is data (a
    // small sidecar read); everything else stays directory metadata
    val nDeleted = Dv.cardinality(spark, live)
    // props fold ∪ retained receipts — the same union COPY INTO's
    // idempotence check trusts, so an ingestion whose receipt hasn't
    // been folded yet (writer crashed before the props update) still
    // counts; the props fold alone would under-report that window
    val nIngested = ingestedSources(spark, root).size
    Seq((root, "parquet", cur, listVersions(root).size.toLong,
        files.size.toLong, files.map(Files.size).sum,
        // hidden transforms surface in their human spelling (`day(ts)`),
        // identity columns as themselves
        TableProps.partitionCols(root)
          .map(c => Transforms.parse(c).fold(c)(_.spec)).mkString(","),
        // sidecars speak physical names; DESCRIBE DETAIL speaks logical
        Stats.sidecarCols(spark, live)
          .map(ColMap.toLogicalName(live, _)).mkString(","),
        Bloom.sidecarCols(spark, live)
          .map(ColMap.toLogicalName(live, _)).mkString(","),
        Files.isDirectory(Paths.get(live, AnnIndex.CentroidsSidecar)),
        Files.isDirectory(Paths.get(live, ChangesSidecar)),
        nDeleted, nIngested.toLong,
        // snapshot tags (B149) are retention pins an operator must SEE
        // before reasoning about vacuum behavior
        listTags(root).toSeq.sorted.map { case (n, v) => s"$n=v$v" }
          .mkString(",")))
      .toDF("location", "format", "version", "n_versions", "n_files",
        "size_bytes", "partition_cols", "stats_cols", "bloom_cols",
        "is_ann_index", "has_change_feed",
        "n_deleted_positions", "n_ingested_files", "tags")
  }

  /** Time-travel read: the immutable contents of version `v`, unaffected
    * by any later publish — a reader that pins a version keeps a
    * consistent snapshot for its whole job (the versioned-layout
    * equivalent of a table format's `VERSION AS OF`).
    */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val p = versionPath(root, v)
    if (!Files.exists(Paths.get(p)))
      throw new IllegalStateException(
        s"version $v does not exist under $root (available: ${listVersions(root).mkString(", ")})" +
          " — it may have been vacuumed by compaction")
    readDir(spark, root, p)
  }

  /** Row-level change feed between two committed versions — what a
    * downstream consumer applies to move a replica from `fromV` to `toV`
    * (the read half of CDC; [[graft.ops.Merge.applyTo]] is the write
    * half).
    *
    * With `keyCols` empty: bag semantics — `_change_type` ∈
    * {insert, delete} from two `exceptAll` diffs. With keys: ONE
    * full-outer key join classifies each key as insert (post only),
    * delete (pre only), update (both, payload differs — emitted as
    * `update_preimage` + `update_postimage` rows, Delta-CDF style), or
    * unchanged (dropped). Output: keys ++ payload ++ `_change_type`.
    *
    * Schema evolution mirrors [[Merge.upsert]]: a column ADDED in `toV`
    * appears in the feed with the `fromV` side read as null (so a row
    * whose only change is the new column classifies as an update, and
    * replaying the feed reproduces `toV` including the new column); a
    * column DROPPED in `toV` is not evolution and fails loudly.
    *
    * Scale shape: the keyed path is a single key-hash shuffle of the two
    * version scans; the payload comparison is one null-safe struct
    * equality per key — no window, no collect, skew handled by AQE like
    * any other key join.
    */
  def changesBetween(spark: SparkSession, root: String, fromV: Long, toV: Long,
      keyCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.functions._
    val rawFrom = readVersion(spark, root, fromV)
    val to = readVersion(spark, root, toV)
    require(rawFrom.columns.sameElements(to.columns) || keyCols.nonEmpty,
      s"schema drift between v$fromV and v$toV requires keyCols to classify")
    if (keyCols.isEmpty) {
      to.exceptAll(rawFrom).withColumn("_change_type", lit("insert"))
        .unionByName(rawFrom.exceptAll(to).withColumn("_change_type", lit("delete")))
    } else {
      val dropped = rawFrom.columns.filterNot(to.columns.contains)
      require(dropped.isEmpty,
        s"columns dropped in v$toV are not schema evolution: ${dropped.mkString(", ")}")
      // a KEY column may never be evolution — null-backfilling a key
      // would full-outer-join every from-row on null
      require(keyCols.forall(rawFrom.columns.contains),
        s"key columns absent from v$fromV: ${keyCols.filterNot(rawFrom.columns.contains).mkString(", ")}")
      // additive evolution: null-backfill new columns on the from side so
      // a new-column-only change classifies as an update, not unchanged
      val from = to.columns.filterNot(rawFrom.columns.contains).foldLeft(rawFrom)(
        (d, c) => d.withColumn(c, lit(null).cast(to.schema(c).dataType)))
      val payload = to.columns.filterNot(keyCols.contains).toSeq
      require(payload.nonEmpty, "keyCols must not cover every column")
      val pre = from.select(keyCols.map(col) :+
        struct(payload.map(col): _*).as("_pre"): _*)
      val post = to.select(keyCols.map(col) :+
        struct(payload.map(col): _*).as("_post"): _*)
      val changed = pre.join(post, keyCols, "full_outer")
        .withColumn("_rows",
          when(col("_pre").isNull,
            array(struct(lit("insert").as("t"), col("_post").as("p"))))
          .when(col("_post").isNull,
            array(struct(lit("delete").as("t"), col("_pre").as("p"))))
          .when(col("_pre") <=> col("_post"),
            // unchanged key drops out via an empty array; slicing a
            // one-element build to length 0 yields the empty array of
            // the right type without spelling the payload struct type
            slice(array(struct(lit("x").as("t"), col("_pre").as("p"))), 1, 0))
          .otherwise(array(
            struct(lit("update_preimage").as("t"), col("_pre").as("p")),
            struct(lit("update_postimage").as("t"), col("_post").as("p")))))
      changed.select(keyCols.map(col) :+ explode(col("_rows")).as("_c"): _*)
        .select(keyCols.map(col) ++
          payload.map(p => col(s"_c.p.$p").as(p)) :+
          col("_c.t").as("_change_type"): _*)
    }
  }

  /** Name of the write-side change-feed sidecar inside a version dir
    * (leading underscore: invisible to plain parquet reads of the dir).
    */
  val ChangesSidecar = "_changes"

  /** Per-version sidecar holding rows an expectations gate rejected at
    * publish time (with their `_violations`). Underscore-prefixed, so
    * plain parquet reads of the version dir never see it.
    */
  val QuarantineSidecar = "_quarantine"

  /** Quarantined rows of `version`, if that publish carried an
    * expectations gate ([[publishGated]] / [[Merge.applyTo]] with rules);
    * None for ungated versions.
    */
  def readQuarantine(spark: SparkSession, root: String, version: Long): Option[DataFrame] = {
    val p = Paths.get(versionPath(root, version), QuarantineSidecar)
    if (Files.isDirectory(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** As [[publishVersioned]], gated by `rules`: rows violating any rule
    * are split into the version's `_quarantine` sidecar and only clean
    * rows become table data — committed in the SAME atomic rename, so no
    * crash can publish unclean data or lose the quarantine (the hazard
    * of running [[Expect.split]] and two separate writes). The annotated
    * frame is pinned once (`localCheckpoint`) so a non-deterministic
    * input cannot route a row to both sides or neither.
    */
  def publishGated(df: DataFrame, root: String, expected: Option[Long],
      rules: Seq[Expect.Rule], statsCols: Seq[String] = Nil,
      changeFeed: Option[DataFrame] = None): Long = {
    require(rules.nonEmpty, "publishGated needs at least one rule (use publishVersioned)")
    val (clean, quarantine) = Expect.splitPinned(df, rules)
    publishVersioned(clean, root, expected, statsCols, changeFeed, Some(quarantine))
  }

  /** The O(delta) change-feed fast path: when EVERY version in
    * `(fromV, toV]` carries a writer-persisted `_changes` sidecar, return
    * their concatenation with a `_commit_version` column (the Delta
    * `table_changes` row shape) — no snapshot is opened, the read is
    * proportional to what actually changed. Returns None when any step
    * lacks a sidecar (a writer that didn't emit changes, a version
    * created by plain [[publishVersioned]]) — callers fall back to
    * [[changesBetween]], which is always available but O(table).
    *
    * Composition caveat: per-step feeds are exact for each step; summed
    * signed contributions telescope correctly (what [[Mview]] needs), and
    * last-write-wins collapse per key reproduces the net state change
    * (what replica sync needs) — but the bag of rows is NOT the same as
    * the NET classification [[changesBetween]] returns (a key inserted
    * then deleted appears twice here, not zero times).
    */
  def changeFeed(spark: SparkSession, root: String,
      fromV: Long, toV: Long): Option[DataFrame] = {
    import org.apache.spark.sql.functions.lit
    require(fromV <= toV, s"fromV $fromV > toV $toV")
    if (fromV == toV) {
      // the empty feed must still carry the documented row shape (keys ++
      // payload ++ _change_type ++ _commit_version) or an idle poller's
      // first filter on it would throw; borrow the schema from toV's own
      // sidecar, and report unavailable if there is none to borrow
      val side = Paths.get(versionPath(root, toV), ChangesSidecar)
      return if (Files.isDirectory(side))
        Some(spark.read.parquet(side.toString)
          .withColumn("_commit_version", lit(toV)).limit(0))
      else None
    }
    // walk the BASE chain backwards from toV: each step must carry a
    // sidecar whose recorded base links to the previous live version.
    // This rejects gaps (a plain publish without a feed), vacuumed
    // intermediates, and crash-orphaned versions whose feed was never
    // live (their base equals their successor's base, so the walk never
    // visits them).
    var cur = toV
    var chain = List.empty[Long]
    while (cur != fromV) {
      val side = Paths.get(versionPath(root, cur), ChangesSidecar)
      val baseFile = side.resolve("_BASE")
      if (!Files.isDirectory(side) || !Files.exists(baseFile)) return None
      val base = new String(Files.readAllBytes(baseFile), "UTF-8").trim.toLong
      if (base < fromV || base >= cur) return None // chain crosses the window or is malformed
      chain ::= cur
      cur = base
    }
    Some(chain.map { v =>
      spark.read.parquet(Paths.get(versionPath(root, v), ChangesSidecar).toString)
        .withColumn("_commit_version", lit(v))
    }.reduce(_.unionByName(_, allowMissingColumns = true)))
  }

  /** Adapt a [[changesBetween]] keyed feed into a [[Merge.upsert]] delta:
    * inserts and update postimages become 'upsert', deletes 'delete',
    * preimages drop. By construction
    * `Merge.upsert(v_from, changesAsDelta(changesBetween(from, to)))`
    * reproduces v_to exactly (ScaleSpec pins the round trip) — the CDC
    * read and write halves compose into replica sync.
    */
  def changesAsDelta(changes: DataFrame, opCol: String = "op"): DataFrame = {
    import org.apache.spark.sql.functions._
    changes.filter(col("_change_type") =!= "update_preimage")
      .withColumn(opCol,
        when(col("_change_type") === "delete", lit("delete")).otherwise(lit("upsert")))
      .drop("_change_type")
  }

  /** Catch `replicaRoot` up to `sourceRoot`'s current version by
    * replaying the change feed instead of recopying — the operational
    * composition of [[changesBetween]] (read half) and [[Merge.upsert]]
    * (write half). The replica records which SOURCE version it reflects
    * in a `_SYNCED_FROM` sidecar (its own version numbers advance
    * independently, one per apply).
    *
    *  - First sync bootstraps with a full copy of the source's current.
    *  - Later syncs ship ONE end-state diff (`changesBetween(last, cur)`)
    *    regardless of how many source versions elapsed — O(changed keys)
    *    data movement, the whole point at 100 TB.
    *  - If the last-synced version has been VACUUMED (compaction
    *    retention passed it), the incremental path is impossible; sync
    *    falls back to a full bootstrap copy — the standard CDC
    *    gap-resync behavior.
    *
    * Returns the source version the replica now reflects.
    */
  def syncReplica(spark: SparkSession, sourceRoot: String, replicaRoot: String,
      keys: Seq[String]): Long = {
    // keyless bag mode is fine for changesBetween but means nothing to
    // MERGE (a zero-column join key) — reject it before it can corrupt
    require(keys.nonEmpty, "syncReplica requires key columns")
    val srcV = currentVersion(sourceRoot).getOrElse(
      throw new IllegalStateException(s"no published version under $sourceRoot"))
    val marker = Paths.get(replicaRoot, "_SYNCED_FROM")
    val synced =
      if (Files.exists(marker))
        Some(new String(Files.readAllBytes(marker), "UTF-8").trim.toLong)
      else None
    def bootstrap(): Unit = {
      val full = readVersion(spark, sourceRoot, srcV)
      publishVersioned(full, replicaRoot, currentVersion(replicaRoot))
      ()
    }
    synced match {
      case Some(s) if s == srcV => () // already current
      case Some(s) if listVersions(sourceRoot).contains(s) =>
        import org.apache.spark.sql.functions._
        // writer-persisted feeds make the catch-up O(changed rows):
        // drop preimages, keep each key's LAST change across the steps
        // (last-write-wins reproduces the net state change), map to
        // upsert/delete ops. Snapshot diff remains the fallback.
        val delta = changeFeed(spark, sourceRoot, s, srcV) match {
          case Some(feed) =>
            Merge.latestPerKey(
                feed.filter(col("_change_type") =!= "update_preimage"),
                keys, Seq("_commit_version"))
              .withColumn("op",
                when(col("_change_type") === "delete", lit("delete"))
                  .otherwise(lit("upsert")))
              .drop("_change_type", "_commit_version")
          case None => changesAsDelta(changesBetween(spark, sourceRoot, s, srcV, keys))
        }
        Merge.applyTo(spark, replicaRoot, delta, keys)
      case _ => bootstrap() // never synced, or the base was vacuumed
    }
    val tmp = Paths.get(replicaRoot, "_SYNCED_FROM.tmp")
    Files.write(tmp, srcV.toString.getBytes("UTF-8"))
    Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    srcV
  }

  /** Publish `df` as the next version. Returns the published version.
    *
    * Concurrency (optimistic): the data lands in a writer-private staging
    * dir first; the COMMIT — check the table is still at `expected`,
    * allocate the next free version number, rename staging → v<N>, flip
    * the pointer — runs under a JVM mutex + cross-process file lock. A
    * writer whose base version was superseded gets a
    * `ConcurrentModificationException` (recompute against the new current
    * and retry) instead of silently clobbering the winner. Version
    * numbers are allocated inside the lock, so no two writers ever share
    * a v<N>; a crash before the commit leaves only a hidden `.stage-*`
    * dir, and a crash between the two renames leaves an unreferenced
    * v<N> that later commits simply skip past.
    */
  def publishVersioned(df: DataFrame, root: String): Long =
    publishVersioned(df, root, currentVersion(root))

  /** As [[publishVersioned]], with an explicit expected base version
    * (None = expecting to create the table). Callers that READ the table
    * to derive `df` must pass the version they read (see
    * [[graft.ops.Merge.applyTo]]) — re-reading the pointer at commit time
    * would let a concurrent publish slip between the read and the check.
    *
    * `statsCols` (optional) collects per-file min/max footer statistics
    * for those columns into the version's `_stats` sidecar
    * ([[Stats.annotate]]) BEFORE the commit rename — data and skipping
    * metadata become visible in the same atomic commit, so
    * [[Stats.readCurrentWhere]] never sees a version whose sidecar is
    * missing or half-written.
    *
    * `bloomCols` (optional) builds the B123 point-lookup `_bloom`
    * sidecar in staging, so data and bloom index become visible in the
    * same atomic commit; linked commits (appends, COW DML) then inherit
    * and extend it at O(delta) without being asked.
    *
    * `changeFeed` (optional) persists the writer's row-level change
    * classification for THIS commit (vs the version it replaces) into a
    * `_changes` sidecar, also inside the atomic commit — the write-side
    * CDF that lets [[changeFeed]] readers consume O(changed rows) instead
    * of re-diffing two snapshots. The writer is responsible for the
    * feed's truth (see [[Merge.upsertChanges]], derived from the merge's
    * own join); ScaleSpec pins it against [[changesBetween]].
    */
  def publishVersioned(df: DataFrame, root: String, expected: Option[Long],
      statsCols: Seq[String] = Nil, changeFeed: Option[DataFrame] = None,
      quarantine: Option[DataFrame] = None,
      bloomCols: Seq[String] = Nil,
      sidecars: Seq[(String, DataFrame)] = Nil,
      opTag: String = "publish"): Long = {
    Files.createDirectories(Paths.get(root))
    val stage = Paths.get(s"$root/.stage-${ProcessHandle.current().pid()}-${System.nanoTime()}")
    // Any failure before the stage→v<N> rename (a failed write, a lost
    // CME race, a commit-lock error) must not leak the staging dir; the
    // rename itself removes `stage`, so the cleanup below is a no-op on
    // the success path.
    try {
      // a table created PARTITIONED BY carries its partition spec in the
      // _PROPS sidecar — EVERY publish (SQL INSERT, DML rewrite, merge,
      // ALTER, compaction) lays the version out Hive-partitioned without
      // call-site cooperation, so partition pruning survives any writer
      val pcols = TableProps.partitionCols(root)
      // hidden partitioning (B161): derive (or RE-derive) the transform
      // columns from their sources so the directory value can never go
      // stale; refuse data columns squatting on the reserved namespace
      // (readers hide everything shaped like a derived column)
      Transforms.requireNoReservedData(df.columns.toSeq, pcols,
        s"publish to $root")
      val toStage = distributeForWrite(Transforms.derive(df, pcols), root, pcols)
      if (pcols.isEmpty) toStage.write.mode("overwrite").parquet(stage.toString)
      else {
        toStage.write.mode("overwrite").partitionBy(pcols: _*).parquet(stage.toString)
        // an empty result under partitionBy writes no footer-bearing
        // file (no partition dirs exist), which would lose the schema —
        // land an empty FLAT file instead (partition cols in the file,
        // exactly like an unpartitioned empty publish); readers see the
        // same schema either way
        if (!hasParquetFile(stage)) {
          val spark = df.sparkSession
          spark.createDataFrame(
              spark.sparkContext.parallelize(Seq.empty[org.apache.spark.sql.Row], 1),
              df.schema)
            .write.mode("overwrite").parquet(stage.toString)
        }
      }
      // explicit statsCols win; otherwise the table's DECLARED
      // auto-stats columns ('graft.stats.columns') annotate every
      // snapshot publish too — CTAS/OVERWRITE through the SQL door
      // never leaves a declared-skippable table un-annotated
      val effStats =
        if (statsCols.nonEmpty) statsCols
        else TableProps.statsColumns(root)
          .filter(c => df.columns.exists(_.equalsIgnoreCase(c)))
      if (effStats.nonEmpty) Stats.annotate(df.sparkSession, stage.toString, effStats)
      // B123: build the point-lookup sidecar in staging so data and
      // bloom index land in ONE atomic commit (the post-commit
      // Bloom.annotate path stays available for existing tables)
      if (bloomCols.nonEmpty) Bloom.annotate(df.sparkSession, stage.toString, bloomCols)
      changeFeed.foreach { ch =>
        require(ch.columns.contains("_change_type"),
          "changeFeed must carry a _change_type column")
        ch.write.mode("overwrite").parquet(s"$stage/$ChangesSidecar")
        // the feed is only meaningful relative to the version it was
        // computed against; readers validate the base CHAIN (an orphan
        // version left by a crash between rename and pointer flip also
        // carries a feed, but its base equals its successor's — walking
        // the chain from the target version skips it)
        Files.write(Paths.get(s"$stage/$ChangesSidecar", "_BASE"),
          expected.getOrElse(-1L).toString.getBytes("UTF-8"))
      }
      // quarantined rows ride the same staged dir: the rename below is
      // the single commit point for data + stats + feed + quarantine
      quarantine.foreach(_.write.mode("overwrite")
        .parquet(s"$stage/$QuarantineSidecar"))
      // caller-supplied REQUIRED sidecars (the ANN quantizer) ride the
      // same staged commit: a table that needs its sidecar to be usable
      // must never have a window where data committed without it
      sidecars.foreach { case (name, sdf) =>
        require(name.startsWith("_"),
          s"sidecar name must be _-prefixed (invisible to plain reads): $name")
        sdf.coalesce(1).write.mode("overwrite").parquet(s"$stage/$name")
      }
      stampOp(stage, opTag)
      commitStaged(root, stage, expected)
    } catch {
      case e: Throwable => Fs.deleteRecursively(stage); throw e
    }
  }

  /** Optimized write ([[TableProps.DistributeKey]]): cluster the staged
    * frame by its partition columns so each partition value lands from
    * ONE task — one file per value per commit instead of
    * (tasks × values). No-op for unpartitioned tables or tables that
    * did not opt in. Runs AFTER transform derivation so hidden specs
    * distribute by the derived directory value.
    */
  private def distributeForWrite(df: DataFrame, root: String,
      pcols: Seq[String]): DataFrame =
    if (pcols.isEmpty || !TableProps.distributeWrites(root)) df
    else df.repartition(pcols.map(c =>
      org.apache.spark.sql.functions.col(s"`$c`")).toIndexedSeq: _*)

  /** Per-version operation marker (`_OP`) — what DESCRIBE HISTORY's
    * `operation` column reads; written into the stage so it rides the
    * atomic commit. Pre-marker versions surface as "write".
    */
  private[graft] val OpFile = "_OP"
  private[graft] def stampOp(stage: Path, op: String): Unit = {
    Files.createDirectories(stage)
    Files.write(stage.resolve(OpFile), op.getBytes("UTF-8"))
    ()
  }
  private[graft] def opOf(dir: String): String = {
    val f = Paths.get(dir, OpFile)
    if (Files.exists(f)) new String(Files.readAllBytes(f), "UTF-8").trim
    else "write"
  }

  /** The commit half every versioned writer shares: check the table is
    * still at `expected`, allocate the next free version, rename
    * stage → v<N>, stamp the commit instant, flip the pointer, and — when
    * the table has a streaming feed directory — reconcile it. All under
    * the commit lock.
    */
  private def commitStaged(root: String, stage: Path, expected: Option[Long]): Long =
    withCommitLock(root) {
      val cur = currentVersion(root)
      if (cur != expected) {
        throw new java.util.ConcurrentModificationException(
          s"$root moved to ${cur.fold("absent")("v" + _)} while this writer " +
            s"was basing on ${expected.fold("absent")("v" + _)}; " +
            "recompute against the new current and retry")
      }
      // allocate past any orphan left by a crash between rename and flip
      var next = cur.map(_ + 1).getOrElse(0L)
      while (commitProtocol.versionExists(root, next)) next += 1
      // record the base so chain walks can traverse EVERY commit, not
      // just the feed-carrying ones
      Files.write(stage.resolve(VersionBaseFile),
        expected.getOrElse(-1L).toString.getBytes("UTF-8"))
      // version-local partition spec: every commit records the layout its
      // files actually have. A freshly-staged commit inherits the table's
      // current spec; a stage that ALREADY carries a `_PSPEC` (RESTORE's
      // hardlink carry of an old version, a cross-spec clone) describes
      // data laid out under THAT spec — the table-level spec then syncs
      // BACK to it here, inside the lock, so the next writer lays its
      // files compatibly and a mixed-layout version can never be
      // committed. Readers prefer the version-local spec (readSchemaFor),
      // which keeps time travel across a partition evolution correct.
      val pspec = stage.resolve(PartitionSpecFile)
      if (Files.exists(pspec)) {
        val ddl = new String(Files.readAllBytes(pspec), "UTF-8").trim
        TableProps.updateLocked(root)(m =>
          if (ddl.isEmpty) m - TableProps.PartitionKey
          else m + (TableProps.PartitionKey -> ddl))
      } else {
        Files.write(pspec,
          TableProps.load(root).getOrElse(TableProps.PartitionKey, "")
            .getBytes("UTF-8"))
      }
      commitProtocol.publishVersionDir(stage, Paths.get(versionPath(root, next)))
      commitProtocol.flipPointer(root, next)
      // past this point the commit IS durable and visible: a reconcile
      // failure (ENOSPC on a link, a chmod'd feed dir) must not make the
      // caller believe the commit failed — a retried "failed" INSERT
      // would double-insert. Links self-heal on the next commit's pass.
      try reconcileFeedLocked(root)
      catch { case e: Exception =>
        System.err.println(s"[graft] feed reconcile after commit v$next of " +
          s"$root failed (links self-heal on the next commit): $e")
      }
      next
    }

  /** The table's commit lock, for callers whose mutation must not
    * interleave with a publish — destructive DDL (drop/rename) takes it
    * so a concurrent writer can never observe a half-deleted table or
    * resurrect one mid-commit.
    */
  def withTableLock[T](root: String)(body: => T): T = withCommitLock(root)(body)

  private def withCommitLock[T](root: String)(body: => T): T =
    commitProtocol.withCommitLock(root)(body)

  // ---------- O(delta) appends and linked publishes ----------
  //
  // A snapshot publish rewrites the whole table per commit — correct,
  // but O(table) even when the commit adds one row. Appends instead
  // CARRY the live version's immutable data files into the new version
  // by hardlink (same inode, no data movement) and write only the new
  // rows; on an object store / table format this carry-over step is the
  // manifest re-reference Delta and Iceberg logs perform, and hardlinks
  // are its local-filesystem spelling. Readers are unchanged: every
  // version directory still reads as a complete snapshot, time travel
  // and vacuum keep working (the filesystem refcounts shared inodes, so
  // deleting an old version dir never invalidates a newer one).

  // ---------- concurrent-writer auto-rebase (round-12) ----------
  //
  // OCC alone makes the LOSER of every commit race redo its work: two
  // independent blind appenders — the common multi-writer shape on a
  // shared corpus table — could never both succeed. Delta rebases the
  // provably-safe cases automatically; so does this tier. A linked
  // commit that loses the race re-stages against the table's NEW live
  // version and retries, iff the interleaved commits provably COMMUTE
  // with it (final state = a serial schedule): blind appends commute
  // with everything that keeps the table's write contract fixed, and a
  // merge-on-read DV commit commutes when the files its vector touches
  // are still live and untouched by any DV added since. Anything else
  // (COW rewrites that re-derive rows they read, schema/constraint/
  // layout changes, quantizer swaps) keeps today's honest CME.

  /** Recovery contract of a linked commit whose base advanced. */
  private[graft] sealed trait RebasePolicy
  /** Never rebase — the commit read state a concurrent writer may have
    * changed; the caller must recompute (today's CME contract).
    */
  private[graft] case object NoRebase extends RebasePolicy
  /** A blind linked APPEND: serial-equivalent to running either side of
    * any commuting concurrent commit. `realign` re-checks the append
    * frame against the new base (the [[Sinks.alignToLive]] guard) so a
    * schema drift the gate missed still fails loudly.
    */
  private[graft] final case class AppendRebase(realign: Option[Long] => DataFrame)
      extends RebasePolicy
  /** A merge-on-read DV commit (DELETE/UPDATE/MERGE): rebase-safe iff
    * `touched()` — the version-relative file keys its vector references
    * — are all still live in the new current AND disjoint from every DV
    * part added since (file-granular disjointness, the Delta rule).
    */
  private[graft] final case class MorRebase(touched: () => Set[String])
      extends RebasePolicy
  /** A copy-on-write DML commit (round-13): rebase-safe under the SAME
    * file-granular disjointness gate as [[MorRebase]] — every touched
    * file still live in the new current and untouched by any DV added
    * since. Sound because every COW rewrite is snapshot-pinned (the
    * touched-file scan reads explicit immutable paths of the base
    * version; MERGE checkpoints its source), so the rebased commit's
    * state equals the serial schedule [this COW at its base, then the
    * interleaved commits]: the carry set (new current minus touched)
    * IS old-files-minus-touched plus everything the interleaved
    * commits added. An interleaved commit that rewrote, vacuumed, or
    * DV'd a touched file fails the subset/disjointness check and keeps
    * the honest CME.
    */
  private[graft] final case class CowRebase(touched: Set[String])
      extends RebasePolicy

  /** Bound on CME→re-stage rounds. Each retry costs O(delta) bytes +
    * O(live files) hardlinks — metadata-scale — so the bound is
    * generous (N writers racing one table resolve in ≤ N rounds for
    * the last loser; Delta's analogous commit-attempt bound is in the
    * millions). It exists only to turn a pathological livelock into a
    * loud CME instead of an unbounded spin.
    */
  private[graft] val MaxRebaseAttempts = 100

  /** Process-lifetime count of commit-race rebase retries (every
    * re-stage after a lost OCC race, across all tables) — observability
    * for multi-writer deployments: a climbing rate on one table says
    * its writers contend enough to consider coarser batching. The
    * stress harness reports it per run.
    */
  val rebaseRetries = new java.util.concurrent.atomic.AtomicLong(0)

  /** Table properties whose concurrent movement does NOT invalidate a
    * rebase: streaming high-water marks and COPY INTO receipts are the
    * bookkeeping OF concurrent appends — exactly the traffic rebase
    * exists for. Everything else (CHECK constraints `check.*`, the
    * partition spec, index parameters) is part of the write contract
    * the staged delta was validated under: if it moved, refuse.
    */
  private def semanticProps(p: Map[String, String]): Map[String, String] =
    p.filterNot { case (k, _) =>
      k.startsWith("graft.stream.lastBatch.") || k.startsWith("graft.copyin.")
    }

  private def relParquetKeys(dir: Path): Set[String] =
    Fs.walkParquet(dir).map(f => dir.relativize(f).toString).toSet

  /** True iff version dirs `a` and `b` hold the SAME files (names +
    * filesystem identity — carried hardlinks share inodes) under
    * sidecar `name`, or both lack it. A scheme sidecar (ANN quantizer,
    * PQ codebooks) that changed between the rebase endpoints means the
    * staged rows were derived under a scheme the table no longer has.
    */
  private def sameSidecar(a: Path, b: Path, name: String): Boolean = {
    def inventory(d: Path): Option[Set[(String, Any)]] = {
      val sc = d.resolve(name)
      if (!Files.isDirectory(sc)) None
      else Some(Fs.listDir(sc).filter(_.getFileName.toString.endsWith(".parquet"))
        .map { f =>
          val key = Files.readAttributes(f,
            classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
          (f.getFileName.toString, if (key != null) key else Files.size(f))
        }.toSet)
    }
    inventory(a) == inventory(b)
  }

  /** DV part filenames under a version dir (empty when no vector). */
  private def dvPartNames(dir: Path): Set[String] = {
    val sc = dir.resolve(Dv.Sidecar)
    if (!Files.isDirectory(sc)) Set.empty
    else Fs.listDir(sc).map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).toSet
  }

  /** The provably-safe gate: may a commit staged against `expected` be
    * re-staged against `newCur` under `policy`? Refuses (false → the
    * caller rethrows the CME) whenever it cannot PROVE commutativity.
    */
  private def rebaseSafe(spark: SparkSession, root: String,
      expected: Option[Long], newCur: Option[Long], policy: RebasePolicy,
      propsAtStage: Map[String, String]): Boolean = policy match {
    case NoRebase => false
    case _ => (expected, newCur) match {
      case (Some(oldV), Some(newV)) if newV != oldV =>
        val oldDir = Paths.get(versionPath(root, oldV))
        val newDir = Paths.get(versionPath(root, newV))
        if (!Files.isDirectory(oldDir) || !Files.isDirectory(newDir)) false
        // the write contract must not have moved: constraints, partition
        // spec (table-level AND version-local), column mapping, scheme
        // sidecars. Each is a metadata-scale comparison.
        else if (semanticProps(propsAtStage) != semanticProps(TableProps.load(root))) false
        else if (partitionSchemaFor(root, oldDir.toString).map(_.toDDL) !=
                 partitionSchemaFor(root, newDir.toString).map(_.toDDL)) false
        else if (!(ColMap.load(oldDir.toString) == ColMap.load(newDir.toString) &&
                   ColMap.dropped(oldDir.toString) == ColMap.dropped(newDir.toString) &&
                   ColMap.added(oldDir.toString) == ColMap.added(newDir.toString))) false
        else if (!Seq(AnnIndex.CentroidsSidecar, Pq.Sidecar)
                   .forall(sameSidecar(oldDir, newDir, _))) false
        // logical read schema unchanged (names + types; a concurrent
        // widening retype rewrote the footers under types our staged
        // files do not carry)
        else if (readDir(spark, root, oldDir.toString).schema
                   .map(f => (f.name, f.dataType.simpleString)) !=
                 readDir(spark, root, newDir.toString).schema
                   .map(f => (f.name, f.dataType.simpleString))) false
        else policy match {
          case MorRebase(_) | CowRebase(_) =>
            val touched = policy match {
              case MorRebase(thunk) => thunk()
              case CowRebase(t) => t
              case _ => Set.empty[String]
            }
            // every file our vector references must still be live …
            touched.subsetOf(relParquetKeys(newDir)) && {
              // … and untouched by any DV part added since (a folded
              // checkpoint part shows up as "added" and conservatively
              // refuses — the safe direction)
              val addedParts = dvPartNames(newDir) -- dvPartNames(oldDir)
              addedParts.isEmpty || {
                val keys = spark.read.parquet(
                    addedParts.toSeq.map(p => newDir.resolve(Dv.Sidecar).resolve(p).toString): _*)
                  .select("file").distinct().collect().map(_.getString(0)).toSet
                keys.intersect(touched).isEmpty
              }
            }
          case _ => true
        }
      case _ => false // creation races and drops don't rebase
    }
  }

  /** Marker file a streaming writer stamps into versions it commits
    * ([[graft.ops.TableStream.streamTo]] restart dedupe). Content:
    * `<writer-tag>:<batch-id>`.
    */
  private[graft] val BatchIdFile = "_BATCHID"

  /** Version-level base marker every commit writes ([[commitStaged]]):
    * the version this commit was based on (-1 for table creation). Lets
    * chain walks (feed reconcile) traverse commits that carry no
    * `_changes` sidecar — a compaction or plain publish must not strand
    * the versions behind it — while still never visiting an orphan
    * (a crash-abandoned rename that was never live is not on any
    * live version's base chain).
    */
  private[graft] val VersionBaseFile = "_VBASE"

  /** Sidecar-file count past which an append re-footers the whole
    * staged table into ONE fresh sidecar instead of carrying the pile
    * forward plus one — the log-checkpoint analog (bounds sidecar reads
    * and carry-over work; amortized O(1) footer reads per commit).
    */
  private[graft] val StatsCheckpointEvery = 32

  /** Publish `df` as the next version by APPEND: new rows are written,
    * the `expected` live version's data files are carried over by
    * hardlink, and the commit runs through the same OCC protocol as
    * [[publishVersioned]]. O(appended rows), not O(table).
    *
    * Contract: `df`'s schema must match the live version's (same names
    * and compatible types, any column order — columns are realigned to
    * the table's order before the write). Appends are not schema
    * evolution; evolving writers go through [[Merge.applyTo]]. With
    * `expected = None` the append creates the table (nothing to carry).
    *
    * `statsCols`: footer stats are computed for the NEW files only and
    * the prior version's `_stats` sidecar rows are carried alongside —
    * the skipping metadata stays O(delta) per commit too. When empty,
    * the live sidecar's columns are INHERITED (an append never demotes a
    * skippable table to full scans). If the prior version has no sidecar
    * its files simply stay unpruned (conservative keep), never a wrong
    * answer.
    *
    * `emitFeed`: persist the appended rows as this commit's `_changes`
    * sidecar (all `insert`, the append CDF). The feed rows are READ BACK
    * from the staged data files rather than recomputed from `df`, so a
    * non-deterministic input (sampling, unstable limits) cannot make the
    * committed feed disagree with the committed data.
    *
    * `batchTag`: provenance marker for streaming writers (see
    * [[BatchIdFile]]).
    *
    * `rebase` (default true): a lost commit race auto-rebases — the
    * append re-stages against the moved table and commits, O(delta),
    * when [[rebaseSafe]] proves the interleaved commits commute (blind
    * appends always do; the gate refuses on any contract change). A
    * caller whose PRE-STAGE reads make the append non-blind (COPY
    * INTO's receipt dedupe) passes false and keeps the honest CME.
    */
  def appendVersioned(df: DataFrame, root: String, expected: Option[Long],
      statsCols: Seq[String] = Nil, emitFeed: Boolean = false,
      batchTag: Option[String] = None,
      commitSidecars: Seq[(String, DataFrame)] = Nil,
      opTag: String = "append",
      rebase: Boolean = true): Long = {
    stageLinkedPublish(alignToLive(df, root, expected), root, expected,
      statsCols, emitFeed, batchTag,
      carry = _ => true, commitSidecars = commitSidecars, opTag = opTag,
      rebase =
        if (rebase) AppendRebase(exp => alignToLive(df, root, exp))
        else NoRebase)
  }

  /** Align an append frame to the live schema: same column set and
    * order, or fail loudly — shared by [[appendVersioned]] and the
    * linked writes of a multi-table transaction ([[Txn.publishAll]]),
    * so a TxnWrite whose column order drifts cannot commit a
    * mixed-schema version that single-table appends would have refused.
    */
  private[graft] def alignToLive(df: DataFrame, root: String,
      expected: Option[Long]): DataFrame = expected match {
    case None => df
    // an expected version whose dir is gone (never existed, or
    // vacuumed) cannot be aligned against — skip straight to the
    // commit check, which reports it as the CME it is
    case Some(v) if !Files.exists(Paths.get(versionPath(root, v))) => df
    case Some(v) =>
      val live = readDir(df.sparkSession, root, versionPath(root, v)).schema
      val missing = live.fieldNames.filterNot(df.columns.contains)
      val extra = df.columns.filterNot(live.fieldNames.contains)
      require(missing.isEmpty && extra.isEmpty,
        s"append schema mismatch vs v$v (missing: ${missing.mkString(", ")}; " +
          s"extra: ${extra.mkString(", ")}) — appends are not schema " +
          "evolution, use Merge.applyTo")
      // TYPES must match too: a type-drifted file committed next to
      // the carried files is corruption readers discover later, far
      // from the cause (simpleString comparison: structural type,
      // nullability ignored)
      val retyped = live.filter(f =>
        df.schema(f.name).dataType.simpleString != f.dataType.simpleString)
      require(retyped.isEmpty,
        s"append type mismatch vs v$v: " +
          retyped.map(f => s"${f.name} is ${f.dataType.simpleString} but the " +
            s"append carries ${df.schema(f.name).dataType.simpleString}")
            .mkString("; ") + " — cast before appending")
      df.select(live.fieldNames.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
  }

  /** Copy-on-write publish (file-granular DML): `rewritten` replaces the
    * rows of the `touchedRel` data files (version-dir-relative paths)
    * while every OTHER live file is carried into the new version by
    * hardlink — the Delta-style rewrite. Commit cost scales with the
    * files the predicate touches, not with the table: untouched files
    * move zero bytes, their stats sidecar rows ride along (rows keyed by
    * replaced files go stale and are ignored by pruning — the periodic
    * sidecar checkpoint sweeps them), and fresh footer stats cover the
    * rewritten files. `rewritten` must already be projected to the
    * table's schema in table column order.
    */
  private[graft] def cowPublish(spark: SparkSession, root: String, expected: Long,
      touchedRel: Set[String], rewritten: DataFrame,
      checkEmpty: Boolean = true,
      changeFeed: Option[DataFrame] = None): Long = {
    // a COW rewrite reads touched files RAW — under a deletion vector
    // that would resurrect deleted rows into the rewritten files.
    // Refuse with the purge hint (the Delta phasing: DV tables gate
    // row-rewriting DML until the vector is compacted away).
    Dv.requireNone(versionPath(root, expected), "copy-on-write DML")
    // same class of hazard for a column-mapped version: the rewrite's
    // new files would carry LOGICAL footer names next to carried
    // PHYSICAL-named files — a mixed-schema version no reader can
    // serve. DML routes merge-on-read on mapped tables; this is the
    // backstop for direct callers.
    require(!ColMap.exists(versionPath(root, expected)),
      "copy-on-write DML cannot run on a column-mapped version " +
        s"(${versionPath(root, expected)}/${ColMap.MarkerFile}): DML " +
        "routes merge-on-read automatically, or compact the table to " +
        "materialize the renames first")
    // same backstop for mixed-layout versions: the caller's pruned
    // explicit-file scan cannot serve files whose partition directories
    // disagree — DML routes merge-on-read, compaction materializes
    require(!hasLayoutLegs(versionPath(root, expected)),
      "copy-on-write DML cannot run on a mixed-layout version " +
        s"(${versionPath(root, expected)} has _layout legs): DML routes " +
        "merge-on-read automatically, or compact the table to " +
        "materialize the partition evolution first")
    // a no-op statement (predicate matched nothing) still commits a
    // version — but writing its empty frame would land a zero-row file
    // alongside every carried one; skip the write (the empty check is a
    // trivial job here, the plan scans zero touched files). Callers
    // whose `rewritten` is an expensive plan over an empty touched set
    // (insert-only MERGE) pass checkEmpty = false — the probe would
    // execute the plan twice.
    val skipWrite = checkEmpty && touchedRel.isEmpty && rewritten.isEmpty
    stageLinkedPublish(rewritten, root, Some(expected), Nil,
      emitFeed = false, batchTag = None,
      carry = rel => !touchedRel.contains(rel), skipDataWrite = skipWrite,
      changeFeedDf = changeFeed, opTag = "cow-dml",
      // round-13: a lost race re-stages under file-granular
      // disjointness instead of aborting (see CowRebase) — COW-vs-
      // append and disjoint COW-vs-COW both commit; overlap refuses
      rebase = CowRebase(touchedRel))
  }

  /** The shared linked-publish core: write `df` as the staged delta,
    * carry the live files `carry` admits (by version-dir-relative path),
    * maintain the skipping sidecar, optionally emit the insert feed and
    * the streaming batch stamp, and commit through the OCC protocol.
    *
    * With a non-trivial `rebase` policy, a lost commit race re-stages
    * against the table's new live version and retries instead of
    * surfacing the CME — but ONLY when [[rebaseSafe]] can prove the
    * interleaved commits commute with this one (see the auto-rebase
    * block above). The re-stage is O(delta) + hardlinks, the same cost
    * as the first attempt; `MaxRebaseAttempts` bounds the spin.
    */
  private[graft] def stageLinkedPublish(aligned: DataFrame, root: String,
      expected: Option[Long], statsCols: Seq[String], emitFeed: Boolean,
      batchTag: Option[String], carry: String => Boolean,
      skipDataWrite: Boolean = false,
      changeFeedDf: Option[DataFrame] = None,
      dvDelta: Option[DataFrame] = None,
      commitSidecars: Seq[(String, DataFrame)] = Nil,
      opTag: String = "append",
      replaceSidecars: Seq[(String, DataFrame)] = Nil,
      rebase: RebasePolicy = NoRebase): Long = {
    def stageFor(frame: DataFrame, exp: Option[Long]): Path =
      stageLinkedNoCommit(frame, root, exp, statsCols,
        emitFeed, batchTag, carry, skipDataWrite, changeFeedDf, dvDelta,
        commitSidecars, opTag, replaceSidecars)
    val propsAtStage = TableProps.load(root)
    var exp = expected
    var stage = stageFor(aligned, exp)
    var attempts = 0
    while (true) {
      try return commitStaged(root, stage, exp)
      catch {
        case cme: java.util.ConcurrentModificationException =>
          Fs.deleteRecursively(stage)
          attempts += 1
          val newCur = currentVersion(root)
          if (attempts >= MaxRebaseAttempts ||
              !rebaseSafe(aligned.sparkSession, root, exp, newCur, rebase,
                propsAtStage))
            throw cme
          rebaseRetries.incrementAndGet()
          exp = newCur
          // a failed re-stage (a drift the gate could not see — the
          // realign guard refusing, a vacuumed base) reports as the CME
          // it is; the staging error rides along as suppressed detail
          stage =
            try {
              val frame = rebase match {
                case AppendRebase(realign) => realign(exp)
                case _ => aligned
              }
              stageFor(frame, exp)
            } catch {
              case e: Throwable => cme.addSuppressed(e); throw cme
            }
        case e: Throwable => Fs.deleteRecursively(stage); throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The staging half of [[stageLinkedPublish]], WITHOUT the commit —
    * for callers that coordinate the commit themselves ([[Txn]]'s
    * multi-table linked appends). Returns the fully-staged dir (data +
    * carried files + sidecars); the caller owns committing it through
    * the protocol or deleting it on failure.
    */
  private[graft] def stageLinkedNoCommit(aligned: DataFrame, root: String,
      expected: Option[Long], statsCols: Seq[String], emitFeed: Boolean,
      batchTag: Option[String], carry: String => Boolean,
      skipDataWrite: Boolean = false,
      changeFeedDf: Option[DataFrame] = None,
      dvDelta: Option[DataFrame] = None,
      commitSidecars: Seq[(String, DataFrame)] = Nil,
      opTag: String = "append",
      replaceSidecars: Seq[(String, DataFrame)] = Nil): Path = {
    require(!(emitFeed && changeFeedDf.isDefined),
      "emitFeed derives the insert feed from the staged files; a caller " +
        "supplying its own feed must not also request it")
    require(!(emitFeed && dvDelta.isDefined),
      "a deletion-vector commit stages no new data files to feed from")
    Files.createDirectories(Paths.get(root))
    val spark = aligned.sparkSession
    val stage = Paths.get(s"$root/.stage-${ProcessHandle.current().pid()}-${System.nanoTime()}")
    try {
      val pcols = TableProps.partitionCols(root)
      // metadata-only renames ([[ColMap]]): new rows arrive under
      // LOGICAL names but must land in the carried files' PHYSICAL
      // footer schema; the marker travels with the commit so readers
      // keep translating. Caller-named stats columns (logical) follow
      // the same translation; inherited sidecar columns are already
      // physical. Written FIRST so the emitFeed readback below sees it.
      val baseMapDir = expected.map(v => versionPath(root, v)).filter(ColMap.exists)
      val toWrite0 = baseMapDir.fold(aligned)(d => ColMap.toPhysical(aligned, d))
      // hidden partitioning (B161): re-derive the transform columns on
      // every linked commit too (a MOR UPDATE moving the source value
      // must move the row's directory; an appended frame never carries
      // them — the read funnel hides them)
      Transforms.requireNoReservedData(toWrite0.columns.toSeq, pcols,
        s"linked publish to $root")
      val toWrite =
        distributeForWrite(Transforms.derive(toWrite0, pcols), root, pcols)
      if (skipDataWrite) Files.createDirectories(stage)
      else if (pcols.isEmpty) toWrite.write.mode("overwrite").parquet(stage.toString)
      else toWrite.write.mode("overwrite").partitionBy(pcols: _*).parquet(stage.toString)
      baseMapDir.foreach(d => ColMap.carry(Paths.get(d), stage))
      // an append must not silently demote the table from skippable to
      // full-scan (the same guarantee compaction gives): when the caller
      // names no stats columns, inherit the live sidecar's UNION the
      // table's DECLARED auto-stats columns ('graft.stats.columns',
      // round-13) — so a SQL INSERT, DML commit, or streaming batch
      // keeps the skipping tier intact with zero call-site cooperation,
      // the Delta/Iceberg collect-stats-inside-every-commit behavior
      val declaredStats = TableProps.statsColumns(root).map(c =>
        baseMapDir.fold(c)(d => ColMap.toPhysicalName(d, c)))
      val effStats =
        if (statsCols.nonEmpty)
          baseMapDir.fold(statsCols)(d => statsCols.map(ColMap.toPhysicalName(d, _)))
        else (expected.toSeq.flatMap(v =>
          Stats.sidecarCols(spark, versionPath(root, v))) ++ declaredStats)
          .distinct
      // each append adds one sidecar file (the delta's); past the
      // checkpoint threshold, re-footer the WHOLE staged table into one
      // fresh sidecar instead of carrying the pile forward — the
      // log-checkpoint analog, amortized O(1) per commit
      val prevStatsFiles = expected.map(v =>
          Paths.get(versionPath(root, v), Stats.Sidecar))
        .filter(Files.isDirectory(_))
        .map(d => Fs.listDir(d).filter(_.getFileName.toString.endsWith(".parquet")))
        .getOrElse(Nil)
      val checkpointStats = effStats.nonEmpty &&
        prevStatsFiles.size >= StatsCheckpointEvery
      val hasNew = hasParquetFile(stage)
      // bloom sidecar inheritance (B123): filters describe IMMUTABLE
      // files by relative key, so a linked commit keeps the index at
      // O(delta) — build filters for only the staged delta here (the
      // stage holds nothing else yet), carry the prior sidecar files
      // verbatim below; rows keyed by files the carry filter drops (COW
      // rewrites) go stale and are ignored by the probe's file walk
      val bloomInherit = expected.toSeq.flatMap(v =>
        Bloom.sidecarCols(spark, versionPath(root, v)))
      if (bloomInherit.nonEmpty && hasNew)
        Bloom.annotate(spark, stage.toString, bloomInherit)
      if (emitFeed) {
        import org.apache.spark.sql.functions.lit
        // read back the staged delta (file listing happens here, before
        // any carry-over or the _changes write below lands in the dir)
        val back =
          if (hasNew) readDir(spark, root, stage.toString)
          else aligned.limit(0)
        back.withColumn("_change_type", lit("insert"))
          .write.mode("overwrite").parquet(s"$stage/$ChangesSidecar")
        Files.write(Paths.get(s"$stage/$ChangesSidecar", "_BASE"),
          expected.getOrElse(-1L).toString.getBytes("UTF-8"))
      }
      // a caller-computed row-level feed (COW DML) rides the same staged
      // commit as data + stats — the CDF contract every writer shares
      changeFeedDf.foreach { ch =>
        require(ch.columns.contains("_change_type"),
          "changeFeed must carry a _change_type column")
        ch.write.mode("overwrite").parquet(s"$stage/$ChangesSidecar")
        Files.write(Paths.get(s"$stage/$ChangesSidecar", "_BASE"),
          expected.getOrElse(-1L).toString.getBytes("UTF-8"))
      }
      batchTag.foreach(t =>
        Files.write(stage.resolve(BatchIdFile), t.getBytes("UTF-8")))
      // B135: a MOR commit stages ONLY its own per-file bitmap delta as
      // a new sidecar part; the prior vector parts are carried by
      // hardlink below and OR-merged at read time — commit bytes are
      // O(this commit's matched rows), never the cumulative vector
      dvDelta.foreach(_.coalesce(1).write.mode("overwrite")
        .parquet(s"$stage/${Dv.Sidecar}"))
      // commit-scoped sidecars (B137's _copyin ingestion receipt):
      // describe THIS commit, ride its atomic rename, and are NOT
      // carried forward by later linked commits
      commitSidecars.foreach { case (name, sdf) =>
        require(name.startsWith("_"),
          s"sidecar name must be _-prefixed (invisible to plain reads): $name")
        sdf.coalesce(1).write.mode("overwrite").parquet(s"$stage/$name")
      }
      // carry-over: link the live version's data files (and its skipping
      // sidecar) into the stage, preserving dir-relative paths so the
      // sidecar's file keys stay valid. The source version is immutable
      // and — being `expected` = current — cannot be vacuumed before our
      // commit check passes, so linking outside the lock is safe: if the
      // table moves meanwhile the commit throws CME and the stage dies.
      expected.foreach { v =>
        val live = Paths.get(versionPath(root, v))
        Fs.walkParquet(live).foreach { f =>
          val rel = live.relativize(f)
          if (carry(rel.toString)) {
            val dst = stage.resolve(rel)
            Files.createDirectories(dst.getParent)
            if (Files.exists(dst))
              throw new IllegalStateException(
                s"append carry-over collision on $rel — " +
                  "staged delta reused a committed file name")
            linkOrCopy(f, dst)
          }
        }
        // mixed-layout versions: each carried leg needs its spec stamp
        // or the new version can't read the leg under its own layout
        carryLayoutStamps(live, stage)
        // carry the prior sidecar files under their ORIGINAL names (UUID
        // part-file names never collide, and a carried-of-carried file
        // keeps a stable name — names must not compound across appends
        // or they eventually exceed NAME_MAX)
        if (!checkpointStats && Files.isDirectory(live.resolve(Stats.Sidecar))) {
          val dstStats = stage.resolve(Stats.Sidecar)
          Files.createDirectories(dstStats)
          Fs.listDir(live.resolve(Stats.Sidecar))
            .filter(_.getFileName.toString.endsWith(".parquet")).foreach { f =>
              val dst = dstStats.resolve(f.getFileName)
              if (Files.exists(dst))
                throw new IllegalStateException(
                  s"append sidecar carry-over collision on ${f.getFileName}")
              linkOrCopy(f, dst)
            }
        }
        // bloom sidecar rides the same carry (original UUID names, no
        // compounding); past the checkpoint threshold the whole pile is
        // rewritten to one file of live keys — metadata-scale, never a
        // corpus scan (Bloom.compactSidecar)
        if (Files.isDirectory(live.resolve(Bloom.Sidecar))) {
          val prevBloomFiles = Fs.listDir(live.resolve(Bloom.Sidecar))
            .filter(_.getFileName.toString.endsWith(".parquet"))
          val dstBloom = stage.resolve(Bloom.Sidecar)
          Files.createDirectories(dstBloom)
          prevBloomFiles.foreach { f =>
            val dst = dstBloom.resolve(f.getFileName)
            if (Files.exists(dst))
              throw new IllegalStateException(
                s"append bloom sidecar carry-over collision on ${f.getFileName}")
            linkOrCopy(f, dst)
          }
          if (prevBloomFiles.size >= StatsCheckpointEvery)
            Bloom.compactSidecar(spark, stage.toString)
        }
        // an existing deletion vector describes carried files by
        // relative key, so it rides EVERY linked commit — appends,
        // streaming batches, AND MOR commits (whose own delta part was
        // already staged above; vector parts OR-merge at read time, so
        // delta + carried parts compose exactly). (COW rewrites never
        // reach here on a DV version: cowPublish refuses with the
        // compact-to-purge hint.) Past the checkpoint threshold — or
        // when any carried part is the legacy row-per-position format —
        // a MOR commit folds the whole pile into one fresh v2 part:
        // the log-checkpoint analog, amortized O(1) per commit, and
        // sidecar dirs stay single-format.
        if (Files.isDirectory(live.resolve(Dv.Sidecar))) {
          val prevDvFiles = Fs.listDir(live.resolve(Dv.Sidecar))
            .filter(_.getFileName.toString.endsWith(".parquet"))
          val dstDv = stage.resolve(Dv.Sidecar)
          Files.createDirectories(dstDv)
          prevDvFiles.foreach { f =>
            val dst = dstDv.resolve(f.getFileName)
            if (Files.exists(dst))
              throw new IllegalStateException(
                s"append dv sidecar carry-over collision on ${f.getFileName}")
            linkOrCopy(f, dst)
          }
          if (dvDelta.isDefined &&
              (prevDvFiles.size >= StatsCheckpointEvery ||
                Dv.hasLegacyParts(spark, versionPath(root, v))))
            Dv.compactSidecar(spark, stage.toString)
        }
        // the ANN quantizer and PQ codebooks describe the BUCKETING /
        // ENCODING SCHEME, not any file set — a linked commit preserves
        // the bucket and code columns as data, so both stay exactly
        // valid and must ride along (without them, one append would
        // brick AnnIndex.search/searchPq on the new version)
        Seq(AnnIndex.CentroidsSidecar, Pq.Sidecar).foreach { sc =>
          if (Files.isDirectory(live.resolve(sc))) {
            val dstC = stage.resolve(sc)
            Files.createDirectories(dstC)
            Fs.listDir(live.resolve(sc))
              .filter(_.getFileName.toString.endsWith(".parquet"))
              .foreach(f => linkOrCopy(f, dstC.resolve(f.getFileName)))
          }
        }
      }
      // a commit that CHANGES a carried scheme sidecar (an IVF bucket
      // split swapping the quantizer) replaces it wholesale inside the
      // same staged dir — data and new scheme become visible in one
      // atomic rename, exactly like the build-time contract
      replaceSidecars.foreach { case (name, sdf) =>
        require(name.startsWith("_"),
          s"sidecar name must be _-prefixed (invisible to plain reads): $name")
        Fs.deleteRecursively(stage.resolve(name))
        sdf.coalesce(1).write.mode("overwrite").parquet(stage.resolve(name).toString)
      }
      // an empty append creating an empty table still needs a
      // footer-bearing file or the version loses its schema (PHYSICAL
      // names, like every data file of the version)
      if (!hasParquetFile(stage)) {
        spark.createDataFrame(
            spark.sparkContext.parallelize(Seq.empty[org.apache.spark.sql.Row], 1),
            toWrite.schema)
          .write.mode("overwrite").parquet(stage.toString)
      }
      // stats maintenance, non-checkpoint path (runs AFTER carry-over so
      // the full staged file set is visible): annotate every staged file
      // missing sidecar coverage for any stats column — the fresh delta
      // (the commit's O(delta) cost, as before) PLUS any carried file an
      // earlier version never covered (one footer read each, ONCE — a
      // 'graft.stats.columns' declared after data therefore retrofits on
      // the very next commit, and the empty schema-anchor file of a
      // CTAS'd table gets a rows=0 entry that prunes it outright).
      // Afterwards every row rides the carry and commits stay O(delta).
      if (effStats.nonEmpty && !checkpointStats) {
        val colSet = effStats.map(_.toLowerCase).toSet // physical names
        val covered: Map[String, Set[String]] =
          if (Files.isDirectory(stage.resolve(Stats.Sidecar)))
            Stats.sidecar(spark, stage.toString).select("file", "col")
              .collect().groupBy(_.getString(0))
              .map { case (f, rs) => f -> rs.map(_.getString(1).toLowerCase).toSet }
          else Map.empty
        val missing = Fs.walkParquet(stage)
          .map(p => (p.toString, stage.relativize(p).toString))
          .filter { case (_, key) => !colSet.subsetOf(covered.getOrElse(key, Set.empty)) }
        Stats.annotatePairs(spark, stage.toString, missing, effStats,
          append = true)
      }
      // sidecar checkpoint: one fresh footer pass over the whole staged
      // table (carried + new files — metadata-scale) replaces the pile
      if (checkpointStats) Stats.annotate(spark, stage.toString, effStats)
      stampOp(stage, opTag)
      stage
    } catch {
      case e: Throwable => Fs.deleteRecursively(stage); throw e
    }
  }

  /** Metadata-only RENAME COLUMN commit ([[ColMap]]): hardlink the live
    * version wholesale, REPLACE its column-mapping marker with
    * `mapping` (logical → physical, identity entries dropped), and
    * commit through the OCC protocol. Zero data bytes move — the
    * O(table) rewrite the pre-mapping rename paid is gone; time travel
    * still reads each older version under its own names because the
    * marker is per-version. Callers (the catalog's ALTER) validate the
    * mapping against the live schema first.
    */
  def publishColumnMapping(spark: SparkSession, root: String,
      expected: Long, mapping: Map[String, String],
      dropped: Set[String] = Set.empty,
      opTag: String = "rename-column",
      added: Seq[org.apache.spark.sql.types.StructField] = Nil,
      widened: Option[Map[String, org.apache.spark.sql.types.DataType]] = None): Long = {
    val src = Paths.get(versionPath(root, expected))
    val stage = Paths.get(s"$root/.stage-${ProcessHandle.current().pid()}-${System.nanoTime()}")
    try {
      stageSnapshotLinks(src, stage)
      Files.deleteIfExists(stage.resolve(ColMap.MarkerFile))
      // widen entries (B162) survive every marker rewrite unless the
      // caller replaces them explicitly — a RENAME/ADD must never
      // silently re-narrow a widened column
      ColMap.write(stage, mapping, dropped, added,
        widened.getOrElse(ColMap.widened(src.toString)))
      stampOp(stage, opTag)
      commitStaged(root, stage, Some(expected))
    } catch {
      case e: Throwable => Fs.deleteRecursively(stage); throw e
    }
  }

  /** Metadata-only ALTER COLUMN TYPE widening commit (B162): hardlink
    * the live version and record `widenTo` (PHYSICAL name → wide type)
    * in the column-mapping marker — zero data bytes move. Readers pin
    * the wide type ([[readSchemaFor]]) and the parquet reader upcasts
    * narrow footers per file; writers land wide files from here on;
    * compaction materializes. A widened PARTITION column re-stamps the
    * staged `_PSPEC` (and thereby the table-level spec) so directory
    * values parse under the wide type. Callers validate the widening
    * matrix; this refuses only the structurally unsound case — widening
    * the SOURCE of a hidden bucket/truncate transform, whose derived
    * values are type-sensitive (`hash(5) != hash(5L)`): old directories
    * would stop matching the rule's injected predicate.
    */
  def publishTypeWidening(spark: SparkSession, root: String, expected: Long,
      widenTo: Map[String, org.apache.spark.sql.types.DataType]): Long = {
    val src = Paths.get(versionPath(root, expected))
    val pcols = TableProps.partitionCols(root)
    pcols.flatMap(Transforms.parse).foreach { t =>
      require(!widenTo.keys.exists(_.equalsIgnoreCase(t.src)) ||
          t.isInstanceOf[Transforms.Day] || t.isInstanceOf[Transforms.Month] ||
          t.isInstanceOf[Transforms.Year] || t.isInstanceOf[Transforms.Hour],
        s"cannot widen ${t.src}: it is the source of hidden transform " +
          s"${t.spec}, whose derived values are type-sensitive — old " +
          "directories would no longer match pruned reads; compact first")
    }
    val stage = Paths.get(s"$root/.stage-${ProcessHandle.current().pid()}-${System.nanoTime()}")
    try {
      stageSnapshotLinks(src, stage)
      Files.deleteIfExists(stage.resolve(ColMap.MarkerFile))
      // an ADDED column has no physical bytes to upcast — retype its
      // ADD record instead of minting a widen entry
      val addedNames = ColMap.added(src.toString).map(_.name.toLowerCase).toSet
      val (addWiden, physWiden) =
        widenTo.partition(e => addedNames(e._1.toLowerCase))
      val newAdded = ColMap.added(src.toString).map(f =>
        addWiden.collectFirst { case (n, t) if n.equalsIgnoreCase(f.name) => t }
          .fold(f)(t => f.copy(dataType = t)))
      ColMap.write(stage, ColMap.load(src.toString),
        ColMap.dropped(src.toString), newAdded,
        ColMap.widened(src.toString) ++ physWiden)
      // a widened identity partition column re-pins the spec DDL
      val spec = partitionSchemaFor(root, src.toString)
      if (spec.exists(_.fieldNames.exists(n =>
          widenTo.keys.exists(_.equalsIgnoreCase(n))))) {
        val widenedSpec = org.apache.spark.sql.types.StructType(spec.get.map(f =>
          widenTo.collectFirst { case (n, t) if n.equalsIgnoreCase(f.name) => t }
            .fold(f)(t => f.copy(dataType = t))))
        Files.write(stage.resolve(PartitionSpecFile),
          widenedSpec.toDDL.getBytes("UTF-8"))
      }
      stampOp(stage, "widen-type")
      commitStaged(root, stage, Some(expected))
    } catch {
      case e: Throwable => Fs.deleteRecursively(stage); throw e
    }
  }

  /** Operator hygiene: remove CRASH DEBRIS that retention-based vacuum
    * never touches — `.stage-*` dirs of writers that died before their
    * commit, and version dirs ABOVE the live pointer (a crash between
    * the version-dir rename and the pointer flip, or a multi-table
    * transaction killed before its marker). Both are invisible to every
    * reader and harmless, but they accumulate bytes forever on a busy
    * table. Only entries older than `olderThanMs` go (default 24 h —
    * the standard VACUUM trade: an IN-FLIGHT writer staging longer than
    * the window loses its not-yet-committed stage and fails cleanly at
    * commit, never corrupts); runs under the commit lock, so no commit
    * is concurrently promoting an above-current dir. `_txn-*` markers
    * are deliberately kept: a marker may be referenced by conditional
    * pointers of OTHER tables, which this table-scoped pass cannot see.
    * Returns (stage dirs removed, orphan versions removed).
    */
  def vacuumOrphans(root: String,
      olderThanMs: Long = 24L * 3600 * 1000): (Int, Int) = withCommitLock(root) {
    val cutoff = System.currentTimeMillis() - olderThanMs
    def oldEnough(p: Path): Boolean =
      try Files.getLastModifiedTime(p).toMillis < cutoff
      catch { case _: java.io.IOException => false }
    val entries = Fs.listDir(Paths.get(root))
    val stages = entries.filter(p =>
      p.getFileName.toString.startsWith(".stage-") && oldEnough(p))
    val cur = currentVersion(root)
    val orphans = entries.filter { p =>
      val n = p.getFileName.toString
      n.startsWith("v") && n.length > 1 && n.drop(1).forall(_.isDigit) &&
        cur.forall(_ < n.drop(1).toLong) && oldEnough(p)
    }
    (stages ++ orphans).foreach(Fs.deleteRecursively)
    (stages.size, orphans.size)
  }

  /** RESTORE: republish the immutable contents of `v` as a NEW version
    * (linked, no data movement) and flip the pointer — the administrative
    * rewind (`RESTORE TABLE ... TO VERSION AS OF`). History is preserved:
    * the bad versions stay readable until vacuumed, and the restore
    * itself is an ordinary OCC commit. No `_changes` sidecar is emitted
    * (a restore's delta is not insert-only); incremental consumers
    * observe the chain break and fall back to a snapshot diff / resync,
    * which is the honest contract for a rewind. Returns the new version
    * (or the current one unchanged when `v` is already live).
    */
  def restoreVersion(spark: SparkSession, root: String, v: Long): Long = {
    val cur = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    if (v == cur) return cur
    val src = Paths.get(versionPath(root, v))
    if (!Files.exists(src))
      throw new IllegalStateException(
        s"version $v does not exist under $root (available: ${listVersions(root).mkString(", ")})" +
          " — it may have been vacuumed by compaction")
    val stage = Paths.get(s"$root/.stage-${ProcessHandle.current().pid()}-${System.nanoTime()}")
    try {
      stageSnapshotLinks(src, stage)
      stampOp(stage, "restore")
      commitStaged(root, stage, Some(cur))
    } catch {
      case e: Throwable => Fs.deleteRecursively(stage); throw e
    }
  }

  /** Hardlink the immutable contents of version dir `src` into `stage`:
    * every data file plus every sidecar that DESCRIBES those files —
    * stats, bloom filters, the ANN quantizer: all remain exactly valid
    * for this file set. The `_changes` feed is deliberately NOT carried:
    * it describes the source version's original delta relative to ITS
    * predecessor, and surfacing it as the new commit's change feed would
    * be a lie (a restore's logical change is "table rewound", a clone's
    * history starts fresh). `_BASE`/`_COMMIT_TS`/`_BATCHID` markers are
    * likewise left behind — the commit writes its own (linking them
    * would let the new commit's stamp writes reach the SOURCE's inode).
    */
  /** Copy each `_layout<k>/_PSPEC` leg stamp of `src` into `stage` —
    * the leg spec is what makes a carried mixed-layout version readable
    * (data files travel through the parquet walk; the stamps must ride
    * along). No-op for flat versions.
    */
  private def carryLayoutStamps(src: Path, stage: Path): Unit =
    layoutLegs(src.toString).foreach { l =>
      val stamp = l.resolve(PartitionSpecFile)
      if (Files.exists(stamp)) {
        val dst = stage.resolve(l.getFileName)
        Files.createDirectories(dst)
        val dstStamp = dst.resolve(PartitionSpecFile)
        if (!Files.exists(dstStamp)) Files.copy(stamp, dstStamp)
      }
    }

  private def stageSnapshotLinks(src: Path, stage: Path): Unit = {
    Fs.walkParquet(src).foreach { f =>
      val dst = stage.resolve(src.relativize(f))
      Files.createDirectories(dst.getParent)
      linkOrCopy(f, dst)
    }
    carryLayoutStamps(src, stage)
    // the snapshot's own partition-spec stamp describes ITS layout and
    // must travel (copied, not linked — the commit may rewrite it);
    // commitStaged then syncs the table-level spec back to it, so a
    // restore across a partition evolution also restores the spec
    val pspec = src.resolve(PartitionSpecFile)
    if (Files.exists(pspec)) {
      Files.createDirectories(stage)
      Files.copy(pspec, stage.resolve(PartitionSpecFile))
    }
    // the column-mapping marker travels with the files it translates
    ColMap.carry(src, stage)
    Seq(Stats.Sidecar, Bloom.Sidecar, AnnIndex.CentroidsSidecar,
        Pq.Sidecar, Dv.Sidecar).foreach { sc =>
      val srcSc = src.resolve(sc)
      if (Files.isDirectory(srcSc)) {
        val dstSc = stage.resolve(sc)
        Files.createDirectories(dstSc)
        Fs.listDir(srcSc).filter(_.getFileName.toString.endsWith(".parquet"))
          .foreach(f => linkOrCopy(f, dstSc.resolve(f.getFileName)))
      }
    }
  }

  /** Merge-on-read DELETE (B135): record the row POSITIONS matching
    * `cond` in the live version's `_dv` deletion-vector sidecar and
    * commit with every data file carried by hardlink — commit cost is
    * O(matched rows + existing vector), zero data bytes rewritten. The
    * COW worst case this exists for: a predicate matching 0.1% of rows
    * spread across every file rewrites the whole table under B114;
    * here it writes one small sidecar. Readers subtract the vector at
    * scan time ([[readDir]], [[graft.plans.DvReadRule]]); `CALL
    * system.compact` purges it into files. The commit emits the deleted
    * rows as its `_changes` feed (only NEWLY deleted rows — re-matching
    * an already-deleted row is a no-op), so CDC consumers and replicas
    * see the same delta a COW delete would have produced.
    *
    * `cond` must reference table columns by NAME (the frame it filters
    * is a fresh scan of the live version). NULL condition values keep
    * the row — the same three-valued semantics as SQL DELETE.
    */
  /** The live version's rows with their deletion-vector positions
    * exposed (`_dv_key`, `_dv_pos`) and the existing vector already
    * subtracted — the frame every merge-on-read writer filters.
    */
  private[graft] def liveWithPositions(spark: SparkSession, root: String,
      dir: String): DataFrame = {
    require(Dv.safeDir(dir),
      s"merge-on-read DML requires a URI-transparent table path, got $dir" +
        " — use copy-on-write DML for this table")
    // the shared scan base: one frame over every layout leg (legs union
    // under their own specs after a metadata-only evolution; flat
    // versions read exactly as before) with `_metadata` as its last
    // column — so DV keys stay version-dir-relative in both shapes
    val base = scanVersion(spark, root, dir)
    import org.apache.spark.sql.functions.col
    // metadata-only renames: callers (and their conditions/assignments)
    // speak LOGICAL names; the scan's columns are PHYSICAL — alias in
    // the same projection that keeps `_metadata` (a later select
    // would lose the metadata struct)
    val colmap = ColMap.load(dir)
    val physToLogical = colmap.map { case (l, p) => p.toLowerCase -> l }
    val dataCols = base.columns.toIndexedSeq.filterNot(_ == "_metadata")
    val cols = dataCols.map(c => physToLogical.getOrElse(c.toLowerCase, c))
    Dv.requireNoReserved(cols, s"merge-on-read DML on $root")
    val positioned = base
      .select((dataCols.map(c =>
        col(s"`$c`").as(physToLogical.getOrElse(c.toLowerCase, c))) :+
        col("_metadata")): _*)
      .withColumn("_dv_key", Dv.relKey(dir))
      .withColumn("_dv_pos", col("_metadata.row_index"))
      .drop("_metadata")
    // join-free existing-vector subtraction, same path as the read side
    // (Dv.subtract) — the writer's scan stays Exchange-free too, with
    // the same oversized-vector anti-join fallback
    Dv.subtractByKey(positioned, dir, col("_dv_key"), col("_dv_pos"))
  }

  /** The merge-on-read commit every DV writer shares: merge
    * `vectorDelta` (positions leaving the live set) into the existing
    * vector, land `newRows` as the commit's only new data files, carry
    * everything else by hardlink, and ride `feed` as the `_changes`
    * sidecar — one atomic commit.
    */
  private[graft] def morPublish(spark: SparkSession, root: String,
      expected: Long, newRows: DataFrame, vectorDelta: DataFrame,
      feed: DataFrame, skipDataWrite: Boolean = false): Long = {
    // O(delta) vector commit: encode ONLY this commit's positions as
    // per-file roaring bitmaps ([[Dv.deltaBitmaps]]); the existing
    // vector parts are carried by hardlink and OR-merged at read time —
    // under heavy delete churn each commit writes O(matched) sidecar
    // bytes, never the cumulative vector (round-9 verdict item 1)
    stageLinkedPublish(newRows, root, Some(expected), Nil,
      emitFeed = false, batchTag = None, carry = _ => true,
      skipDataWrite = skipDataWrite, changeFeedDf = Some(feed),
      dvDelta = Some(Dv.deltaBitmaps(vectorDelta)), opTag = "mor-dml",
      // auto-rebase on file-granular disjointness: the touched-key set
      // is O(files the predicate matched), computed ONLY on the rebase
      // path (never on the happy path)
      rebase = MorRebase(() =>
        vectorDelta.select(org.apache.spark.sql.functions.col("file"))
          .distinct().collect().map(_.getString(0)).toSet))
  }

  def deleteVector(spark: SparkSession, root: String, cond: Column): Long = {
    val cur = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    val dir = versionPath(root, cur)
    val live = liveWithPositions(spark, root, dir)
    val cols = live.columns.filterNot(_.startsWith("_dv_")).toSeq
    import org.apache.spark.sql.functions.{coalesce, lit, col => c}
    val matched = live.filter(coalesce(cond, lit(false)))
    val delta = matched.select(c("_dv_key").as("file"), c("_dv_pos").as("row_index"))
    val feed = matched.select(cols.map(c).toIndexedSeq: _*)
      .withColumn("_change_type", lit("delete"))
    morPublish(spark, root, cur, live.limit(0).select(cols.map(c).toIndexedSeq: _*),
      delta, feed, skipDataWrite = true)
  }

  /** Merge-on-read UPDATE (B136): the DV composition of delete+insert —
    * matched rows' OLD positions join the `_dv` vector (their files
    * carried untouched by hardlink) while their UPDATED copies land as
    * the commit's only new files. Commit cost is O(matched rows +
    * existing vector): a predicate matching a handful of rows per file
    * across a 100 TB table moves those rows, not the table. Readers
    * need no new machinery — the same scan-time subtraction hides the
    * old copies, and the new copies are ordinary data files (a
    * partition-value-changing assignment just lands the copy in its new
    * directory). The commit's `_changes` feed carries the full
    * update_preimage/update_postimage pairs.
    *
    * `assignments` maps top-level column names to replacement
    * expressions (evaluated against the matched rows); `cond` uses the
    * same NAME-bound, NULL-keeps-row semantics as [[deleteVector]].
    */
  def updateVector(spark: SparkSession, root: String, cond: Column,
      assignments: Map[String, Column],
      validate: DataFrame => DataFrame = identity): Long = {
    require(assignments.nonEmpty, "updateVector requires at least one assignment")
    val cur = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    val dir = versionPath(root, cur)
    val live = liveWithPositions(spark, root, dir)
    val cols = live.columns.filterNot(_.startsWith("_dv_")).toSeq
    assignments.keys.foreach(k => require(
      cols.exists(_.equalsIgnoreCase(k)),
      s"assignment targets unknown column $k (have ${cols.mkString(", ")})"))
    import org.apache.spark.sql.functions.{coalesce, lit, col => c}
    val matched = live.filter(coalesce(cond, lit(false)))
    val delta =
      matched.select(c("_dv_key").as("file"), c("_dv_pos").as("row_index"))
    def toCols(df: DataFrame) = df.select(cols.map(c).toIndexedSeq: _*)
    val updated = toCols(matched.select(cols.map { n =>
      assignments.collectFirst {
        case (k, v) if k.equalsIgnoreCase(n) => v.as(n)
      }.getOrElse(c(n))
    }.toIndexedSeq: _*))
    val feed = toCols(matched).withColumn("_change_type", lit("update_preimage"))
      .unionByName(updated.withColumn("_change_type", lit("update_postimage")))
    // `validate` wraps the frame that is WRITTEN (CHECK-constraint
    // enforcement from the catalog tier rides here) — a failing row
    // aborts the staged write before any commit move
    morPublish(spark, root, cur, validate(updated), delta, feed)
  }

  /** Partition evolution: re-lay the LIVE version under a new partition
    * spec (possibly none) as one ordinary OCC commit — the
    * `ALTER TABLE ... PARTITIONED BY` this layout can honor. Because
    * files here carry no column-mapping indirection, a spec change is a
    * rewrite of the live version (the Delta position: a different
    * physical layout IS different files), not an Iceberg metadata-only
    * spec append — but it is a rewrite of the LIVE version only: history
    * stays untouched, and the version-local `_PSPEC` stamp means every
    * retained version keeps reading (and time-travelling, and RESTORING)
    * under the layout its files actually have. Restoring a pre-evolution
    * version restores its spec with it — a mixed-layout version cannot
    * be committed.
    *
    * The stats sidecar is rebuilt for the new files over the same
    * columns (minus any that became partition directories); a `_bloom`
    * sidecar describes dead files after a full rewrite and is dropped —
    * re-annotate via `CALL system.bloom_index` (same contract as
    * compaction). Returns the new version.
    */
  def repartitionTable(spark: SparkSession, root: String,
      partitionBy: Seq[String], metadataOnly: Boolean = false): Long = {
    val cur = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    val df = readCurrent(spark, root)
    val schema = df.schema
    // a spec entry is a plain column (identity) or a HIDDEN transform
    // (`day(ts)`, `bucket(16, id)`, `truncate(4, code)` — B161): the
    // transform contributes a DERIVED field the writers materialize and
    // the readers hide
    val canonical = partitionBy.map { c =>
      Transforms.parseSpec(c) match {
        case Some(t) =>
          val srcF = schema.find(_.name.equalsIgnoreCase(t.src)).getOrElse(
            throw new IllegalArgumentException(
              s"partition transform ${t.spec}: source column ${t.src} is " +
                s"not in the table schema (${schema.fieldNames.mkString(", ")})"))
          t.check(srcF.dataType).foreach(msg =>
            throw new IllegalArgumentException(s"partition transform ${t.spec}: $msg"))
          org.apache.spark.sql.types.StructField(t.colName, t.dataType(srcF.dataType))
        case None =>
          schema.find(_.name.equalsIgnoreCase(c)).getOrElse(
            throw new IllegalArgumentException(
              s"partition column $c is not in the table schema " +
                s"(${schema.fieldNames.mkString(", ")})"))
      }
    }
    require(canonical.map(_.name).distinct.size == canonical.size,
      s"duplicate partition column in ${partitionBy.mkString(", ")}")
    val identityNames = canonical.map(_.name)
      .filter(n => schema.fieldNames.exists(_.equalsIgnoreCase(n)))
    require(identityNames.size < schema.size,
      "at least one non-partition column is required")
    if (metadataOnly)
      return evolveSpecMetadataOnly(spark, root, cur, canonical)
    val oldProps = TableProps.load(root)
    // metadata moves first (the evolveSchema pattern) and rolls back on
    // failure, so no failure mode leaves the spec pointing at a layout
    // the live version lacks — the data publish below lays out by it
    TableProps.update(root)(m =>
      if (canonical.isEmpty) m - TableProps.PartitionKey
      else m + (TableProps.PartitionKey ->
        org.apache.spark.sql.types.StructType(canonical).toDDL))
    try {
      // Hive convention: IDENTITY partition columns LAST, in spec order
      // (derived transform columns aren't in the logical schema — the
      // publish below materializes them from their sources)
      val reordered = df.select(
        (schema.fieldNames.filterNot(identityNames.contains) ++ identityNames)
          .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      val sc = Stats.sidecarCols(spark, versionPath(root, cur))
        .filterNot(canonical.map(_.name).contains)
      publishVersioned(reordered, root, Some(cur), statsCols = sc)
    } catch {
      case e: Throwable => TableProps.store(root, oldProps); throw e
    }
  }

  /** Metadata-only partition evolution (the Iceberg spec-append form of
    * B134): record the NEW spec for FUTURE writes and move ZERO data
    * bytes. The live version's current-layout files are hardlinked
    * (same inode) under a new `_layout<k>/` leg that keeps the OLD spec
    * as its own `_PSPEC` stamp; the commit's top-level `_PSPEC` records
    * the new spec, which [[commitStaged]] syncs to the table level so
    * every later append lays its files out under it. Readers union the
    * legs ([[scanVersion]]) — partition pruning keeps firing on EACH
    * layout's own directory columns — and compaction (or any COW
    * rewrite) materializes the whole table under the current spec,
    * dissolving the legs: the rewrite form stays the compaction path.
    *
    * Sidecar file keys are version-dir-relative, so the keys of the
    * files that move are REWRITTEN with the `_layout<k>/` prefix in the
    * same commit — stats skipping, bloom point-skipping, and the
    * deletion vector stay exact across the evolution (metadata-scale
    * rewrites, never a data scan). Scheme sidecars (ANN quantizer, PQ
    * codebooks) carry verbatim: they describe no file set.
    *
    * Refused under a column-mapping RENAME (the spec would record
    * names future footers don't carry under the same spelling the legs
    * use) — materialize with the rewrite form first. DROP tombstones
    * and metadata-ADDED columns compose fine and pass through.
    */
  private def evolveSpecMetadataOnly(spark: SparkSession, root: String,
      cur: Long, canonical: Seq[org.apache.spark.sql.types.StructField]): Long = {
    import org.apache.spark.sql.functions.{col, concat, lit, when}
    val live = Paths.get(versionPath(root, cur))
    require(ColMap.load(live.toString).isEmpty,
      s"metadata-only partition evolution of $root is unsupported under a " +
        "column-mapping RENAME — compact or use the rewrite form " +
        "(metadataOnly = false) to materialize the mapping first")
    val oldDdl = partitionSchemaFor(root, live.toString).map(_.toDDL).getOrElse("")
    val newDdl =
      if (canonical.isEmpty) ""
      else org.apache.spark.sql.types.StructType(canonical).toDDL
    require(!oldDdl.equalsIgnoreCase(newDdl),
      s"$root is already partitioned by " +
        (if (oldDdl.isEmpty) "(nothing)" else oldDdl) + " — evolution is a no-op")
    val legIdx = layoutLegs(live.toString)
      .map(_.getFileName.toString.drop(LayoutDirPrefix.length).toLong)
    val nextLeg = legIdx.lastOption.fold(0L)(_ + 1)
    val legName = s"$LayoutDirPrefix$nextLeg"
    // no current-layout files (back-to-back evolutions with no append
    // between): nothing moves, no leg is born — only the spec changes
    val moveTop = topLevelParquetExists(live.toString)
    val stage = Paths.get(
      s"$root/.stage-${ProcessHandle.current().pid()}-${System.nanoTime()}")
    try {
      Files.createDirectories(stage)
      // data: hardlinks only — existing legs keep their relative paths,
      // current-layout files move under the new leg (same inodes)
      Fs.walkParquet(live).foreach { f =>
        val rel = live.relativize(f)
        val dstRel =
          if (Fs.isLayoutLeg(rel.getName(0).toString)) rel
          else Paths.get(legName).resolve(rel)
        val dst = stage.resolve(dstRel)
        Files.createDirectories(dst.getParent)
        linkOrCopy(f, dst)
      }
      // every leg keeps its own spec stamp; the new leg inherits the
      // OLD top-level spec (the layout its files actually have)
      layoutLegs(live.toString).foreach { l =>
        val dst = stage.resolve(l.getFileName)
        Files.createDirectories(dst)
        Files.copy(l.resolve(PartitionSpecFile), dst.resolve(PartitionSpecFile))
      }
      if (moveTop) {
        val legDir = stage.resolve(legName)
        Files.createDirectories(legDir)
        Files.write(legDir.resolve(PartitionSpecFile), oldDdl.getBytes("UTF-8"))
      }
      // keyed sidecars: prefix the moved files' keys (rows already
      // leg-prefixed describe files that did not move); when nothing
      // moved, carry the parts verbatim by hardlink
      val legKeyed = col("file").rlike(s"^$LayoutDirPrefix[0-9]+/")
      def rewriteKeys(name: String): Unit = {
        val src = live.resolve(name)
        if (!Files.isDirectory(src)) return
        if (!moveTop) {
          val dst = stage.resolve(name)
          Files.createDirectories(dst)
          Fs.listDir(src).filter(_.getFileName.toString.endsWith(".parquet"))
            .foreach(f => linkOrCopy(f, dst.resolve(f.getFileName)))
        } else {
          spark.read.parquet(src.toString)
            .withColumn("file", when(legKeyed, col("file"))
              .otherwise(concat(lit(legName + "/"), col("file"))))
            .coalesce(1).write.mode("overwrite")
            .parquet(stage.resolve(name).toString)
        }
      }
      rewriteKeys(Stats.Sidecar)
      rewriteKeys(Bloom.Sidecar)
      if (Dv.exists(live.toString)) {
        if (!moveTop) rewriteKeys(Dv.Sidecar)
        else if (!Dv.hasLegacyParts(spark, live.toString)) {
          // pure v2 parts: rewrite only the KEY column, never expand
          // the bitmaps — O(vector rows), not O(deleted positions).
          // Multiple rows per re-keyed file stay valid (reads OR-merge)
          rewriteKeys(Dv.Sidecar)
        } else {
          // mixed/legacy v1 parts can't be read as one frame — expand
          // through the format-tolerant positions read and re-encode as
          // one fresh v2 part (also the fold point)
          val re = Dv.vector(spark, live.toString)
            .withColumn("file", when(legKeyed, col("file"))
              .otherwise(concat(lit(legName + "/"), col("file"))))
          Dv.deltaBitmaps(re).coalesce(1).write.mode("overwrite")
            .parquet(stage.resolve(Dv.Sidecar).toString)
        }
      }
      // scheme sidecars and the non-RENAME column-mapping markers
      // (DROP tombstones / metadata ADDs) describe no file set — verbatim
      ColMap.carry(live, stage)
      Seq(AnnIndex.CentroidsSidecar, Pq.Sidecar).foreach { sc =>
        val srcSc = live.resolve(sc)
        if (Files.isDirectory(srcSc)) {
          val dstSc = stage.resolve(sc)
          Files.createDirectories(dstSc)
          Fs.listDir(srcSc).filter(_.getFileName.toString.endsWith(".parquet"))
            .foreach(f => linkOrCopy(f, dstSc.resolve(f.getFileName)))
        }
      }
      // the NEW spec rides the commit; commitStaged syncs the table
      // level to it under the lock, so the next writer lays out by it
      Files.write(stage.resolve(PartitionSpecFile), newDdl.getBytes("UTF-8"))
      stampOp(stage, "evolve-partition-spec")
      commitStaged(root, stage, Some(cur))
    } catch {
      case e: Throwable => Fs.deleteRecursively(stage); throw e
    }
  }

  /** Multi-dimensional layout clustering — the `OPTIMIZE ... ZORDER BY`
    * analog, and the SQL door's target (`CALL graft.system.zorder`):
    * rewrite the LIVE version range-partitioned + sorted by the
    * [[Layout.zorderN]] interleave of the named dimensions, each
    * normalized onto a common `bits`-bit grid from its own min/max
    * (one tiny aggregate — interleaving raw domains would let the
    * wider dimension own every significant bit, see
    * [[Layout.normalize]]). Stats are re-annotated IN THE SAME COMMIT
    * over the union of the existing sidecar columns and the z-order
    * dimensions (the compaction contract: a layout job must never
    * demote the table from skippable to full-scan), so predicates on
    * ANY clustered dimension file-prune immediately after the CALL.
    *
    * Reads through the single funnel and rewrites fresh, so — exactly
    * like [[compactVersioned]] — a deletion vector is purged and a
    * column-mapped table converges back to unmapped (no refusal
    * needed; the rewrite IS the materialization). Partitioned tables
    * keep their Hive layout: partition columns lead the range
    * partitioning so each task writes whole partition values, and they
    * cannot themselves be z-order dimensions (directories already
    * prune them). `bits` is clamped so k·bits fits a signed long.
    * One ordinary OCC commit; returns the new version.
    */
  def zorderTable(spark: SparkSession, root: String, zcols: Seq[String],
      bits: Int = 16, targetBytes: Long = 128L * 1024 * 1024): Long = {
    import org.apache.spark.sql.functions.{col, lit, min => smin, max => smax}
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}
    require(zcols.size >= 2,
      s"z-order needs >= 2 dimensions, got ${zcols.mkString(", ")} — for a " +
        "single column use compact (range-clusters by the stats columns)")
    val cur = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    val live = versionPath(root, cur)
    val df = readCurrent(spark, root)
    val schema = df.schema
    val canonical = zcols.map(c => schema.find(_.name.equalsIgnoreCase(c))
      .getOrElse(throw new IllegalArgumentException(
        s"z-order column $c is not in the table schema " +
          s"(${schema.fieldNames.mkString(", ")})")))
    require(canonical.map(_.name).distinct.size == canonical.size,
      s"duplicate z-order column in ${zcols.mkString(", ")}")
    val pcols = TableProps.partitionCols(root)
    canonical.foreach(f => require(!pcols.exists(_.equalsIgnoreCase(f.name)),
      s"${f.name} is a partition column — directories already prune it; " +
        "z-order the non-partition dimensions"))
    // each dimension must map onto the integer grid: numerics directly,
    // date/timestamp via their epoch spelling
    def asNum(f: org.apache.spark.sql.types.StructField): Column = f.dataType match {
      case DateType => org.apache.spark.sql.functions.unix_date(col(f.name)).cast("double")
      case TimestampType => org.apache.spark.sql.functions.unix_micros(col(f.name)).cast("double")
      case _: NumericType => col(f.name).cast("double")
      case dt => throw new IllegalArgumentException(
        s"z-order column ${f.name} has unclusterable type ${dt.simpleString} " +
          "(numeric, date, or timestamp required)")
    }
    val effBits = math.min(bits, 63 / canonical.size)
    require(effBits >= 1, s"too many dimensions for one z-value: ${canonical.size}")
    // one metadata-scale aggregate for the normalization bounds
    val boundCols = canonical.flatMap(f => Seq(smin(asNum(f)), smax(asNum(f))))
    val bounds = df.agg(boundCols.head, boundCols.tail: _*).head()
    val nFiles = math.max(fileCount(Paths.get(live), targetBytes), 1)
    val allBounded = canonical.indices.forall(i =>
      !bounds.isNullAt(2 * i) && !bounds.isNullAt(2 * i + 1))
    val laid =
      if (!allBounded) df.repartition(nFiles) // empty table / all-null dim
      else {
        val z = Layout.zorderN(canonical.zipWithIndex.map { case (f, i) =>
          Layout.normalize(asNum(f), lit(bounds.getDouble(2 * i)),
            lit(bounds.getDouble(2 * i + 1)), effBits)
        }, effBits)
        val keys = pcols.map(col) :+ z
        df.repartitionByRange(nFiles, keys: _*).sortWithinPartitions(keys: _*)
      }
    val sc = (Stats.sidecarCols(spark, live).map(ColMap.toLogicalName(live, _))
      ++ canonical.map(_.name)).distinct.filterNot(c => pcols.exists(_.equalsIgnoreCase(c)))
    publishVersioned(laid, root, Some(cur), statsCols = sc, opTag = "zorder")
  }

  /** Zero-copy CLONE: publish the source table's live version (or `asOf`
    * version) as version 0 of a NEW table at `dstRoot` — the Delta
    * `CREATE TABLE ... SHALLOW CLONE` analog, except that hardlink carry
    * makes it as durable as a deep clone on this binding: the clone
    * shares immutable inodes with the source, so vacuuming either table
    * later only unlinks names (shared inodes survive — the same
    * guarantee the streaming feed dir relies on). On an object-store
    * binding the same moves become a manifest copy: zero data bytes
    * move in either world.
    *
    * The clone carries the source's table metadata — partition spec,
    * CHECK constraints, table properties — and its descriptive sidecars
    * (stats, bloom, ANN quantizer), so file skipping and constraint
    * enforcement work on the clone from the first read. It does NOT
    * carry: version history (the clone starts at v0 — time travel on
    * the clone sees only its own commits), the change feed (no
    * predecessor to diff against), or streaming writer high-water marks
    * (`graft.stream.lastBatch.*` — Delta's rule: stream metadata is not
    * cloned; a stream targeting the clone is a NEW writer and must use
    * a fresh checkpoint). After the clone, the tables evolve fully
    * independently — every writer path copies-on-write, so neither can
    * ever observe the other's subsequent commits.
    */
  /** Write-audit-publish branching (the Iceberg branch / WAP recipe on
    * this table tier): [[branchTable]] zero-copy-clones the base's live
    * snapshot into a BRANCH table and records `(base root, base
    * version)` in the branch's properties; writers then commit to the
    * branch freely (every writer path applies — DML, appends,
    * expectations audits) while base readers never see a byte; and
    * [[mergeBranch]] FAST-FORWARDS the base to the branch's live
    * snapshot — hardlink adoption of the branch's version dir as one
    * ordinary OCC commit, O(metadata) at any table size.
    *
    * The fast-forward is only legal while the base still sits at the
    * recorded branch point: if the base advanced, the merge REFUSES
    * (the branch is stale — re-branch from the new base and replay;
    * the same rule Iceberg's fast-forward call enforces). A merged
    * branch refuses a second merge for the same reason. Table-level
    * properties stay per-table (the branch carries a copy from branch
    * time; merge moves DATA and its descriptive sidecars — stats,
    * bloom, ANN, DV, column mapping, partition spec — not props), and
    * the base's next feed reconcile diffs the adopted snapshot like
    * any commit.
    */
  def branchTable(spark: SparkSession, srcRoot: String,
      branchRoot: String): Long = {
    val baseV = currentVersion(srcRoot).getOrElse(
      throw new IllegalStateException(s"no published version under $srcRoot"))
    cloneTable(spark, srcRoot, branchRoot, asOf = Some(baseV))
    TableProps.update(branchRoot)(_ +
      ("graft.branch.of" -> srcRoot) +
      ("graft.branch.base" -> baseV.toString))
    // returns the RECORDED branch point (what mergeBranch will check
    // against), not a re-read of the base — a concurrent base commit
    // must not make the report disagree with the recorded pin
    baseV
  }

  /** Fast-forward the branch's base table to the branch's live
    * snapshot; returns the base's new version. See [[branchTable]].
    */
  def mergeBranch(spark: SparkSession, branchRoot: String): Long = {
    val props = TableProps.load(branchRoot)
    val baseRoot = props.getOrElse("graft.branch.of",
      throw new IllegalStateException(
        s"$branchRoot is not a branch (no graft.branch.of property) — " +
          "create it with branchTable / CALL graft.system.branch"))
    val branchBase = props.get("graft.branch.base").flatMap(_.toLongOption)
      .getOrElse(throw new IllegalStateException(
        s"$branchRoot: graft.branch.base property missing or unparsable"))
    val baseCur = currentVersion(baseRoot).getOrElse(
      throw new IllegalStateException(
        s"branch base $baseRoot no longer holds a published table"))
    require(baseCur == branchBase,
      s"fast-forward refused: $baseRoot advanced to v$baseCur since the " +
        s"branch point v$branchBase — re-branch from the current base " +
        "and replay the branch's changes")
    val branchV = currentVersion(branchRoot).getOrElse(
      throw new IllegalStateException(s"no published version under $branchRoot"))
    val src = Paths.get(versionPath(branchRoot, branchV))
    // a DV-carrying branch snapshot keeps its row-index keys only under
    // a URI-transparent base path — same refusal as clone
    if (Dv.exists(src.toString))
      require(Dv.safeDir(baseRoot),
        s"cannot fast-forward a deletion-vector-carrying branch into " +
          s"$baseRoot: the path is not URI-transparent — compact the " +
          "branch first")
    val stage = Paths.get(
      s"$baseRoot/.stage-${ProcessHandle.current().pid()}-${System.nanoTime()}")
    try {
      stageSnapshotLinks(src, stage)
      stampOp(stage, "merge-branch")
      commitStaged(baseRoot, stage, Some(baseCur))
    } catch {
      case e: Throwable => Fs.deleteRecursively(stage); throw e
    }
  }

  def cloneTable(spark: SparkSession, srcRoot: String, dstRoot: String,
      asOf: Option[Long] = None): Long = {
    val srcV = asOf.getOrElse(currentVersion(srcRoot).getOrElse(
      throw new IllegalStateException(s"no published version under $srcRoot")))
    val src = Paths.get(versionPath(srcRoot, srcV))
    if (!Files.exists(src))
      throw new IllegalStateException(
        s"version $srcV does not exist under $srcRoot (available: " +
          s"${listVersions(srcRoot).mkString(", ")}) — it may have been vacuumed")
    require(currentVersion(dstRoot).isEmpty,
      s"clone target $dstRoot already holds a published table")
    // a deletion-vector sidecar stores file keys relative to the VERSION
    // DIR as `_metadata.file_path` reports them (URI-encoded); cloned
    // into a non-URI-transparent target every key would mismatch and the
    // subtraction silently resurrect deleted rows — refuse up front
    // (the read side also fails loudly now, but the clone should never
    // commit an unreadable table)
    if (Dv.exists(src.toString))
      require(Dv.safeDir(dstRoot),
        s"cannot clone a deletion-vector-carrying version into $dstRoot: " +
          "the target path is not URI-transparent, so the carried vector " +
          "keys could not be matched at read time — clone to a path of " +
          "[A-Za-z0-9/._-], or CALL system.compact on the source first")
    Files.createDirectories(Paths.get(dstRoot))
    // table-level metadata first (partition spec must be in place before
    // any read of the committed clone pins partition types); writer
    // high-water marks are per-table identities and stay behind
    val srcProps = TableProps.load(srcRoot)
    if (srcProps.nonEmpty)
      TableProps.store(dstRoot,
        srcProps.filterNot(_._1.startsWith("graft.stream.lastBatch.")))
    val stage = Paths.get(s"$dstRoot/.stage-${ProcessHandle.current().pid()}-${System.nanoTime()}")
    try {
      stageSnapshotLinks(src, stage)
      stampOp(stage, "clone")
      commitStaged(dstRoot, stage, None)
    } catch {
      case e: Throwable => Fs.deleteRecursively(stage); throw e
    }
  }

  /** COPY INTO sidecar/props names (B137): each ingesting commit stages
    * a `_copyin` receipt (the source paths it ingested, atomic with the
    * data); after the commit the receipt folds into `_PROPS` keys
    * (durable past vacuum — [[compactVersioned]] folds evicted receipts
    * the way it folds streaming batch stamps).
    */
  private[graft] val CopyinSidecar = "_copyin"
  private[graft] def copyinPropKey(src: String): String =
    "graft.copyin." + java.security.MessageDigest.getInstance("MD5")
      .digest(src.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** COPY INTO (B137): idempotent batch file ingestion — load every
    * not-yet-ingested file under `srcDir` into the table as ONE commit,
    * exactly once across any number of re-runs, crashes, and vacuums
    * (the Delta `COPY INTO` / Snowflake loading-metadata pattern, the
    * batch door next to B119's streaming ingestion). File identity is
    * the source PATH — the landing-zone convention: files are immutable
    * once dropped; replacing content under the same name is not an
    * ingestion trigger.
    *
    * Idempotence is two-tier, like the streaming batch stamps: the
    * commit itself carries its receipt (`_copyin`, atomic with the
    * data), and the receipt folds into `_PROPS` afterwards — a crash
    * between the two leaves the receipt discoverable in the retained
    * version, and vacuum folds evicted receipts before deleting. A
    * re-run therefore skips everything either tier knows.
    *
    * First ingestion into an absent table creates it from the batch's
    * schema; later batches must match the live schema (the append
    * alignment guard — loud failure, no commit). Returns
    * `(version, newly ingested paths)` — the current version unchanged
    * when nothing new arrived.
    */
  def copyInto(spark: SparkSession, root: String, srcDir: String,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): (Long, Seq[String]) = {
    val src = Paths.get(srcDir)
    require(Files.isDirectory(src), s"copyInto source $srcDir is not a directory")
    val dataExt = format.toLowerCase match {
      case "parquet" => Some(".parquet")
      case _ => None
    }
    val candidates = Fs.listDir(src)
      .filter(p => Files.isRegularFile(p))
      .filterNot { p =>
        val n = p.getFileName.toString
        n.startsWith("_") || n.startsWith(".")
      }
      .filter(p => dataExt.forall(p.getFileName.toString.endsWith(_)))
      .map(_.toString).sorted
    val already = ingestedSources(spark, root)
    val newFiles = candidates.filterNot(already)
    if (newFiles.isEmpty)
      return (currentVersion(root).getOrElse(-1L), Nil)
    import spark.implicits._
    val receipt = newFiles.toDF("src")
    val df = spark.read.format(format).options(options).load(newFiles: _*)
    val v = currentVersion(root) match {
      case None =>
        publishVersioned(df, root, None,
          sidecars = Seq(CopyinSidecar -> receipt), opTag = "copy-into")
      case cur @ Some(_) =>
        // rebase = false: the receipt dedupe (`ingestedSources`) read
        // BEFORE staging — a concurrent COPY INTO of the same source
        // must surface as a CME so the retry re-reads the receipts,
        // never double-ingests
        appendVersioned(df, root, cur,
          commitSidecars = Seq(CopyinSidecar -> receipt), opTag = "copy-into",
          rebase = false)
    }
    // durable fold; a crash before this line is healed by the receipt
    TableProps.update(root)(p =>
      p ++ newFiles.map(f => copyinPropKey(f) -> f))
    (v, newFiles)
  }

  /** Every source path this table has ever ingested: the durable props
    * fold ∪ the receipts still sitting in retained versions at or below
    * current (orphans above current never became visible — their files
    * really do need re-ingesting).
    */
  private def ingestedSources(spark: SparkSession, root: String): Set[String] = {
    val fromProps = TableProps.load(root).collect {
      case (k, v) if k.startsWith("graft.copyin.") => v
    }.toSet
    val dirs = currentVersion(root).toSeq.flatMap(c =>
        listVersions(root).filter(_ <= c))
      .map(v => Paths.get(versionPath(root, v), CopyinSidecar))
      .filter(Files.isDirectory(_))
      .filter(d => Fs.listDir(d).exists(_.getFileName.toString.endsWith(".parquet")))
    val fromReceipts =
      if (dirs.isEmpty) Set.empty[String]
      else spark.read.parquet(dirs.map(_.toString): _*)
        .select("src").collect().map(_.getString(0)).toSet
    fromProps ++ fromReceipts
  }

  /** Hardlink `src` as `dst`, copying where the filesystem refuses links
    * (cross-device, unsupported FS). Committed parquet files are
    * immutable, so sharing the inode is safe.
    */
  private def linkOrCopy(src: Path, dst: Path): Unit =
    try Files.createLink(dst, src)
    catch {
      case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
        Files.copy(src, dst, StandardCopyOption.COPY_ATTRIBUTES)
    }

  // ---------- streaming-readable change feed directory ----------

  /** Sibling directory of the version dirs holding every live commit's
    * `_changes` files, hardlinked under `v<N>-<i>-<file>` names. Unlike
    * the underscore-prefixed sidecars this directory is a plain name:
    * it must be visible to Spark's file-stream source
    * ([[graft.ops.TableStream.streamFeed]]), which ignores `_`/`.`
    * path components. It is append-only — vacuuming a version does not
    * invalidate its feed links (shared inodes survive), so a slow
    * streaming consumer never loses data to retention.
    */
  val FeedDir = "feed"

  /** Opt the table into the streaming feed: once the directory exists,
    * EVERY commit (publish, append, merge, SQL DML) that carries a
    * `_changes` sidecar links it in as part of the commit, inside the
    * lock.
    */
  def enableStreamFeed(root: String): Unit = {
    Files.createDirectories(Paths.get(root, FeedDir))
    ()
  }

  /** Link every live commit's `_changes` files into `feed/`. Runs under
    * the commit lock. Walks the base chain back from the CURRENT
    * version — never a bare directory listing — so an orphan version
    * (crash between rename and pointer flip; its data was never live)
    * can never leak rows into the feed. The walk follows the
    * version-level `_VBASE` marker (every commit writes one), so
    * commits WITHOUT a feed — compaction, plain publishes, restores —
    * are traversed, not treated as the end of history: a feed-carrying
    * version stranded behind one still gets (re-)linked before
    * compaction's vacuum could delete its only copy. Idempotent by
    * target name, which also makes it the crash repair: a commit that
    * died after the pointer flip but before its feed links is healed by
    * the next commit's pass.
    */
  /** Watermark file inside `feed/`: the highest version whose chain has
    * been fully reconciled. Bounds [[reconcileFeedLocked]] to the
    * commits since the last pass (O(new commits), not O(retained
    * history) under the commit lock every micro-batch). Crash-safe: the
    * watermark advances only AFTER a complete walk, so a commit that
    * died before its links left the watermark below it and the next
    * pass revisits. Underscore-prefixed, so feed readers never see it.
    */
  private val FeedWatermark = "_RECONCILED"

  /** Re-walk the ENTIRE live chain and relink anything missing,
    * ignoring the watermark — the operator repair for feed links lost
    * below it (a manually cleaned directory, a restored backup).
    * Ordinary crash windows never need this; the per-commit reconcile
    * heals them.
    */
  def repairFeed(root: String): Unit = withCommitLock(root) {
    Files.deleteIfExists(Paths.get(root, FeedDir, FeedWatermark))
    reconcileFeedLocked(root)
  }

  private[graft] def reconcileFeedLocked(root: String): Unit = {
    val feed = Paths.get(root, FeedDir)
    if (!Files.isDirectory(feed)) return
    val wmFile = feed.resolve(FeedWatermark)
    val wm =
      if (Files.exists(wmFile))
        new String(Files.readAllBytes(wmFile), "UTF-8").trim.toLong
      else -1L
    val top = currentVersion(root)
    var cur = top
    while (cur.isDefined && cur.get > wm) {
      val vdir = Paths.get(versionPath(root, cur.get))
      val side = vdir.resolve(ChangesSidecar)
      if (Files.isDirectory(side) && Files.exists(side.resolve("_BASE"))) {
        Fs.listDir(side).filter(_.getFileName.toString.endsWith(".parquet"))
          .sortBy(_.getFileName.toString).zipWithIndex.foreach { case (f, i) =>
            val dst = feed.resolve(s"v${cur.get}-$i-${f.getFileName}")
            if (!Files.exists(dst)) linkOrCopy(f, dst)
          }
      }
      // predecessor: the version-level base; fall back to the feed
      // sidecar's base for versions committed before _VBASE existed
      val base = Seq(vdir.resolve(VersionBaseFile), side.resolve("_BASE"))
        .find(Files.exists(_))
        .map(p => new String(Files.readAllBytes(p), "UTF-8").trim.toLong)
      cur = base match {
        // a malformed base (>= its successor) would cycle the walk — stop
        case Some(b) if b >= 0 && b < cur.get => Some(b)
        case _ => None
      }
    }
    // advance the watermark only after the walk completed
    top.foreach { t =>
      val tmp = feed.resolve(FeedWatermark + ".tmp")
      Files.write(tmp, t.toString.getBytes("UTF-8"))
      Files.move(tmp, wmFile, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Compaction over the versioned layout: rewrite the live version into
    * ceil(bytes / targetBytes) files as a NEW version and flip the
    * pointer — readers see no window where the table is absent. The
    * vacuum keeps the newest `retainVersions` snapshots BELOW the
    * compaction base (the time-travel retention window) plus the base
    * itself (readers that resolved just before the flip) and everything
    * at or after it; deletion runs under the commit lock — so a
    * concurrent writer that commits v+1 between our flip and the vacuum
    * can never lose its committed directory. Orphaned `.stage-*` dirs
    * from crashed publishes are also removed, but only when the owning
    * pid (encoded in the dir name) is no longer alive — a live writer's
    * in-flight staging dir is untouchable. Production table formats age
    * all of these out by retention time instead; `retainVersions` is the
    * snapshot-count spelling of the same policy for [[readVersion]]
    * pinning.
    */
  def compactVersioned(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024, retainVersions: Int = 0,
      retainHours: Double = -1.0): Long = {
    require(retainVersions >= 0, s"retainVersions must be >= 0, got $retainVersions")
    val liveV = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    // time-based retention (the Delta VACUUM RETAIN spelling): with
    // retainHours >= 0, a version committed within the window is kept
    // even past the count cutoff — TIMESTAMP AS OF resolves by the same
    // commit instant ([[commitInstantMs]], the shared reader: durable
    // `_COMMIT_TS` marker, mtime fallback), so the two guarantees line
    // up — any timestamp in the window stays travelable, including
    // after a backup/copy/restore rewrites dir mtimes. Both retention
    // gates must pass to evict.
    val cutoffMs: Option[Long] =
      if (retainHours < 0) None
      else Some(System.currentTimeMillis() - (retainHours * 3600 * 1000).toLong)
    def withinWindow(v: Long): Boolean = cutoffMs.exists(cut =>
      commitInstantMs(versionPath(root, v)) >= cut)
    val live = versionPath(root, liveV)
    val nFiles = fileCount(Paths.get(live), targetBytes)
    // a compaction must not silently demote the table from skippable to
    // full-scan: carry the live version's stats columns into the rewrite
    // AND re-cluster by them — a round-robin repartition would spread
    // every key range across every output file, leaving the re-annotated
    // stats formally present but useless (each file's min/max ≈ the
    // global extent). Range-partitioning on the stats columns keeps
    // single-column pruning exact; a multi-dimensional (Z-order) layout
    // that must survive compaction should be re-laid with its own key
    // and republished instead.
    // sidecar columns are PHYSICAL; the rewrite below reads LOGICAL
    // (through the funnel) and re-lands logical-named files, converging
    // a renamed table back to unmapped — so translate for the recluster.
    // Declared auto-stats columns ('graft.stats.columns') join the set:
    // compaction is the retrofit pass for a property declared after data
    val statsCols = (Stats.sidecarCols(spark, live)
      .map(ColMap.toLogicalName(live, _)) ++ TableProps.statsColumns(root))
      .distinct
    val base = readDir(spark, root, live)
    val pcols = TableProps.partitionCols(root)
    val rewritten =
      if (statsCols.isEmpty && pcols.nonEmpty) {
        // partitioned table: cluster the rewrite BY the partition columns
        // so each task holds whole partition values — a round-robin
        // repartition would make every task write a sliver into every
        // partition dir, multiplying small files instead of merging them
        import org.apache.spark.sql.functions.col
        base.repartition(nFiles, pcols.map(col): _*)
      }
      else if (statsCols.isEmpty) base.repartition(nFiles)
      else {
        import org.apache.spark.sql.functions.col
        base.repartitionByRange(nFiles, statsCols.map(col): _*)
          .sortWithinPartitions(statsCols.map(col): _*)
      }
    val v = publishVersioned(rewritten, root, Some(liveV), statsCols,
      opTag = "compact")
    // a vacuumed version may hold the only _BATCHID stamp proving a
    // streaming batch committed (the writer crashed before its durable
    // high-water mark landed): fold every evicted stamp into _PROPS
    // BEFORE any deletion, or a restarted stream would re-append the
    // batch. (Outside the commit lock — TableProps.update takes it, and
    // the file lock is not reentrant; the evict set below liveV is
    // immutable, so the two lock windows see the same candidates.)
    // tagged versions are pinned: a tag is an explicit promise the
    // snapshot stays readable (eval sets, releases) — it beats every
    // retention knob until dropped. Snapshot the tag set once: the
    // locked eviction below excludes BOTH this snapshot and a fresh
    // read, so the evict set stays a subset of the stamp-folded
    // candidates even if a tag is dropped mid-compaction (the dropped
    // tag's version then survives until the NEXT pass — the safe
    // direction), while tags added since are honored by the fresh read.
    val taggedPinned = listTags(root).values.toSet
    val evictCandidates =
      listVersions(root).filter(_ < liveV).sorted.dropRight(retainVersions)
        .filterNot(withinWindow).filterNot(taggedPinned)
    val stamps = evictCandidates.flatMap { ev =>
      val f = Paths.get(versionPath(root, ev), BatchIdFile)
      if (!Files.exists(f)) None
      else {
        val s = new String(Files.readAllBytes(f), "UTF-8").trim
        val i = s.lastIndexOf(':')
        if (i <= 0) None
        else s.drop(i + 1).toLongOption.map(id => (s.take(i), id))
      }
    }
    if (stamps.nonEmpty) TableProps.update(root) { props =>
      stamps.foldLeft(props) { case (p, (tag, id)) =>
        val key = TableStream.lastBatchKey(tag)
        val prev = p.get(key).flatMap(_.toLongOption).getOrElse(-1L)
        if (id > prev) p + (key -> id.toString) else p
      }
    }
    // same durability contract for COPY INTO receipts (B137): an evicted
    // version may hold the only `_copyin` receipt proving files were
    // ingested (the writer crashed before its props fold) — fold before
    // deleting, or a re-run would double-ingest those files
    val copyinDirs = evictCandidates
      .map(ev => Paths.get(versionPath(root, ev), CopyinSidecar))
      .filter(Files.isDirectory(_))
    if (copyinDirs.nonEmpty) {
      val srcs = spark.read.parquet(copyinDirs.map(_.toString): _*)
        .select("src").collect().map(_.getString(0)).toSeq
      if (srcs.nonEmpty) TableProps.update(root)(p =>
        p ++ srcs.map(f => copyinPropKey(f) -> f))
    }
    withCommitLock(root) {
      // the commit's own reconcile swallows failures (a durable commit
      // must not report as failed) — but VACUUM is the step that makes
      // an unlinked `_changes` unrecoverable, so it re-verifies the
      // feed first and skips version eviction when the reconcile cannot
      // complete (stage debris cleanup is still safe: it holds no feed
      // data). The next compaction retries the eviction.
      val feedOk =
        try { reconcileFeedLocked(root); true }
        catch { case e: Exception =>
          System.err.println(s"[graft] feed reconcile before vacuum of $root " +
            s"failed — retaining all versions this pass: $e")
          false
        }
      val below = listVersions(root).filter(_ < liveV)
      // protect the UNION of the pre-fold tag snapshot and the tags
      // visible now under the lock: the snapshot keeps the evict set a
      // subset of the folded candidates (a version whose _BATCHID /
      // _copyin metadata was never folded can never be deleted), and
      // the fresh read honors tags created since (tagVersion also runs
      // under this lock, so the two cannot interleave mid-write)
      val evict = if (feedOk) below.sorted.dropRight(retainVersions)
                    .filterNot(withinWindow)
                    .filterNot(taggedPinned)
                    .filterNot(listTags(root).values.toSet).toSet
                  else Set.empty[Long]
      Fs.listDir(Paths.get(root)).foreach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("v") && name.length > 1 && name.drop(1).forall(_.isDigit)
            && evict(name.drop(1).toLong))
          Fs.deleteRecursively(p)
        else if (name.startsWith(".stage-") && stageOwnerDead(name))
          Fs.deleteRecursively(p)
      }
    }
    v
  }

  /** True iff a `.stage-<pid>-<nano>` dir's owning process is provably
    * gone (crashed publish debris). Unparseable names or live pids are
    * conservatively kept.
    */
  private def stageOwnerDead(name: String): Boolean =
    name.stripPrefix(".stage-").takeWhile(_.isDigit).toLongOption.exists { pid =>
      pid != ProcessHandle.current().pid() && !ProcessHandle.of(pid).isPresent
    }

  /** Small-file compaction of a FLAT parquet directory, in place.
    * Streaming sinks and fine-grained backfills accrete thousands of tiny
    * files; at 100 TB the resulting scan-planning and open() overhead
    * dominates reads, so periodic compaction is table maintenance, not an
    * optimization. Sizing comes from the files' on-disk footprint (no
    * extra scan of the data).
    *
    * Durability contract: the rewrite lands in `<path>.compact_tmp`, then
    * the live dir is swapped via two POSIX renames. A crash between the
    * renames is recoverable — the previous data survives intact in
    * `<path>.compact_old`, and the next `compact` call restores it before
    * doing anything else. For a no-gap swap (concurrent readers), use the
    * versioned layout ([[publishVersioned]]/[[compactVersioned]]) — a
    * directory rename cannot be made atomic for readers, least of all on
    * object stores.
    *
    * Partitioned (nested-directory) datasets are rejected: a flat rewrite
    * would silently drop the partitioning (and the top-level byte count
    * would be 0). Compact partitioned tables per-partition or via the
    * versioned layout.
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val dir = Paths.get(path)
    val bak = Paths.get(path + ".compact_old")
    // crash recovery: a previous run that died between the two renames
    // left the data in .compact_old and no live dir — restore first. A
    // backup ALONGSIDE a live dir is debris from a crash after the swap
    // completed but before cleanup — drop it, or the rename below would
    // fail forever on the existing target.
    if (!Files.exists(dir) && Files.exists(bak))
      Files.move(bak, dir, StandardCopyOption.ATOMIC_MOVE)
    else if (Files.exists(dir) && Files.exists(bak))
      Fs.deleteRecursively(bak)
    val entries = Fs.listDir(dir)
    val nested = entries.filter(p => Files.isDirectory(p))
    require(nested.isEmpty,
      s"compact() requires a flat parquet directory; $path contains " +
        s"subdirectories (${nested.take(3).map(_.getFileName).mkString(", ")}…) — " +
        "use compactVersioned or per-partition compaction for partitioned tables")
    val nFiles = fileCount(dir, targetBytes)
    val tmp = path + ".compact_tmp"
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp)
    Files.move(dir, bak, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), dir, StandardCopyOption.ATOMIC_MOVE)
    Fs.deleteRecursively(bak)
  }

  /** ceil(total parquet bytes / target), from file metadata only. */
  private def fileCount(dir: Path, targetBytes: Long): Int = {
    // recursive: partitioned versions nest data files under col=val/ dirs
    val totalBytes = Fs.walkParquet(dir).map(Files.size).sum
    math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
  }
}
