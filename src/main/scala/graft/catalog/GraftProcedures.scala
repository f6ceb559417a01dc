package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Maintenance stored procedures for [[GraftCatalog]] — the SQL `CALL`
  * door (Spark 4 `ProcedureCatalog`, the Iceberg `system.*` convention)
  * for operations that mutate table LAYOUT rather than table contents:
  *
  * {{{
  *   CALL graft.system.compact(table => 'events_part',
  *                             target_mb => 128, retain_versions => 2)
  * }}}
  *
  * `compact` is [[graft.ops.Sinks.compactVersioned]]: rewrite the live
  * version to target-size files (clustered by stats columns or partition
  * columns, so skipping and partitioning survive the rewrite), then
  * vacuum versions below the new base beyond `retain_versions`. Runs
  * through the same OCC commit as every writer — a concurrent publish
  * fails the CALL, never corrupts. Returns one row `(table,
  * new_version)` so scripts can chain on the result.
  */
private[graft] object GraftProcedures {

  val Namespace = "system"

  /** Every procedure [[GraftCatalog.loadProcedure]] serves — the ONE
    * list `SHOW PROCEDURES` (listProcedures) and the unknown-procedure
    * error hint derive from, so neither can under-report what the
    * loader actually dispatches (round-11 advisor finding). CatalogSpec
    * pins the loader ⊆/⊇ relationship by loading every name.
    */
  val Names: Seq[String] = Seq(
    "compact", "restore", "tag", "drop_tag", "branch", "merge_branch",
    "neardup_build", "neardup_append", "bloom_index", "clone",
    "repartition_table", "copy_into", "vacuum_orphans", "ann_split",
    "txn_publish", "zorder", "annotate_stats", "expire_versions",
    "eq_upsert", "eq_checkpoint", "bpe_train", "purge", "ndv",
    "mview_create", "mview_refresh")

  /** `system.compact(table, target_mb => 128, retain_versions => 0)`.
    * `resolveRoot` maps a (possibly `ns.`-qualified) table name to its
    * validated table root — supplied by the catalog so every identifier
    * guard (reserved names, traversal) applies to CALL too.
    */
  final class Compact(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "rewrite the live version to target-size files and vacuum versions " +
        "beyond the retention window"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("target_mb", IntegerType).defaultValue("128")
        .comment("target output file size, megabytes").build(),
      ProcedureParameter.in("retain_versions", IntegerType).defaultValue("-1")
        .comment("versions below the new base to keep time-travelable " +
          "(-1 = the table's declared graft.retain.versions, else 0)").build(),
      ProcedureParameter.in("retain_hours", DoubleType).defaultValue("-2.0")
        .comment("keep any version committed within this window " +
          "(VACUUM RETAIN analog; -1 = count-based only; -2 = the " +
          "table's declared graft.retain.hours, else count-based)").build(),
      ProcedureParameter.in("where", StringType).defaultValue("''")
        .comment("round-14 scoped rewrite: compact ONLY the files whose " +
          "identity-partition values satisfy this predicate (others " +
          "carry by hardlink); no retention vacuum runs in scoped mode")
        .build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val targetMb = input.getInt(1)
      val retain = input.getInt(2)
      val retainHours = input.getDouble(3)
      val whereArg = input.getUTF8String(4).toString
      require(targetMb > 0, s"target_mb must be positive, got $targetMb")
      require(retain >= -1, s"retain_versions must be >= -1, got $retain")
      val root = resolveRoot(table)
      val v = if (whereArg.trim.nonEmpty) {
        // scoped mode owns no retention: refusing a retention request
        // beats silently ignoring it
        require(retain == -1 && retainHours == -2.0,
          "compact(where => …) is a scoped rewrite and runs no retention " +
            "vacuum — call system.expire_versions for retention")
        graft.ops.Sinks.compactVersionedWhere(SparkSession.active, root,
          whereArg, targetMb.toLong * 1024 * 1024)
      } else graft.ops.Sinks.compactVersioned(SparkSession.active, root,
        targetMb.toLong * 1024 * 1024, retain, retainHours)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(table), v))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("new_version", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.vacuum_orphans(table, older_than_hours => 24.0)` — the
    * standalone orphan-file GC (round-15 extends it to the full Delta
    * VACUUM other half): dead `.stage-*` dirs, never-flipped version
    * dirs above the live pointer, AND unreferenced foreign entries —
    * anything the retained-version reference set (v* dirs + the
    * metadata files) does not cover, past the grace window (see
    * [[graft.ops.Sinks.vacuumOrphans]] for the safety reasoning,
    * the in-flight-writer trade the age window encodes, and why
    * inode-shared carries in other roots survive the unlink).
    */
  final class VacuumOrphans(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "vacuum_orphans"
    override def description(): String =
      "remove aged orphans: dead staging dirs, never-flipped version " +
        "dirs above the live pointer, and unreferenced foreign entries"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("older_than_hours", DoubleType).defaultValue("24.0")
        .comment("only debris older than this window is removed").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val hours = input.getDouble(1)
      require(hours >= 0, s"older_than_hours must be >= 0, got $hours")
      val root = resolveRoot(table)
      val (nStages, nOrphans, nForeign) = graft.ops.Sinks.vacuumOrphans(root,
        (hours * 3600 * 1000).toLong)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(table),
            nStages.toLong, nOrphans.toLong, nForeign.toLong))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("n_stage_dirs_removed", LongType, nullable = false),
          StructField("n_orphan_versions_removed", LongType, nullable = false),
          StructField("n_foreign_removed", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.bloom_index(table, columns)` — build the B123 `_bloom`
    * point-lookup sidecar over the LIVE version's data files (one
    * distributed pass; see [[graft.ops.Bloom.annotate]]). Layout-only
    * like compact: the sidecar is advisory metadata — readers that know
    * it prune, everyone else scans — so no OCC version bump is needed;
    * the files it describes are immutable. Linked commits inherit and
    * extend it at O(delta), and compaction rebuilds it over the
    * rewritten files (round-14); declare `graft.bloom.columns` instead
    * to make EVERY commit annotate with no CALL at all — this door
    * remains the one-shot retrofit for an undeclared table.
    */
  final class BloomIndex(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "bloom_index"
    override def description(): String =
      "build a per-file Bloom-filter sidecar for point-lookup file skipping"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("columns", StringType)
        .comment("comma-separated column names to index").build(),
      ProcedureParameter.in("expected_items", LongType).defaultValue("100000")
        .comment("expected distinct values per file (sizes each filter)").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val cols = input.getUTF8String(1).toString.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
      val items = input.getLong(2)
      require(cols.nonEmpty, "columns must name at least one column")
      require(items > 0, s"expected_items must be positive, got $items")
      val root = resolveRoot(table)
      val spark = SparkSession.active
      val live = graft.ops.Sinks.resolve(root)
      // unknown columns fail HERE with a clear message, not as a
      // mid-job analysis error from the annotate scan; through the read
      // funnel so users name LOGICAL columns on a mapped table
      val schema = graft.ops.Sinks.readCurrent(spark, root)
        .schema.fieldNames.toSet
      val missing = cols.filterNot(schema)
      require(missing.isEmpty,
        s"column(s) not in $table: ${missing.mkString(", ")}")
      graft.ops.Bloom.annotate(spark, live, cols, expectedItems = items)
      val v = graft.ops.Sinks.currentVersion(root).getOrElse(0L)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(table), v,
            UTF8String.fromString(cols.mkString(","))))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("version", LongType, nullable = false),
          StructField("columns", StringType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.annotate_stats(table, columns)` — build (or rebuild) the
    * `_stats` footer-statistics sidecar on the LIVE version, the same
    * in-place annotation contract as `bloom_index`: sidecars are
    * `_`-hidden metadata next to immutable data files, and later linked
    * commits carry and extend them at O(delta). The door that lights up
    * B109/B164 skipping on a table that was published without
    * `statsCols` — one footer pass, never a data scan.
    */
  final class AnnotateStats(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "annotate_stats"
    override def description(): String =
      "build the per-file min/max _stats sidecar for range file skipping"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("columns", StringType)
        .comment("comma-separated column names to collect stats for").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val cols = input.getUTF8String(1).toString.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
      require(cols.nonEmpty, "columns must name at least one column")
      val root = resolveRoot(table)
      val spark = SparkSession.active
      val live = graft.ops.Sinks.resolve(root)
      // unknown columns fail HERE, logically named (mapped tables too)
      val schema = graft.ops.Sinks.readCurrent(spark, root)
        .schema.fieldNames.toSet
      val missing = cols.filterNot(schema)
      require(missing.isEmpty,
        s"column(s) not in $table: ${missing.mkString(", ")}")
      // declared NDV columns retrofit their sketches through this CALL
      // (the documented remedy when 'graft.ndv.columns' lands after
      // data); declared histogram columns (round-16) retrofit their
      // equi-height boundaries the same way
      val ndvCols = graft.ops.TableProps.ndvColumns(root)
        .filter(c => cols.exists(_.equalsIgnoreCase(c)))
      val histCols = graft.ops.TableProps.histogramColumns(root)
        .filter(c => cols.exists(_.equalsIgnoreCase(c)))
      graft.ops.Stats.annotate(spark, live, cols, ndvCols, histCols)
      val v = graft.ops.Sinks.currentVersion(root).getOrElse(0L)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(table), v,
            UTF8String.fromString(cols.mkString(","))))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("version", LongType, nullable = false),
          StructField("columns", StringType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.expire_versions(table, retain_versions => 2,
    * retain_hours => -1.0)` — snapshot expiration WITHOUT a rewrite
    * ([[graft.ops.Sinks.expireVersions]], the Delta VACUUM / Iceberg
    * expire_snapshots spelling): unlink retired version dirs keeping
    * the live version, the newest `retain_versions` below it, the
    * time window, and every tagged version — pure metadata, an
    * operator never pays an O(table) rewrite just to expire history
    * (that coupling was `compact`'s). Streaming-batch stamps and COPY
    * INTO receipts fold into `_PROPS` before any deletion.
    */
  final class ExpireVersions(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "expire_versions"
    override def description(): String =
      "unlink retired snapshots past the retention window (no rewrite; " +
        "tags and the live version always survive)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("retain_versions", IntegerType).defaultValue("-1")
        .comment("versions below the live one to keep time-travelable " +
          "(-1 = the table's declared graft.retain.versions, else 2)").build(),
      ProcedureParameter.in("retain_hours", DoubleType).defaultValue("-2.0")
        .comment("keep any version committed within this window " +
          "(-1 = count-based only; -2 = the table's declared " +
          "graft.retain.hours, else count-based)").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val root = resolveRoot(table)
      // the sentinel default resolves the DECLARED policy here (not in
      // the library, whose own no-policy fallback is 0): this door's
      // historical no-argument behavior keeps 2 versions, and a table
      // that declares graft.retain.* overrides that — while an explicit
      // argument overrides the declaration
      val (polV, polH) = graft.ops.TableProps.retainPolicy(root)
      val retain =
        if (input.getInt(1) >= 0) input.getInt(1) else polV.getOrElse(2)
      val retainHours =
        if (input.getDouble(2) >= -1.0) input.getDouble(2)
        else polH.getOrElse(-1.0)
      val evicted = graft.ops.Sinks.expireVersions(
        SparkSession.active, root, retain, retainHours)
      val live = graft.ops.Sinks.currentVersion(root).getOrElse(0L)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(table),
            evicted.size.toLong, live))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("n_expired", LongType, nullable = false),
          StructField("live_version", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.mview_create(source, target, dims, sum_cols, keys)` — the
    * SQL door to B111's incrementally-maintained materialized views:
    * materialize `GROUP BY dims` (n_rows + sum_/nn_ per sum column)
    * over the source's CURRENT version into a NEW catalog table, and
    * STORE the definition (dims, sum columns, source, row-identity
    * keys) in the MV's `_PROPS` — so refresh needs only the target
    * name. The MV is a normal versioned table: query, time travel,
    * retention all apply.
    */
  final class MviewCreate(resolveRoot: String => String,
      resolveNew: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "mview_create"
    override def description(): String =
      "materialize a GROUP BY view of a table into a new catalog table " +
        "and store its definition for O(delta) refresh"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("source", StringType)
        .comment("source table in this catalog").build(),
      ProcedureParameter.in("target", StringType)
        .comment("NEW table name for the materialized view").build(),
      ProcedureParameter.in("dims", StringType)
        .comment("comma-separated GROUP BY columns").build(),
      ProcedureParameter.in("keys", StringType)
        .comment("the SOURCE table's row-identity columns (drives the " +
          "change-feed refresh)").build(),
      ProcedureParameter.in("sum_cols", StringType).defaultValue("''")
        .comment("comma-separated columns to maintain sums for").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      def list(i: Int) = input.getUTF8String(i).toString.split(",")
        .map(_.trim).filter(_.nonEmpty).toSeq
      val source = input.getUTF8String(0).toString
      val target = input.getUTF8String(1).toString
      val (dims, keys, sums) = (list(2), list(3), list(4))
      require(dims.nonEmpty, "dims must name at least one column")
      require(keys.nonEmpty, "keys must name the source row identity")
      val srcRoot = resolveRoot(source)
      val mvRoot = resolveNew(target)
      val v = graft.ops.Mview.create(SparkSession.active, srcRoot, mvRoot,
        dims, sums)
      graft.ops.TableProps.update(mvRoot)(_ +
        ("graft.mview.source" -> srcRoot) +
        ("graft.mview.dims" -> dims.mkString(",")) +
        ("graft.mview.sums" -> sums.mkString(",")) +
        ("graft.mview.keys" -> keys.mkString(",")))
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(target), v))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("mv_version", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.mview_refresh(target)` — advance the MV to its source's
    * current version via the stored definition: O(changed rows) through
    * the change feed when the bookkeeping allows, full recompute
    * fallback otherwise (never a wrong answer).
    */
  final class MviewRefresh(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "mview_refresh"
    override def description(): String =
      "advance a materialized view to its source's current version " +
        "(O(delta) via the change feed; full recompute fallback)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("target", StringType)
        .comment("the materialized-view table (created by mview_create)")
        .build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val target = input.getUTF8String(0).toString
      val mvRoot = resolveRoot(target)
      val props = graft.ops.TableProps.load(mvRoot)
      def need(k: String) = props.getOrElse(s"graft.mview.$k",
        throw new IllegalArgumentException(
          s"$target carries no stored materialized-view definition " +
            s"(graft.mview.$k) — was it created by CALL system.mview_create?"))
      def listOf(k: String) = need(k).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val v = graft.ops.Mview.refresh(SparkSession.active, need("source"),
        mvRoot, listOf("keys"), listOf("dims"),
        props.get("graft.mview.sums").toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(target), v))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("mv_version", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.ndv(table, columns => 'a,b')` — metadata-served distinct
    * counts ([[graft.ops.Stats.ndv]]): merge the per-file HLL sketches
    * `'graft.ndv.columns'` maintains into one estimate per column, zero
    * data files opened; exactly the full scan's `hll_sketch_agg`
    * number (register merge). Defaults to every declared NDV column.
    */
  final class Ndv(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "ndv"
    override def description(): String =
      "metadata-served distinct-count estimates from the per-file HLL " +
        "sketches 'graft.ndv.columns' maintains (zero data files opened)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("columns", StringType).defaultValue("''")
        .comment("comma-separated columns (default: every declared " +
          "'graft.ndv.columns' column)").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val root = resolveRoot(table)
      val asked = input.getUTF8String(1).toString.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
      val cols =
        if (asked.nonEmpty) asked else graft.ops.TableProps.ndvColumns(root)
      require(cols.nonEmpty,
        s"$table declares no 'graft.ndv.columns' — pass columns => 'a,b'")
      val ests = graft.ops.Stats.ndv(SparkSession.active, root, cols)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          ests.map { case (c, n) =>
            InternalRow(UTF8String.fromString(c), n) }.toArray
        override def readSchema(): StructType = StructType(Seq(
          StructField("column", StringType, nullable = false),
          StructField("ndv", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.purge(table, where => '<pred>')` — right-to-erasure
    * ([[graft.ops.Sinks.purgeWhere]]): physically remove matching rows
    * from the live version AND all history (touched files rewritten
    * from reconciled content, clean files carried, every older version
    * unlinked, no change feed emitted), then PROVE it with a raw scan
    * before returning. Refuses while tags pin history or equality
    * deletes are pending (their tombstones carry keys); zero-copy
    * clones/branches are separate roots — purge them explicitly.
    */
  final class Purge(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "purge"
    override def description(): String =
      "physically erase matching rows from the live version AND all " +
        "history, verified by a raw scan (GDPR right-to-erasure)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("where", StringType)
        .comment("predicate selecting the rows to erase").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val where = input.getUTF8String(1).toString
      val (purged, rewritten, expired, live) =
        graft.ops.Sinks.purgeWhere(SparkSession.active, resolveRoot(table), where)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(table), purged,
            rewritten.toLong, expired.toLong, live))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("rows_purged", LongType, nullable = false),
          StructField("files_rewritten", LongType, nullable = false),
          StructField("versions_expired", LongType, nullable = false),
          StructField("live_version", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.bpe_train(source, text_col, n_merges, target)` — train a
    * BPE merge table over a corpus column ([[graft.ops.Bpe.train]]:
    * word-level, every iteration vocab-scale, merge application
    * engine-portable) and PUBLISH it as a new catalog table
    * (rank, pair, merged, weight) — the artifact a tokenizer ships,
    * version-controlled like any other table.
    */
  final class BpeTrain(resolveRoot: String => String,
      resolveNew: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "bpe_train"
    override def description(): String =
      "train a word-level BPE merge table over a corpus column and " +
        "publish it as a new catalog table (rank, pair, merged, weight)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("source", StringType)
        .comment("corpus table in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("text_col", StringType)
        .comment("text column to train on").build(),
      ProcedureParameter.in("n_merges", IntegerType)
        .comment("number of greedy merges to learn").build(),
      ProcedureParameter.in("target", StringType)
        .comment("NEW table name for the merge table").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val source = input.getUTF8String(0).toString
      val textCol = input.getUTF8String(1).toString
      val nMerges = input.getInt(2)
      val target = input.getUTF8String(3).toString
      require(nMerges >= 1, s"n_merges must be positive, got $nMerges")
      val spark = SparkSession.active
      val srcRoot = resolveRoot(source)
      val dstRoot = resolveNew(target)
      val docs = graft.ops.Sinks.readCurrent(spark, srcRoot)
      require(docs.columns.exists(_.equalsIgnoreCase(textCol)),
        s"text column $textCol not in $source (${docs.columns.mkString(", ")})")
      val (merges, _) = graft.ops.Bpe.train(docs, textCol, nMerges)
      val learned = merges.count()
      val v = graft.ops.Sinks.publishVersioned(merges.orderBy("rank"),
        dstRoot, None, opTag = "bpe-train")
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(target), v, learned))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("version", LongType, nullable = false),
          StructField("n_merges", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.eq_checkpoint(table)` — fold the equality-delete sidecars
    * as an O(metadata) commit ([[graft.ops.Sinks.eqCheckpoint]]): one
    * part each, dead tombstones swept, maintenance exited when nothing
    * remains pending. No data file is read or written.
    */
  final class EqCheckpoint(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "eq_checkpoint"
    override def description(): String =
      "fold the equality-delete sidecars (dead tombstones swept) as an " +
        "O(metadata) commit — no data rewrite"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name in this catalog ('tbl' or 'ns.tbl')").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val root = resolveRoot(table)
      val spark = SparkSession.active
      val v = graft.ops.Sinks.eqCheckpoint(spark, root)
      val live = graft.ops.Sinks.versionPath(root, v)
      val pending =
        if (graft.ops.EqDel.exists(live))
          graft.ops.EqDel.pending(spark, live).count()
        else 0L
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(table), v, pending))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("new_version", LongType, nullable = false),
          StructField("pending_tombstones", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.eq_upsert(table, source, keys, op_col => '', dedupe_by
    * => '')` — the B170 blind-upsert SQL door: apply one CDC batch (a
    * registered view / temp view named by `source`) to `table` as an
    * equality-delete commit — new data files + key tombstones, O(batch),
    * NO table read ([[graft.ops.EqDel.applyCdc]]). Rows whose `op_col`
    * equals 'delete' tombstone without replacing; `dedupe_by` ordering
    * columns collapse a multi-op batch to its last row per key first
    * (and are dropped from what lands). Readers reconcile at scan time;
    * `CALL system.compact` folds the tombstones into files.
    */
  final class EqUpsert(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "eq_upsert"
    override def description(): String =
      "apply a CDC batch as a blind equality-delete upsert commit " +
        "(O(batch), no table read; readers reconcile, compaction folds)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("source", StringType)
        .comment("view / temp view holding the CDC batch").build(),
      ProcedureParameter.in("keys", StringType)
        .comment("comma-separated upsert key columns").build(),
      ProcedureParameter.in("op_col", StringType).defaultValue("''")
        .comment("optional column whose 'delete' rows tombstone without " +
          "replacing").build(),
      ProcedureParameter.in("dedupe_by", StringType).defaultValue("''")
        .comment("optional ordering columns: collapse the batch to its " +
          "last row per key first").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val source = input.getUTF8String(1).toString
      def csv(i: Int): Seq[String] = input.getUTF8String(i).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val keys = csv(2)
      require(keys.nonEmpty, "keys must name at least one column")
      val opCol = csv(3).headOption
      val dedupeBy = csv(4)
      val root = resolveRoot(table)
      val spark = SparkSession.active
      val batch = spark.table(source)
      val v = graft.ops.EqDel.applyCdc(batch, root, keys, opCol, dedupeBy)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(table), v))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("new_version", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.zorder(table, columns, bits => 16, target_mb => 128)` —
    * the layout-clustering SQL door ([[graft.ops.Sinks.zorderTable]]):
    * rewrite the live version clustered by the Z-order interleave of
    * the named dimensions and re-annotate stats over them in the SAME
    * commit, so predicates on any clustered dimension file-prune right
    * after the CALL. DV purge / column-mapping convergence follow the
    * compaction contract (the rewrite IS the materialization).
    */
  final class Zorder(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "zorder"
    override def description(): String =
      "rewrite the live version Z-order-clustered by the given columns " +
        "and re-annotate file-skipping stats over them in the same commit"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("columns", StringType)
        .comment("comma-separated z-order dimensions (>= 2, non-partition, " +
          "numeric/date/timestamp)").build(),
      ProcedureParameter.in("bits", IntegerType).defaultValue("16")
        .comment("grid bits per dimension (clamped so k*bits <= 63)").build(),
      ProcedureParameter.in("target_mb", IntegerType).defaultValue("128")
        .comment("target output file size, megabytes").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val cols = input.getUTF8String(1).toString.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
      val bits = input.getInt(2)
      val targetMb = input.getInt(3)
      require(bits > 0, s"bits must be positive, got $bits")
      require(targetMb > 0, s"target_mb must be positive, got $targetMb")
      val root = resolveRoot(table)
      val v = graft.ops.Sinks.zorderTable(SparkSession.active, root, cols,
        bits, targetMb.toLong * 1024 * 1024)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(table), v,
            UTF8String.fromString(cols.mkString(","))))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("new_version", LongType, nullable = false),
          StructField("columns", StringType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.tag(table, name, version => -1)` — create or move a named
    * snapshot tag ([[graft.ops.Sinks.tagVersion]]): metadata-only,
    * resolves in `VERSION AS OF '<name>'`, and pins its version against
    * compaction's retention vacuum until dropped (the Iceberg tag
    * analog). `version => -1` (the default) tags the live version.
    */
  final class Tag(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "tag"
    override def description(): String =
      "pin a retained version under a name for VERSION AS OF '<name>' " +
        "and against retention vacuum"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("name", StringType)
        .comment("tag name ([A-Za-z0-9._-]+, not all digits)").build(),
      ProcedureParameter.in("version", LongType).defaultValue("-1")
        .comment("retained version to pin; -1 = the live version").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val tag = input.getUTF8String(1).toString
      val root = resolveRoot(table)
      val v = input.getLong(2) match {
        case -1L => graft.ops.Sinks.currentVersion(root).getOrElse(
          throw new IllegalStateException(
            s"tag '$tag': no published version under $table to pin"))
        case v0  => v0
      }
      graft.ops.Sinks.tagVersion(root, tag, v)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(table),
            UTF8String.fromString(tag), v))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("tag", StringType, nullable = false),
          StructField("version", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.drop_tag(table, name)` — drop a snapshot tag; the pinned
    * version returns to normal retention at the next compaction.
    * Idempotent.
    */
  final class DropTag(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "drop_tag"
    override def description(): String =
      "drop a snapshot tag (releases its version back to retention)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("name", StringType)
        .comment("tag name to drop").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val tag = input.getUTF8String(1).toString
      graft.ops.Sinks.dropTag(resolveRoot(table), tag)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(table),
            UTF8String.fromString(tag)))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("tag", StringType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.restore(table, version)` — rewind the table to a retained
    * snapshot by republishing it as a NEW version
    * ([[graft.ops.Sinks.restoreVersion]]: hardlinked, O(metadata), an
    * ordinary OCC commit — the bad versions stay time-travelable until
    * vacuumed). The `RESTORE TABLE ... TO VERSION AS OF` analog.
    */
  final class Restore(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "restore"
    override def description(): String =
      "republish a retained version as the new current (time-travel rewind)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("version", LongType)
        .comment("retained version to restore to").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val version = input.getLong(1)
      val root = resolveRoot(table)
      val v = graft.ops.Sinks.restoreVersion(SparkSession.active, root, version)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(table), v))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("new_version", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.repartition_table(table, partition_by)` — B134 partition
    * evolution ([[graft.ops.Sinks.repartitionTable]]): re-lay the live
    * version under a new (or no) partition spec as one OCC commit;
    * history keeps its own layouts via version-local `_PSPEC` stamps.
    * `partition_by` is a comma-separated column list; '' unpartitions.
    */
  final class RepartitionTable(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "repartition_table"
    override def description(): String =
      "re-lay the live version under a new partition spec (one OCC commit)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("partition_by", StringType)
        .comment("comma-separated partition columns and/or hidden " +
          "transforms (hour(c), day(c), month(c), year(c), bucket(n, c), " +
          "truncate(n, c)); '' to unpartition").build(),
      ProcedureParameter.in("metadata_only", BooleanType).defaultValue("false")
        .comment("true: record the new spec for future writes only " +
          "(Iceberg-style, zero data movement); false: rewrite the live " +
          "version under the new spec").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      // paren-aware split: 'bucket(8, id)' / 'truncate(4, code)' carry a
      // comma INSIDE the transform (round-12 advisor finding — a naive
      // split made every parameterized transform unreachable from SQL)
      val cols = graft.ops.Transforms.splitSpecList(
        input.getUTF8String(1).toString)
      val metadataOnly = input.getBoolean(2)
      val root = resolveRoot(table)
      val v = graft.ops.Sinks.repartitionTable(SparkSession.active, root, cols,
        metadataOnly)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(table), v))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("new_version", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.copy_into(table, source, format => 'parquet')` — B137
    * idempotent batch file ingestion ([[graft.ops.Sinks.copyInto]]):
    * every not-yet-ingested file under `source` lands as one commit,
    * exactly once across re-runs/crashes/vacuums. The CALL form
    * requires the table to exist (CREATE TABLE first); the Scala API
    * also bootstraps absent tables.
    */
  final class CopyInto(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "copy_into"
    override def description(): String =
      "idempotently ingest new files from a directory as one commit"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("existing table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("source", StringType)
        .comment("directory whose data files to ingest").build(),
      ProcedureParameter.in("format", StringType).defaultValue("'parquet'")
        .comment("file format: parquet, csv, json, orc").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val source = input.getUTF8String(1).toString
      val format = input.getUTF8String(2).toString
      val root = resolveRoot(table)
      val (v, ingested) = graft.ops.Sinks.copyInto(
        SparkSession.active, root, source, format)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(table), v, ingested.size.toLong))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("version", LongType, nullable = false),
          StructField("files_ingested", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.ann_split(table, factor => 2.0)` — IVF index maintenance
    * from SQL ([[graft.ops.AnnIndex.splitBuckets]]): split buckets
    * holding more than `factor` × the mean row count, O(hot buckets)
    * per commit. Returns `(table, version, n_buckets)`.
    */
  final class AnnSplit(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "ann_split"
    override def description(): String =
      "split oversized IVF index buckets in place (O(hot buckets))"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("ANN index table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("factor", DoubleType).defaultValue("2.0")
        .comment("split any bucket larger than factor x the mean").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val factor = input.getDouble(1)
      val root = resolveRoot(table)
      val spark = SparkSession.active
      val v = graft.ops.AnnIndex.splitBuckets(spark, root, factor)
      val n = graft.ops.Sinks.readCurrent(spark, root)
        .select("bucket").distinct().count()
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(table), v, n))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("version", LongType, nullable = false),
          StructField("n_buckets", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.txn_publish(tables, sqls, modes => '')` — the SQL door to
    * multi-table TRANSACTIONS (B142, [[graft.ops.Txn.publishAll]]):
    * commit N tables so readers observe ALL the new versions or NONE —
    * the bronze→silver consistency story, reachable from pure SQL:
    *
    * {{{
    *   CALL graft.system.txn_publish(
    *     tables => 'bronze,silver',
    *     sqls   => 'SELECT * FROM staging_raw
    *                ;; SELECT k, sum(amt) AS total FROM graft.bronze GROUP BY k',
    *     modes  => 'append,publish')
    * }}}
    *
    * `tables` is comma-separated; `sqls` carries one SELECT per table,
    * separated by `;;` (a bare `;` stays usable inside the statements);
    * `modes` gives each write's shape — `publish` (full new version,
    * default) or `append` (O(delta) linked append; the table must
    * exist). Each target that exists is OCC-expected at its LIVE
    * version as of this call (a concurrent commit aborts the whole
    * transaction with nothing visible — recompute and re-CALL);
    * a target that doesn't exist yet is created, in the parent
    * namespace which must. The statements are ordinary Spark SQL and
    * may read OTHER graft tables (the medallion hop reads bronze while
    * writing silver — statement-level snapshot isolation comes from the
    * resolved plans, same as every reader). Returns one `(table,
    * version)` row per write. All-or-nothing is the commit-marker
    * protocol of [[graft.ops.Txn]] — the crash matrix the
    * CommitProtocolSpec pins applies to this door verbatim.
    */
  final class TxnPublish(resolveRoot: String => String,
      resolveNewRoot: String => String,
      tableExists: String => Boolean)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "txn_publish"
    override def description(): String =
      "commit SELECT results into N tables atomically (all-or-nothing)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("tables", StringType)
        .comment("comma-separated table names in this catalog").build(),
      ProcedureParameter.in("sqls", StringType)
        .comment("one SELECT per table, separated by ';;'").build(),
      ProcedureParameter.in("modes", StringType).defaultValue("''")
        .comment("per-table 'publish' (default) or 'append', comma-separated").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val tables = input.getUTF8String(0).toString.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
      val sqls = input.getUTF8String(1).toString.split(";;").map(_.trim)
        .filter(_.nonEmpty).toSeq
      val modesRaw = input.getUTF8String(2).toString.trim
      val modes =
        if (modesRaw.isEmpty) Seq.fill(tables.size)("publish")
        else modesRaw.split(",").map(_.trim.toLowerCase).toSeq
      require(tables.nonEmpty, "txn_publish: no tables given")
      require(sqls.size == tables.size,
        s"txn_publish: ${tables.size} tables but ${sqls.size} statements " +
          "(separate statements with ';;')")
      require(modes.size == tables.size,
        s"txn_publish: ${tables.size} tables but ${modes.size} modes")
      modes.foreach(m => require(m == "publish" || m == "append",
        s"txn_publish: unknown mode '$m' (publish|append)"))
      val writes = tables.lazyZip(sqls).lazyZip(modes).map { (t, sql, mode) =>
        val exists = tableExists(t)
        require(mode == "publish" || exists,
          s"txn_publish: append mode requires existing table $t")
        val root = if (exists) resolveRoot(t) else resolveNewRoot(t)
        val expected = if (exists) graft.ops.Sinks.currentVersion(root) else None
        graft.ops.TxnWrite(root, spark.sql(sql), expected,
          linked = mode == "append", emitFeed = mode == "append")
      }.toSeq
      val committed = graft.ops.Txn.publishAll(writes)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          writes.map(w => InternalRow(
            UTF8String.fromString(tables(writes.indexOf(w))),
            committed(w.root))).toArray
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("version", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.clone(source, target, version => -1)` — B131 zero-copy
    * CLONE ([[graft.ops.Sinks.cloneTable]]): publish the source's live
    * (or as-of) version as v0 of a brand-new table, hardlink carry, no
    * data movement. `resolveNewRoot` applies the CREATE-side identifier
    * guards (target must not exist, parent namespace must).
    */
  /** `system.branch(table, name)` — write-audit-publish branching
    * ([[graft.ops.Sinks.branchTable]]): zero-copy-branch the live
    * snapshot into table `<table>__<name>`, write and audit there,
    * then `system.merge_branch` fast-forwards the base — or just DROP
    * the branch table to abandon. The branch is an ordinary catalog
    * table (all DML/expectations work on it).
    */
  final class Branch(resolveRoot: String => String,
      resolveNewRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "branch"
    override def description(): String =
      "branch the live snapshot into <table>__<name> for write-audit-publish"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("existing table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("name", StringType)
        .comment("branch name ([A-Za-z0-9_]+); branch table is <table>__<name>").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val branch = input.getUTF8String(1).toString
      require(branch.nonEmpty && branch.forall(c => c.isLetterOrDigit || c == '_'),
        s"branch name must be [A-Za-z0-9_]+, got '$branch'")
      val branchTable = s"${table}__$branch"
      val srcRoot = resolveRoot(table)
      val dstRoot = resolveNewRoot(branchTable)
      val baseV = graft.ops.Sinks.branchTable(SparkSession.active, srcRoot, dstRoot)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(table),
            UTF8String.fromString(branchTable), baseV))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("branch_table", StringType, nullable = false),
          StructField("base_version", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.merge_branch(table)` — fast-forward a branch's base to the
    * branch's live snapshot ([[graft.ops.Sinks.mergeBranch]]): one OCC
    * hardlink-adoption commit, refused if the base advanced past the
    * branch point. The branch table is left in place (DROP it when
    * done — it refuses a second merge by the same staleness rule).
    */
  final class MergeBranch(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "merge_branch"
    override def description(): String =
      "fast-forward the branch's base table to the branch's live snapshot"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("branch table name created by system.branch").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val branchTable = input.getUTF8String(0).toString
      val v = graft.ops.Sinks.mergeBranch(SparkSession.active,
        resolveRoot(branchTable))
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(branchTable), v))
        override def readSchema(): StructType = StructType(Seq(
          StructField("branch_table", StringType, nullable = false),
          StructField("base_new_version", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.neardup_build(table, index, n => 3, bands => 4,
    * rows_per_band => 4)` — build the persisted near-dup index
    * ([[graft.ops.NearDupIndex.build]]) over a catalog table's
    * `(doc_id, text)` columns into a NEW index table. The SQL door to
    * B152's build path; `neardup_append` grows it O(delta) and the
    * `neardup_candidates` TVF probes it.
    */
  final class NearDupBuild(resolveRoot: String => String,
      resolveNewRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "neardup_build"
    override def description(): String =
      "build a persisted MinHash-LSH near-dup index over a table's (doc_id, text)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("source docs table with doc_id and text columns").build(),
      ProcedureParameter.in("index", StringType)
        .comment("new index table name; must not exist").build(),
      ProcedureParameter.in("n", IntegerType).defaultValue("3")
        .comment("shingle width in tokens").build(),
      ProcedureParameter.in("bands", IntegerType).defaultValue("4")
        .comment("LSH bands").build(),
      ProcedureParameter.in("rows_per_band", IntegerType).defaultValue("4")
        .comment("signature rows per band").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val index = input.getUTF8String(1).toString
      val spark = SparkSession.active
      val v = graft.ops.NearDupIndex.build(spark,
        graft.ops.Sinks.readCurrent(spark, resolveRoot(table)),
        resolveNewRoot(index),
        n = input.getInt(2), bands = input.getInt(3),
        rowsPerBand = input.getInt(4))
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(index), v))
        override def readSchema(): StructType = StructType(Seq(
          StructField("index", StringType, nullable = false),
          StructField("version", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  /** `system.neardup_append(index, table)` — append a batch table's
    * banded rows to the index O(delta)
    * ([[graft.ops.NearDupIndex.append]]).
    */
  final class NearDupAppend(resolveRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "neardup_append"
    override def description(): String =
      "append a docs table's rows to a near-dup index O(delta)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("index", StringType)
        .comment("index table created by neardup_build").build(),
      ProcedureParameter.in("table", StringType)
        .comment("docs table with the batch to index").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val index = input.getUTF8String(0).toString
      val table = input.getUTF8String(1).toString
      val spark = SparkSession.active
      val v = graft.ops.NearDupIndex.append(spark,
        graft.ops.Sinks.readCurrent(spark, resolveRoot(table)),
        resolveRoot(index))
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(index), v))
        override def readSchema(): StructType = StructType(Seq(
          StructField("index", StringType, nullable = false),
          StructField("version", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }

  final class Clone(resolveRoot: String => String,
      resolveNewRoot: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "clone"
    override def description(): String =
      "zero-copy clone of a table's live (or as-of) version into a new table"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("source", StringType)
        .comment("existing table name in this catalog ('tbl' or 'ns.tbl')").build(),
      ProcedureParameter.in("target", StringType)
        .comment("new table name in this catalog; must not exist").build(),
      ProcedureParameter.in("version", LongType).defaultValue("-1")
        .comment("source version to clone (-1 = live version)").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val source = input.getUTF8String(0).toString
      val target = input.getUTF8String(1).toString
      val asOf = input.getLong(2) match { case -1L => None; case v => Some(v) }
      val srcRoot = resolveRoot(source)
      val dstRoot = resolveNewRoot(target)
      val v = graft.ops.Sinks.cloneTable(SparkSession.active, srcRoot, dstRoot, asOf)
      val result: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(target), v))
        override def readSchema(): StructType = StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("version", LongType, nullable = false)))
      }
      java.util.Collections.singletonList(result).iterator()
    }
  }
}
