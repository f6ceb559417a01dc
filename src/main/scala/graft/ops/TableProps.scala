package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.types.StructType

/** Table-level properties for the [[Sinks]] versioned layout, persisted
  * as a `_PROPS` sidecar at the table root (a reserved layout name — it
  * can never collide with a table and moves or dies with the table's
  * directory on RENAME/DROP). Two property families ride here:
  *
  *  - `check.<name>` — SQL CHECK constraints ([[graft.catalog.GraftCheck]])
  *  - `graft.partition` — the table's partition columns as a DDL string
  *    (e.g. `event_type STRING`), set once at CREATE TABLE and never
  *    altered: [[Sinks.publishVersioned]] reads it so EVERY publish —
  *    SQL INSERT, DML commands, merges, ALTER, compaction — lays the new
  *    version out Hive-partitioned without call-site cooperation, and
  *    readers pin the declared column types so directory-name type
  *    inference can never rewrite a string column into a date/int.
  */
private[graft] object TableProps {

  /** Partition spec property: DDL of the partition columns, in declared
    * partition order.
    */
  val PartitionKey = "graft.partition"

  /** Auto-collected skipping statistics (`'graft.stats.columns' =
    * 'c1,c2'`): EVERY commit through either staging funnel — SQL
    * INSERT/CTAS/DML, library publishes and appends, the streaming
    * sink — annotates the `_stats` footer sidecar for these columns
    * without call-site cooperation, the Delta/Iceberg
    * collect-stats-inside-the-commit behavior. Without it a table is
    * only skippable while callers remember to pass `statsCols` (or
    * retrofit with `CALL system.annotate_stats`); with it the sidecar
    * can never go stale. Columns are comma-separated LOGICAL names; a
    * named column missing from a footer degrades to `has_stats=false`
    * (kept-always), never an error.
    */
  val StatsKey = "graft.stats.columns"

  /** The declared auto-stats columns of `root` (empty = none). */
  def statsColumns(root: String): Seq[String] =
    load(root).get(StatsKey).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** Declarative point-lookup index (`'graft.bloom.columns' = 'c1,c2'`):
    * the B123 `_bloom` sidecar becomes a maintained property of the
    * table instead of a one-shot `CALL system.bloom_index` artifact —
    * EVERY commit through either staging funnel annotates the staged
    * delta's files, and compaction REBUILDS the sidecar over the
    * rewritten files instead of dropping it (pre-round-14, any full
    * rewrite silently demoted point lookups to full scans until an
    * operator remembered the CALL). Columns are comma-separated LOGICAL
    * names, restricted to the bloom-indexable domain (string/integral —
    * [[Bloom.annotate]]'s canonicalization contract), validated at
    * CREATE/ALTER so a typo or an unindexable type fails loudly.
    */
  val BloomKey = "graft.bloom.columns"

  /** The declared auto-bloom columns of `root` (empty = none). */
  def bloomColumns(root: String): Seq[String] =
    load(root).get(BloomKey).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** Declarative clustering key (`'graft.cluster.columns' = 'c1,c2'`):
    * `CALL system.compact` re-clusters the rewrite by THESE columns —
    * range-partitioned + sorted for one column, normalized Z-order
    * ([[Layout.zorderN]]) for several — instead of by whatever columns
    * happen to carry stats. Makes layout a retained property of the
    * table: maintenance can run from a scheduler with no per-call
    * arguments and never flatten a Z-ordered table back to insertion
    * order. Cluster columns are implicitly stats-annotated on every
    * commit (clustering exists to make min/max pruning effective;
    * stats that don't cover the clustering key would waste the layout).
    */
  val ClusterKey = "graft.cluster.columns"

  /** The declared clustering columns of `root` (empty = none). */
  def clusterColumns(root: String): Seq[String] =
    load(root).get(ClusterKey).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** Retention policy (`'graft.retain.versions' = '3'` /
    * `'graft.retain.hours' = '168'`): the table declares its own
    * time-travel window, and `CALL system.expire_versions(t)` /
    * `CALL system.compact(t)` with no retention arguments honor it —
    * per-table policy instead of per-call arguments, so a fleet-wide
    * maintenance job needs no table-specific configuration. Explicit
    * CALL arguments still override (the operator's hand wins over the
    * declaration); tagged versions stay pinned regardless.
    */
  /** Declarative NDV sketches (`'graft.ndv.columns' = 'c1,c2'`): every
    * commit's stats annotation ALSO records a per-file Datasketches HLL
    * sketch of each declared column, and [[Stats.ndv]] / `CALL
    * system.ndv` merge them into a distinct-count estimate at metadata
    * scale — exactly the number a full scan's `hll_sketch_agg` returns
    * (register merge is the same operation). Opt-in because the sketch
    * rides the per-commit exact data pass (one column-pruned read of
    * the delta). Sketchable domain: string, binary, integer family;
    * validated at CREATE/ALTER.
    */
  val NdvKey = "graft.ndv.columns"

  /** The declared NDV-sketch columns of `root` (empty = none). */
  def ndvColumns(root: String): Seq[String] =
    load(root).get(NdvKey).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** Declared CBO histogram columns (`'graft.histogram.columns'`,
    * round-16): the per-commit exact data pass records per-file
    * equi-height quantile boundaries for each, and
    * [[graft.catalog.CboStats]] merges them into a table-level
    * equi-height histogram served through the scan's column statistics
    * — what lets Spark's FilterEstimation see SKEW (an equality
    * predicate on a heavy value estimates by the bins it spans, not by
    * rows/ndv). Numeric family only; validated at CREATE/ALTER.
    */
  val HistogramKey = "graft.histogram.columns"

  /** The declared histogram columns of `root` (empty = none). */
  def histogramColumns(root: String): Seq[String] =
    load(root).get(HistogramKey).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  val RetainVersionsKey = "graft.retain.versions"
  val RetainHoursKey = "graft.retain.hours"

  /** Declared retention: (versions, hours), each None when unset. */
  def retainPolicy(root: String): (Option[Int], Option[Double]) = {
    val p = load(root)
    (p.get(RetainVersionsKey).flatMap(_.trim.toIntOption),
      p.get(RetainHoursKey).flatMap(_.trim.toDoubleOption))
  }

  /** Optimized-write switch (`'graft.write.distribute' = 'true'`): a
    * partitioned write repartitions by the partition columns first, so
    * each partition value is written by ONE task — one file per value
    * per commit instead of (tasks × values). The Delta optimized-write
    * analog; at 100 TB the (tasks × values) small-file explosion is the
    * difference between a listable table and a dead one. Opt-in: the
    * extra shuffle costs one pass, and a table with few, HOT partition
    * values would serialize on single tasks — the trade is the
    * operator's to make per table.
    */
  val DistributeKey = "graft.write.distribute"

  /** Write-time clustering switch (`'graft.cluster.write' = 'true'`,
    * round-14): every commit's STAGED DELTA range-clusters by
    * (partition columns ++ the declared clustering key) before it
    * lands, so the files written BETWEEN compactions are range-
    * skippable from the moment they commit — without it, a day of
    * appends scans until the next maintenance pass. Opt-in (one delta
    * shuffle per commit); inert without 'graft.cluster.columns'; the
    * explicit partition count is omitted so AQE coalesces small deltas
    * into few files instead of shuffle.partitions slivers. Compaction
    * remains the true re-lay (multi-dimensional Z-order for several
    * cluster columns) — write-time clustering covers the gap.
    */
  val ClusterWriteKey = "graft.cluster.write"

  /** True iff `root` opted into write-time clustering. */
  def clusterWrites(root: String): Boolean =
    load(root).get(ClusterWriteKey).exists(_.equalsIgnoreCase("true"))

  /** DML routing switch (`'graft.dml.mode' = 'mor'`): route
    * UPDATE/DELETE/MERGE merge-on-read (deletion vectors) instead of
    * copy-on-write file rewrites ([[graft.catalog.GraftDml]]).
    */
  val DmlModeKey = "graft.dml.mode"

  /** Merge-door schema evolution opt-in (`'graft.schema.autoMerge' =
    * 'true'`): every MERGE INTO the table behaves as if it carried the
    * explicit `WITH SCHEMA EVOLUTION` clause — source-only columns
    * auto-ADD (metadata-only) before the merge. Without the property,
    * evolution still happens when the statement spells the clause.
    */
  val AutoMergeKey = "graft.schema.automerge"

  /** Behavior-bearing `graft.*` table properties — the ONE list both
    * CREATE TABLE (persist at declaration) and ALTER TABLE SET/UNSET
    * (mutate later) accept, so a property one door honors can never be
    * silently dropped by the other (round-12 advisor finding: a table
    * declared MOR at CREATE ran copy-on-write without warning).
    */
  def behaviorKeys: Set[String] = Set(DmlModeKey, DistributeKey, StatsKey, NdvKey,
    BloomKey, ClusterKey, RetainVersionsKey, RetainHoursKey, ClusterWriteKey,
    AutoMergeKey, HistogramKey)

  /** True iff `root` opted every MERGE into automatic schema evolution. */
  def autoMergeSchema(root: String): Boolean =
    load(root).get(AutoMergeKey).exists(_.equalsIgnoreCase("true"))

  /** True iff `root` opted into distributed partitioned writes. */
  def distributeWrites(root: String): Boolean =
    load(root).get(DistributeKey).exists(_.equalsIgnoreCase("true"))

  private def propsPath(root: String) = Paths.get(root, "_PROPS")

  def load(root: String): Map[String, String] = {
    val p = propsPath(root)
    if (!Files.exists(p)) Map.empty
    else {
      val props = new java.util.Properties()
      val in = Files.newInputStream(p)
      try props.load(in) finally in.close()
      import scala.jdk.CollectionConverters._
      props.stringPropertyNames().asScala.map(k => k -> props.getProperty(k)).toMap
    }
  }

  /** Atomically transform the stored property map under the table's
    * commit lock — load, `f`, write, as one serialized step, so two
    * concurrent writers can never lose each other's update. `f` may
    * validate (scan the table) — holding the lock through validation
    * serializes it against committing writers.
    */
  def update(root: String)(f: Map[String, String] => Map[String, String]): Unit = {
    // same first step as publishVersioned: the lock file lives in the
    // table dir, which a declare-props-then-publish API caller has not
    // created yet
    Files.createDirectories(Paths.get(root))
    Sinks.withTableLock(root) { updateLocked(root)(f) }
  }

  /** The lock-free inner write — for callers ALREADY inside the table's
    * commit lock (re-entering is safe since round-18 but pointless):
    * [[Sinks]]'s commit path syncing the partition spec from a restored
    * version's `_PSPEC`. Everyone else goes through [[update]].
    */
  private[graft] def updateLocked(root: String)(
      f: Map[String, String] => Map[String, String]): Unit = {
    val props = f(load(root))
    val tmp = Paths.get(root, "_PROPS.tmp")
    val jp = new java.util.Properties()
    props.foreach { case (k, v) => jp.setProperty(k, v) }
    val out = Files.newOutputStream(tmp)
    try jp.store(out, null) finally out.close()
    Files.move(tmp, propsPath(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def store(root: String, props: Map[String, String]): Unit =
    update(root)(_ => props)

  /** The table's declared partition columns (schema fragment, in
    * partition order), if the table was created `PARTITIONED BY`.
    */
  def partitionSchema(root: String): Option[StructType] =
    load(root).get(PartitionKey).map(StructType.fromDDL)

  /** Partition column names, in declared order; empty when unpartitioned. */
  def partitionCols(root: String): Seq[String] =
    partitionSchema(root).map(_.fieldNames.toSeq).getOrElse(Nil)
}
