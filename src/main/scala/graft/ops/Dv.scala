package graft.ops

import java.nio.file.{Files, Paths}

import graft.io.Fs
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deletion vectors — merge-on-read DELETE (SURVEY §2B B135), the
  * Delta/Iceberg-v2 answer to the copy-on-write worst case. COW DML
  * (B114) scales with the FILES a predicate touches; a delete of 0.1%
  * of rows spread across every file still rewrites the whole table. A
  * deletion vector instead records the deleted row POSITIONS in a
  * `_dv` sidecar — one roaring-bitmap row per touched file
  * (`(file, bitmap)`, keyed by the file's version-dir-relative path;
  * [[Roaring]]) — and commits them with the data files carried
  * untouched by hardlink. Each MOR commit appends ONLY its own delta
  * bitmaps (prior parts carried by hardlink, OR-merged at read time),
  * so commit cost is O(matched rows), never the cumulative vector;
  * past a part-count threshold the pile folds into one part
  * ([[compactSidecar]]), the log-checkpoint analog. Zero data bytes
  * rewritten either way.
  *
  * Readers subtract the vector at scan time: [[Sinks.readDir]] (the
  * single funnel every Scala read, snapshot diff, CDC read, and
  * compaction flows through) filters on a codegen'd bitmap probe over
  * Spark's `_metadata` file/row-position columns ([[probe]] — zero
  * joins, zero Exchanges, no broadcast threshold to fall off), and
  * [[graft.plans.DvReadRule]] swaps the catalog's DSv2 relation for
  * the same subtracted plan, so SQL reads (current AND time travel)
  * see post-delete rows with no caller cooperation. Compaction reads through the same funnel, so `CALL
  * system.compact` IS the purge: the rewrite materializes survivors
  * and drops the sidecar.
  *
  * Every reader subtracts: [[Sinks.readDir]], the catalog rule, and
  * the stats/bloom pruned fast paths ([[subtract]] restricted to the
  * kept files — pruning stays conservative, a kept file whose matching
  * rows were MOR-deleted contributes nothing). SQL DELETE/UPDATE/MERGE
  * all route merge-on-read on a vectored table, so the only remaining
  * refusals are the inherently incompatible ones: a direct COW publish
  * over a vector ([[requireNone]] — raw touched-file reads would
  * resurrect rows), `_metadata` reads (the subtraction consumes them),
  * and rule-less sessions (the catalog refuses to serve). Metadata-only
  * `count(*)` stays exact as sidecar rows minus vector cardinality;
  * per-column metadata aggregates decline to the subtracted scan.
  *
  * Key encoding: the stored key is the URI-ENCODED subpath exactly as
  * Spark's `_metadata.file_path` reports it after the version-dir
  * prefix — build and apply use the same expression, so the encoding
  * cancels; hardlink carries (appends, restore, clone) preserve the
  * subpath, so carried entries stay exact. The version dir itself must
  * be URI-transparent ([[safeDir]]) or the MOR path refuses up front.
  */
object Dv {

  val Sidecar = "_dv"

  /** True iff version dir `dir` carries a non-empty deletion vector. */
  def exists(dir: String): Boolean = {
    val p = Paths.get(dir, Sidecar)
    Files.isDirectory(p) &&
      Fs.listDir(p).exists(_.getFileName.toString.endsWith(".parquet"))
  }

  /** The version-dir path must URI-encode to itself so the stored key
    * is exactly `file_path` minus a computable prefix.
    */
  private[graft] def safeDir(dir: String): Boolean =
    dir.matches("[A-Za-z0-9/._\\-]+")

  /** `_metadata.file_path` minus the `file:<dir>/` prefix — the stored
    * deletion-vector key for rows scanned from `dir`.
    */
  private[graft] def relKey(dir: String): Column =
    col("_metadata.file_path").substr(lit(s"file:$dir/".length + 1), lit(Int.MaxValue))

  /** The vector as positions — `(file, row_index)`, empty-typed when
    * absent. Storage is the v2 per-file roaring-bitmap encoding
    * ([[Roaring]]): one `(file, bitmap)` row per touched file per MOR
    * commit, OR-merged here at read time (deletes are monotone within a
    * lineage, so union is exact). The v1 row-per-position format is
    * still readable (pre-upgrade sidecars in cached warehouses); the
    * first MOR commit on such a table folds it to v2
    * ([[compactSidecar]]). Position expansion is the INSPECTION form
    * only (tests, CDC debugging) — the scan-time subtraction never
    * expands; it probes the compressed bitmaps directly ([[probe]]).
    */
  def vector(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    if (!exists(dir)) spark.emptyDataset[(String, Long)].toDF("file", "row_index")
    else {
      val raw = spark.read.parquet(s"$dir/$Sidecar")
      if (raw.columns.contains("row_index")) raw.select("file", "row_index")
      else raw.select("file", "bitmap").as[(String, Array[Byte])]
        .groupByKey(_._1)
        .flatMapGroups((f: String, it: Iterator[(String, Array[Byte])]) =>
          Roaring.positions(Roaring.unionAll(it.map(_._2))).map(p => (f, p)))
        .toDF("file", "row_index")
    }
  }

  /** Encode a `(file, row_index)` position delta as one `(file, bitmap)`
    * row per touched file — what a MOR commit appends to the sidecar.
    * One shuffle keyed by file; memory per group is O(file rows / 8)
    * worst case (the bitmap, not the position list — positions stream
    * into the builder).
    */
  private[graft] def deltaBitmaps(delta: DataFrame): DataFrame = {
    val spark = delta.sparkSession
    import spark.implicits._
    delta.select("file", "row_index").as[(String, Long)]
      .groupByKey(_._1)
      .mapGroups((f: String, it: Iterator[(String, Long)]) =>
        (f, Roaring.fromPositions(it.map(_._2))))
      .toDF("file", "bitmap")
  }

  /** Exact deleted-row count — bitmap cardinalities summed after the
    * per-file OR (never the sidecar ROW count, which is rows-per-commit
    * in v2).
    */
  def cardinality(spark: SparkSession, dir: String): Long = {
    import spark.implicits._
    if (!exists(dir)) 0L
    else {
      val raw = spark.read.parquet(s"$dir/$Sidecar")
      if (raw.columns.contains("row_index")) raw.count()
      else {
        val perFile = raw.select("file", "bitmap").as[(String, Array[Byte])]
          .groupByKey(_._1)
          .mapGroups((_, it) => Roaring.cardinality(Roaring.unionAll(it.map(_._2))))
        if (perFile.isEmpty) 0L else perFile.reduce(_ + _)
      }
    }
  }

  /** Fold a (possibly multi-part, possibly legacy-v1) `_dv` dir down to
    * ONE v2 part: read whatever formats are present, OR per file,
    * rewrite. Runs inside a writer-private STAGE dir only — the log-
    * checkpoint move that bounds reader-side part counts (amortized
    * O(1) per commit) and upgrades v1 sidecars on their first MOR
    * commit.
    */
  /** True iff this sidecar part file is the v1 row-per-position format
    * (driver-side footer read — metadata-scale).
    */
  private def isV1Part(spark: SparkSession, f: java.nio.file.Path): Boolean =
    spark.read.parquet(f.toString).schema.fieldNames.contains("row_index")

  private[graft] def compactSidecar(spark: SparkSession, stageDir: String): Unit = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dvDir = java.nio.file.Paths.get(stageDir, Sidecar)
    // the dir may hold BOTH formats mid-upgrade (carried v1 parts + a
    // staged v2 delta) — a single directory read would mis-infer; read
    // each format's part group separately and union as positions
    val parts = graft.io.Fs.listDir(dvDir)
      .filter(_.getFileName.toString.endsWith(".parquet"))
    val (v1, v2) = parts.partition(isV1Part(spark, _))
    val fromV1 =
      if (v1.isEmpty) spark.emptyDataset[(String, Long)].toDF("file", "row_index")
      else spark.read.parquet(v1.map(_.toString): _*).select("file", "row_index")
    val fromV2 =
      if (v2.isEmpty) spark.emptyDataset[(String, Long)].toDF("file", "row_index")
      else spark.read.parquet(v2.map(_.toString): _*)
        .select("file", "bitmap").as[(String, Array[Byte])]
        .groupByKey(_._1)
        .flatMapGroups((f: String, it: Iterator[(String, Array[Byte])]) =>
          Roaring.positions(Roaring.unionAll(it.map(_._2))).map(p => (f, p)))
        .toDF("file", "row_index")
    val folded = fromV1.unionByName(fromV2)
      .select(col("file"), col("row_index")).as[(String, Long)]
      .groupByKey(_._1)
      .mapGroups((f: String, it: Iterator[(String, Long)]) =>
        (f, Roaring.fromPositions(it.map(_._2))))
      .toDF("file", "bitmap")
      .coalesce(1)
    val tmp = java.nio.file.Paths.get(stageDir, s"$Sidecar.fold")
    folded.write.parquet(tmp.toString)
    graft.io.Fs.deleteRecursively(dvDir)
    java.nio.file.Files.move(tmp, dvDir)
  }

  /** True iff `dir`'s sidecar contains any v1-format part (the upgrade
    * trigger: the next MOR commit folds it to v2 wholesale, keeping
    * every sidecar dir single-format).
    */
  private[graft] def hasLegacyParts(spark: SparkSession, dir: String): Boolean =
    exists(dir) && graft.io.Fs.listDir(java.nio.file.Paths.get(dir, Sidecar))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .exists(isV1Part(spark, _))

  /** Driver-side (file → OR-merged bitmap) entries of `dir`'s vector —
    * the payload of the scan-time [[probe]]. Per-file OR runs
    * distributed; only the compressed bitmaps come back (metadata-scale,
    * same class as the file listings [[Sinks]] already collects). Legacy
    * v1 sidecars encode to v2 bitmaps on the way out.
    */
  private[graft] def bitmapEntries(spark: SparkSession,
      dir: String): Array[(String, Array[Byte])] = {
    import spark.implicits._
    if (!exists(dir)) Array.empty
    else {
      val raw = spark.read.parquet(s"$dir/$Sidecar")
      val perFile =
        if (raw.columns.contains("row_index"))
          deltaBitmaps(raw.select("file", "row_index"))
        else raw.select("file", "bitmap").as[(String, Array[Byte])]
          .groupByKey(_._1)
          .mapGroups((f: String, it: Iterator[(String, Array[Byte])]) =>
            (f, Roaring.unionAll(it.map(_._2))))
          .toDF("file", "bitmap")
      perFile.as[(String, Array[Byte])].collect()
    }
  }

  /** The join-free subtraction predicate: true iff `(key, pos)` is a
    * deleted position of `dir` — a codegen'd [[graft.functions.DvProbe]]
    * over the whole vector as one plan reference object. Filtering with
    * `!probe(...)` adds NO join and NO Exchange to the scan, at any
    * vector size and any `autoBroadcastJoinThreshold` — the scale-safe
    * spelling the round-10 verdict asked for (the old anti-join fell to
    * a full sort-merge shuffle once the expanded vector outgrew the
    * broadcast threshold).
    */
  private def probe(entries: Array[(String, Array[Byte])],
      key: Column, pos: Column): Column = {
    import org.apache.spark.sql.graft.ExprBridge
    ExprBridge.column(graft.functions.DvProbe(
      ExprBridge.expr(key), ExprBridge.expr(pos),
      new RoaringLookup(entries)))
  }

  /** Probe-size budget (bytes of COMPRESSED bitmaps) above which
    * subtraction falls back from the plan-embedded probe to a
    * distributed anti-join. The probe ships the whole vector with the
    * stage's task binary and parses it per JVM — the right trade while
    * the vector is metadata-scale (typical churn: KBs–MBs even against
    * TBs of data), the wrong one for a pathological vector (say half a
    * trillion-row table deleted: ~8 GB of bitset containers). Past the
    * budget the positions expand distributed and the anti-join's
    * shuffle — the thing the probe exists to avoid — becomes the
    * honest cost of metadata that big; compaction remains the cure.
    * Conf `graft.dv.maxProbeBytes` overrides (DvSpec pins the
    * fallback leg by setting it to 0).
    */
  private val DefaultMaxProbeBytes = 256L * 1024 * 1024

  private def maxProbeBytes(spark: SparkSession): Long =
    spark.conf.getOption("graft.dv.maxProbeBytes").map(_.toLong)
      .getOrElse(DefaultMaxProbeBytes)

  /** Subtract `dir`'s vector from `df` keyed by (`keyCol`, `posCol`) —
    * probe-filter under the byte budget (zero joins), distributed
    * anti-join past it. Shared by the read funnel ([[subtract]]) and
    * the MOR writer's live scan ([[Sinks.liveWithPositions]]).
    */
  private[graft] def subtractByKey(df: DataFrame, dir: String,
      keyCol: Column, posCol: Column): DataFrame = {
    val spark = df.sparkSession
    val entries = bitmapEntries(spark, dir)
    if (entries.map(_._2.length.toLong).sum <= maxProbeBytes(spark))
      df.filter(!probe(entries, keyCol, posCol))
    else
      df.join(vector(spark, dir)
          .withColumnRenamed("file", "__graft_dv_file")
          .withColumnRenamed("row_index", "__graft_dv_row"),
        keyCol === col("__graft_dv_file") && posCol === col("__graft_dv_row"),
        "left_anti")
  }

  /** Subtract `dir`'s deletion vector from a raw frame of its files.
    * `raw` must carry the `_metadata` struct (select it from a file
    * read BEFORE any projection); returns the surviving rows with the
    * original columns only — via the join-free [[probe]] filter.
    */
  /** Loud guard shared by every subtraction-side path: a table whose
    * schema uses the reserved working-column prefixes would have its
    * data silently REPLACED by the synthetic key/position columns
    * (`withColumn` overwrites same-named columns) — refuse up front,
    * mirroring MERGE's source-prefix guard.
    */
  private[graft] def requireNoReserved(cols: Seq[String], what: String): Unit = {
    val clash = cols.filter(c => c.startsWith("_dv_") || c.startsWith("__graft_"))
    require(clash.isEmpty,
      s"$what: column name(s) ${clash.mkString(", ")} use the reserved " +
        "'_dv_'/'__graft_' prefixes, which merge-on-read machinery injects " +
        "as working columns — rename them to use MOR DML on this table")
  }

  private[graft] def subtract(raw: DataFrame, dir: String,
      output: Seq[String]): DataFrame = {
    // fail LOUDLY, never subtract nothing: relKey strips a literal
    // `file:$dir/` prefix, but `_metadata.file_path` is URI-encoded —
    // under a dir that doesn't encode to itself every key mismatches
    // and the anti-join would silently resurrect deleted rows
    require(safeDir(dir),
      s"cannot apply the deletion vector under $dir: the path is not " +
        "URI-transparent, so stored vector keys cannot be matched " +
        "against _metadata.file_path — move/clone the table to a path " +
        "of [A-Za-z0-9/._-] or compact the source to purge deletes first")
    requireNoReserved(raw.columns.toSeq, s"deletion-vector read of $dir")
    subtractByKey(raw, dir, relKey(dir), col("_metadata.row_index"))
      .select(output.map(col).toIndexedSeq: _*)
  }

  /** Refuse an operation that would read files RAW under a deletion
    * vector (COW rewrite passes, stats/bloom pruned fast paths) —
    * resurrecting deleted rows is corruption, not degradation.
    */
  private[graft] def requireNone(dir: String, what: String): Unit =
    require(!exists(dir),
      s"$what cannot run on a version carrying a deletion vector " +
        s"($dir/$Sidecar): run CALL system.compact (or " +
        "Sinks.compactVersioned) to purge deletes into files first")
}
