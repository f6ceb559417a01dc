package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  // materialize v<N+1>, then flip the pointer with a single atomic rename
  // — readers that resolve through the pointer either see the old complete
  // version or the new complete version, never a missing/partial table.
  // This is the small-manifest commit that table formats (Delta/Iceberg
  // transaction logs) implement on object stores with a conditional PUT;
  // on HDFS/POSIX the rename below IS atomic, and at 100 TB the layout
  // delegates cleanly to such a format without changing callers.

  private val Pointer = "_CURRENT"

  /** The live version number, if the table has ever been published. */
  def currentVersion(root: String): Option[Long] = {
    val p = Paths.get(root, Pointer)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim.toLong)
    else None
  }

  /** Path of the live version directory (readers resolve through this). */
  def resolve(root: String): String = {
    val v = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    s"$root/v$v"
  }

  def readCurrent(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(resolve(root))

  /** Publish `df` as the next version: write a freshly-reserved v<N>
    * completely, then flip the `_CURRENT` pointer via write-temp +
    * atomic rename. Returns the published version number.
    *
    * Concurrency: safe under concurrent writers via optimistic
    * concurrency — the version DIRECTORY is reserved atomically
    * (`createDirectory` fails if it exists, so two writers can never
    * write into the same v<N>), and the pointer flip happens under a
    * cross-process file lock only if the table is still at the version
    * this writer based itself on; a writer that lost the race gets a
    * `ConcurrentModificationException` (recompute against the new
    * current and retry) instead of silently clobbering the winner —
    * the same conditional-commit protocol lakehouse table formats run.
    */
  def publishVersioned(df: DataFrame, root: String): Long =
    publishVersioned(df, root, currentVersion(root))

  /** As [[publishVersioned]], with an explicit expected base version
    * (None = expecting to create the table).
    */
  def publishVersioned(df: DataFrame, root: String, expected: Option[Long]): Long = {
    Files.createDirectories(Paths.get(root))
    // atomic reservation of the version dir — no two writers share a v<N>
    var next = expected.map(_ + 1).getOrElse(0L)
    var reserved = false
    while (!reserved) {
      try { Files.createDirectory(Paths.get(s"$root/v$next")); reserved = true }
      catch { case _: java.nio.file.FileAlreadyExistsException => next += 1 }
    }
    df.write.mode("overwrite").parquet(s"$root/v$next")
    withCommitLock(root) {
      val cur = currentVersion(root)
      if (cur != expected) {
        deleteRecursively(Paths.get(s"$root/v$next")) // abandon the orphan
        throw new java.util.ConcurrentModificationException(
          s"$root moved to v$cur while this writer was basing on v$expected; " +
            "recompute against the new current and retry")
      }
      val tmp = Paths.get(root, s"$Pointer.tmp")
      Files.write(tmp, next.toString.getBytes("UTF-8"))
      Files.move(tmp, Paths.get(root, Pointer),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    next
  }

  /** JVM mutex + cross-process file lock around the pointer flip. (On an
    * object store this becomes the conditional PUT of the table format.)
    */
  private def withCommitLock[T](root: String)(body: => T): T = this.synchronized {
    val ch = java.nio.channels.FileChannel.open(Paths.get(root, "_LOCK"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    try { val lock = ch.lock(); try body finally lock.release() }
    finally ch.close()
  }

  /** Compaction over the versioned layout: rewrite the live version into
    * ceil(bytes / targetBytes) files as a NEW version and flip the
    * pointer — readers see no window where the table is absent. Version
    * dirs older than the immediately-previous one are vacuumed (the
    * previous is kept for readers that resolved just before the flip;
    * production table formats age these out by retention time instead).
    */
  def compactVersioned(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    val live = resolve(root)
    val nFiles = fileCount(Paths.get(live), targetBytes)
    val v = publishVersioned(spark.read.parquet(live).repartition(nFiles), root)
    // vacuum: delete v<k> for k < v-1
    listDir(Paths.get(root)).foreach { p =>
      val name = p.getFileName.toString
      if (name.startsWith("v") && name.drop(1).forall(_.isDigit)
          && name.drop(1).toLong < v - 1)
        deleteRecursively(p)
    }
    v
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
      deleteRecursively(bak)
    val entries = listDir(dir)
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
    deleteRecursively(bak)
  }

  /** ceil(total parquet bytes / target), from file metadata only. */
  private def fileCount(dir: Path, targetBytes: Long): Int = {
    val totalBytes = listDir(dir)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(Files.size).sum
    math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
  }

  /** Directory listing with the stream closed (Files.list leaks an fd
    * otherwise).
    */
  private def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.toArray.toSeq.map(_.asInstanceOf[Path])
    finally s.close()
  }

  private def deleteRecursively(p: Path): Unit = {
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(f => Files.deleteIfExists(f))
    finally s.close()
  }
}
