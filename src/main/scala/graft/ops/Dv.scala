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
  * `_dv` sidecar — `(file, row_index)` keyed by the file's version-dir-
  * relative path — and commits them with the data files carried
  * untouched by hardlink: commit cost is O(matched rows + existing dv),
  * zero data bytes rewritten.
  *
  * Readers subtract the vector at scan time: [[Sinks.readDir]] (the
  * single funnel every Scala read, snapshot diff, CDC read, and
  * compaction flows through) anti-joins on Spark's `_metadata`
  * file/row-position columns, and [[graft.plans.DvReadRule]] swaps the
  * catalog's DSv2 relation for the same subtracted plan, so SQL reads
  * (current AND time travel) see post-delete rows with no caller
  * cooperation. Compaction reads through the same funnel, so `CALL
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

  /** The vector itself: `(file, row_index)`, empty-typed when absent. */
  def vector(spark: SparkSession, dir: String): DataFrame =
    if (exists(dir)) spark.read.parquet(s"$dir/$Sidecar").select("file", "row_index")
    else {
      import spark.implicits._
      spark.emptyDataset[(String, Long)].toDF("file", "row_index")
    }

  /** Subtract `dir`'s deletion vector from a raw frame of its files.
    * `raw` must carry the `_metadata` struct (select it from a file
    * read BEFORE any projection); returns the surviving rows with the
    * original columns only. The vector side is a small metadata table —
    * Spark broadcasts it below the threshold, and the anti-join never
    * shuffles more than the scan already did.
    */
  private[graft] def subtract(raw: DataFrame, dir: String,
      output: Seq[String]): DataFrame = {
    val spark = raw.sparkSession
    val dv = vector(spark, dir)
      .withColumnRenamed("file", "_dv_file")
      .withColumnRenamed("row_index", "_dv_row")
    raw
      .withColumn("_dv_key", relKey(dir))
      .withColumn("_dv_pos", col("_metadata.row_index"))
      .join(dv, col("_dv_key") === col("_dv_file") &&
        col("_dv_pos") === col("_dv_row"), "left_anti")
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
