package graft.ops

import org.apache.spark.sql.DataFrame

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

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(bytes / targetBytes) files. Streaming sinks and fine-grained
    * backfills accrete thousands of tiny files; at 100 TB the resulting
    * scan-planning and open() overhead dominates reads, so periodic
    * compaction is table maintenance, not an optimization. Sizing comes
    * from the files' on-disk footprint (no extra scan of the data); the
    * rewrite itself is one narrow repartition job into a temp dir, then
    * an atomic-as-the-filesystem-allows swap.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    val dir = Paths.get(path)
    val parts = Files.list(dir).toArray.map(_.asInstanceOf[Path])
      .filter(_.getFileName.toString.endsWith(".parquet"))
    val totalBytes = parts.map(Files.size).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = path + ".compact_tmp"
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp)
    val bak = path + ".compact_old"
    Files.move(dir, Paths.get(bak), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), dir, StandardCopyOption.ATOMIC_MOVE)
    def rm(p: Path): Unit = {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
    rm(Paths.get(bak))
  }
}
