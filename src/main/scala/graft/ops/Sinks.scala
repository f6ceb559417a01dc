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
}
