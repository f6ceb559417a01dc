package graft.ops

import org.apache.spark.sql.DataFrame

/** Durable mid-plan materialization barrier — the shared replacement for
  * `localCheckpoint()` on corpus-scale frames (round-8 verdict item 5).
  *
  * `localCheckpoint` truncates lineage but stores its blocks
  * NON-REPLICATED on executors: at 100 TB, losing ONE executor loses
  * blocks that no surviving lineage can recompute, killing every
  * downstream consumer — the whole job dies to a single machine fault.
  * [[stable]] materializes the frame ONCE as PARQUET under the pin root
  * and returns a fresh scan of it, which gives a barrier all three
  * properties it needs:
  *
  *  1. computed once — every downstream consumer reads the files;
  *  2. durable — the pin root is the checkpoint dir when the session
  *     has one (HDFS/object store on a real cluster, replicated by the
  *     store; an executor loss costs a re-read, not the job), else a
  *     JVM-temp dir (the local-mode stand-in, removed on exit);
  *  3. lineage cut — the returned frame is a plain scan, so iterative
  *     consumers (connected components, PageRank, k-means) keep flat
  *     plans round over round.
  *
  * Parquet, not RDD `checkpoint()`, deliberately: checkpoint files are
  * serialized-row blobs written AFTER a separate caching/recompute pass
  * (two materializations or a persist's extra write), while this is one
  * columnar-compressed write and vectorized reads — measured faster at
  * bench scale, and the files are readable by anything for debugging.
  */
object Pin {

  @volatile private var localRoot: String = _

  private def pinRoot(spark: org.apache.spark.sql.SparkSession): String = {
    val fromCkpt = spark.sparkContext.getCheckpointDir
    fromCkpt.getOrElse(this.synchronized {
      if (localRoot == null) {
        val dir = java.nio.file.Files.createTempDirectory("graft-pin")
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          try graft.io.Fs.deleteRecursively(dir) catch { case _: Exception => () }))
        localRoot = dir.toString
      }
      localRoot
    })
  }

  def stable(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val dir = pinRoot(spark) + "/pin-" + java.util.UUID.randomUUID()
    df.write.parquet(dir)
    // explicit schema: an all-empty frame writes no footer-bearing part
    // file, and a bare read of the directory would fail inference
    spark.read.schema(df.schema).parquet(dir)
  }
}
