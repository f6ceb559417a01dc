package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Durable mid-plan materialization barrier — the shared replacement for
  * `localCheckpoint()` on corpus-scale frames (round-8 verdict item 5).
  *
  * `localCheckpoint` truncates lineage but stores its blocks
  * NON-REPLICATED on executors: at 100 TB, losing ONE executor loses
  * blocks that no surviving lineage can recompute, killing every
  * downstream consumer — the whole job dies to a single machine fault.
  * [[stable]] keeps both properties a barrier needs and adds durability:
  *
  *  1. the frame is computed ONCE (a `DISK_ONLY` persist absorbs the
  *     compute, so the checkpoint write below re-reads blocks rather
  *     than re-running the plan);
  *  2. the rows are then CHECKPOINTED to the checkpoint filesystem —
  *     on a real cluster `SparkContext.setCheckpointDir` points at
  *     HDFS/object storage, which replicates; an executor loss costs a
  *     re-read of checkpoint files, not the job;
  *  3. lineage is truncated at the checkpoint (the reason the iterative
  *     consumers — connected components, PageRank, k-means — pinned at
  *     all: un-cut lineage compounds per round until planning dominates).
  *
  * When the session has no checkpoint dir configured, one is created
  * under the JVM's temp dir (the local-mode stand-in; a deployment sets
  * a durable path). The interim persist is dropped once the checkpoint
  * is written.
  */
object Pin {

  def stable(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    this.synchronized {
      if (sc.getCheckpointDir.isEmpty)
        sc.setCheckpointDir(
          java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    }
    val cached = df.persist(StorageLevel.DISK_ONLY)
    try cached.checkpoint() // eager: one compute into the cache, one write from it
    finally cached.unpersist(blocking = false)
  }
}
