package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index: the ANN index as a versioned TABLE (SURVEY
  * B125), extending the in-session IVF path (B62) with build-once /
  * probe-many semantics.
  *
  * Layout: the index root is an ordinary [[Sinks]] versioned table,
  * declared `PARTITIONED BY (bucket BIGINT)` before the first publish —
  * every corpus row lands under its coarse-quantizer bucket's partition
  * directory, and the quantizer itself (the centroid table, a few KB) is
  * persisted as a `_centroids` sidecar inside the same version dir. The
  * index therefore inherits the whole table tier for free: OCC commits,
  * time travel to previous index builds, compaction, vacuum.
  *
  * Probe shape at scale: [[search]] broadcasts the centroid sidecar,
  * ranks probe buckets per query over that tiny table only, and joins
  * the probed (query, bucket) set back to the index scan ON THE
  * PARTITION COLUMN — Spark's dynamic partition pruning then skips every
  * unprobed bucket directory at runtime (AnnIndexSpec plan-asserts the
  * dynamicpruning filter), so a probe reads `nprobe/k` of the corpus
  * from disk rather than scanning and discarding. In-bucket scoring
  * rides the bounded-heap top-k aggregate ([[Similarity.ivfTopK]]), so
  * the shuffle never carries scored corpus rows.
  *
  * Crash contract: the `_centroids` sidecar is written after the data
  * commit (same advisory-sidecar pattern as [[Bloom]]/[[Stats]]) — but
  * for an index the quantizer is REQUIRED, so [[search]] fails loudly
  * when it is missing (crash between commit and sidecar write) instead
  * of probing with wrong centroids; rebuild with [[buildFixed]] /
  * [[buildLearned]] to repair. Assignments must match the persisted
  * quantizer exactly, which is why centroids are stored rather than
  * re-derived from the assignments (re-deriving computes the NEXT Lloyd
  * iteration's means, not the ones the assignment used).
  */
object AnnIndex {

  val CentroidsSidecar = "_centroids"

  /** Build from a precomputed assignment column (e.g. the fixture
    * `label`): bucket = `corpus(assignCol)`, quantizer = per-bucket mean
    * vectors — the deterministic, oracle-able path (B62's
    * `ivfCentroids` contract).
    */
  def buildFixed(spark: SparkSession, corpus: DataFrame, root: String,
      assignCol: String = "label"): Long = {
    val cents = Similarity.meanByCluster(corpus, assignCol).localCheckpoint()
    publish(spark, corpus.withColumn("bucket", col(assignCol).cast("long")),
      cents, root)
  }

  /** Build with a learned spherical-k-means quantizer: bucket = nearest
    * centroid per row ([[Similarity.assignClusters]] — broadcast
    * centroid array, no row blowup).
    */
  def buildLearned(spark: SparkSession, corpus: DataFrame, root: String,
      k: Int, iters: Int): Long = {
    val cents = Similarity.kmeansCentroids(corpus, k, iters) // checkpointed per iter
    val assigned = Similarity.assignClusters(corpus, cents)
      .filter(col("cluster") >= 0) // null/zero-norm rows are unindexable
      .withColumn("bucket", col("cluster"))
    publish(spark, assigned, cents, root)
  }

  private def publish(spark: SparkSession, assigned: DataFrame,
      cents: DataFrame, root: String): Long = {
    TableProps.update(root) { m =>
      m + (TableProps.PartitionKey -> "bucket BIGINT")
    }
    // one shuffle by bucket so each partition dir gets few files (every
    // task writing every bucket would fan n_tasks × k small files)
    val rows = assigned.select(col("vec_id"), col("embedding"), col("bucket"))
      .repartition(col("bucket"))
    val v = Sinks.publishVersioned(rows, root, Sinks.currentVersion(root))
    cents.coalesce(1).write.mode("overwrite")
      .parquet(s"${Sinks.versionPath(root, v)}/$CentroidsSidecar")
    v
  }

  /** Append new vectors to the live index at O(delta): assign against
    * the PERSISTED quantizer — old and new rows must agree on the
    * bucketing scheme, so the stored centroids are authoritative, never
    * re-derived — then linked-append the bucketed rows through
    * [[Sinks.appendVersioned]]: existing bucket files carry by hardlink,
    * the quantizer sidecar rides along, and the partition layout comes
    * from the table's own `_PROPS`. Rows with null/zero-norm embeddings
    * are unindexable and dropped, same as the build paths.
    */
  def append(spark: SparkSession, newRows: DataFrame, root: String): Long = {
    val cents = centroids(spark, root)
    val assigned = Similarity.assignClusters(newRows, cents)
      .filter(col("cluster") >= 0)
      .select(col("vec_id"), col("embedding"),
        col("cluster").cast("long").as("bucket"))
    Sinks.appendVersioned(assigned, root, Sinks.currentVersion(root))
  }

  /** Exactly-once streaming ingestion into the live index: each
    * micro-batch assigns against the persisted quantizer and
    * linked-appends through [[TableStream.streamTo]]'s per-batch dedupe
    * stamps (restart-safe, CME-retried against concurrent writers). The
    * quantizer is re-read per batch — cheap (a few KB), and it makes a
    * mid-stream rebuild behave correctly: batches after the rebuild
    * file under the NEW scheme, whose version already re-filed every
    * older row. The index must exist before streaming starts
    * ([[buildFixed]]/[[buildLearned]]) — there is no quantizer to
    * assign against otherwise, and [[centroids]] fails loudly.
    */
  def streamTo(stream: DataFrame, root: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    centroids(stream.sparkSession, root) // fail at start, not first batch
    TableStream.streamTo(stream, root, checkpoint, emitFeed = false,
      transform = batch => {
        val cents = centroids(batch.sparkSession, root)
        Similarity.assignClusters(batch, cents)
          .filter(col("cluster") >= 0)
          .select(col("vec_id"), col("embedding"),
            col("cluster").cast("long").as("bucket"))
      })
  }

  /** The persisted quantizer of the LIVE index version. */
  def centroids(spark: SparkSession, root: String): DataFrame = {
    val live = Sinks.resolve(root)
    val p = s"$live/$CentroidsSidecar"
    require(Files.isDirectory(Paths.get(p)),
      s"no $CentroidsSidecar under $live — index incomplete (crash between " +
        "commit and quantizer write?); rebuild with AnnIndex.buildFixed/buildLearned")
    spark.read.parquet(p)
  }

  /** Top-k cosine search against the live persisted index: probe the
    * `nprobe` nearest buckets per query (ranked over the broadcast
    * centroid sidecar), exact cosine inside probed buckets only, with
    * dynamic partition pruning skipping unprobed bucket dirs at the
    * scan. Returns `(query_id, vec_id, cos_sim, rnk)`.
    */
  def search(spark: SparkSession, root: String, queries: DataFrame,
      nprobe: Int, k: Int): DataFrame = {
    val cents = centroids(spark, root)
    val corpus = Sinks.readCurrent(spark, root)
      .withColumnRenamed("bucket", "label")
    Similarity.ivfTopK(corpus, cents, queries, nprobe, k)
  }
}
