package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH near-duplicate index — the INCREMENTAL dedup
  * pattern a growing 100 TB corpus actually needs: computing signatures
  * is O(corpus) and must never be repeated, so the banded signature
  * rows live as a versioned table; each new ingest batch APPENDS its
  * own banded rows O(delta) ([[Sinks.appendVersioned]] hardlinks every
  * existing file), and a candidate probe for a batch never re-shuffles
  * the index: the batch's banded rows broadcast into a hash join
  * against the index scan, and the `_bloom` sidecar on the bucket
  * column ([[Bloom]], B123) prunes index FILES that cannot contain any
  * probed bucket — at steady state a probe reads a sliver of the index.
  *
  * Table schema: `(doc_id, band, bucket)` where bucket is the
  * concatenated md5-signature band slice ([[Dedup.minhashSignatureMd5]]
  * — the engine-portable signature family, so the whole index chain is
  * DuckDB-oracle-able). Parameters (shingle n, bands, rows per band)
  * are fixed at [[build]] time and recorded in table properties;
  * [[append]] and [[candidates]] read them back — mixed-parameter
  * signatures can never meet in a bucket.
  *
  * Candidates are LSH candidates (same band-slice collision semantics
  * as [[Dedup.minhashCandidatesMd5]]); callers wanting a similarity
  * floor rerank the pairs with [[Dedup.jaccard]] against the texts —
  * the index deliberately stores NO text (16-byte digests shuffle,
  * documents don't).
  */
object NearDupIndex {

  private val KeyN = "graft.neardup.n"
  private val KeyBands = "graft.neardup.bands"
  private val KeyRows = "graft.neardup.rowsPerBand"

  /** Banded signature rows for `docs`: `(doc_id, band, bucket)`.
    * Null-text docs are excluded — their bucket would be one all-null
    * clique (the same hazard note as [[Dedup.minhashCandidatesMd5]]).
    * Documents shorter than the shingle width follow the md5 signature
    * family's convention (whole-text shingle → identical short docs DO
    * collide); the DuckDB oracle's `generate_series` recompute instead
    * drops them — the same declared divergence every md5-LSH surface
    * carries, latent because the fixtures have no sub-shingle docs.
    */
  private def banded(docs: DataFrame, n: Int, bands: Int,
      rowsPerBand: Int): DataFrame = {
    val numPerm = bands * rowsPerBand
    // the banding projection is SHARED with the ad-hoc candidate path
    // (Dedup.bandedBuckets) so index buckets stay byte-compatible with
    // every other md5-LSH surface by construction
    Dedup.bandedBuckets(
      docs.filter(col("text").isNotNull)
        .select(col("doc_id"),
          Dedup.minhashSignatureMd5(col("text"), n, numPerm).as("sig")),
      bands, rowsPerBand)
  }

  private def params(root: String): (Int, Int, Int) = {
    val p = TableProps.load(root)
    def get(k: String): Int = p.get(k).flatMap(_.toIntOption).getOrElse(
      throw new IllegalStateException(
        s"$root is not a near-dup index (missing $k) — create it with " +
          "NearDupIndex.build"))
    (get(KeyN), get(KeyBands), get(KeyRows))
  }

  /** Build the index over an initial corpus and publish it as v0 with a
    * bucket bloom sidecar. Returns the committed version.
    *
    * Atomic from every reader's perspective (round-11 verdict item 2):
    * the parameter props land BEFORE any version exists (a table with
    * props but no version is not yet an index — probes fail loudly
    * with "no published index", and re-running build simply overwrites
    * the props and proceeds), and the data + `_bloom` sidecar become
    * visible in ONE staged commit rename ([[Sinks.publishVersioned]]'s
    * `bloomCols`). No crash point leaves an index that throws on every
    * probe or silently full-scans — CommitProtocolSpec kills the build
    * at each step and asserts exactly that.
    */
  def build(spark: SparkSession, docs: DataFrame, root: String,
      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 4): Long = {
    require(n >= 1 && bands >= 1 && rowsPerBand >= 1,
      s"invalid parameters n=$n bands=$bands rowsPerBand=$rowsPerBand")
    require(Sinks.currentVersion(root).isEmpty,
      s"near-dup index already exists at $root — use append")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    TableProps.update(root)(_ +
      (KeyN -> n.toString) + (KeyBands -> bands.toString) +
      (KeyRows -> rowsPerBand.toString))
    Sinks.publishVersioned(banded(docs, n, bands, rowsPerBand),
      root, None, bloomCols = Seq("bucket"))
  }

  /** Append a new batch's banded rows under the index's own parameters
    * — O(batch): every existing index file carries by hardlink, and the
    * bloom sidecar inheritance annotates only the new files.
    */
  def append(spark: SparkSession, newDocs: DataFrame, root: String): Long = {
    val (n, bands, rowsPerBand) = params(root)
    Sinks.appendVersioned(banded(newDocs, n, bands, rowsPerBand), root,
      Sinks.currentVersion(root))
  }

  /** Banded rows for `docs` under `root`'s RECORDED parameters — the
    * index-side frame an ingest loop appends in the same transaction
    * as the corpus ([[graft.streaming.IngestLoop]]): reading the
    * params from the table props makes parameter drift impossible.
    */
  def bandedFor(spark: SparkSession, docs: DataFrame, root: String): DataFrame = {
    val (n, bands, rowsPerBand) = params(root)
    banded(docs, n, bands, rowsPerBand)
  }

  /** Doc ids of `batch` ALREADY present in the index — the identity
    * probe (`(band, bucket, doc_id)` triple-equality, so an id only
    * counts when its own signatures are the indexed ones) a retried
    * ingest batch uses to recognize itself. Same broadcast shape as
    * [[candidates]]; the index side never shuffles.
    */
  def containsIds(spark: SparkSession, batch: DataFrame,
      root: String): DataFrame = {
    val qb = bandedFor(spark, batch, root)
      .withColumnRenamed("doc_id", "probe_id")
    val idx = Sinks.readCurrent(spark, root)
    idx.join(broadcast(qb),
        idx("band") === qb("band") && idx("bucket") === qb("bucket") &&
          idx("doc_id") === qb("probe_id"))
      .select(col("probe_id").as("doc_id")).distinct()
  }

  /** LSH candidate pairs between a probe batch and the INDEXED corpus:
    * `(probe_id, match_id)` distinct, self-matches (same id) excluded —
    * so a batch already appended to the index can be probed without
    * matching itself. The batch side broadcasts (it is the delta — if
    * it were corpus-sized you would rebuild, not probe), the index scan
    * stays shuffle-free, and the bucket bloom sidecar file-prunes it.
    */
  def candidates(spark: SparkSession, batch: DataFrame,
      root: String): DataFrame = {
    val (n, bands, rowsPerBand) = params(root)
    // consumed twice (bucket collect + join side) and the signature
    // expression is the probe's dominant cost (numPerm md5 per shingle)
    // — localCheckpoint, not Pin.stable: the frame is O(batch × bands)
    // rows by the delta-batch contract, so executor-local caching is
    // the right durability trade (a lost executor recomputes a probe,
    // never corpus-scale work), and a durable parquet write per probe
    // would be pure overhead on the serving path
    val qb = banded(batch, n, bands, rowsPerBand)
      .withColumnRenamed("doc_id", "probe_id")
      .localCheckpoint()
    // file-level pruning: the probe's bucket set is O(batch × bands)
    // strings — collect it (bounded by the delta-batch contract, capped
    // below) and keep only index files whose bucket bloom admits one.
    // Past the cap the probe is no longer a point lookup and the full
    // scan + broadcast join is the honest plan.
    import spark.implicits._
    val liveDir = Sinks.versionPath(root,
      Sinks.currentVersion(root).getOrElse(throw new IllegalStateException(
        s"no published near-dup index under $root")))
    val probeBuckets = qb.select("bucket").distinct()
      .limit(MaxProbeBuckets + 1).as[String].collect()
    val idx =
      if (probeBuckets.length > MaxProbeBuckets) Sinks.readCurrent(spark, root)
      else {
        val files = Bloom.prunedFilesEqAny(spark, liveDir, "bucket",
          probeBuckets.toSeq)
        if (files.isEmpty)
          Sinks.readCurrent(spark, root).limit(0)
        else spark.read.parquet(files: _*)
      }
    idx.join(broadcast(qb),
        idx("band") === qb("band") && idx("bucket") === qb("bucket") &&
          idx("doc_id") =!= qb("probe_id"))
      .select(col("probe_id"), col("doc_id").as("match_id"))
      .distinct()
  }

  /** Probe-bucket cap for driver-side bloom pruning: above this the
    * batch is not a delta and the plain scan-plus-broadcast-join plan
    * wins (collecting millions of bucket strings to the driver would be
    * the real scale bug).
    */
  val MaxProbeBuckets: Int = 65536
}
