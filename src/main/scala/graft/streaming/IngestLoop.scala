package graft.streaming

import graft.ops.{NearDupIndex, Sinks, Txn, TxnWrite}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The CONTINUOUS corpus-admission loop — B158's incremental-ingest
  * flagship as a streaming sink: every micro-batch is admitted against
  * the standing near-dup index, and the accepted documents land in the
  * corpus table AND the index in ONE multi-table transaction
  * ([[Txn.publishAll]], linked appends) — a reader can never observe a
  * corpus doc whose signatures aren't indexed (or indexed signatures
  * for an unadmitted doc), and the NEXT batch's dup check is therefore
  * automatically against everything admitted before it.
  *
  * Retry idempotence is ID-keyed and derives from the index itself,
  * not from a side channel: a retried batch (foreachBatch redelivery
  * after a crash that landed the transaction) finds its own doc ids
  * already indexed via the `(band, bucket, doc_id)` identity probe
  * ([[NearDupIndex.containsIds]]) and admits nothing — no corpus-scale
  * anti-join, no high-water-mark file. Pipelines with content-derived
  * ids (the norm — ids ARE digests upstream) get content-level
  * exactly-once for free.
  *
  * Scale shape per batch: two broadcast probes of the (bloom-pruned)
  * index scan + the token gate — no corpus scan, no corpus shuffle;
  * the transaction appends O(batch) bytes to each table by hardlink
  * carry. Empty admissions skip the commit entirely (no empty
  * versions).
  */
object IngestLoop {

  /** The admission decision for one batch: gate on a minimum
    * whitespace-token count FIRST (an inadmissible doc must not vote in
    * the dup elections below), then drop docs the index already holds
    * under their own id (retry/replay), drop near-dups of any INDEXED
    * doc, and drop INTRA-batch near-dups (a batch containing two copies
    * must admit one — the index can't catch what isn't indexed yet;
    * survivor = the GATED doc with no smaller-id LSH collision in the
    * batch, under the index's own signature parameters). Returns the
    * accepted subset of `batch` (schema unchanged).
    */
  def admit(batch: DataFrame, indexRoot: String, minTokens: Int): DataFrame = {
    val spark = batch.sparkSession
    // token gate FIRST: a below-threshold doc must not participate in
    // the intra-batch loser election (a short smaller-id near-dup would
    // eliminate its admissible copy and the batch would admit neither —
    // round-11 advisor finding), and gating before the probes also
    // skips signature work for docs that could never be admitted
    val gated = batch.filter(size(split(col("text"), " ")) >= minTokens)
    val fresh = gated.join(
      NearDupIndex.containsIds(spark, gated, indexRoot), Seq("doc_id"),
      "left_anti")
    val nearDups = NearDupIndex.candidates(spark, fresh, indexRoot)
      .select(col("probe_id").as("doc_id")).distinct()
    val vsIndex = fresh.join(nearDups, Seq("doc_id"), "left_anti")
    // intra-batch: self-join the batch's banded rows (same params as
    // the index via bandedFor) and drop every doc with a smaller-id
    // collision — batch-scale work, the batch side of both frames
    val banded = NearDupIndex.bandedFor(spark, vsIndex, indexRoot)
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("keep"))
    val r = banded.select(col("band").as("band_r"),
      col("bucket").as("bucket_r"), col("doc_id").as("drop"))
    val losers = l.join(r, col("band") === col("band_r") &&
        col("bucket") === col("bucket_r") && col("keep") < col("drop"))
      .select(col("drop").as("doc_id")).distinct()
    vsIndex.join(losers, Seq("doc_id"), "left_anti")
  }

  /** `foreachBatch` handler: admit, then commit corpus + index
    * together. Returns the number of admitted docs (0 = no commit).
    */
  def sink(corpusRoot: String, indexRoot: String, minTokens: Int = 1)
      (batch: DataFrame, batchId: Long): Long = {
    val spark = batch.sparkSession
    // consumed three times (count + corpus write + banded index write)
    // at O(batch) rows — executor-local caching is the right trade on
    // a serving path (a lost executor recomputes one batch's admission)
    val accepted = admit(batch, indexRoot, minTokens).localCheckpoint()
    val n = accepted.count()
    if (n > 0) {
      Txn.publishAll(Seq(
        TxnWrite(corpusRoot, accepted,
          Sinks.currentVersion(corpusRoot), linked = true),
        TxnWrite(indexRoot,
          NearDupIndex.bandedFor(spark, accepted, indexRoot),
          Sinks.currentVersion(indexRoot), linked = true)))
    }
    n
  }
}
