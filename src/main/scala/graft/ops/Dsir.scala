package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling (Xie et al., "Data Selection for
  * Language Models via Importance Resampling", NeurIPS 2023): score
  * every raw document by how much more likely its hashed-n-gram bag is
  * under a TARGET distribution (e.g. curated reference text) than under
  * the RAW pool's own distribution, then keep the top-weighted raw
  * documents. This is the principled replacement for hand-tuned quality
  * thresholds when a trusted target corpus exists.
  *
  * Fidelity to the published recipe:
  *  - features are hashed unigram + bigram counts over whitespace
  *    tokens, bucketed into `buckets` cells (the paper's hashed n-gram
  *    bag-of-words);
  *  - both distributions are add-1 smoothed multinomials over the
  *    buckets;
  *  - a document's weight is the log importance ratio
  *    `sum_g log(p_target[h(g)] / p_raw[h(g)])`;
  *  - selection takes the top-k raw documents by weight (the paper
  *    adds Gumbel noise for a soft sample; we keep the deterministic
  *    top-k so the result is engine-reproducible — callers wanting the
  *    soft variant can add content-hash noise the way
  *    [[Corpus.mixtureSelect]] derives its uniforms).
  *
  * Engine-portable by construction: the bucket of a gram is the first 8
  * hex chars of `md5(gram)` read as an integer mod `buckets` (md5 and
  * hex→int exist in DuckDB as `CAST(concat('0x', …) AS BIGINT)`), and
  * the per-bucket log-ratio is rounded to 6 dp THEN scaled to an exact
  * integer micro-ratio (`round(lr_6dp * 1e6)` — within 1e-9 of an
  * integer, so every engine's rounding mode lands the same value).
  * The per-document weight is a sum of LONGS — exact in any order, no
  * float-boundary hazard — so the whole chain hash-matches an
  * independent DuckDB recompute. (A first cut summed 6-dp doubles and
  * rounded to 4 dp; one document in 500 landed on a half-ulp .00005
  * boundary where Spark's HALF_UP-on-shortest-decimal and DuckDB's
  * round-on-binary-double disagree — integer weights remove the class.)
  *
  * Scale shape (the reason this survives 100 TB):
  *  - the exploded gram stream never shuffles gram TEXT — only the
  *    int64 bucket id rides the one aggregation shuffle;
  *  - both distributions aggregate to at most `buckets` rows (map-side
  *    combine absorbs Zipf-head grams), so the log-ratio table is KBs
  *    and joins back by broadcast — the corpus-side stream is never
  *    re-partitioned for it;
  *  - the per-document sum is the second and last shuffle, keyed by the
  *    document id;
  *  - top-k selection is a rank window over the already-tiny weight
  *    frame in callers (or [[selectTopK]], which bounds it per
  *    partition first the way q_topn's plan does).
  */
object Dsir {

  /** Hashed unigram+bigram bucket stream: one row `(idCol, bucket)` per
    * gram occurrence. Empty texts contribute their single empty-string
    * unigram (both engines split `''` to `['']` — consistent, and the
    * smoothing makes the bucket harmless).
    */
  private def gramBuckets(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    // native one-loop gram hashing ([[graft.functions.DsirBuckets]]):
    // bit-identical to the HOF chain it replaces — unigrams + adjacent
    // bigrams of split(text, " "), each bucketed by the first 8 md5 hex
    // chars read as an unsigned int mod `buckets` (DsirSpec pins the
    // parity) — without the interpreted per-bigram concat lambda or the
    // per-gram hex-string + substring + string base-conversion. This
    // subtree runs over the whole corpus on every weights() call (and
    // its consumers evaluate it up to 3× in one plan).
    // is_target rides the exploded stream (a 1-byte column) so the
    // distribution split never needs a join back to the corpus.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.ExprBridge
    docs.select(col(idCol), col("is_target"),
      explode(ExprBridge.column(graft.functions.DsirBuckets(
        ExprBridge.expr(col(textCol)), Literal(buckets)))).as("bucket"))
  }

  /** The HOF reference form of [[gramBuckets]]'s per-row bucket array —
    * kept as the spec's parity oracle for the native expression (and as
    * documentation of the exact chain the DuckDB oracle mirrors).
    */
  private[graft] def gramBucketsHof(textCol: Column, buckets: Int): Column = {
    val t = split(textCol, " ")
    val bigrams = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))
    transform(concat(t, bigrams),
      g => conv(substring(md5(g), 1, 8), 16, 10).cast("long") % buckets)
  }

  /** Per-document DSIR log importance ratio. Input rows carry
    * `isTarget` (the trusted corpus membership predicate — rows where
    * it holds DEFINE the target distribution; rows where it does not
    * are the raw pool being scored). Returns one row per input
    * document: `(idCol, is_target, n_grams, dsir_logratio_micro)` —
    * the weight as an exact integer count of 1e-6 log units (divide by
    * 1e6 for the nat value). Target documents are scored too (their
    * weights are diagnostics; selection only ranks raw ones).
    */
  def weights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val flagged = docs.select(col(idCol),
      col(textCol).as("__text"), isTarget.cast("boolean").as("is_target"))
    val grams = gramBuckets(flagged, idCol, "__text", buckets)
    val counts = grams.groupBy("bucket").agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("tc"),
      sum(when(col("is_target"), 0L).otherwise(1L)).as("rc"))
    val totals = counts.agg(
      sum(col("tc")).as("tt"), sum(col("rc")).as("rt"))
    // add-1 smoothed multinomials; the ratio table is <= `buckets` rows
    // and rides as a broadcast — the 1-row totals anchor likewise.
    val ratios = counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(round(log((col("tc") + 1.0) / (col("tt") + buckets)
          / ((col("rc") + 1.0) / (col("rt") + buckets))), 6) * 1e6, 0)
          .cast("long").as("lr_micro"))
    val scored = grams.join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_grams"),
        sum(col("lr_micro")).as("dsir_logratio_micro"))
    flagged.select(col(idCol), col("is_target"))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), col("is_target"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dsir_logratio_micro"), lit(0L)).as("dsir_logratio_micro"))
  }

  /** Deterministic top-k selection over the raw pool: ranks non-target
    * documents by `(dsir_logratio_micro DESC, idCol)` and flags the
    * first `k`. Target documents rank 0 and are never selected (they
    * are already in the target corpus). The window runs over the
    * weights frame — O(docs) rows of a few columns, not the corpus
    * text — and the key is an exact integer, so ranks are reproducible
    * across engines and partitionings.
    */
  def selectTopK(weights: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("is_target")
      .orderBy(col("dsir_logratio_micro").desc, col(idCol))
    weights.withColumn("sel_rank",
        when(col("is_target"), 0L).otherwise(rank().over(w)))
      .withColumn("selected",
        (!col("is_target") && col("sel_rank") <= k).cast("boolean"))
  }
}
