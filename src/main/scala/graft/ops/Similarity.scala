package graft.ops

import graft.functions.Vec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY §2B B61/B62 +
  * north-star mandate).
  *
  * Two tiers, matching how ANN is deployed at scale:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small)
  *    query set against the (huge) corpus; one corpus scan, no shuffle of
  *    the corpus itself, per-query top-k via window. The baseline every
  *    ANN variant is measured against.
  *  - [[ivfCentroids]] / [[ivfTopK]]: IVF-style bucketed search — assign
  *    every corpus vector to a centroid bucket, probe only the nprobe
  *    closest buckets per query. At 100 TB, bucket = partition key, so
  *    probing is partition pruning; recall < 1 is the accepted trade.
  */
object Similarity {

  /** Exact cosine top-k per query. `queries` must be small enough to
    * broadcast (query_id, qvec).
    *
    * The top-k itself is the native bounded-heap aggregate
    * ([[graft.functions.TopKAgg]]): O(k) state per group with map-side
    * partials, so the shuffle moves at most k rows per partition per
    * query — not the scored corpus. The window formulation
    * (`row_number` over partitionBy(query_id)) would shuffle every
    * scored row to its query's task; with few queries that is a
    * single-task sort over the whole corpus.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    topKPerQuery(
      Par.spread(corpus).crossJoin(broadcast(queries))
        .select(col("query_id"), col("vec_id"),
          Vec.cosine6Native(col("embedding"), col("qvec")).as("cos_sim")), k)

  /** Shared tail of both search paths: (query_id, vec_id, cos_sim) rows →
    * per-query bounded-heap top-k with 1-based rank. One implementation so
    * the brute-force and IVF outputs can never drift in shape.
    */
  private[graft] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.ExprBridge
    scored.groupBy(col("query_id"))
      .agg(ExprBridge.aggColumn(graft.functions.TopKAgg(
        ExprBridge.expr(col("cos_sim")), ExprBridge.expr(col("vec_id")),
        org.apache.spark.sql.catalyst.expressions.Literal(k))).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("vec_id"),
        col("col.score").as("cos_sim"), (col("pos") + 1).as("rnk"))
  }

  /** Per-cluster mean vectors: explode to (cluster, dim, value), average
    * per (cluster, dim), re-assemble the array in dim order. Two key-hash
    * aggregations, no collect — the update step of Lloyd's at any scale.
    */
  private[graft] def meanByCluster(assigned: DataFrame, clusterCol: String): DataFrame =
    assigned.select(col(clusterCol).as("label"), posexplode(Vec.asDouble(col("embedding"))))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col")).as("v"))
      .groupBy(col("label"))
      .agg(transform(
        sort_array(collect_list(struct(col("pos"), col("v")))),
        s => s.getField("v")).as("centroid"))

  /** IVF coarse quantizer from a precomputed assignment column (the
    * fixture `label`); [[kmeansCentroids]] learns the assignment instead.
    */
  def ivfCentroids(corpus: DataFrame): DataFrame =
    meanByCluster(corpus, "label")

  /** Nearest-centroid assignment WITHOUT multiplying rows: the (small)
    * centroid set is collapsed to a single-row array and broadcast, so
    * each corpus row scans it inside one codegen'd `aggregate` HOF — no
    * shuffle, no per-(row, centroid) blowup, which is what keeps an
    * assignment pass viable over 100 TB.
    */
  def assignClusters(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    // sort_array (by label, the struct's first field) pins the scan
    // order of the ties-keep-first argmax below — assignment becomes
    // deterministic under exact cosine ties and mirrors the SQL
    // spelling `ORDER BY sim DESC, label` (q_ann_ivf's oracle)
    val centsArr = centroids
      .agg(sort_array(collect_list(struct(col("label"), col("centroid")))).as("cents"))
    corpus.crossJoin(broadcast(centsArr))
      .withColumn("cluster",
        aggregate(col("cents"),
          struct(lit(-2.0).as("sim"), lit(-1L).cast("long").as("label")),
          (acc, c) => {
            val sim = Vec.cosineNative(col("embedding"), c.getField("centroid"))
            when(sim > acc.getField("sim"),
              struct(sim.as("sim"), c.getField("label").cast("long").as("label")))
              .otherwise(acc)
          }).getField("label"))
      .drop("cents")
  }

  /** Spherical k-means (Lloyd's): seed with the first k vectors, then
    * alternate nearest-centroid assignment and per-cluster mean — all
    * DataFrame ops, nothing collected to the driver. Each iteration's
    * (tiny) centroid table is localCheckpoint'ed so the lineage doesn't
    * compound across iterations. Clusters that lose every member simply
    * drop out (k shrinks) — acceptable for a coarse quantizer.
    */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int): DataFrame =
    kmeansCentroids(corpus, k, iters, roundDp = -1)

  /** As [[kmeansCentroids]]; with `roundDp >= 0` each iteration's mean
    * centroids are rounded to that many decimals. This pins the whole
    * learned path bit-deterministic ACROSS ENGINES: `avg` sums in
    * partition-arrival order (association drift ~1e-16 run to run),
    * which rounding at 1e-6 granularity absorbs — so a fixed-iteration
    * run can be mirrored exactly by an unrolled-Lloyd SQL oracle
    * (q_ann_ivf's DuckDB twin). Cosine ranking behavior is unchanged
    * beyond the quantization (cosine is scale-invariant and the
    * rounding error is far below any real cluster margin).
    */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int,
      roundDp: Int): DataFrame =
    lloyds(corpus,
      corpus.filter(col("vec_id") < k)
        .select(col("vec_id").cast("long").as("label"),
          Vec.asDouble(col("embedding")).as("centroid")),
      iters, roundDp)

  /** As [[kmeansCentroids]], but seeded from EXPLICIT row ids of
    * `corpus` (labels 0..k-1 in `seedIds` order) instead of the global
    * `vec_id < k` convention. This is what a PER-GROUP clustering pass
    * (an IVF bucket split) needs: a hot bucket usually does not contain
    * the global ids 0..k-1, so the global seeding would come up with
    * fewer than k seeds and the "split" could never produce two halves
    * (round-11 advisor finding, high).
    */
  private[graft] def kmeansCentroidsSeeded(corpus: DataFrame,
      seedIds: Seq[Long], iters: Int, roundDp: Int): DataFrame = {
    require(seedIds.nonEmpty && seedIds.distinct.size == seedIds.size,
      s"seed ids must be non-empty and distinct, got $seedIds")
    val labelOf = seedIds.zipWithIndex
      .foldLeft(lit(-1L)) { case (acc, (id, i)) =>
        when(col("vec_id") === id, lit(i.toLong)).otherwise(acc)
      }
    lloyds(corpus,
      corpus.filter(col("vec_id").isin(seedIds: _*))
        .select(labelOf.as("label"), Vec.asDouble(col("embedding")).as("centroid")),
      iters, roundDp)
  }

  /** The shared Lloyd's loop behind both seeding conventions. */
  private def lloyds(corpus: DataFrame, seeds: DataFrame, iters: Int,
      roundDp: Int): DataFrame = {
    def maybeRound(c: DataFrame): DataFrame =
      if (roundDp < 0) c
      else c.select(col("label"),
        transform(col("centroid"), x => round(x, roundDp)).as("centroid"))
    var cents = seeds.localCheckpoint()
    for (_ <- 1 to iters)
      // cluster -1 is the sentinel for rows where every cosine was null
      // (zero-norm/null embeddings) — excluding them keeps a phantom
      // zero-vector "cluster" from materializing and persisting as a
      // probe-able bucket across iterations
      cents = maybeRound(meanByCluster(
        assignClusters(corpus, cents).filter(col("cluster") >= 0),
        "cluster")).localCheckpoint()
    cents
  }

  /** IVF search: probe the nprobe nearest centroid buckets per query,
    * exact cosine inside the probed buckets only.
    */
  /** Per-query probe-bucket ranking over the (tiny) centroid table —
    * shared by [[ivfTopK]] and the SQ8 index search. Returns
    * (query_id, qvec, label) for the nprobe nearest buckets; the window
    * shuffles queries × n_centroids rows only.
    */
  private[graft] def probeBuckets(centroids: DataFrame, queries: DataFrame,
      nprobe: Int): DataFrame = {
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("c_sim").desc, col("label"))
    queries.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qvec"), col("label"),
        Vec.cosine6Native(col("qvec"), col("centroid")).as("c_sim"))
      .withColumn("p", row_number().over(wProbe))
      .filter(col("p") <= nprobe)
      .select(col("query_id"), col("qvec"), col("label"))
  }

  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
      nprobe: Int, k: Int): DataFrame = {
    val probed = probeBuckets(centroids, queries, nprobe)
    // The in-bucket scan uses the bounded-heap aggregate — same rationale
    // as bruteForceTopK: never shuffle the scored bucket contents.
    topKPerQuery(
      corpus.join(broadcast(probed), Seq("label"))
        .select(col("query_id"), col("vec_id"),
          Vec.cosine6Native(col("embedding"), col("qvec")).as("cos_sim")), k)
  }

  /** Random-hyperplane-LSH candidate pairs, axis-aligned variant: band g's
    * code is the SIGN PATTERN of dimensions [g*bits+1 .. (g+1)*bits]; two
    * vectors are candidates iff some band's full sign pattern matches.
    * Everything is an equi-join on (band, code) — the linear-ish 100 TB
    * shape (bucket = shuffle key), no cross join anywhere — and sign
    * extraction is exact float math reproducible in the SQL oracle.
    * bands*bits must be <= the embedding dimension.
    */
  def signLshCandidates(corpus: DataFrame, bands: Int, bits: Int): DataFrame = {
    // fail fast if bands*bits overruns the vector: an out-of-range slice
    // yields [] and concat_ws "", so EVERY vector would share that band's
    // bucket — a silent all-pairs clique instead of an error
    val needed = bands * bits
    val checked = when(size(col("embedding")) >= needed, col("embedding"))
      .otherwise(raise_error(concat(
        lit(s"signLshCandidates: bands*bits=$needed exceeds embedding dim "),
        size(col("embedding")).cast("string"))))
    val banded = Par.spread(corpus).select(col("vec_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        g => concat_ws("", transform(slice(checked, g * bits + 1, lit(bits)),
          v => when(v >= 0, lit("1")).otherwise(lit("0")))))))
      .select(col("vec_id"), col("pos").as("band"), col("col").as("code"))
    val l = banded.select(col("band"), col("code"), col("vec_id").as("vec_a"))
    val r = banded.select(col("band").as("band_r"), col("code").as("code_r"),
      col("vec_id").as("vec_b"))
    l.join(r, col("band") === col("band_r")
        && col("code") === col("code_r")
        && col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
  }

  /** Near-duplicate pairs above a cosine threshold, generated the scale-
    * safe way: [[signLshCandidates]] bucket equi-join proposes pairs, an
    * exact cosine rerank keeps those above `threshold`. The result is the
    * deterministic set "pairs sharing a sign band AND cos >= threshold" —
    * exactly mirrored by the SQL oracle. Candidate recall vs the exact
    * O(n²) scan is measured in LlmSpec against [[cosineNearDupPairsExact]].
    */
  def cosineNearDupPairs(corpus: DataFrame, bands: Int, bits: Int,
      threshold: Double): DataFrame = {
    val cands = signLshCandidates(corpus, bands, bits)
    val a = corpus.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = corpus.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    cands.join(a, "vec_a").join(b, "vec_b")
      .select(col("vec_a"), col("vec_b"), Vec.cosine6Native(col("ea"), col("eb")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** SemDeDup-style semantic dedup (B139 — the embedding-space analog
    * of MinHash dedup, per the SemDeDup recipe: collapse groups of
    * semantically near-identical documents to one survivor each):
    * sign-LSH bucketed candidate pairs (never all-pairs), exact cosine
    * rerank at `threshold`, connected components over the surviving
    * edges, keep the minimum id per component. Returns one row per
    * input vector: `(vec_id, cluster_id, is_survivor)` — training-set
    * selection filters `is_survivor = 1`.
    *
    * Scale shape: candidates form only inside equal (band, code)
    * buckets ([[signLshCandidates]]); components run the same
    * iterative min-label propagation as the MinHash cluster path
    * (join+agg per round, durable pins, no driver materialization).
    */
  def semanticDedup(corpus: DataFrame, bands: Int, bits: Int,
      threshold: Double): DataFrame = {
    val edges = cosineNearDupPairs(corpus, bands, bits, threshold)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    Dedup.connectedComponents(
        corpus.select(col("vec_id").as("doc_id")), edges)
      .select(col("doc_id").as("vec_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).cast("int").as("is_survivor"))
  }

  /** Exact all-pairs variant — O(n²) BroadcastNestedLoopJoin by
    * construction, so strictly a TEST-SCALE ground-truth generator for
    * measuring [[cosineNearDupPairs]] recall (LlmSpec). Never ship this
    * shape against a full corpus; the id bound is mandatory.
    */
  def cosineNearDupPairsExact(corpus: DataFrame, maxId: Long, threshold: Double): DataFrame = {
    val a = corpus.filter(col("vec_id") <= maxId)
      .select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = corpus.filter(col("vec_id") <= maxId)
      .select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), Vec.cosine6Native(col("ea"), col("eb")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
