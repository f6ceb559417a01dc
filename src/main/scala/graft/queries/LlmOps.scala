package graft.queries

import graft.Q
import graft.io.Tables
import graft.functions.Vec
import graft.ops.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operator queries (SURVEY §2B B59–B64): dedup,
  * similarity search, text analysis, multimodal struct assembly — each
  * wired to the `documents` / `embeddings` fixtures with a DuckDB oracle
  * where the computation is engine-portable (md5, token sets, DOUBLE
  * vector math), and rows-only + ScalaTest where it is not
  * (xxhash64-based MinHash/SimHash, IVF probing).
  */
object LlmOps extends QueryModule {

  val queries: Map[String, Q] = Map(
    // B59 exact dedup stats via content digest.
    "q_exact_dedup" -> ((s, dir) => {
      Dedup.exactDupStats(Tables.documents(s, dir))
        .agg(count(lit(1)).as("n_distinct_texts"),
          sum(col("n_docs")).as("n_docs"),
          sum(when(col("n_docs") > 1, 1).otherwise(0)).as("n_dup_groups"))
    }),

    // B59/fingerprint: md5 digest per document.
    "q_doc_fingerprint" -> ((s, dir) => {
      TextAnalysis.fingerprint(Tables.documents(s, dir))
        .orderBy("doc_id")
    }),

    // B60 exact n-gram (3-shingle) Jaccard reranking of md5-LSH candidate
    // pairs — the scale-safe candidate→verify dedup pipeline end-to-end.
    "q_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), n = 3,
          bands = 4, rowsPerBand = 4,
          sigCacheKey = Some(Tables.srcStamp(dir, "documents")))
        .orderBy("doc_a", "doc_b")
    }),

    // B60 MinHash+LSH candidate pairs — xxhash64-based, rows-only check
    // (LlmSpec asserts candidate quality against exact Jaccard).
    "q_minhash_lsh" -> ((s, dir) => {
      // fixture-stamped signature cache: the per-run pin write was the
      // round-9 bench regression; a regenerated fixture invalidates it
      Dedup.minhashCandidates(Tables.documents(s, dir), n = 2, bands = 8, rowsPerBand = 4,
          sigCacheKey = Some(Tables.srcStamp(dir, "documents")))
        .orderBy("doc_a", "doc_b")
    }),

    // B60 engine-portable MinHash signatures (md5 permutations),
    // flattened to (doc_id, perm, mh) scalars — hash-matched in DuckDB.
    "q_minhash_sig_md5" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          Dedup.minhashSignatureMd5(col("text"), n = 3, numPerm = 16).as("sig"))
        .select(col("doc_id"), posexplode(col("sig")))
        .select(col("doc_id"), (col("pos") + 1).cast("int").as("perm"),
          col("col").as("mh"))
        .orderBy("doc_id", "perm")
    }),

    // B60 LSH candidate pairs over the md5 signatures — the full
    // signature→band→bucket→join path, hash-matched in DuckDB.
    "q_minhash_pairs_md5" -> ((s, dir) => {
      Dedup.minhashCandidatesMd5(Tables.documents(s, dir), n = 3,
          bands = 4, rowsPerBand = 4,
          sigCacheKey = Some(Tables.srcStamp(dir, "documents")))
        .orderBy("doc_a", "doc_b")
    }),

    // B152 persisted near-dup index: candidates of the doc_id%10==0
    // probe batch against the indexed corpus (built on %10∉{0,5}, with
    // %10==5 APPENDED O(delta) — the oracled result covers build,
    // incremental append, and the bloom-pruned broadcast probe; the
    // oracle recomputes the same md5 signature/band chain over the
    // corpus split in DuckDB).
    "q_neardup_index" -> ((s, dir) => {
      val root = neardupIndexTable(s, dir)
      graft.ops.NearDupIndex.candidates(s,
          Tables.documents(s, dir).filter(col("doc_id") % 10 === 0), root)
        .orderBy("probe_id", "match_id")
    }),

    // B158 the INCREMENTAL ingest flagship — the operating mode a
    // 100 TB corpus actually lives in (continuous crawl batches, never
    // batch rebuilds): the %10==0 batch arrives against the standing
    // indexed corpus and flows through (1) near-dup rejection via the
    // persisted index probe, (2) a token-count quality gate, (3) DSIR
    // corpus-likeness ranking (the standing corpus IS the target
    // distribution — "does the new data look like what we curated"),
    // (4) top-k acceptance. Every stage is an already-oracled operator;
    // the composite hash proves the whole admission decision.
    "q_incr_ingest" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val root = neardupIndexTable(s, dir)
      val docs = Tables.documents(s, dir)
      val batch = docs.filter(col("doc_id") % 10 === 0)
      val dups = graft.ops.NearDupIndex.candidates(s, batch, root)
        .groupBy(col("probe_id").as("doc_id"))
        .agg(count(lit(1)).as("n_dup_matches"))
      val toks = batch.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val w = graft.ops.Dsir.weights(docs, "doc_id", "text",
        isTarget = col("doc_id") % 10 =!= 0, buckets = 1024)
      // base is consumed twice (final join + ranking input) and stays
      // LAZY on purpose: Catalyst dedups the repeated subtree via
      // exchange reuse within the one job, while an eager
      // localCheckpoint here re-materializes the probe + DSIR chains at
      // every query CONSTRUCTION — measured 1.0 s → 7.9 s at sf0.1
      // (8× worse) when tried
      val base = toks
        .join(dups, Seq("doc_id"), "left")
        .join(w.select(col("doc_id"), col("dsir_logratio_micro")), Seq("doc_id"))
        .withColumn("n_dup_matches", coalesce(col("n_dup_matches"), lit(0L)))
      val ranked = base
        .filter(col("n_dup_matches") === 0 && col("n_tokens") >= 50)
        .withColumn("sel_rank", rank().over(
          Window.orderBy(col("dsir_logratio_micro").desc, col("doc_id")))
          .cast("long"))
      base.join(ranked.select("doc_id", "sel_rank"), Seq("doc_id"), "left")
        .withColumn("sel_rank", coalesce(col("sel_rank"), lit(0L)))
        .withColumn("accepted",
          (col("sel_rank") >= 1L && col("sel_rank") <= 25L).cast("boolean"))
        .select("doc_id", "n_dup_matches", "n_tokens",
          "dsir_logratio_micro", "sel_rank", "accepted")
        .orderBy("doc_id")
    }),

    // B60 SimHash bit-signatures — rows-only check (LlmSpec covers
    // hamming locality).
    "q_simhash" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), Dedup.simhashBits(col("text")).as("simhash"))
        .orderBy("doc_id")
    }),

    // B60 engine-portable SimHash (md5 top-bit hashes) — hash-matched in
    // DuckDB bit-for-bit; the xxhash64 production path above stays
    // rows-only with its hamming-locality spec.
    "q_simhash_md5" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), Dedup.simhashBitsMd5(col("text")).as("simhash"))
        .orderBy("doc_id")
    }),

    // B61/B62 brute-force cosine top-10 against the vec_id=0 query vector.
    "q_cosine_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === 0)
        .select(lit(0L).as("query_id"), col("embedding").as("qvec"))
      Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0), q, 10)
        .select(col("vec_id"), col("cos_sim"),
          col("rnk").cast("int").as("rnk"))
        .orderBy("rnk")
    }),

    // B62 through the ENGINE door: the same top-k as q_cosine_topk but
    // declared via AnnRewrite.annTopK — the AnnTopKMarker logical node
    // is expanded to the brute-force plan by the optimizer RULE (no
    // centroids registered), so the oracle hash-checks the whole
    // marker → rewrite → execute path, not just the library function.
    "q_ann_rewrite" -> ((s, dir) => {
      graft.plans.AnnRewrite.clearCentroids(s) // pin the exact path
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === 0)
        .select(lit(0L).as("query_id"), col("embedding").as("qvec"))
      graft.plans.AnnRewrite.annTopK(emb.filter(col("vec_id") =!= 0), q, 10)
        .select(col("vec_id"), col("cos_sim"),
          col("rnk").cast("int").as("rnk"))
        .orderBy("rnk")
    }),

    // B61 embedding near-dup pairs: sign-LSH bucket candidates + exact
    // cosine rerank over the FULL corpus (no id bound — the plan is
    // equi-join-only, so it scales; threshold 0.4 is calibrated to the
    // fixture's near-random embeddings so the result is non-empty).
    "q_embed_neardup" -> ((s, dir) => {
      Similarity.cosineNearDupPairs(Tables.embeddings(s, dir),
          bands = 8, bits = 8, threshold = 0.4)
        .orderBy("vec_a", "vec_b")
    }),

    // B139 SemDeDup-style semantic dedup: near-duplicate groups in
    // EMBEDDING space collapse to one survivor each — the same edges as
    // q_embed_neardup (sign-LSH buckets + exact cosine ≥ 0.4), closed
    // into components, minimum id survives. The oracle recomputes the
    // pairs AND the transitive closure (recursive CTE), so the hash
    // proves bucketing, rerank, and clustering end to end.
    "q_semantic_dedup" -> ((s, dir) => {
      Similarity.semanticDedup(Tables.embeddings(s, dir),
          bands = 8, bits = 8, threshold = 0.4)
        .orderBy("vec_id")
    }),

    // B61 per-label centroid vectors (the class-prototype computation
    // classifier-based quality filters train on): posexplode to
    // (label, dim, value), one keyed avg — the vector mean without ever
    // holding a group's vectors in one task. Flat (label, dim) output
    // keeps the oracle exact.
    "q_label_centroids" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), (col("pos") + 1).cast("int").as("dim"))
        .agg(round(avg(col("col").cast("double")), 6).as("centroid"))
        .orderBy("label", "dim")
    }),

    // B163 cluster-balanced (diversity) sampling — the pretraining-mix
    // move that keeps a sampled corpus from collapsing onto its densest
    // semantic region: assign every vector to its nearest of k
    // deterministic centroids (per-label dimension means, 6dp — the
    // q_label_centroids quantities, so the "clustering" is
    // engine-recomputable), then take the first n per cluster — equal
    // representation per semantic region regardless of region size.
    // Scale: centroids are k tiny rows (broadcast); the corpus is
    // scanned ONCE against all k (a broadcast nested loop over a
    // constant k, not a shuffle join); argmax and per-cluster rank are
    // two windows keyed by the natural keys. The oracle recomputes the
    // whole chain — centroid means, dot products, argmax with the
    // label tie-break, per-cluster rank — in DuckDB.
    "q_cluster_sample" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, dir)
      val cents = emb.select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("c"))
        .groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          x => x("c")).as("cvec"))
        .withColumnRenamed("label", "cluster")
      val dots = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cluster"),
          round(Vec.dot(col("embedding"), col("cvec")), 6).as("sim"))
      val assigned = dots.withColumn("rk", row_number().over(
          Window.partitionBy(col("vec_id"))
            .orderBy(col("sim").desc, col("cluster"))))
        .filter(col("rk") === 1)
      assigned.withColumn("sk", row_number().over(
          Window.partitionBy(col("cluster")).orderBy(col("vec_id"))))
        .filter(col("sk") <= 20)
        .select(col("cluster"), col("vec_id"), col("sim"))
        .orderBy("cluster", "vec_id")
    }),

    // B61 vector norms (embeddings are L2-normalized — the oracle doubles
    // as a data-quality assertion).
    "q_embed_norms" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          round(Vec.norm(col("embedding")), 6).as("l2_norm"),
          size(col("embedding")).as("dim"))
        .orderBy("vec_id")
    }),

    // B62 IVF (bucketed ANN) over LEARNED k-means centroids — rows-only;
    // LlmSpec measures recall vs brute force.
    "q_ann_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // roundDp=6 pins the learned quantizer engine-deterministic, so
      // this path is HASH-matched against an unrolled-Lloyd DuckDB
      // oracle (round-10: q_ann_ivf leaves the rows-only list). The
      // learned centroids are memoized under the fixture content stamp
      // — Lloyd runs once per fixture generation, not per query run
      // (the same Pin.cachedStable idiom as the LSH signatures)
      val centroids = graft.ops.Pin.cachedStable(s,
        Tables.srcStamp(dir, "embeddings") + "|kmeans:8:3:6")(
        Similarity.kmeansCentroids(emb, k = 8, iters = 3, roundDp = 6))
      // bucket the corpus by the LEARNED assignment (at scale this is the
      // partition key the index is written with)
      val bucketed = Similarity.assignClusters(emb, centroids)
        .drop("label").withColumnRenamed("cluster", "label")
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      Similarity.ivfTopK(bucketed, centroids, qs, nprobe = 2, k = 10)
        .select("query_id", "vec_id", "cos_sim", "rnk")
        .orderBy("query_id", "rnk")
    }),

    // B62 IVF with a FIXED bucket assignment (the fixture `label` column)
    // instead of learned k-means — same probe/search machinery as
    // q_ann_ivf, but fully deterministic, so the whole path gets a
    // hash-green oracle: per-label mean centroids, nprobe=2 probe ranking
    // (c_sim DESC, label), exact cosine inside the probed buckets, top-10
    // per query (cos_sim DESC, vec_id). At scale `label` is the partition
    // key the index layout is written with, so probing = partition pruning.
    "q_ann_ivf_fixed" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centroids = Similarity.ivfCentroids(emb)
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      Similarity.ivfTopK(emb, centroids, qs, nprobe = 2, k = 10)
        .select(col("query_id"), col("vec_id"), col("cos_sim"),
          col("rnk").cast("int").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    // B63 token counting (whitespace + BPE-ish regex).
    "q_token_stats" -> ((s, dir) => {
      TextAnalysis.tokenStats(Tables.documents(s, dir))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ws_tokens")).as("total_ws_tokens"),
          sum(col("bpe_tokens")).as("total_bpe_tokens"),
          round(avg(col("n_chars_measured")), 4).as("avg_chars"))
        .orderBy("lang")
    }),

    // B63 quality scoring.
    "q_quality_score" -> ((s, dir) => {
      TextAnalysis.qualityScore(Tables.documents(s, dir))
        .select("doc_id", "n_tokens", "punct_ratio", "stop_ratio",
          "avg_token_len", "quality")
        .orderBy("doc_id")
    }),

    // B63 heuristic language ID.
    "q_langid" -> ((s, dir) => {
      TextAnalysis.languageId(Tables.documents(s, dir))
        .groupBy("predicted_lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("predicted_lang")
    }),

    // Text scrubbing: regex redaction chain (PII-shaped pre-training pass).
    "q_redact" -> ((s, dir) => {
      TextAnalysis.redact(Tables.documents(s, dir))
        .select(col("doc_id"),
          length(col("text_redacted")).as("len_redacted"),
          (length(col("text")) - length(col("text_redacted"))).as("chars_removed"),
          substring(col("text_redacted"), 1, 40).as("head40"))
        .orderBy("doc_id")
    }),

    // Embedding int8 quantization round-trip, hash-oracled (round-10
    // verdict item 6): the encode/decode chain is deterministic double
    // arithmetic — scale = max|x|/127, codes = round(x/scale), dequant =
    // code*scale — and both engines round doubles half-away-from-zero,
    // so the DuckDB mirror reproduces it exactly; the 6-dp rounding on
    // both outputs absorbs summation-order drift in the cosine. LlmSpec
    // additionally bounds the round-trip cosine at > 0.999.
    "q_quantize_roundtrip" -> ((s, dir) => {
      val q = Vec.quantizeInt8(col("embedding"))
      Tables.embeddings(s, dir)
        .select(col("vec_id"), q.as("q"), col("embedding"))
        .select(col("vec_id"),
          round(col("q.scale"), 6).as("scale6"),
          Vec.cosine6(col("embedding"),
            Vec.dequantizeInt8(col("q"))).as("rt_cosine"))
        .orderBy("vec_id")
    }),

    // B63 word count — the canonical Storm/gostream demo over documents.
    "q_word_count" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(50)
    }),

    // B64 multimodal struct assembly: documents × embeddings, projected
    // to scalars for the hash compare.
    "q_multimodal_struct" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      docs.join(emb, col("doc_id") === col("vec_id"))
        .select(struct(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"), col("embedding")).as("doc"))
        .select(col("doc.doc_id").as("doc_id"),
          col("doc.lang").as("lang"),
          col("doc.n_chars").as("n_chars"),
          length(col("doc.text")).as("text_len"),
          size(col("doc.embedding")).as("dim"),
          round(Vec.norm(col("doc.embedding")), 6).as("l2_norm"))
        .orderBy("doc_id")
    }),

    // B64 frame/chunk sampling as an ORACLED operator: every 32nd-byte
    // slice of the binary payload, 16 bytes each, at most 4 frames per
    // row — the bounded-output explode a video/audio sampler runs before
    // a decode stage. Frames surface as md5 digests (DuckDB recomputes
    // the identical substring arithmetic on the text the payload was
    // packed from), so the hash compare proves the slice boundaries,
    // the last-frame fencepost, and the bounded fan-out byte-exact.
    "q_frame_sample" -> ((s, dir) => {
      val media = graft.ops.Multimodal.packBinary(Tables.documents(s, dir))
      graft.ops.Multimodal.frameSample(media, frameBytes = 16, stride = 32,
          maxFrames = 4)
        .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
          md5(col("frame")).as("frame_md5"),
          octet_length(col("frame")).cast("long").as("n_bytes"))
        .orderBy("doc_id", "frame_no")
    }),

    // B125 persisted IVF index: the same fixed-quantizer search as
    // q_ann_ivf_fixed, but served from the bucket-partitioned index
    // TABLE (built once, cached across runs) with dynamic partition
    // pruning skipping unprobed bucket dirs at the scan — build-once /
    // probe-many ANN riding the versioned table tier. Same oracle as
    // the in-session path: a hash match proves persistence and pruning
    // change nothing about the answer.
    "q_ann_index" -> ((s, dir) => {
      val root = annIndexTable(s, dir)
      val qs = Tables.embeddings(s, dir).filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      graft.ops.AnnIndex.search(s, root, qs, nprobe = 2, k = 10)
        .select(col("query_id"), col("vec_id"), col("cos_sim"),
          col("rnk").cast("int").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    // B125 + SQ8 in-bucket compression (round-9 item 7): the same index
    // search served two-stage — int8-code shortlist (column-pruned scan
    // reads 1-byte codes, not 4-byte floats) + exact float re-rank of
    // the shortlist only. Shares q_ann_index's oracle: the re-rank makes
    // compression invisible in the answer, and the hash match proves it.
    "q_ann_pq" -> ((s, dir) => {
      val root = annSq8Table(s, dir)
      val qs = Tables.embeddings(s, dir).filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      graft.ops.AnnIndex.searchSq8(s, root, qs, nprobe = 2, k = 10)
        .select(col("query_id"), col("vec_id"), col("cos_sim"),
          col("rnk").cast("int").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    // B125 + TRUE product quantization (round-10): stage 1 ranks a
    // shortlist entirely on M-byte PQ codes via the codegen'd ADC
    // gather (a per-query LUT over the persisted `_pq` codebooks — at
    // M=8 over 64 dims the probe reads 32x fewer code bytes than
    // floats), stage 2 exact-reranks the shortlist. Shares the flat
    // search's oracle: the re-rank makes the compression invisible in
    // the answer, and the hash match proves it.
    "q_ann_pq_codebook" -> ((s, dir) => {
      val root = annPqTable(s, dir)
      val qs = Tables.embeddings(s, dir).filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      graft.ops.AnnIndex.searchPq(s, root, qs, nprobe = 2, k = 10)
        .select(col("query_id"), col("vec_id"), col("cos_sim"),
          col("rnk").cast("int").as("rnk"))
        .orderBy("query_id", "rnk")
    }),
  )

  /** Cached persisted IVF index over the embeddings fixture (B125):
    * built with the FIXED fixture-label quantizer so the search is
    * deterministic and shares q_ann_ivf_fixed's oracle. Rebuilt when
    * the fixture changes; the `_centroids` sidecar doubles as the
    * completion marker (it lands after the data commit).
    */
  /** Persisted near-dup index fixture for q_neardup_index (B152): built
    * over doc_id % 10 ∉ {0, 5}, then doc_id % 10 = 5 APPENDED (so the
    * oracled probe exercises the incremental path too); doc_id % 10 = 0
    * stays out as the probe batch. Cached per sf dir by content stamp.
    */
  private def neardupIndexTable(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    this.synchronized {
      import java.nio.file.{Files, Paths}
      import graft.ops.{NearDupIndex, Sinks}
      val root = "/tmp/graft_ndidx_" + dir.replaceAll("[^A-Za-z0-9.]", "_") + "/nd"
      val stampFile = Paths.get(root, "_SRCSTAMP")
      val stamp = "nd1:" + Tables.srcStamp(dir, "documents")
      val fresh = Files.isDirectory(Paths.get(root)) &&
        Sinks.listVersions(root) == Seq(0L, 1L) &&
        Files.exists(stampFile) &&
        new String(Files.readAllBytes(stampFile), "UTF-8").trim == stamp
      if (!fresh) {
        graft.io.Fs.deleteRecursively(Paths.get(root).getParent)
        val docs = Tables.documents(s, dir)
        NearDupIndex.build(s,
          docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5), root)
        NearDupIndex.append(s, docs.filter(col("doc_id") % 10 === 5), root)
        Files.write(stampFile, stamp.getBytes("UTF-8"))
      }
      root
    }

  private def annIndexTable(s: org.apache.spark.sql.SparkSession, dir: String): String =
    this.synchronized {
      import java.nio.file.{Files, Paths}
      import graft.ops.{AnnIndex, Sinks}
      val root = "/tmp/graft_annidx_" + dir.replaceAll("[^A-Za-z0-9.]", "_") + "/emb"
      val stampFile = Paths.get(root, "_SRCSTAMP")
      // content-stamp equality, not >=-mtime: an epoch-stamped
      // regenerated fixture must still invalidate the cached index
      val stamp = Tables.srcStamp(dir, "embeddings")
      val fresh = Files.isDirectory(Paths.get(root)) &&
        Sinks.listVersions(root) == Seq(0L) &&
        Files.isDirectory(Paths.get(Sinks.versionPath(root, 0L) + "/" +
          AnnIndex.CentroidsSidecar)) &&
        Files.exists(stampFile) &&
        new String(Files.readAllBytes(stampFile), "UTF-8").trim == stamp
      if (!fresh) {
        graft.io.Fs.deleteRecursively(Paths.get(root).getParent)
        AnnIndex.buildFixed(s, Tables.embeddings(s, dir), root)
        Files.write(stampFile, stamp.getBytes("UTF-8"))
      }
      root
    }

  /** As [[annIndexTable]] but built with SQ8 codes ([[q_ann_pq]]'s
    * two-stage serving path). A separate directory: the flat and
    * compressed indexes coexist like any two tables.
    */
  private def annSq8Table(s: org.apache.spark.sql.SparkSession, dir: String): String =
    this.synchronized {
      import java.nio.file.{Files, Paths}
      import graft.ops.{AnnIndex, Sinks}
      val root = "/tmp/graft_annsq8_" + dir.replaceAll("[^A-Za-z0-9.]", "_") + "/emb"
      val stampFile = Paths.get(root, "_SRCSTAMP")
      val stamp = Tables.srcStamp(dir, "embeddings")
      val fresh = Files.isDirectory(Paths.get(root)) &&
        Sinks.listVersions(root) == Seq(0L) &&
        Files.isDirectory(Paths.get(Sinks.versionPath(root, 0L) + "/" +
          AnnIndex.CentroidsSidecar)) &&
        Files.exists(stampFile) &&
        new String(Files.readAllBytes(stampFile), "UTF-8").trim == stamp
      if (!fresh) {
        graft.io.Fs.deleteRecursively(Paths.get(root).getParent)
        AnnIndex.buildFixedSq8(s, Tables.embeddings(s, dir), root)
        Files.write(stampFile, stamp.getBytes("UTF-8"))
      }
      root
    }

  /** As [[annSq8Table]] but with true PQ codebooks ([[q_ann_pq_codebook]]). */
  private def annPqTable(s: org.apache.spark.sql.SparkSession, dir: String): String =
    this.synchronized {
      import java.nio.file.{Files, Paths}
      import graft.ops.{AnnIndex, Pq, Sinks}
      val root = "/tmp/graft_annpq_" + dir.replaceAll("[^A-Za-z0-9.]", "_") + "/emb"
      val stampFile = Paths.get(root, "_SRCSTAMP")
      val stamp = Tables.srcStamp(dir, "embeddings")
      val fresh = Files.isDirectory(Paths.get(root)) &&
        Sinks.listVersions(root) == Seq(0L) &&
        Files.isDirectory(Paths.get(Sinks.versionPath(root, 0L) + "/" +
          Pq.Sidecar)) &&
        Files.exists(stampFile) &&
        new String(Files.readAllBytes(stampFile), "UTF-8").trim == stamp
      if (!fresh) {
        graft.io.Fs.deleteRecursively(Paths.get(root).getParent)
        AnnIndex.buildFixedPq(s, Tables.embeddings(s, dir), root)
        Files.write(stampFile, stamp.getBytes("UTF-8"))
      }
      root
    }

  val oracles: Map[String, String] = Map(
    // deterministic double chain mirrored exactly; 6-dp rounding on both
    // outputs absorbs cosine summation-order drift (see the query note)
    "q_quantize_roundtrip" ->
      """WITH sc AS (
        |  SELECT vec_id, emb,
        |    CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END AS scale
        |  FROM (SELECT vec_id,
        |          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
        |          list_max(list_transform(embedding,
        |            x -> abs(CAST(x AS DOUBLE)))) AS mx
        |        FROM embeddings)),
        |rt AS (
        |  SELECT vec_id, scale, emb,
        |    list_transform(emb, x -> round(x / scale) * scale) AS deq
        |  FROM sc)
        |SELECT vec_id, round(scale, 6) AS scale6,
        |  round(sum(emb[g.i] * deq[g.i]) /
        |    (sqrt(sum(emb[g.i] * emb[g.i])) * sqrt(sum(deq[g.i] * deq[g.i]))),
        |    6) AS rt_cosine
        |FROM rt, generate_series(1, 64) g(i)
        |GROUP BY vec_id, scale
        |ORDER BY vec_id""".stripMargin,

    "q_exact_dedup" ->
      """SELECT count(*) AS n_distinct_texts,
        | CAST(sum(n_docs) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups
        |FROM (SELECT md5(text) AS digest, count(*) AS n_docs, min(doc_id) AS survivor_id
        |      FROM documents GROUP BY 1)""".stripMargin,

    "q_doc_fingerprint" ->
      """SELECT doc_id, md5(text) AS digest, substring(md5(text),1,8) AS digest8,
        | CAST(length(text) AS INTEGER) AS n_chars_measured
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH ex AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(string_split(text,' '))-2),
        |    i -> concat_ws(' ', string_split(text,' ')[i],
        |      string_split(text,' ')[i+1], string_split(text,' ')[i+2]))) AS sg
        |  FROM documents),
        |mh AS (
        |  SELECT doc_id, g.i AS i, min(md5(sg || '#' || CAST(g.i AS VARCHAR))) AS v
        |  FROM ex, generate_series(1,16) g(i) GROUP BY doc_id, g.i),
        |bd AS (
        |  SELECT doc_id, (i-1)//4 AS band, string_agg(v, ',' ORDER BY i) AS bucket
        |  FROM mh GROUP BY doc_id, band),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bd a JOIN bd b
        |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(string_split(text,' '))-2),
        |    i -> concat_ws(' ', string_split(text,' ')[i],
        |      string_split(text,' ')[i+1], string_split(text,' ')[i+2]))) AS s
        |  FROM documents)
        |SELECT c.doc_a, c.doc_b,
        | round(CAST(len(list_filter(x.s, v -> list_contains(y.s, v))) AS DOUBLE)
        |   / len(list_distinct(list_concat(x.s, y.s))), 6) AS jaccard
        |FROM cand c JOIN sh x ON x.doc_id = c.doc_a JOIN sh y ON y.doc_id = c.doc_b
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_minhash_sig_md5" ->
      """WITH ex AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(string_split(text,' '))-2),
        |    i -> concat_ws(' ', string_split(text,' ')[i],
        |      string_split(text,' ')[i+1], string_split(text,' ')[i+2]))) AS sg
        |  FROM documents)
        |SELECT doc_id, CAST(g.i AS INTEGER) AS perm,
        | min(md5(sg || '#' || CAST(g.i AS VARCHAR))) AS mh
        |FROM ex, generate_series(1,16) g(i)
        |GROUP BY doc_id, g.i
        |ORDER BY doc_id, perm""".stripMargin,

    "q_minhash_pairs_md5" ->
      """WITH ex AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(string_split(text,' '))-2),
        |    i -> concat_ws(' ', string_split(text,' ')[i],
        |      string_split(text,' ')[i+1], string_split(text,' ')[i+2]))) AS sg
        |  FROM documents),
        |mh AS (
        |  SELECT doc_id, g.i AS i, min(md5(sg || '#' || CAST(g.i AS VARCHAR))) AS v
        |  FROM ex, generate_series(1,16) g(i) GROUP BY doc_id, g.i),
        |bd AS (
        |  SELECT doc_id, (i-1)//4 AS band, string_agg(v, ',' ORDER BY i) AS bucket
        |  FROM mh GROUP BY doc_id, band)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM bd a JOIN bd b
        |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,

    // the incremental-admission composite: near-dup chain + token gate
    // + DSIR chain + rank, all recomputed from the raw fixture
    "q_incr_ingest" ->
      """WITH ex AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(string_split(text,' '))-2),
        |    i -> concat_ws(' ', string_split(text,' ')[i],
        |      string_split(text,' ')[i+1], string_split(text,' ')[i+2]))) AS sg
        |  FROM documents),
        |mh AS (
        |  SELECT doc_id, g.i AS i, min(md5(sg || '#' || CAST(g.i AS VARCHAR))) AS v
        |  FROM ex, generate_series(1,16) g(i) GROUP BY doc_id, g.i),
        |bd AS (
        |  SELECT doc_id, (i-1)//4 AS band, string_agg(v, ',' ORDER BY i) AS bucket
        |  FROM mh GROUP BY doc_id, band),
        |dups AS (
        |  SELECT a.doc_id, count(DISTINCT b.doc_id) AS n_dup_matches
        |  FROM bd a JOIN bd b ON a.band = b.band AND a.bucket = b.bucket
        |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
        |  GROUP BY a.doc_id),
        |d AS (SELECT doc_id, (doc_id % 10 <> 0) AS is_target,
        |        string_split(text, ' ') AS t FROM documents),
        |uni AS (SELECT doc_id, is_target, unnest(t) AS g FROM d),
        |bi AS (SELECT doc_id, is_target, t[i] || ' ' || t[i + 1] AS g
        |       FROM (SELECT doc_id, is_target, t,
        |               unnest(generate_series(1, len(t) - 1)) AS i
        |             FROM d WHERE len(t) >= 2)),
        |grams AS (SELECT doc_id, is_target,
        |    CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT) % 1024 AS bucket
        |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
        |counts AS (SELECT bucket,
        |    sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS tc,
        |    sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS rc
        |  FROM grams GROUP BY bucket),
        |tot AS (SELECT sum(tc) AS tt, sum(rc) AS rt FROM counts),
        |lr AS (SELECT bucket,
        |    CAST(round(round(
        |        ln(((tc + 1.0) / (tt + 1024)) / ((rc + 1.0) / (rt + 1024))),
        |      6) * 1000000, 0) AS BIGINT) AS lr_micro
        |  FROM counts, tot),
        |wts AS (SELECT doc_id, sum(lr_micro) AS dsir_logratio_micro
        |  FROM grams JOIN lr USING (bucket) GROUP BY doc_id),
        |base AS (
        |  SELECT d2.doc_id,
        |    coalesce(dp.n_dup_matches, 0) AS n_dup_matches,
        |    len(string_split(d2.text, ' ')) AS n_tokens,
        |    coalesce(w.dsir_logratio_micro, 0) AS dsir_logratio_micro
        |  FROM documents d2
        |  LEFT JOIN dups dp ON d2.doc_id = dp.doc_id
        |  LEFT JOIN wts w ON d2.doc_id = w.doc_id
        |  WHERE d2.doc_id % 10 = 0),
        |r AS (SELECT doc_id,
        |    rank() OVER (ORDER BY dsir_logratio_micro DESC, doc_id) AS sel_rank
        |  FROM base WHERE n_dup_matches = 0 AND n_tokens >= 50)
        |SELECT b.doc_id, CAST(b.n_dup_matches AS BIGINT) AS n_dup_matches,
        |  CAST(b.n_tokens AS BIGINT) AS n_tokens,
        |  CAST(b.dsir_logratio_micro AS BIGINT) AS dsir_logratio_micro,
        |  CAST(coalesce(r.sel_rank, 0) AS BIGINT) AS sel_rank,
        |  (coalesce(r.sel_rank, 0) BETWEEN 1 AND 25) AS accepted
        |FROM base b LEFT JOIN r ON b.doc_id = r.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    "q_neardup_index" ->
      """WITH ex AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(string_split(text,' '))-2),
        |    i -> concat_ws(' ', string_split(text,' ')[i],
        |      string_split(text,' ')[i+1], string_split(text,' ')[i+2]))) AS sg
        |  FROM documents),
        |mh AS (
        |  SELECT doc_id, g.i AS i, min(md5(sg || '#' || CAST(g.i AS VARCHAR))) AS v
        |  FROM ex, generate_series(1,16) g(i) GROUP BY doc_id, g.i),
        |bd AS (
        |  SELECT doc_id, (i-1)//4 AS band, string_agg(v, ',' ORDER BY i) AS bucket
        |  FROM mh GROUP BY doc_id, band)
        |SELECT DISTINCT a.doc_id AS probe_id, b.doc_id AS match_id
        |FROM bd a JOIN bd b ON a.band = b.band AND a.bucket = b.bucket
        |WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
        |ORDER BY probe_id, match_id""".stripMargin,

    "q_simhash_md5" ->
      """WITH toks AS (
        |  SELECT doc_id, u.t
        |  FROM documents, unnest(string_split(text, ' ')) AS u(t)),
        |bits AS (
        |  SELECT doc_id, g.b,
        |    CASE WHEN sum(CASE WHEN substring(md5(t || '#' || CAST(g.b AS VARCHAR)), 1, 1) >= '8'
        |      THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END AS bit
        |  FROM toks, generate_series(0, 63) g(b)
        |  GROUP BY doc_id, g.b)
        |SELECT doc_id, string_agg(bit, '' ORDER BY b) AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |sims AS (
        |  SELECT e.vec_id,
        |    round(sum(CAST(e.embedding[g.i] AS DOUBLE)*CAST(q.qe[g.i] AS DOUBLE)) /
        |      (sqrt(sum(CAST(e.embedding[g.i] AS DOUBLE)*CAST(e.embedding[g.i] AS DOUBLE))) *
        |       sqrt(sum(CAST(q.qe[g.i] AS DOUBLE)*CAST(q.qe[g.i] AS DOUBLE)))), 6) AS cos_sim
        |  FROM embeddings e, generate_series(1,64) g(i), q
        |  WHERE e.vec_id <> 0
        |  GROUP BY e.vec_id)
        |SELECT vec_id, cos_sim,
        | CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rnk
        |FROM sims ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    // identical result contract to q_cosine_topk — the rule must be
    // result-invariant when no index is registered
    "q_ann_rewrite" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |sims AS (
        |  SELECT e.vec_id,
        |    round(sum(CAST(e.embedding[g.i] AS DOUBLE)*CAST(q.qe[g.i] AS DOUBLE)) /
        |      (sqrt(sum(CAST(e.embedding[g.i] AS DOUBLE)*CAST(e.embedding[g.i] AS DOUBLE))) *
        |       sqrt(sum(CAST(q.qe[g.i] AS DOUBLE)*CAST(q.qe[g.i] AS DOUBLE)))), 6) AS cos_sim
        |  FROM embeddings e, generate_series(1,64) g(i), q
        |  WHERE e.vec_id <> 0
        |  GROUP BY e.vec_id)
        |SELECT vec_id, cos_sim,
        | CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rnk
        |FROM sims ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    "q_ann_ivf_fixed" -> annIvfFixedSql,
    // B125: the persisted index serves the SAME fixed-quantizer search —
    // one oracle, two serving paths (in-session vs index table).
    "q_ann_index" -> annIvfFixedSql,
    // SQ8 + exact re-rank must land on the identical top-k: one oracle,
    // three serving paths.
    "q_ann_pq" -> annIvfFixedSql,
    "q_ann_pq_codebook" -> annIvfFixedSql,
    // round-10: the LEARNED path leaves the rows-only list — the 6dp
    // centroid rounding makes fixed-iteration Lloyd engine-exact, so
    // the whole learn->bucket->probe->rank chain hash-matches DuckDB.
    "q_ann_ivf" -> annIvfLearnedSql,
  ) ++ oraclesTail

  /** Unrolled-Lloyd DuckDB twin of q_ann_ivf (round-10): the learned
    * spherical k-means is replayed iteration by iteration as CTE pairs
    * (aN = ties-to-lowest-label argmax-cosine assignment, cN = per-dim
    * means rounded to 6dp — the same rounding [[graft.ops.Similarity
    * .kmeansCentroids]] applies, which is what makes `avg`'s summation-
    * order drift invisible across engines), then the probe + in-bucket
    * ranking of the fixed-quantizer oracle runs against the learned
    * centroids and learned bucket assignment.
    */
  private lazy val annIvfLearnedSql: String = {
    val (k, iters, d) = (8, 3, 64)
    def argmaxAssign(name: String, cents: String) =
      s"""$name AS (
         |  SELECT vec_id, label FROM (
         |    SELECT e.vec_id, c.label,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        sum(c.v * CAST(e.embedding[c.dim] AS DOUBLE)) /
         |          (sqrt(sum(c.v * c.v)) *
         |           sqrt(sum(CAST(e.embedding[c.dim] AS DOUBLE) *
         |                    CAST(e.embedding[c.dim] AS DOUBLE)))) DESC,
         |        c.label) AS p
         |    FROM embeddings e, $cents c
         |    GROUP BY e.vec_id, c.label) WHERE p = 1)""".stripMargin
    val iterCtes = (1 to iters).map { it =>
      argmaxAssign(s"a$it", s"c${it - 1}") + s""",
         |c$it AS (
         |  SELECT a.label, g.i AS dim,
         |    round(avg(CAST(e.embedding[g.i] AS DOUBLE)), 6) AS v
         |  FROM a$it a JOIN embeddings e USING (vec_id),
         |    generate_series(1, $d) g(i)
         |  GROUP BY a.label, g.i)""".stripMargin
    }.mkString(",\n")
    s"""WITH c0 AS (
       |  SELECT CAST(vec_id AS BIGINT) AS label, g.i AS dim,
       |    CAST(embedding[g.i] AS DOUBLE) AS v
       |  FROM embeddings, generate_series(1, $d) g(i) WHERE vec_id < $k),
       |$iterCtes,
       |${argmaxAssign("bucket", s"c$iters")},
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS qe
       |  FROM embeddings WHERE vec_id < 5),
       |csims AS (
       |  SELECT q.query_id, c.label,
       |    round(sum(c.v * CAST(q.qe[c.dim] AS DOUBLE)) /
       |      (sqrt(sum(c.v * c.v)) *
       |       sqrt(sum(CAST(q.qe[c.dim] AS DOUBLE) * CAST(q.qe[c.dim] AS DOUBLE)))), 6) AS c_sim
       |  FROM c$iters c, q
       |  GROUP BY q.query_id, c.label),
       |sel AS (
       |  SELECT query_id, label FROM (
       |    SELECT query_id, label,
       |      row_number() OVER (PARTITION BY query_id ORDER BY c_sim DESC, label) AS p
       |    FROM csims) WHERE p <= 2),
       |scored AS (
       |  SELECT s.query_id, e.vec_id,
       |    round(sum(CAST(e.embedding[g.i] AS DOUBLE) * CAST(q.qe[g.i] AS DOUBLE)) /
       |      (sqrt(sum(CAST(e.embedding[g.i] AS DOUBLE) * CAST(e.embedding[g.i] AS DOUBLE))) *
       |       sqrt(sum(CAST(q.qe[g.i] AS DOUBLE) * CAST(q.qe[g.i] AS DOUBLE)))), 6) AS cos_sim
       |  FROM sel s
       |  JOIN bucket b ON b.label = s.label
       |  JOIN embeddings e ON e.vec_id = b.vec_id
       |  JOIN q ON q.query_id = s.query_id,
       |  generate_series(1, $d) g(i)
       |  GROUP BY s.query_id, e.vec_id)
       |SELECT query_id, vec_id, cos_sim, rnk FROM (
       |  SELECT query_id, vec_id, cos_sim,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rnk
       |  FROM scored)
       |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin
  }

  private lazy val annIvfFixedSql: String =
      """WITH cents AS (
        |  SELECT label, g.i AS dim, avg(CAST(embedding[g.i] AS DOUBLE)) AS v
        |  FROM embeddings, generate_series(1, 64) g(i)
        |  GROUP BY label, g.i),
        |q AS (
        |  SELECT vec_id AS query_id, embedding AS qe
        |  FROM embeddings WHERE vec_id < 5),
        |csims AS (
        |  SELECT q.query_id, c.label,
        |    round(sum(c.v * CAST(q.qe[c.dim] AS DOUBLE)) /
        |      (sqrt(sum(c.v * c.v)) *
        |       sqrt(sum(CAST(q.qe[c.dim] AS DOUBLE) * CAST(q.qe[c.dim] AS DOUBLE)))), 6) AS c_sim
        |  FROM cents c, q
        |  GROUP BY q.query_id, c.label),
        |sel AS (
        |  SELECT query_id, label FROM (
        |    SELECT query_id, label,
        |      row_number() OVER (PARTITION BY query_id ORDER BY c_sim DESC, label) AS p
        |    FROM csims) WHERE p <= 2),
        |scored AS (
        |  SELECT s.query_id, e.vec_id,
        |    round(sum(CAST(e.embedding[g.i] AS DOUBLE) * CAST(q.qe[g.i] AS DOUBLE)) /
        |      (sqrt(sum(CAST(e.embedding[g.i] AS DOUBLE) * CAST(e.embedding[g.i] AS DOUBLE))) *
        |       sqrt(sum(CAST(q.qe[g.i] AS DOUBLE) * CAST(q.qe[g.i] AS DOUBLE)))), 6) AS cos_sim
        |  FROM sel s
        |  JOIN embeddings e ON e.label = s.label
        |  JOIN q ON q.query_id = s.query_id,
        |  generate_series(1, 64) g(i)
        |  GROUP BY s.query_id, e.vec_id)
        |SELECT query_id, vec_id, cos_sim, rnk FROM (
        |  SELECT query_id, vec_id, cos_sim,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rnk
        |  FROM scored)
        |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin

  private lazy val oraclesTail: Map[String, String] = Map(
    "q_embed_neardup" ->
      """WITH bd AS (
        |  SELECT vec_id, g.b AS band,
        |    string_agg(CASE WHEN embedding[g.b*8 + d.i] >= 0 THEN '1' ELSE '0' END,
        |      '' ORDER BY d.i) AS code
        |  FROM embeddings, generate_series(0,7) g(b), generate_series(1,8) d(i)
        |  GROUP BY vec_id, g.b),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM bd a JOIN bd b
        |    ON a.band = b.band AND a.code = b.code AND a.vec_id < b.vec_id),
        |rr AS (
        |  SELECT c.vec_a, c.vec_b,
        |    round(sum(CAST(x.embedding[g.i] AS DOUBLE)*CAST(y.embedding[g.i] AS DOUBLE)) /
        |      (sqrt(sum(CAST(x.embedding[g.i] AS DOUBLE)*CAST(x.embedding[g.i] AS DOUBLE))) *
        |       sqrt(sum(CAST(y.embedding[g.i] AS DOUBLE)*CAST(y.embedding[g.i] AS DOUBLE)))), 6) AS cos_sim
        |  FROM cand c
        |  JOIN embeddings x ON x.vec_id = c.vec_a
        |  JOIN embeddings y ON y.vec_id = c.vec_b,
        |  generate_series(1,64) g(i)
        |  GROUP BY c.vec_a, c.vec_b)
        |SELECT vec_a, vec_b, cos_sim FROM rr
        |WHERE cos_sim >= 0.4 ORDER BY vec_a, vec_b""".stripMargin,

    "q_semantic_dedup" ->
      """WITH RECURSIVE bd AS (
        |  SELECT vec_id, g.b AS band,
        |    string_agg(CASE WHEN embedding[g.b*8 + d.i] >= 0 THEN '1' ELSE '0' END,
        |      '' ORDER BY d.i) AS code
        |  FROM embeddings, generate_series(0,7) g(b), generate_series(1,8) d(i)
        |  GROUP BY vec_id, g.b),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM bd a JOIN bd b
        |    ON a.band = b.band AND a.code = b.code AND a.vec_id < b.vec_id),
        |rr AS (
        |  SELECT c.vec_a, c.vec_b,
        |    round(sum(CAST(x.embedding[g.i] AS DOUBLE)*CAST(y.embedding[g.i] AS DOUBLE)) /
        |      (sqrt(sum(CAST(x.embedding[g.i] AS DOUBLE)*CAST(x.embedding[g.i] AS DOUBLE))) *
        |       sqrt(sum(CAST(y.embedding[g.i] AS DOUBLE)*CAST(y.embedding[g.i] AS DOUBLE)))), 6) AS cos_sim
        |  FROM cand c
        |  JOIN embeddings x ON x.vec_id = c.vec_a
        |  JOIN embeddings y ON y.vec_id = c.vec_b,
        |  generate_series(1,64) g(i)
        |  GROUP BY c.vec_a, c.vec_b),
        |e0 AS (SELECT vec_a, vec_b FROM rr WHERE cos_sim >= 0.4),
        |edges AS (SELECT vec_a AS src, vec_b AS dst FROM e0
        |          UNION SELECT vec_b, vec_a FROM e0),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (SELECT src AS vec_id, min(dst) AS min_reach FROM reach GROUP BY src)
        |SELECT em.vec_id,
        |  CAST(coalesce(least(c.min_reach, em.vec_id), em.vec_id) AS BIGINT) AS cluster_id,
        |  CAST(CASE WHEN coalesce(least(c.min_reach, em.vec_id), em.vec_id) = em.vec_id
        |       THEN 1 ELSE 0 END AS INTEGER) AS is_survivor
        |FROM embeddings em LEFT JOIN comp c ON em.vec_id = c.vec_id
        |ORDER BY em.vec_id""".stripMargin,

    "q_label_centroids" ->
      """SELECT label, CAST(g.i AS INTEGER) AS dim,
        | round(avg(CAST(embedding[g.i] AS DOUBLE)), 6) AS centroid
        |FROM embeddings, generate_series(1, 64) g(i)
        |GROUP BY label, g.i ORDER BY label, dim""".stripMargin,

    "q_cluster_sample" ->
      """WITH cent AS (
        |  SELECT label, g.i AS dim,
        |    round(avg(CAST(embedding[g.i] AS DOUBLE)), 6) AS c
        |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY label, g.i),
        |dots AS (
        |  SELECT e.vec_id, c.label AS cluster,
        |    round(sum(CAST(e.embedding[c.dim] AS DOUBLE) * c.c), 6) AS sim
        |  FROM embeddings e JOIN cent c ON true
        |  GROUP BY e.vec_id, c.label),
        |assign AS (
        |  SELECT vec_id, cluster, sim,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC, cluster) AS rk
        |  FROM dots),
        |sample AS (
        |  SELECT cluster, vec_id, sim,
        |    row_number() OVER (PARTITION BY cluster ORDER BY vec_id) AS sk
        |  FROM assign WHERE rk = 1)
        |SELECT cluster, vec_id, sim FROM sample WHERE sk <= 20
        |ORDER BY cluster, vec_id""".stripMargin,

    "q_embed_norms" ->
      """SELECT vec_id,
        | round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x))), 6) AS l2_norm,
        | CAST(len(embedding) AS INTEGER) AS dim
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(len(list_filter(regexp_split_to_array(text,'\s+'), w -> len(w) > 0))) AS BIGINT) AS total_ws_tokens,
        | CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS total_bpe_tokens,
        | round(avg(length(text)), 4) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_quality_score" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(text,'\s+'), w -> len(w) > 0) AS toks
        |  FROM documents)
        |SELECT doc_id,
        | CAST(len(toks) AS INTEGER) AS n_tokens,
        | round(CASE WHEN length(text) = 0 THEN 0.0
        |   ELSE CAST(len(regexp_extract_all(text,'[^a-z0-9 ]')) AS DOUBLE)/length(text) END, 6) AS punct_ratio,
        | round(CASE WHEN len(toks) = 0 THEN 0.0
        |   ELSE CAST(len(list_filter(toks,
        |     w -> list_contains(['the','a','of','and','to','in','is','on','for','with'], w))) AS DOUBLE)
        |     / len(toks) END, 6) AS stop_ratio,
        | round(CASE WHEN len(toks) = 0 THEN 0.0
        |   ELSE CAST(length(text) AS DOUBLE)/len(toks) END, 4) AS avg_token_len,
        | round(CASE WHEN len(toks) = 0 THEN 0.0
        |   ELSE least(CAST(len(toks) AS DOUBLE)/100.0, 1.0)*0.5
        |   + (1.0 - least(CAST(len(regexp_extract_all(text,'[^a-z0-9 ]')) AS DOUBLE)/length(text), 1.0))*0.3
        |   + least(CAST(len(list_filter(toks,
        |       w -> list_contains(['the','a','of','and','to','in','is','on','for','with'], w))) AS DOUBLE)
        |       / len(toks) * 5.0, 1.0)*0.2 END, 6) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_langid" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(regexp_split_to_array(text,'\s+'), w -> len(w) > 0)) AS dt
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id,
        |    len(list_filter(dt, w -> list_contains(['the','and','of','is'], w))) AS s_en,
        |    len(list_filter(dt, w -> list_contains(['der','und','die','ist'], w))) AS s_de,
        |    len(list_filter(dt, w -> list_contains(['el','la','que','es'], w))) AS s_es,
        |    len(list_filter(dt, w -> list_contains(['le','la','et','est'], w))) AS s_fr,
        |    len(list_filter(dt, w -> list_contains(['的','是','在','了'], w))) AS s_zh
        |  FROM t)
        |SELECT predicted_lang, count(*) AS n_docs FROM (
        |  SELECT CASE
        |    WHEN greatest(s_en,s_de,s_es,s_fr,s_zh) = 0 THEN 'und'
        |    WHEN s_en = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'en'
        |    WHEN s_de = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'de'
        |    WHEN s_es = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'es'
        |    WHEN s_fr = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'fr'
        |    ELSE 'zh' END AS predicted_lang
        |  FROM scored)
        |GROUP BY predicted_lang ORDER BY predicted_lang""".stripMargin,

    "q_redact" ->
      """SELECT doc_id,
        | CAST(length(r) AS INTEGER) AS len_redacted,
        | CAST(length(text) - length(r) AS INTEGER) AS chars_removed,
        | substring(r, 1, 40) AS head40
        |FROM (
        |  SELECT doc_id, text,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(text, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
        |        '(?i)\b[0-9a-f]{16,}\b', '<HEX>', 'g'),
        |      '[0-9]{6,}', '<NUM>', 'g') AS r
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_word_count" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text,' ')) AS word FROM documents)
        |GROUP BY word ORDER BY n DESC, word LIMIT 50""".stripMargin,

    "q_multimodal_struct" ->
      """SELECT d.doc_id, d.lang, d.n_chars,
        | CAST(length(d.text) AS INTEGER) AS text_len,
        | CAST(len(e.embedding) AS INTEGER) AS dim,
        | round(sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x*x))), 6) AS l2_norm
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, text, unnest(generate_series(0,
        |    least(CAST(floor((length(text) - 1) / 32.0) AS INT), 3))) AS frame_no
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
        |  md5(substring(text, frame_no * 32 + 1, 16)) AS frame_md5,
        |  CAST(length(substring(text, frame_no * 32 + 1, 16)) AS BIGINT) AS n_bytes
        |FROM f ORDER BY doc_id, frame_no""".stripMargin,
  )
}
