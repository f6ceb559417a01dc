package graft.queries

import graft.Q
import graft.io.Tables
import graft.ops.Corpus
import org.apache.spark.sql.functions._

/** Training-corpus preparation queries (SURVEY §2B B120–B122): benchmark
  * n-gram decontamination, GPT-style sequence packing, and domain-mixture
  * resampling over the `documents` fixture. All three are engine-portable
  * (md5 digests, IEEE-double arithmetic) so each is fully oracled — the
  * corpus-prep tier has no rows-only entries.
  */
object TrainPrepOps extends QueryModule {

  val queries: Map[String, Q] = Map(
    // B120 benchmark decontamination: every 97th document plays the
    // benchmark set; the report counts 4-gram digest overlap per training
    // doc. The benchmark gram side is distinct'd and broadcast — the
    // training corpus never shuffles its gram stream.
    "q_contamination" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val train = docs.filter(col("doc_id") % 97 =!= 0)
      Corpus.ngramContamination(train, bench, "doc_id", "text", n = 4)
        .orderBy("doc_id")
    }),

    // B121 sequence packing: per-language token tapes cut into 256-token
    // sequences — the window partitions by lang, so packing runs one
    // independent cumulative sum per stream (no global order).
    "q_seq_packing" -> ((s, dir) => {
      Corpus.packSequences(Tables.documents(s, dir), budget = 256,
          streamCol = "lang", orderCol = "doc_id", textCol = "text")
        .orderBy("doc_id")
    }),

    // Sliding-window document chunking (the RAG / long-context prep
    // pass): 200-char windows advancing by 100 (50% overlap), tail
    // window shorter — one codegen'd sequence/transform/posexplode per
    // row, no shuffle. The oracle recomputes the identical windows via
    // generate_series + substring, hash-proving window arithmetic,
    // boundaries, and tail handling.
    "q_doc_chunks" -> ((s, dir) => {
      graft.ops.Corpus.chunk(Tables.documents(s, dir), "doc_id", "text",
          chunkChars = 200, stride = 100)
        .orderBy("doc_id", "chunk_no")
    }),

    // Exact-substring span dedup (Lee et al.'s ExactSubstr): every
    // 20-token span occurring 2+ times corpus-wide leaves every doc it
    // appears in. The oracle recomputes the same digests, election,
    // coverage test, and single-spaced reassembly in DuckDB SQL.
    "q_span_dedup" -> ((s, dir) => {
      graft.ops.Corpus.dedupSpans(Tables.documents(s, dir), "doc_id", "text",
          n = 20)
        .orderBy("doc_id")
    }),

    // B133 corpus-global line dedup (the C4/RefinedWeb pass): any
    // 10+-char line occurring more than once across the corpus survives
    // only at its first (doc_id, position); shorter lines bypass.
    // The fixture text is single-line, so the query first re-lines each
    // document into 4-word spans (both engines compute the identical
    // chunking) — at sf0.01 that plants ~340 genuinely duplicated lines
    // for the election to cut. The election is an algebraic min-
    // aggregate on the line digest (map-side combine ⇒ boilerplate hot
    // keys never serialize into one task), and only digests are join
    // keys — see Corpus.dedupLines.
    "q_line_dedup" -> ((s, dir) => {
      val w = split(col("text"), " ")
      val lined = Tables.documents(s, dir).select(col("doc_id"),
        array_join(
          transform(sequence(lit(1), ceil(size(w) / 4.0).cast("int")),
            i => array_join(slice(w, (i - lit(1)) * 4 + 1, lit(4)), " ")),
          "\n").as("text"))
      Corpus.dedupLines(lined, "doc_id", "text", sep = "\n", minChars = 10)
        .orderBy("doc_id")
    }),

    // B121 sequence packing over a NON-WHITESPACE token count: the
    // declared real-tokenizer seam (Corpus.packCounted) exercised with a
    // precomputed count column — the ceil(n_chars / 4) proxy for a BPE
    // tokenizer's ~4-chars-per-token rule of thumb. Same cumulative
    // window shape as q_seq_packing (partitioned per source stream, no
    // global order), but the counts come from the column, proving the
    // packing layer is tokenizer-agnostic end to end.
    "q_seq_packing_counted" -> ((s, dir) => {
      Corpus.packCounted(
          Tables.documents(s, dir)
            .withColumn("n_tok", expr("(n_chars + 3) div 4")),
          budget = 512, streamCol = "source", orderCol = "doc_id")
        .orderBy("doc_id")
    }),

    // B122 domain mixture: plan per-language sampling rates toward a
    // uniform 20% share of a 50k-token budget, then deterministically
    // select survivors by md5 threshold and report the realized mixture.
    "q_domain_mix" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("n_tok", size(split(col("text"), " ")).cast("bigint"))
      val plan = Corpus.mixturePlan(d, "lang", "n_tok",
        targetShare = 0.2, budgetTokens = 50000L)
      val sel = Corpus.mixtureSelect(d, plan, "lang", "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_selected"), sum(col("n_tok")).as("selected_tokens"))
      plan.join(sel, Seq("lang"), "left")
        .select(col("lang"), col("n_docs"), col("tokens"),
          round(col("rate"), 6).as("rate"),
          coalesce(col("n_selected"), lit(0L)).as("n_selected"),
          coalesce(col("selected_tokens"), lit(0L)).as("selected_tokens"))
        .orderBy("lang")
    }),

    // B124 bigram-LM scoring: every document scored by avg negative
    // log-likelihood under the corpus's own add-0.5-smoothed bigram
    // model — the perplexity-style filter signal. Fully relational on
    // both engines (counts + ln are IEEE-portable; round(,6) absorbs
    // summation-order ulps, the q_char_entropy precedent).
    "q_lm_score" -> ((s, dir) => {
      Corpus.lmScore(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // B126 the training-corpus prep FLAGSHIP: decontaminate → LM-quality
    // filter → domain-mixture resample → sequence-pack, one lazy plan.
    // Every stage is the already-oracled operator (B120/B124/B122/B121)
    // and the composite is oracled end to end — the whole-pipeline
    // arithmetic (who survives each gate, the packed-sequence counts per
    // language) must land on the DuckDB recompute exactly. Data-dependent
    // thresholds (the clean-corpus median NLL) ride as 1-row broadcast
    // anchors, never driver scalars.
    "q_trainprep_pipeline" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val train = docs.filter(col("doc_id") % 97 =!= 0)
      // 1. decontaminate: drop docs with >50% benchmark 4-gram overlap
      //    (docs too short to gram have no report row and can't match)
      val cont = Corpus.ngramContamination(train, bench, "doc_id", "text", n = 4)
      // the decontamination verdict feeds FOUR downstream consumers (LM
      // model, median anchor, quality join, mixture) — pin it once so
      // the contamination aggregation isn't re-run per consumer. What
      // gets pinned is the DIRTY ID LIST (the decision rows: a few
      // bytes per contaminated doc), not the surviving corpus text:
      // checkpointing the text paid a full corpus write plus one
      // re-read per consumer, where each consumer can instead re-scan
      // the columnar source (pruned, no shuffle) behind a left_anti
      // join against the tiny pinned list — the planner broadcasts it
      // from its file size, so the corpus is never shuffled to attach
      // the verdict. Pin.stable, not localCheckpoint: durable storage,
      // an executor loss re-reads instead of killing all consumers
      // (round-8 verdict item 5).
      val dirty = graft.ops.Pin.stable(
        cont.filter(col("hit_ratio") > 0.5).select("doc_id"))
      val clean = train.join(dirty, Seq("doc_id"), "left_anti")
      // 2. LM-quality gate: keep docs at or below the clean corpus's
      //    median NLL (model trained on the clean corpus itself)
      val scored = graft.ops.Pin.stable(Corpus.lmScore(clean, "doc_id", "text"))
      val med = scored.agg(round(expr("percentile(nll, 0.5)"), 6).as("med"))
      val kept = clean.join(scored.select("doc_id", "nll"), Seq("doc_id"))
        .crossJoin(broadcast(med)).filter(col("nll") <= col("med"))
      // 3. resample toward uniform language shares of a 20k-token budget
      val withTok = kept.withColumn("n_tok",
        size(split(col("text"), " ")).cast("bigint"))
      val plan = Corpus.mixturePlan(withTok, "lang", "n_tok",
        targetShare = 0.25, budgetTokens = 20000L)
      val sel = Corpus.mixtureSelect(withTok, plan, "lang", "doc_id")
      // 4. pack survivors into 128-token sequences per language
      val packed = Corpus.packSequences(sel.select("doc_id", "lang", "text"),
        budget = 128, streamCol = "lang", orderCol = "doc_id", textCol = "text")
      packed.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("tokens"),
          (max(col("seq_last")) + 1).as("n_seqs"))
        .orderBy("lang")
    }),

    // B150 BPE pair counting (the tokenizer-training inner step): the
    // 40 highest-frequency adjacent character pairs across the corpus,
    // weighted by word frequency — the corpus aggregates to its
    // vocabulary FIRST, so only O(vocab) rows explode into pairs.
    "q_bpe_pairs" -> ((s, dir) => {
      graft.ops.Corpus.bpePairCounts(Tables.documents(s, dir), "text")
        .orderBy(col("pair_count").desc, col("pair")).limit(40)
    }),

    // B148 deterministic epoch shuffle + shard assignment: the training
    // data-loader order for epoch "epoch0" over 8 shards — shard and
    // in-shard position derive from md5(seed#id) alone, so the oracle
    // recomputes the identical permutation.
    "q_corpus_shards" -> ((s, dir) => {
      graft.ops.Corpus.shuffleShards(Tables.documents(s, dir), "doc_id",
          seed = "epoch0", shards = 8)
        .orderBy("doc_id")
    }),

    // B176 BPE TRAINING (round-14; extends B150's pair counting into
    // the full tokenizer-training loop): 6 greedy merges learned
    // word-level — the corpus is scanned once for the weighted vocab,
    // every iteration runs on the vocab table (pair aggregation +
    // 1-row top collect + string-replace merge application), never the
    // corpus. Training itself is hash-ORACLED: merge application is a
    // space-padded replace whose left-to-right semantics Spark and
    // DuckDB share, so the unrolled DuckDB recomputation reproduces the
    // identical merge sequence, weights included.
    "q_bpe_train" -> ((s, dir) => {
      val (merges, _) = graft.ops.Bpe.train(Tables.documents(s, dir), "text", 6)
      merges.orderBy("rank")
    }),

    // The word-level ENCODER the learned merges induce: the final vocab
    // symbol sequences (every merge applied, in rank order) for the 15
    // most frequent words — what a corpus encode joins against. Same
    // oracle chain as q_bpe_train, read at the final vocab instead of
    // the merge table.
    "q_bpe_encode" -> ((s, dir) => {
      val (_, vocab) = graft.ops.Bpe.train(Tables.documents(s, dir), "text", 6)
      vocab.select(col("w"), col("n"), col("sym"))
        .orderBy(col("n").desc, col("w")).limit(15)
    }),

    // B147 DSIR importance resampling (Xie et al. 2023): English docs
    // play the trusted target corpus; every non-English doc is scored by
    // the hashed-unigram+bigram log importance ratio (1024 buckets, add-1
    // smoothing) and the top 50 are selected. The oracle recomputes the
    // hashing, both smoothed distributions, the per-doc sum, and the
    // rank-based selection in DuckDB SQL — the whole chain hash-proven.
    "q_dsir_select" -> ((s, dir) => {
      val w = graft.ops.Dsir.weights(Tables.documents(s, dir), "doc_id",
        "text", isTarget = col("lang") === "en", buckets = 1024)
      graft.ops.Dsir.selectTopK(w, "doc_id", k = 50)
        .select(col("doc_id"), col("is_target"), col("n_grams"),
          col("dsir_logratio_micro"), col("sel_rank"), col("selected"))
        .orderBy("doc_id")
    }),
  )

  /** The unrolled-DuckDB BPE training chain (q_bpe_train /
    * q_bpe_encode): v0 = the symbolized word-frequency vocab; each
    * iteration i picks the (count DESC, pair ASC)-pinned top adjacent
    * pair and applies it via the space-padded replace — the exact
    * algorithm the Spark side runs, so the merge sequence is
    * byte-identical (see [[graft.ops.Bpe]]'s determinism note).
    */
  private def bpeCtes(k: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH v0 AS (SELECT w, CAST(count(*) AS BIGINT) AS n,
      |    trim(regexp_replace(w, '(.)', '\1 ', 'g')) || ' </w>' AS sym
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE regexp_matches(w, '^[a-z]{2,}$') GROUP BY w)""".stripMargin
    for (i <- 1 to k) sb ++= s""",
      |p$i AS (SELECT list_extract(a, j) || ' ' || list_extract(a, j + 1) AS pair, n
      |  FROM (SELECT string_split(sym, ' ') AS a, n,
      |          unnest(generate_series(1, len(string_split(sym, ' ')) - 1)) AS j
      |        FROM v${i - 1})),
      |m$i AS (SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM p$i
      |        GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1),
      |v$i AS (SELECT w, n, trim(replace(' ' || sym || ' ',
      |          ' ' || (SELECT pair FROM m$i) || ' ',
      |          ' ' || replace((SELECT pair FROM m$i), ' ', '') || ' ')) AS sym
      |        FROM v${i - 1})""".stripMargin
    sb.toString
  }

  val oracles: Map[String, String] = Map(
    "q_bpe_train" -> (bpeCtes(6) + "\n" + (1 to 6).map(i =>
      s"SELECT $i AS rank, pair, replace(pair, ' ', '') AS merged, " +
        s"cnt AS weight FROM m$i").mkString("\nUNION ALL ") +
      "\nORDER BY rank"),

    "q_bpe_encode" -> (bpeCtes(6) +
      "\nSELECT w, n, sym FROM v6 ORDER BY n DESC, w LIMIT 15"),

    "q_contamination" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 3),
        |        i -> substr(md5(array_to_string(w[i:i+3], ' ')), 1, 16))) AS h
        |      FROM w),
        |bench AS (SELECT DISTINCT h FROM g WHERE doc_id % 97 = 0),
        |train AS (SELECT DISTINCT doc_id, h FROM g WHERE doc_id % 97 <> 0),
        |tot AS (SELECT doc_id, count(*) AS n_grams FROM train GROUP BY 1),
        |hit AS (SELECT t.doc_id AS doc_id, count(*) AS n_hit
        |        FROM train t JOIN bench USING (h) GROUP BY 1)
        |SELECT tot.doc_id AS doc_id, tot.n_grams AS n_grams,
        | coalesce(hit.n_hit, 0) AS n_hit,
        | round(CAST(coalesce(hit.n_hit, 0) AS DOUBLE) / tot.n_grams, 6) AS hit_ratio
        |FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id
        |ORDER BY 1""".stripMargin,

    "q_line_dedup" ->
      """WITH lined AS (
        |  SELECT doc_id, array_to_string(list_transform(
        |    generate_series(1, CAST(ceil(len(string_split(text,' '))/4.0) AS INT)),
        |    i -> array_to_string(list_slice(string_split(text,' '), (i-1)*4+1, i*4), ' ')), chr(10)) AS text
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, u.line AS line, u.no AS line_no
        |  FROM (SELECT doc_id, unnest(list_transform(string_split(text, chr(10)),
        |          (x, i) -> {'line': x, 'no': i - 1})) AS u
        |        FROM lined)),
        |keepers AS (
        |  SELECT doc_id, line_no, line FROM (
        |    SELECT doc_id, line_no, line,
        |      row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, line_no) AS rn
        |    FROM lines WHERE length(line) >= 10) WHERE rn = 1),
        |kept AS (
        |  SELECT doc_id, line_no, line FROM lines WHERE length(line) < 10
        |  UNION ALL SELECT doc_id, line_no, line FROM keepers),
        |agg AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text_dedup,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT l.doc_id,
        |  coalesce(a.text_dedup, '') AS text_dedup,
        |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(len(string_split(l.text, chr(10))) - coalesce(a.n_kept, 0) AS BIGINT) AS n_dropped
        |FROM lined l LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_span_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id, i - 1 AS p,
        |    md5(array_to_string(t[i:i+19], ' ')) AS digest
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 19)) AS i
        |        FROM toks WHERE len(t) >= 20)),
        |dup AS (SELECT digest FROM grams GROUP BY digest HAVING count(*) >= 2),
        |m AS (SELECT doc_id, list(p) AS starts
        |      FROM grams JOIN dup USING (digest) GROUP BY doc_id),
        |tok2 AS (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
        |         FROM toks),
        |kept AS (
        |  SELECT k.doc_id, k.i, k.t[k.i] AS w
        |  FROM tok2 k LEFT JOIN m ON k.doc_id = m.doc_id
        |  WHERE len(list_filter(coalesce(m.starts, []),
        |          p -> p <= k.i - 1 AND k.i - 1 < p + 20)) = 0),
        |agg AS (
        |  SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS text_dedup,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id,
        |  coalesce(a.text_dedup, '') AS text_dedup,
        |  CAST(len(t.t) AS BIGINT) AS n_tokens,
        |  CAST(len(t.t) - coalesce(a.n_kept, 0) AS BIGINT) AS n_tokens_dropped
        |FROM toks t LEFT JOIN agg a ON t.doc_id = a.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "q_bpe_pairs" ->
      """WITH v AS (SELECT w, count(*) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) >= 2 GROUP BY w),
        |p AS (SELECT substr(w, i, 2) AS pair, n
        |  FROM (SELECT w, n, unnest(generate_series(1, length(w) - 1)) AS i
        |        FROM v))
        |SELECT pair, CAST(sum(n) AS BIGINT) AS pair_count
        |FROM p GROUP BY pair
        |ORDER BY pair_count DESC, pair LIMIT 40""".stripMargin,

    "q_corpus_shards" ->
      """WITH k AS (SELECT doc_id,
        |        md5('epoch0#' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |      FROM documents),
        |s AS (SELECT doc_id, shuffle_key,
        |    CAST(CAST(concat('0x', substr(shuffle_key, 1, 8)) AS BIGINT) % 8
        |      AS INTEGER) AS shard
        |  FROM k)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard
        |    ORDER BY shuffle_key, doc_id) - 1 AS BIGINT) AS seq_in_shard,
        |  shuffle_key
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_dsir_select" ->
      """WITH d AS (SELECT doc_id, (lang = 'en') AS is_target,
        |            string_split(text, ' ') AS t FROM documents),
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
        |sc AS (SELECT doc_id, count(*) AS n_grams,
        |    sum(lr_micro) AS dsir_logratio_micro
        |  FROM grams JOIN lr USING (bucket) GROUP BY doc_id),
        |w AS (SELECT d2.doc_id, d2.is_target,
        |    coalesce(sc.n_grams, 0) AS n_grams,
        |    coalesce(sc.dsir_logratio_micro, 0) AS dsir_logratio_micro
        |  FROM (SELECT doc_id, (lang = 'en') AS is_target FROM documents) d2
        |  LEFT JOIN sc ON d2.doc_id = sc.doc_id),
        |r AS (SELECT *, CASE WHEN is_target THEN 0
        |    ELSE rank() OVER (PARTITION BY is_target
        |                      ORDER BY dsir_logratio_micro DESC, doc_id) END
        |    AS sel_rank FROM w)
        |SELECT doc_id, is_target, CAST(n_grams AS BIGINT) AS n_grams,
        |  CAST(dsir_logratio_micro AS BIGINT) AS dsir_logratio_micro,
        |  CAST(sel_rank AS BIGINT) AS sel_rank,
        |  (NOT is_target AND sel_rank <= 50) AS selected
        |FROM r ORDER BY doc_id""".stripMargin,

    "q_doc_chunks" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS L
        |           FROM documents WHERE length(text) > 0),
        |n AS (SELECT doc_id, text,
        |        CASE WHEN L <= 200 THEN 1
        |             ELSE CAST(ceil((L - 200) / 100.0) AS INT) + 1 END AS nc
        |      FROM d),
        |e AS (SELECT doc_id, text,
        |        unnest(generate_series(0, nc - 1)) AS i FROM n)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_no,
        |  CAST(i * 100 AS BIGINT) AS chunk_start,
        |  substring(text, i * 100 + 1, 200) AS chunk_text,
        |  CAST(length(substring(text, i * 100 + 1, 200)) AS BIGINT) AS n_chars
        |FROM e ORDER BY doc_id, chunk_no""".stripMargin,

    "q_seq_packing" ->
      """WITH d AS (SELECT doc_id, lang,
        |        len(string_split(text, ' ')) AS n_tok FROM documents),
        |c AS (SELECT doc_id, lang, n_tok,
        |        CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |      FROM d)
        |SELECT doc_id, lang, n_tok, cum - n_tok AS start_off,
        | CAST(floor((cum - n_tok) / 256) AS BIGINT) AS seq_first,
        | CAST(floor((cum - 1) / 256) AS BIGINT) AS seq_last
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_seq_packing_counted" ->
      """WITH d AS (SELECT doc_id, source,
        |        (n_chars + 3) // 4 AS n_tok FROM documents),
        |c AS (SELECT doc_id, source, n_tok,
        |        CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |      FROM d)
        |SELECT doc_id, source, n_tok, cum - n_tok AS start_off,
        | CAST(floor((cum - n_tok) / 512) AS BIGINT) AS seq_first,
        | CAST(floor((cum - 1) / 512) AS BIGINT) AS seq_last
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_domain_mix" ->
      """WITH d AS (SELECT doc_id, lang,
        |        len(string_split(text, ' ')) AS n_tok FROM documents),
        |plan AS (SELECT lang, count(*) AS n_docs,
        |           CAST(sum(n_tok) AS BIGINT) AS tokens,
        |           least(CAST(1.0 AS DOUBLE),
        |             CAST(0.2 AS DOUBLE) * 50000 / CAST(sum(n_tok) AS DOUBLE)) AS rate
        |         FROM d GROUP BY 1),
        |thr AS (SELECT *, lpad(lower(to_hex(
        |          CAST(floor(rate * 4294967296) AS BIGINT))), 8, '0') AS t8
        |        FROM plan),
        |sel AS (SELECT d.lang AS lang, count(*) AS n_selected,
        |          CAST(sum(d.n_tok) AS BIGINT) AS selected_tokens
        |        FROM d JOIN thr USING (lang)
        |        WHERE thr.rate >= 1.0
        |           OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < thr.t8
        |        GROUP BY 1)
        |SELECT p.lang AS lang, p.n_docs, p.tokens, round(p.rate, 6) AS rate,
        | coalesce(s.n_selected, 0) AS n_selected,
        | coalesce(s.selected_tokens, 0) AS selected_tokens
        |FROM thr p LEFT JOIN sel s ON p.lang = s.lang
        |ORDER BY 1""".stripMargin,

    "q_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |           x -> len(x) > 0) AS t
        |  FROM documents
        |), pos AS (
        |  SELECT doc_id, unnest(generate_series(1, len(t)-1)) AS i, t
        |  FROM toks WHERE len(t) >= 2
        |), bi AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM pos
        |), c12 AS (
        |  SELECT w1, w2, CAST(count(*) AS DOUBLE) AS n12 FROM bi GROUP BY w1, w2
        |), c1 AS (
        |  SELECT w1, CAST(count(*) AS DOUBLE) AS n1 FROM bi GROUP BY w1
        |), v AS (
        |  SELECT CAST(count(DISTINCT u.w) AS DOUBLE) AS vsize
        |  FROM (SELECT unnest(t) AS w FROM toks) u
        |)
        |SELECT b.doc_id, count(*) AS n_bigrams,
        |  round(avg(-ln((c12.n12 + 0.5) / (c1.n1 + 0.5 * v.vsize))), 6) AS nll
        |FROM bi b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,

    "q_trainprep_pipeline" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 3),
        |        i -> substr(md5(array_to_string(w[i:i+3], ' ')), 1, 16))) AS h
        |      FROM w),
        |bg AS (SELECT DISTINCT h FROM g WHERE doc_id % 97 = 0),
        |tg AS (SELECT DISTINCT doc_id, h FROM g WHERE doc_id % 97 <> 0),
        |tot AS (SELECT doc_id, count(*) AS n_grams FROM tg GROUP BY 1),
        |hitn AS (SELECT t.doc_id AS doc_id, count(*) AS n_hit
        |         FROM tg t JOIN bg USING (h) GROUP BY 1),
        |dirty AS (SELECT tot.doc_id FROM tot LEFT JOIN hitn USING (doc_id)
        |          WHERE round(CAST(coalesce(hitn.n_hit, 0) AS DOUBLE)
        |                        / tot.n_grams, 6) > 0.5),
        |clean AS (SELECT d.* FROM documents d
        |          WHERE d.doc_id % 97 <> 0
        |            AND d.doc_id NOT IN (SELECT doc_id FROM dirty)),
        |toks AS (SELECT doc_id,
        |           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |             x -> len(x) > 0) AS t
        |         FROM clean),
        |pos AS (SELECT doc_id, unnest(generate_series(1, len(t)-1)) AS i, t
        |        FROM toks WHERE len(t) >= 2),
        |bi AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM pos),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS n12
        |        FROM bi GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(sum(n12) AS DOUBLE) AS n1 FROM c12 GROUP BY w1),
        |v AS (SELECT CAST(count(DISTINCT u.wd) AS DOUBLE) AS vsize
        |      FROM (SELECT unnest(t) AS wd FROM toks) u),
        |scores AS (
        |  SELECT b.doc_id,
        |    round(avg(-ln((c12.n12 + 0.5) / (c1.n1 + 0.5 * v.vsize))), 6) AS nll
        |  FROM bi b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        |  GROUP BY b.doc_id),
        |med AS (SELECT round(quantile_cont(nll, 0.5), 6) AS med FROM scores),
        |kept AS (SELECT c.doc_id, c.lang,
        |           len(string_split(c.text, ' ')) AS n_tok
        |         FROM clean c JOIN scores s USING (doc_id) CROSS JOIN med
        |         WHERE s.nll <= med.med),
        |plan AS (SELECT lang,
        |           least(CAST(1.0 AS DOUBLE),
        |             CAST(0.25 AS DOUBLE) * 20000 / CAST(sum(n_tok) AS DOUBLE)) AS rate
        |         FROM kept GROUP BY 1),
        |thr AS (SELECT *, lpad(lower(to_hex(
        |          CAST(floor(rate * 4294967296) AS BIGINT))), 8, '0') AS t8
        |        FROM plan),
        |sel AS (SELECT k.* FROM kept k JOIN thr USING (lang)
        |        WHERE thr.rate >= 1.0
        |           OR substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8) < thr.t8)
        |SELECT lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tokens,
        |  CAST(floor((sum(n_tok) - 1) / 128) + 1 AS BIGINT) AS n_seqs
        |FROM sel GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
