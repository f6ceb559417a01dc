package graft.queries

import graft.Q
import graft.io.Tables
import graft.ops.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond per-document scoring: duplicate
  * CLUSTER formation (connected components over LSH candidate edges),
  * TF-IDF term weighting, and text normalization — the multi-stage pieces
  * a 100 TB training-data pipeline runs between raw ingest and tokenizer.
  * All three are fully oracle-verifiable: the md5-permutation LSH path
  * keeps edges portable, and DuckDB's recursive CTE reproduces the
  * transitive closure the Spark label-propagation loop converges to.
  */
object Curation extends QueryModule {

  /** Shared md5-LSH parameters (n-gram size, bands, rows per band) — must
    * stay in lockstep with the CTE constants in the q_dup_clusters oracle.
    */
  private val N = 3
  private val Bands = 4
  private val RowsPerBand = 4

  val queries: Map[String, Q] = Map(
    // Near-dup groups: LSH pair edges -> connected components ->
    // min-doc_id survivor per cluster. Emits every doc with its cluster
    // and survivor flag (the projection a dedup-keep pass filters on).
    "q_dup_clusters" -> ((s, dir) => {
      Dedup.dupClusters(Tables.documents(s, dir), N, Bands, RowsPerBand,
          sigCacheKey = Some(Tables.srcStamp(dir, "documents")))
        .select(col("doc_id"), col("cluster_id"),
          (col("doc_id") === col("cluster_id")).cast("int").as("is_survivor"))
        .orderBy("doc_id")
    }),

    // TF-IDF top-3 terms per document. df/N come from two key-shuffle
    // aggregations; the doc-count scalar is a broadcast single-row cross
    // join (no driver action). Top-3 per doc is a window over doc_id —
    // bounded group size (distinct terms per doc), high-cardinality
    // partition key, so no degenerate single-task sort at scale.
    "q_tfidf" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = toks.distinct().groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      tf.join(dfreq, "term").crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("tf") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"), col("tf"),
          col("df"), col("tfidf"))
        .orderBy("doc_id", "rnk")
    }),

    // URL metadata extraction (web-corpus curation): documents get a
    // deterministic synthetic URL (the fixture has no URL column), then
    // Spark's parse_url pulls host/path/query-param — the
    // provenance-tagging pass a crawl pipeline runs per document.
    "q_url_parse" -> ((s, dir) => {
      val url = concat(lit("https://"), col("source"), lit(".example.com/docs/"),
        col("doc_id").cast("string"), lit("?lang="), col("lang"))
      Tables.documents(s, dir)
        .select(col("doc_id"), url.as("url"))
        .select(col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("lang")).as("lang_param"))
        .orderBy("doc_id")
    }),

    // Normalization pass: lowercase, strip non-alphanumerics, collapse
    // runs of whitespace, trim — pure codegen'd regex chain, shuffle-free.
    // PII scrubbing (Dolma/RedPajama-style redaction pass): the fixture
    // text is deterministically AUGMENTED with synthetic PII (an email,
    // an IP, a card number derived from doc_id — both engines build the
    // identical string) so the redaction genuinely fires, then emails /
    // IPs / cards are counted and replaced with typed tokens. The
    // scrubbed text is surfaced as md5 so the oracle hash proves the
    // byte-exact replacement, not just the counts. Pure codegen'd
    // per-row regex — no UDF, no shuffle.
    "q_pii_scrub" -> ((s, dir) => {
      import graft.ops.Pii
      val aug = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com from 10.2."), (col("doc_id") % 200).cast("string"),
        lit(".7 card 4111-1111-1111-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      Tables.documents(s, dir)
        .select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id"),
          Pii.emailCount(col("aug")).as("n_emails"),
          Pii.ipCount(col("aug")).as("n_ips"),
          Pii.cardCount(col("aug")).as("n_cards"),
          md5(Pii.scrub(col("aug"))).as("scrub_md5"),
          (length(col("aug")) - length(Pii.scrub(col("aug"))))
            .cast("long").as("n_chars_removed"))
        .orderBy("doc_id")
    }),

    // The SAME redaction pass through the round-14 SQL function door
    // (graft_scrub / graft_*_count registered by GraftExtensions): a
    // hash match against q_pii_scrub's oracle proves the SQL functions
    // are byte-identical to the Column builders they wrap.
    "q_sql_textfns" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("docs_sqlfns")
      s.sql(
        """WITH aug AS (
          |  SELECT doc_id, concat(text, ' contact user',
          |    CAST(doc_id AS STRING), '@example.com from 10.2.',
          |    CAST(doc_id % 200 AS STRING), '.7 card 4111-1111-1111-',
          |    lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) AS aug
          |  FROM docs_sqlfns)
          |SELECT doc_id,
          |  graft_email_count(aug) AS n_emails,
          |  graft_ip_count(aug) AS n_ips,
          |  graft_card_count(aug) AS n_cards,
          |  md5(graft_scrub(aug)) AS scrub_md5,
          |  CAST(length(aug) - length(graft_scrub(aug)) AS BIGINT)
          |    AS n_chars_removed
          |FROM aug ORDER BY doc_id""".stripMargin)
    }),

    "q_text_normalize" -> ((s, dir) => {
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
        " +", " "))
      Tables.documents(s, dir)
        .select(col("doc_id"), norm.as("norm"))
        .select(col("doc_id"),
          length(col("norm")).as("n_chars_norm"),
          size(split(col("norm"), " ")).as("n_tokens_norm"),
          substring(col("norm"), 1, 40).as("head40"))
        .orderBy("doc_id")
    }),

    // B155 HTML stripping (the C4 extraction cleanup): each doc's text
    // is wrapped in deterministic markup — script/style blocks, nested
    // tags, entity-encoded spaces — and stripped back; the oracle builds
    // the SAME markup in SQL and strips it with its own RE2 regex chain,
    // so the hash proves the two engines' regex semantics agree on the
    // full strip pipeline (block removal, tag removal, entity decode,
    // whitespace collapse).
    "q_html_strip" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><style type=\"text/css\">body{margin:0}</style>" +
          "</head><body><h1 class=\"t\">"),
        col("lang"),
        lit("</h1>\n<p>"),
        regexp_replace(col("text"), " ", "&nbsp;"),
        lit("</p><script>var x = 1 < 2;</script></body></html>"))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.ops.TextAnalysis.stripHtml(html).as("clean"))
        .select(col("doc_id"), col("clean"),
          length(col("clean")).as("n_chars_clean"))
        .orderBy("doc_id")
    }),

    // Deterministic content-hashed train/val/test split — the assignment
    // must be a pure function of content (not rand()) so re-runs,
    // retries, and incremental appends land every doc in the same split.
    // First hex nibble of md5(text): 0..b→train (75%), c..d→val (12.5%),
    // e..f→test (12.5%). Shuffle-free scan + one tiny agg.
    "q_train_test_split" -> ((s, dir) => {
      val nib = substring(md5(col("text")), 1, 1)
      Tables.documents(s, dir)
        .withColumn("split",
          when(nib < "c", "train").when(nib < "e", "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("n_chars")), 4).as("avg_chars"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy("split")
    }),

    // Vocabulary-level fuzzy matching: levenshtein over DISTINCT part
    // names. Distinct-first keeps the pairwise comparison quadratic in
    // the VOCABULARY (64 names here, ~10^4 pairs), not the corpus — the
    // shape that survives 100 TB, where the name dictionary stays small
    // even as rows explode. Both sides are post-distinct and tiny, so
    // the cross pairing broadcasts.
    "q_edit_distance" -> ((s, dir) => {
      val names = Tables.part(s, dir).select(col("p_name")).distinct()
      val a = names.select(col("p_name").as("name_a"))
      val b = names.select(col("p_name").as("name_b"))
      a.join(broadcast(b), col("name_a") < col("name_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .filter(col("dist") <= 3)
        .orderBy("name_a", "name_b")
    }),

    // PageRank over the near-dup graph: LSH candidate pairs as
    // symmetric edges, 3 iterations of Graph.pagerank — iterative
    // DataFrame algorithms (join + key-agg per round) under the oracle,
    // which unrolls the identical three iterations in SQL.
    "q_pagerank" -> ((s, dir) => {
      val cands = Dedup.minhashCandidatesMd5(
        Tables.documents(s, dir), N, Bands, RowsPerBand,
        sigCacheKey = Some(Tables.srcStamp(dir, "documents")))
      val edges = cands.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(cands.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      graft.ops.Graph.pagerank(edges, iters = 3)
        .select(col("node").as("doc_id"), round(col("rank"), 6).as("pr"))
        .orderBy("doc_id")
    }),

    // End-to-end curation composite — the filter chain a corpus build
    // actually ships, stacked in one plan: exact dedup (keep min doc_id
    // per content digest) -> language whitelist -> token-length band ->
    // deterministic split assignment -> per-(lang, split) stats. One
    // digest shuffle + one final agg shuffle; everything between is
    // scan-local, and Catalyst pushes the lang/token filters below the
    // window where legal.
    "q_curation_pipeline" -> ((s, dir) => {
      val w = Window.partitionBy(col("digest")).orderBy(col("doc_id"))
      val nib = substring(col("digest"), 1, 1)
      Tables.documents(s, dir)
        .withColumn("digest", md5(col("text")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .filter(col("lang").isin("en", "de", "fr") && col("n_tokens").between(5, 500))
        .withColumn("split",
          when(nib < "c", "train").when(nib < "e", "val").otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("n_tokens")), 4).as("avg_tokens"))
        .orderBy("lang", "split")
    }),

    // Inverted index (search-side of a corpus store): term -> document
    // frequency + first postings. One explode + one groupBy(term)
    // shuffle; postings stay bounded in the output via slice, while df
    // is exact. collect_set dedups in-group (term repeated in a doc).
    "q_inverted_index" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("term"), col("doc_id"))
        .groupBy("term")
        .agg(countDistinct(col("doc_id")).as("df"),
          concat_ws(",", transform(
            slice(sort_array(collect_set(col("doc_id"))), 1, 10),
            x => x.cast("string"))).as("postings10"))
        .orderBy("term")
    }),

    // Repetition quality signals (the Gopher-style filters): per doc,
    // token total/distinct counts, the single most-frequent token's
    // share, and the duplicate-token fraction. Two keyed shuffles
    // ((doc_id, tok) count then doc_id rollup) — per-doc state is a
    // handful of counters, never the token list.
    "q_repetition_stats" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          round(max(col("c")) / sum(col("c")), 4).as("top_token_frac"),
          round(lit(1) - count(lit(1)) / sum(col("c")), 4).as("dup_frac"))
        .orderBy("doc_id")
    }),

    // Corpus-level top bigrams — the n-gram frequency job tokenizer and
    // contamination analyses run. One explode + one keyed count; top-20
    // via TakeOrderedAndProject (never a full sort at scale).
    "q_top_bigrams" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      // one-token docs yield no bigrams; without the guard Spark's
      // sequence(1, 0) is DESCENDING [1,0] and slice(toks, 0, 2) throws
      val bigrams = when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", slice(toks, i, lit(2)))))
        .otherwise(array().cast("array<string>"))
      Tables.documents(s, dir)
        .select(explode(bigrams).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("bigram")).limit(20)
    }),

    // Deterministic stratified sampling: per-language keep rates via an
    // md5 hex-prefix band on doc_id — the rebalancing downsample a
    // training mix ships, reproducible across engines and runs (unlike
    // RNG-seeded sampleBy, whose stream is engine-specific). 2 hex chars
    // = 256 uniform buckets: en keeps < '40' (25%), others < '80' (50%).
    // Pure map-side filter — no shuffle at all until the final count.
    "q_stratified_sample" -> ((s, dir) => {
      val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
      Tables.documents(s, dir)
        .filter(bucket < when(col("lang") === "en", "40").otherwise("80"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // Weighted sampling without RNG (Efraimidis–Spirakis A-ES): each
    // doc draws its uniform u from its own content hash (md5 prefix →
    // (0,1]) and competes on priority ln(u)/w with w = doc length, so
    // longer docs win proportionally more — the quality/length-weighted
    // corpus downsample, reproducible across engines, retries, and
    // appends. Top-k by priority is a TakeOrderedAndProject, no window,
    // no shuffle of the corpus. Priority rounded to 6dp on BOTH engines
    // and tie-broken on doc_id so the hash compare is exact.
    "q_weighted_sample" -> ((s, dir) => {
      val u = (conv(substring(md5(col("text")), 1, 8), 16, 10).cast("double") + 1) /
        4294967297.0
      val w = length(col("text")).cast("double")
      Tables.documents(s, dir).filter(length(col("text")) > 0)
        .select(col("doc_id"), length(col("text")).cast("long").as("w"),
          round(log(u) / w, 6).as("p6"))
        .orderBy(col("p6").desc, col("doc_id"))
        .limit(20)
    }),

    // Triangle counting over the co-purchase graph (parts sharing an
    // order), the classic two-equi-join graph algorithm: orient every
    // edge low-id → high-id so each triangle is counted exactly once,
    // then wedges (e1.b = e2.a) close against the edge set. At 100 TB
    // the orientation key would be DEGREE, not id (bounds the wedge
    // fan-out to sqrt(m) per edge); the join shape — two shuffles on
    // vertex keys — is the same.
    "q_triangles" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val e = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .distinct()
      val wedges = e.join(e.select(col("a").as("b"), col("b").as("c")), Seq("b"))
      wedges.join(e.select(col("a"), col("b").as("c")), Seq("a", "c"))
        .agg(count(lit(1)).as("n_triangles"))
    }),

    // Character-entropy quality signal (the Gopher-family filter that
    // catches boilerplate/garbage text token stats miss): H = -Σ p ln p
    // over the per-doc character distribution. Two keyed aggregations —
    // (doc, char) counts then per-doc entropy — high-cardinality keys,
    // partial aggregation absorbs the char explosion map-side.
    "q_char_entropy" -> ((s, dir) => {
      val chars = Tables.documents(s, dir).filter(length(col("text")) > 0)
        .select(col("doc_id"), length(col("text")).cast("double").as("len"),
          explode(split(col("text"), "")).as("ch"))
      chars.groupBy(col("doc_id"), col("len"), col("ch"))
        .agg(count(lit(1)).cast("double").as("n"))
        .groupBy(col("doc_id"))
        .agg(round(-sum((col("n") / col("len")) * log(col("n") / col("len"))), 6)
          .as("h6"))
        .orderBy("doc_id")
    }),

    // Curation funnel: how many docs survive each successive filter
    // stage (length band -> language -> minimum token count), computed
    // as ONE conditional-aggregation scan — the shape that lets a
    // 100 TB corpus report its whole filter cascade in a single pass.
    "q_curation_funnel" -> ((s, dir) => {
      val nToks = size(split(col("text"), " "))
      val passLen = col("n_chars").between(100, 500)
      val passLang = col("lang") === "en"
      Tables.documents(s, dir).agg(
        count(lit(1)).as("n_total"),
        sum(when(passLen, 1).otherwise(0)).as("n_len"),
        sum(when(passLen && passLang, 1).otherwise(0)).as("n_len_lang"),
        sum(when(passLen && passLang && nToks >= 40, 1).otherwise(0)).as("n_final"))
    }),

    // Declarative data-quality expectations (B112): four named rules
    // evaluated over events in ONE conditional-aggregate scan
    // (Expect.stats) — the per-batch quality report an ingest gate
    // emits. A rule evaluating to NULL counts as a violation (pinned in
    // ExpectSpec); the oracle mirrors that with NOT coalesce(pred, false).
    "q_expectations" -> ((s, dir) => {
      import graft.ops.Expect
      val rules = Seq(
        Expect.rule("business_hours", hour(col("ts")).between(8, 17)),
        Expect.rule("k_in_range",
          get_json_object(col("props"), "$.k").cast("int") <= 50),
        Expect.rule("not_error", col("event_type") =!= "error"),
        Expect.rule("value_capped", col("value") <= 250))
      Expect.stats(Tables.events(s, dir), rules).orderBy("rule")
    }),
  )

  /** The edge-generating CTEs (ex/mh/bd/cand/edges) mirror
    * q_minhash_pairs_md5 with the same N/Bands/RowsPerBand constants —
    * shared verbatim by the q_dup_clusters and q_pagerank oracles.
    */
  private val edgeCtes =
    """WITH RECURSIVE ex AS (
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
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM cand
      |  UNION SELECT doc_b, doc_a FROM cand)""".stripMargin

  /** Verified-edge variant for q_dup_clusters: candidates pass the exact
    * n-gram Jaccard gate (>= 0.2, mirroring Dedup.dupClusters) before the
    * symmetric edge set is built — same CTE prefix as [[edgeCtes]].
    */
  private val verifiedEdgeCtes =
    edgeCtes.stripSuffix(
      """edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM cand
        |  UNION SELECT doc_b, doc_a FROM cand)""".stripMargin) +
      """sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(string_split(text,' '))-2),
        |    i -> concat_ws(' ', string_split(text,' ')[i],
        |      string_split(text,' ')[i+1], string_split(text,' ')[i+2]))) AS s
        |  FROM documents),
        |vcand AS (
        |  SELECT c.doc_a, c.doc_b
        |  FROM cand c JOIN sh x ON x.doc_id = c.doc_a
        |              JOIN sh y ON y.doc_id = c.doc_b
        |  WHERE round(CAST(len(list_filter(x.s, v -> list_contains(y.s, v))) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))), 6) >= 0.2),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM vcand
        |  UNION SELECT doc_b, doc_a FROM vcand)""".stripMargin

  /** `reach` is the transitive closure, so min(dst) per src is exactly
    * the label the propagation loop converges to.
    */
  val oracles: Map[String, String] = Map(
    "q_dup_clusters" -> (verifiedEdgeCtes +
      """,
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (SELECT src AS doc_id, min(dst) AS min_reach FROM reach GROUP BY src)
        |SELECT d.doc_id,
        | CAST(coalesce(least(c.min_reach, d.doc_id), d.doc_id) AS BIGINT) AS cluster_id,
        | CAST(CASE WHEN coalesce(least(c.min_reach, d.doc_id), d.doc_id) = d.doc_id
        |      THEN 1 ELSE 0 END AS INTEGER) AS is_survivor
        |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        |ORDER BY d.doc_id""".stripMargin),

    // Three unrolled PageRank iterations over the same symmetric LSH
    // edge set; teleport/damping literals (0.15/0.85) match the Spark
    // side exactly (passed as literals, never computed as 1-d).
    "q_pagerank" -> (edgeCtes +
      """,
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        |p0 AS (SELECT node, 1.0/nn.n AS rank FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT e.dst AS node, sum(p.rank/d.outdeg) AS c
        |       FROM edges e JOIN p0 p ON p.node = e.src
        |       JOIN deg d ON d.src = e.src GROUP BY e.dst),
        |p1 AS (SELECT nd.node, 0.15/nn.n + 0.85*coalesce(c1.c, 0) AS rank
        |       FROM nodes nd CROSS JOIN nn LEFT JOIN c1 ON c1.node = nd.node),
        |c2 AS (SELECT e.dst AS node, sum(p.rank/d.outdeg) AS c
        |       FROM edges e JOIN p1 p ON p.node = e.src
        |       JOIN deg d ON d.src = e.src GROUP BY e.dst),
        |p2 AS (SELECT nd.node, 0.15/nn.n + 0.85*coalesce(c2.c, 0) AS rank
        |       FROM nodes nd CROSS JOIN nn LEFT JOIN c2 ON c2.node = nd.node),
        |c3 AS (SELECT e.dst AS node, sum(p.rank/d.outdeg) AS c
        |       FROM edges e JOIN p2 p ON p.node = e.src
        |       JOIN deg d ON d.src = e.src GROUP BY e.dst),
        |p3 AS (SELECT nd.node, 0.15/nn.n + 0.85*coalesce(c3.c, 0) AS rank
        |       FROM nodes nd CROSS JOIN nn LEFT JOIN c3 ON c3.node = nd.node)
        |SELECT node AS doc_id, round(rank, 6) AS pr
        |FROM p3 ORDER BY doc_id""".stripMargin),

    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        |dfreq AS (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |    round(tf.tf * ln((n.n_docs + 1.0)/(dfreq.df + 1.0)), 6) AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, term, tf, df, tfidf FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term) AS rnk
        |  FROM scored)
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "q_url_parse" ->
      """SELECT doc_id,
        | regexp_extract(url, '^https://([^/]+)', 1) AS host,
        | regexp_extract(url, '^https://[^/]+([^?]*)', 1) AS path,
        | regexp_extract(url, 'lang=(.*)$', 1) AS lang_param
        |FROM (
        |  SELECT doc_id, 'https://' || source || '.example.com/docs/' ||
        |    CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_pii_scrub" ->
      ("""WITH aug AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@example.com from 10.2.' || CAST(doc_id % 200 AS VARCHAR) ||
        |    '.7 card 4111-1111-1111-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(aug, '""" + graft.ops.Pii.EmailRe + """')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(aug, '""" + graft.ops.Pii.Ipv4Re + """')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(aug, '""" + graft.ops.Pii.CardRe + """')) AS BIGINT) AS n_cards,
        |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
        |    '""" + graft.ops.Pii.EmailRe + """', '<EMAIL>', 'g'),
        |    '""" + graft.ops.Pii.Ipv4Re + """', '<IP>', 'g'),
        |    '""" + graft.ops.Pii.CardRe + """', '<CARD>', 'g')) AS scrub_md5,
        |  CAST(length(aug) - length(
        |    regexp_replace(regexp_replace(regexp_replace(aug,
        |      '""" + graft.ops.Pii.EmailRe + """', '<EMAIL>', 'g'),
        |      '""" + graft.ops.Pii.Ipv4Re + """', '<IP>', 'g'),
        |      '""" + graft.ops.Pii.CardRe + """', '<CARD>', 'g')) AS BIGINT) AS n_chars_removed
        |FROM aug ORDER BY doc_id""").stripMargin,

    // byte-identical recompute — the SQL-door twin shares the oracle
    "q_sql_textfns" ->
      ("""WITH aug AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@example.com from 10.2.' || CAST(doc_id % 200 AS VARCHAR) ||
        |    '.7 card 4111-1111-1111-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(aug, '""" + graft.ops.Pii.EmailRe + """')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(aug, '""" + graft.ops.Pii.Ipv4Re + """')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(aug, '""" + graft.ops.Pii.CardRe + """')) AS BIGINT) AS n_cards,
        |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
        |    '""" + graft.ops.Pii.EmailRe + """', '<EMAIL>', 'g'),
        |    '""" + graft.ops.Pii.Ipv4Re + """', '<IP>', 'g'),
        |    '""" + graft.ops.Pii.CardRe + """', '<CARD>', 'g')) AS scrub_md5,
        |  CAST(length(aug) - length(
        |    regexp_replace(regexp_replace(regexp_replace(aug,
        |      '""" + graft.ops.Pii.EmailRe + """', '<EMAIL>', 'g'),
        |      '""" + graft.ops.Pii.Ipv4Re + """', '<IP>', 'g'),
        |      '""" + graft.ops.Pii.CardRe + """', '<CARD>', 'g')) AS BIGINT) AS n_chars_removed
        |FROM aug ORDER BY doc_id""").stripMargin,

    "q_text_normalize" ->
      """SELECT doc_id,
        | CAST(length(norm) AS INTEGER) AS n_chars_norm,
        | CAST(len(string_split(norm,' ')) AS INTEGER) AS n_tokens_norm,
        | substring(norm, 1, 40) AS head40
        |FROM (
        |  SELECT doc_id, trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_html_strip" ->
      """WITH h AS (SELECT doc_id,
        |    '<html><head><style type="text/css">body{margin:0}</style>' ||
        |    '</head><body><h1 class="t">' || lang || '</h1>' || chr(10) ||
        |    '<p>' || replace(text, ' ', '&nbsp;') ||
        |    '</p><script>var x = 1 < 2;</script></body></html>' AS html
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(html,
        |    '(?is)<script\b[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(t,
        |    '(?is)<style\b[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(t, '(?s)<[^>]*>', ' ', 'g') AS t
        |  FROM s2),
        |s4 AS (SELECT doc_id,
        |    replace(replace(replace(replace(replace(replace(t,
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t
        |  FROM s3),
        |c AS (SELECT doc_id,
        |    trim(regexp_replace(t, '[ \t\n\x0B\f\r]+', ' ', 'g')) AS clean
        |  FROM s4)
        |SELECT doc_id, clean, CAST(length(clean) AS INTEGER) AS n_chars_clean
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_train_test_split" ->
      """SELECT CASE WHEN substr(md5(text),1,1) < 'c' THEN 'train'
        |            WHEN substr(md5(text),1,1) < 'e' THEN 'val'
        |            ELSE 'test' END AS split,
        | count(*) AS n_docs,
        | round(avg(n_chars),4) AS avg_chars,
        | count(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY 1 ORDER BY split""".stripMargin,

    "q_edit_distance" ->
      """WITH names AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        | CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM names a JOIN names b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY name_a, name_b""".stripMargin,

    "q_curation_pipeline" ->
      """WITH dedup AS (
        |  SELECT *, md5(text) AS digest,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents),
        |kept AS (
        |  SELECT lang, digest, len(string_split(text, ' ')) AS n_tokens
        |  FROM dedup
        |  WHERE rn = 1 AND lang IN ('en','de','fr')
        |    AND len(string_split(text, ' ')) BETWEEN 5 AND 500)
        |SELECT lang,
        | CASE WHEN substr(digest,1,1) < 'c' THEN 'train'
        |      WHEN substr(digest,1,1) < 'e' THEN 'val'
        |      ELSE 'test' END AS split,
        | count(*) AS n_docs,
        | round(avg(n_tokens), 4) AS avg_tokens
        |FROM kept GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,

    "q_repetition_stats" ->
      """WITH tc AS (
        |  SELECT doc_id, t.tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents) t(doc_id, tok)
        |  GROUP BY doc_id, t.tok)
        |SELECT doc_id,
        | CAST(sum(c) AS BIGINT) AS n_tokens,
        | count(*) AS n_distinct,
        | round(max(c) / sum(c), 4) AS top_token_frac,
        | round(1 - count(*) / sum(c), 4) AS dup_frac
        |FROM tc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_top_bigrams" ->
      """SELECT bg AS bigram, count(*) AS n FROM (
        |  SELECT unnest(list_transform(
        |    generate_series(1, len(string_split(text, ' ')) - 1),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bg
        |  FROM documents)
        |GROUP BY bg ORDER BY n DESC, bigram LIMIT 20""".stripMargin,

    "q_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |  CASE WHEN lang = 'en' THEN '40' ELSE '80' END
        |ORDER BY doc_id""".stripMargin,

    "q_weighted_sample" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS w,
        | round(ln((CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) + 1)
        |   / 4294967297.0) / length(text), 6) AS p6
        |FROM documents WHERE length(text) > 0
        |ORDER BY p6 DESC, doc_id LIMIT 20""".stripMargin,

    "q_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM li x JOIN li y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |)
        |SELECT count(*) AS n_triangles
        |FROM e e1
        |JOIN e e2 ON e1.b = e2.a
        |JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b""".stripMargin,

    "q_char_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, CAST(length(text) AS DOUBLE) AS len,
        |         unnest(string_split(text, '')) AS ch
        |  FROM documents WHERE length(text) > 0
        |), freq AS (
        |  SELECT doc_id, len, ch, CAST(count(*) AS DOUBLE) AS n
        |  FROM chars GROUP BY doc_id, len, ch
        |)
        |SELECT doc_id, round(-sum((n/len) * ln(n/len)), 6) AS h6
        |FROM freq GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_curation_funnel" ->
      """SELECT count(*) AS n_total,
        | CAST(sum(CASE WHEN n_chars BETWEEN 100 AND 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
        | CAST(sum(CASE WHEN n_chars BETWEEN 100 AND 500 AND lang = 'en'
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_len_lang,
        | CAST(sum(CASE WHEN n_chars BETWEEN 100 AND 500 AND lang = 'en'
        |   AND len(string_split(text, ' ')) >= 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_final
        |FROM documents""".stripMargin,

    "q_inverted_index" ->
      """SELECT term, count(DISTINCT doc_id) AS df,
        | array_to_string(list_sort(list_distinct(list(doc_id)))[1:10], ',') AS postings10
        |FROM (SELECT unnest(string_split(text, ' ')) AS term, doc_id
        |      FROM documents)
        |GROUP BY term ORDER BY term""".stripMargin,

    "q_expectations" ->
      """WITH e AS (
        |  SELECT hour(CAST(ts AS TIMESTAMP)) AS h,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |         event_type, value
        |  FROM events),
        |a AS (
        |  SELECT count(*) AS n_checked,
        |    sum(CASE WHEN NOT coalesce(h BETWEEN 8 AND 17, false) THEN 1 ELSE 0 END) AS v_bh,
        |    sum(CASE WHEN NOT coalesce(k <= 50, false) THEN 1 ELSE 0 END) AS v_k,
        |    sum(CASE WHEN NOT coalesce(event_type <> 'error', false) THEN 1 ELSE 0 END) AS v_err,
        |    sum(CASE WHEN NOT coalesce(value <= 250, false) THEN 1 ELSE 0 END) AS v_cap
        |  FROM e)
        |SELECT rule, n_checked, CAST(n_violations AS BIGINT) AS n_violations,
        |       round(n_violations * 1.0 / n_checked, 6) AS violation_rate
        |FROM (
        |  SELECT 'business_hours' AS rule, n_checked, v_bh AS n_violations FROM a
        |  UNION ALL SELECT 'k_in_range', n_checked, v_k FROM a
        |  UNION ALL SELECT 'not_error', n_checked, v_err FROM a
        |  UNION ALL SELECT 'value_capped', n_checked, v_cap FROM a)
        |ORDER BY rule""".stripMargin,
  )
}
