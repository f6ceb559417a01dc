package graft.examples

import graft.io.Tables
import graft.ops.{AnnIndex, Corpus, Dedup, Pii, Sinks, TableProps, Txn, TxnWrite}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The round-10 training-data loop composed into one runnable job —
  * what a 100 TB curation pipeline does per refresh, expressed on the
  * versioned table tier so every stage is atomic, time-travelable, and
  * O(its own delta):
  *
  *   1. ingest          (raw docs + a derived per-language rollup land
  *                       in ONE multi-table transaction — readers can
  *                       never see the corpus without its stats)
  *   2. PII scrub       (typed-token redaction, codegen'd regex)
  *   3. dedup via MOR   (exact-dup losers DELETED by deletion vector —
  *                       positions commit, no data file rewrites)
  *   4. decontaminate   (benchmark 8-gram hits dropped the same way)
  *   5. ANN index       (bucket-partitioned IVF + PQ codes; two-stage
  *                       code-ranked search equals the flat answer)
  *   6. pack + publish  (greedy sequence packing into shards, appended
  *                       O(delta) with the corpus rollup in one txn)
  *
  * `sbt "runMain graft.examples.TrainDataLakehouse [sfDir]"`.
  */
object TrainDataLakehouse {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rootDir = java.nio.file.Files.createTempDirectory("graft_tdl")
    graft.streaming.StreamOps.cleanOnExit(rootDir)
    val corpus = s"$rootDir/corpus"
    val stats = s"$rootDir/corpus_stats"
    val shards = s"$rootDir/shards"

    // 1. corpus + rollup committed ATOMICALLY: no reader can observe a
    // corpus version whose stats table wasn't computed from it
    val docs = Tables.documents(spark, sfDir)
    val rollup = docs.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
    val v = Txn.publishAll(Seq(
      TxnWrite(corpus, docs, None),
      TxnWrite(stats, rollup, None)))
    println(s"[1] txn ingest: corpus v${v(corpus)} + stats v${v(stats)} " +
      s"(${Sinks.readCurrent(spark, corpus).count()} docs, " +
      s"${Sinks.readCurrent(spark, stats).count()} languages, one commit)")

    // 1b. HIDDEN layout, recorded without touching a byte: the corpus
    // evolves to bucket(8, doc_id) METADATA-ONLY (the v1 files hardlink
    // under a _layout0/ leg; future writes land bucketed) and opts into
    // optimized writes (one file per bucket per commit). Point lookups
    // on the raw doc_id now directory-prune a spec no query mentions.
    Sinks.repartitionTable(spark, corpus, Seq("bucket(8, doc_id)"),
      metadataOnly = true)
    graft.ops.TableProps.update(corpus)(
      _ + (graft.ops.TableProps.DistributeKey -> "true"))
    println(s"[1b] hidden layout: bucket(8, doc_id) recorded metadata-only " +
      s"(v${Sinks.currentVersion(corpus).get}, zero bytes moved), " +
      "optimized writes on")

    // 2. PII scrub through WRITE-AUDIT-PUBLISH: the O(corpus) rewrite
    // commits to a BRANCH table, an audit checks it there, and only the
    // fast-forward merge (hardlink adoption, one OCC commit) exposes it
    // to base readers — a failed audit would just DROP the branch
    val scrubBr = s"$rootDir/corpus__scrub"
    Sinks.branchTable(spark, corpus, scrubBr)
    val scrubbed = Sinks.readCurrent(spark, scrubBr)
      .withColumn("text", Pii.scrub(col("text")))
    Sinks.publishVersioned(scrubbed, scrubBr, Some(0L))
    val leaked = Sinks.readCurrent(spark, scrubBr)
      .filter(col("text").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"))
      .count()
    require(leaked == 0, s"audit failed on the branch: $leaked raw emails")
    Sinks.mergeBranch(spark, scrubBr)
    println(s"[2] WAP PII scrub: audited on corpus__scrub, fast-forwarded " +
      s"to v${Sinks.currentVersion(corpus).get} (0 raw emails survive)")

    // 3. exact-dup losers leave through a DELETION VECTOR via MOR MERGE:
    // the loser set stays a DATAFRAME end to end (no driver-side id
    // collection — at 100 TB the loser list is itself corpus-scale),
    // positions commit, every data file carries by hardlink
    TableProps.update(corpus)(_ + ("graft.dml.mode" -> "mor"))
    spark.conf.set("spark.sql.catalog.tdl", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tdl.root", rootDir.toString)
    val losers = Dedup.exactDupStats(Sinks.readCurrent(spark, corpus))
      .filter(col("n_docs") > 1)
    Sinks.readCurrent(spark, corpus)
      .withColumn("digest", md5(col("text")))
      .join(losers.select(col("digest"), col("survivor_id")), "digest")
      .filter(col("doc_id") =!= col("survivor_id"))
      .select("doc_id").createOrReplaceTempView("tdl_losers")
    spark.sql(
      """MERGE INTO tdl.corpus t USING tdl_losers s ON t.doc_id = s.doc_id
        |WHEN MATCHED THEN DELETE""".stripMargin)
    println(s"[3] MOR dedup: exact-dup losers vectored out by MERGE, " +
      s"${Sinks.readCurrent(spark, corpus).count()} docs live, zero files rewritten")

    // 4. decontamination: docs sharing an 8-gram with the "benchmark"
    // set (a deterministic slice stands in) leave the same O(delta),
    // fully-distributed way
    val bench = Tables.documents(spark, sfDir).filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"), col("text"))
    Corpus.ngramContamination(
        Sinks.readCurrent(spark, corpus), bench, "doc_id", "text", n = 8)
      .filter(col("n_hit") > 0)
      .select("doc_id").createOrReplaceTempView("tdl_contaminated")
    val nCont = spark.table("tdl_contaminated").count()
    if (nCont > 0) spark.sql(
      """MERGE INTO tdl.corpus t USING tdl_contaminated s ON t.doc_id = s.doc_id
        |WHEN MATCHED THEN DELETE""".stripMargin)
    println(s"[4] decontaminated: $nCont docs vectored out " +
      s"(8-gram overlap with the benchmark slice)")

    // 4b. corpus-quality signals over the survivors: ExactSubstr span
    // coverage (how much repeated boilerplate hides inside unique docs)
    // and DSIR target-likeness selection (English docs play the trusted
    // target; the top raw docs by importance ratio would be kept)
    val live4 = Sinks.readCurrent(spark, corpus)
    val spanDropped = Corpus.dedupSpans(live4, "doc_id", "text", n = 30)
      .agg(sum("n_tokens_dropped")).head().getLong(0)
    val dsirSel = graft.ops.Dsir.selectTopK(
        graft.ops.Dsir.weights(live4, "doc_id", "text",
          col("lang") === "en", buckets = 1024), "doc_id", k = 100)
      .filter(col("selected")).count()
    println(s"[4b] quality: $spanDropped tokens sit in 30-token spans " +
      s"duplicated corpus-wide; DSIR selects $dsirSel target-like raw docs")

    // 5. ANN serving tier: IVF + PQ codes as a versioned table; the
    // two-stage code-ranked search must equal the flat search exactly
    val annRoot = s"$rootDir/ann"
    AnnIndex.buildFixedPq(spark, Tables.embeddings(spark, sfDir), annRoot)
    val qs = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val pq = AnnIndex.searchPq(spark, annRoot, qs, nprobe = 2, k = 5)
      .orderBy("query_id", "rnk").collect().toSeq
    val flat = AnnIndex.search(spark, annRoot, qs, nprobe = 2, k = 5)
      .orderBy("query_id", "rnk").collect().toSeq
    println(s"[5] ANN: PQ two-stage == flat search: ${pq == flat} " +
      s"(${pq.size} results; codes are 8 bytes/row vs 256 float bytes)")

    // 5b. RAG-style chunking: the surviving corpus split into
    // overlapping character windows (the frame a chunk-embedding pass
    // would consume) — one codegen'd expression, no shuffle
    val chunks = Corpus.chunk(Sinks.readCurrent(spark, corpus),
      "doc_id", "text", chunkChars = 2048, stride = 1024)
    println(s"[5b] chunking: ${chunks.count()} overlapping 2k-char windows " +
      "staged for embedding")

    // 6. greedy sequence packing into training shards, committed with
    // the refreshed rollup in ONE transaction again — shards and stats
    // stay mutually consistent forever
    val live = Sinks.readCurrent(spark, corpus)
    val packed = Corpus.packSequences(
      live.select(col("doc_id"), col("lang"), col("text")),
      budget = 2048, streamCol = "lang", orderCol = "doc_id", textCol = "text")
    val rollup2 = live.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
    val v2 = Txn.publishAll(Seq(
      TxnWrite(shards, packed, None),
      TxnWrite(stats, rollup2, Some(v(stats)))))
    println(s"[6] txn publish: ${Sinks.readCurrent(spark, shards).count()} packed " +
      s"sequences (shards v${v2(shards)}) + refreshed stats (v${v2(stats)}), one commit")

    // 7. training order for epoch 0: deterministic shuffle + shard
    // assignment (a new seed reshuffles the next epoch with zero table
    // rewrites), and the published snapshot gets a NAMED TAG pinned
    // against any retention policy — the reproducibility anchor an eval
    // harness resolves with VERSION AS OF 'release_epoch0'
    val order = Corpus.shuffleShards(
      Sinks.readCurrent(spark, shards), "doc_id", seed = "epoch0", shards = 8)
    Sinks.tagVersion(shards, "release_epoch0", Sinks.currentVersion(shards).get)
    println(s"[7] epoch0: ${order.count()} rows ordered across 8 loader " +
      s"shards; shards v${Sinks.currentVersion(shards).get} tagged " +
      "'release_epoch0' (vacuum-proof)")

    spark.stop()
  }
}
