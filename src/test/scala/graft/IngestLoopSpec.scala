package graft

import graft.ops.{NearDupIndex, Sinks}
import graft.streaming.IngestLoop
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The continuous admission loop: per-batch dup rejection against the
  * standing index, atomic corpus+index dual append, id-keyed retry
  * idempotence, cross-batch protection, and the real foreachBatch
  * wiring.
  */
class IngestLoopSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bootstrap(tag: String): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_ingest_$tag")
    val corpus = s"$dir/corpus"
    val idx = s"$dir/idx"
    val seed = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "an entirely different document about spark execution plans")
    ).toDF("doc_id", "text")
    Sinks.publishVersioned(seed, corpus, None)
    NearDupIndex.build(spark, seed, idx)
    (corpus, idx)
  }

  test("admission: near-dups and short docs rejected, dual append is atomic, retry is a no-op") {
    val (corpus, idx) = bootstrap("admit")
    val b1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 1
      (11L, "completely distinct new content with many many words here today"),
      (12L, "too short")                                            // token gate
    ).toDF("doc_id", "text")
    assert(IngestLoop.sink(corpus, idx, minTokens = 5)(b1, 1L) == 1)
    assert(Sinks.readCurrent(spark, corpus).count() == 3)
    // corpus and index moved TOGETHER to the same new version
    assert(Sinks.currentVersion(corpus).contains(1L))
    assert(Sinks.currentVersion(idx).contains(1L))
    // redelivery of the same batch admits nothing and commits nothing
    assert(IngestLoop.sink(corpus, idx, minTokens = 5)(b1, 1L) == 0)
    assert(Sinks.currentVersion(corpus).contains(1L))
    assert(Sinks.currentVersion(idx).contains(1L))
    // a later batch near-duplicating doc 11 (admitted LAST batch, never
    // part of the seed) is rejected — the index grew with the admission
    val b2 = Seq(
      (20L, "completely distinct new content with many many words here today"),
      (21L, "yet another genuinely novel sentence gets in without any trouble")
    ).toDF("doc_id", "text")
    assert(IngestLoop.sink(corpus, idx, minTokens = 5)(b2, 2L) == 1)
    assert(Sinks.readCurrent(spark, corpus)
      .filter(col("doc_id") === 20L).count() == 0)
    assert(Sinks.readCurrent(spark, corpus).count() == 4)
    // index stays probe-consistent with the corpus: every corpus doc id
    // is indexed, nothing else is
    val corpusIds = Sinks.readCurrent(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    val indexIds = Sinks.readCurrent(spark, idx)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(indexIds == corpusIds)
  }

  test("intra-batch near-dups collapse to the smallest id — the index can't catch the not-yet-indexed") {
    val (corpus, idx) = bootstrap("intra")
    val b = Seq(
      (40L, "twin documents arriving together in one single micro batch"),
      (41L, "twin documents arriving together in one single micro batch"),
      (42L, "while a genuinely different sentence sails through unharmed")
    ).toDF("doc_id", "text")
    assert(IngestLoop.sink(corpus, idx, minTokens = 5)(b, 1L) == 2)
    val ids = Sinks.readCurrent(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 40L, 42L), s"got $ids")
  }

  test("token gate runs BEFORE the intra-batch election — a short smaller-id near-dup cannot veto its admissible copy") {
    // round-11 advisor: gating after the election let an inadmissible
    // smaller-id doc eliminate its above-threshold twin, admitting
    // NEITHER copy — contradicting the one-of-two-copies contract
    val (corpus, idx) = bootstrap("gatefirst")
    val b = Seq(
      // 31 = 30 plus one word: verified md5-LSH band collision under the
      // index defaults (n=3, 4x4). 30 sits below the 11-token gate, 31 at
      // it — pre-fix, 30 (smaller id) would eliminate 31 in the election
      // and the batch admitted NEITHER copy
      (30L, "twin documents arriving together in one single micro batch today"),
      (31L, "twin documents arriving together in one single micro batch today now")
    ).toDF("doc_id", "text")
    // fixture self-check: the pair really is an intra-batch LSH collision
    val banded = NearDupIndex.bandedFor(spark, b, idx)
    val l = banded.toDF("id_a", "band", "bucket")
    val r = banded.toDF("id_b", "band", "bucket")
    assert(l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") === 30L && col("id_b") === 31L).count() > 0,
      "fixture drift: docs 30/31 no longer collide in any LSH band")
    assert(IngestLoop.sink(corpus, idx, minTokens = 11)(b, 1L) == 1)
    val ids = Sinks.readCurrent(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 31L), s"got $ids")
  }

  test("a real writeStream foreachBatch drives the loop end to end") {
    val (corpus, idx) = bootstrap("stream")
    val in = MemoryStream[(Long, String)](spark)
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        IngestLoop.sink(corpus, idx, minTokens = 3)(df, id); ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ingest_ckpt").toString)
      .start()
    try {
      in.addData((30L, "fresh streaming document with plenty of tokens inside"))
      q.processAllAvailable()
      in.addData(
        (31L, "fresh streaming document with plenty of tokens inside"), // dup of 30
        (32L, "and one more novel streaming document that should land"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = Sinks.readCurrent(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 30L, 32L), s"got $ids")
  }
}
