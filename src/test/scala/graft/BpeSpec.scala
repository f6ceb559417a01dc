package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B176 BPE training/encoding ([[graft.ops.Bpe]]): the greedy
  * word-level merge loop on a hand-checkable corpus, the determinism
  * pins that make q_bpe_train oracle-provable, and the encode
  * round-trip. The fixture is the BPE paper's own shape: a tiny vocab
  * whose first merges are computable by hand.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // "low" x5, "lower" x2, "newest" x6, "widest" x3 — the classic
  // corpus: first merge is ("e s", weight 9), then ("es t", 9),
  // then ("est </w>", 9), then ("l o", 7) …
  private def docs = Seq(
    (1L, Array.fill(5)("low").mkString(" ")),
    (2L, Array.fill(2)("lower").mkString(" ")),
    (3L, Array.fill(6)("newest").mkString(" ")),
    (4L, Array.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("train: the hand-computed greedy merge sequence, weights included") {
    val (merges, vocab) = Bpe.train(docs, "text", 4)
    val got = merges.orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "e s", "es", 9L),
      (2, "es t", "est", 9L),
      (3, "est </w>", "est</w>", 9L),
      (4, "l o", "lo", 7L)), got.toSeq.toString)
    val sym = vocab.collect().map(r =>
      r.getAs[String]("w") -> r.getAs[String]("sym")).toMap
    assert(sym("newest") == "n e w est</w>")
    assert(sym("low") == "lo w </w>")
    assert(sym("widest") == "w i d est</w>")
  }

  test("train is deterministic: two runs produce identical merge tables") {
    val a = Bpe.train(docs, "text", 4)._1.collect().toSeq
    val b = Bpe.train(docs, "text", 4)._1.collect().toSeq
    assert(a == b)
  }

  test("train stops early when every word is fully merged") {
    val tiny = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    // "ab" needs exactly 2 merges (a b, ab </w>) — asking for 10 must
    // return 2 and not loop or error
    val (merges, vocab) = Bpe.train(tiny, "text", 10)
    assert(merges.count() == 2)
    assert(vocab.select("sym").as[String].collect().toSeq == Seq("ab</w>"))
  }

  test("encode: distinct words encode once, docs reassemble in order, unknowns pass through") {
    val (merges, _) = Bpe.train(docs, "text", 4)
    val ms = merges.orderBy("rank").select("pair").as[String].collect().toSeq
    val corpus = Seq(
      (10L, "low lower newest"),
      (11L, "newest 42 low")).toDF("doc_id", "text")
    val enc = Bpe.encode(corpus, "doc_id", "text", ms)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(enc(10L) == Seq("lo", "w", "</w>", "lo", "w", "e", "r", "</w>",
      "n", "e", "w", "est</w>"), enc(10L).toString)
    // "42" is outside the trained class: one opaque token, no marker
    assert(enc(11L) == Seq("n", "e", "w", "est</w>", "42", "lo", "w", "</w>"),
      enc(11L).toString)
    // round-trip: concatenating a known word's tokens and stripping the
    // marker reproduces the word
    assert(enc(10L).mkString("").replace("</w>", " ").trim
      .split(" ").toSeq == Seq("low", "lower", "newest"))
  }

  test("CALL system.bpe_train publishes the merge table as a catalog table (round-14)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bpe_call").toString
    spark.conf.set("spark.sql.catalog.gbpe", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbpe.root", wh)
    graft.ops.Sinks.publishVersioned(docs, s"$wh/corpus", None)
    val r = spark.sql("CALL gbpe.system.bpe_train(source => 'corpus', " +
      "text_col => 'text', n_merges => 4, target => 'merges')")
      .collect().head
    assert(r.getLong(2) == 4L)
    val got = spark.sql("SELECT rank, pair, merged, weight FROM gbpe.merges " +
      "ORDER BY rank").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "e s", "es", 9L), (2, "es t", "est", 9L),
      (3, "est </w>", "est</w>", 9L), (4, "l o", "lo", 7L)))
    // the published artifact is a normal versioned table: time travel,
    // DESCRIBE HISTORY op tag, the whole surface
    assert(graft.ops.Sinks.opOf(graft.ops.Sinks.resolve(s"$wh/merges")) ==
      "bpe-train")
  }

  test("the fixture-corpus oracle twin agrees at sf0.001 (the q_bpe_train chain)") {
    // same entry the harness runs, small sf: merges must be internally
    // consistent (each merged = pair minus space, ranks dense) and the
    // final vocab must be reachable by replaying them
    val (merges, vocab) = Bpe.train(
      graft.io.Tables.documents(spark, TestSpark.sf001), "text", 6)
    val ms = merges.orderBy("rank").collect()
    assert(ms.length == 6)
    assert(ms.zipWithIndex.forall { case (r, i) => r.getInt(0) == i + 1 })
    assert(ms.forall(r => r.getString(1).replace(" ", "") == r.getString(2)))
    // replaying the merges over the raw vocabulary reproduces vocab
    val replay = ms.map(_.getString(1)).foldLeft(
      Bpe.vocabulary(graft.io.Tables.documents(spark, TestSpark.sf001), "text")) {
      (df, pair) =>
        df.withColumn("sym", trim(call_function("replace",
          concat(lit(" "), col("sym"), lit(" ")),
          lit(s" $pair "), lit(" " + pair.replace(" ", "") + " "))))
    }
    assert(replay.orderBy("w").collect().map(_.getAs[String]("sym")).toSeq ==
      vocab.orderBy("w").collect().map(_.getAs[String]("sym")).toSeq)
  }
}
