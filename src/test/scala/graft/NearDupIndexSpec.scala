package graft

import graft.ops.{Bloom, NearDupIndex, Sinks}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B152 persisted near-dup index: build → O(delta) append → broadcast
  * probe, with bucket-bloom file pruning that never changes the answer.
  */
class NearDupIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_nd_$tag").toString + "/idx"

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "an entirely different document about spark execution plans"),
    (3L, "numbers and letters mixed seven eight nine ten eleven twelve")
  )

  test("probe finds a planted near-dup of an indexed doc; unrelated text matches nothing") {
    val root = freshRoot("probe")
    NearDupIndex.build(spark, corpus.toDF("doc_id", "text"), root)
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"), // = doc 1
      (101L, "completely novel sentence sharing no shingles whatsoever here")
    ).toDF("doc_id", "text")
    val got = NearDupIndex.candidates(spark, batch, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((100L, 1L)), s"planted dup must match, got $got")
    assert(!got.exists(_._1 == 101L), s"novel doc must not match, got $got")
  }

  test("append is O(delta) — existing index files carry by inode — and appended docs are probe-visible") {
    val root = freshRoot("append")
    NearDupIndex.build(spark, corpus.toDF("doc_id", "text"), root)
    def inodes(v: Long): Set[Any] =
      graft.io.Fs.walkParquet(java.nio.file.Paths.get(Sinks.versionPath(root, v)))
        .map(java.nio.file.Files.getAttribute(_, "unix:ino")).toSet
    val before = inodes(0L)
    NearDupIndex.append(spark,
      Seq((4L, "fresh appended document with its very own words inside")).toDF("doc_id", "text"),
      root)
    assert(before.subsetOf(inodes(1L)), "append must hardlink existing files")
    val got = NearDupIndex.candidates(spark,
        Seq((200L, "fresh appended document with its very own words inside"))
          .toDF("doc_id", "text"), root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((200L, 4L)), s"appended doc must be probe-visible, got $got")
  }

  test("a doc probing under its own indexed id never self-matches") {
    val root = freshRoot("selfid")
    NearDupIndex.build(spark, corpus.toDF("doc_id", "text"), root)
    val got = NearDupIndex.candidates(spark,
        corpus.take(1).toDF("doc_id", "text"), root)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!got.contains((1L, 1L)), s"self-pair must be excluded, got ${got.toSeq}")
  }

  test("bucket-bloom pruning opens a file subset and the pruned probe equals the full-scan join") {
    val root = freshRoot("bloom")
    // many distinct docs so the v0 write lands several files
    val many = (0L until 64L)
      .map(i => (i, s"document number $i speaks about topic_$i and topic_${i + 1} only"))
    NearDupIndex.build(spark,
      many.toDF("doc_id", "text").repartition(8), root)
    val batch = Seq((500L, "document number 7 speaks about topic_7 and topic_8 only"))
      .toDF("doc_id", "text")
    val dir = Sinks.versionPath(root, 0L)
    val all = graft.io.Fs.walkParquet(java.nio.file.Paths.get(dir)).size
    assert(all > 1, "fixture must span multiple files for pruning to mean anything")
    // the probe's own bucket values prune files (conservative, never empty of the true match)
    val got = NearDupIndex.candidates(spark, batch, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((500L -> 7L)).map(t => (t._1, t._2)),
      s"pruned probe must equal exact candidates, got $got")
    // and the multi-value bloom API itself prunes to a strict subset here
    val probed = Bloom.prunedFilesEqAny(spark, dir, "bucket",
      Seq("definitely-not-a-real-bucket-value"))
    assert(probed.size < all, "an impossible bucket must prune at least one file")
  }

  test("the probe plans as a broadcast hash join — the index side never shuffles") {
    val root = freshRoot("plan")
    NearDupIndex.build(spark, corpus.toDF("doc_id", "text"), root)
    // a probe matching an indexed doc, so the pruned scan is non-empty
    // (a no-hit probe folds to an empty LocalTableScan — pruning at its
    // best — which would make this plan assert vacuous)
    val plan = NearDupIndex.candidates(spark,
        Seq((300L, corpus.head._2)).toDF("doc_id", "text"), root)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe must broadcast the batch side, got:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"probe must stay equi:\n$plan")
  }

  test("build is atomic: bloom rides the staged commit, and no kill point leaves a probe-broken or silently-degraded index") {
    import java.nio.file.{Files, Path, Paths}
    import graft.ops.{CommitProtocol, LocalFsCommit}
    // happy path: the bucket bloom sidecar is INSIDE v0 — data and
    // skipping metadata became visible in one rename (round-11 verdict
    // item 2: the old three-step build could crash between them)
    val happy = freshRoot("atomic")
    NearDupIndex.build(spark, corpus.toDF("doc_id", "text"), happy)
    assert(Files.isDirectory(Paths.get(Sinks.versionPath(happy, 0L), Bloom.Sidecar)),
      "bloom sidecar must land in the same commit as the data")
    // kill matrix: fail each commit move; the index must be either
    // fully absent (loud probe failure + clean rebuild) — never data
    // without bloom, never a flipped pointer
    for (step <- Seq("publish", "flip")) {
      val root = freshRoot(s"kill$step")
      val failing = new CommitProtocol {
        def readPointer(r: String) = LocalFsCommit.readPointer(r)
        def versionExists(r: String, v: Long) = LocalFsCommit.versionExists(r, v)
        def publishVersionDir(s: Path, d: Path): Unit = {
          if (step == "publish" && d.toString.startsWith(root))
            throw new RuntimeException("kill@publish")
          LocalFsCommit.publishVersionDir(s, d)
        }
        def flipPointer(r: String, v: Long): Unit = {
          if (step == "flip" && r.startsWith(root))
            throw new RuntimeException("kill@flip")
          LocalFsCommit.flipPointer(r, v)
        }
        def withCommitLock[T](r: String)(b: => T) = LocalFsCommit.withCommitLock(r)(b)
      }
      Sinks.commitProtocol = failing
      try intercept[RuntimeException](
        NearDupIndex.build(spark, corpus.toDF("doc_id", "text"), root))
      finally Sinks.commitProtocol = LocalFsCommit
      assert(Sinks.currentVersion(root).isEmpty, s"kill@$step flipped the pointer")
      // any orphaned version dir still carries its bloom (same-commit)
      Sinks.listVersions(root).foreach { v =>
        assert(Files.isDirectory(Paths.get(Sinks.versionPath(root, v), Bloom.Sidecar)),
          s"kill@$step left v$v without its bloom sidecar")
      }
      // probes fail LOUDLY (no published index), never silently degrade
      val probe = Seq((9L, "anything at all")).toDF("doc_id", "text")
      val e = intercept[IllegalStateException](
        NearDupIndex.candidates(spark, probe, root))
      assert(e.getMessage.contains("no published"), e.getMessage)
      // re-running build repairs fully: props overwrite, version commits
      NearDupIndex.build(spark, corpus.toDF("doc_id", "text"), root)
      assert(NearDupIndex.candidates(spark,
        Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
          .toDF("doc_id", "text"), root)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        .contains((100L, 1L)))
    }
  }

  test("probing a table that is not a near-dup index fails loudly") {
    val root = freshRoot("notidx")
    Sinks.publishVersioned(corpus.toDF("doc_id", "text"), root, None)
    val e = intercept[IllegalStateException](
      NearDupIndex.candidates(spark, corpus.toDF("doc_id", "text"), root))
    assert(e.getMessage.contains("not a near-dup index"))
  }
}
