package graft

import java.nio.file.{Files, Paths}

import graft.ops.{ChaosCommit, CommitProtocol, LocalFsCommit, Sinks, TableStream, Txn, TxnWrite}
import graft.ops.ChaosCommit._
import org.scalatest.funsuite.AnyFunSuite

/** B129 proving harness (round-14): the whole commit crash matrix —
  * clean aborts, applied-but-lost responses, duplicate retries, the
  * multi-table marker protocol — re-run through the fault-injecting
  * [[ChaosCommit]] binding, asserting the invariants an object-store
  * port must hold: a visible pointer always names a fully-committed
  * version, callers observe the truth on retry, and streaming batch
  * stamps keep exactly-once through ambiguous failures.
  */
class ChaosCommitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withProtocol[T](p: CommitProtocol)(body: => T): T = {
    Sinks.commitProtocol = p
    try body finally Sinks.commitProtocol = LocalFsCommit
  }

  private def stageDebris(root: String): Seq[String] =
    graft.io.Fs.listDir(Paths.get(root))
      .map(_.getFileName.toString).filter(_.startsWith(".stage-"))

  test("FailBefore at each step: clean abort, then a healthy retry wins (the FailAt matrix via the chaos binding)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_chaos1").toString + "/t"
    Sinks.publishVersioned(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root, None)
    val next = Seq((3L, "c")).toDF("k", "v")
    for (step <- Seq("publish", "flip")) {
      val chaos = new ChaosCommit(LocalFsCommit, root, Map((step, 1) -> FailBefore))
      val e = intercept[ChaosFault](withProtocol(chaos) {
        Sinks.publishVersioned(next, root, Some(0L))
      })
      assert(e.getMessage.contains("before applying"))
      assert(chaos.fired.size == 1)
      assert(Sinks.currentVersion(root).contains(0L), s"@$step moved the pointer")
      assert(Sinks.readCurrent(spark, root).count() == 2, s"@$step damaged v0")
      assert(stageDebris(root).isEmpty, s"@$step leaked staging dirs")
    }
    val v = Sinks.publishVersioned(next, root, Some(0L))
    assert(Sinks.currentVersion(root).contains(v))
    assert(Sinks.readCurrent(spark, root).count() == 1)
  }

  test("ApplyThenFail at flip: the commit IS visible; retries observe the truth; batch stamps keep exactly-once") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_chaos2").toString + "/t"
    Sinks.publishVersioned(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root, None)
    val delta = Seq((3L, "c")).toDF("k", "v")
    val chaos = new ChaosCommit(LocalFsCommit, root, Map(("flip", 1) -> ApplyThenFail))
    intercept[ChaosFault](withProtocol(chaos) {
      Sinks.appendVersioned(delta, root, Some(0L), batchTag = Some("w:7"),
        rebase = false)
    })
    // the flip LANDED: readers already see the new version
    assert(Sinks.currentVersion(root).contains(1L))
    assert(Sinks.readCurrent(spark, root).count() == 3)
    // a blind retry against the stale base surfaces the honest CME —
    // the caller learns its commit actually won
    intercept[java.util.ConcurrentModificationException](
      Sinks.appendVersioned(delta, root, Some(0L), rebase = false))
    // and the streaming writer's dedupe check sees the `_BATCHID` stamp
    // of the ambiguous commit — the batch is NOT re-appended on restart
    assert(TableStream.committed(root, "w", 7L),
      "an applied-but-lost flip must still dedupe by its batch stamp")
    assert(Sinks.readCurrent(spark, root).count() == 3)
  }

  test("ApplyThenFail at publish: a crash orphan above the pointer; retry allocates past it; vacuum sweeps it") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_chaos3").toString + "/t"
    Sinks.publishVersioned(Seq((1L, "a")).toDF("k", "v"), root, None)
    val next = Seq((2L, "b")).toDF("k", "v")
    val chaos = new ChaosCommit(LocalFsCommit, root, Map(("publish", 1) -> ApplyThenFail))
    intercept[ChaosFault](withProtocol(chaos) {
      Sinks.publishVersioned(next, root, Some(0L))
    })
    // pointer unchanged; the orphan dir exists but is invisible
    assert(Sinks.currentVersion(root).contains(0L))
    assert(Sinks.readCurrent(spark, root).count() == 1)
    assert(Files.isDirectory(Paths.get(Sinks.versionPath(root, 1L))),
      "the applied publish must have left its orphan")
    // the healthy retry allocates PAST the orphan and wins
    val v = Sinks.publishVersioned(next, root, Some(0L))
    assert(v == 2L && Sinks.currentVersion(root).contains(2L))
    assert(Sinks.readCurrent(spark, root).count() == 1)
    // the retry's allocation left the orphan BELOW the live pointer —
    // inert history now (commit-stamped, never resolvable as current);
    // retention expiry sweeps it like any retired version
    val evicted = Sinks.expireVersions(spark, root, retainVersions = 0)
    assert(evicted.contains(1L), s"expected the orphan swept, got $evicted")
    assert(Sinks.readCurrent(spark, root).count() == 1)
    assert(!Files.exists(Paths.get(Sinks.versionPath(root, 1L))))
  }

  test("Duplicate flip (retried-after-success PUT) is idempotent") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_chaos4").toString + "/t"
    Sinks.publishVersioned(Seq((1L, "a")).toDF("k", "v"), root, None)
    val chaos = new ChaosCommit(LocalFsCommit, root, Map(("flip", 1) -> Duplicate))
    withProtocol(chaos) {
      Sinks.publishVersioned(Seq((2L, "b")).toDF("k", "v"), root, Some(0L))
    }
    assert(chaos.fired.size == 1)
    assert(Sinks.currentVersion(root).contains(1L))
    assert(Sinks.readCurrent(spark, root).collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("eq-upsert and eq_checkpoint hold the matrix through the chaos binding (round-14)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.ops.EqDel
    val root = Files.createTempDirectory("graft_chaos_eq").toString + "/t"
    Sinks.publishVersioned(
      (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v"), root, None)
    // FailBefore at flip: the blind upsert aborts cleanly — pointer
    // unchanged, NO tombstones visible (data + tombstones are one
    // atomic staged commit, so neither can land alone)
    val chaos = new ChaosCommit(LocalFsCommit, root,
      Map(("flip", 1) -> FailBefore))
    intercept[ChaosFault](withProtocol(chaos) {
      EqDel.upsertBatch(spark, Seq((1L, "upd")).toDF("k", "v"), root, Seq("k"))
    })
    assert(Sinks.currentVersion(root).contains(0L))
    assert(!EqDel.exists(Sinks.resolve(root)),
      "an aborted upsert must leave no tombstones behind")
    assert(Sinks.readCurrent(spark, root)
      .filter(col("k") === 1L).head().getString(1) == "v1")
    // a healthy retry applies exactly once
    EqDel.upsertBatch(spark, Seq((1L, "upd")).toDF("k", "v"), root, Seq("k"))
    val got = Sinks.readCurrent(spark, root).filter(col("k") === 1L).collect()
    assert(got.length == 1 && got(0).getString(1) == "upd")
    // ApplyThenFail at flip on eq_checkpoint: the fold IS committed —
    // the caller sees failure, the truth is a folded new version with
    // byte-identical state (the documented ambiguous-response contract)
    val before = Sinks.readCurrent(spark, root).collect().toSet
    val vBefore = Sinks.currentVersion(root).get
    val chaos2 = new ChaosCommit(LocalFsCommit, root,
      Map(("flip", 1) -> ApplyThenFail))
    intercept[ChaosFault](withProtocol(chaos2) {
      Sinks.eqCheckpoint(spark, root)
    })
    assert(Sinks.currentVersion(root).exists(_ > vBefore),
      "the applied-then-lost flip must be visible")
    assert(Sinks.readCurrent(spark, root).collect().toSet == before)
  }

  test("multi-table txn through the chaos binding: a publish fault aborts BOTH tables; healthy retry commits both") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_chaos5").toString
    val (bronze, silver) = (s"$dir/bronze", s"$dir/silver")
    Sinks.publishVersioned(Seq((1L, "a")).toDF("k", "v"), bronze, None)
    Sinks.publishVersioned(Seq((10L, "x")).toDF("k", "v"), silver, None)
    // the SECOND staged publish fails (ordered by root: bronze, silver)
    val chaos = new ChaosCommit(LocalFsCommit, dir, Map(("publish", 2) -> FailBefore))
    intercept[Exception](withProtocol(chaos) {
      Txn.publishAll(Seq(
        TxnWrite(bronze, Seq((2L, "b")).toDF("k", "v"), Some(0L), linked = true),
        TxnWrite(silver, Seq((20L, "y")).toDF("k", "v"), Some(0L), linked = true)))
    })
    // all-or-nothing: NEITHER table advanced for readers
    assert(Sinks.readCurrent(spark, bronze).count() == 1,
      "bronze must still read its pre-transaction version")
    assert(Sinks.readCurrent(spark, silver).count() == 1,
      "silver must still read its pre-transaction version")
    // the healthy retry commits both atomically
    Txn.publishAll(Seq(
      TxnWrite(bronze, Seq((2L, "b")).toDF("k", "v"),
        Sinks.currentVersion(bronze), linked = true),
      TxnWrite(silver, Seq((20L, "y")).toDF("k", "v"),
        Sinks.currentVersion(silver), linked = true)))
    assert(Sinks.readCurrent(spark, bronze).count() == 2)
    assert(Sinks.readCurrent(spark, silver).count() == 2)
  }
}
